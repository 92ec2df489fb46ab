"""Events-family engine-vs-oracle agreement on adversarial events.

Runs ``scripts/adversarial_events.py`` in a SUBPROCESS (it owns its own
Ray session). The script derives a NULL-value / NULL-type /
malformed-props variant of the sf0.001 events table and hash-compares
all 44 events-family queries against oracles over the reader-normalized
view — the audit that motivated the ``read_events`` ingest
normalization (NULL event_type rows were silently dropped by pandas
groupby; NULL value put NaN through the integer-cents kernels).
"""

import subprocess
import sys


def test_events_queries_match_oracle_on_adversarial_events():
    proc = subprocess.run(
        [sys.executable, "scripts/adversarial_events.py",
         "/tmp/adversarial_sf_pytest_events"],
        capture_output=True, text=True, timeout=1200)
    tail = "\n".join(proc.stdout.splitlines()[-48:])
    assert proc.returncode == 0, f"audit failures:\n{tail}\n{proc.stderr[-2000:]}"
    assert "FAILURES: 0" in proc.stdout, tail
