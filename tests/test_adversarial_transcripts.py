"""Conv-family engine-vs-oracle agreement on adversarial transcripts.

Runs ``scripts/adversarial_transcripts.py`` in a SUBPROCESS (it owns its
own Ray session and repoints the shared transcripts-oracle symlink; the
query wrappers re-point it on every call, so the parent session
self-heals). The script derives a NULL-text / NULL-tool / unknown-role
variant of the standard fixture and hash-compares all 29 SQL-matched
transcript queries against their DuckDB oracles — the audit that caught
the np.round half-even vs SQL half-away tie divergence
(``functions.hashing.round_sql``) in round 5.
"""

import subprocess
import sys


def test_conv_queries_match_oracle_on_adversarial_transcripts():
    proc = subprocess.run(
        [sys.executable, "scripts/adversarial_transcripts.py"],
        capture_output=True, text=True, timeout=1200)
    tail = "\n".join(proc.stdout.splitlines()[-32:])
    assert proc.returncode == 0, f"audit failures:\n{tail}\n{proc.stderr[-2000:]}"
    assert "FAILURES: 0" in proc.stdout, tail
