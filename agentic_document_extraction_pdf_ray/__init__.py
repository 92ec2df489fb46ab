"""ray-extract: a from-scratch Ray-Data-native main-content extraction engine.

Re-expresses the extraction semantics of the reference system (Veridoc,
Rayyan9477/Agentic-Document-Extraction-PDF) as idiomatic ``ray.data.Dataset``
pipelines over zero-copy Arrow batches applied to the text payload of
conversation-transcript turns:

- ``functions/``  pure scalar/vectorized function library (text, dates,
  currency, codes, hallucination patterns, confidence) — the analogue of the
  reference's ``src/utils`` + ``src/validation`` scalar layer.
- ``oracle/``     single-process reference implementation of the extraction
  core; the correctness anchor for per-turn equality tests.
- ``stages/``     Ray Data batch transforms (stateless ``map_batches`` fns and
  actor-pool classes).
- ``sources/``    deterministic transcript generator + parquet readers.
- ``pipelines/``  end-to-end pipeline compositions (extract, dedup, textstats,
  similarity, events, relational demos).
- ``state/``      per-partition lineage manifests + resume logic.

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

import os as _os

# Ray workers are separate processes: they inherit PYTHONPATH, not the
# driver's sys.path. Exporting our parent dir here (at import time, i.e.
# before ray.init in any sane entry point) makes the package importable in
# every worker regardless of the driver's CWD.
_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _parent not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _parent + _os.pathsep + _os.environ.get("PYTHONPATH", "")
        if _os.environ.get("PYTHONPATH") else _parent
    )
del _os, _parent
