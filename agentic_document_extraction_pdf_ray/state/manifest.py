"""Per-partition lineage manifests: the checkpoint/resume protocol.

Replaces the reference's LangGraph SQLite checkpointer
(``/root/reference/src/agents/orchestrator.py:186-265``, :749-768) with a
resumable OUTPUT LAYOUT (SURVEY.md §4.1 "Checkpoint / resume"): output
Parquet is partitioned by ``partition_id = crc32(conv_id) % P``; each
completed partition commits one manifest row atomically (write temp +
``os.replace``); a rerun skips partitions whose manifest says ``done`` for
the same input fingerprint. FIXTURES.md §3 defines the row shape.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

MANIFEST_DIRNAME = "_manifests"


def input_fingerprint(paths: list[str], config: dict[str, Any] | None = None) -> str:
    """Hash of input file identities (name+size) + pipeline config."""
    h = hashlib.md5()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}".encode())
    if config:
        h.update(json.dumps(config, sort_keys=True).encode())
    return h.hexdigest()


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIRNAME)


def write_manifest(out_dir: str, partition_id: str, record: dict[str, Any]) -> str:
    """Atomic per-partition manifest commit (temp write + rename)."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{partition_id}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"partition_id": partition_id, **record}, f, sort_keys=True)
    os.replace(tmp, final)
    return final


def load_manifests(out_dir: str) -> dict[str, dict[str, Any]]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out: dict[str, dict[str, Any]] = {}
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[rec["partition_id"]] = rec
    return out


def done_partitions(out_dir: str, fingerprint: str) -> set[str]:
    """Partitions already completed for THIS input fingerprint."""
    return {
        pid for pid, rec in load_manifests(out_dir).items()
        if rec.get("status") == "done" and rec.get("input_fingerprint") == fingerprint
    }
