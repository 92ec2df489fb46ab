"""Resumable extraction runs: partitioned output + manifest-gated restart.

``run_resumable_extract`` executes the flagship pipeline with per-partition
atomic commits: each hash bucket's finalize task writes its own Parquet
file (temp + rename), computes lineage metrics, and emits a manifest row;
the driver persists manifests only after the partition's data file is
durable. A rerun filters the INPUT (right after the read, before any heavy
work) down to partitions without a ``done`` manifest — completed partitions
cost nothing on restart.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages.extract import conv_finalize_block, extract_turn_batch
from ..state.manifest import done_partitions, input_fingerprint, write_manifest
from .extract import partition_ids_for

# Bump whenever the conv→partition hash changes (siphash since round 2;
# round 1 used crc32). Keeps stale-partitioner output from resuming.
PARTITIONER_VERSION = "siphash-v2"


def _partition_checksum(part: pa.Table) -> str:
    """Order-insensitive content checksum over the equality-checked columns."""
    conv = part["conv_id"].to_pylist()
    tidx = part["turn_idx"].to_pylist()
    text = part["extracted_text"].to_pylist()
    total = 0
    for c, t, x in zip(conv, tidx, text):
        total ^= int.from_bytes(
            hashlib.md5(f"{c}|{t}|{x}".encode()).digest()[:8], "little")
    return f"{total:016x}"


def run_resumable_extract(
    src_dir: str,
    out_dir: str,
    num_partitions: int = 64,
    batch_size: int = 4096,
    fail_partitions: frozenset[str] = frozenset(),
) -> dict[str, Any]:
    """Run (or resume) the flagship pipeline with per-partition commits.

    ``fail_partitions`` injects a deterministic failure before those
    partitions write — the kill/resume test hook.
    Returns {"computed": [...], "skipped": [...], "manifests": {...}}.

    NOTE(skew): a partition task holds ALL turns of the conversations
    hashed to it — for inputs with mega-conversations, raise
    ``num_partitions`` (spreads cold convs; a single conv still lands in
    one task) or run the salted plan (`pipelines.scale`) and write its
    output with `add_partition_id` + `write_parquet(partition_cols=...)`;
    manifest-gating composes the same way.
    """
    paths = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet"))
    # The partitioner VERSION is part of the fingerprint: changing the
    # conv→partition hash (e.g. the round-2 crc32→siphash switch) changes
    # partition membership, so output written under a different
    # partitioner must never be treated as resumable — it would duplicate
    # moved-out conversations and silently drop moved-in ones.
    fp = input_fingerprint(paths, {"num_partitions": num_partitions,
                                   "partitioner": PARTITIONER_VERSION})
    done = done_partitions(out_dir, fp)
    os.makedirs(out_dir, exist_ok=True)

    ds = ray.data.read_parquet(
        paths, columns=["conv_id", "turn_idx", "role", "text", "tool"])

    def assign_and_filter(batch: pa.Table) -> pa.Table:
        pids = partition_ids_for(batch["conv_id"], num_partitions)
        batch = batch.append_column("partition_id", pa.array(pids, pa.string()))
        if done:
            mask = pa.array([p not in done for p in pids], pa.bool_())
            batch = batch.filter(mask)
        return batch

    ds = ds.map_batches(assign_and_filter, batch_format="pyarrow")
    ds = ds.map_batches(extract_turn_batch_keep_pid, batch_format="pyarrow",
                        batch_size=batch_size)

    def finalize_and_write(part: pa.Table) -> pa.Table:
        t0 = time.time()
        pid = part["partition_id"][0].as_py()
        if pid in fail_partitions:
            # Test hook: delay so sibling partitions commit before the
            # executor aborts — models a mid-run crash, not an instant one.
            time.sleep(2.0)
            raise RuntimeError(f"injected failure for partition {pid}")
        body = conv_finalize_block(part.drop_columns(["partition_id"]))
        pdir = os.path.join(out_dir, f"partition_id={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))

        flag_counts: dict[str, int] = {}
        for fl in body["flags"].to_pylist():
            for f in fl:
                flag_counts[f] = flag_counts.get(f, 0) + 1
        rec = {
            "input_fingerprint": fp,
            "row_count": body.num_rows,
            "conv_count": len(set(body["conv_id"].to_pylist())),
            "checksum": _partition_checksum(body),
            "flag_counts": flag_counts,
            "wall_ms": int((time.time() - t0) * 1000),
            "status": "done",
        }
        # Manifest committed IN the task, right after the data file rename:
        # a driver death between partitions loses nothing already durable.
        write_manifest(out_dir, pid, rec)
        return pa.table({"partition_id": pa.array([pid], pa.string()),
                         "row_count": pa.array([body.num_rows], pa.int64())})

    manifest_rows = (ds.groupby("partition_id")
                     .map_groups(finalize_and_write, batch_format="pyarrow")
                     .take_all())

    from ..state.manifest import load_manifests
    return {"computed": sorted(r["partition_id"] for r in manifest_rows),
            "skipped": sorted(done),
            "manifests": load_manifests(out_dir)}


def run_resumable_extract_salted(
    src_dir: str,
    out_dir: str,
    chunk_size: int = 500,
    num_partitions: int = 16,
    fail_partitions: frozenset[str] = frozenset(),
) -> dict[str, Any]:
    """Manifest-gated resume for the SALTED (mega-conversation) plan.

    Same contract as :func:`run_resumable_extract`: per-partition atomic
    parquet + manifest committed in the task; a rerun drops done
    partitions' conversations right after the read, so their extraction
    never recomputes. The resume unit stays the conv-hash partition (the
    salted plan's salt buckets cannot be resume units on their own:
    segment decisions for a conversation need ALL its chunks, so a
    partially-done conversation would still recompute its narrow pass).
    The cost is one payload shuffle to co-locate each partition's output
    rows for the atomic write; a partition task holds whole
    conversations again, so for extreme single-conversation skew raise
    ``num_partitions`` and let the salted EXECUTION (which already ran
    bucketed) dominate the wall time.
    """
    import time as _time

    paths = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet"))
    fp = input_fingerprint(paths, {"num_partitions": num_partitions,
                                   "chunk_size": chunk_size,
                                   "plan": "salted",
                                   "partitioner": PARTITIONER_VERSION})
    done = done_partitions(out_dir, fp)
    os.makedirs(out_dir, exist_ok=True)

    raw = ray.data.read_parquet(
        paths, columns=["conv_id", "turn_idx", "role", "text", "tool"])

    def drop_done(batch: pa.Table) -> pa.Table:
        if not done:
            return batch
        pids = partition_ids_for(batch["conv_id"], num_partitions)
        mask = pa.array([p not in done for p in pids], pa.bool_())
        return batch.filter(mask)

    from .scale import salted_pipeline_from_raw
    out = salted_pipeline_from_raw(
        raw.map_batches(drop_done, batch_format="pyarrow"), chunk_size)

    def assign_pid(batch: pa.Table) -> pa.Table:
        pids = partition_ids_for(batch["conv_id"], num_partitions)
        return batch.append_column("partition_id",
                                   pa.array(pids, pa.string()))

    def write_partition(part: pa.Table) -> pa.Table:
        t0 = _time.time()
        pid = part["partition_id"][0].as_py()
        if pid in fail_partitions:
            _time.sleep(2.0)
            raise RuntimeError(f"injected failure for partition {pid}")
        body = part.drop_columns(["partition_id"]).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")])
        pdir = os.path.join(out_dir, f"partition_id={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        rec = {
            "input_fingerprint": fp,
            "row_count": body.num_rows,
            "conv_count": len(set(body["conv_id"].to_pylist())),
            "checksum": _partition_checksum(body),
            "wall_ms": int((_time.time() - t0) * 1000),
            "status": "done",
        }
        write_manifest(out_dir, pid, rec)
        return pa.table({"partition_id": pa.array([pid], pa.string()),
                         "row_count": pa.array([body.num_rows], pa.int64())})

    manifest_rows = (out.map_batches(assign_pid, batch_format="pyarrow")
                     .groupby("partition_id")
                     .map_groups(write_partition, batch_format="pyarrow")
                     .take_all())

    from ..state.manifest import load_manifests
    return {"computed": sorted(r["partition_id"] for r in manifest_rows),
            "skipped": sorted(done),
            "manifests": load_manifests(out_dir)}


def extract_turn_batch_keep_pid(batch: pa.Table) -> pa.Table:
    """Per-turn core that carries the partition_id column through."""
    pid = batch["partition_id"]
    out = extract_turn_batch(batch.drop_columns(["partition_id"]))
    return out.append_column("partition_id", pid)


def read_extract_output(out_dir: str) -> ray.data.Dataset:
    """Stream a resumable run's committed output (skips the manifests dir)."""
    files = [os.path.join(out_dir, d, "part-0.parquet")
             for d in sorted(os.listdir(out_dir))
             if d.startswith("partition_id=")]
    if not files:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return ray.data.read_parquet(files)
