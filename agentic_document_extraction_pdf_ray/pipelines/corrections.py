"""Human-correction merge-back — the batch analogue of the reference's
LangGraph interrupt/resume loop (``src/pipeline/runner.py:251-306``
``resume_extraction(human_corrections=...)`` dispatching
``Command(resume=corrections)``; ``src/agents/orchestrator.py:1510-1572``
``_apply_human_corrections``): a reviewer's corrections table overlays
the reconciled field output. Reference semantics mirrored exactly:

- a corrected (key, field) keeps its row but the corrected value WINS,
  confidence := 1.0, and provenance is recorded (the reference's
  ``human_corrected`` envelope flag → our ``correction_applied`` column);
- a correction naming a field the extraction never produced is ADDED as
  a fresh scalar row (the reference's ``else`` branch wraps it in a new
  ``{value, confidence: 1.0, human_corrected: True}`` envelope);
- untouched rows pass through with ``correction_applied = False``.

Scale shape: ONE bucketed exchange — both sides are tagged with the
same key-hash bucket and union'd, so the merge is a per-bucket
vectorized outer join; no broadcast of the (possibly large) reconciled
side, no shuffle of anything wider than the narrow field rows. The
corrections side is human-review-sized, but the plan does not rely on
that. ``run_resumable_corrections`` feeds the merge through the
manifest-gated partition writer (``state/manifest.py``) so a rerun
skips partitions whose corrected output already committed — the batch
analogue of resuming from the LangGraph checkpoint.
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import bucket_int_array, hash_str_array
from ..stages.extract import extract_turn_batch
from ..state.manifest import done_partitions, input_fingerprint, write_manifest
from .extract import partition_ids_for
from .fields import explode_field_values, merge_bucket
from .resume import PARTITIONER_VERSION

_OUT_COLS = ["field", "kind", "value", "n_values", "confidence",
             "correction_applied"]


def _bucket_of(vals: "pd.Series", n_buckets: int) -> np.ndarray:
    arr = vals.to_numpy()
    if arr.dtype.kind in "iu":
        return bucket_int_array(arr.astype(np.int64), n_buckets)
    return (hash_str_array(arr.astype(object))
            % np.uint64(n_buckets)).astype(np.int64)


def overlay_corrections(base: pd.DataFrame, corr: pd.DataFrame,
                        key: str = "conv_id") -> pd.DataFrame:
    """Single-partition correction overlay (the per-bucket kernel and
    the in-task kernel of the resumable writer).

    ``base``: (key, field, kind, value, n_values, confidence) rows.
    ``corr``: (key, field, corrected_value) rows. Duplicate corrections
    for one (key, field) resolve deterministically to the
    lexicographically-last corrected value regardless of partitioning.
    """
    corr = (corr.sort_values([key, "field", "corrected_value"],
                             kind="mergesort")
            .drop_duplicates([key, "field"], keep="last"))
    m = base.merge(corr[[key, "field", "corrected_value"]],
                   on=[key, "field"], how="outer", indicator=True)
    applied = (m["_merge"] != "left_only").to_numpy(bool)
    value = m["value"].to_numpy(object).copy()
    value[applied] = m["corrected_value"].to_numpy(object)[applied]
    conf = m["confidence"].to_numpy(np.float64).copy()
    conf[applied] = 1.0
    return pd.DataFrame({
        key: m[key].to_numpy(),
        "field": m["field"].to_numpy(object),
        # a correction for a never-extracted field becomes a new scalar
        # row (reference else-branch)
        "kind": m["kind"].fillna("scalar").to_numpy(object),
        "value": value,
        "n_values": m["n_values"].fillna(1).to_numpy(np.int64),
        "confidence": conf,
        "correction_applied": applied,
    })


def apply_corrections(merged: ray.data.Dataset,
                      corrections: ray.data.Dataset,
                      key: str = "conv_id",
                      n_buckets: int = 64) -> ray.data.Dataset:
    """Distributed correction merge-back over a reconciled field table.

    ``merged`` rows: (key, field, kind, value, n_values, confidence) —
    the :func:`..fields.conv_merged_fields` shape. ``corrections``
    rows: (key, field, corrected_value). One key-hash exchange; both
    sides narrow.
    """
    def tag_base(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key, "field", "kind", "value", "n_values",
               "confidence"]].copy()
        b["corrected_value"] = ""
        b["is_corr"] = False
        b["_cb"] = _bucket_of(b[key], n_buckets)
        return b

    def tag_corr(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key, "field", "corrected_value"]].copy()
        b["kind"] = ""
        b["value"] = ""
        b["n_values"] = np.int64(0)
        b["confidence"] = np.float64(0.0)
        b["is_corr"] = True
        b["_cb"] = _bucket_of(b[key], n_buckets)
        return b[[key, "field", "kind", "value", "n_values", "confidence",
                  "corrected_value", "is_corr", "_cb"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        is_c = g["is_corr"].to_numpy(bool)
        return overlay_corrections(
            g.loc[~is_c, [key, "field", "kind", "value", "n_values",
                          "confidence"]],
            g.loc[is_c, [key, "field", "corrected_value"]], key=key)

    return (merged.map_batches(tag_base, batch_format="pandas")
            .union(corrections.map_batches(tag_corr, batch_format="pandas"))
            .groupby("_cb").map_groups(fold, batch_format="pandas"))


def doc_apply_corrections(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """Driver-gradeable instance of the merge-back over the documents
    table: a deterministic two-field "reconciled" base (lang @0.8,
    n_chars @0.9) overlaid with a deterministic reviewer table —
    ``doc_id % 7 == 0`` corrects ``lang`` to ``'xx'``; ``doc_id % 13 ==
    0`` adds the never-extracted field ``review = 'approved'``. Both
    sides derive from the same pruned 3-column read; the oracle is the
    equivalent FULL OUTER JOIN.
    """
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])

    def mk_base(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        lang = b["lang"].fillna("").to_numpy(object)
        nch = b["n_chars"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": np.r_[ids, ids],
            "field": np.r_[np.full(len(ids), "lang", object),
                           np.full(len(ids), "n_chars", object)],
            "kind": "scalar",
            "value": np.r_[lang, nch.astype(str).astype(object)],
            "n_values": np.int64(1),
            "confidence": np.r_[np.full(len(ids), 0.8),
                                np.full(len(ids), 0.9)],
        })

    def mk_corr(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        i7, i13 = ids[ids % 7 == 0], ids[ids % 13 == 0]
        return pd.DataFrame({
            "doc_id": np.r_[i7, i13],
            "field": np.r_[np.full(len(i7), "lang", object),
                           np.full(len(i13), "review", object)],
            "corrected_value": np.r_[np.full(len(i7), "xx", object),
                                     np.full(len(i13), "approved", object)],
        })

    return apply_corrections(
        docs.map_batches(mk_base, batch_format="pandas"),
        docs.map_batches(mk_corr, batch_format="pandas"),
        key="doc_id", n_buckets=n_buckets)


def run_resumable_corrections(
    src_dir: str,
    corrections_path: str,
    out_dir: str,
    num_partitions: int = 16,
    fail_partitions: frozenset[str] = frozenset(),
) -> dict[str, Any]:
    """Extract → merge fields → overlay human corrections, committed
    per conv-hash partition with manifests — the batch resume loop:
    a rerun (e.g. after a crash mid-review-application) skips every
    partition whose corrected output already committed.

    The input fingerprint covers the transcript files AND the
    corrections file, so editing the corrections invalidates prior
    partitions instead of silently resuming over stale reviews.
    """
    paths = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet"))
    fp = input_fingerprint(paths + [corrections_path],
                           {"num_partitions": num_partitions,
                            "partitioner": PARTITIONER_VERSION,
                            "job": "apply_corrections"})
    done = done_partitions(out_dir, fp)
    os.makedirs(out_dir, exist_ok=True)

    corr_df = pq.read_table(
        corrections_path,
        columns=["conv_id", "field", "corrected_value"]).to_pandas()
    corr_ref = ray.put(corr_df)          # broadcast once, read per task

    ds = ray.data.read_parquet(
        paths, columns=["conv_id", "turn_idx", "role", "text", "tool"])

    def skip_done(batch: pa.Table) -> pa.Table:
        pids = partition_ids_for(batch["conv_id"], num_partitions)
        if done:
            batch = batch.filter(
                pa.array([p not in done for p in pids], pa.bool_()))
        return batch

    narrow = (ds.map_batches(skip_done, batch_format="pyarrow")
              .map_batches(extract_turn_batch, batch_format="pyarrow")
              .map_batches(explode_field_values, batch_format="pyarrow"))

    def tag_pid(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "partition_id",
            pa.array(partition_ids_for(batch["conv_id"], num_partitions),
                     pa.string()))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        pid = g["partition_id"].iloc[0]
        if pid in fail_partitions:
            time.sleep(2.0)
            raise RuntimeError(f"injected failure for partition {pid}")
        base = merge_bucket(g.drop(columns=["partition_id"]))
        corr = ray.get(corr_ref)
        corr = corr[corr["conv_id"].isin(set(base["conv_id"]))]
        out = (overlay_corrections(base, corr, key="conv_id")
               .sort_values(["conv_id", "field"], kind="mergesort"))
        pdir = os.path.join(out_dir, f"partition_id={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        write_manifest(out_dir, pid, {
            "input_fingerprint": fp,
            "row_count": int(len(out)),
            "conv_count": int(out["conv_id"].nunique()),
            "n_corrections_applied":
                int(out["correction_applied"].sum()),
            "wall_ms": int((time.time() - t0) * 1000),
            "status": "done",
        })
        return pd.DataFrame({"partition_id": [pid],
                             "row_count": [np.int64(len(out))]})

    manifest_rows = (narrow.map_batches(tag_pid, batch_format="pyarrow")
                     .groupby("partition_id")
                     .map_groups(finalize, batch_format="pandas")
                     .take_all())

    from ..state.manifest import load_manifests
    return {"computed": sorted(r["partition_id"] for r in manifest_rows),
            "skipped": sorted(done),
            "manifests": load_manifests(out_dir)}
