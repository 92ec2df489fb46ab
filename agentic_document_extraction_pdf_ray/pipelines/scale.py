"""Skew handling: salted extraction for mega-conversations, driver-stateless.

A conversation with millions of turns breaks the one-task-per-bucket
finalize (the whole conv's PAYLOAD must fit in one task). This plan keeps
payload tasks bounded by ``chunk = turn_idx // chunk_size`` salting and
computes the conversation-scoped semantics on a NARROW projection
(conv_id, chunk, turn_idx, boundary, key — a few % of the payload bytes):

1. extract once → materialize (spill-backed);
2. narrow decision pass: rows bucketed by ``crc32(conv_id) % B`` so each
   task sees whole conversations in narrow form; an ordered linear scan
   emits per-row decisions ``(conv, turn_idx, segment_id, dup_turn)`` —
   exactly the oracle semantics;
3. join-back: decisions and payload are co-bucketed on
   ``crc32(conv#chunk)`` and merged per bucket — NO driver-side collects
   and NO broadcast side tables, so nothing scales with conversation
   count or dedup-key cardinality.

Memory bounds: payload tasks hold at most ~chunk_size turns per conv per
bucket; narrow tasks hold the (small) narrow rows of the conversations
hashed to them. For conversations whose NARROW form still exceeds a task
(~10^9+ turns in ONE conversation), the chunk-associative decomposition
applies — ``segment_id(t) = B(t) - B(min_turn)`` splits into per-chunk
boundary counts + an in-chunk prefix scan, and dedup into a
``groupby(conv, key).min(turn)`` reduce (SURVEY.md §7.5); git history
(tag: pre-stateless salted) carries that implementation.

Equality with the unsalted pipeline (and therefore the oracle) is asserted
by tests/test_scale.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import bucket_str_column, hash_str_array
from ..functions.text import norm_key
from ..stages.extract import DUP_TYPE, extract_turn_batch
from .extract import read_transcripts

DEFAULT_CHUNK_SIZE = 2000
_N_BUCKETS = 64


def _salt_buckets(conv, chunks) -> np.ndarray:
    """Vectorized salt bucket per (conv, chunk) pair: the conv hash is
    mixed with the chunk index so one conversation's chunks spread over
    many buckets (the whole point of salting)."""
    h = hash_str_array(conv)
    c = np.asarray(chunks, dtype=np.uint64)
    m = h ^ ((c + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9))
    m ^= m >> np.uint64(29)
    return (m % np.uint64(_N_BUCKETS * 4)).astype(np.int64)


def _add_salt_cols(batch: pa.Table, chunk_size: int) -> pa.Table:
    tidx = batch["turn_idx"].to_numpy(zero_copy_only=False)
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    chunks = (tidx.astype(np.int64) // chunk_size)
    keys = [hashlib.md5(norm_key(x).encode()).hexdigest() if norm_key(x) else ""
            for x in batch["extracted_text"].to_pylist()]
    buckets = _salt_buckets(conv, chunks)
    batch = batch.append_column("chunk", pa.array(chunks, pa.int64()))
    batch = batch.append_column("salt_bucket", pa.array(buckets, pa.int64()))
    return batch.append_column("nkey", pa.array(keys, pa.string()))


def extract_pipeline_salted(paths: str | list[str],
                            chunk_size: int = DEFAULT_CHUNK_SIZE,
                            batch_size: int = 4096) -> ray.data.Dataset:
    """Flagship semantics under salted repartitioning (skew-safe)."""
    return salted_pipeline_from_raw(read_transcripts(paths), chunk_size,
                                    batch_size)


def salted_pipeline_from_raw(raw: ray.data.Dataset,
                             chunk_size: int = DEFAULT_CHUNK_SIZE,
                             batch_size: int = 4096) -> ray.data.Dataset:
    """Salted plan over an already-read (possibly filtered) raw dataset."""
    turns = raw.map_batches(
        extract_turn_batch, batch_format="pyarrow", batch_size=batch_size)
    turns = turns.map_batches(lambda b: _add_salt_cols(b, chunk_size),
                              batch_format="pyarrow")
    # Extraction runs ONCE; the narrow decision pass and the payload
    # join-back both consume this materialized (spill-backed) dataset.
    turns = turns.materialize()
    sch = turns.schema()
    payload_types = dict(zip(sch.names, sch.types))
    payload_cols = [n for n in sch.names if n not in ("boundary", "chunk", "nkey")]

    # ---- narrow decision pass: whole conversations per conv-hash bucket
    def narrow(b: pa.Table) -> pa.Table:
        buckets = bucket_str_column(b["conv_id"], _N_BUCKETS)
        return pa.table({
            "conv_id": b["conv_id"], "chunk": b["chunk"],
            "turn_idx": b["turn_idx"], "nkey": b["nkey"],
            "boundary": b["boundary"],
            "conv_bucket": pa.array(buckets, pa.int64()),
        })

    def decide(group: pa.Table) -> pa.Table:
        """Ordered linear scan over the bucket's conversations (narrow)."""
        n = group.num_rows
        conv = group["conv_id"].to_pylist()
        tix = group["turn_idx"].to_pylist()
        perm = pa.array(sorted(range(n), key=lambda i: (conv[i], tix[i])),
                        pa.int64())
        conv = [conv[i.as_py()] for i in perm]
        tix = [tix[i.as_py()] for i in perm]
        chunks = group["chunk"].take(perm).to_pylist()
        boundary = group["boundary"].take(perm).to_pylist()
        keys = group["nkey"].take(perm).to_pylist()
        seg_ids = [0] * n
        dup_turn = [-1] * n
        cur: str | None = None
        seg = -1
        first_by_key: dict[str, int] = {}
        for i in range(n):
            if conv[i] != cur:
                cur = conv[i]
                seg = -1
                first_by_key = {}
            if seg < 0 or boundary[i]:
                seg += 1
            seg_ids[i] = max(seg, 0)
            k = keys[i]
            if k:
                if k in first_by_key:
                    dup_turn[i] = first_by_key[k]
                else:
                    first_by_key[k] = int(tix[i])
        buckets = _salt_buckets(conv, chunks)
        return pa.table({
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(tix, pa.int32()),
            "segment_id": pa.array(seg_ids, pa.int32()),
            "dup_turn": pa.array(dup_turn, pa.int32()),
            "salt_bucket": pa.array(buckets, pa.int64()),
        })

    decisions = (turns.map_batches(narrow, batch_format="pyarrow")
                 .groupby("conv_bucket")
                 .map_groups(decide, batch_format="pyarrow"))

    # ---- join-back per salt bucket: payload ∪ decisions, co-grouped -----
    def tag_payload(b: pa.Table) -> pa.Table:
        t = b.select(payload_cols)
        t = t.append_column("segment_id", pa.nulls(b.num_rows, pa.int32()))
        t = t.append_column("dup_turn", pa.nulls(b.num_rows, pa.int32()))
        return t.append_column("_side",
                               pa.array(["p"] * b.num_rows, pa.string()))

    def tag_decisions(b: pa.Table) -> pa.Table:
        cols = {}
        for name in payload_cols:
            if name in ("conv_id", "turn_idx", "salt_bucket"):
                cols[name] = b[name]
            else:
                cols[name] = pa.nulls(b.num_rows, payload_types[name])
        t = pa.table(cols)
        t = t.append_column("segment_id", b["segment_id"])
        t = t.append_column("dup_turn", b["dup_turn"])
        return t.append_column("_side",
                               pa.array(["d"] * b.num_rows, pa.string()))

    unioned = (turns.map_batches(tag_payload, batch_format="pyarrow")
               .union(decisions.map_batches(tag_decisions,
                                            batch_format="pyarrow")))

    def merge_bucket(group: pa.Table) -> pa.Table:
        sides = group["_side"].to_pylist()
        conv = group["conv_id"].to_pylist()
        tix = group["turn_idx"].to_pylist()
        seg_col = group["segment_id"].to_pylist()
        dup_col = group["dup_turn"].to_pylist()
        dec_seg: dict[tuple, int] = {}
        dec_dup: dict[tuple, int] = {}
        for i in range(group.num_rows):
            if sides[i] == "d":
                key = (conv[i], tix[i])
                dec_seg[key] = seg_col[i]
                dec_dup[key] = dup_col[i]
        mask = pa.array([s == "p" for s in sides], pa.bool_())
        pay = group.filter(mask)
        pconv = pay["conv_id"].to_pylist()
        ptix = pay["turn_idx"].to_pylist()
        seg = [dec_seg[(c, t)] for c, t in zip(pconv, ptix)]
        dup = [dec_dup[(c, t)] for c, t in zip(pconv, ptix)]
        dup_of = [None if d < 0 else {"conv_id": c, "turn_idx": d}
                  for c, d in zip(pconv, dup)]
        out = pay.drop_columns(["segment_id", "dup_turn", "_side",
                                "salt_bucket"])
        out = out.append_column(pa.field("segment_id", pa.int32()),
                                pa.array(seg, pa.int32()))
        return out.append_column(pa.field("dup_of", DUP_TYPE),
                                 pa.array(dup_of, DUP_TYPE))

    return unioned.groupby("salt_bucket").map_groups(merge_bucket,
                                                     batch_format="pyarrow")
