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
    # dedup key: 64-bit vectorized siphash of the normalized text (r3 —
    # replaces a per-row md5-hex loop and shrinks the narrow rows 4x;
    # norm_key itself stays per-row Python because its semantics are
    # pinned to the oracle). nkey_valid marks non-empty keys — a hash
    # value carries no empty sentinel.
    norm = [norm_key(x) for x in batch["extracted_text"].to_pylist()]
    valid = np.fromiter((k != "" for k in norm), np.bool_, len(norm))
    keys = hash_str_array(np.asarray(norm, object)).view(np.int64)
    buckets = _salt_buckets(conv, chunks)
    batch = batch.append_column("chunk", pa.array(chunks, pa.int64()))
    batch = batch.append_column("salt_bucket", pa.array(buckets, pa.int64()))
    batch = batch.append_column("nkey", pa.array(keys, pa.int64()))
    return batch.append_column("nkey_valid", pa.array(valid, pa.bool_()))


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
    payload_cols = [n for n in sch.names
                    if n not in ("boundary", "chunk", "nkey", "nkey_valid")]

    # ---- narrow decision pass: whole conversations per conv-hash bucket
    def narrow(b: pa.Table) -> pa.Table:
        buckets = bucket_str_column(b["conv_id"], _N_BUCKETS)
        return pa.table({
            "conv_id": b["conv_id"], "chunk": b["chunk"],
            "turn_idx": b["turn_idx"], "nkey": b["nkey"],
            "nkey_valid": b["nkey_valid"],
            "boundary": b["boundary"],
            "conv_bucket": pa.array(buckets, pa.int64()),
        })

    def decide(group: pa.Table) -> pa.Table:
        """Vectorized per-conversation decisions over the bucket (r3 —
        replaces a Python lambda sort + per-row dict scan): lexsort on
        (conv code, turn), segment ids via a grouped cumulative sum of
        boundary/first-row increments, dup turns via a grouped
        first-occurrence transform."""
        import pandas as pd
        n = group.num_rows
        if n == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "segment_id": pa.array([], pa.int32()),
                "dup_turn": pa.array([], pa.int32()),
                "salt_bucket": pa.array([], pa.int64()),
            })
        conv = group["conv_id"].to_numpy(zero_copy_only=False)
        tix = group["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        # conversation order among conversations is irrelevant (decisions
        # are per-conv), so sort by factorize codes — no string compares
        codes = pd.factorize(conv)[0]
        order = np.lexsort((tix, codes))
        codes_s = codes[order]
        tix_s = tix[order]
        conv_s = conv[order]
        boundary = np.asarray(
            group["boundary"].to_numpy(zero_copy_only=False), bool)[order]
        nkey = group["nkey"].to_numpy(zero_copy_only=False)[order]
        valid = np.asarray(
            group["nkey_valid"].to_numpy(zero_copy_only=False), bool)[order]
        chunks = group["chunk"].to_numpy(zero_copy_only=False)[order]

        is_first = np.empty(n, bool)
        is_first[0] = True
        is_first[1:] = codes_s[1:] != codes_s[:-1]
        inc = boundary | is_first
        cs = np.cumsum(inc)
        starts = np.flatnonzero(is_first)
        counts = np.diff(np.append(starts, n))
        base = cs[starts] - inc[starts].astype(np.int64)
        seg = cs - np.repeat(base, counts) - 1

        dup_turn = np.full(n, -1, np.int64)
        vidx = np.flatnonzero(valid)
        if len(vidx):
            sub = pd.DataFrame({"c": codes_s[vidx], "k": nkey[vidx],
                                "t": tix_s[vidx]})
            g = sub.groupby(["c", "k"], sort=False)
            first = g["t"].transform("first").to_numpy()
            occ = g.cumcount().to_numpy()
            dup_turn[vidx] = np.where(occ > 0, first, -1)

        buckets = _salt_buckets(conv_s, chunks)
        return pa.table({
            "conv_id": pa.array(conv_s, pa.string()),
            "turn_idx": pa.array(tix_s.astype(np.int32), pa.int32()),
            "segment_id": pa.array(seg.astype(np.int32), pa.int32()),
            "dup_turn": pa.array(dup_turn.astype(np.int32), pa.int32()),
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
