"""Skew handling: salted two-phase extraction for mega-conversations.

A conversation with millions of turns breaks the one-task-per-bucket
finalize (the whole conv must fit in one task). This variant salts the
shuffle key to ``(conv_id, chunk = turn_idx // chunk_size)`` so no task
ever holds more than ``chunk_size`` turns of one conversation, and computes
the conversation-scoped semantics ASSOCIATIVELY (SURVEY.md §7.5):

- ``segment_id(t) = B(t) - B(min_turn)`` where ``B`` is the prefix count of
  boundary turns — decomposed into per-chunk boundary counts (narrow
  shuffle) + an in-chunk prefix scan;
- ``dup_of(t) = argmin turn with the same normalized key`` — a
  ``groupby(conv, key).min(turn)`` reduce.

The extracted dataset is materialized once (object store, spill-backed) and
re-consumed by one narrow metadata pass + the final salted pass. Small side
tables (per-chunk segment bases, per-key firsts) are broadcast via
``ray.put``; at 10^12 turns the firsts broadcast must become a
co-partitioned join on (conv_id, key) — noted inline.

Equality with the unsalted pipeline (and therefore the oracle) is asserted
by tests/test_scale.py.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.text import norm_key
from ..stages.extract import DUP_TYPE, extract_turn_batch
from .extract import read_transcripts

DEFAULT_CHUNK_SIZE = 2000


def _add_salt_cols(batch: pa.Table, chunk_size: int) -> pa.Table:
    tidx = batch["turn_idx"].to_pylist()
    conv = batch["conv_id"].to_pylist()
    chunks = [t // chunk_size for t in tidx]
    keys = [hashlib.md5(norm_key(x).encode()).hexdigest() if norm_key(x) else ""
            for x in batch["extracted_text"].to_pylist()]
    batch = batch.append_column("chunk", pa.array(chunks, pa.int64()))
    batch = batch.append_column("salt_key", pa.array(
        [f"{c}#{ch:08d}" for c, ch in zip(conv, chunks)], pa.string()))
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
    # Extraction runs ONCE; the narrow metadata pass and the final salted
    # pass both consume this materialized (spill-backed) dataset.
    turns = turns.materialize()

    # High-cardinality reduces go through hash buckets: a bare
    # groupby(high-card key).aggregate pays per-group reduce overhead
    # (see relational.grouped_sum_bucketed); bucket tasks run vectorized
    # pandas group-aggregates instead.
    n_buckets = 64

    def _narrow(b: pa.Table) -> pa.Table:
        import zlib as _zlib
        buckets = [_zlib.crc32(c.encode()) % n_buckets
                   for c in b["conv_id"].to_pylist()]
        return pa.table({
            "conv_id": b["conv_id"], "chunk": b["chunk"],
            "turn_idx": b["turn_idx"], "nkey": b["nkey"],
            "b": pc.cast(b["boundary"], pa.int64()),
            "_bucket": pa.array(buckets, pa.int64()),
        })

    narrow = turns.map_batches(_narrow, batch_format="pyarrow").materialize()

    # ---- per-chunk boundary counts + per-conv first-turn flag ----------
    def bucket_summaries(g):
        return (g.groupby(["conv_id", "chunk"], as_index=False)
                .agg(n_b=("b", "sum"), min_turn=("turn_idx", "min")))

    summaries = narrow.groupby("_bucket").map_groups(
        bucket_summaries, batch_format="pandas")
    summ_rows = summaries.take_all()
    summ_rows.sort(key=lambda r: (r["conv_id"], r["chunk"]))
    mt: dict[str, int] = {}
    for r in summ_rows:
        c = r["conv_id"]
        mt[c] = r["min_turn"] if c not in mt else min(mt[c], r["min_turn"])
    mt_ref = ray.put(mt)

    def only_first(batch: pa.Table) -> pa.Table:
        m = ray.get(mt_ref)
        conv = batch["conv_id"].to_pylist()
        tix = batch["turn_idx"].to_pylist()
        bb = batch["b"].to_pylist()
        rows = [(c, int(b)) for c, t, b in zip(conv, tix, bb) if m[c] == t]
        return pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "b_min": pa.array([r[1] for r in rows], pa.int64()),
        })
    bmin = {r["conv_id"]: r["b_min"]
            for r in narrow.map_batches(only_first, batch_format="pyarrow").take_all()}

    # segment base per (conv, chunk) = (Σ n_b of earlier chunks) - B(min_turn)
    seg_base: dict[tuple[str, int], int] = {}
    cur = None
    acc = 0
    for r in summ_rows:
        if r["conv_id"] != cur:
            cur = r["conv_id"]
            acc = 0
        seg_base[(cur, r["chunk"])] = acc - bmin[cur]
        acc += r["n_b"]
    seg_ref = ray.put(seg_base)

    # ---- global first turn per (conv, key) ------------------------------
    def bucket_firsts(g):
        g = g[g["nkey"] != ""]
        return (g.groupby(["conv_id", "nkey"], as_index=False)
                .agg(first_turn=("turn_idx", "min")))

    firsts_ds = narrow.groupby("_bucket").map_groups(
        bucket_firsts, batch_format="pandas")
    firsts = {(r["conv_id"], r["nkey"]): r["first_turn"]
              for r in firsts_ds.take_all()}
    # NOTE(scale): at 10^12 turns do NOT driver-collect `firsts`; attach
    # first_turn via a co-partitioned groupby((conv,nkey)) join instead.
    firsts_ref = ray.put(firsts)

    # ---- final pass: per (conv, chunk) local prefix + broadcast offsets.
    # Chunks are bucketed (crc32(salt_key) % B) so one task finalizes many
    # chunks in a single ordered linear scan — state resets at every
    # (conv, chunk) change, so results equal per-chunk processing without
    # the per-group reduce overhead at high chunk cardinality.
    def add_salt_bucket(b: pa.Table) -> pa.Table:
        import zlib as _zlib
        buckets = [_zlib.crc32(sk.encode()) % (n_buckets * 4)
                   for sk in b["salt_key"].to_pylist()]
        return b.append_column("salt_bucket", pa.array(buckets, pa.int64()))

    def finalize_bucket(group: pa.Table) -> pa.Table:
        bases = ray.get(seg_ref)
        fmap = ray.get(firsts_ref)
        n = group.num_rows
        conv = group["conv_id"].to_pylist()
        tix = group["turn_idx"].to_pylist()
        perm = sorted(range(n), key=lambda i: (conv[i], tix[i]))
        group = group.take(pa.array(perm, pa.int64()))
        conv = [conv[i] for i in perm]
        tix = [tix[i] for i in perm]
        chunks = group["chunk"].to_pylist()
        boundary = group["boundary"].to_pylist()
        keys = group["nkey"].to_pylist()
        seg_ids = [0] * n
        dup_of: list[dict | None] = [None] * n
        cur: tuple | None = None
        base = 0
        prefix = 0
        for i in range(n):
            ck = (conv[i], chunks[i])
            if ck != cur:
                cur = ck
                base = bases[ck]
                prefix = 0
            if boundary[i]:
                prefix += 1
            seg_ids[i] = base + prefix
            if keys[i]:
                ft = fmap[(conv[i], keys[i])]
                if ft < tix[i]:
                    dup_of[i] = {"conv_id": conv[i], "turn_idx": int(ft)}
        out = group.drop_columns(["boundary", "chunk", "salt_key", "nkey",
                                  "salt_bucket"])
        out = out.append_column(pa.field("segment_id", pa.int32()),
                                pa.array(seg_ids, pa.int32()))
        return out.append_column(pa.field("dup_of", DUP_TYPE),
                                 pa.array(dup_of, DUP_TYPE))

    salted = turns.map_batches(add_salt_bucket, batch_format="pyarrow")
    return salted.groupby("salt_bucket").map_groups(finalize_bucket,
                                                    batch_format="pyarrow")
