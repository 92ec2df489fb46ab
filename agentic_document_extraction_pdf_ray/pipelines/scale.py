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
from ray.data.aggregate import Min, Sum

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

    narrow = turns.map_batches(
        lambda b: pa.table({
            "conv_id": b["conv_id"], "chunk": b["chunk"],
            "turn_idx": b["turn_idx"], "nkey": b["nkey"],
            "b": pc.cast(b["boundary"], pa.int64()),
        }),
        batch_format="pyarrow").materialize()

    # ---- per-chunk boundary counts + per-conv first-turn flag ----------
    summaries = (narrow.groupby(["conv_id", "chunk"])
                 .aggregate(Sum("b", alias_name="n_b"),
                            Min("turn_idx", alias_name="min_turn")))
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
    firsts_ds = (narrow.map_batches(
        lambda b: b.filter(pc.not_equal(b["nkey"], "")).select(
            ["conv_id", "nkey", "turn_idx"]),
        batch_format="pyarrow")
        .groupby(["conv_id", "nkey"])
        .aggregate(Min("turn_idx", alias_name="first_turn")))
    firsts = {(r["conv_id"], r["nkey"]): r["first_turn"]
              for r in firsts_ds.take_all()}
    # NOTE(scale): at 10^12 turns do NOT driver-collect `firsts`; attach
    # first_turn via a co-partitioned groupby((conv,nkey)) join instead.
    firsts_ref = ray.put(firsts)

    # ---- final pass: per (conv, chunk) local prefix + broadcast offsets -
    def finalize_chunk(group: pa.Table) -> pa.Table:
        bases = ray.get(seg_ref)
        fmap = ray.get(firsts_ref)
        group = group.sort_by("turn_idx")
        conv = group["conv_id"][0].as_py()
        chunk = group["chunk"][0].as_py()
        base = bases[(conv, chunk)]
        boundary = group["boundary"].to_pylist()
        tix = group["turn_idx"].to_pylist()
        keys = group["nkey"].to_pylist()
        n = group.num_rows
        seg_ids = [0] * n
        dup_of: list[dict | None] = [None] * n
        prefix = 0
        for i in range(n):
            if boundary[i]:
                prefix += 1
            seg_ids[i] = base + prefix
            if keys[i]:
                ft = fmap[(conv, keys[i])]
                if ft < tix[i]:
                    dup_of[i] = {"conv_id": conv, "turn_idx": int(ft)}
        out = group.drop_columns(["boundary", "chunk", "salt_key", "nkey"])
        out = out.append_column(pa.field("segment_id", pa.int32()),
                                pa.array(seg_ids, pa.int32()))
        return out.append_column(pa.field("dup_of", DUP_TYPE),
                                 pa.array(dup_of, DUP_TYPE))

    return turns.groupby("salt_key").map_groups(finalize_chunk,
                                                batch_format="pyarrow")
