"""Ray batch/group transforms for the flagship extraction pipeline.

- :func:`extract_turn_batch` — stateless ``map_batches`` fn (Arrow in/out)
  running the pure per-turn core on every row.
- :func:`conv_finalize` — per-conversation ``map_groups`` fn: in-group
  ``turn_idx`` sort, segment prefix-scan, exact dedup, stable output order.

The per-turn core is shared with the single-process oracle
(:mod:`..functions.extract`), so per-turn equality holds by construction;
these stages are responsible for the DISTRIBUTED concerns: restoring
``(conv_id, turn_idx)`` order, conversation grouping, and schema stability.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.extract import extract_turn_cleaned
from ..functions.text import norm_key

# Vectorized clean_text over a whole Arrow column (same semantics as
# functions.text.clean_text: strip control chars, normalize curly quotes,
# drop zero-width chars) — RE2 kernels run once per batch, not per row.
_CONTROL_PAT = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
_ZW_PAT = "[\N{ZERO WIDTH SPACE}-\N{ZERO WIDTH JOINER}\N{ZERO WIDTH NO-BREAK SPACE}]"
_QUOTE_PAIRS = (("“", '"'), ("”", '"'), ("‘", "'"), ("’", "'"))


def _clean_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    out = pc.replace_substring_regex(col, _CONTROL_PAT, "")
    for old, new in _QUOTE_PAIRS:
        out = pc.replace_substring(out, old, new)
    out = pc.replace_substring_regex(out, _ZW_PAT, "")
    return pc.fill_null(out, "")

SPAN_TYPE = pa.list_(pa.struct([
    ("start", pa.int32()), ("end", pa.int32()), ("label", pa.string()),
]))
FIELDS_TYPE = pa.map_(pa.string(), pa.string())
FLAGS_TYPE = pa.list_(pa.string())
DUP_TYPE = pa.struct([("conv_id", pa.string()), ("turn_idx", pa.int32())])

TURN_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", SPAN_TYPE),
    ("fields", FIELDS_TYPE),
    ("flags", FLAGS_TYPE),
    ("confidence", pa.float64()),
    ("n_blocks", pa.int32()),
    ("n_kept", pa.int32()),
    ("boundary", pa.bool_()),
])

FINAL_SCHEMA = pa.schema(
    [f for f in TURN_SCHEMA if f.name != "boundary"]
    + [pa.field("segment_id", pa.int32()), pa.field("dup_of", DUP_TYPE)]
)


def extract_turn_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches body: run the per-turn core on each row."""
    conv_ids = batch["conv_id"].to_pylist()
    turn_idx = batch["turn_idx"].to_pylist()
    roles = batch["role"].to_pylist()
    texts = _clean_column(batch["text"]).to_pylist()
    tools = batch["tool"].to_pylist()

    n = len(texts)
    extracted = [""] * n
    spans: list[list[dict]] = [[] for _ in range(n)]
    fields: list[list[tuple[str, str]]] = [[] for _ in range(n)]
    flags: list[list[str]] = [[] for _ in range(n)]
    conf = [0.0] * n
    n_blocks = [0] * n
    n_kept = [0] * n
    boundary = [False] * n

    for i in range(n):
        t = extract_turn_cleaned(texts[i], roles[i] or "user", tools[i] or "")
        extracted[i] = t["extracted_text"]
        spans[i] = t["spans"]
        fields[i] = list(t["fields"].items())
        flags[i] = t["flags"]
        conf[i] = t["confidence"]
        n_blocks[i] = t["n_blocks"]
        n_kept[i] = t["n_kept"]
        boundary[i] = t["boundary"]

    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "extracted_text": pa.array(extracted, pa.string()),
        "spans": pa.array(spans, SPAN_TYPE),
        "fields": pa.array(fields, FIELDS_TYPE),
        "flags": pa.array(flags, FLAGS_TYPE),
        "confidence": pa.array(conf, pa.float64()),
        "n_blocks": pa.array(n_blocks, pa.int32()),
        "n_kept": pa.array(n_kept, pa.int32()),
        "boundary": pa.array(boundary, pa.bool_()),
    }, schema=TURN_SCHEMA)


def conv_finalize(group: pa.Table) -> pa.Table:
    """Per-conversation pass: order, segment prefix-scan, exact dedup.

    Receives all turns of ONE conv_id (any order), returns them in
    ``turn_idx`` order with ``segment_id`` and ``dup_of`` attached.
    """
    group = group.sort_by("turn_idx")
    n = group.num_rows
    conv_id = group["conv_id"][0].as_py() if n else ""
    boundary = group["boundary"].to_pylist()
    texts = group["extracted_text"].to_pylist()

    seg_ids = [0] * n
    seg = -1
    first_by_key: dict[str, int] = {}
    dup_of: list[dict | None] = [None] * n
    turn_idx = group["turn_idx"].to_pylist()
    for i in range(n):
        if seg < 0 or boundary[i]:
            seg += 1
        seg_ids[i] = max(seg, 0)
        key = norm_key(texts[i])
        if key:
            if key in first_by_key:
                dup_of[i] = {"conv_id": conv_id, "turn_idx": first_by_key[key]}
            else:
                first_by_key[key] = int(turn_idx[i])

    out = group.drop_columns(["boundary"])
    out = out.append_column(pa.field("segment_id", pa.int32()),
                            pa.array(seg_ids, pa.int32()))
    out = out.append_column(pa.field("dup_of", DUP_TYPE),
                            pa.array(dup_of, DUP_TYPE))
    return out


def conv_finalize_block(part: pa.Table) -> pa.Table:
    """Partition-level finalize: all conversations of one hash bucket.

    One task per bucket instead of one ``map_groups`` call per conversation —
    the per-group Arrow overhead (sort_by/append_column on 20-row groups)
    dominates wall time otherwise. A single ordered linear scan computes
    segment prefix-sums and exact dedup for every conv in the bucket;
    state resets at conversation boundaries, so results are identical to
    per-conversation processing.
    """
    n = part.num_rows
    if n == 0:
        return conv_finalize(part)
    conv = part["conv_id"].to_pylist()
    tidx = part["turn_idx"].to_pylist()
    perm = sorted(range(n), key=lambda i: (conv[i], tidx[i]))
    part = part.take(pa.array(perm, pa.int64()))
    conv = [conv[i] for i in perm]
    tidx = [tidx[i] for i in perm]
    boundary = part["boundary"].to_pylist()
    texts = part["extracted_text"].to_pylist()

    seg_ids = [0] * n
    dup_of: list[dict | None] = [None] * n
    cur_conv: str | None = None
    seg = -1
    first_by_key: dict[str, int] = {}
    for i in range(n):
        if conv[i] != cur_conv:
            cur_conv = conv[i]
            seg = -1
            first_by_key = {}
        if seg < 0 or boundary[i]:
            seg += 1
        seg_ids[i] = max(seg, 0)
        key = norm_key(texts[i])
        if key:
            if key in first_by_key:
                dup_of[i] = {"conv_id": cur_conv, "turn_idx": first_by_key[key]}
            else:
                first_by_key[key] = int(tidx[i])

    out = part.drop_columns(["boundary"])
    out = out.append_column(pa.field("segment_id", pa.int32()),
                            pa.array(seg_ids, pa.int32()))
    out = out.append_column(pa.field("dup_of", DUP_TYPE),
                            pa.array(dup_of, DUP_TYPE))
    return out


def conv_summary_block(part: pa.Table) -> pa.Table:
    """Partition-level conversation summaries (one output row per conv)."""
    part = conv_finalize_block(part)
    conv = part["conv_id"].to_pylist()
    conf = part["confidence"].to_pylist()
    segs = part["segment_id"].to_pylist()
    dups = part["dup_of"].is_valid().to_pylist()
    flags_n = pc.list_value_length(part["flags"]).to_pylist()

    out_rows: list[dict] = []
    i = 0
    n = part.num_rows
    while i < n:
        j = i
        total = 0.0
        n_dups = 0
        n_flagged = 0
        while j < n and conv[j] == conv[i]:
            total += conf[j]
            n_dups += 1 if dups[j] else 0
            n_flagged += 1 if flags_n[j] else 0
            j += 1
        cnt = j - i
        out_rows.append({
            "conv_id": conv[i],
            "n_turns": cnt,
            "n_segments": segs[j - 1] + 1,
            "n_dups": n_dups,
            "mean_confidence": round(total / cnt, 6),
            "n_flagged_turns": n_flagged,
        })
        i = j
    return pa.table({
        "conv_id": pa.array([r["conv_id"] for r in out_rows], pa.string()),
        "n_turns": pa.array([r["n_turns"] for r in out_rows], pa.int64()),
        "n_segments": pa.array([r["n_segments"] for r in out_rows], pa.int64()),
        "n_dups": pa.array([r["n_dups"] for r in out_rows], pa.int64()),
        "mean_confidence": pa.array([r["mean_confidence"] for r in out_rows], pa.float64()),
        "n_flagged_turns": pa.array([r["n_flagged_turns"] for r in out_rows], pa.int64()),
    })


def conv_summary(group: pa.Table) -> pa.Table:
    """Per-conversation aggregate row (doc-level confidence analogue,
    ``/root/reference/src/validation/confidence.py:366-400``)."""
    group = group.sort_by("turn_idx")
    n = group.num_rows
    conf = group["confidence"].to_pylist()
    total = 0.0
    for c in conf:               # fixed order → deterministic float sum
        total += c
    n_flagged = int(pc.sum(
        pc.cast(pc.greater(pc.list_value_length(group["flags"]), 0), pa.int32())
    ).as_py() or 0)
    n_dups = sum(1 for d in group["dup_of"].to_pylist() if d is not None)
    return pa.table({
        "conv_id": pa.array([group["conv_id"][0].as_py() if n else ""]),
        "n_turns": pa.array([n], pa.int64()),
        "n_segments": pa.array(
            [int(group["segment_id"][n - 1].as_py()) + 1 if n else 0], pa.int64()),
        "n_dups": pa.array([n_dups], pa.int64()),
        "mean_confidence": pa.array([round(total / n, 6) if n else 0.0], pa.float64()),
        "n_flagged_turns": pa.array([n_flagged], pa.int64()),
    })
