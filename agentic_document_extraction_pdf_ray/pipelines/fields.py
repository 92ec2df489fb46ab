"""Cross-turn field merging: the multi-page LIST-append merge.

Mirrors ``/root/reference/src/agents/extractor.py:1551-1666``
(``_merge_page_extractions``): LIST/TABLE-typed fields concatenate their
values across pages in page order with a true running-mean confidence;
scalar fields keep the value from the strictly-highest-confidence page
(ties keep the earlier page). Here "page" is a turn and the field TYPE is
derived from the extractor's key shape: indexed families
(``date_0 / amount_1 / name_0 / npi_0 / cpt_0 / icd10_0`` …) are
list-typed — multiple values per conversation accumulate; un-indexed keys
(``tool.status`` …) are scalars.

Scale shape (SURVEY.md §7.5 — the associative formulation): the payload
stage explodes each turn's fields into NARROW value rows carrying their
full ordering key ``(conv_id, turn_idx, field, intra_idx)``; a single
bounded conv-hash-bucket reduce then sorts and folds. Because every row
carries its ordering key, the fold is independent of row arrival order —
no salting needed even for mega-conversations (a conversation's VALUE
rows are a few % of its payload bytes, the same narrow-pass argument as
pipelines/scale.py), and the result is bit-identical however the
extraction stage was partitioned.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import bucket_str_column
from ..stages.extract import extract_turn_batch
from .extract import read_transcripts

_LIST_KEY_RE = re.compile(r"^(.+)_(\d+)$")
VALUE_SEP = "; "


def split_field_key(key: str) -> tuple[str, int, bool]:
    """(family, intra_idx, is_list). ``date_3`` → ('date', 3, True);
    ``tool.status`` → ('tool.status', 0, False)."""
    m = _LIST_KEY_RE.match(key)
    if m:
        return m.group(1), int(m.group(2)), True
    return key, 0, False


def explode_field_values(batch: pa.Table) -> pa.Table:
    """Per-turn fields → narrow value rows with full ordering keys."""
    conv = batch["conv_id"].to_pylist()
    tix = batch["turn_idx"].to_pylist()
    conf = batch["confidence"].to_pylist()
    fields = batch["fields"].to_pylist()
    o_conv: list[str] = []
    o_tix: list[int] = []
    o_field: list[str] = []
    o_intra: list[int] = []
    o_val: list[str] = []
    o_conf: list[float] = []
    o_list: list[bool] = []
    for i, fmap in enumerate(fields):
        if not fmap:
            continue
        items = fmap.items() if isinstance(fmap, dict) else fmap
        for key, value in items:
            family, intra, is_list = split_field_key(key)
            o_conv.append(conv[i])
            o_tix.append(tix[i])
            o_field.append(family)
            o_intra.append(intra)
            o_val.append(value)
            o_conf.append(conf[i])
            o_list.append(is_list)
    return pa.table({
        "conv_id": pa.array(o_conv, pa.string()),
        "turn_idx": pa.array(o_tix, pa.int32()),
        "field": pa.array(o_field, pa.string()),
        "intra_idx": pa.array(o_intra, pa.int32()),
        "value": pa.array(o_val, pa.string()),
        "turn_conf": pa.array(o_conf, pa.float64()),
        "is_list": pa.array(o_list, pa.bool_()),
    })


def _round6(vals) -> np.ndarray:
    return np.round(np.asarray(vals, np.float64), 6)


def _seg_mean6(vals: np.ndarray, starts: np.ndarray,
               counts: np.ndarray) -> np.ndarray:
    """Per-segment mean of ``vals`` rounded to 6 decimals. ONE summation
    kernel (``np.add.reduceat``) shared by the distributed fold and the
    single-process reference, so both sides sum in identical order and
    the equality tests compare bit-identical floats."""
    if len(vals) == 0:
        return np.zeros(0, np.float64)
    sums = np.add.reduceat(np.asarray(vals, np.float64), starts)
    return _round6(sums / counts)


_EMPTY_MERGED = {
    "conv_id": object, "field": object, "kind": object,
    "value": object, "n_values": np.int64, "confidence": np.float64,
}


def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Fold one conv-hash bucket: list families append in
    (turn, intra) order with a distinct-turn mean confidence; scalars
    keep the strictly-max-confidence earliest turn. Fully vectorized
    (VERDICT round 2 #1): groupby-agg string joins for the list append,
    segment-sum (``_seg_mean6``) for confidences, and a stable
    sort + ``drop_duplicates`` argmax for scalars — no per-group dict
    building."""
    g = g.sort_values(["conv_id", "field", "turn_idx", "intra_idx"],
                      kind="mergesort")
    frames: list[pd.DataFrame] = []

    lst = g[g["is_list"]]
    if len(lst):
        agg = (lst.groupby(["conv_id", "field"], sort=False)
               .agg(value=("value", VALUE_SEP.join),
                    n_values=("value", "size"))
               .reset_index())
        # distinct-turn confidences, still in (conv, field, turn) order
        d = lst.drop_duplicates(["conv_id", "field", "turn_idx"])
        conv_a = d["conv_id"].to_numpy()
        field_a = d["field"].to_numpy()
        change = np.empty(len(d), bool)
        change[0] = True
        change[1:] = (conv_a[1:] != conv_a[:-1]) | (field_a[1:] != field_a[:-1])
        starts = np.flatnonzero(change)
        seg_counts = np.diff(np.append(starts, len(d)))
        # groupby(sort=False) over the sorted frame iterates groups in
        # first-appearance == segment order, so agg rows align 1:1 with
        # the boundary segments
        assert len(agg) == len(starts)
        frames.append(pd.DataFrame({
            "conv_id": agg["conv_id"].to_numpy(),
            "field": agg["field"].to_numpy(),
            "kind": "list",
            "value": agg["value"].to_numpy(),
            "n_values": agg["n_values"].to_numpy(np.int64),
            "confidence": _seg_mean6(d["turn_conf"].to_numpy(np.float64),
                                     starts, seg_counts),
        }))

    scl = g[~g["is_list"]]
    if len(scl):
        # strictly-greater replacement == max conf, earliest turn wins:
        # stable sort on (-conf, turn) then keep-first per (conv, field)
        scl = scl.assign(_negc=-scl["turn_conf"].to_numpy(np.float64))
        best = (scl.sort_values(["conv_id", "field", "_negc", "turn_idx"],
                                kind="mergesort")
                .drop_duplicates(["conv_id", "field"], keep="first"))
        frames.append(pd.DataFrame({
            "conv_id": best["conv_id"].to_numpy(),
            "field": best["field"].to_numpy(),
            "kind": "scalar",
            "value": best["value"].to_numpy(),
            "n_values": np.ones(len(best), np.int64),
            "confidence": _round6(best["turn_conf"].to_numpy(np.float64)),
        }))

    if not frames:
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in _EMPTY_MERGED.items()})
    out = pd.concat(frames, ignore_index=True)
    return out[list(_EMPTY_MERGED)]


def conv_merged_fields(paths: str | list[str],
                       n_buckets: int = 64) -> ray.data.Dataset:
    """Conversation-level merged field table (one row per conv × family)."""
    turns = read_transcripts(paths).map_batches(extract_turn_batch,
                                                batch_format="pyarrow")
    narrow = turns.map_batches(explode_field_values, batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("_cb", pa.array(
            bucket_str_column(b["conv_id"], n_buckets), pa.int64()))

    return (narrow.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_cb").map_groups(merge_bucket, batch_format="pandas"))


def merged_fields_reference(turn_rows: list[dict]) -> list[dict]:
    """Single-process oracle: the same merge over already-extracted turn
    rows (dicts with conv_id/turn_idx/fields/confidence), for equality
    tests against the distributed plan."""
    by_key: dict[tuple, list] = {}
    for r in sorted(turn_rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        fmap = r["fields"]
        items = fmap.items() if isinstance(fmap, dict) else fmap
        for key, value in items:
            family, intra, is_list = split_field_key(key)
            by_key.setdefault((r["conv_id"], family, is_list), []).append(
                (r["turn_idx"], intra, value, r["confidence"]))
    out = []
    for (conv, family, is_list), vals in sorted(by_key.items()):
        vals.sort(key=lambda t: (t[0], t[1]))
        if is_list:
            turn_confs = {t: c for t, _, _, c in vals}
            confs = np.asarray(list(turn_confs.values()), np.float64)
            out.append({
                "conv_id": conv, "field": family, "kind": "list",
                "value": VALUE_SEP.join(v for _, _, v, _ in vals),
                "n_values": len(vals),
                # same segment-sum kernel as the distributed fold
                # (_seg_mean6) so the equality tests compare identical
                # float bits
                "confidence": float(_seg_mean6(
                    confs, np.array([0]), np.array([len(confs)]))[0]),
            })
        else:
            best = max(vals, key=lambda t: (t[3], -t[0]))
            out.append({
                "conv_id": conv, "field": family, "kind": "scalar",
                "value": best[2], "n_values": 1,
                "confidence": float(_round6(best[3])),
            })
    return out
