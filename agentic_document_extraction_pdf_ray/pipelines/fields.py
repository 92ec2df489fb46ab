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


def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Fold one conv-hash bucket: list families append in
    (turn, intra) order with a distinct-turn running-mean confidence;
    scalars keep the strictly-max-confidence earliest turn."""
    g = g.sort_values(["conv_id", "field", "turn_idx", "intra_idx"],
                      kind="mergesort")
    out_rows = []
    for (conv, field, is_list), rows in g.groupby(
            ["conv_id", "field", "is_list"], sort=False):
        if bool(is_list):
            turn_confs = rows.drop_duplicates("turn_idx")["turn_conf"].tolist()
            out_rows.append({
                "conv_id": conv, "field": field, "kind": "list",
                "value": VALUE_SEP.join(rows["value"]),
                "n_values": np.int64(len(rows)),
                # plain-Python fold in turn order — bit-identical to the
                # single-process oracle (pandas .mean() sums pairwise)
                "confidence": round(sum(turn_confs) / len(turn_confs), 6),
            })
        else:
            # strictly-greater replacement == max conf, earliest turn wins
            best = rows.iloc[int(np.lexsort(
                (rows["turn_idx"].to_numpy(),
                 -rows["turn_conf"].to_numpy()))[0])]
            out_rows.append({
                "conv_id": conv, "field": field, "kind": "scalar",
                "value": best["value"],
                "n_values": np.int64(1),
                "confidence": round(float(best["turn_conf"]), 6),
            })
    if not out_rows:
        return pd.DataFrame({
            "conv_id": pd.Series([], dtype=object),
            "field": pd.Series([], dtype=object),
            "kind": pd.Series([], dtype=object),
            "value": pd.Series([], dtype=object),
            "n_values": pd.Series([], dtype=np.int64),
            "confidence": pd.Series([], dtype=np.float64),
        })
    return pd.DataFrame(out_rows)


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
            out.append({
                "conv_id": conv, "field": family, "kind": "list",
                "value": VALUE_SEP.join(v for _, _, v, _ in vals),
                "n_values": len(vals),
                "confidence": round(
                    sum(turn_confs.values()) / len(turn_confs), 6),
            })
        else:
            best = max(vals, key=lambda t: (t[3], -t[0]))
            out.append({
                "conv_id": conv, "field": family, "kind": "scalar",
                "value": best[2], "n_values": 1,
                "confidence": round(best[3], 6),
            })
    return out
