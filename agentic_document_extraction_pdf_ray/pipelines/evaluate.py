"""Golden-dataset evaluation: shuffle join + per-field F1 + injection harness.

Re-expresses the reference's evaluation stack:
- golden join (``/root/reference/src/evaluation/benchmark.py:160-191``) as a
  union + groupby((conv_id, turn_idx)) co-group — the engine's one real
  large-large join class (SURVEY.md §2.4);
- ``AggregateMetrics`` micro/macro precision/recall/F1 + exact-match
  (``src/evaluation/metrics.py:146-257``) as the classic partial+final
  pattern: per-turn field counts → groupby(field).Sum → final arithmetic;
- the hallucination-injection harness
  (``/root/reference/tests/eval/inject/runner.py:35-60``): seeded,
  reproducible mutations (value_swap, phantom_field, field_drop,
  placeholder_inject) with catch-rate / false-positive gates.
"""

from __future__ import annotations

import random
from typing import Any

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions.patterns import flag_value

MATCH_EXACT = "exact"
MATCH_MISSING = "missing"
MATCH_WRONG = "wrong"
MATCH_SPURIOUS = "spurious"


def _fields_of(row: dict[str, Any]) -> dict[str, str]:
    f = row.get("fields")
    if f is None:
        return {}
    return dict(f)


def field_match_counts(extracted: ray.data.Dataset,
                       golden: ray.data.Dataset) -> ray.data.Dataset:
    """Per-field TP/FP/FN counts via a union + co-group join.

    Both sides are tagged and unioned, then grouped on (conv_id, turn_idx);
    each co-group emits one row per field name with partial counts. Scales
    as a single hash shuffle — no broadcast needed for a large golden set.
    """
    def tag(src: str):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "fields": batch["fields"],
                "src": pa.array([src] * batch.num_rows, pa.string()),
            }
            return pa.table(cols)
        return fn

    unioned = (extracted.map_batches(tag("e"), batch_format="pyarrow")
               .union(golden.map_batches(tag("g"), batch_format="pyarrow")))

    def cogroup(group: pa.Table) -> pa.Table:
        srcs = group["src"].to_pylist()
        fields = group["fields"].to_pylist()
        e_fields: dict[str, str] = {}
        g_fields: dict[str, str] = {}
        for s, f in zip(srcs, fields):
            d = dict(f or [])
            if s == "e":
                e_fields.update(d)
            else:
                g_fields.update(d)
        names, tps, fps, fns, ns = [], [], [], [], []
        for name in sorted(set(e_fields) | set(g_fields)):
            ev, gv = e_fields.get(name), g_fields.get(name)
            names.append(name)
            tps.append(1 if (ev is not None and ev == gv) else 0)
            fps.append(1 if (ev is not None and ev != gv) else 0)
            fns.append(1 if (gv is not None and ev != gv) else 0)
            ns.append(1)
        return pa.table({
            "field": pa.array(names, pa.string()),
            "tp": pa.array(tps, pa.int64()),
            "fp": pa.array(fps, pa.int64()),
            "fn": pa.array(fns, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        })

    partials = unioned.groupby(["conv_id", "turn_idx"]).map_groups(
        cogroup, batch_format="pyarrow")
    return partials.groupby("field").aggregate(
        Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
        Sum("fn", alias_name="fn"), Sum("n", alias_name="n"))


def aggregate_metrics(per_field: pd.DataFrame) -> dict[str, Any]:
    """Micro/macro P/R/F1 from per-field counts (reference formulas)."""
    def prf(tp: float, fp: float, fn: float) -> tuple[float, float, float]:
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f1

    tp, fp, fn = per_field["tp"].sum(), per_field["fp"].sum(), per_field["fn"].sum()
    micro_p, micro_r, micro_f1 = prf(tp, fp, fn)
    per_field = per_field.copy()
    per_field[["precision", "recall", "f1"]] = [
        prf(r.tp, r.fp, r.fn) for r in per_field.itertuples()]
    return {
        "micro_precision": round(micro_p, 6),
        "micro_recall": round(micro_r, 6),
        "micro_f1": round(micro_f1, 6),
        "macro_f1": round(float(per_field["f1"].mean()), 6) if len(per_field) else 0.0,
        "per_field": per_field,
    }


# ------------------------------------------------------------ injection harness

MUTATIONS = ("value_swap", "phantom_field", "field_drop", "placeholder_inject")


def inject_mutations(golden_rows: list[dict[str, Any]], seed: int = 42,
                     rate: float = 0.3) -> tuple[list[dict[str, Any]], list[dict]]:
    """Seeded, reproducible mutations of golden rows (reference
    ``tests/eval/inject/runner.py`` semantics). Returns (mutated, log)."""
    rng = random.Random(seed)
    mutated: list[dict[str, Any]] = []
    log: list[dict] = []
    for row in golden_rows:
        fields = dict(_fields_of(row))
        new_row = dict(row)
        if fields and rng.random() < rate:
            kind = rng.choice(MUTATIONS)
            names = sorted(fields)
            applied = True
            if kind == "value_swap":
                if len(names) >= 2:
                    a, b = rng.sample(names, 2)
                    fields[a], fields[b] = fields[b], fields[a]
                else:
                    applied = False
            elif kind == "phantom_field":
                fields[f"phantom_{rng.randint(0, 9)}"] = rng.choice(
                    ["N/A", "TBD", "John Doe", "12345", "XXXX"])
            elif kind == "field_drop":
                fields.pop(rng.choice(names))
            else:  # placeholder_inject
                fields[rng.choice(names)] = rng.choice(["N/A", "TBD", "unknown"])
            if applied:
                log.append({"conv_id": row["conv_id"],
                            "turn_idx": row["turn_idx"], "mutation": kind})
        new_row["fields"] = fields
        mutated.append(new_row)
    return mutated, log


def injection_catch_rate(mutated_rows: list[dict[str, Any]],
                         log: list[dict]) -> dict[str, float]:
    """Fraction of injected placeholder/phantom values the pattern flags
    catch, plus the clean-field false-positive rate."""
    mutated_keys = {(e["conv_id"], e["turn_idx"]): e["mutation"] for e in log}
    caught = 0
    catchable = 0
    fp = 0
    clean = 0
    for row in mutated_rows:
        key = (row["conv_id"], row["turn_idx"])
        kind = mutated_keys.get(key)
        for name, value in _fields_of(row).items():
            flagged = bool(flag_value(value))
            injected = kind in ("phantom_field", "placeholder_inject") and (
                name.startswith("phantom_") or value in
                ("N/A", "TBD", "unknown", "John Doe", "12345", "XXXX"))
            if injected:
                catchable += 1
                caught += 1 if flagged else 0
            else:
                clean += 1
                fp += 1 if flagged else 0
    return {
        "catch_rate": round(caught / catchable, 6) if catchable else 1.0,
        "false_positive_rate": round(fp / clean, 6) if clean else 0.0,
        "n_catchable": catchable,
        "n_clean": clean,
    }


def compare_runs(prev_per_field: pd.DataFrame, cur_per_field: pd.DataFrame,
                 f1_gate: float = 0.02) -> dict[str, Any]:
    """Regression compare: flag per-field F1 drops greater than the gate
    (``/root/reference/src/evaluation/benchmark.py:310-356`` — 0.02 drop
    flagged)."""
    prev = aggregate_metrics(prev_per_field)
    cur = aggregate_metrics(cur_per_field)
    p = prev["per_field"].set_index("field")["f1"]
    c = cur["per_field"].set_index("field")["f1"]
    regressions = []
    for field in sorted(set(p.index) | set(c.index)):
        f1_prev = float(p.get(field, 0.0))
        f1_cur = float(c.get(field, 0.0))
        if f1_prev - f1_cur > f1_gate:
            regressions.append({"field": field, "f1_prev": round(f1_prev, 6),
                                "f1_cur": round(f1_cur, 6),
                                "drop": round(f1_prev - f1_cur, 6)})
    return {
        "micro_f1_prev": prev["micro_f1"], "micro_f1_cur": cur["micro_f1"],
        "regressions": regressions,
        "is_regression": bool(regressions),
    }


def injection_report_distributed(ds, seed: int = 42,
                                 rate: float = 0.3) -> pd.DataFrame:
    """Distributed injection harness: per-batch mutate + count, one tiny
    final fold — no full-output ``take_all`` (VERDICT round 1 #6).

    Row-keyed seeding (md5 of (seed, conv_id, turn_idx)) replaces the
    driver-loop's sequential rng so every task draws independently and
    deterministically; the list-based :func:`inject_mutations` /
    :func:`injection_catch_rate` pair stays as the small-fixture oracle.
    """
    import hashlib as _h

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        caught = catchable = fp = clean = 0
        for conv, tix, fields in zip(batch["conv_id"], batch["turn_idx"],
                                     batch["fields"]):
            fmap = dict(fields)
            row = {"conv_id": conv, "turn_idx": int(tix), "fields": fmap}
            row_seed = int.from_bytes(
                _h.md5(f"{seed}|{conv}|{int(tix)}".encode()).digest()[:8],
                "little")
            mutated, log = inject_mutations([row], seed=row_seed, rate=rate)
            kind = log[0]["mutation"] if log else None
            for name, value in mutated[0]["fields"].items():
                flagged = bool(flag_value(value))
                injected = kind in ("phantom_field", "placeholder_inject") and (
                    name.startswith("phantom_") or value in
                    ("N/A", "TBD", "unknown", "John Doe", "12345", "XXXX"))
                if injected:
                    catchable += 1
                    caught += 1 if flagged else 0
                else:
                    clean += 1
                    fp += 1 if flagged else 0
        return pd.DataFrame({"caught": [caught], "catchable": [catchable],
                             "fp": [fp], "clean": [clean]})

    parts = ds.map_batches(per_batch, batch_format="pandas").to_pandas()
    caught, catchable = int(parts["caught"].sum()), int(parts["catchable"].sum())
    fp, clean = int(parts["fp"].sum()), int(parts["clean"].sum())
    return pd.DataFrame([{
        "catch_rate": round(caught / catchable, 6) if catchable else 1.0,
        "false_positive_rate": round(fp / clean, 6) if clean else 0.0,
        "n_catchable": catchable,
        "n_clean": clean,
    }])
