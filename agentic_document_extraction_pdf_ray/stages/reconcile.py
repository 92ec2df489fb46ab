"""Dual-pass comparison + deterministic field reconciliation.

The heart of the reference engine (SURVEY.md §2.9), re-expressed as pure
per-row columnar operators:

- :func:`dual_pass_compare` — the threshold ladder of
  ``DualPassComparator.compare``
  (``/root/reference/src/validation/dual_pass.py:132-533``): exact ≥ .99 /
  fuzzy ≥ .85 / partial ≥ .50 / mismatch, confidence multipliers
  1.0 / 0.95 / 0.75 / 0.5, one-sided presence ·0.8.
- :func:`reconcile_fields` — ``HeterogeneousReconciler.reconcile``
  (``/root/reference/src/agents/reconciler.py:260-541``): deterministic
  field-by-field fusion over the SORTED union of field names
  (:293 — sorted for reproducibility): single-pass coverage gap keeps
  native confidence; exact match boosts (max + 0.05 capped); placeholder
  candidates are dropped (·0.9 penalty); otherwise the higher-confidence
  candidate wins at ·0.5 with both preserved.
- :func:`run_dual_pass` — Ray stage running two extraction passes per turn
  (pass2 re-reads the UNSEGMENTED cleaned text — the reference's "second
  heterogeneous view"), reconciling them, and emitting agreement metrics.

Numeric agreement follows ``_values_agree``
(``/root/reference/src/agents/reconciler.py:153-170``): relative tolerance
1e-4, case/whitespace-insensitive strings.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import pyarrow as pa

from ..functions.extract import extract_fields
from ..functions.patterns import is_placeholder
from ..functions.text import clean_text, normalize_whitespace, similarity_ratio

EXACT_T = 0.99
FUZZY_T = 0.85
PARTIAL_T = 0.50

MULT = {"exact": 1.0, "fuzzy": 0.95, "partial": 0.75, "mismatch": 0.5}
ONE_SIDED_MULT = 0.8


class CompareResult(NamedTuple):
    level: str            # exact | fuzzy | partial | mismatch | single_pass
    value: str            # merged value
    confidence: float
    source: str           # pass1 | pass2 | both


def _values_agree_numeric(v1: str, v2: str) -> bool | None:
    try:
        f1, f2 = float(v1), float(v2)
    except (TypeError, ValueError):
        return None
    if f1 == f2:
        return True
    denom = max(abs(f1), abs(f2), 1e-12)
    return abs(f1 - f2) / denom <= 1e-4


def dual_pass_compare(v1: str | None, c1: float, v2: str | None,
                      c2: float) -> CompareResult:
    """Threshold-ladder comparison of one field across two passes."""
    if v1 is None and v2 is None:
        return CompareResult("mismatch", "", 0.0, "both")
    if v2 is None:
        return CompareResult("single_pass", v1 or "", round(c1 * ONE_SIDED_MULT, 6), "pass1")
    if v1 is None:
        return CompareResult("single_pass", v2, round(c2 * ONE_SIDED_MULT, 6), "pass2")

    num = _values_agree_numeric(v1, v2)
    if num is True:
        sim = 1.0
    elif num is False:
        sim = 0.0
    else:
        sim = similarity_ratio(normalize_whitespace(v1), normalize_whitespace(v2))

    if sim >= EXACT_T:
        level = "exact"
    elif sim >= FUZZY_T:
        level = "fuzzy"
    elif sim >= PARTIAL_T:
        level = "partial"
    else:
        level = "mismatch"

    if c1 >= c2:
        value, source = v1, "pass1"
        conf = c1
    else:
        value, source = v2, "pass2"
        conf = c2
    return CompareResult(level, value, round(conf * MULT[level], 6), source)


def reconcile_fields(pass1: dict[str, str], c1: float,
                     pass2: dict[str, str], c2: float) -> dict[str, Any]:
    """Deterministic fusion over the sorted union of field names."""
    merged: dict[str, str] = {}
    levels: dict[str, str] = {}
    confs: dict[str, float] = {}
    disagreements = 0
    agreements = 0
    for name in sorted(set(pass1) | set(pass2)):
        r = dual_pass_compare(pass1.get(name), c1, pass2.get(name), c2)
        value = r.value
        conf = r.confidence
        if value and is_placeholder(value):
            # tiebreak 4: placeholder candidates penalised (reconciler :448)
            alt = pass2.get(name) if r.source == "pass1" else pass1.get(name)
            if alt and not is_placeholder(alt):
                value = alt
            conf = round(conf * 0.9, 6)
        if r.level == "exact":
            conf = round(min(max(c1, c2) + 0.05, 1.0), 6)
            agreements += 1
        elif r.level in ("partial", "mismatch"):
            disagreements += 1
        merged[name] = value
        levels[name] = r.level
        confs[name] = conf
    total = len(merged)
    return {
        "fields": merged,
        "levels": levels,
        "field_confidences": confs,
        "agreement_rate": round(agreements / total, 6) if total else 1.0,
        "disagreement_count": disagreements,
    }


def run_dual_pass_batch(batch: pa.Table) -> pa.Table:
    """Two heterogeneous extraction views per turn + reconciliation.

    Pass 1: fields from the segmented main content (``extracted_text``).
    Pass 2: fields from the full cleaned text (no boilerplate strip).
    """
    texts = batch["text"].to_pylist() if "text" in batch.column_names else None
    extracted = batch["extracted_text"].to_pylist()
    conf = batch["confidence"].to_pylist()

    out_fields: list[list[tuple[str, str]]] = []
    out_levels: list[list[tuple[str, str]]] = []
    agree: list[float] = []
    disagree: list[int] = []
    for i, main in enumerate(extracted):
        f1, _, _ = extract_fields(main or "")
        full = normalize_whitespace(clean_text(texts[i])) if texts else (main or "")
        f2, _, _ = extract_fields(full)
        rec = reconcile_fields(f1, conf[i], f2, round(conf[i] * 0.95, 6))
        out_fields.append(sorted(rec["fields"].items()))
        out_levels.append(sorted(rec["levels"].items()))
        agree.append(rec["agreement_rate"])
        disagree.append(rec["disagreement_count"])

    mt = pa.map_(pa.string(), pa.string())
    out = batch.select([c for c in ("conv_id", "turn_idx", "extracted_text",
                                    "confidence") if c in batch.column_names])
    out = out.append_column("merged_fields", pa.array(out_fields, mt))
    out = out.append_column("match_levels", pa.array(out_levels, mt))
    out = out.append_column("agreement_rate", pa.array(agree, pa.float64()))
    out = out.append_column("disagreement_count",
                           pa.array(disagree, pa.int64()))
    return out


CONSENSUS_BOOST = 1.05


def consensus_fields(pass1: dict[str, str], pass2: dict[str, str],
                     conf: float,
                     critical: tuple[str, ...] = ()) -> dict[str, Any]:
    """Consensus check on critical fields: agreement boosts confidence
    ·1.05 (capped), disagreement marks the field for a focused tie-break
    (``/root/reference/src/extraction/multi_record.py:1198-1418``)."""
    keys = sorted(critical) if critical else sorted(set(pass1) & set(pass2))
    agreed = [k for k in keys if pass1.get(k) is not None
              and pass1.get(k) == pass2.get(k)]
    disputed = [k for k in keys if k not in agreed]
    boosted = round(min(conf * CONSENSUS_BOOST, 1.0), 6) if not disputed else conf
    return {
        "agreed": agreed,
        "disputed": disputed,
        "confidence": boosted,
        "needs_tiebreak": bool(disputed),
    }


class FieldHistoryLookup:
    """Actor-pool stage holding a read-only field-history index.

    The FAISS field-history tiebreak of the reference reconciler
    (``/root/reference/src/agents/reconciler.py:484-514`` — similarity of a
    candidate value vs historical extractions keyed by field name): the
    index is built OFFLINE (e.g. value frequencies from a previous run),
    broadcast once via ``ray.put``, and loaded per actor in ``__init__``.
    Disputed fields resolve to the candidate closest to history.
    """

    def __init__(self, history_ref):
        import ray as _ray
        # {field_name: {normalized value: frequency}}
        self.history: dict[str, dict[str, int]] = _ray.get(history_ref)

    def _score(self, field: str, value: str) -> float:
        hist = self.history.get(field)
        if not hist:
            return 0.0
        norm = normalize_whitespace(value).lower()
        if norm in hist:
            return 1.0
        best = 0.0
        for known in list(hist)[:50]:          # bounded comparison set
            best = max(best, similarity_ratio(norm, known))
        return best

    def resolve(self, field: str, v1: str | None, v2: str | None,
                threshold: float = 0.8) -> tuple[str | None, str]:
        """Pick the candidate better supported by history; 'unresolved'
        when neither clears the similarity threshold."""
        s1 = self._score(field, v1) if v1 else 0.0
        s2 = self._score(field, v2) if v2 else 0.0
        if max(s1, s2) < threshold:
            return (v1 if (v1 or "") >= (v2 or "") else v2), "unresolved"
        return (v1, "history_pass1") if s1 >= s2 else (v2, "history_pass2")

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Resolve per-row disputed fields (columns: field, v1, v2)."""
        fields = batch["field"].to_pylist()
        v1s = batch["v1"].to_pylist()
        v2s = batch["v2"].to_pylist()
        values, sources = [], []
        for f, a, b in zip(fields, v1s, v2s):
            v, src = self.resolve(f, a, b)
            values.append(v or "")
            sources.append(src)
        out = batch.append_column("resolved", pa.array(values, pa.string()))
        return out.append_column("resolution", pa.array(sources, pa.string()))


def build_field_history(rows: list[dict], min_count: int = 2) -> dict[str, dict[str, int]]:
    """Build the history index from extraction rows (fields maps)."""
    hist: dict[str, dict[str, int]] = {}
    for r in rows:
        for name, value in dict(r.get("fields") or []).items():
            base = name.rstrip("0123456789_")    # date_0 → date family
            norm = normalize_whitespace(value).lower()
            if norm:
                hist.setdefault(base, {})
                hist[base][norm] = hist[base].get(norm, 0) + 1
    return {f: {v: c for v, c in vs.items() if c >= min_count} or vs
            for f, vs in hist.items()}


def reconciliation_report(ds) -> "pa.Table":
    """Corpus-level reconciliation histogram (the ReconciliationReport
    counts analogue, ``/root/reference/src/agents/reconciler.py:108-117``
    ``tiebreakers_used``): per-batch match-level counts + a tiny grouped
    sum → one row per match level, plus total fields and the float mean
    agreement rate folded deterministically from per-batch (sum, n)
    partials."""
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for levels in b["match_levels"]:
            for _, lv in (levels.items() if isinstance(levels, dict)
                          else levels):
                counts[lv] = counts.get(lv, 0) + 1
        rows = [{"match_level": k, "n_fields": v}
                for k, v in sorted(counts.items())]
        rows.append({"match_level": "_agreement_sum",
                     "n_fields": int(round(b["agreement_rate"].sum() * 1e6))})
        rows.append({"match_level": "_rows", "n_fields": len(b)})
        return pd.DataFrame(rows)

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("match_level")
           .aggregate(Sum("n_fields", alias_name="n_fields"))
           .to_pandas())
    meta = agg[agg["match_level"].str.startswith("_")]
    n_rows = int(meta.loc[meta["match_level"] == "_rows", "n_fields"].iloc[0])
    agree_sum = int(meta.loc[meta["match_level"] == "_agreement_sum",
                             "n_fields"].iloc[0])
    out = agg[~agg["match_level"].str.startswith("_")].copy()
    out = out.sort_values("match_level").reset_index(drop=True)
    out["mean_agreement_rate"] = round(agree_sum / 1e6 / max(n_rows, 1), 6)
    return out
