"""Confidence scoring.

Mirrors the reference's weighted-combination formulas:

- turn-level calibration weights ``0.40*raw + 0.25*validation +
  0.20*completeness + 0.15*consensus`` rounded to 3 digits and capped at 1.0
  (``/root/reference/src/extraction/multi_record.py:351-397``);
- the scorer thresholds HIGH=0.85 / MEDIUM=0.50 and the action routing
  AUTO_ACCEPT / RETRY / HUMAN_REVIEW
  (``/root/reference/src/validation/confidence.py:125-168``, :366-400).

All arithmetic is float64 with a fixed operand order so results are
identical across workers and the single-process oracle.
"""

from __future__ import annotations

HIGH_THRESHOLD = 0.85
MEDIUM_THRESHOLD = 0.50

# ---------------------------------------------------------------------------
# Critic combiner (/root/reference/src/validation/critic_combiner.py:42-107):
# raw = 0.5·dual_pass + 0.3·critic_trust + 0.2·(1 − worst-of modality
# penalty), every input clamped to [0, 1]. The reference's penalty table is
# keyed by degraded *image* modalities; the text-payload analogue keys the
# same 0.7/0.6/0.4 ladder by payload kind (EDI blobs are the most degraded
# "fax-like" input for a text engine, pipe tables next, raw JSON least).

COMBINER_WEIGHTS = (0.50, 0.30, 0.20)

MODALITY_PENALTIES = {"fax": 0.7, "handwritten": 0.6, "visual": 0.4}
PAYLOAD_KIND_PENALTIES = {"edi": 0.7, "table": 0.6, "json": 0.4}


def modality_penalty(modalities: list[str] | None,
                     table: dict[str, float] | None = None) -> float:
    """Worst-of penalty across active modalities (0.0 when none apply)."""
    if not modalities:
        return 0.0
    t = MODALITY_PENALTIES if table is None else table
    return max((t.get(m, 0.0) for m in modalities), default=0.0)


def combine_confidence(dual_pass_agreement: float, critic_trust: float,
                       modalities: list[str] | None = None,
                       weights: tuple[float, float, float] = COMBINER_WEIGHTS,
                       penalty_table: dict[str, float] | None = None) -> dict:
    """Pure critic-combiner (reference ``combine_confidence`` semantics).

    Returns {dual_pass, critic, modality_penalty, raw_combined}; a missing
    critic report should be passed as trust=1.0 by the caller (no signal ≠
    penalty, reference :131-137).
    """
    w_dual, w_critic, w_mod = weights
    dp = max(0.0, min(1.0, float(dual_pass_agreement)))
    ct = max(0.0, min(1.0, float(critic_trust)))
    pen = modality_penalty(list(modalities or []), penalty_table)
    raw = w_dual * dp + w_critic * ct + w_mod * max(0.0, 1.0 - pen)
    return {"dual_pass": dp, "critic": ct, "modality_penalty": pen,
            "raw_combined": max(0.0, min(1.0, raw))}

W_RAW = 0.40
W_VALIDATION = 0.25
W_COMPLETENESS = 0.20
W_PATTERN = 0.15

ACTION_AUTO_ACCEPT = "auto_accept"
ACTION_RETRY = "retry"
ACTION_HUMAN_REVIEW = "human_review"


def turn_confidence(raw: float, val_score: float, completeness: float,
                    pattern_score: float) -> float:
    """Weighted combine, capped at 1.0, rounded to 3 decimals."""
    c = (W_RAW * raw + W_VALIDATION * val_score
         + W_COMPLETENESS * completeness + W_PATTERN * pattern_score)
    return round(min(c, 1.0), 3)


def confidence_action(confidence: float) -> str:
    """Route on confidence level like the reference's orchestrator
    (``/root/reference/src/agents/orchestrator.py:320-394``)."""
    if confidence >= HIGH_THRESHOLD:
        return ACTION_AUTO_ACCEPT
    if confidence >= MEDIUM_THRESHOLD:
        return ACTION_RETRY
    return ACTION_HUMAN_REVIEW


# ---------------------------------------------------------------------------
# Per-field weighted scorer (ConfidenceScorer semantics,
# /root/reference/src/validation/confidence.py:125-463): weights
# extraction .35 / agreement .30 / validation .20 / pattern .15 (normalized),
# penalty table, validation-failure cap at HIGH-0.01, critical fields double
# weight in the overall, missing-critical penalty, level + action routing.

LEVEL_HIGH = "high"
LEVEL_MEDIUM = "medium"
LEVEL_LOW = "low"

SCORER_WEIGHTS = {"extraction": 0.35, "agreement": 0.30,
                  "validation": 0.20, "pattern": 0.15}
PENALTIES = {"validation_failed": 0.30, "no_agreement": 0.25,
             "pattern_detected": 0.20, "missing_required": 0.40,
             "single_pass_only": 0.15}
MAX_RETRIES = 2


def _level(c: float) -> str:
    if c >= HIGH_THRESHOLD:
        return LEVEL_HIGH
    if c >= MEDIUM_THRESHOLD:
        return LEVEL_MEDIUM
    return LEVEL_LOW


class FieldConfidenceScorer:
    """Deterministic per-field confidence combine + overall routing."""

    def __init__(self, weights: dict[str, float] | None = None,
                 critical_fields: list[str] | None = None,
                 field_weights: dict[str, float] | None = None):
        w = dict(weights or SCORER_WEIGHTS)
        total = sum(w.values())
        self.weights = {k: v / total for k, v in w.items()}
        self.critical = set(critical_fields or [])
        self.field_weights = dict(field_weights or {})

    def field_confidence(self, name: str, extraction_conf: float,
                         agreement_score: float = 0.5,
                         validation_passed: bool = True,
                         has_pattern_flag: bool = False) -> dict:
        factors: list[str] = []
        validation_conf = 1.0 if validation_passed else \
            1.0 - PENALTIES["validation_failed"]
        if not validation_passed:
            factors.append("validation_failed")
        pattern_conf = 1.0 - PENALTIES["pattern_detected"] if has_pattern_flag else 1.0
        if has_pattern_flag:
            factors.append("pattern_detected")
        if agreement_score < 0.85:
            factors.append("low_agreement")
        if agreement_score == 1.0 and extraction_conf < 0.8:
            factors.append("single_pass_estimate")
        combined = (self.weights["extraction"] * extraction_conf
                    + self.weights["agreement"] * agreement_score
                    + self.weights["validation"] * validation_conf
                    + self.weights["pattern"] * pattern_conf)
        combined *= self.field_weights.get(name, 1.0)
        combined = max(0.0, min(1.0, combined))
        if not validation_passed:
            # hard gate: failed validation can never be HIGH confidence
            combined = min(combined, HIGH_THRESHOLD - 0.01)
        return {"field": name, "confidence": round(combined, 6),
                "level": _level(combined), "factors": factors}

    def calculate(self, extraction_confidences: dict[str, float],
                  agreement_scores: dict[str, float] | None = None,
                  validation_results: dict[str, bool] | None = None,
                  pattern_flags: set[str] | None = None,
                  retry_count: int = 0) -> dict:
        agreement_scores = agreement_scores or {}
        validation_results = validation_results or {}
        pattern_flags = pattern_flags or set()
        fields = {
            name: self.field_confidence(
                name, conf, agreement_scores.get(name, 0.5),
                validation_results.get(name, True), name in pattern_flags)
            for name, conf in sorted(extraction_confidences.items())
        }
        if not fields:
            return {"fields": {}, "overall_confidence": 0.0,
                    "overall_level": LEVEL_LOW, "action": ACTION_HUMAN_REVIEW}
        weighted = 0.0
        total_w = 0.0
        for name, fc in fields.items():
            w = (2.0 if name in self.critical else 1.0) * \
                self.field_weights.get(name, 1.0)
            weighted += fc["confidence"] * w
            total_w += w
        overall = weighted / total_w if total_w else 0.0
        critical_status = {c: (c in fields and fields[c]["level"] != LEVEL_LOW)
                           for c in sorted(self.critical)}
        issues = sum(1 for ok in critical_status.values() if not ok)
        if issues:
            overall = max(0.0, overall - PENALTIES["missing_required"]
                          * issues / max(len(self.critical), 1))
        level = _level(overall)
        if level == LEVEL_HIGH and not issues:
            action = ACTION_AUTO_ACCEPT
        elif level == LEVEL_LOW or retry_count >= MAX_RETRIES:
            action = ACTION_HUMAN_REVIEW if level != LEVEL_HIGH else ACTION_AUTO_ACCEPT
        else:
            action = ACTION_RETRY
        return {"fields": fields, "overall_confidence": round(overall, 6),
                "overall_level": level, "action": action,
                "critical_fields_status": critical_status}
