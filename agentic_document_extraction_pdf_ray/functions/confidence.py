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
