"""Single-process oracle: the correctness anchor.

Runs the identical per-turn extraction core (:mod:`functions.extract`) plus
the conversation-level semantics (segmentation prefix-scan, exact dedup on
the normalized extracted text, conversation confidence aggregate) in one
plain Python loop — no Ray. Pytest asserts the Ray pipeline output equals
this row-for-row under stable ``(conv_id, turn_idx)`` ordering.

Modeled on the reference's test strategy of a deterministic, pure
reconciler/extractor validated against synthetic inputs
(``/root/reference/src/agents/reconciler.py:13-17``,
``/root/reference/tests/eval/smoke.py``).
"""

from __future__ import annotations

from typing import Any

from ..functions.extract import extract_turn
from ..functions.text import norm_key


def oracle_extract_conversation(rows: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Extract one conversation. ``rows`` need (conv_id, turn_idx, role,
    text, tool); any input order is accepted; output is turn_idx-ordered."""
    rows = sorted(rows, key=lambda r: r["turn_idx"])
    out: list[dict[str, Any]] = []
    seg = -1
    first_by_key: dict[str, int] = {}
    for r in rows:
        t = extract_turn(r.get("text"), r.get("role") or "user", r.get("tool") or "")
        boundary = t.pop("boundary")
        if seg < 0 or boundary:
            seg += 1
        key = norm_key(t["extracted_text"])
        dup_of = None
        if key:
            if key in first_by_key:
                dup_of = {"conv_id": r["conv_id"], "turn_idx": first_by_key[key]}
            else:
                first_by_key[key] = int(r["turn_idx"])
        out.append({
            "conv_id": r["conv_id"],
            "turn_idx": int(r["turn_idx"]),
            "role": r.get("role") or "user",
            **t,
            "segment_id": max(seg, 0),
            "dup_of": dup_of,
        })
    return out


def oracle_extract_table(rows: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Extract a whole transcript table (any order in, stable order out)."""
    by_conv: dict[str, list[dict[str, Any]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    out: list[dict[str, Any]] = []
    for conv_id in sorted(by_conv):
        out.extend(oracle_extract_conversation(by_conv[conv_id]))
    return out


def oracle_conv_summary(rows: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Conversation-level aggregates over oracle output rows."""
    by_conv: dict[str, list[dict[str, Any]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    out = []
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        n = len(turns)
        conf_sum = 0.0
        for t in turns:            # fixed order → deterministic float sum
            conf_sum += t["confidence"]
        out.append({
            "conv_id": conv_id,
            "n_turns": n,
            "n_segments": turns[-1]["segment_id"] + 1 if n else 0,
            "n_dups": sum(1 for t in turns if t["dup_of"] is not None),
            "mean_confidence": round(conf_sum / n, 6) if n else 0.0,
            "n_flagged_turns": sum(1 for t in turns if t["flags"]),
        })
    return out
