"""EDI / X12-style segment parser stage.

Mirrors the reference's ``EDIProcessor``
(``/root/reference/src/preprocessing/edi_processor.py:40-280``): delimiter
detection from the ISA header (``_detect_delimiters`` :140), segment split
(``_parse_segments`` :152), transaction-type detection from ST segments
(``_detect_transaction_type`` :170), and a human-readable render. Pure text
parsing → a stateless ``map_batches`` fn.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

TRANSACTION_TYPES = {
    "837": "claim",
    "835": "remittance",
    "834": "enrollment",
    "270": "eligibility_inquiry",
    "271": "eligibility_response",
    "276": "claim_status_inquiry",
    "277": "claim_status_response",
}


def detect_delimiters(text: str) -> tuple[str, str]:
    """(element, segment) delimiters; ISA fixed positions else defaults."""
    if text.startswith("ISA") and len(text) > 105:
        return text[3], text[105]
    if text.startswith("ISA") and len(text) > 3:
        return text[3], "~"
    return "*", "~"


def parse_segments(text: str) -> list[list[str]]:
    elem, seg = detect_delimiters(text)
    out = []
    for raw in text.split(seg):
        raw = raw.strip()
        if raw:
            out.append(raw.split(elem))
    return out


def detect_transaction_type(segments: list[list[str]]) -> str:
    for s in segments:
        if s and s[0] == "ST" and len(s) > 1:
            return TRANSACTION_TYPES.get(s[1], f"unknown_{s[1]}")
    return "unknown"


def parse_edi(text: str) -> dict[str, Any]:
    segments = parse_segments(text)
    return {
        "n_segments": len(segments),
        "transaction_type": detect_transaction_type(segments),
        "segment_ids": [s[0] for s in segments],
        "rendered": "\n".join(" | ".join(s) for s in segments),
    }


def edi_parse_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless map_batches body: parse each row's EDI payload."""
    parsed = [parse_edi(t or "") for t in batch[text_col].to_pylist()]
    return pa.table({
        **{c: batch[c] for c in batch.column_names},
        "n_segments": pa.array([p["n_segments"] for p in parsed], pa.int64()),
        "transaction_type": pa.array([p["transaction_type"] for p in parsed],
                                     pa.string()),
        "segment_ids": pa.array([p["segment_ids"] for p in parsed],
                                pa.list_(pa.string())),
    })
