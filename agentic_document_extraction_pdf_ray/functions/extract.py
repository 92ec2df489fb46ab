"""The per-turn extraction core: clean → segment → select → parse → flag → score.

This is the deterministic text-extraction analogue of the reference's
per-page pipeline (``/root/reference/src/extraction/multi_record.py:1420-1594``
stages; type coercion :284-349; calibration :351-397), applied to a turn's
text payload. It is a PURE function of the row — the same code runs inside
Ray ``map_batches`` stages and the single-process oracle, and per-turn
equality between the two is the correctness contract.

Output per turn:
    extracted_text  cleaned, main-content-only text
    spans           [(start, end, label)] offsets into the CLEANED text
    fields          {name: normalized value} (insertion order = scan order)
    flags           sorted list of hallucination/placeholder flags
    confidence      weighted score (see functions.confidence)
    n_blocks / n_kept   segmentation counts
"""

from __future__ import annotations

import json
import re
from typing import Any

from .codes import validate_cpt_code, validate_icd10_code, validate_npi
from .confidence import turn_confidence
from .currency import scan_currency
from .dates import scan_dates
from .patterns import flag_turn_text
from .segmentation import alpha_ratio, segment_blocks, select_main
from .text import clean_text, normalize_name, normalize_whitespace

_NPI_CAND_RE = re.compile(r"\b(\d{10})\b")
_ICD_CAND_RE = re.compile(r"\b([A-TV-Z]\d{2}(?:\.\d{1,4})?)\b")
_CPT_CTX_RE = re.compile(r"\bCPT[:\s]+(\d{5}(?:-[A-Z0-9]{2})?)\b", re.IGNORECASE)
_CPT_MOD_RE = re.compile(r"\b(\d{5}-[A-Z0-9]{2})\b")
_NAME_CTX_RE = re.compile(
    r"\b(?:Name|Patient|Provider|Member|Customer|Physician)\s*:\s*"
    r"([^\n\d:]{2,60})"
)
# Tokens that terminate a name capture (labels that follow on the same line).
_NAME_STOP_TOKENS = frozenset(
    ["NPI", "CPT", "ICD", "DOB", "DOS", "SSN", "ID", "TEL", "PHONE", "FAX",
     "DX", "REF", "ACCT"]
)
_NAME_MAX_TOKENS = 5
_HEADER_LINE_RE = re.compile(r"^(?:#{1,3} |={3,}\s*$)")
_DIGIT_GATE_RE = re.compile(r"\d")


def extract_fields(text: str) -> tuple[dict[str, str], int, int]:
    """Parse normalized fields out of main-content text.

    Returns (fields, n_code_candidates, n_valid_codes). Field keys are
    ``date_i / amount_i / name_i / npi_i / cpt_i / icd10_i`` in scan order.
    """
    fields: dict[str, str] = {}
    candidates = 0
    valid = 0
    has_digit = _DIGIT_GATE_RE.search(text) is not None

    if has_digit:
        for i, (_raw, iso) in enumerate(scan_dates(text)):
            fields[f"date_{i}"] = iso
        for i, (_raw, amt) in enumerate(scan_currency(text)):
            fields[f"amount_{i}"] = amt
    name_i = 0
    for m in _NAME_CTX_RE.finditer(text):
        toks = []
        for tok in m.group(1).strip().split():
            if tok.upper().strip(".,;") in _NAME_STOP_TOKENS or len(toks) >= _NAME_MAX_TOKENS:
                break
            toks.append(tok)
        if toks:
            fields[f"name_{name_i}"] = normalize_name(" ".join(toks))
            name_i += 1

    if has_digit:
        npi_i = 0
        for m in _NPI_CAND_RE.finditer(text):
            candidates += 1
            r = validate_npi(m.group(1))
            if r.valid:
                fields[f"npi_{npi_i}"] = r.normalized
                npi_i += 1
                valid += 1
        cpt_i = 0
        seen_cpt_spans: set[tuple[int, int]] = set()
        for m in list(_CPT_CTX_RE.finditer(text)) + list(_CPT_MOD_RE.finditer(text)):
            span = m.span(1)
            if span in seen_cpt_spans:
                continue
            seen_cpt_spans.add(span)
            candidates += 1
            r = validate_cpt_code(m.group(1))
            if r.valid:
                fields[f"cpt_{cpt_i}"] = r.normalized
                cpt_i += 1
                valid += 1
        icd_i = 0
        for m in _ICD_CAND_RE.finditer(text):
            # Skip bare 3-char stems with no dot: too many prose collisions.
            if "." not in m.group(1):
                continue
            candidates += 1
            r = validate_icd10_code(m.group(1))
            if r.valid:
                fields[f"icd10_{icd_i}"] = r.normalized
                icd_i += 1
                valid += 1
    return fields, candidates, valid


def _extract_tool_payload(cleaned: str) -> dict[str, str]:
    """Tool-turn payloads: JSON blobs become ``tool.<key>`` scalar fields."""
    t = cleaned.strip()
    if not (t.startswith("{") and t.endswith("}")):
        return {}
    try:
        obj = json.loads(t)
    except (ValueError, TypeError):
        return {}
    if not isinstance(obj, dict):
        return {}
    out: dict[str, str] = {}
    for k in sorted(obj):
        v = obj[k]
        if isinstance(v, (str, int, float, bool)) or v is None:
            out[f"tool.{k}"] = "" if v is None else str(v)
    return out


def is_segment_boundary(role: str, cleaned: str) -> bool:
    """A turn starts a new logical sub-document when it is a system turn or
    opens with a header line (splitter semantics,
    ``/root/reference/src/agents/splitter.py:92-119``, :290-331)."""
    if role == "system":
        return True
    for line in cleaned.split("\n"):
        if line.strip():
            return bool(_HEADER_LINE_RE.match(line.strip()))
    return False


def extract_turn(text: str | None, role: str = "user", tool: str = "") -> dict[str, Any]:
    """Run the full per-turn extraction core. Pure + deterministic + TOTAL:
    an unexpected per-row failure degrades to an empty extraction with an
    ``extraction_error`` flag instead of raising — one poisoned row must
    never kill a partition task (SURVEY.md §4.1 retries: "mark rows failed
    in a status column instead of raising")."""
    try:
        return _extract_turn_inner(clean_text(text), role, tool)
    except Exception:
        return _error_result(role)


def extract_turn_cleaned(cleaned: str, role: str = "user",
                         tool: str = "") -> dict[str, Any]:
    """Same as :func:`extract_turn` for text ALREADY cleaned by
    :func:`..text.clean_text` (lets batch stages vectorize the cleaning
    pass at the Arrow-column level)."""
    try:
        return _extract_turn_inner(cleaned, role, tool)
    except Exception:
        return _error_result(role)


def _error_result(role: str) -> dict[str, Any]:
    return {
        "extracted_text": "",
        "spans": [],
        "fields": {},
        "flags": ["extraction_error"],
        "confidence": 0.0,
        "n_blocks": 0,
        "n_kept": 0,
        "boundary": role == "system",
    }


def _extract_turn_inner(cleaned: str, role: str, tool: str) -> dict[str, Any]:
    if role == "tool":
        # Opaque structured payload: no boilerplate stripping.
        extracted = normalize_whitespace(cleaned)
        spans = [{"start": 0, "end": len(cleaned), "label": "tool"}] if extracted else []
        n_blocks = 1 if extracted else 0
        n_kept = n_blocks
        fields = _extract_tool_payload(cleaned)
        candidates = valid = 0
    else:
        blocks = segment_blocks(cleaned)
        kept = select_main(blocks)
        extracted = "\n\n".join(normalize_whitespace(b.text) for b in kept)
        spans = [{"start": b.start, "end": b.end, "label": b.label} for b in kept]
        n_blocks = len(blocks)
        n_kept = len(kept)
        fields, candidates, valid = extract_fields(extracted)

    flags = flag_turn_text(cleaned)
    # Cross-field repeated-value hallucination signal: the same normalized
    # value in >= 3 fields (pattern_detector.py:398-422).
    if fields:
        counts: dict[str, int] = {}
        for v in fields.values():
            key = " ".join(v.lower().split())
            if key:
                counts[key] = counts.get(key, 0) + 1
        if any(c >= 3 for c in counts.values()):
            flags = sorted(set(flags) | {"repeated_value"})

    raw = (0.5 + 0.5 * alpha_ratio(extracted)) if extracted else 0.0
    val_score = (valid / candidates) if candidates else 1.0
    completeness = (n_kept / n_blocks) if n_blocks else 0.0
    pattern_score = max(0.0, 1.0 - 0.2 * len(flags))
    confidence = turn_confidence(raw, val_score, completeness, pattern_score)

    return {
        "extracted_text": extracted,
        "spans": spans,
        "fields": fields,
        "flags": flags,
        "confidence": confidence,
        "n_blocks": n_blocks,
        "n_kept": n_kept,
        "boundary": is_segment_boundary(role, cleaned),
    }
