"""Standards code tables + the broadcast-lookup-table stage pattern.

Public CMS/X12 code sets mirrored from the reference's standards data and
validators (``/root/reference/data/standards/pos_codes.json``,
``data/standards/cms_modifiers.json``,
``src/validation/medical_codes.py:160-265`` (POS/modifier/NDC sets),
:742-795 (POS/modifier validation), :875-1096 (UB-04 revenue codes)).
The code values themselves are public CMS facts; the validation semantics
mirror the reference:

- POS: two-digit zfill, exact membership, confidence 1.0 / 0.95;
- modifier: uppercase, membership → valid (1.0); two-char alnum format
  but unknown → WARNING (0.70); else invalid (0.95);
- NDC: any of the four reference patterns (5-4-2 / 5-3-2 / 4-4-2 dashed
  or bare 11 digits);
- revenue code: numeric, 1–999 after zero-strip, zfill(4) normalization,
  category via exact → 3-digit-prefix → 2-digit+'0' prefix lookup.

Distribution pattern (SURVEY.md §2.3 "tables broadcast via ray.put into
an actor pool"): :func:`broadcast_standards` ships the tables to the
object store ONCE; :class:`CodeValidationStage` is an actor-pool
``map_batches`` class that ``ray.get``\\ s them once per actor in
``__init__`` — per-batch work only reads the local reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

# --- POS codes (CMS Place of Service Code Set, two-digit) ------------------
VALID_POS_CODES = frozenset(
    "01 02 03 04 05 06 07 08 09 10 11 12 13 14 15 16 17 18 19 20 21 22 23 "
    "24 25 26 31 32 33 34 41 42 49 50 51 52 53 54 55 56 57 58 60 61 62 65 "
    "71 72 81 99".split())

# --- CPT/HCPCS modifiers (CMS; pricing + informational subsets) ------------
VALID_MODIFIERS = frozenset(
    "22 23 24 25 26 27 32 33 47 50 51 52 53 54 55 56 57 58 59 62 63 66 73 "
    "74 76 77 78 79 80 81 82 90 91 92 93 95 96 97 99 "
    "E1 E2 E3 E4 FA F1 F2 F3 F4 F5 F6 F7 F8 F9 LC LD LM LT RC RI RT "
    "TA T1 T2 T3 T4 T5 T6 T7 T8 T9 TC XE XP XS XU".split())

_MODIFIER_FORMAT_RE = re.compile(r"^[A-Z0-9]{2}$")

# --- NDC formats (reference NDC_PATTERNS, medical_codes.py:160) ------------
NDC_PATTERNS = (r"^\d{5}-\d{4}-\d{2}$", r"^\d{5}-\d{3}-\d{2}$",
                r"^\d{4}-\d{4}-\d{2}$", r"^\d{11}$")
_NDC_RES = tuple(re.compile(p) for p in NDC_PATTERNS)

# --- UB-04 revenue code categories (subset incl. all reference doctest
#     examples; exact / 3-digit / 2-digit+'0' prefix lookup semantics) ------
REVENUE_CODE_CATEGORIES = {
    "001": "Total Charges", "010": "All-Inclusive Rate",
    "011": "Room & Board - Private", "012": "Room & Board - Semi-Private",
    "013": "Room & Board - Ward", "014": "Room & Board - ICU",
    "020": "Intensive Care", "021": "Coronary Care",
    "030": "Pharmacy", "038": "Pharmacy - IV Therapy",
    "040": "Medical/Surgical Supplies", "050": "Emergency Room",
    "060": "Pulmonary Function", "070": "EKG/ECG", "080": "EEG",
    "090": "Respiratory Therapy",
    "0100": "Professional Fees", "0110": "Clinic", "0130": "Laboratory",
    "0140": "Radiology - Diagnostic", "0170": "CT Scan", "0180": "MRI",
    "0200": "OR Services", "0250": "Ambulatory Surgery",
    "0270": "MRI", "0280": "PET Scan",
    "0300": "Laboratory - Clinical", "0310": "Laboratory - Pathology",
    "0370": "Anesthesia", "0380": "Blood",
    "0420": "Physical Therapy", "0430": "Occupational Therapy",
}

STATUS_VALID = "valid"
STATUS_WARNING = "warning"
STATUS_INVALID = "invalid"


@dataclass(frozen=True)
class CodeCheck:
    status: str
    normalized: str
    message: str
    confidence: float
    category: str | None = None


def validate_pos(code: str | None) -> CodeCheck:
    if code is None or not str(code).strip():
        return CodeCheck(STATUS_INVALID, "", "POS code is required", 0.95)
    c = str(code).strip().zfill(2)
    if c in VALID_POS_CODES:
        return CodeCheck(STATUS_VALID, c, "Valid Place of Service code", 1.0)
    return CodeCheck(STATUS_INVALID, c,
                     f"Invalid Place of Service code: {code}", 0.95)


def validate_modifier(code: str | None) -> CodeCheck:
    if code is None or not str(code).strip():
        return CodeCheck(STATUS_INVALID, "", "Modifier is required", 0.95)
    c = str(code).strip().upper()
    if c in VALID_MODIFIERS:
        return CodeCheck(STATUS_VALID, c, "Valid modifier", 1.0)
    if _MODIFIER_FORMAT_RE.match(c):
        return CodeCheck(STATUS_WARNING, c,
                         "Modifier format valid but not in standard list", 0.70)
    return CodeCheck(STATUS_INVALID, c, f"Invalid modifier format: {code}", 0.95)


def validate_ndc(code: str | None) -> CodeCheck:
    if code is None or not str(code).strip():
        return CodeCheck(STATUS_INVALID, "", "NDC is required", 0.90)
    c = str(code).strip()
    if any(p.match(c) for p in _NDC_RES):
        return CodeCheck(STATUS_VALID, c, "Valid NDC format", 0.90)
    return CodeCheck(STATUS_INVALID, c, "Invalid NDC format", 0.90)


def validate_revenue_code(code: str | int | None) -> CodeCheck:
    if code is None:
        return CodeCheck(STATUS_INVALID, "", "Revenue code is required", 0.95)
    c = str(code).strip()
    if not c:
        return CodeCheck(STATUS_INVALID, "", "Revenue code is empty", 0.95)
    normalized = c.zfill(4)
    if not c.isdigit():
        return CodeCheck(STATUS_INVALID, c, "Revenue code must be numeric", 0.95)
    code_int = int(c)
    if code_int < 1 or code_int > 999:
        return CodeCheck(STATUS_INVALID, normalized,
                         "Revenue code must be between 0001 and 0999", 0.95)
    category = (REVENUE_CODE_CATEGORIES.get(normalized)
                or REVENUE_CODE_CATEGORIES.get(normalized[:3])
                or REVENUE_CODE_CATEGORIES.get(normalized[:2] + "0"))
    if category:
        return CodeCheck(STATUS_VALID, normalized,
                         f"Valid revenue code - {category}", 1.0, category)
    return CodeCheck(STATUS_VALID, normalized,
                     "Valid revenue code (category not in lookup table)", 0.90)


VALIDATORS = {
    "pos": validate_pos,
    "modifier": validate_modifier,
    "ndc": validate_ndc,
    "revenue": validate_revenue_code,
}


def standards_tables() -> dict:
    """The broadcastable tables bundle."""
    return {
        "pos": frozenset(VALID_POS_CODES),
        "modifiers": frozenset(VALID_MODIFIERS),
        "revenue_categories": dict(REVENUE_CODE_CATEGORIES),
    }


def broadcast_standards():
    """``ray.put`` the tables ONCE; pass the ref to the actor pool."""
    import ray
    return ray.put(standards_tables())


class CodeValidationStage:
    """Actor-pool ``map_batches`` stage validating a ``code`` column
    against a ``code_type`` column ('pos' | 'modifier' | 'ndc' |
    'revenue'). Tables are fetched from the object store once per ACTOR
    (zero per-batch shipping) — the broadcast-lookup-table pattern.

    Usage::

        ref = broadcast_standards()
        ds.map_batches(CodeValidationStage, concurrency=4,
                       fn_constructor_kwargs={"tables_ref": ref},
                       batch_format="pyarrow")
    """

    def __init__(self, tables_ref=None):
        if tables_ref is not None:
            import ray
            self.tables = ray.get(tables_ref)    # once per actor
        else:
            self.tables = standards_tables()

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes = batch["code"].to_pylist()
        kinds = batch["code_type"].to_pylist()
        status, normalized, conf = [], [], []
        for c, k in zip(codes, kinds):
            r = VALIDATORS.get(k, validate_pos)(c)
            status.append(r.status)
            normalized.append(r.normalized)
            conf.append(r.confidence)
        out = batch.append_column("status", pa.array(status, pa.string()))
        out = out.append_column("normalized", pa.array(normalized, pa.string()))
        return out.append_column("confidence", pa.array(conf, pa.float64()))
