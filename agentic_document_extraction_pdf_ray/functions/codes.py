"""Code validators: CPT, ICD-10, HCPCS, NPI (CMS modified Luhn), phone.

Semantics mirror the reference's validator layer
(``/root/reference/src/schemas/validators.py``): CPT :62-147 (5 digits +
optional 2-char modifier, range table -> category), ICD-10 :155-220
(CM ``^[A-TV-Z]\\d{2}(\\.?\\d{0,4})?$`` with decimal normalization, PCS
7-alnum), HCPCS :229-260, NPI :837-931 (``80840`` prefix Luhn, 10 digits
starting 1/2). Original implementations returning lightweight tuples.
"""

from __future__ import annotations

import re
from typing import NamedTuple


class CodeResult(NamedTuple):
    valid: bool
    normalized: str
    kind: str        # "cpt" | "icd10cm" | "icd10pcs" | "hcpcs" | "npi" | "phone"
    detail: str      # category / entity type / failure reason


CPT_RANGES = [
    (99201, 99499, "E&M"),
    (10021, 69990, "Surgery"),
    (70010, 79999, "Radiology"),
    (80047, 89398, "Pathology"),
    (90281, 99199, "Medicine"),
    (99500, 99607, "HomeHealth"),
]

_CPT_MOD_RE = re.compile(r"^(\d{5})-([A-Z0-9]{2})$")
_CPT_RE = re.compile(r"^\d{5}$")
_ICD10_CM_RE = re.compile(r"^[A-TV-Z]\d{2}(?:\.?\d{0,4})?$", re.IGNORECASE)
_ICD10_PCS_RE = re.compile(r"^[A-HJ-NP-Z0-9]{7}$", re.IGNORECASE)
_HCPCS_RE = re.compile(r"^([A-V]\d{4})(?:-([A-Z0-9]{2}))?$", re.IGNORECASE)
_PHONE_RE = re.compile(r"^\(?(\d{3})\)?[-. ]?(\d{3})[-. ]?(\d{4})$")

# Prose scanners (used by field extraction); conservative word-boundaries.
NPI_SCAN_RE = re.compile(r"\b(\d{10})\b")
CPT_SCAN_RE = re.compile(r"\b(\d{5})(?:-([A-Z0-9]{2}))?\b")
ICD10_SCAN_RE = re.compile(r"\b([A-TV-Z]\d{2}\.\d{1,4}|[A-TV-Z]\d{2,6})\b")


def luhn_npi(number: str) -> bool:
    """CMS modified Luhn: standard Luhn over ``'80840' + npi``.

    Per the NPI Final Rule (45 CFR Part 162): reverse, keep the check digit,
    double every second digit (subtract 9 when >9), sum divisible by 10.
    """
    digits = [int(c) for c in reversed("80840" + number)]
    total = 0
    for i, d in enumerate(digits):
        if i % 2:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def validate_npi(npi: str | int | None) -> CodeResult:
    if npi is None:
        return CodeResult(False, "", "npi", "missing")
    s = re.sub(r"\D", "", str(npi))
    if len(s) != 10:
        return CodeResult(False, s, "npi", "length")
    if s[0] not in ("1", "2"):
        return CodeResult(False, s, "npi", "prefix")
    if not luhn_npi(s):
        return CodeResult(False, s, "npi", "luhn")
    return CodeResult(True, s, "npi", "Individual" if s[0] == "1" else "Organization")


def validate_cpt_code(code: str | int | None) -> CodeResult:
    if code is None:
        return CodeResult(False, "", "cpt", "missing")
    s = str(code).strip().upper()
    s = re.sub(r"[.\-\s]+", "-", s)
    m = _CPT_MOD_RE.match(s)
    if m:
        base, mod = m.group(1), m.group(2)
    elif _CPT_RE.match(s.replace("-", "")[:5]) and len(s.replace("-", "")) == 5:
        base, mod = s.replace("-", "")[:5], None
    else:
        return CodeResult(False, s, "cpt", "format")
    n = int(base)
    category = next((name for lo, hi, name in CPT_RANGES if lo <= n <= hi), None)
    normalized = f"{base}-{mod}" if mod else base
    if category:
        return CodeResult(True, normalized, "cpt", category)
    return CodeResult(False, normalized, "cpt", "range")


def validate_icd10_code(code: str | None) -> CodeResult:
    if code is None:
        return CodeResult(False, "", "icd10cm", "missing")
    s = str(code).strip().upper().replace(" ", "")
    if _ICD10_CM_RE.match(s):
        if len(s) > 3 and "." not in s:
            normalized = f"{s[:3]}.{s[3:]}"
        else:
            normalized = s
        return CodeResult(True, normalized, "icd10cm", s[0])
    if _ICD10_PCS_RE.match(s):
        return CodeResult(True, s, "icd10pcs", "PCS")
    return CodeResult(False, s, "icd10cm", "format")


def validate_hcpcs_code(code: str | None) -> CodeResult:
    if code is None:
        return CodeResult(False, "", "hcpcs", "missing")
    s = str(code).strip().upper()
    m = _HCPCS_RE.match(s)
    if not m:
        return CodeResult(False, s, "hcpcs", "format")
    normalized = m.group(1) + (f"-{m.group(2)}" if m.group(2) else "")
    return CodeResult(True, normalized, "hcpcs", m.group(1)[0])


def validate_phone(phone: str | None) -> CodeResult:
    if phone is None:
        return CodeResult(False, "", "phone", "missing")
    m = _PHONE_RE.match(str(phone).strip())
    if not m:
        return CodeResult(False, str(phone).strip(), "phone", "format")
    return CodeResult(True, "-".join(m.groups()), "phone", "us")
