"""Hallucination / placeholder pattern detection.

Semantics mirror the reference's ``HallucinationPatternDetector``
(``/root/reference/src/validation/pattern_detector.py:151-232`` pattern
tables; :313-906 detection fns): placeholder regex union, test-data
patterns, generic names/addresses, repeated digits, sequential
identifiers, all-zero identifiers, repeating substrings, truncation
suffixes, implausible dates. Original implementation emitting a sorted
list of stable flag strings per value/turn.
"""

from __future__ import annotations

import re

from .dates import is_implausible_date, parse_date, scan_dates

PLACEHOLDER_PATTERNS = [
    r"^n/?a$", r"^tbd$", r"^xxx+$", r"^placeholder$", r"^unknown$",
    r"^not\s*applicable$", r"^not\s*available$", r"^none$", r"^null$",
    r"^undefined$", r"^to\s*be\s*determined$", r"^pending$", r"^missing$",
    r"^\[.*\]$", r"^<.*>$", r"^_+$", r"^\*+$", r"^\.{3,}$",
]
_PLACEHOLDER_RE = re.compile("|".join(f"(?:{p})" for p in PLACEHOLDER_PATTERNS),
                             re.IGNORECASE)

TEST_DATA_PATTERNS = [
    r"^test\s*\d*$", r"^sample\s*\d*$", r"^demo\s*\d*$", r"^example\s*\d*$",
    r"^dummy\s*\d*$", r"^mock\s*\d*$", r"^fake\s*\d*$",
]
_TEST_DATA_RE = re.compile("|".join(f"(?:{p})" for p in TEST_DATA_PATTERNS),
                           re.IGNORECASE)

GENERIC_NAMES = frozenset([
    "john doe", "jane doe", "john smith", "jane smith", "test patient",
    "test user", "sample patient", "demo patient", "patient name",
    "first last", "example name", "foo bar", "lorem ipsum",
])

GENERIC_ADDRESSES = frozenset([
    "123 main st", "123 main street", "456 oak ave", "789 elm st",
    "test address", "sample address", "example street", "po box 123",
    "1234 street name",
])

_REPEATED_DIGIT_RE = re.compile(r"^(\d)\1{4,}$")          # 00000, 1111111
_SEQUENTIAL_DIGITS = "0123456789012345678901234567890"
_TRUNCATION_RE = re.compile(r"(\.{3}|…)\s*$")
_WORD_RE = re.compile(r"[a-z0-9']+")
_DIGIT_RE = re.compile(r"\d")
_LONG_DIGIT_RE = re.compile(r"\b\d{5,}\b")
_GENERIC_NAME_RE = re.compile("|".join(re.escape(n) for n in sorted(GENERIC_NAMES)))
_GENERIC_ADDR_RE = re.compile("|".join(re.escape(a) for a in sorted(GENERIC_ADDRESSES)))

# Flag names (stable, sorted downstream).
F_PLACEHOLDER = "placeholder"
F_TEST_DATA = "test_data"
F_GENERIC_NAME = "generic_name"
F_GENERIC_ADDRESS = "generic_address"
F_REPEATED_DIGITS = "repeated_digits"
F_SEQUENTIAL_ID = "sequential_id"
F_ALL_ZERO_ID = "all_zero_id"
F_TRUNCATED = "truncated"
F_IMPLAUSIBLE_DATE = "implausible_date"
F_REPEATING_SUBSTRING = "repeating_substring"
F_EMPTY = "empty"


def is_placeholder(value: str) -> bool:
    return bool(_PLACEHOLDER_RE.match(value.strip()))


def is_test_data(value: str) -> bool:
    return bool(_TEST_DATA_RE.match(value.strip()))


def is_sequential_digits(s: str) -> bool:
    """5+ digit run that ascends or descends by 1 throughout (e.g. 12345)."""
    if len(s) < 5 or not s.isdigit():
        return False
    return s in _SEQUENTIAL_DIGITS or s in _SEQUENTIAL_DIGITS[::-1]


def has_repeating_substring(s: str, min_unit: int = 3, min_repeats: int = 3) -> bool:
    """Detects 'abcabcabc'-style runs covering the whole (stripped) value."""
    t = s.strip()
    n = len(t)
    if n < min_unit * min_repeats:
        return False
    for unit in range(min_unit, n // min_repeats + 1):
        if n % unit == 0 and t == t[:unit] * (n // unit):
            return True
    return False


def flag_value(value: str) -> list[str]:
    """Flags for one extracted field value. Sorted, deduplicated."""
    flags: set[str] = set()
    v = value.strip()
    if not v:
        return [F_EMPTY]
    low = " ".join(v.lower().split())
    if is_placeholder(v):
        flags.add(F_PLACEHOLDER)
    if is_test_data(v):
        flags.add(F_TEST_DATA)
    if low in GENERIC_NAMES:
        flags.add(F_GENERIC_NAME)
    if low in GENERIC_ADDRESSES:
        flags.add(F_GENERIC_ADDRESS)
    digits = re.sub(r"\D", "", v)
    if v.isdigit():
        if _REPEATED_DIGIT_RE.match(v):
            flags.add(F_REPEATED_DIGITS)
            if set(v) == {"0"}:
                flags.add(F_ALL_ZERO_ID)
        if is_sequential_digits(v):
            flags.add(F_SEQUENTIAL_ID)
    elif len(digits) >= 8 and digits == len(digits) * "0":
        flags.add(F_ALL_ZERO_ID)
    if _TRUNCATION_RE.search(v):
        flags.add(F_TRUNCATED)
    if has_repeating_substring(v):
        flags.add(F_REPEATING_SUBSTRING)
    d = parse_date(v)
    if d is not None and is_implausible_date(d):
        flags.add(F_IMPLAUSIBLE_DATE)
    return sorted(flags)


def flag_turn_text(text: str) -> list[str]:
    """Turn-level flags scanned over free text (not a single value).

    - generic names/addresses appearing anywhere,
    - implausible in-prose dates,
    - truncation suffix at end of text,
    - placeholder-only text.
    """
    flags: set[str] = set()
    t = text.strip()
    if not t:
        return [F_EMPTY]
    low = " ".join(t.lower().split())
    if is_placeholder(t):
        flags.add(F_PLACEHOLDER)
    if is_test_data(t):
        flags.add(F_TEST_DATA)
    if _GENERIC_NAME_RE.search(low):
        flags.add(F_GENERIC_NAME)
    if _GENERIC_ADDR_RE.search(low):
        flags.add(F_GENERIC_ADDRESS)
    if _DIGIT_RE.search(t):
        for _raw, iso in scan_dates(t):
            d = parse_date(iso)
            if d is not None and is_implausible_date(d):
                flags.add(F_IMPLAUSIBLE_DATE)
                break
        for tok in _LONG_DIGIT_RE.findall(t):
            if _REPEATED_DIGIT_RE.match(tok):
                flags.add(F_REPEATED_DIGITS)
                if set(tok) == {"0"}:
                    flags.add(F_ALL_ZERO_ID)
            if is_sequential_digits(tok):
                flags.add(F_SEQUENTIAL_ID)
    if _TRUNCATION_RE.search(t):
        flags.add(F_TRUNCATED)
    return sorted(flags)


# One regex for the token loop + a cheap substring gate that is a strict
# superset of it (false positives only → correctness unaffected, most
# clean blocks skip the per-token pass entirely).
_PLACEHOLDER_OR_TEST_RE = re.compile(
    "|".join(f"(?:{p})" for p in PLACEHOLDER_PATTERNS + TEST_DATA_PATTERNS),
    re.IGNORECASE)
# Substring gate (C-speed `in` scans): strict superset of the token
# patterns — "na" covers n/a & na, "xx" covers xxx+, punctuation chars
# cover the bracket/underscore/star/ellipsis forms.
_PLACEHOLDER_GATE_SUBSTRINGS = (
    "<", "[", "_", "*", "..", "na", "n/", "tbd", "placeholder", "unknown",
    "applicab", "availab", "none", "null", "undefined", "determined",
    "pending", "missing", "xx", "test", "sample", "demo", "example",
    "dummy", "mock", "fake",
)


def placeholder_density(text: str, low: str | None = None) -> float:
    """Fraction of whitespace tokens that are placeholder/test-data tokens."""
    if low is None:
        low = text.lower()
    if not any(s in low for s in _PLACEHOLDER_GATE_SUBSTRINGS):
        return 0.0
    toks = text.split()
    if not toks:
        return 0.0
    bad = sum(1 for t in toks if _PLACEHOLDER_OR_TEST_RE.match(t))
    return bad / len(toks)
