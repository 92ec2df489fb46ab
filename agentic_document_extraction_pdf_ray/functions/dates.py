"""Date parsing/normalization scalar functions.

Semantics mirror the reference's date utility layer
(``/root/reference/src/utils/date_utils.py:17-91`` — the 13-entry
``DATE_FORMATS`` pattern table with strptime fallbacks) plus the
plausibility window used by the hallucination detector
(``/root/reference/src/validation/pattern_detector.py`` MIN_PLAUSIBLE_YEAR /
MAX_FUTURE_DAYS). Implementations are original.

All functions are pure; "today" is pinned to ``REFERENCE_TODAY`` so that
distributed runs and the oracle agree bit-for-bit regardless of wall clock.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta

# Pinned "now" for plausibility checks — determinism across runs/workers.
REFERENCE_TODAY = date(2026, 1, 1)

MIN_PLAUSIBLE_YEAR = 1900
MAX_FUTURE_DAYS = 365 * 2

# (anchored regex, strptime format) — order matters; first match wins.
DATE_FORMATS: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4}$"), "%m/%d/%Y"),
    (re.compile(r"^\d{1,2}-\d{1,2}-\d{4}$"), "%m-%d-%Y"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{2}$"), "%m/%d/%y"),
    (re.compile(r"^\d{1,2}-\d{1,2}-\d{2}$"), "%m-%d-%y"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), "%Y-%m-%d"),
    (re.compile(r"^\d{4}/\d{2}/\d{2}$"), "%Y/%m/%d"),
    (re.compile(r"^[A-Za-z]+ \d{1,2}, \d{4}$"), "%B %d, %Y"),
    (re.compile(r"^[A-Za-z]+ \d{1,2} \d{4}$"), "%B %d %Y"),
    (re.compile(r"^\d{1,2} [A-Za-z]+ \d{4}$"), "%d %B %Y"),
    (re.compile(r"^[A-Za-z]{3} \d{1,2}, \d{4}$"), "%b %d, %Y"),
    (re.compile(r"^[A-Za-z]{3} \d{1,2} \d{4}$"), "%b %d %Y"),
    (re.compile(r"^\d{8}$"), "%m%d%Y"),
    (re.compile(r"^\d{6}$"), "%m%d%y"),
]

_FALLBACK_FORMATS = ["%m/%d/%Y", "%m-%d-%Y", "%Y-%m-%d", "%d/%m/%Y", "%d-%m-%Y"]

# Loose in-prose date scanner used by field extraction: numeric and
# month-name forms.
DATE_SCAN_RE = re.compile(
    r"\b(\d{4}-\d{2}-\d{2}"
    r"|\d{1,2}/\d{1,2}/\d{2,4}"
    r"|\d{1,2}-\d{1,2}-\d{4}"
    r"|(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}"
    r")\b"
)


def parse_date(date_string: str | None) -> date | None:
    """Multi-format date parse; returns None when nothing matches."""
    if not date_string:
        return None
    s = date_string.strip()
    for pattern, fmt in DATE_FORMATS:
        if pattern.match(s):
            try:
                return datetime.strptime(s, fmt).date()
            except ValueError:
                continue
    for fmt in _FALLBACK_FORMATS:
        try:
            return datetime.strptime(s, fmt).date()
        except ValueError:
            continue
    return None


def normalize_date(date_string: str | None) -> str | None:
    """Parse and re-emit as ISO ``YYYY-MM-DD``; None if unparseable."""
    d = parse_date(date_string)
    return d.isoformat() if d is not None else None


def is_valid_date(date_string: str | None) -> bool:
    return parse_date(date_string) is not None


def is_implausible_date(d: date, today: date = REFERENCE_TODAY) -> bool:
    """True for year < 1900, > 2y future, or the classic epoch defaults.

    Mirrors the implausible-date heuristics of the reference detector
    (``/root/reference/src/validation/pattern_detector.py`` date plausibility
    window + 1/1/{1900,1970,2000} defaults).
    """
    if d.year < MIN_PLAUSIBLE_YEAR:
        return True
    if d > today + timedelta(days=MAX_FUTURE_DAYS):
        return True
    if (d.month, d.day) == (1, 1) and d.year in (1900, 1970, 2000):
        return True
    return False


def scan_dates(text: str) -> list[tuple[str, str]]:
    """Find date-like substrings in prose; return (raw, iso) pairs in order.

    Unparseable candidates are dropped. Deterministic left-to-right order.
    """
    out: list[tuple[str, str]] = []
    for m in DATE_SCAN_RE.finditer(text):
        iso = normalize_date(m.group(0))
        if iso is not None:
            out.append((m.group(0), iso))
    return out


def date_difference_days(d1: date, d2: date) -> int:
    return (d2 - d1).days


def dates_in_order(*ds: date) -> bool:
    """True when the dates are monotonically non-decreasing."""
    return all(a <= b for a, b in zip(ds, ds[1:]))


def format_date(d: date, output_format: str = "%m/%d/%Y") -> str:
    """Format a date object (datetime accepted) to string."""
    if isinstance(d, datetime):
        d = d.date()
    return d.strftime(output_format)


def calculate_age(dob: date, as_of: date = REFERENCE_TODAY) -> int:
    """Whole years between dob and the pinned reference date."""
    years = as_of.year - dob.year
    if (as_of.month, as_of.day) < (dob.month, dob.day):
        years -= 1
    return years


def parse_date_range(date_range_string: str | None,
                     ) -> tuple[date | None, date | None]:
    """Parse "start - end" style ranges (reference
    ``src/utils/date_utils.py:118-160``): tries " - ", "-", " to ",
    " through " separators in order; a lone date becomes (d, d)."""
    if not date_range_string:
        return (None, None)
    parts = None
    for sep in (" - ", "-", " to ", " through "):
        if sep in date_range_string:
            parts = date_range_string.split(sep, 1)
            break
    if not parts or len(parts) != 2:
        single = parse_date(date_range_string)
        return (single, single)
    return (parse_date(parts[0].strip()), parse_date(parts[1].strip()))


def is_future_date(date_string: str | None,
                   today: date = REFERENCE_TODAY) -> bool:
    """True iff the date parses and lies after the pinned 'today'
    (reference :305-320; 'now' pinned for determinism)."""
    parsed = parse_date(date_string)
    return parsed is not None and parsed > today


def is_past_date(date_string: str | None,
                 today: date = REFERENCE_TODAY) -> bool:
    """True iff the date parses and lies before the pinned 'today'."""
    parsed = parse_date(date_string)
    return parsed is not None and parsed < today


def get_year_from_date(date_string: str | None) -> int | None:
    """Year of a parseable date, else None (reference :341-355)."""
    parsed = parse_date(date_string)
    return parsed.year if parsed is not None else None
