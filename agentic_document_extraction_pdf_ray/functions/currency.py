"""Currency parsing scalar functions.

Semantics mirror ``clean_currency`` in the reference
(``/root/reference/src/utils/string_utils.py:151-202``): ``$1,234.56`` ->
``1234.56``; ``(500.00)`` -> ``-500.00``; trailing ``-`` or ``CR`` ->
negative. Original implementation; emits decimal STRINGS (two-way safe for
Arrow columns) alongside a Decimal API.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

_SYMBOL_RE = re.compile(r"[$£€¥]")

# In-prose currency scanner: $-prefixed or parenthesised amounts.
CURRENCY_SCAN_RE = re.compile(
    r"(?:[$£€¥]\s?-?\d[\d,]*(?:\.\d+)?"
    r"|\(\s?[$£€¥]?\d[\d,]*(?:\.\d+)?\s?\)"
    r"|\b\d[\d,]*(?:\.\d+)?\s?(?:CR)\b"
    r"|\b\d[\d,]*\.\d{2}-)"
)


def clean_currency(value: str | None) -> Decimal | None:
    """Parse one currency token to a signed Decimal, or None."""
    if value is None:
        return None
    v = str(value).strip()
    if not v:
        return None
    negative = v.startswith("(") and v.endswith(")")
    if negative:
        v = v[1:-1].strip()
    if v.endswith("CR") or v.endswith("-"):
        negative = True
        v = v.rstrip("CR").rstrip("-").strip()
    if v.startswith("-"):
        negative = True
        v = v[1:]
    v = _SYMBOL_RE.sub("", v).replace(",", "").strip()
    if not v:
        return None
    try:
        d = Decimal(v)
    except InvalidOperation:
        return None
    return -d if negative else d


def clean_currency_str(value: str | None) -> str | None:
    """Like :func:`clean_currency` but returns a canonical decimal string
    with two fraction digits (``-500.00``), or None."""
    d = clean_currency(value)
    if d is None:
        return None
    return str(d.quantize(Decimal("0.01")))


def scan_currency(text: str) -> list[tuple[str, str]]:
    """Find currency-like substrings; return (raw, canonical) in order."""
    out: list[tuple[str, str]] = []
    for m in CURRENCY_SCAN_RE.finditer(text):
        c = clean_currency_str(m.group(0))
        if c is not None:
            out.append((m.group(0), c))
    return out
