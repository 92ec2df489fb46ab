"""Text normalization scalar functions.

Semantics mirror the reference's string utility layer
(``/root/reference/src/utils/string_utils.py``): ``clean_ocr_text`` (:381-416),
``normalize_whitespace`` (:14-33), ``normalize_name`` (:36-109),
``remove_diacritics`` (:354-378), ``levenshtein_distance`` /
``similarity_ratio`` / ``fuzzy_match`` (:246-352), ``truncate_text``
(:205-243), ``extract_between`` (:419-460), ``split_on_pattern`` (:492-517).
Implementations are original, written against the documented behavior.

All functions are pure and deterministic — safe inside distributed
``map_batches`` stages and the single-process oracle alike.
"""

from __future__ import annotations

import re
import unicodedata

# Control chars to strip (keep \t \n \r), zero-width chars, curly quotes.
_CONTROL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_ZERO_WIDTH_RE = re.compile("[\\u200b-\\u200d\\ufeff]")
_QUOTE_MAP = str.maketrans(
    {"\u201c": '"', "\u201d": '"', "\u2018": "'", "\u2019": "'"}
)

_NAME_PREFIXES = ("DR.", "DR", "MR.", "MR", "MRS.", "MRS", "MS.", "MS", "MISS")
_NAME_SUFFIXES = (
    "MD", "M.D.", "DO", "D.O.", "NP", "N.P.", "PA", "P.A.", "RN", "R.N.",
    "PHD", "PH.D.", "JR", "JR.", "SR", "SR.", "II", "III", "IV",
)

_NUMBER_RE = re.compile(r"-?\d+(?:\.\d+)?")
_INTEGER_RE = re.compile(r"-?\d+")


def clean_text(text: str | None) -> str:
    """Strip control chars, normalize curly quotes, drop zero-width chars."""
    if not text:
        return ""
    out = _CONTROL_RE.sub("", text)
    out = out.translate(_QUOTE_MAP)
    return _ZERO_WIDTH_RE.sub("", out)


def normalize_whitespace(text: str | None) -> str:
    """Collapse all whitespace runs into single spaces and trim."""
    if not text:
        return ""
    return " ".join(text.split())


def remove_diacritics(text: str | None) -> str:
    """NFD-decompose and drop combining marks: 'José' -> 'Jose'."""
    if not text:
        return ""
    return "".join(
        c for c in unicodedata.normalize("NFD", text)
        if unicodedata.category(c) != "Mn"
    )


def normalize_name(name: str | None) -> str:
    """'DR. JOHN SMITH MD' -> 'SMITH, JOHN' (prefix/suffix strip, LAST, FIRST)."""
    if not name:
        return ""
    name = normalize_whitespace(name.upper())
    for prefix in _NAME_PREFIXES:
        if name.startswith(prefix + " "):
            name = name[len(prefix) + 1:]
            break
    for suffix in _NAME_SUFFIXES:
        if name.endswith(" " + suffix):
            name = name[: -(len(suffix) + 1)]
            break
        if name.endswith(", " + suffix):
            name = name[: -(len(suffix) + 2)]
            break
    name = name.strip()
    if ", " in name:
        return name
    parts = name.split()
    if len(parts) >= 2:
        return f"{parts[-1]}, {' '.join(parts[:-1])}"
    return name


def extract_numbers(text: str | None) -> list[str]:
    """All integer/decimal substrings, sign-aware, as strings."""
    if not text:
        return []
    return _NUMBER_RE.findall(text)


def extract_integers(text: str | None) -> list[int]:
    if not text:
        return []
    return [int(n) for n in _INTEGER_RE.findall(text)]


def truncate_text(text: str, max_length: int, suffix: str = "...",
                  word_boundary: bool = True) -> str:
    """Truncate to ``max_length`` including suffix, at a word boundary."""
    if not text or len(text) <= max_length:
        return text
    cut = max_length - len(suffix)
    if cut <= 0:
        return suffix[:max_length]
    out = text[:cut]
    if word_boundary:
        sp = out.rfind(" ")
        if sp > 0:
            out = out[:sp]
    return out.rstrip() + suffix


def levenshtein_distance(s1: str, s2: str) -> int:
    """Classic O(len1*len2) edit distance with a rolling row."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def similarity_ratio(s1: str, s2: str, case_sensitive: bool = False) -> float:
    """1 - normalized edit distance; 1.0 for two empties, 0.0 for one empty."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    if not case_sensitive:
        s1, s2 = s1.lower(), s2.lower()
    m = max(len(s1), len(s2))
    return 1 - (levenshtein_distance(s1, s2) / m)


def fuzzy_match(s1: str, s2: str, threshold: float = 0.8,
                case_sensitive: bool = False) -> bool:
    if not s1 or not s2:
        return s1 == s2
    return similarity_ratio(s1, s2, case_sensitive) >= threshold


def extract_between(text: str, start: str, end: str,
                    inclusive: bool = False) -> str | None:
    """Substring between the first ``start`` marker and the next ``end``."""
    if not text or not start or not end:
        return None
    i = text.find(start)
    if i == -1:
        return None
    j0 = i if inclusive else i + len(start)
    j = text.find(end, i + len(start))
    if j == -1:
        return None
    return text[j0: j + len(end)] if inclusive else text[i + len(start): j]


def split_on_pattern(text: str, pattern: str,
                     keep_delimiter: bool = False) -> list[str]:
    """Regex split; with ``keep_delimiter`` uses a lookahead split."""
    if not text:
        return []
    parts = re.split(f"(?={pattern})" if keep_delimiter else pattern, text)
    return [p.strip() for p in parts if p.strip()]


def is_empty_or_whitespace(text: str | None) -> bool:
    return text is None or len(text.strip()) == 0


def norm_key(text: str | None) -> str:
    """Normalized identity key for exact dedup: lower + whitespace-collapse.

    Mirrors the duplicate-detection normalization of the reference
    (``/root/reference/src/export/consolidated_export.py:63-66``).
    """
    if not text:
        return ""
    return " ".join(text.lower().strip().split())


def pad_string(text: str, length: int, pad_char: str = " ",
               align: str = "left") -> str:
    """Pad/truncate to a fixed length with left/right/center alignment."""
    if len(text) >= length:
        return text[:length]
    if align == "left":
        return text.ljust(length, pad_char)
    if align == "right":
        return text.rjust(length, pad_char)
    return text.center(length, pad_char)


def safe_string(value, default: str = "") -> str:
    """Total any→str conversion (reference
    ``src/utils/string_utils.py:536-553``)."""
    if value is None:
        return default
    try:
        return str(value)
    except Exception:
        return default
