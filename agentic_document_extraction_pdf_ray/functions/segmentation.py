"""Block segmentation + main-content span selection.

The text analogue of the reference's layout analysis + region selection:
pages are split into blocks and scored with density heuristics
(``/root/reference/src/pipeline/layout_types.py:50-86`` layout regions and
``density_estimate`` :71-73), boilerplate/placeholder machinery
(``/root/reference/src/validation/pattern_detector.py:151-232``), and
block splitting a la ``split_on_pattern``
(``/root/reference/src/utils/string_utils.py:492-517``). The scoring itself
follows the public readability/trafilatura approach: text-density +
link-density + marker heuristics per block, keep high-density prose blocks.

Everything here is pure and deterministic. Span offsets index into the
CLEANED text (output of :func:`functions.text.clean_text`), the span-level
analogue of the reference's bbox provenance
(``/root/reference/src/pipeline/provenance.py:66-160``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .patterns import placeholder_density

# Maximal runs of non-blank lines = blocks. A blank line is empty/ws-only.
_BLOCK_RE = re.compile(r"(?:[^\n]*\S[^\n]*)(?:\n[^\n]*\S[^\n]*)*")
_URL_RE = re.compile(r"https?://\S+|www\.\S+")
_MD_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_SEP_LINE_RE = re.compile(r"^[\s\-=*_~#+.]{3,}$")
_WORD_RE = re.compile(r"[A-Za-z']+")
_NON_LETTER_RE = re.compile(r"[^A-Za-z]+")
_NON_UPPER_RE = re.compile(r"[^A-Z]+")
_NON_ALNUM_RE = re.compile(r"[^A-Za-z0-9]+")

BOILERPLATE_MARKERS = (
    "copyright", "©", "all rights reserved", "subscribe", "unsubscribe",
    "cookie", "privacy policy", "terms of service", "click here",
    "follow us", "sign in", "log in", "advertisement", "sponsored",
    "newsletter", "related articles", "share this", "back to top",
)

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for "
    "on as at by from not have has had but they you we he she i".split()
)

LABEL_MAIN = "main"
LABEL_BOILERPLATE = "boilerplate"
LABEL_SEPARATOR = "separator"
LABEL_PLACEHOLDER = "placeholder"


@dataclass(frozen=True)
class Block:
    start: int          # offset into cleaned text
    end: int
    text: str
    label: str
    link_density: float
    word_count: int


# Fast-path gate: plain lowercase prose (at least one letter, no digits,
# uppercase, newlines, pipes, brackets, or URL-able chars beyond periods).
# For such text the full ladder provably returns MAIN with link_density 0
# unless a boilerplate marker / placeholder token is present — both checked
# below before taking the shortcut.
_PLAIN_PROSE_RE = re.compile(r"[a-z ,.']*[a-z][a-z ,.']*\Z")


def _classify_block(text: str) -> tuple[str, float, int]:
    """Label one block via the density ladder; returns (label, link_density, words)."""
    if _PLAIN_PROSE_RE.fullmatch(text) and "www." not in text:
        low = text
        if (not any(m in low for m in BOILERPLATE_MARKERS)
                and placeholder_density(text, low) < 0.5):
            return LABEL_MAIN, 0.0, len(_WORD_RE.findall(text))
    lines = text.split("\n")
    n_lines = len(lines)
    stripped = text.strip()
    n_chars = len(stripped)

    sep_lines = sum(1 for ln in lines if _SEP_LINE_RE.match(ln))
    link_chars = sum(len(m.group(0)) for m in _URL_RE.finditer(text))
    link_chars += sum(len(m.group(0)) for m in _MD_LINK_RE.finditer(text))
    link_density = min(1.0, link_chars / n_chars) if n_chars else 0.0

    n_words = len(_WORD_RE.findall(text))
    alpha_chars = len(_NON_LETTER_RE.sub("", text))
    upper_chars = len(_NON_UPPER_RE.sub("", stripped))
    upper_ratio = upper_chars / alpha_chars if alpha_chars else 0.0

    if n_lines and sep_lines / n_lines >= 0.5:
        return LABEL_SEPARATOR, link_density, n_words
    low = stripped.lower()
    if placeholder_density(stripped, low) >= 0.5:
        return LABEL_PLACEHOLDER, link_density, n_words
    has_marker = any(m in low for m in BOILERPLATE_MARKERS)
    piped_lines = sum(1 for ln in lines if ln.count("|") >= 2)
    if (
        link_density > 0.5
        or (has_marker and n_words <= 30)
        or (upper_ratio > 0.7 and n_words <= 12 and n_words > 0)
        or (n_lines >= 2 and piped_lines / n_lines >= 0.5)
    ):
        return LABEL_BOILERPLATE, link_density, n_words
    return LABEL_MAIN, link_density, n_words


def segment_blocks(cleaned: str) -> list[Block]:
    """Split cleaned text into labelled blocks with stable offsets."""
    blocks: list[Block] = []
    for m in _BLOCK_RE.finditer(cleaned):
        text = m.group(0)
        label, link_density, n_words = _classify_block(text)
        blocks.append(Block(m.start(), m.end(), text, label, link_density, n_words))
    return blocks


def select_main(blocks: list[Block]) -> list[Block]:
    """Main-content selection: keep blocks labelled main."""
    return [b for b in blocks if b.label == LABEL_MAIN]


def stopword_ratio(text: str) -> float:
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return 0.0
    return sum(1 for w in words if w in _STOPWORDS) / len(words)


def alpha_ratio(text: str) -> float:
    stripped = "".join(text.split())
    if not stripped:
        return 0.0
    return len(_NON_LETTER_RE.sub("", stripped)) / len(stripped)
