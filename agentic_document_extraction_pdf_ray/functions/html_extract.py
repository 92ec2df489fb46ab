"""HTML main-content extraction via DOM-node heuristics.

The readability/trafilatura-style half of the north-star pipeline: parse
HTML into block-level DOM nodes (stdlib ``html.parser`` — no external
deps), score each node by text density and link density, drop structural
boilerplate subtrees (nav/footer/aside/script/…), and keep high-density
prose nodes as the main content. The BLOCK-level scoring ladder reuses
the same boilerplate markers as :mod:`.segmentation`, so HTML and plain
text payloads get consistent treatment.

Node-scoring rules (the public readability approach):
- subtrees under DROP_TAGS never contribute;
- a node's link density = characters inside ``<a>`` / total characters;
  nodes above ``MAX_LINK_DENSITY`` are navigation-like → dropped;
- short non-heading nodes (< ``MIN_TEXT_CHARS``) are dropped unless they
  end a sentence (captions/bylines get no free pass, prose keeps flowing);
- nodes whose text hits a boilerplate marker with few words are dropped.

Everything is pure; the per-batch stage lives in sources/htmlpages
(read side) and composes with the flagship core via read_pages_auto.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

from .segmentation import BOILERPLATE_MARKERS, _WORD_RE

DROP_TAGS = frozenset(
    "script style nav footer aside header form noscript iframe button "
    "svg select option template head".split())
BLOCK_TAGS = frozenset(
    "p div article section main li h1 h2 h3 h4 h5 h6 td th blockquote "
    "pre figcaption summary body".split())
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

MIN_TEXT_CHARS = 25
MAX_LINK_DENSITY = 0.5


@dataclass(frozen=True)
class DomNode:
    tag: str
    text: str
    link_chars: int
    kept: bool
    reason: str

    @property
    def link_density(self) -> float:
        return min(1.0, self.link_chars / len(self.text)) if self.text else 0.0


class _DomCollector(HTMLParser):
    """Stream HTML into flat block-level nodes with link-char counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.nodes: list[tuple[str, str, int]] = []
        self._drop_depth = 0
        self._link_depth = 0
        self._stack: list[tuple[str, list[str], int]] = [("body", [], 0)]

    def _flush(self, tag: str, parts: list[str], link_chars: int) -> None:
        text = " ".join(" ".join(parts).split())
        if text:
            self.nodes.append((tag, text, link_chars))

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._stack.append((tag, [], 0))
        elif tag == "br" and self._stack:
            self._stack[-1][1].append("\n")

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in BLOCK_TAGS:
            # close the nearest matching open block
            for i in range(len(self._stack) - 1, 0, -1):
                if self._stack[i][0] == tag:
                    closed = self._stack.pop(i)
                    self._flush(*closed)
                    break

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        tag, parts, link_chars = self._stack[-1]
        parts.append(data)
        if self._link_depth:
            self._stack[-1] = (tag, parts,
                               link_chars + len(" ".join(data.split())))

    def close(self):
        super().close()
        while self._stack:
            self._flush(*self._stack.pop())


def parse_dom_nodes(html: str) -> list[DomNode]:
    """HTML → scored block nodes in document order."""
    p = _DomCollector()
    try:
        p.feed(html or "")
    except Exception:
        # malformed beyond the parser's tolerance: keep what was parsed
        pass
    finally:
        try:
            p.close()          # flushes every still-open block's text
        except Exception:
            pass
    out: list[DomNode] = []
    for tag, text, link_chars in p.nodes:
        ld = min(1.0, link_chars / len(text)) if text else 0.0
        low = text.lower()
        n_words = len(_WORD_RE.findall(text))
        if ld > MAX_LINK_DENSITY:
            kept, reason = False, "link_density"
        elif tag in HEADING_TAGS:
            kept, reason = True, "heading"
        elif any(m in low for m in BOILERPLATE_MARKERS) and n_words <= 30:
            kept, reason = False, "boilerplate_marker"
        elif len(text) < MIN_TEXT_CHARS and not text.endswith((".", "!", "?")):
            kept, reason = False, "too_short"
        else:
            kept, reason = True, "main"
        out.append(DomNode(tag, text, link_chars, kept, reason))
    return out


def html_main_text(html: str) -> str:
    """Main-content text: kept nodes joined by blank lines, in order."""
    return "\n\n".join(n.text for n in parse_dom_nodes(html) if n.kept)


def looks_like_html(text: str | None) -> bool:
    """Cheap structural sniff (used by sources, NOT by the payload-kind
    classifier — transcript oracles stay unchanged)."""
    if not text:
        return False
    t = text.lstrip()[:256].lower()
    return t.startswith(("<!doctype html", "<html")) or "</" in t and "<" in t
