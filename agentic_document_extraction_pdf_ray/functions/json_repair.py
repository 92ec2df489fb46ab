"""JSON repair for model-output post-processing.

Mirrors the reference's ``_repair_json``
(``/root/reference/src/extraction/multi_record.py:427-450``,
``src/client/lm_client.py``): strip markdown code fences, line comments,
trailing commas, and normalize Python literals (True/False/None) so that
almost-JSON model output parses. Pure scalar fn for batch post-processing.
"""

from __future__ import annotations

import json
import re
from typing import Any

_FENCE_RE = re.compile(r"^```(?:json)?\s*|\s*```$", re.MULTILINE)
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")
_PY_LITERALS = [(re.compile(r"\bTrue\b"), "true"),
                (re.compile(r"\bFalse\b"), "false"),
                (re.compile(r"\bNone\b"), "null")]


def _strip_line_comments(text: str) -> str:
    """Cut ``// ...`` to end-of-line when outside a JSON string (URLs with
    ``//`` inside quoted strings are preserved)."""
    out_lines = []
    for line in text.split("\n"):
        in_str = False
        escaped = False
        cut = len(line)
        for i, ch in enumerate(line):
            if escaped:
                escaped = False
                continue
            if ch == "\\":
                escaped = True
            elif ch == '"':
                in_str = not in_str
            elif ch == "/" and not in_str and line[i:i + 2] == "//":
                cut = i
                break
        out_lines.append(line[:cut].rstrip())
    return "\n".join(out_lines)


def repair_json(text: str | None) -> str:
    """Best-effort cleanup of almost-JSON text (idempotent on valid JSON)."""
    if not text:
        return ""
    out = _FENCE_RE.sub("", text.strip())
    out = _strip_line_comments(out)
    out = _TRAILING_COMMA_RE.sub(r"\1", out)
    for pat, rep in _PY_LITERALS:
        out = pat.sub(rep, out)
    return out.strip()


def parse_json_lenient(text: str | None) -> Any | None:
    """Parse after repair; None when still unparseable."""
    repaired = repair_json(text)
    if not repaired:
        return None
    try:
        return json.loads(repaired)
    except (ValueError, TypeError):
        return None
