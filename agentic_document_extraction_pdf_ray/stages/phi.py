"""PHI redaction projection stage.

Mirrors the reference's ``_maybe_redact_phi`` / ``PHIRedactor`` semantics
(``/root/reference/src/agents/validator.py:232-292``,
``src/security/phi_redactor.py``, export gate
``src/export/consolidated_export.py:30-50``): rewrite string leaves of
PHI-bearing fields to ``[REDACTED]`` and record which fields changed.
Applied as an optional ``map_batches`` projection before any write.
"""

from __future__ import annotations

import re

import pyarrow as pa

REDACTED = "[REDACTED]"

# Field-name substrings considered PHI-bearing (name/id/contact classes).
PHI_FIELD_MARKERS = ("name", "npi", "ssn", "dob", "phone", "address", "mrn")

# In-prose identifiers scrubbed from free text.
_SSN_RE = re.compile(r"\b\d{3}-\d{2}-\d{4}\b")
_PHONE_RE = re.compile(r"\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b")
_NPI_PROSE_RE = re.compile(r"\b(?:NPI[:\s]+)(\d{10})\b", re.IGNORECASE)


def is_phi_field(name: str) -> bool:
    low = name.lower()
    return any(m in low for m in PHI_FIELD_MARKERS)


def redact_text(text: str) -> tuple[str, bool]:
    """Scrub SSN/phone/NPI-shaped substrings from free text."""
    out = _SSN_RE.sub(REDACTED, text)
    out = _PHONE_RE.sub(REDACTED, out)
    out = _NPI_PROSE_RE.sub(f"NPI {REDACTED}", out)
    return out, out != text


def redact_batch(batch: pa.Table) -> pa.Table:
    """Redact PHI fields + prose identifiers; add ``redacted_fields`` col."""
    fields_col = batch["fields"].to_pylist() if "fields" in batch.column_names else None
    texts = batch["extracted_text"].to_pylist()

    new_texts: list[str] = []
    new_fields: list[list[tuple[str, str]]] = []
    changed: list[list[str]] = []
    for i, t in enumerate(texts):
        ch: list[str] = []
        nt, text_changed = redact_text(t or "")
        if text_changed:
            ch.append("extracted_text")
        new_texts.append(nt)
        if fields_col is not None:
            f = dict(fields_col[i] or [])
            for k in sorted(f):
                if is_phi_field(k) and f[k] != REDACTED:
                    f[k] = REDACTED
                    ch.append(k)
            new_fields.append(sorted(f.items()))
        changed.append(sorted(ch))

    out = batch.set_column(batch.column_names.index("extracted_text"),
                           "extracted_text", pa.array(new_texts, pa.string()))
    if fields_col is not None:
        out = out.set_column(out.column_names.index("fields"), "fields",
                             pa.array(new_fields, pa.map_(pa.string(), pa.string())))
    return out.append_column("redacted_fields",
                             pa.array(changed, pa.list_(pa.string())))
