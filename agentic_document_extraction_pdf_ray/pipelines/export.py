"""Export sinks: JSON shapes, markdown report, signed receipt.

Mirrors the reference's export layer (SURVEY.md §2.1):
- ``export_json`` shapes minimal/standard/detailed
  (``/root/reference/src/export/json_exporter.py:87-745``);
- ``export_markdown`` narrative report with per-conversation sections
  (``src/export/markdown_exporter.py:84-811``);
- ``write_signed_receipt`` SHA-256 manifest of every artefact + optional
  HMAC signature (``src/export/signed_receipt.py``,
  ``consolidated_export.py:636-690``).

Parquet (``write_parquet`` partitioned by partition_id) remains the
DISTRIBUTED sink; these exporters are driver-side projections over small /
aggregated results, exactly like the reference's per-document exports.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import json
import os
from typing import Any


def _row_shape(row: dict[str, Any], shape: str) -> dict[str, Any]:
    fields = dict(row.get("fields") or [])
    if shape == "minimal":
        return {"conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                "extracted_text": row["extracted_text"]}
    base = {
        "conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
        "extracted_text": row["extracted_text"], "fields": fields,
        "flags": list(row.get("flags") or []),
        "confidence": row.get("confidence"),
        "segment_id": row.get("segment_id"),
    }
    if shape == "standard":
        return base
    # detailed: provenance-style span envelope included
    base["spans"] = [dict(s) for s in (row.get("spans") or [])]
    base["dup_of"] = dict(row["dup_of"]) if row.get("dup_of") else None
    return base


def export_json(rows: list[dict[str, Any]], path: str,
                shape: str = "standard") -> str:
    """Serialize extraction rows to a JSON artefact (one of 3 shapes)."""
    assert shape in ("minimal", "standard", "detailed"), shape
    payload = {
        "format_version": "1.0",
        "shape": shape,
        "n_rows": len(rows),
        "rows": [_row_shape(r, shape) for r in rows],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, sort_keys=True, default=str)
    return path


def export_markdown(conv_rows: list[dict[str, Any]], path: str) -> str:
    """Narrative per-conversation report over summary rows."""
    lines = ["# Extraction report", ""]
    for r in sorted(conv_rows, key=lambda x: x["conv_id"]):
        lines += [
            f"## Conversation `{r['conv_id']}`", "",
            f"- turns: {r['n_turns']}",
            f"- segments: {r['n_segments']}",
            f"- duplicates: {r['n_dups']}",
            f"- flagged turns: {r['n_flagged_turns']}",
            f"- mean confidence: {r['mean_confidence']:.3f}", "",
        ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def write_signed_receipt(artefact_paths: list[str], path: str,
                         hmac_key: bytes | None = None) -> str:
    """SHA-256 manifest of every artefact + optional HMAC signature."""
    entries = []
    for p in sorted(artefact_paths):
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        entries.append({"path": os.path.basename(p),
                        "sha256": h.hexdigest(),
                        "bytes": os.path.getsize(p)})
    receipt: dict[str, Any] = {"artefacts": entries}
    body = json.dumps(receipt, sort_keys=True).encode()
    if hmac_key:
        receipt["signature"] = hmac_mod.new(hmac_key, body,
                                            hashlib.sha256).hexdigest()
    with open(path, "w") as f:
        json.dump(receipt, f, sort_keys=True)
    return path


def verify_signed_receipt(path: str, artefact_dir: str,
                          hmac_key: bytes | None = None) -> bool:
    """Re-hash artefacts and check the receipt (and signature if keyed)."""
    with open(path) as f:
        receipt = json.load(f)
    sig = receipt.pop("signature", None)
    if hmac_key is not None:
        body = json.dumps({"artefacts": receipt["artefacts"]},
                          sort_keys=True).encode()
        want = hmac_mod.new(hmac_key, body, hashlib.sha256).hexdigest()
        if sig != want:
            return False
    for e in receipt["artefacts"]:
        p = os.path.join(artefact_dir, e["path"])
        if not os.path.exists(p):
            return False
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != e["sha256"]:
            return False
    return True


def export_bundle(rows: list[dict[str, Any]], path: str,
                  profile: str = "generic",
                  allowed_profiles: tuple[str, ...] = ("commerce", "analytics"),
                  ) -> str | None:
    """Profile-gated structured bundle emission (the FHIR-bundle analogue:
    ``/root/reference/src/export/consolidated_export.py:530-635`` — only
    emitted when the detected profile enables it; resources grouped per
    conversation with typed entries)."""
    if profile not in allowed_profiles:
        return None
    by_conv: dict[str, list[dict[str, Any]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    entries = []
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        entries.append({
            "resourceType": "Conversation",
            "id": conv_id,
            "turns": [{
                "turn_idx": t["turn_idx"],
                "text": t["extracted_text"],
                "fields": dict(t.get("fields") or []),
            } for t in turns],
        })
    bundle = {"resourceType": "Bundle", "profile": profile,
              "total": len(entries), "entry": entries}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(bundle, f, sort_keys=True)
    return path
