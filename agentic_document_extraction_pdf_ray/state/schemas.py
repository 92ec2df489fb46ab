"""Schema builder + versioning: the §2.11 extension surface.

Mirrors the reference's fluent schema construction and semver'd version
management (``/root/reference/src/schemas/schema_builder.py`` FieldBuilder
/ SchemaBuilder; ``src/schemas/versioning.py`` SchemaVersionManager —
content-hash dedupe, patch bump on additive change, minor bump on field
removal, field-level diff, result migration dropping removed fields and
nulling added ones). Everything is plain dicts/dataclasses so schemas
serialize into the registry and broadcast cleanly to Ray workers.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

FIELD_TYPES = ("string", "number", "date", "boolean", "currency",
               "list", "table")


class FieldBuilder:
    """Fluent per-field builder (reference FieldBuilder :30-180)."""

    def __init__(self, name: str):
        self._d: dict[str, Any] = {"name": name, "field_type": "string",
                                   "required": False}

    def type(self, field_type: str) -> "FieldBuilder":
        if field_type not in FIELD_TYPES:
            raise ValueError(f"unknown field type {field_type!r}")
        self._d["field_type"] = field_type
        return self

    def required(self, is_required: bool = True) -> "FieldBuilder":
        self._d["required"] = bool(is_required)
        return self

    def optional(self) -> "FieldBuilder":
        return self.required(False)

    def display_name(self, name: str) -> "FieldBuilder":
        self._d["display_name"] = name
        return self

    def description(self, desc: str) -> "FieldBuilder":
        self._d["description"] = desc
        return self

    def pattern(self, regex: str) -> "FieldBuilder":
        self._d["pattern"] = regex
        return self

    def allowed_values(self, values: list[str]) -> "FieldBuilder":
        self._d["allowed_values"] = list(values)
        return self

    def range(self, min_val: float, max_val: float) -> "FieldBuilder":
        self._d["min_value"] = min_val
        self._d["max_value"] = max_val
        return self

    def examples(self, examples: list[str]) -> "FieldBuilder":
        self._d["examples"] = list(examples)
        return self

    def build(self) -> dict[str, Any]:
        return dict(self._d)


class SchemaBuilder:
    """Fluent schema builder (reference SchemaBuilder :279-420)."""

    def __init__(self, name: str, document_type: str = "custom"):
        self._name = name
        self._document_type = document_type
        self._display_name = name.replace("_", " ").title()
        self._description = ""
        self._fields: list[dict[str, Any]] = []
        self._rules: list[dict[str, Any]] = []
        self._hints: list[str] = []

    def display_name(self, name: str) -> "SchemaBuilder":
        self._display_name = name
        return self

    def description(self, desc: str) -> "SchemaBuilder":
        self._description = desc
        return self

    def field(self, fb: "FieldBuilder | dict[str, Any]") -> "SchemaBuilder":
        f = fb.build() if isinstance(fb, FieldBuilder) else dict(fb)
        if any(x["name"] == f["name"] for x in self._fields):
            raise ValueError(f"duplicate field {f['name']!r}")
        self._fields.append(f)
        return self

    def rule(self, name: str, source: str, target: str,
             op: str, **kw: Any) -> "SchemaBuilder":
        self._rules.append({"name": name, "source": source,
                            "target": target, "op": op, **kw})
        return self

    def classification_hints(self, hints: list[str]) -> "SchemaBuilder":
        self._hints = list(hints)
        return self

    def build(self) -> dict[str, Any]:
        if not self._fields:
            raise ValueError("schema needs at least one field")
        return {
            "name": self._name,
            "document_type": self._document_type,
            "display_name": self._display_name,
            "description": self._description,
            "fields": list(self._fields),
            "cross_field_rules": list(self._rules),
            "classification_hints": list(self._hints),
        }


def build_custom_schema(name: str,
                        fields: dict[str, str | dict[str, Any]],
                        **kwargs: Any) -> dict[str, Any]:
    """Shorthand: {field_name: type | spec-dict} → schema dict."""
    b = SchemaBuilder(name, kwargs.pop("document_type", "custom"))
    for fname, spec in fields.items():
        fb = FieldBuilder(fname)
        if isinstance(spec, str):
            fb.type(spec)
        else:
            fb.type(spec.get("field_type", "string"))
            if spec.get("required"):
                fb.required()
            for k in ("pattern", "display_name", "description"):
                if k in spec:
                    getattr(fb, k)(spec[k])
        b.field(fb)
    return b.build()


# ------------------------------------------------------------------ versioning

@dataclass
class SchemaVersion:
    schema_name: str
    version: str
    content_hash: str
    fields: list[dict[str, Any]]
    schema: dict[str, Any] = dc_field(default_factory=dict)


def _schema_hash(schema: dict[str, Any]) -> str:
    h = hashlib.sha256()
    for f in sorted(schema["fields"], key=lambda x: x["name"]):
        h.update(f["name"].encode())
        h.update(str(f.get("field_type")).encode())
        h.update(str(bool(f.get("required"))).encode())
    for rule in sorted(schema.get("cross_field_rules", []),
                       key=lambda r: r.get("name", "")):
        h.update(rule.get("name", "").encode())
    return h.hexdigest()


class SchemaVersionManager:
    """Semver'd schema history (reference SchemaVersionManager :112-430):
    re-registering identical content is a no-op; removing a field bumps
    MINOR (breaking); any other change bumps PATCH. Optional
    ``storage_dir`` persists each version as JSON."""

    def __init__(self, storage_dir: str | None = None):
        self._versions: dict[str, list[SchemaVersion]] = {}
        self._storage_dir = storage_dir

    def register_version(self, schema: dict[str, Any]) -> SchemaVersion:
        name = schema["name"]
        content = _schema_hash(schema)
        latest = self.get_latest(name)
        if latest is not None and latest.content_hash == content:
            return latest                          # identical → no-op
        if latest is None:
            version = "1.0.0"
        else:
            major, minor, patch = (int(x) for x in latest.version.split("."))
            old_names = {f["name"] for f in latest.fields}
            new_names = {f["name"] for f in schema["fields"]}
            if old_names - new_names:
                version = f"{major}.{minor + 1}.0"   # breaking: removal
            else:
                version = f"{major}.{minor}.{patch + 1}"
        v = SchemaVersion(name, version, content,
                          [dict(f) for f in schema["fields"]], dict(schema))
        self._versions.setdefault(name, []).append(v)
        if self._storage_dir:
            d = os.path.join(self._storage_dir, name)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"v{version.replace('.', '_')}.json")
            with open(path, "w") as f:
                json.dump({"schema_name": name, "version": version,
                           "content_hash": content,
                           "fields": v.fields}, f, indent=2, sort_keys=True)
        return v

    def get_latest(self, name: str) -> SchemaVersion | None:
        hist = self._versions.get(name)
        return hist[-1] if hist else None

    def get_version(self, name: str, version: str) -> SchemaVersion | None:
        for v in self._versions.get(name, []):
            if v.version == version:
                return v
        return None

    def get_history(self, name: str) -> list[SchemaVersion]:
        return list(self._versions.get(name, []))

    def diff(self, name: str, from_version: str,
             to_version: str) -> list[dict[str, Any]]:
        """Field-level changes [{change, field, old, new}] (reference
        ``_compute_changes`` order: added, removed, type/required)."""
        v_from = self.get_version(name, from_version)
        v_to = self.get_version(name, to_version)
        if v_from is None or v_to is None:
            raise KeyError(f"unknown version for {name!r}")
        from_f = {f["name"]: f for f in v_from.fields}
        to_f = {f["name"]: f for f in v_to.fields}
        changes: list[dict[str, Any]] = []
        for n in to_f:
            if n not in from_f:
                changes.append({"change": "field_added", "field": n,
                                "old": None, "new": to_f[n].get("field_type")})
        for n in from_f:
            if n not in to_f:
                changes.append({"change": "field_removed", "field": n,
                                "old": from_f[n].get("field_type"), "new": None})
        for n in from_f:
            if n in to_f:
                if from_f[n].get("field_type") != to_f[n].get("field_type"):
                    changes.append({"change": "field_type_changed", "field": n,
                                    "old": from_f[n].get("field_type"),
                                    "new": to_f[n].get("field_type")})
                if bool(from_f[n].get("required")) != bool(to_f[n].get("required")):
                    changes.append({"change": "field_required_changed",
                                    "field": n,
                                    "old": from_f[n].get("required"),
                                    "new": to_f[n].get("required")})
        return changes

    def migrate_result(self, result: dict[str, Any], name: str,
                       from_version: str, to_version: str) -> dict[str, Any]:
        """Added fields → None; removed fields → dropped (reference
        ``migrate_result`` :277-328)."""
        migrated = dict(result)
        for change in self.diff(name, from_version, to_version):
            if change["change"] == "field_added":
                migrated.setdefault(change["field"], None)
            elif change["change"] == "field_removed":
                migrated.pop(change["field"], None)
        return migrated


def schema_batch_validator(schema: dict[str, Any]) -> Callable:
    """Compile a schema into a vectorizable per-batch validator: returns
    a ``map_batches``-ready fn flagging rows whose ``fields`` miss a
    required field or break a pattern/allowed-values constraint."""
    import re as _re

    import pyarrow as pa

    required = [f["name"] for f in schema["fields"] if f.get("required")]
    patterns = {f["name"]: _re.compile(f["pattern"])
                for f in schema["fields"] if f.get("pattern")}
    allowed = {f["name"]: frozenset(f["allowed_values"])
               for f in schema["fields"] if f.get("allowed_values")}

    def validate(batch: pa.Table) -> pa.Table:
        issues: list[list[str]] = []
        for fmap in batch["fields"].to_pylist():
            fd = dict(fmap)
            row_issues = [f"missing:{r}" for r in required if r not in fd]
            for k, v in fd.items():
                if k in patterns and not patterns[k].match(v):
                    row_issues.append(f"pattern:{k}")
                if k in allowed and v not in allowed[k]:
                    row_issues.append(f"allowed:{k}")
            issues.append(sorted(row_issues))
        return batch.append_column(
            "schema_issues", pa.array(issues, pa.list_(pa.string())))

    return validate
