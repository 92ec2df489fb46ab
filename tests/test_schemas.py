"""Schema builder + versioning (state/schemas.py) — reference semantics:
fluent construction, content-hash no-op re-registration, patch/minor
bumps, field-level diff, result migration, batch validation."""

from __future__ import annotations

import pyarrow as pa
import pytest

from agentic_document_extraction_pdf_ray.state.schemas import (
    FieldBuilder, SchemaBuilder, SchemaVersionManager, build_custom_schema,
    schema_batch_validator,
)


def _schema(fields):
    b = SchemaBuilder("claim")
    for f in fields:
        b.field(f)
    return b.build()


class TestBuilder:
    def test_fluent_build(self):
        s = (SchemaBuilder("invoice")
             .display_name("Invoice Document")
             .field(FieldBuilder("invoice_number").type("string").required()
                    .pattern(r"^INV-\d{6}$"))
             .field(FieldBuilder("total").type("currency").range(0.01, 1e9))
             .rule("dates", "invoice_date", "due_date", "date_before")
             .classification_hints(["INVOICE", "BILL"])
             .build())
        assert s["display_name"] == "Invoice Document"
        assert [f["name"] for f in s["fields"]] == ["invoice_number", "total"]
        assert s["fields"][0]["required"] is True
        assert s["cross_field_rules"][0]["op"] == "date_before"

    def test_guards(self):
        with pytest.raises(ValueError, match="at least one field"):
            SchemaBuilder("empty").build()
        with pytest.raises(ValueError, match="duplicate"):
            (SchemaBuilder("x").field(FieldBuilder("a"))
             .field(FieldBuilder("a")))
        with pytest.raises(ValueError, match="unknown field type"):
            FieldBuilder("a").type("blob")

    def test_build_custom_schema_shorthand(self):
        s = build_custom_schema("quick", {"a": "string",
                                          "b": {"field_type": "number",
                                                "required": True}})
        by_name = {f["name"]: f for f in s["fields"]}
        assert by_name["b"]["required"] is True
        assert by_name["a"]["field_type"] == "string"


class TestVersioning:
    def test_register_dedupe_and_bumps(self):
        m = SchemaVersionManager()
        v1 = m.register_version(_schema([FieldBuilder("a").build()]))
        assert v1.version == "1.0.0"
        # identical content → no new version
        again = m.register_version(_schema([FieldBuilder("a").build()]))
        assert again.version == "1.0.0"
        assert len(m.get_history("claim")) == 1
        # additive change → patch bump
        v2 = m.register_version(_schema([FieldBuilder("a").build(),
                                         FieldBuilder("b").build()]))
        assert v2.version == "1.0.1"
        # removal → minor bump (breaking)
        v3 = m.register_version(_schema([FieldBuilder("b").build()]))
        assert v3.version == "1.1.0"
        assert m.get_latest("claim").version == "1.1.0"

    def test_diff_and_migrate(self):
        m = SchemaVersionManager()
        m.register_version(_schema([
            FieldBuilder("a").type("string").build(),
            FieldBuilder("b").type("number").build()]))
        m.register_version(_schema([
            FieldBuilder("a").type("date").required().build(),
            FieldBuilder("c").type("string").build()]))
        changes = m.diff("claim", "1.0.0", "1.1.0")
        kinds = {(c["change"], c["field"]) for c in changes}
        assert ("field_added", "c") in kinds
        assert ("field_removed", "b") in kinds
        assert ("field_type_changed", "a") in kinds
        assert ("field_required_changed", "a") in kinds
        migrated = m.migrate_result({"a": "x", "b": 3}, "claim",
                                    "1.0.0", "1.1.0")
        assert migrated == {"a": "x", "c": None}

    def test_persistence(self, tmp_path):
        m = SchemaVersionManager(storage_dir=str(tmp_path))
        m.register_version(_schema([FieldBuilder("a").build()]))
        assert (tmp_path / "claim" / "v1_0_0.json").exists()


class TestBatchValidator:
    def test_validator_flags(self, ray_session):
        import ray.data
        schema = (SchemaBuilder("s")
                  .field(FieldBuilder("npi_0").required()
                         .pattern(r"^\d{10}$"))
                  .field(FieldBuilder("status")
                         .allowed_values(["ok", "error"]))
                  .build())
        fn = schema_batch_validator(schema)
        tbl = pa.table({"fields": pa.array(
            [[("npi_0", "1234567893"), ("status", "ok")],
             [("status", "nope")],
             [("npi_0", "12x")]],
            pa.map_(pa.string(), pa.string()))})
        out = ray.data.from_arrow(tbl).map_batches(
            fn, batch_format="pyarrow").take_all()
        assert out[0]["schema_issues"] == []
        assert out[1]["schema_issues"] == ["allowed:status", "missing:npi_0"]
        assert out[2]["schema_issues"] == ["pattern:npi_0"]
