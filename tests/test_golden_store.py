"""Versioned golden-sample store (reference
``src/evaluation/golden_dataset.py:24-260``): immutable copy-on-write
versions, order-insensitive content hashing with commit dedup, add /
remove / filter / stats APIs over streaming Parquet."""

from __future__ import annotations

import json
import os

import pytest

from agentic_document_extraction_pdf_ray.state.golden import (
    GoldenStore, samples_table,
)

ROWS = [
    {"sample_id": "s1", "document_type": "invoice", "schema_name": "inv_v1",
     "expected_fields": {"total": "10.00", "date": "2024-01-01"},
     "source_file": "a.pdf", "tags": ["easy", "single-page"]},
    {"sample_id": "s2", "document_type": "invoice", "schema_name": "inv_v1",
     "expected_fields": {"total": "99.50"}, "tags": ["hard"]},
    {"sample_id": "s3", "document_type": "w2", "schema_name": "w2_v2",
     "expected_fields": {"wages": "55000"}, "tags": ["easy"]},
]


@pytest.mark.usefixtures("ray_session")
class TestGoldenStore:
    def test_commit_load_roundtrip(self, tmp_path):
        store = GoldenStore(str(tmp_path / "golden"))
        v = store.commit("core", samples_table(ROWS), description="first")
        assert v == 1
        got = sorted(store.load("core").take_all(),
                     key=lambda r: r["sample_id"])
        assert [r["sample_id"] for r in got] == ["s1", "s2", "s3"]
        assert dict(got[0]["expected_fields"]) == {
            "date": "2024-01-01", "total": "10.00"}
        mf = store.versions("core")
        assert len(mf) == 1 and mf[0]["sample_count"] == 3

    def test_content_hash_is_order_insensitive(self, tmp_path):
        store = GoldenStore(str(tmp_path / "golden"))
        assert store.commit("core", samples_table(ROWS)) == 1
        # same sample SET, different row order AND different field-dict
        # insertion order -> same hash -> commit dedups to v1
        shuffled = [dict(ROWS[2]), dict(ROWS[0]), dict(ROWS[1])]
        shuffled[1]["expected_fields"] = {"date": "2024-01-01",
                                          "total": "10.00"}
        assert store.commit("core", samples_table(shuffled)) == 1
        assert store.latest_version("core") == 1

    def test_add_is_copy_on_write(self, tmp_path):
        store = GoldenStore(str(tmp_path / "golden"))
        store.commit("core", samples_table(ROWS))
        v2 = store.add_samples("core", samples_table([
            {"sample_id": "s4", "document_type": "w2",
             "schema_name": "w2_v2", "expected_fields": {"wages": "1"},
             "tags": ["hard", "handwritten"]}]))
        assert v2 == 2
        assert store.load("core", version=1).count() == 3   # v1 untouched
        assert store.load("core").count() == 4
        with pytest.raises(ValueError):
            store.add_samples("core", samples_table([ROWS[0]]))  # dup id

    def test_remove_and_filter_and_stats(self, tmp_path):
        store = GoldenStore(str(tmp_path / "golden"))
        store.commit("core", samples_table(ROWS))
        v2 = store.remove_samples("core", ["s2"])
        assert v2 == 2 and store.load("core").count() == 2

        inv = store.filter("core", version=1,
                           document_type="invoice").take_all()
        assert sorted(r["sample_id"] for r in inv) == ["s1", "s2"]
        easy = store.filter("core", version=1, tag="easy").take_all()
        assert sorted(r["sample_id"] for r in easy) == ["s1", "s3"]
        both = store.filter("core", version=1, document_type="invoice",
                            tag="easy").take_all()
        assert [r["sample_id"] for r in both] == ["s1"]

        st = store.stats("core", version=1)
        assert st == {"sample_count": 3,
                      "document_types": ["invoice", "w2"],
                      "schema_names": ["inv_v1", "w2_v2"],
                      "all_tags": ["easy", "hard", "single-page"]}

    def test_manifest_files_on_disk(self, tmp_path):
        root = str(tmp_path / "golden")
        store = GoldenStore(root)
        store.commit("core", samples_table(ROWS), description="seed")
        mf = json.load(open(os.path.join(root, "core", "v001",
                                         "manifest.json")))
        assert mf["description"] == "seed"
        assert len(mf["content_hash"]) == 32

    def test_crash_leftover_never_pollutes_next_commit(self, tmp_path):
        """A manifestless version dir (crash between data write and
        manifest) must be cleared when its number is reused, and a
        commit must publish atomically (no v-dir without a manifest)."""
        root = str(tmp_path / "golden")
        store = GoldenStore(root)
        stale = os.path.join(root, "core", "v001", "samples")
        os.makedirs(stale)
        with open(os.path.join(stale, "junk-uuid.parquet"), "w") as f:
            f.write("not parquet")
        v = store.commit("core", samples_table(ROWS))
        assert v == 1
        files = os.listdir(os.path.join(root, "core", "v001", "samples"))
        assert "junk-uuid.parquet" not in files     # stale dir replaced
        assert store.load("core").count() == len(ROWS)
        # no temp dirs linger after a successful publish
        assert not [d for d in os.listdir(os.path.join(root, "core"))
                    if d.startswith(".tmp-")]

    def test_committed_version_dir_never_overwritten(self, tmp_path):
        store = GoldenStore(str(tmp_path / "golden"))
        store.commit("core", samples_table(ROWS))
        # a version published by another writer (manifest present) is
        # seen by versions(): the next commit targets v003 and v002's
        # files are untouched
        d2 = os.path.join(str(tmp_path / "golden"), "core", "v002")
        os.makedirs(d2)
        with open(os.path.join(d2, "manifest.json"), "w") as f:
            f.write('{"version": 2, "content_hash": "x", '
                    '"sample_count": 0, "name": "core"}')
        v = store.commit("core", samples_table(ROWS + [
            {"sample_id": "s9", "expected_fields": {}}]))
        assert v == 3
        assert os.listdir(d2) == ["manifest.json"]   # untouched
