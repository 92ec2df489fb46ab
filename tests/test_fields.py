"""Cross-turn LIST-field append merge (pipelines/fields.py): key typing,
the distributed plan vs the single-process oracle on the tiny fixture,
and partitioning-invariance on a skewed (mega-conversation) fixture."""

from __future__ import annotations

import pytest

from agentic_document_extraction_pdf_ray.pipelines.fields import (
    conv_merged_fields, merged_fields_reference, split_field_key,
)


class TestKeyTyping:
    def test_list_families(self):
        assert split_field_key("date_0") == ("date", 0, True)
        assert split_field_key("amount_12") == ("amount", 12, True)
        assert split_field_key("icd10_3") == ("icd10", 3, True)

    def test_scalars(self):
        assert split_field_key("tool.status") == ("tool.status", 0, False)
        assert split_field_key("tool.k") == ("tool.k", 0, False)


def _rowset(rows):
    return {(r["conv_id"], r["field"], r["kind"], r["value"],
             int(r["n_values"]), round(float(r["confidence"]), 6))
            for r in rows}


@pytest.mark.usefixtures("ray_session")
class TestMergeEquality:
    def test_matches_reference_on_tiny(self, tiny_transcripts, tiny_golden):
        got = conv_merged_fields(tiny_transcripts).take_all()
        want = merged_fields_reference(tiny_golden)
        assert len(got) == len(want)
        assert _rowset(got) == _rowset(want)
        # conversation-level list families actually accumulate across turns
        multi = [r for r in got
                 if r["kind"] == "list" and int(r["n_values"]) > 1]
        assert multi, "fixture should produce multi-valued list fields"

    def test_partitioning_invariance(self, tiny_transcripts):
        a = conv_merged_fields(tiny_transcripts, n_buckets=4).take_all()
        b = conv_merged_fields(tiny_transcripts, n_buckets=97).take_all()
        assert _rowset(a) == _rowset(b)


@pytest.mark.usefixtures("ray_session")
class TestSkewedMerge:
    @pytest.fixture(scope="class")
    def skewed(self, tmp_path_factory):
        from agentic_document_extraction_pdf_ray.sources.transcripts import (
            generate_transcripts,
        )
        d = tmp_path_factory.mktemp("skewed_fields")
        generate_transcripts(str(d), 2000, seed=7, mega_convs=2)
        return str(d)

    def test_mega_conversation_merge_is_partition_invariant(self, skewed):
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.oracle.core import (
            oracle_extract_table,
        )
        got = conv_merged_fields(skewed, n_buckets=8).take_all()
        want = merged_fields_reference(
            oracle_extract_table(pq.read_table(skewed).to_pylist()))
        assert _rowset(got) == _rowset(want)
