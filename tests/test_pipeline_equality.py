"""The correctness contract: Ray pipeline output == single-process oracle,
row-for-row, under stable (conv_id, turn_idx) ordering (BASELINE.md)."""

import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.oracle.core import oracle_conv_summary
from agentic_document_extraction_pdf_ray.pipelines.extract import (
    conv_summaries, extract_pipeline, sort_output,
)


def _span_tuples(spans):
    return [(s["start"], s["end"], s["label"]) for s in spans or []]


@pytest.mark.usefixtures("ray_session")
class TestEquality:
    def test_per_turn_equality(self, tiny_transcripts, tiny_golden):
        out = sort_output(extract_pipeline(tiny_transcripts)).take_all()
        assert len(out) == len(tiny_golden)
        for got, want in zip(out, tiny_golden):
            key = (want["conv_id"], want["turn_idx"])
            assert (got["conv_id"], got["turn_idx"]) == key
            assert got["extracted_text"] == want["extracted_text"], key
            assert _span_tuples(got["spans"]) == _span_tuples(want["spans"]), key
            assert dict(got["fields"] or {}) == want["fields"], key
            assert list(got["flags"] or []) == want["flags"], key
            assert got["confidence"] == want["confidence"], key
            assert got["segment_id"] == want["segment_id"], key
            dw, dg = want["dup_of"], got["dup_of"]
            if dw is None:
                assert dg is None, key
            else:
                assert dg is not None and dg["turn_idx"] == dw["turn_idx"], key

    def test_order_restored_from_shuffled_input(self, tiny_transcripts):
        # Input files are deliberately row-shuffled by the generator; output
        # must still come back in (conv_id, turn_idx) order.
        raw = pq.read_table(tiny_transcripts)
        keys = list(zip(raw["conv_id"].to_pylist(), raw["turn_idx"].to_pylist()))
        assert keys != sorted(keys), "fixture should be out of order"
        out = sort_output(extract_pipeline(tiny_transcripts)).take_all()
        out_keys = [(r["conv_id"], r["turn_idx"]) for r in out]
        assert out_keys == sorted(out_keys)

    def test_conv_summaries(self, tiny_transcripts, tiny_golden):
        got = {r["conv_id"]: r
               for r in conv_summaries(tiny_transcripts).take_all()}
        want = oracle_conv_summary(tiny_golden)
        assert len(got) == len(want)
        for w in want:
            g = got[w["conv_id"]]
            for k in ("n_turns", "n_segments", "n_dups", "mean_confidence",
                      "n_flagged_turns"):
                assert g[k] == w[k], (w["conv_id"], k)

    def test_dedup_points_to_first_occurrence(self, tiny_golden):
        dups = [r for r in tiny_golden if r["dup_of"] is not None]
        assert dups, "fixture should contain exact duplicates"
        by_key = {(r["conv_id"], r["turn_idx"]): r for r in tiny_golden}
        for d in dups:
            first = by_key[(d["dup_of"]["conv_id"], d["dup_of"]["turn_idx"])]
            assert first["dup_of"] is None
            assert first["turn_idx"] < d["turn_idx"]


@pytest.mark.usefixtures("ray_session")
class TestQualityCheck:
    def test_clean_fixture(self, tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            transcripts_quality_check,
        )
        row = transcripts_quality_check(tiny_transcripts).take_all()[0]
        assert row["n_rows"] == 1000
        assert row["n_dup_keys"] == 0
        assert row["n_empty_text"] > 0       # fixture includes empty turns

    def test_detects_duplicates(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            transcripts_quality_check,
        )
        t = pa.table({"conv_id": ["c", "c", "c"], "turn_idx": [0, 0, 1],
                      "role": ["user"] * 3, "text": ["a", "b", ""],
                      "tool": [""] * 3})
        pq.write_table(t, str(tmp_path / "p.parquet"))
        row = transcripts_quality_check(str(tmp_path / "p.parquet")).take_all()[0]
        assert row["n_dup_keys"] == 1 and row["n_empty_text"] == 1
