"""Salted mega-conversation path equals the unsalted pipeline (M4)."""

import pytest

from agentic_document_extraction_pdf_ray.pipelines.extract import (
    extract_pipeline, sort_output,
)
from agentic_document_extraction_pdf_ray.pipelines.scale import extract_pipeline_salted


@pytest.fixture(scope="module")
def skewed_transcripts(tmp_path_factory):
    """5k turns with two mega-conversations (~25% of all turns)."""
    from agentic_document_extraction_pdf_ray.sources.transcripts import generate_transcripts
    d = tmp_path_factory.mktemp("skewed")
    generate_transcripts(str(d), 5000, seed=7, mega_convs=2)
    return str(d)


def _key(r):
    return (r["conv_id"], r["turn_idx"])


@pytest.mark.usefixtures("ray_session")
class TestSaltedEquality:
    def test_salted_equals_unsalted(self, skewed_transcripts):
        # chunk_size far below the mega-conv length → many salted chunks.
        plain = sort_output(extract_pipeline(skewed_transcripts)).take_all()
        salted = sort_output(
            extract_pipeline_salted(skewed_transcripts, chunk_size=100)).take_all()
        assert len(plain) == len(salted)
        for p, s in zip(plain, salted):
            assert _key(p) == _key(s)
            assert p["extracted_text"] == s["extracted_text"], _key(p)
            assert p["segment_id"] == s["segment_id"], _key(p)
            assert p["confidence"] == s["confidence"], _key(p)
            dp, ds_ = p["dup_of"], s["dup_of"]
            if dp is None:
                assert ds_ is None, _key(p)
            else:
                assert ds_ is not None and ds_["turn_idx"] == dp["turn_idx"], _key(p)

    def test_mega_conv_spans_chunks(self, skewed_transcripts):
        salted = extract_pipeline_salted(skewed_transcripts, chunk_size=100)
        rows = [r for r in salted.take_all() if r["conv_id"].startswith("mega-")]
        assert len(rows) > 300, "fixture should contain mega-conversations"


@pytest.mark.usefixtures("ray_session")
class TestShuffleFirstEquality:
    def test_shuffle_first_equals_plain(self, skewed_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            extract_pipeline_shuffle_first,
        )
        plain = sort_output(extract_pipeline(skewed_transcripts)).take_all()
        alt = sort_output(
            extract_pipeline_shuffle_first(skewed_transcripts,
                                           num_partitions=16)).take_all()
        assert len(plain) == len(alt)
        for p, s in zip(plain, alt):
            assert _key(p) == _key(s)
            assert p["extracted_text"] == s["extracted_text"], _key(p)
            assert p["segment_id"] == s["segment_id"], _key(p)
            dp, ds_ = p["dup_of"], s["dup_of"]
            assert (dp is None) == (ds_ is None), _key(p)


@pytest.mark.usefixtures("ray_session")
class TestAutoRouting:
    def test_hot_detection_and_routing_equality(self, skewed_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            detect_hot_convs, extract_pipeline_auto,
        )
        hot = detect_hot_convs(skewed_transcripts, turn_threshold=200)
        assert hot and all(c.startswith("mega-") for c in hot)
        plain = sort_output(extract_pipeline(skewed_transcripts)).take_all()
        auto = sort_output(extract_pipeline_auto(
            skewed_transcripts, turn_threshold=200, chunk_size=100)).take_all()
        assert len(plain) == len(auto)
        for p, a in zip(plain, auto):
            assert _key(p) == _key(a)
            assert p["extracted_text"] == a["extracted_text"], _key(p)
            assert p["segment_id"] == a["segment_id"], _key(p)

    def test_no_hot_falls_back(self, tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            extract_pipeline_auto,
        )
        out = extract_pipeline_auto(tiny_transcripts, turn_threshold=10_000)
        assert out.count() == 1000


@pytest.mark.usefixtures("ray_session")
class TestGappedTurnIndices:
    """Turn indices that don't start at 0 and have gaps: the segment
    formula B(t) - B(min_turn) and dedup must hold on all variants."""

    def _fixture(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        rows = []
        for conv, offs in (("ca", 5), ("cb", 100)):
            for i, (role, text) in enumerate([
                ("user", "first message with plain words"),
                ("assistant", "# Header\n\nsection text here"),
                ("user", "duplicate me please now"),
                ("system", "You are a helpful assistant."),
                ("user", "duplicate me please now"),
            ]):
                rows.append({"conv_id": conv, "turn_idx": offs + i * 7,
                             "role": role, "text": text, "tool": ""})
        t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
        d = tmp_path / "gapped"
        d.mkdir()
        pq.write_table(t, str(d / "part-0.parquet"))
        return str(d)

    def test_all_variants_agree_with_oracle(self, tmp_path):
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.oracle.core import oracle_extract_table
        from agentic_document_extraction_pdf_ray.pipelines.scale import (
            extract_pipeline_salted,
        )
        src = self._fixture(tmp_path)
        golden = {(r["conv_id"], r["turn_idx"]): r
                  for r in oracle_extract_table(pq.read_table(src).to_pylist())}
        for variant in (
            lambda: extract_pipeline(src),
            lambda: extract_pipeline_salted(src, chunk_size=2),
        ):
            out = sort_output(variant()).take_all()
            assert len(out) == len(golden)
            for got in out:
                want = golden[(got["conv_id"], got["turn_idx"])]
                assert got["segment_id"] == want["segment_id"], got
                dw = want["dup_of"]
                dg = got["dup_of"]
                assert (dg is None) == (dw is None), got
                if dw:
                    assert dg["turn_idx"] == dw["turn_idx"]


@pytest.mark.usefixtures("ray_session")
class TestSkewedOracleEquality:
    def test_plain_matches_oracle_on_skewed_fixture(self, skewed_transcripts):
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.oracle.core import oracle_extract_table
        golden = {(r["conv_id"], r["turn_idx"]): r
                  for r in oracle_extract_table(
                      pq.read_table(skewed_transcripts).to_pylist())}
        out = sort_output(extract_pipeline(skewed_transcripts)).take_all()
        assert len(out) == len(golden)
        for got in out:
            want = golden[(got["conv_id"], got["turn_idx"])]
            assert got["extracted_text"] == want["extracted_text"]
            assert got["confidence"] == want["confidence"]
            assert got["segment_id"] == want["segment_id"]
            assert (got["dup_of"] is None) == (want["dup_of"] is None)
