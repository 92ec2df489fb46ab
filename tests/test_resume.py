"""Resume-without-recompute: kill after K partitions, rerun, byte-identical
output and no recomputation of committed partitions (SURVEY.md §5, M5)."""

import os

import pytest

from agentic_document_extraction_pdf_ray.pipelines.resume import (
    read_extract_output, run_resumable_extract,
)
from agentic_document_extraction_pdf_ray.state.manifest import load_manifests

P = 8


def _data_files(out_dir):
    out = {}
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("partition_id="):
            f = os.path.join(out_dir, d, "part-0.parquet")
            out[d] = (os.path.getmtime(f), os.path.getsize(f))
    return out


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def test_full_run_matches_oracle(self, tiny_transcripts, tiny_golden, tmp_path):
        out = str(tmp_path / "out")
        res = run_resumable_extract(tiny_transcripts, out, num_partitions=P)
        assert len(res["computed"]) <= P and not res["skipped"]
        rows = read_extract_output(out).take_all()
        assert len(rows) == len(tiny_golden)
        got = {(r["conv_id"], r["turn_idx"]): r for r in rows}
        for w in tiny_golden:
            g = got[(w["conv_id"], w["turn_idx"])]
            assert g["extracted_text"] == w["extracted_text"]
            assert g["segment_id"] == w["segment_id"]

    def test_kill_and_resume(self, tiny_transcripts, tmp_path):
        out_a = str(tmp_path / "a")      # interrupted + resumed
        out_b = str(tmp_path / "b")      # clean single run

        # First attempt dies on two injected partition failures.
        with pytest.raises(Exception):
            run_resumable_extract(tiny_transcripts, out_a, num_partitions=P,
                                  fail_partitions=frozenset({"00006", "00007"}))
        done_before = set(load_manifests(out_a))
        assert done_before, "some partitions should have committed before the crash"
        assert {"00006", "00007"}.isdisjoint(done_before)
        files_before = _data_files(out_a)

        # Resume: only the missing partitions are computed.
        res = run_resumable_extract(tiny_transcripts, out_a, num_partitions=P)
        assert set(res["skipped"]) == done_before
        assert set(res["computed"]).isdisjoint(done_before)
        files_after = _data_files(out_a)
        for d, stamp in files_before.items():
            assert files_after[d] == stamp, f"{d} was recomputed"

        # Resumed output is identical to a clean run (incl. checksums).
        run_resumable_extract(tiny_transcripts, out_b, num_partitions=P)
        ma, mb = load_manifests(out_a), load_manifests(out_b)
        assert set(ma) == set(mb)
        for pid in ma:
            assert ma[pid]["checksum"] == mb[pid]["checksum"], pid
            assert ma[pid]["row_count"] == mb[pid]["row_count"], pid
            assert ma[pid]["flag_counts"] == mb[pid]["flag_counts"], pid

    def test_noop_rerun(self, tiny_transcripts, tmp_path):
        out = str(tmp_path / "out")
        run_resumable_extract(tiny_transcripts, out, num_partitions=P)
        res = run_resumable_extract(tiny_transcripts, out, num_partitions=P)
        assert not res["computed"]
        assert len(res["skipped"]) == len(res["manifests"])

    def test_fingerprint_change_recomputes(self, tiny_transcripts, tmp_path):
        out = str(tmp_path / "out")
        run_resumable_extract(tiny_transcripts, out, num_partitions=P)
        # Different partition count → different fingerprint → full recompute.
        res = run_resumable_extract(tiny_transcripts, out, num_partitions=4)
        assert res["computed"] and not res["skipped"]


@pytest.mark.usefixtures("ray_session")
class TestSaltedResume:
    """Kill/resume for the salted (mega-conversation) plan: committed
    partitions are skipped and never rewritten; resumed output matches a
    clean salted run AND the plain plan's semantics."""

    @pytest.fixture(scope="class")
    def skewed(self, tmp_path_factory):
        from agentic_document_extraction_pdf_ray.sources.transcripts import (
            generate_transcripts,
        )
        d = tmp_path_factory.mktemp("skewed_resume")
        generate_transcripts(str(d), 2000, seed=7, mega_convs=2)
        return str(d)

    def test_salted_kill_and_resume(self, skewed, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.resume import (
            run_resumable_extract_salted,
        )
        out_a = str(tmp_path / "a")
        out_b = str(tmp_path / "b")

        with pytest.raises(Exception):
            run_resumable_extract_salted(
                skewed, out_a, chunk_size=100, num_partitions=P,
                fail_partitions=frozenset({"00006", "00007"}))
        done_before = set(load_manifests(out_a))
        assert done_before, "some partitions should have committed"
        assert {"00006", "00007"}.isdisjoint(done_before)
        files_before = _data_files(out_a)

        res = run_resumable_extract_salted(skewed, out_a, chunk_size=100,
                                           num_partitions=P)
        assert set(res["skipped"]) == done_before
        assert set(res["computed"]).isdisjoint(done_before)
        files_after = _data_files(out_a)
        for d, stamp in files_before.items():
            assert files_after[d] == stamp, f"{d} was recomputed"

        run_resumable_extract_salted(skewed, out_b, chunk_size=100,
                                     num_partitions=P)
        ma, mb = load_manifests(out_a), load_manifests(out_b)
        assert set(ma) == set(mb)
        for pid in ma:
            assert ma[pid]["checksum"] == mb[pid]["checksum"], pid
            assert ma[pid]["row_count"] == mb[pid]["row_count"], pid

    def test_salted_resume_output_matches_plain_plan(self, skewed, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            extract_pipeline, sort_output,
        )
        from agentic_document_extraction_pdf_ray.pipelines.resume import (
            run_resumable_extract_salted,
        )
        out = str(tmp_path / "out")
        run_resumable_extract_salted(skewed, out, chunk_size=100,
                                     num_partitions=P)
        got = {(r["conv_id"], r["turn_idx"]): r
               for r in read_extract_output(out).take_all()}
        want = sort_output(extract_pipeline(skewed)).take_all()
        assert len(got) == len(want)
        for w in want:
            g = got[(w["conv_id"], w["turn_idx"])]
            assert g["extracted_text"] == w["extracted_text"]
            assert g["segment_id"] == w["segment_id"]
            assert g["dup_of"] == w["dup_of"]
