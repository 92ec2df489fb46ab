"""Human-correction merge-back (reference runner.py:251-306 resume with
corrections; orchestrator.py:1510-1572 _apply_human_corrections):
corrected value wins at confidence 1.0 with provenance, unknown fields
are added, and the resumable writer skips already-corrected partitions."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.pipelines.corrections import (
    apply_corrections, overlay_corrections, run_resumable_corrections,
)
from agentic_document_extraction_pdf_ray.state.manifest import load_manifests


def _base_df():
    return pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "field": ["total", "date", "total"],
        "kind": ["scalar", "scalar", "scalar"],
        "value": ["100", "2026-01-01", "55"],
        "n_values": np.int64(1),
        "confidence": [0.7, 0.9, 0.4],
    })


class TestOverlayKernel:
    def test_correction_wins_with_provenance(self):
        corr = pd.DataFrame({"conv_id": ["c1"], "field": ["total"],
                             "corrected_value": ["142"]})
        got = (overlay_corrections(_base_df(), corr)
               .set_index(["conv_id", "field"]).sort_index())
        assert got.loc[("c1", "total"), "value"] == "142"
        assert got.loc[("c1", "total"), "confidence"] == 1.0
        assert bool(got.loc[("c1", "total"), "correction_applied"])
        assert got.loc[("c1", "date"), "value"] == "2026-01-01"
        assert got.loc[("c1", "date"), "confidence"] == 0.9
        assert not got.loc[("c1", "date"), "correction_applied"]
        assert not got.loc[("c2", "total"), "correction_applied"]

    def test_unknown_field_added_as_scalar(self):
        corr = pd.DataFrame({"conv_id": ["c2"], "field": ["review"],
                             "corrected_value": ["approved"]})
        got = (overlay_corrections(_base_df(), corr)
               .set_index(["conv_id", "field"]))
        row = got.loc[("c2", "review")]
        assert row["value"] == "approved" and row["kind"] == "scalar"
        assert row["n_values"] == 1 and row["confidence"] == 1.0
        assert bool(row["correction_applied"])
        assert len(got) == 4                  # 3 base + 1 added

    def test_duplicate_corrections_deterministic(self):
        corr = pd.DataFrame({"conv_id": ["c1", "c1"],
                             "field": ["total", "total"],
                             "corrected_value": ["9", "8"]})
        got = overlay_corrections(_base_df(), corr)
        # lexicographically-last corrected value wins, row not duplicated
        sel = got[(got["conv_id"] == "c1") & (got["field"] == "total")]
        assert len(sel) == 1 and sel["value"].iloc[0] == "9"


@pytest.mark.usefixtures("ray_session")
class TestApplyCorrectionsDataset:
    def test_distributed_equals_kernel(self):
        import ray.data
        rs = np.random.RandomState(3)
        n = 500
        base = pd.DataFrame({
            "conv_id": [f"conv{i % 97}" for i in range(n)],
            "field": [f"f{i % 7}" for i in range(n)],
            "kind": "scalar",
            "value": rs.randint(0, 1000, n).astype(str),
            "n_values": np.int64(1),
            "confidence": np.round(rs.rand(n), 3),
        }).drop_duplicates(["conv_id", "field"]).reset_index(drop=True)
        corr = pd.DataFrame({
            "conv_id": ["conv1", "conv2", "conv999"],
            "field": ["f1", "f99", "f0"],
            "corrected_value": ["fixed1", "newfield", "orphan"],
        })
        got = (apply_corrections(ray.data.from_pandas(base),
                                 ray.data.from_pandas(corr))
               .to_pandas().sort_values(["conv_id", "field"])
               .reset_index(drop=True))
        want = (overlay_corrections(base, corr)
                .sort_values(["conv_id", "field"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)
        assert int(got["correction_applied"].sum()) >= 2


@pytest.mark.usefixtures("ray_session")
class TestResumableCorrections:
    P = 8

    def _corrections_for(self, tiny_transcripts, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.fields import conv_merged_fields
        merged = conv_merged_fields(tiny_transcripts).to_pandas()
        picks = (merged.sort_values(["conv_id", "field"])
                 .drop_duplicates("conv_id").head(3))
        corr = pd.DataFrame({
            "conv_id": list(picks["conv_id"]) + [picks["conv_id"].iloc[0]],
            "field": list(picks["field"]) + ["reviewer_note"],
            "corrected_value": ["HUMAN1", "HUMAN2", "HUMAN3", "approved"],
        })
        path = str(tmp_path / "corrections.parquet")
        pq.write_table(pa.Table.from_pandas(corr, preserve_index=False),
                       path)
        return merged, corr, path

    def _read_out(self, out_dir):
        import pyarrow.dataset as pads
        return (pads.dataset(out_dir, partitioning="hive").to_table()
                .to_pandas())

    def test_full_run_applies_and_matches_kernel(self, tiny_transcripts,
                                                 tmp_path):
        merged, corr, cpath = self._corrections_for(tiny_transcripts,
                                                    tmp_path)
        out = str(tmp_path / "out")
        res = run_resumable_corrections(tiny_transcripts, cpath, out,
                                        num_partitions=self.P)
        assert res["computed"] and not res["skipped"]
        got = (self._read_out(out)
               .sort_values(["conv_id", "field"]).reset_index(drop=True))
        want = (overlay_corrections(merged, corr)
                .sort_values(["conv_id", "field"]).reset_index(drop=True))
        cols = ["conv_id", "field", "kind", "value", "n_values",
                "confidence", "correction_applied"]
        pd.testing.assert_frame_equal(got[cols], want[cols],
                                      check_dtype=False)
        assert int(got["correction_applied"].sum()) == 4
        applied_total = sum(m["n_corrections_applied"]
                            for m in res["manifests"].values())
        assert applied_total == 4             # provenance in manifests

    def test_kill_and_resume_skips_corrected_partitions(
            self, tiny_transcripts, tmp_path):
        _, _, cpath = self._corrections_for(tiny_transcripts, tmp_path)
        out = str(tmp_path / "out")
        victims = frozenset({"00000", "00001"})
        with pytest.raises(Exception):
            run_resumable_corrections(tiny_transcripts, cpath, out,
                                      num_partitions=self.P,
                                      fail_partitions=victims)
        done_before = set(load_manifests(out))
        assert done_before and victims.isdisjoint(done_before)
        stamps = {d: os.path.getmtime(os.path.join(out, d, "part-0.parquet"))
                  for d in os.listdir(out) if d.startswith("partition_id=")}

        res = run_resumable_corrections(tiny_transcripts, cpath, out,
                                        num_partitions=self.P)
        assert set(res["skipped"]) == done_before
        assert set(res["computed"]).isdisjoint(done_before)
        for d, t in stamps.items():
            assert os.path.getmtime(
                os.path.join(out, d, "part-0.parquet")) == t, \
                f"{d} was recomputed"

    def test_edited_corrections_invalidate_resume(self, tiny_transcripts,
                                                  tmp_path):
        _, corr, cpath = self._corrections_for(tiny_transcripts, tmp_path)
        out = str(tmp_path / "out")
        run_resumable_corrections(tiny_transcripts, cpath, out,
                                  num_partitions=self.P)
        corr2 = corr.copy()
        corr2.loc[0, "corrected_value"] = "HUMAN1-v2"
        pq.write_table(pa.Table.from_pandas(corr2, preserve_index=False),
                       cpath)
        res = run_resumable_corrections(tiny_transcripts, cpath, out,
                                        num_partitions=self.P)
        assert not res["skipped"]             # new fingerprint: full rerun
