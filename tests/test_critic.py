"""Critic-combiner parity (mirrors the reference's
tests/unit/test_critic_combiner.py expectations) and the classification
fallback-ladder control flow."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.functions.confidence import (
    combine_confidence, modality_penalty,
)
from agentic_document_extraction_pdf_ray.pipelines.critic import (
    conv_classify_fallback,
)


class TestModalityPenalty:
    def test_reference_table(self):
        assert modality_penalty([]) == 0.0
        assert modality_penalty(None) == 0.0
        assert modality_penalty(["fax"]) == 0.7
        assert modality_penalty(["handwritten"]) == 0.6
        assert modality_penalty(["visual"]) == 0.4
        assert modality_penalty(["printed"]) == 0.0
        assert modality_penalty(["custom_mode"]) == 0.0

    def test_worst_of(self):
        assert modality_penalty(["handwritten", "fax"]) == 0.7
        assert modality_penalty(["visual", "handwritten"]) == 0.6


class TestCombineConfidence:
    def test_keys_and_perfect_inputs(self):
        r = combine_confidence(1.0, 1.0)
        assert set(r) == {"dual_pass", "critic", "modality_penalty",
                          "raw_combined"}
        assert r["raw_combined"] == pytest.approx(1.0)

    def test_clamping(self):
        r = combine_confidence(1.7, -0.3)
        assert r["dual_pass"] == 1.0
        assert r["critic"] == 0.0

    def test_fax_penalty_value(self):
        # 0.5·1 + 0.3·1 + 0.2·(1−0.7) = 0.86 (reference expectation)
        r = combine_confidence(1.0, 1.0, ["fax"])
        assert r["raw_combined"] == pytest.approx(0.86)
        assert r["raw_combined"] < combine_confidence(1.0, 1.0)["raw_combined"]

    def test_zero_floor(self):
        r = combine_confidence(0.0, 0.0, ["fax"], weights=(0.5, 0.3, 0.2))
        assert 0.0 <= r["raw_combined"] <= 1.0

    def test_payload_kind_table(self):
        from agentic_document_extraction_pdf_ray.functions.confidence import (
            PAYLOAD_KIND_PENALTIES,
        )
        r = combine_confidence(1.0, 1.0, ["edi"],
                               penalty_table=PAYLOAD_KIND_PENALTIES)
        assert r["modality_penalty"] == 0.7


class TestFallbackLadder:
    @pytest.fixture(scope="class")
    def ladder_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("ladder")
        # marker counts: 'query scan join filter agg' ×k → conf = k·5·10 …
        analytics = "query scan join filter agg "
        rows = []

        def conv(cid, texts):
            for i, t in enumerate(texts):
                rows.append({"conv_id": cid, "turn_idx": i, "text": t})

        conv("c_first_good", [analytics * 2, "plain words", "plain words"])
        conv("c_second_better", ["plain words here", analytics * 2, analytics])
        conv("c_third_wins", ["plain", analytics, analytics * 2])
        # exactly 7 markers -> conf 70 == threshold: ladder must stop
        # there even though turn 3 would score 100
        conv("c_early_stop", ["plain", "query scan join filter agg query scan",
                              analytics * 2])
        conv("c_single", [analytics])
        tbl = pa.table({
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
        })
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
        return str(d)

    def test_ladder(self, ray_session, ladder_dir):
        out = {r["conv_id"]: r for r in
               conv_classify_fallback(ladder_dir).take_all()}
        # turn 1 already >= 0.70 (10 markers -> conf 100): no fallback
        assert out["c_first_good"]["chosen_turn_idx"] == 0
        assert out["c_first_good"]["conf_x100"] == 100
        # turn 1 weak, turn 2 strictly better and >= threshold: stop there
        assert out["c_second_better"]["chosen_turn_idx"] == 1
        assert out["c_second_better"]["label"] == "analytics"
        # turn 2 better but below threshold, turn 3 better still
        assert out["c_third_wins"]["chosen_turn_idx"] == 2
        # early stop: turn 2 reaches threshold, turn 3 (better) never tried
        assert out["c_early_stop"]["chosen_turn_idx"] == 1
        assert out["c_early_stop"]["conf_x100"] == 70
        # single-turn conversation keeps turn 1 whatever its confidence
        assert out["c_single"]["chosen_turn_idx"] == 0
