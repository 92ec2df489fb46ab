"""Stream-signal flag set — the fax-signal analogue (reference
``src/preprocessing/pdf_processor.py:561-629,164-172``): multiple
independent per-turn flags (unlike the argmax-one payload kind), a
detection-ordered signal token list, the ``noisy`` mode joining the
conversation modality set when any flag fires, and the cleaning chain's
aggressive step CONDITIONED on the flags (binarize+despeckle mode)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.functions.modality import (
    STREAM_SIGNAL_ORDER, detect_stream_flags_batch,
)


class TestDetectStreamFlags:
    def test_flags_co_occur(self):
        texts = [
            "plain prose only",
            "bell\x07here",                      # control
            "zero​width",                   # zero-width
            "a “quoted” phrase",       # curly
            "all\x07of​them ‘x’",  # all three
            None,
            "",
        ]
        hc, hz, hq, sig = detect_stream_flags_batch(texts)
        assert hc.tolist() == [False, True, False, False, True, False, False]
        assert hz.tolist() == [False, False, True, False, True, False, False]
        assert hq.tolist() == [False, False, False, True, True, False, False]
        assert sig[0] == "" and sig[5] == "" and sig[6] == ""
        assert sig[1] == "control-chars"
        assert sig[2] == "zero-width"
        assert sig[3] == "curly-quotes"
        # co-occurring flags -> multi-token list in fixed detection order
        assert sig[4] == ",".join(STREAM_SIGNAL_ORDER)

    def test_more_zero_width_variants(self):
        hc, hz, hq, _ = detect_stream_flags_batch(
            ["a‌b", "a﻿b", "a‍b"])
        assert hz.all() and not hc.any() and not hq.any()


@pytest.fixture(scope="module")
def flag_transcripts(tmp_path_factory):
    """3 tiny conversations: one clean, one with a control-char turn,
    one whose only artifact is curly quotes + an accented name."""
    rows = {
        "conv_id": ["clean", "clean", "ctrl", "ctrl", "curly"],
        "turn_idx": [0, 1, 0, 1, 0],
        "role": ["user", "assistant", "user", "assistant", "user"],
        "text": ["hello there", "José stays accented",
                 "plain", "ring\x07ring",
                 "“José” said hi"],
        "tool": ["", "", "", "", ""],
    }
    import datetime
    rows["ts"] = [datetime.datetime(2024, 1, 1)] * 5
    t = pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": pa.array(rows["role"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "tool": pa.array(rows["tool"], pa.string()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
    })
    d = tmp_path_factory.mktemp("flagtx")
    pq.write_table(t, str(d / "part-00000.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestConvStreamFlags:
    def test_noisy_joins_modalities(self, flag_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import conv_stream_flags
        got = (conv_stream_flags(flag_transcripts).to_pandas()
               .set_index("conv_id"))
        assert not got.loc["clean", "any_ctrl"]
        assert not got.loc["clean", "any_artifact"]
        assert got.loc["clean", "signals"] == ""
        assert "noisy" not in got.loc["clean", "modalities"]

        assert got.loc["ctrl", "any_ctrl"]
        assert got.loc["ctrl", "signals"] == "control-chars"
        assert got.loc["ctrl", "modalities"] == "noisy,prose"

        assert not got.loc["curly", "any_ctrl"]
        assert got.loc["curly", "any_artifact"]
        assert got.loc["curly", "signals"] == "curly-quotes"
        assert "noisy" in got.loc["curly", "modalities"]


@pytest.mark.usefixtures("ray_session")
class TestTurnsDespeckle:
    def test_binarize_only_when_flagged(self, flag_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import turns_despeckle
        got = (turns_despeckle(flag_transcripts).to_pandas()
               .set_index(["conv_id", "turn_idx"]))
        # unflagged turn: standard clean only — the accent SURVIVES
        assert not got.loc[("clean", 1), "despeckled"]
        assert got.loc[("clean", 1), "text_out"] == "José stays accented"
        assert got.loc[("clean", 1), "n_binarized"] == 0
        # control-flagged turn: ctrl char stripped by the standard clean,
        # then 7-bit binarize (here a no-op beyond the clean)
        assert got.loc[("ctrl", 1), "despeckled"]
        assert got.loc[("ctrl", 1), "text_out"] == "ringring"
        # curly-flagged turn: quotes normalized by the clean, and the
        # aggressive step drops the accent THIS time
        assert got.loc[("curly", 0), "despeckled"]
        assert got.loc[("curly", 0), "text_out"] == '"Jos" said hi'
        assert got.loc[("curly", 0), "n_binarized"] == 1
