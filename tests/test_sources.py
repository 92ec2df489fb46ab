"""Spreadsheet / docx-analogue source parity with the reference's
processor semantics (spreadsheet_processor.py:141-294,
docx_processor.py:137-199): paging geometry, header repetition, the
single-row quirk, validation, and format dispatch."""

from __future__ import annotations

import os

import pytest

from agentic_document_extraction_pdf_ray.sources import read_pages_auto
from agentic_document_extraction_pdf_ray.sources.docpages import (
    LINES_PER_PAGE, docx_text_lines, paginate_lines, parse_docx_bytes,
)
from agentic_document_extraction_pdf_ray.sources.fileid import file_id
from agentic_document_extraction_pdf_ray.sources.spreadsheet import (
    SpreadsheetValidationError, parse_csv_bytes, read_spreadsheets,
    sheet_pages, validate_spreadsheet,
)


class TestSheetPages:
    def test_header_repeats_and_pages_split_at_50(self):
        rows = [["a", "b"]] + [[str(i), str(i * 2)] for i in range(120)]
        pages = sheet_pages(rows, "S")
        assert [p["page_number"] for p in pages] == [1, 2, 3]
        assert [p["n_rows"] for p in pages] == [50, 50, 20]
        for p in pages:
            lines = p["text"].split("\n")
            assert lines[0] == "Sheet: S"
            assert lines[1] == "a | b"        # header on every page

    def test_single_row_sheet_doubles_as_header_and_data(self):
        # reference quirk: rows[1:] if len(rows) > 1 else rows
        pages = sheet_pages([["only", "row"]], "S")
        assert len(pages) == 1
        assert pages[0]["text"] == "Sheet: S\nonly | row\nonly | row"

    def test_header_only_sheet_yields_one_page(self):
        pages = sheet_pages([["h1", "h2"], ["d1", "d2"]], "S")
        assert len(pages) == 1 and pages[0]["n_rows"] == 1
        assert sheet_pages([], "S") == []

    def test_csv_parse_keeps_quoted_commas(self):
        rows = parse_csv_bytes(b'x,y\n"a,b",c\n')
        assert rows == [["x", "y"], ["a,b", "c"]]


class TestValidation:
    def test_missing_file(self):
        with pytest.raises(SpreadsheetValidationError, match="not found"):
            validate_spreadsheet("/tmp/definitely_missing_xyz.csv")

    def test_wrong_suffix(self, tmp_path):
        p = tmp_path / "doc.pdf"
        p.write_text("x")
        with pytest.raises(SpreadsheetValidationError, match="Not a spreadsheet"):
            validate_spreadsheet(str(p))


class TestDocPages:
    def test_pagination_geometry(self):
        pages = paginate_lines([f"l{i}" for i in range(200)])
        assert LINES_PER_PAGE == 83
        assert [p["n_lines"] for p in pages] == [83, 83, 34]
        assert pages[0]["text"].split("\n")[0] == "l0"
        assert pages[1]["text"].split("\n")[0] == "l83"

    def test_empty_doc_yields_one_empty_page(self):
        pages = paginate_lines([])
        assert len(pages) == 1 and pages[0]["text"] == ""

    def test_table_lines_blank_delimited(self):
        lines = docx_text_lines(["Intro para", ""],
                                [[["h1", "h2"], ["v1", "v2"]]])
        assert lines == ["Intro para", "", "", "h1 | h2", "v1 | v2", ""]

    def test_docx_bytes_gated(self):
        with pytest.raises(NotImplementedError, match="python-docx"):
            parse_docx_bytes(b"PK...")


class TestRayPlumbing:
    def test_read_spreadsheets_and_dispatch(self, ray_session, tmp_path):
        csv_p = tmp_path / "t.csv"
        csv_p.write_text("h1,h2\n" + "\n".join(f"{i},{i*2}" for i in range(60)))
        txt_p = tmp_path / "d.txt"
        txt_p.write_text("\n".join(f"line {i}" for i in range(90)))

        pages = read_spreadsheets(str(csv_p)).take_all()
        assert [p["page_number"] for p in pages] == [1, 2]
        assert pages[0]["file"] == file_id(str(csv_p))
        assert pages[0]["file"].startswith("t.csv#")
        assert pages[0]["sheet"] == "Sheet1"

        mixed = read_pages_auto([str(csv_p), str(txt_p)]).take_all()
        by_file: dict[str, list[int]] = {}
        for r in mixed:
            by_file.setdefault(r["file"], []).append(r["page_number"])
        assert sorted(by_file[file_id(str(csv_p))]) == [1, 2]
        # 90 lines -> 2 pages
        assert sorted(by_file[file_id(str(txt_p))]) == [1, 2]

        with pytest.raises(ValueError, match="no source registered"):
            read_pages_auto([str(tmp_path / "x.exe")])

    def test_same_basename_different_dirs_stay_distinct(self, ray_session,
                                                        tmp_path):
        # ADVICE round 2: two inputs sharing a basename must not collapse
        # into one file id (their pages would interleave downstream).
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        pa_ = tmp_path / "a" / "notes.txt"
        pb_ = tmp_path / "b" / "notes.txt"
        pa_.write_text("\n".join(f"alpha line {i}" for i in range(10)))
        pb_.write_text("\n".join(f"beta line {i}" for i in range(5)))
        assert file_id(str(pa_)) != file_id(str(pb_))
        rows = read_pages_auto([str(pa_), str(pb_)]).take_all()
        by_file = {}
        for r in rows:
            by_file.setdefault(r["file"], []).append(r)
        assert len(by_file) == 2
        n_lines = {fid: rs[0]["text"].count("\n") + 1
                   for fid, rs in by_file.items()}
        assert sorted(n_lines.values()) == [5, 10]


@pytest.mark.usefixtures("ray_session")
class TestPagesIntoFlagship:
    """File sources feed the flagship extraction core: per-page text runs
    the same per-turn semantics (oracle equality) with conv=file,
    turn=page, and the conversation finalize applies unchanged."""

    def test_extract_pages_pipeline(self, tmp_path):
        from agentic_document_extraction_pdf_ray.functions.extract import extract_turn
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            extract_pages_pipeline,
        )
        from agentic_document_extraction_pdf_ray.sources import read_pages_auto

        csv_p = tmp_path / "claims.csv"
        csv_p.write_text("id,who\n" + "\n".join(
            f"{i},Name: Chen Robert NPI 1234567893" for i in range(60)))
        txt_p = tmp_path / "notes.txt"
        txt_p.write_text("\n".join(
            f"para {i} the quick claim record" for i in range(100)))

        pages = {(r["file"], r["page_number"]): r["text"]
                 for r in read_pages_auto([str(csv_p), str(txt_p)]).take_all()}
        rows = extract_pages_pipeline([str(csv_p), str(txt_p)]).take_all()
        assert len(rows) == len(pages)

        for r in rows:
            want = extract_turn(pages[(r["conv_id"], r["turn_idx"] + 1)],
                                role="user", tool="")
            assert r["extracted_text"] == want["extracted_text"], \
                (r["conv_id"], r["turn_idx"])
            assert r["confidence"] == want["confidence"]
        # finalize semantics hold: segment ids monotone per file
        by_file: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            by_file.setdefault(r["conv_id"], []).append(r["segment_id"])
        for segs in by_file.values():
            assert segs == sorted(segs)
