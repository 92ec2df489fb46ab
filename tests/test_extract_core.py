"""Unit tests for the per-turn extraction core + segmentation (SURVEY.md §7.0)."""

from agentic_document_extraction_pdf_ray.functions.extract import extract_turn, is_segment_boundary
from agentic_document_extraction_pdf_ray.functions.segmentation import (
    LABEL_BOILERPLATE, LABEL_MAIN, LABEL_PLACEHOLDER, LABEL_SEPARATOR, segment_blocks,
)


class TestSegmentation:
    def test_blocks_and_offsets(self):
        text = "First block here\n\nSecond block here"
        blocks = segment_blocks(text)
        assert len(blocks) == 2
        assert text[blocks[0].start:blocks[0].end] == "First block here"
        assert text[blocks[1].start:blocks[1].end] == "Second block here"

    def test_boilerplate_detection(self):
        text = ("HOME | ABOUT | CONTACT | LOGIN\n\n"
                "This is the real article content that should be kept because "
                "it is long prose with normal words in it.\n\n"
                "Copyright © 2024 ExampleCorp. All rights reserved.")
        blocks = segment_blocks(text)
        assert [b.label for b in blocks] == [LABEL_BOILERPLATE, LABEL_MAIN, LABEL_BOILERPLATE]

    def test_separator_and_placeholder(self):
        blocks = segment_blocks("----------------\n\nN/A TBD XXXX\n\nreal text here")
        assert [b.label for b in blocks] == [LABEL_SEPARATOR, LABEL_PLACEHOLDER, LABEL_MAIN]

    def test_link_density(self):
        blocks = segment_blocks("https://a.example.com/x https://b.example.com/y ok")
        assert blocks[0].label == LABEL_BOILERPLATE


class TestExtractTurn:
    def test_main_content_only(self):
        t = extract_turn("HOME | ABOUT | LOGIN | REGISTER\n\nThe actual content.")
        assert t["extracted_text"] == "The actual content."
        assert len(t["spans"]) == 1
        assert t["n_blocks"] == 2 and t["n_kept"] == 1

    def test_spans_index_into_cleaned_text(self):
        raw = "noise​ here\n\nsecond part"
        t = extract_turn(raw)
        from agentic_document_extraction_pdf_ray.functions.text import clean_text
        cleaned = clean_text(raw)
        s = t["spans"][0]
        assert cleaned[s["start"]:s["end"]] == "noise here"

    def test_fields(self):
        t = extract_turn("Service on 01/15/2024 total $1,234.56 Name: DR. JOHN SMITH MD "
                         "NPI 1234567893 CPT: 99213 code E11.9")
        f = t["fields"]
        assert f["date_0"] == "2024-01-15"
        assert f["amount_0"] == "1234.56"
        assert f["name_0"] == "SMITH, JOHN"
        assert f["npi_0"] == "1234567893"
        assert f["cpt_0"] == "99213"
        assert f["icd10_0"] == "E11.9"

    def test_invalid_codes_lower_confidence(self):
        good = extract_turn("NPI 1234567893 fine prose follows here")
        bad = extract_turn("NPI 1234567890 fine prose follows here")
        assert good["confidence"] > bad["confidence"]

    def test_tool_turn_json(self):
        t = extract_turn('{"status": "ok", "count": 3}', role="tool", tool="db")
        assert t["fields"] == {"tool.count": "3", "tool.status": "ok"}
        assert t["spans"][0]["label"] == "tool"

    def test_empty(self):
        t = extract_turn("")
        assert t["extracted_text"] == ""
        assert t["flags"] == ["empty"]
        assert t["confidence"] < 0.5

    def test_deterministic(self):
        s = "Some text with 01/15/2024 and $5.00 in it\n\nHOME | ABOUT | LOGIN | HELP"
        assert extract_turn(s) == extract_turn(s)


class TestBoundary:
    def test_system_turn(self):
        assert is_segment_boundary("system", "anything")
        assert not is_segment_boundary("user", "plain text")

    def test_header(self):
        assert is_segment_boundary("user", "# Section 2\ncontent")
        assert is_segment_boundary("user", "====\ncontent")
        assert not is_segment_boundary("user", "no header here")
