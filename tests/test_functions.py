"""Unit tests for the scalar function library (SURVEY.md §2.2 / §2.8)."""

from decimal import Decimal

from agentic_document_extraction_pdf_ray.functions import codes, currency, dates, patterns, text


class TestText:
    def test_normalize_whitespace(self):
        assert text.normalize_whitespace("Hello   World\n\n") == "Hello World"
        assert text.normalize_whitespace("") == ""
        assert text.normalize_whitespace(None) == ""

    def test_clean_text(self):
        assert text.clean_text("a\x00b\x1fc") == "abc"
        assert text.clean_text("“q” ‘s’") == "\"q\" 's'"
        assert text.clean_text("a​b﻿c") == "abc"
        assert text.clean_text("keep\ttabs\nand\nnewlines") == "keep\ttabs\nand\nnewlines"

    def test_normalize_name(self):
        assert text.normalize_name("John Smith") == "SMITH, JOHN"
        assert text.normalize_name("Smith, John A") == "SMITH, JOHN A"
        assert text.normalize_name("DR. JOHN SMITH MD") == "SMITH, JOHN"
        assert text.normalize_name("Cher") == "CHER"
        assert text.normalize_name("") == ""

    def test_remove_diacritics(self):
        assert text.remove_diacritics("José García") == "Jose Garcia"

    def test_levenshtein(self):
        assert text.levenshtein_distance("kitten", "sitting") == 3
        assert text.levenshtein_distance("", "abc") == 3
        assert text.similarity_ratio("abc", "abc") == 1.0
        assert text.similarity_ratio("", "") == 1.0
        assert text.similarity_ratio("a", "") == 0.0
        assert text.fuzzy_match("Smith", "Smyth", threshold=0.8)
        assert not text.fuzzy_match("John", "Jane", threshold=0.8)

    def test_truncate(self):
        assert text.truncate_text("Hello World", 8) == "Hello..."
        assert text.truncate_text("Hi", 8) == "Hi"

    def test_extract_numbers(self):
        assert text.extract_numbers("3 visits, total $150.00") == ["3", "150.00"]
        assert text.extract_integers("a -5 b 7") == [-5, 7]

    def test_extract_between(self):
        assert text.extract_between("Name: John, Age:", "Name: ", ", Age:") == "John"
        assert text.extract_between("x", "a", "b") is None

    def test_norm_key(self):
        assert text.norm_key("  Hello   WORLD ") == "hello world"


class TestDates:
    def test_parse_formats(self):
        d = dates.parse_date
        import datetime
        expect = datetime.date(2024, 1, 15)
        for s in ["01/15/2024", "2024-01-15", "January 15, 2024", "Jan 15, 2024",
                  "15 January 2024", "1-15-2024", "01/15/24", "01152024"]:
            assert d(s) == expect, s
        assert d("not a date") is None
        assert d("") is None

    def test_normalize(self):
        assert dates.normalize_date("01/15/2024") == "2024-01-15"

    def test_implausible(self):
        import datetime
        assert dates.is_implausible_date(datetime.date(1899, 5, 1))
        assert dates.is_implausible_date(datetime.date(2031, 1, 1))
        assert dates.is_implausible_date(datetime.date(1970, 1, 1))
        assert not dates.is_implausible_date(datetime.date(2024, 6, 15))

    def test_scan(self):
        got = dates.scan_dates("visit on 01/15/2024 then 2024-02-01 end")
        assert [iso for _, iso in got] == ["2024-01-15", "2024-02-01"]


class TestCurrency:
    def test_clean(self):
        assert currency.clean_currency("$1,234.56") == Decimal("1234.56")
        assert currency.clean_currency("(500.00)") == Decimal("-500.00")
        assert currency.clean_currency("100-") == Decimal("-100")
        assert currency.clean_currency("250 CR".replace(" ", "")) == Decimal("-250")
        assert currency.clean_currency("junk") is None

    def test_canonical_string(self):
        assert currency.clean_currency_str("$1,234.5") == "1234.50"
        assert currency.clean_currency_str("(500.00)") == "-500.00"

    def test_scan(self):
        got = currency.scan_currency("pay $1,234.56 or (500.00) now")
        assert [c for _, c in got] == ["1234.56", "-500.00"]


class TestCodes:
    def test_npi(self):
        assert codes.validate_npi("1234567893").valid
        assert not codes.validate_npi("1234567890").valid      # bad check digit
        assert not codes.validate_npi("3234567893").valid      # bad prefix
        assert not codes.validate_npi("123").valid

    def test_cpt(self):
        r = codes.validate_cpt_code("99213")
        assert r.valid and r.detail == "E&M"
        r = codes.validate_cpt_code("99213-25")
        assert r.valid and r.normalized == "99213-25"
        assert not codes.validate_cpt_code("00000").valid      # out of range
        assert not codes.validate_cpt_code("abc").valid

    def test_icd10(self):
        r = codes.validate_icd10_code("E11.9")
        assert r.valid and r.normalized == "E11.9"
        r = codes.validate_icd10_code("E119")
        assert r.valid and r.normalized == "E11.9"             # decimal normalization
        assert codes.validate_icd10_code("0BJ08ZZ").kind == "icd10pcs"
        assert not codes.validate_icd10_code("U!").valid

    def test_hcpcs(self):
        assert codes.validate_hcpcs_code("J1234").valid
        assert not codes.validate_hcpcs_code("W1234").valid

    def test_phone(self):
        assert codes.validate_phone("(555) 123-4567").normalized == "555-123-4567"


class TestPatterns:
    def test_placeholder(self):
        for v in ["N/A", "na", "TBD", "XXXX", "[empty]", "<none>", "___", "..."]:
            assert patterns.F_PLACEHOLDER in patterns.flag_value(v), v

    def test_ids(self):
        assert patterns.F_SEQUENTIAL_ID in patterns.flag_value("12345")
        assert patterns.F_REPEATED_DIGITS in patterns.flag_value("1111111")
        assert patterns.F_ALL_ZERO_ID in patterns.flag_value("000000")

    def test_generic(self):
        assert patterns.F_GENERIC_NAME in patterns.flag_value("John Doe")
        assert patterns.F_GENERIC_ADDRESS in patterns.flag_value("123 Main St")

    def test_turn_text(self):
        flags = patterns.flag_turn_text("John Doe lives at 123 Main St since 01/01/1900 ...")
        assert patterns.F_GENERIC_NAME in flags
        assert patterns.F_GENERIC_ADDRESS in flags
        assert patterns.F_IMPLAUSIBLE_DATE in flags
        assert patterns.F_TRUNCATED in flags
        assert patterns.flag_turn_text("  ") == [patterns.F_EMPTY]

    def test_repeating_substring(self):
        assert patterns.has_repeating_substring("abcabcabc")
        assert not patterns.has_repeating_substring("hello world")


class TestModality:
    def test_kinds(self):
        from agentic_document_extraction_pdf_ray.functions import modality as m
        assert m.detect_payload_kind('{"a": 1}') == m.KIND_JSON
        assert m.detect_payload_kind("ISA*00*A~GS*X~") == m.KIND_EDI
        assert m.detect_payload_kind("a | b | c\nd | e | f") == m.KIND_TABLE
        assert m.detect_payload_kind("- one\n- two\n- three") == m.KIND_LIST
        assert m.detect_payload_kind("plain words here") == m.KIND_PROSE
        assert m.detect_payload_kind("  ") == m.KIND_EMPTY

    def test_batch_matches_scalar(self):
        """The vectorized Arrow/RE2 classifier agrees with the scalar
        Python one on every ASCII-shaped edge the ladder branches on."""
        from agentic_document_extraction_pdf_ray.functions import modality as m
        cases = [
            None, "", "  ", "\t\n", "{", "}", "{}", '{"a": 1}',
            "{\nnot json end", "x{...}",
            "ISA*00*A~GS*X~", "ISA no star in first ten ~",
            "ISA*0000000000 no tilde",
            "a | b | c\nd | e | f", "a | b | c\nplain\nmore plain",
            "a|b|c", "one |pipe\ntwo |pipe",
            "- one\n- two\n- three", "* x\n* y", "1. a\n2) b",
            "  - indented\n  - bullets", "- single bullet",
            "-\n-", "plain words here", "line one\nline two",
            "10. numbered\n20. more", "•bullet-no-space\n• with space",
        ]
        got = list(m.detect_payload_kind_batch(cases))
        want = [m.detect_payload_kind(t) for t in cases]
        # "-\n-" is the ONE ASCII divergence: the scalar's cross-line
        # \s+ counts a bare "-" line, the per-line batch/SQL test doesn't
        for c, g, w in zip(cases, got, want):
            if c == "-\n-":
                assert g == m.KIND_PROSE and w == m.KIND_LIST
            else:
                assert g == w, c

    def test_batch_is_the_sql_semantics_on_non_ascii(self):
        """The batch classifier mirrors the SQL oracle (ASCII trim set
        ' \\t\\n\\r', RE2 [0-9]); the scalar Python API strips Unicode
        whitespace and accepts Unicode digits. These divergences are
        DOCUMENTED behavior — the oracle-checked paths use batch."""
        from agentic_document_extraction_pdf_ray.functions import modality as m
        # \xa0: Python-strip empty, SQL/batch keeps it -> prose
        assert m.detect_payload_kind("\xa0") == m.KIND_EMPTY
        assert list(m.detect_payload_kind_batch(["\xa0"])) == [m.KIND_PROSE]
        # \x0c: Python-strip empty; SQL trim keeps it -> prose
        assert m.detect_payload_kind("\x0c") == m.KIND_EMPTY
        assert list(m.detect_payload_kind_batch(["\x0c"])) == [m.KIND_PROSE]
        # Arabic-Indic digits: Python \d bullets, RE2 [0-9] doesn't
        t = "١. a\n٢. b"
        assert m.detect_payload_kind(t) == m.KIND_LIST
        assert list(m.detect_payload_kind_batch([t])) == [m.KIND_PROSE]

    def test_conversation_modalities(self):
        from agentic_document_extraction_pdf_ray.functions import modality as m
        assert m.conversation_modalities(["json", "empty", "prose"]) == ["json", "prose"]
        assert m.conversation_modalities([]) == ["prose"]

    def test_apply_overrides(self):
        from agentic_document_extraction_pdf_ray.functions import modality as m
        assert m.apply_overrides(["prose"], ["table", "bogus"]) == ["prose", "table"]
        assert m.apply_overrides([], None) == ["prose"]


class TestFieldConfidenceScorer:
    def _scorer(self, **kw):
        from agentic_document_extraction_pdf_ray.functions.confidence import FieldConfidenceScorer
        return FieldConfidenceScorer(**kw)

    def test_validation_failure_caps_below_high(self):
        s = self._scorer()
        fc = s.field_confidence("npi", 1.0, 1.0, validation_passed=False)
        assert fc["confidence"] <= 0.84 and fc["level"] != "high"
        assert "validation_failed" in fc["factors"]

    def test_pattern_penalty(self):
        s = self._scorer()
        clean = s.field_confidence("a", 0.9, 0.9)
        flagged = s.field_confidence("a", 0.9, 0.9, has_pattern_flag=True)
        assert flagged["confidence"] < clean["confidence"]

    def test_critical_fields_double_weight_and_penalty(self):
        s = self._scorer(critical_fields=["npi"])
        res = s.calculate({"npi": 0.2, "other": 0.95},
                          agreement_scores={"npi": 0.2, "other": 1.0})
        assert res["critical_fields_status"]["npi"] is False
        assert res["overall_confidence"] < 0.5

    def test_auto_accept_path(self):
        s = self._scorer()
        res = s.calculate({"a": 0.95, "b": 0.9},
                          agreement_scores={"a": 1.0, "b": 1.0})
        assert res["overall_level"] == "high" and res["action"] == "auto_accept"

    def test_retry_exhaustion_routes_review(self):
        s = self._scorer()
        res = s.calculate({"a": 0.6}, agreement_scores={"a": 0.6},
                          retry_count=2)
        assert res["action"] == "human_review"

    def test_empty(self):
        res = self._scorer().calculate({})
        assert res["action"] == "human_review"


class TestRound2Additions:
    def test_safe_string(self):
        from agentic_document_extraction_pdf_ray.functions.text import safe_string
        assert safe_string(None) == ""
        assert safe_string(None, "x") == "x"
        assert safe_string(42) == "42"
        assert safe_string(1.5) == "1.5"

    def test_parse_date_range(self):
        from datetime import date

        from agentic_document_extraction_pdf_ray.functions.dates import parse_date_range
        assert parse_date_range("01/01/2024 - 01/31/2024") == (
            date(2024, 1, 1), date(2024, 1, 31))
        assert parse_date_range("03/05/2024 to 03/09/2024") == (
            date(2024, 3, 5), date(2024, 3, 9))
        # NOTE: bare "-" ranks before " to " in the reference's separator
        # ladder, so ISO dates inside a "to" range split wrong — mirrored.
        assert parse_date_range("2024-03-05 to 2024-03-09") == (None, None)
        d = date(2024, 7, 4)
        assert parse_date_range("07/04/2024") == (d, d)
        assert parse_date_range("") == (None, None)
        assert parse_date_range(None) == (None, None)

    def test_future_past_year(self):
        from agentic_document_extraction_pdf_ray.functions.dates import (
            get_year_from_date, is_future_date, is_past_date,
        )
        # REFERENCE_TODAY is pinned to 2026-01-01
        assert is_future_date("2030-06-01") is True
        assert is_past_date("2030-06-01") is False
        assert is_past_date("2001-06-01") is True
        assert is_future_date("garbage") is False
        assert get_year_from_date("03/15/2024") == 2024
        assert get_year_from_date("junk") is None

    def test_normalize_document_type(self):
        from agentic_document_extraction_pdf_ray.functions.modality import (
            normalize_document_type,
        )
        assert normalize_document_type("HCFA-1500") == "CMS-1500"
        assert normalize_document_type("cms 1500") == "CMS-1500"
        assert normalize_document_type("ub_04") == "UB-04"
        assert normalize_document_type("CMS-1450") == "UB-04"
        assert normalize_document_type("Explanation of Benefits") == "EOB"
        assert normalize_document_type("encounter form") == "SUPERBILL"
        assert normalize_document_type("EOB") == "EOB"
        assert normalize_document_type("weird thing") == "WEIRD THING"


class TestTableRegions:
    def test_markdown_table(self):
        from agentic_document_extraction_pdf_ray.functions.tables import parse_pipe_table
        t = parse_pipe_table(
            "| code | amount | status |\n"
            "|------|--------|--------|\n"
            "| 99213 | 120.00 | paid |\n"
            "| 99214 | 180.00 | denied |")
        assert t.header == ("code", "amount", "status")
        assert t.n_rows == 2 and t.n_cols == 3
        assert t.rows[1] == ("99214", "180.00", "denied")

    def test_plain_pipe_table_pads_and_truncates(self):
        from agentic_document_extraction_pdf_ray.functions.tables import parse_pipe_table
        t = parse_pipe_table("a | b | c\n1 | 2\nx | y | z | extra")
        assert t.header == ("a", "b", "c")
        assert t.rows == (("1", "2", ""), ("x", "y", "z"))

    def test_non_tables(self):
        from agentic_document_extraction_pdf_ray.functions.tables import parse_pipe_table
        assert parse_pipe_table("just prose here") is None
        assert parse_pipe_table("one | pipe only once") is None
        assert parse_pipe_table("a | b | c") is None          # single line

    def test_regions_with_offsets(self):
        from agentic_document_extraction_pdf_ray.functions.tables import (
            extract_table_regions,
        )
        text = ("intro paragraph\n\n"
                "h1 | h2\nv1 | v2\nv3 | v4\n\n"
                "closing words")
        regs = extract_table_regions(text)
        assert len(regs) == 1
        r = regs[0]
        assert text[r.start:r.end].startswith("h1 | h2")
        assert r.header == ("h1", "h2") and r.n_rows == 2

    def test_batch_stage(self):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.functions.tables import (
            table_regions_batch,
        )
        batch = pa.table({
            "conv_id": pa.array(["c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "text": pa.array(["a | b\n1 | 2", "no table"], pa.string()),
        })
        out = table_regions_batch(batch)
        assert out.num_rows == 1
        assert out["conv_id"][0].as_py() == "c1"
        assert out["n_cols"][0].as_py() == 2
