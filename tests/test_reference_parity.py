"""Behavior-parity tests: expectations mirrored from the REFERENCE's own
unit suite (``/root/reference/tests/unit/test_string_utils.py``,
``test_validators.py``) — the same inputs must yield the same observable
behavior in our re-implementation. These assert BEHAVIOR (the contract),
not implementation; each class cites the reference test it mirrors."""

from decimal import Decimal

from agentic_document_extraction_pdf_ray.functions import codes, currency, text


class TestNormalizeWhitespaceParity:
    """Mirrors tests/unit/test_string_utils.py::TestNormalizeWhitespace."""

    def test_collapses_multiple_spaces(self):
        assert text.normalize_whitespace("hello   world") == "hello world"

    def test_collapses_tabs_and_newlines(self):
        assert text.normalize_whitespace("hello\t\tworld\n\nfoo") == "hello world foo"

    def test_strips_leading_trailing(self):
        assert text.normalize_whitespace("  hi  ") == "hi"

    def test_already_normalized(self):
        assert text.normalize_whitespace("hello world") == "hello world"


class TestNormalizeNameParity:
    """Mirrors tests/unit/test_string_utils.py::TestNormalizeName."""

    def test_first_last_to_last_first(self):
        assert text.normalize_name("John Smith") == "SMITH, JOHN"

    def test_already_last_comma_first(self):
        assert text.normalize_name("Smith, John A") == "SMITH, JOHN A"

    def test_removes_prefix_dr(self):
        assert text.normalize_name("Dr. John Smith") == "SMITH, JOHN"

    def test_removes_suffix_md(self):
        assert text.normalize_name("John Smith MD") == "SMITH, JOHN"

    def test_single_name(self):
        assert text.normalize_name("Smith") == "SMITH"


class TestCleanCurrencyParity:
    """Mirrors tests/unit/test_string_utils.py::TestCleanCurrency."""

    def test_standard_dollar(self):
        assert currency.clean_currency("$1,234.56") == Decimal("1234.56")


class TestCptParity:
    """Mirrors tests/unit/test_validators.py CPT expectations."""

    def test_valid_em_code(self):
        r = codes.validate_cpt_code("99213")
        assert r.valid and "E&M" in r.detail

    def test_valid_surgery_code(self):
        r = codes.validate_cpt_code("27447")
        assert r.valid and "Surgery" in r.detail

    def test_valid_with_modifier(self):
        r = codes.validate_cpt_code("99213-25")
        assert r.valid and r.normalized.endswith("-25")

    def test_none_invalid(self):
        assert not codes.validate_cpt_code(None).valid


class TestIcd10Parity:
    """Mirrors tests/unit/test_validators.py ICD-10 expectations."""

    def test_valid_cm_with_dot(self):
        r = codes.validate_icd10_code("E11.9")
        assert r.valid and r.kind == "icd10cm"

    def test_valid_cm_without_dot_normalizes(self):
        assert codes.validate_icd10_code("E119").normalized == "E11.9"

    def test_valid_cm_short(self):
        assert codes.validate_icd10_code("E11").valid

    def test_valid_pcs_7char(self):
        r = codes.validate_icd10_code("0BJ08ZZ")
        assert r.valid and r.kind == "icd10pcs"

    def test_none_invalid(self):
        assert not codes.validate_icd10_code(None).valid

    def test_invalid_format(self):
        assert not codes.validate_icd10_code("12345").valid

    def test_case_insensitive(self):
        assert codes.validate_icd10_code("e11.9").valid


class TestNpiParity:
    """Mirrors tests/unit/test_validators.py NPI expectations."""

    def test_valid_individual(self):
        r = codes.validate_npi("1234567893")
        assert r.valid and r.detail == "Individual"

    def test_none_invalid(self):
        assert not codes.validate_npi(None).valid

    def test_wrong_length(self):
        assert not codes.validate_npi("12345").valid
