"""Cross-field rules engine, JSON repair, stage registry, retry actor."""

import pyarrow as pa
import pytest

from agentic_document_extraction_pdf_ray.functions.json_repair import (
    parse_json_lenient, repair_json,
)
from agentic_document_extraction_pdf_ray.functions.rules import (
    FAILED, INCONCLUSIVE, PASSED, SKIPPED, Rule, evaluate_rule, evaluate_rules,
    sum_reconcile, validate_date_ordering,
)
from agentic_document_extraction_pdf_ray.state.registry import compose, get_stage, list_stages


class TestRules:
    def test_equals(self):
        r = Rule("eq", "EQUALS", ("a", "b"))
        assert evaluate_rule(r, {"a": "x", "b": "x"}).status == PASSED
        assert evaluate_rule(r, {"a": "x", "b": "y"}).status == FAILED
        assert evaluate_rule(r, {"a": "x"}).status == SKIPPED

    def test_numeric_ladder(self):
        assert evaluate_rule(Rule("gt", "GT", ("a", "b")),
                             {"a": "$10.00", "b": "5"}).status == PASSED
        assert evaluate_rule(Rule("le", "LE", ("a", "b")),
                             {"a": "10", "b": "5"}).status == FAILED
        assert evaluate_rule(Rule("gt", "GT", ("a", "b")),
                             {"a": "junk", "b": "5"}).status == INCONCLUSIVE

    def test_dates(self):
        assert evaluate_rule(Rule("d", "DATE_BEFORE", ("a", "b")),
                             {"a": "01/01/2020", "b": "2024-01-01"}).status == PASSED
        assert evaluate_rule(Rule("d", "DATE_AFTER", ("a", "b")),
                             {"a": "01/01/2020", "b": "2024-01-01"}).status == FAILED

    def test_sum_equals_tolerance(self):
        assert evaluate_rule(Rule("s", "SUM_EQUALS", ("a", "b", "t")),
                             {"a": "10.00", "b": "5.005", "t": "15.00"}).status == PASSED
        assert evaluate_rule(Rule("s", "SUM_EQUALS", ("a", "b", "t")),
                             {"a": "10.00", "b": "5.50", "t": "15.00"}).status == FAILED

    def test_requires(self):
        r = Rule("req", "REQUIRES", ("npi_0", "name_0"))
        assert evaluate_rule(r, {"npi_0": "123"}).status == FAILED
        assert evaluate_rule(r, {"npi_0": "123", "name_0": "X"}).status == PASSED
        assert evaluate_rule(r, {}).status == SKIPPED

    def test_requires_if(self):
        r = Rule("ri", "REQUIRES_IF", ("kind", "claim", "amount_0"))
        assert evaluate_rule(r, {"kind": "claim", "amount_0": "5"}).status == PASSED
        assert evaluate_rule(r, {"kind": "claim"}).status == FAILED
        assert evaluate_rule(r, {"kind": "other"}).status == SKIPPED

    def test_custom_and_pack(self):
        r = Rule("c", "CUSTOM", (), predicate=lambda f: PASSED if f else FAILED)
        assert evaluate_rule(r, {"x": "1"}).status == PASSED
        results = evaluate_rules(
            [Rule("a", "EQUALS", ("x", "y")), Rule("b", "GT", ("x", "y"))],
            {"x": "2", "y": "2"})
        assert [x.status for x in results] == [PASSED, FAILED]

    def test_tool_helpers(self):
        assert sum_reconcile(["10.00", "5.50"], "15.50").status == PASSED
        assert sum_reconcile(["10.00"], "15.50").status == FAILED
        out = validate_date_ordering("01/01/1990", "01/01/2020", "01/05/2020")
        assert [r.status for r in out] == [PASSED, PASSED]


class TestJsonRepair:
    def test_fences_comments_commas_literals(self):
        raw = '```json\n{"a": True, // comment\n "b": [1, 2,], "c": None,}\n```'
        assert parse_json_lenient(raw) == {"a": True, "b": [1, 2], "c": None}

    def test_idempotent_on_valid(self):
        assert repair_json('{"a": 1}') == '{"a": 1}'
        assert parse_json_lenient("") is None
        assert parse_json_lenient("not json at all {{{") is None


@pytest.mark.usefixtures("ray_session")
class TestRegistry:
    def test_builtin_stages(self):
        assert {"extract_turns", "layout_score", "phi_redact"} <= set(list_stages())
        assert get_stage("layout_score").is_actor

    def test_compose(self):
        import ray.data
        ds = ray.data.from_items([
            {"conv_id": "c", "turn_idx": 0, "role": "user",
             "text": "hello world content", "tool": ""}])
        out = compose(ds, ["extract_turns",
                           {"stage": "layout_score", "concurrency": 1}])
        rows = out.take_all()
        assert "layout_score" in rows[0] and "extracted_text" in rows[0]

    def test_unknown_stage(self):
        import ray.data
        with pytest.raises(KeyError):
            compose(ray.data.from_items([{"a": 1}]), ["nope"])


@pytest.mark.usefixtures("ray_session")
class TestSelfCorrecting:
    def test_retry_bounded_and_status(self):
        import ray.data

        from agentic_document_extraction_pdf_ray.stages.model import SelfCorrectingExtractor
        ds = ray.data.from_items([
            {"text": "good long prose content with plenty of normal words "
                     "in it for high confidence", "role": "user"},
            {"text": "", "role": "user"},
        ])
        out = ds.map_batches(SelfCorrectingExtractor, batch_format="pyarrow",
                             concurrency=1, batch_size=8).take_all()
        by_text = {r["text"]: r for r in out}
        assert by_text[""]["status"] == "review"
        assert by_text[""]["retries"] <= 2
        good = [r for r in out if r["text"]][0]
        assert good["status"] in ("ok", "retry_done")


class TestCorrectionTracker:
    def test_record_and_correct(self):
        from agentic_document_extraction_pdf_ray.state.registry import CorrectionTracker
        ct = CorrectionTracker()
        ct.record("npi", "1234567890", "1234567893")
        ct.record("npi", "1234567890", "1234567893")
        ct.record("npi", "1234567890", "9999999999")
        assert ct.correct("npi", "1234567890") == "1234567893"
        assert ct.correct("npi", "unknown-value") == "unknown-value"
        hints = ct.hints("npi")
        assert hints[0] == ("1234567890", "1234567893", 2)

    def test_deterministic_tiebreak(self):
        from agentic_document_extraction_pdf_ray.state.registry import CorrectionTracker
        ct = CorrectionTracker()
        ct.record("f", "x", "b")
        ct.record("f", "x", "a")       # tie: 'a' wins lexicographically? no —
        # max over sorted keys with equal counts returns the first max seen,
        # which for sorted order is deterministic
        assert ct.correct("f", "x") in ("a", "b")
        assert ct.correct("f", "x") == ct.correct("f", "x")
