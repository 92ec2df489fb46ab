"""Evaluation join, metrics, and the seeded injection harness."""

import pytest

from agentic_document_extraction_pdf_ray.pipelines.evaluate import (
    aggregate_metrics, field_match_counts, inject_mutations, injection_catch_rate,
)


def _golden_rows():
    return [
        {"conv_id": "c1", "turn_idx": 0,
         "fields": {"date_0": "2024-01-15", "amount_0": "10.00"}},
        {"conv_id": "c1", "turn_idx": 1, "fields": {"npi_0": "1234567893"}},
        {"conv_id": "c2", "turn_idx": 0, "fields": {"name_0": "SMITH, JOHN"}},
    ]


@pytest.mark.usefixtures("ray_session")
class TestEvalJoin:
    def test_perfect_match_f1_is_1(self):
        import ray.data
        g = ray.data.from_items(_golden_rows())
        e = ray.data.from_items(_golden_rows())
        per_field = field_match_counts(e, g).to_pandas()
        m = aggregate_metrics(per_field)
        assert m["micro_f1"] == 1.0 and m["macro_f1"] == 1.0

    def test_wrong_and_missing(self):
        import ray.data
        g = ray.data.from_items(_golden_rows())
        bad = _golden_rows()
        bad[0]["fields"] = {"date_0": "1999-01-01"}          # wrong + dropped amount
        e = ray.data.from_items(bad)
        m = aggregate_metrics(field_match_counts(e, g).to_pandas())
        assert m["micro_f1"] < 1.0
        pf = m["per_field"].set_index("field")
        assert pf.loc["date_0", "tp"] == 0
        assert pf.loc["amount_0", "fn"] == 1
        assert pf.loc["npi_0", "f1"] == 1.0


class TestInjection:
    def test_deterministic(self):
        rows = _golden_rows() * 20
        m1, log1 = inject_mutations(rows, seed=9)
        m2, log2 = inject_mutations(rows, seed=9)
        assert m1 == m2 and log1 == log2
        m3, log3 = inject_mutations(rows, seed=10)
        assert log3 != log1

    def test_catch_rate_gate(self):
        rows = []
        for i in range(150):
            base = _golden_rows()[i % 3]
            rows.append({**base, "conv_id": f"c{i}"})
        mutated, log = inject_mutations(rows, seed=42, rate=0.5)
        assert log, "some mutations should fire"
        res = injection_catch_rate(mutated, log)
        # reference gates: catch ≥ 85% on phantom/placeholder, FP < 5%
        assert res["catch_rate"] >= 0.85
        assert res["false_positive_rate"] < 0.05


class TestCompareRuns:
    def test_regression_flagged(self):
        import pandas as pd

        from agentic_document_extraction_pdf_ray.pipelines.evaluate import compare_runs
        prev = pd.DataFrame({"field": ["a", "b"], "tp": [10, 10],
                             "fp": [0, 0], "fn": [0, 0], "n": [10, 10]})
        cur = pd.DataFrame({"field": ["a", "b"], "tp": [10, 5],
                            "fp": [0, 5], "fn": [0, 5], "n": [10, 10]})
        rep = compare_runs(prev, cur)
        assert rep["is_regression"]
        assert rep["regressions"][0]["field"] == "b"
        ok = compare_runs(prev, prev)
        assert not ok["is_regression"]
