"""Round-3 relational additions: broadcast range join (balance bands),
grouped top-N per key, ROLLUP aggregation — each vs an independent pandas
reference (DuckDB oracle comparison runs in test_queries_vs_duckdb.py)."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _cents(s: pd.Series) -> np.ndarray:
    return np.floor(s.to_numpy() * 100.0 + 0.5).astype(np.int64)


@pytest.mark.usefixtures("ray_session")
class TestBalanceBands:
    def test_matches_pandas_cut(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            BALANCE_BANDS, customer_balance_bands)
        got = (customer_balance_bands(SF_DIR).to_pandas()
               .sort_values(["c_mktsegment", "band"]).reset_index(drop=True))
        cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
        cents = _cents(cust["c_acctbal"])
        band = pd.Series("?", index=cust.index)
        for name, lo, hi in BALANCE_BANDS:
            band[(cents >= lo) & (cents < hi)] = name
        assert (band != "?").all()               # intervals cover the domain
        want = (pd.DataFrame({"c_mktsegment": cust["c_mktsegment"],
                              "band": band, "cents": cents})
                .groupby(["c_mktsegment", "band"], as_index=False)
                .agg(n_customers=("cents", "size"), bal_cents=("cents", "sum"))
                .sort_values(["c_mktsegment", "band"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"n_customers": "int64", "bal_cents": "int64"}), want)

    def test_bands_partition_the_domain(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import BALANCE_BANDS
        for (_, _, hi), (_, lo, _) in zip(BALANCE_BANDS, BALANCE_BANDS[1:]):
            assert hi == lo                      # contiguous, non-overlapping


@pytest.mark.usefixtures("ray_session")
class TestGroupedTopN:
    def test_matches_pandas_reference(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            orders_top2_per_customer)
        got = (orders_top2_per_customer(SF_DIR).to_pandas()
               .sort_values(["o_custkey", "rnk"]).reset_index(drop=True))
        orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        o = pd.DataFrame({"o_custkey": orders["o_custkey"],
                          "o_orderkey": orders["o_orderkey"],
                          "cents": _cents(orders["o_totalprice"])})
        s = o.sort_values(["o_custkey", "cents", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        rnk = s.groupby("o_custkey").cumcount() + 1
        want = (s[rnk <= 2].assign(rnk=rnk[rnk <= 2].astype(np.int64))
                .sort_values(["o_custkey", "rnk"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["o_custkey", "o_orderkey", "cents", "rnk"]].astype("int64"),
            want.astype("int64"))

    def test_every_customer_capped_at_n(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            orders_top2_per_customer)
        got = orders_top2_per_customer(SF_DIR).to_pandas()
        per = got.groupby("o_custkey").size()
        assert per.max() <= 2
        assert set(got["rnk"].unique()) <= {1, 2}


@pytest.mark.usefixtures("ray_session")
class TestRollup:
    def test_levels_consistent(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            orders_priority_rollup)
        got = orders_priority_rollup(SF_DIR)
        base = got[(got.o_orderpriority != "ALL") & (got.o_orderstatus != "ALL")]
        lvl1 = got[(got.o_orderpriority != "ALL") & (got.o_orderstatus == "ALL")]
        lvl0 = got[(got.o_orderpriority == "ALL") & (got.o_orderstatus == "ALL")]
        assert len(lvl0) == 1
        assert lvl0["n_orders"].iloc[0] == base["n_orders"].sum()
        assert lvl0["total_cents"].iloc[0] == base["total_cents"].sum()
        merged = base.groupby("o_orderpriority", as_index=False)[
            ["n_orders", "total_cents"]].sum().merge(
            lvl1, on="o_orderpriority", suffixes=("_b", "_l"))
        assert (merged["n_orders_b"] == merged["n_orders_l"]).all()
        assert (merged["total_cents_b"] == merged["total_cents_l"]).all()
        orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        assert lvl0["n_orders"].iloc[0] == len(orders)


@pytest.mark.usefixtures("ray_session")
class TestBloomSemiJoin:
    def test_semi_and_anti_partition_customers(self):
        """with_urgent ∪ without_urgent = all customers, disjoint — the
        Bloom prefilter must never drop a true match (exactness is the
        verify stage's job, the bloom only prunes)."""
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            customers_with_urgent_orders, customers_without_urgent_orders)
        semi = customers_with_urgent_orders(SF_DIR).to_pandas()
        anti = customers_without_urgent_orders(SF_DIR).to_pandas()
        cust = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                               columns=["c_custkey"])
        s, a = set(semi["c_custkey"]), set(anti["c_custkey"])
        assert s.isdisjoint(a)
        assert s | a == set(cust["c_custkey"])
        assert len(semi) == len(s) and len(anti) == len(a)

    def test_bloom_prefilter_prunes(self):
        """A tiny bloom (high FP rate) must still give the exact result;
        a reasonable bloom must pass every true match at probe time."""
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            customers_with_urgent_orders)
        exact = customers_with_urgent_orders(SF_DIR).to_pandas()
        tiny = customers_with_urgent_orders(SF_DIR, m_bits=256).to_pandas()
        assert sorted(tiny["c_custkey"]) == sorted(exact["c_custkey"])


@pytest.mark.usefixtures("ray_session")
class TestCorrelatedAggFilter:
    def test_matches_pandas_transform(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            customers_above_nation_avg)
        got = (customers_above_nation_avg(SF_DIR).to_pandas()
               .sort_values("c_custkey").reset_index(drop=True))
        cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
        cents = _cents(cust["c_acctbal"])
        g = cust.assign(cents=cents)
        tot = g.groupby("c_nationkey")["cents"].transform("sum").to_numpy()
        cnt = g.groupby("c_nationkey")["cents"].transform("size").to_numpy()
        keep = cents * cnt > tot
        want = pd.DataFrame({
            "c_custkey": cust["c_custkey"].to_numpy(np.int64)[keep],
            "c_nationkey": cust["c_nationkey"].to_numpy(np.int64)[keep],
            "bal_cents": cents[keep],
        }).sort_values("c_custkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestPartPriceIqrOutliers:
    def test_planted_outlier_flagged(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            part_price_iqr_outliers,
        )
        # 40 tightly-priced parts + one 100x price for the same type
        prices = [10.0 + i * 0.01 for i in range(40)] + [1000.0]
        t = pa.table({
            "p_partkey": pa.array(range(41), pa.int64()),
            "p_type": pa.array(["widget"] * 41, pa.string()),
            "p_retailprice": pa.array(prices, pa.float64()),
        })
        pq.write_table(t, str(tmp_path / "part.parquet"))
        got = part_price_iqr_outliers(str(tmp_path)).to_pandas()
        assert len(got) == 41
        flagged = got[got["is_outlier"]]
        assert flagged["p_partkey"].tolist() == [40]
        # fences are robust: the outlier did not drag q1/q3
        assert int(got["q3"].iloc[0]) < 2000   # still in the 10.xx band

    def test_uniform_type_has_no_outliers(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            part_price_iqr_outliers,
        )
        got = part_price_iqr_outliers(SF_DIR).to_pandas()
        # TPC-H retail prices are near-uniform per type: Tukey fences
        # flag nothing, but quartiles are real
        assert not got["is_outlier"].any()
        assert (got["q1"] <= got["q3"]).all()


@pytest.mark.usefixtures("ray_session")
class TestOrdersTotalReconcile:
    def test_planted_mismatch_flagged(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            orders_total_reconcile,
        )
        # order 1 consistent, order 2 header is 1 cent off, order 3 has
        # no lines (reconciles against 0 and fails)
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_extendedprice": pa.array([100.0, 50.0, 80.0], pa.float64()),
            "l_discount": pa.array([0.1, 0.0, 0.0], pa.float64()),
            "l_tax": pa.array([0.0, 0.1, 0.05], pa.float64()),
        })
        od = pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_totalprice": pa.array([145.0, 84.01, 10.0], pa.float64()),
        })
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        pq.write_table(od, str(tmp_path / "orders.parquet"))
        got = (orders_total_reconcile(str(tmp_path)).to_pandas()
               .set_index("o_orderkey").sort_index())
        assert bool(got.loc[1, "is_consistent"])
        assert int(got.loc[1, "diff_cents"]) == 0
        assert not bool(got.loc[2, "is_consistent"])
        assert int(got.loc[2, "diff_cents"]) == 1
        assert int(got.loc[3, "line_cents"]) == 0
        assert int(got.loc[3, "diff_cents"]) == 1000

    def test_every_order_appears_once(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            orders_total_reconcile,
        )
        got = orders_total_reconcile(SF_DIR).to_pandas()
        import pyarrow.parquet as pq
        n_orders = pq.read_metadata(f"{SF_DIR}/orders.parquet").num_rows
        assert len(got) == n_orders
        assert got["o_orderkey"].is_unique
