"""Relational demo pipelines over the TPC-H-ish tables.

The engine's general query capability (projection-pruned reads, vectorized
filters, partial+final aggregation, broadcast joins, top-k), expressed with
the patterns SURVEY.md §4.2 prescribes:

- money sums in integer cents (``floor(x*100+0.5)``) so results are
  order-independent and bit-identical to the DuckDB oracles;
- dimension tables broadcast via ``ray.put`` + per-batch merge — never a
  shuffle join for a small side;
- aggregates pre-combined inside ``map_batches`` before the (tiny) final
  groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def _cents(x: pd.Series) -> pd.Series:
    return pd.Series(np.floor(x.to_numpy() * 100.0 + 0.5).astype(np.int64),
                     index=x.index)


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary with cents-exact money columns."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff_ts = pd.Timestamp(cutoff)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["l_shipdate"] <= cutoff_ts]
        if batch.empty:
            return pd.DataFrame({
                "l_returnflag": pd.Series([], dtype=str),
                "l_linestatus": pd.Series([], dtype=str),
                "sum_qty": pd.Series([], dtype=np.int64),
                "sum_base_cents": pd.Series([], dtype=np.int64),
                "sum_disc_cents": pd.Series([], dtype=np.int64),
                "count_order": pd.Series([], dtype=np.int64),
            })
        price = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        batch = batch.assign(
            qty_i=batch["l_quantity"].astype(np.int64),
            base_cents=np.floor(price * 100.0 + 0.5).astype(np.int64),
            disc_cents=np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64),
        )
        return (batch.groupby(["l_returnflag", "l_linestatus"], as_index=False)
                .agg(sum_qty=("qty_i", "sum"),
                     sum_base_cents=("base_cents", "sum"),
                     sum_disc_cents=("disc_cents", "sum"),
                     count_order=("qty_i", "size")))

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
        Sum("count_order", alias_name="count_order"))


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation via broadcast dimension maps.

    The fact table streams; the small sides ship once (``ray.put``) and each
    batch does a vectorized pandas merge — the reference's broadcast-lookup
    join class (SURVEY.md §2.4)."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    dim = dim[["c_custkey", "n_name"]]
    dim_ref = ray.put(dim)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        m = batch.merge(d, left_on="o_custkey", right_on="c_custkey", how="inner")
        m = m.assign(cents=_cents(m["o_totalprice"]))
        return (m.groupby("n_name", as_index=False)
                .agg(n_orders=("o_orderkey", "size"), total_cents=("cents", "sum")))

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    partials = orders.map_batches(partial, batch_format="pandas")
    return partials.groupby("n_name").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"))


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value; deterministic tiebreak on key."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["o_totalprice"]))
        return (batch.groupby("o_custkey", as_index=False)
                .agg(total_cents=("cents", "sum")))

    totals = (orders.map_batches(partial, batch_format="pandas")
              .groupby("o_custkey")
              .aggregate(Sum("total_cents", alias_name="total_cents")))
    top = (totals.sort(["total_cents", "o_custkey"], descending=[True, False])
           .limit(k).to_pandas())
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"]).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    return out[["c_custkey", "c_name", "total_cents"]]


def lineitem_filter_project(sf_dir: str, date_lo: str = "1996-01-01",
                            date_hi: str = "1996-12-31") -> ray.data.Dataset:
    """Filter + projection demo: revenue per lineitem in a shipdate range.

    Column pruning at the read; vectorized Arrow predicate inside
    map_batches (faster than ds.filter(row_fn))."""
    import pyarrow.compute as pc
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount", "l_shipdate"])
    lo = pa.scalar(pd.Timestamp(date_lo), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(date_hi), pa.timestamp("us"))

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                       pc.less_equal(batch["l_shipdate"], hi))
        t = batch.filter(mask)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "revenue_cents": pa.array(rev, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def part_type_stats(sf_dir: str) -> ray.data.Dataset:
    """Groupby with Count/Sum/Min/Max aggregate battery over part."""
    from ray.data.aggregate import Max, Min

    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_type", "p_retailprice", "p_size"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["p_retailprice"]))
        return (batch.groupby("p_type", as_index=False)
                .agg(n_parts=("p_size", "size"), sum_cents=("cents", "sum"),
                     min_size=("p_size", "min"), max_size=("p_size", "max")))

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("p_type").aggregate(
        Sum("n_parts", alias_name="n_parts"),
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_size", alias_name="min_size"),
        Max("max_size", alias_name="max_size"))


def distinct_brands(sf_dir: str) -> ray.data.Dataset:
    """Distinct values (ds.unique-class op, via groupby keys)."""
    from ray.data.aggregate import Count
    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
    return (ds.groupby("p_brand").aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"]))


def order_revenue_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Large-large join demo: lineitem ⋈ orders via union + co-group.

    Per-order revenue partials (map-side combine over lineitem) are unioned
    with the tagged orders side and co-grouped on o_orderkey — a
    hash-partitioned join without broadcasting either side (the pattern for
    two big tables, ray_guide.md "Joins"); then global top-k."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        price = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        batch = batch.assign(
            rev=np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64))
        g = (batch.groupby("l_orderkey", as_index=False)
             .agg(revenue_cents=("rev", "sum")))
        g = g.rename(columns={"l_orderkey": "o_orderkey"})
        g["o_custkey"] = np.int64(-1)
        g["side"] = "l"
        return g[["o_orderkey", "o_custkey", "revenue_cents", "side"]]

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def o_tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(revenue_cents=np.int64(0), side="o")
        return batch[["o_orderkey", "o_custkey", "revenue_cents", "side"]]

    unioned = (li.map_batches(li_partial, batch_format="pandas")
               .union(orders.map_batches(o_tag, batch_format="pandas")))

    def cogroup(g: pd.DataFrame) -> pd.DataFrame:
        rev = int(g.loc[g["side"] == "l", "revenue_cents"].sum())
        o = g[g["side"] == "o"]
        if o.empty or rev == 0:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "o_custkey": pd.Series([], dtype=np.int64),
                                 "revenue_cents": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "o_orderkey": [int(o["o_orderkey"].iloc[0])],
            "o_custkey": [int(o["o_custkey"].iloc[0])],
            "revenue_cents": np.array([rev], np.int64),
        })

    joined = unioned.groupby("o_orderkey").map_groups(cogroup,
                                                      batch_format="pandas")
    top = (joined.sort(["revenue_cents", "o_orderkey"], descending=[True, False])
           .limit(k).to_pandas())
    return top[["o_orderkey", "o_custkey", "revenue_cents"]]


def customer_segment_stats(sf_dir: str) -> ray.data.Dataset:
    """Groupby over customer: count + balance cents per market segment."""
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_mktsegment", "c_acctbal"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["c_acctbal"]))
        return (batch.groupby("c_mktsegment", as_index=False)
                .agg(n_customers=("cents", "size"), bal_cents=("cents", "sum")))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("c_mktsegment")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("bal_cents", alias_name="bal_cents")))


def supplier_by_nation(sf_dir: str) -> ray.data.Dataset:
    """supplier ⋈ nation broadcast join: count + balance cents per nation."""
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"]).to_pandas()
    n_ref = ray.put(nation)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(n_ref)
        m = batch.merge(d, left_on="s_nationkey", right_on="n_nationkey")
        m = m.assign(cents=_cents(m["s_acctbal"]))
        return (m.groupby("n_name", as_index=False)
                .agg(n_suppliers=("cents", "size"), bal_cents=("cents", "sum")))

    sup = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_nationkey", "s_acctbal"])
    return (sup.map_batches(partial, batch_format="pandas")
            .groupby("n_name")
            .aggregate(Sum("n_suppliers", alias_name="n_suppliers"),
                       Sum("bal_cents", alias_name="bal_cents")))


def nation_region_counts(sf_dir: str) -> ray.data.Dataset:
    """nation ⋈ region broadcast join: nations per region."""
    region = ray.data.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    r_ref = ray.put(region)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(r_ref)
        m = batch.merge(d, left_on="n_regionkey", right_on="r_regionkey")
        return (m.groupby("r_name", as_index=False)
                .agg(n_nations=("n_nationkey", "size")))

    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    return (nat.map_batches(partial, batch_format="pandas")
            .groupby("r_name").aggregate(Sum("n_nations", alias_name="n_nations")))
