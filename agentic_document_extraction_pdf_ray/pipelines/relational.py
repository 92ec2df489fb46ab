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
from ..functions.hashing import round_sql


def _cents(x: pd.Series) -> pd.Series:
    return pd.Series(np.floor(x.to_numpy() * 100.0 + 0.5).astype(np.int64),
                     index=x.index)


def grouped_sum_bucketed(ds: ray.data.Dataset, key: str,
                         sum_cols: list[str],
                         n_buckets: int = 32) -> ray.data.Dataset:
    """High-cardinality grouped sum via hash buckets.

    ``groupby(key).aggregate(...)`` pays ~ms-level Python overhead PER
    GROUP in the reduce (measured: 15k groups ≈ 30 s); bucketing the keys
    into ``n_buckets`` groups and doing a vectorized pandas groupby inside
    each bucket task brings the same result down to sub-second. This is
    the partitioned-reduce shape that scales to 10^8+ keys.
    """
    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(_bucket=batch[key].to_numpy() % n_buckets
                            if batch[key].dtype.kind in "iu"
                            else pd.util.hash_array(
                                batch[key].to_numpy()) % n_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(key, as_index=False)[sum_cols].sum())

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def topk(ds: ray.data.Dataset, by: list[str], k: int,
         ascending: list[bool]) -> pd.DataFrame:
    """Distributed top-k without a global sort: per-block partial top-k
    (vectorized) → tiny driver-side merge. A full ``ds.sort().limit(k)``
    shuffles every row; this ships at most k rows per block."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending).head(k)

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    merged = pd.DataFrame(parts)
    if merged.empty:              # zero-row input: no columns survive
        return pd.DataFrame(columns=by)
    return (merged.sort_values(by, ascending=ascending)
            .head(k).reset_index(drop=True))


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


def revenue_by_nation(sf_dir: str, n_buckets: int = 32,
                      broadcast_max_rows: int = 1_000_000) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation.

    customer is O(fact-table) — NOT a broadcastable side at 100× scale
    (VERDICT round 1 #9). Routing: while customer fits comfortably in a
    broadcast (≤ ``broadcast_max_rows``), the classic broadcast-merge
    runs (2 narrow int columns; cheapest locally); beyond that, orders
    partials and the customer key→nation projection are unioned and
    co-grouped on a bounded custkey hash bucket (the large-large
    union+co-group join, same as ``order_revenue_topk``). Only nation
    itself (25 rows) is ever broadcast unconditionally."""
    cust_ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                    columns=["c_custkey", "c_nationkey"])
    if cust_ds.count() <= broadcast_max_rows:    # parquet metadata, no scan
        return _revenue_by_nation_broadcast(sf_dir, cust_ds)
    return _revenue_by_nation_cogroup(sf_dir, cust_ds, n_buckets)


def _revenue_by_nation_broadcast(sf_dir: str,
                                 cust_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Small-customer fast path: custkey→nation dim broadcast once."""
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust_ds.to_pandas().merge(nation, left_on="c_nationkey",
                                    right_on="n_nationkey")
    dim_ref = ray.put(dim[["c_custkey", "n_name"]])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        m = batch.merge(d, left_on="o_custkey", right_on="c_custkey",
                        how="inner")
        m = m.assign(cents=_cents(m["o_totalprice"]))
        return (m.groupby("n_name", as_index=False)
                .agg(n_orders=("o_orderkey", "size"),
                     total_cents=("cents", "sum")))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return (orders.map_batches(partial, batch_format="pandas")
            .groupby("n_name")
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("total_cents", alias_name="total_cents")))


def _revenue_by_nation_cogroup(sf_dir: str, cust_ds: ray.data.Dataset,
                               n_buckets: int) -> ray.data.Dataset:
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def o_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["o_totalprice"]))
        g = (batch.groupby("o_custkey", as_index=False)
             .agg(n_orders=("cents", "size"), cents=("cents", "sum")))
        g = g.rename(columns={"o_custkey": "custkey"})
        g["nationkey"] = np.int64(-1)
        g["side"] = "o"
        return g[["custkey", "n_orders", "cents", "nationkey", "side"]]

    cust = cust_ds

    def c_tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": batch["c_custkey"].to_numpy(np.int64),
            "n_orders": np.zeros(len(batch), np.int64),
            "cents": np.zeros(len(batch), np.int64),
            "nationkey": batch["c_nationkey"].to_numpy(np.int64),
            "side": "c",
        })

    unioned = (orders.map_batches(o_partial, batch_format="pandas")
               .union(cust.map_batches(c_tag, batch_format="pandas")))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(_bucket=batch["custkey"].to_numpy(np.int64)
                            % n_buckets)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = (g[g["side"] == "o"]
             .groupby("custkey", as_index=False)
             .agg(n_orders=("n_orders", "sum"), cents=("cents", "sum")))
        c = g.loc[g["side"] == "c", ["custkey", "nationkey"]]
        m = o.merge(c, on="custkey", how="inner")
        return (m.groupby("nationkey", as_index=False)
                .agg(n_orders=("n_orders", "sum"), total_cents=("cents", "sum")))

    per_nation = (unioned.map_batches(bucketize, batch_format="pandas")
                  .groupby("_bucket")
                  .map_groups(join_bucket, batch_format="pandas")
                  .groupby("nationkey")
                  .aggregate(Sum("n_orders", alias_name="n_orders"),
                             Sum("total_cents", alias_name="total_cents")))

    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"]).to_pandas()
    n_ref = ray.put(nation)

    def attach_name(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(n_ref)
        m = batch.merge(d, left_on="nationkey", right_on="n_nationkey")
        return m[["n_name", "n_orders", "total_cents"]]

    return per_nation.map_batches(attach_name, batch_format="pandas")


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value; deterministic tiebreak on key."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["o_totalprice"]))
        return (batch.groupby("o_custkey", as_index=False)
                .agg(total_cents=("cents", "sum")))

    totals = grouped_sum_bucketed(
        orders.map_batches(partial, batch_format="pandas"),
        "o_custkey", ["total_cents"])
    top = topk(totals, ["total_cents", "o_custkey"], k, [False, True])
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

    # Bucket-level hash join: ~B groups instead of one group per orderkey
    # (per-group reduce overhead dominates at high key cardinality), each
    # bucket task doing a fully vectorized pandas aggregate + merge. The
    # bucket key is computed inside the partial maps (no separate pass
    # over the unioned stream).
    n_buckets = 32

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
        g["_bucket"] = g["o_orderkey"].to_numpy() % n_buckets
        return g[["o_orderkey", "o_custkey", "revenue_cents", "side", "_bucket"]]

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def o_tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(revenue_cents=np.int64(0), side="o",
                             _bucket=batch["o_orderkey"].to_numpy() % n_buckets)
        return batch[["o_orderkey", "o_custkey", "revenue_cents", "side",
                      "_bucket"]]

    unioned = (li.map_batches(li_partial, batch_format="pandas")
               .union(orders.map_batches(o_tag, batch_format="pandas")))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li_side = (g[g["side"] == "l"]
                   .groupby("o_orderkey", as_index=False)
                   .agg(revenue_cents=("revenue_cents", "sum")))
        o_side = g.loc[g["side"] == "o", ["o_orderkey", "o_custkey"]]
        m = o_side.merge(li_side, on="o_orderkey", how="inner")
        m = m[m["revenue_cents"] > 0]
        return m[["o_orderkey", "o_custkey", "revenue_cents"]]

    joined = (unioned.groupby("_bucket")
              .map_groups(join_bucket, batch_format="pandas"))
    top = topk(joined, ["revenue_cents", "o_orderkey"], k, [False, True])
    return top[["o_orderkey", "o_custkey", "revenue_cents"]]


# Balance bands: a tiny interval dimension (lo inclusive, hi exclusive,
# in cents). The broadcast-range-join class: the small side is interval-
# keyed, so the per-batch lookup is a vectorized searchsorted on the
# sorted edge array — no shuffle, no per-row loop.
BALANCE_BANDS = (
    ("debt", -(10**12), 0),
    ("low", 0, 200_000),
    ("mid", 200_000, 600_000),
    ("high", 600_000, 10**12),
)


def customer_balance_bands(sf_dir: str) -> ray.data.Dataset:
    """Range join class: customers ⋈ balance-band intervals.

    The band table is broadcast (module constant here; a computed small
    side would ride ``ray.put`` exactly like the nation dimension); each
    batch assigns bands via ``np.searchsorted`` over the sorted lower
    edges — the vectorized interval lookup — then partial+final counts
    per (segment, band). The oracle expresses the same operation as a
    genuine inequality join against a VALUES table."""
    edges = np.array([b[1] for b in BALANCE_BANDS], np.int64)
    names = np.array([b[0] for b in BALANCE_BANDS])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(batch["c_acctbal"]).to_numpy()
        band = names[np.searchsorted(edges, cents, side="right") - 1]
        return (pd.DataFrame({"c_mktsegment": batch["c_mktsegment"],
                              "band": band, "cents": cents})
                .groupby(["c_mktsegment", "band"], as_index=False)
                .agg(n_customers=("cents", "size"), bal_cents=("cents", "sum")))

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_mktsegment", "c_acctbal"])
    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["c_mktsegment", "band"])
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("bal_cents", alias_name="bal_cents")))


def orders_top2_per_customer(sf_dir: str, n: int = 2,
                             n_buckets: int = 32) -> ray.data.Dataset:
    """Grouped top-N per key (window-rank class) — distinct from global
    top-k: every customer keeps its N best orders.

    Map-side combine bounds the exchange at N rows per (batch, custkey);
    the bucketed reduce then ranks each customer's survivors with one
    vectorized lexsort + cumcount per bucket (no per-group Python)."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderkey",
                                        "o_totalprice"])

    def rank_top(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(["o_custkey", "cents", "o_orderkey"],
                              ascending=[True, False, True],
                              kind="mergesort")
        rnk = s.groupby("o_custkey").cumcount() + 1
        return s[rnk <= n].assign(rnk=rnk[rnk <= n].astype(np.int64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["o_totalprice"]))
        out = rank_top(batch[["o_custkey", "o_orderkey", "cents"]])
        out["_bucket"] = out["o_custkey"].to_numpy() % n_buckets
        return out.drop(columns=["rnk"])       # rank is only final per bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return rank_top(g)[["o_custkey", "o_orderkey", "cents", "rnk"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def orders_priority_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP aggregation class: counts + price cents by
    (priority, status), (priority), and grand total.

    Distributed work is the base partial+final groupby; the subtotal
    levels are derived from the TINY base aggregate on the driver (the
    rollup never re-reads the fact table). 'ALL' markers replace SQL's
    grouping NULLs so the hash comparison never sees nulls."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderpriority", "o_orderstatus",
                                        "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["o_totalprice"]))
        return (batch.groupby(["o_orderpriority", "o_orderstatus"],
                              as_index=False)
                .agg(n_orders=("cents", "size"), total_cents=("cents", "sum")))

    base = (ds.map_batches(partial, batch_format="pandas")
            .groupby(["o_orderpriority", "o_orderstatus"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("total_cents", alias_name="total_cents"))
            .to_pandas())                      # |priorities| × |statuses|

    lvl1 = (base.groupby("o_orderpriority", as_index=False)
            [["n_orders", "total_cents"]].sum().assign(o_orderstatus="ALL"))
    lvl0 = pd.DataFrame({"o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
                         "n_orders": [base["n_orders"].sum()],
                         "total_cents": [base["total_cents"].sum()]})
    out = pd.concat([base, lvl1, lvl0], ignore_index=True)
    for c in ("n_orders", "total_cents"):
        out[c] = out[c].astype("int64")
    return out[["o_orderpriority", "o_orderstatus", "n_orders", "total_cents"]]


def customers_without_urgent_orders(sf_dir: str,
                                    n_buckets: int = 32) -> ray.data.Dataset:
    """Anti-join class (NOT EXISTS): customers with no 1-URGENT order.

    Same union + bucketed co-group shape as the large-large join
    (:func:`order_revenue_topk`), but the bucket task emits the PROBE rows
    whose key is absent from the build side. The orders side is reduced
    map-side to distinct custkeys per batch, so the exchange carries at
    most one row per (batch, custkey) — never the raw order rows."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderpriority"])

    def c_tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": batch["c_custkey"].to_numpy(np.int64),
            "c_mktsegment": batch["c_mktsegment"],
            "side": "c",
            "_bucket": batch["c_custkey"].to_numpy(np.int64) % n_buckets})

    def o_tag(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch.loc[batch["o_orderpriority"].str.startswith("1"),
                           "o_custkey"].drop_duplicates()
        keys = urgent.to_numpy(np.int64)
        return pd.DataFrame({"c_custkey": keys, "c_mktsegment": "",
                             "side": "o", "_bucket": keys % n_buckets})

    unioned = (cust.map_batches(c_tag, batch_format="pandas")
               .union(orders.map_batches(o_tag, batch_format="pandas")))

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["side"] == "o", "c_custkey"].unique()
        probe = g[g["side"] == "c"]
        out = probe[~probe["c_custkey"].isin(have)]
        return out[["c_custkey", "c_mktsegment"]]

    return (unioned.groupby("_bucket")
            .map_groups(anti_bucket, batch_format="pandas"))


def customers_above_nation_avg(sf_dir: str) -> ray.data.Dataset:
    """Correlated-aggregate filter class (scalar subquery per group):
    customers whose balance strictly exceeds their nation's average.

    Two-pass broadcast plan — pass 1 reduces the fact table to a tiny
    per-nation (sum, count) aggregate (map-side combined); pass 2
    re-streams the table with that aggregate broadcast and filters
    vectorized. The comparison is integer-exact — ``cents * cnt >
    total_cents`` — so no float-division boundary case can diverge from
    the oracle, which uses the same cross-multiplied predicate."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(cents=_cents(batch["c_acctbal"]))
        return (batch.groupby("c_nationkey", as_index=False)
                .agg(total=("cents", "sum"), cnt=("cents", "size")))

    agg = (cust.map_batches(partial, batch_format="pandas")
           .groupby("c_nationkey")
           .aggregate(Sum("total", alias_name="total"),
                      Sum("cnt", alias_name="cnt"))
           .to_pandas())                     # |nations| rows — tiny
    agg_ref = ray.put(agg.set_index("c_nationkey"))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        a = ray.get(agg_ref)
        cents = _cents(batch["c_acctbal"]).to_numpy()
        nk = batch["c_nationkey"].to_numpy(np.int64)
        total = a["total"].to_numpy()[a.index.get_indexer(nk)]
        cnt = a["cnt"].to_numpy()[a.index.get_indexer(nk)]
        keep = cents * cnt > total
        return pd.DataFrame({
            "c_custkey": batch["c_custkey"].to_numpy(np.int64)[keep],
            "c_nationkey": nk[keep],
            "bal_cents": cents[keep],
        })

    return cust.map_batches(filt, batch_format="pandas")


# Bloom prefilter sizing: bits per build-side distinct key at the target
# false-positive rate; 2 hash probes. FPs only cost verify work — never
# correctness (the co-group verify stage is exact).
BLOOM_BITS = 1 << 20


def _bloom_positions(keys: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Two vectorized 64-bit mix hashes → bit positions in [0, m)."""
    v = keys.astype(np.uint64)
    v ^= v >> np.uint64(33)
    h1 = v * np.uint64(0xFF51AFD7ED558CCD)
    h2 = v * np.uint64(0xC4CEB9FE1A85EC53)
    h1 ^= h1 >> np.uint64(29)
    h2 ^= h2 >> np.uint64(29)
    return ((h1 % np.uint64(m)).astype(np.int64),
            (h2 % np.uint64(m)).astype(np.int64))


def customers_with_urgent_orders(sf_dir: str, n_buckets: int = 32,
                                 m_bits: int = BLOOM_BITS) -> ray.data.Dataset:
    """Semi-join class (EXISTS) with a broadcast Bloom prefilter:
    customers having at least one 1-URGENT order.

    Stage 1 folds the build side into per-block partial Bloom bitmaps
    (distinct urgent custkeys → 2 mix-hash bits each, ``np.packbits``) —
    the driver ORs ``m_bits/8``-byte partials, never keys. Stage 2
    probes customers map-side against the broadcast bitmap, passing only
    hits (true matches + the FP tail). Stage 3 verifies survivors
    exactly via the same union + bucketed co-group shape as the
    anti-join — correctness never depends on the Bloom, which only cuts
    the probe rows entering the shuffle (at 100 TB: by the semi-join
    selectivity, for a fixed ~128 KiB broadcast)."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderpriority"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])

    def o_bloom(batch: pd.DataFrame) -> pd.DataFrame:
        keys = (batch.loc[batch["o_orderpriority"].str.startswith("1"),
                          "o_custkey"].drop_duplicates().to_numpy(np.int64))
        bits = np.zeros(m_bits, dtype=bool)
        p1, p2 = _bloom_positions(keys, m_bits)
        bits[p1] = True
        bits[p2] = True
        return pd.DataFrame({"bloom": [np.packbits(bits).tobytes()]})

    packed = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in orders.map_batches(o_bloom, batch_format="pandas",
                                  batch_size=65536).take_all():
        packed |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bloom_ref = ray.put(packed)

    def c_probe(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.unpackbits(ray.get(bloom_ref)).view(bool)
        keys = batch["c_custkey"].to_numpy(np.int64)
        p1, p2 = _bloom_positions(keys, m_bits)
        hit = bits[p1] & bits[p2]
        out = pd.DataFrame({
            "c_custkey": keys[hit],
            "c_mktsegment": batch["c_mktsegment"].to_numpy(object)[hit],
            "side": "c"})
        return out.assign(_bucket=out["c_custkey"].to_numpy(np.int64)
                          % n_buckets)

    def o_tag(batch: pd.DataFrame) -> pd.DataFrame:
        urgent = batch.loc[batch["o_orderpriority"].str.startswith("1"),
                           "o_custkey"].drop_duplicates()
        keys = urgent.to_numpy(np.int64)
        return pd.DataFrame({"c_custkey": keys, "c_mktsegment": "",
                             "side": "o", "_bucket": keys % n_buckets})

    unioned = (cust.map_batches(c_probe, batch_format="pandas")
               .union(orders.map_batches(o_tag, batch_format="pandas")))

    def semi_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["side"] == "o", "c_custkey"].unique()
        probe = g[g["side"] == "c"]
        out = probe[probe["c_custkey"].isin(have)]
        return out[["c_custkey", "c_mktsegment"]]

    return (unioned.groupby("_bucket")
            .map_groups(semi_bucket, batch_format="pandas"))


def customer_balance_percentile(sf_dir: str,
                                n_buckets: int = 32) -> ray.data.Dataset:
    """Global-ranking window class (``percent_rank() OVER (ORDER BY
    cents)``) WITHOUT a global sort: pass 1 reduces the table to a
    value-count histogram over distinct cents (bounded by the value
    DOMAIN — ~1.2M possible balance cents — not by row count, so it
    stays a small broadcast even at 10^12 rows); the driver cumsums it
    into an n-smaller table; pass 2 re-streams the table and assigns
    each row's rank by vectorized ``searchsorted``. The single float op
    — ``n_smaller / (N-1)`` — is one IEEE division on both engines."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_acctbal"])

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["c_acctbal"])
        out = c.value_counts().rename_axis("cents").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    h = (grouped_sum_bucketed(
            cust.map_batches(hist, batch_format="pandas"), "cents", ["n"],
            n_buckets)
         .to_pandas().sort_values("cents").reset_index(drop=True))
    values = h["cents"].to_numpy(np.int64)
    counts = h["n"].to_numpy(np.int64)
    n_total = int(counts.sum())
    n_smaller = np.concatenate(([0], np.cumsum(counts)[:-1]))
    side = ray.put((values, n_smaller))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        vals, smaller = ray.get(side)
        cents = _cents(batch["c_acctbal"]).to_numpy()
        idx = np.searchsorted(vals, cents)
        pct = smaller[idx].astype(np.float64) / float(n_total - 1)
        return pd.DataFrame({
            "c_custkey": batch["c_custkey"].to_numpy(np.int64),
            "bal_cents": cents,
            "pct_rank": pct,
        })

    return cust.map_batches(assign, batch_format="pandas")


def _qty_discount_moments(sf_dir: str) -> pd.DataFrame:
    """Shared grouped integer-moment sums (n, Σx, Σy, Σx², Σy², Σxy) of
    quantity vs discount basis points per return flag — the one
    distributed pass behind both the correlation and the regression
    finishes; six int64 sums per (block, flag) is all that ships."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(batch["l_quantity"].to_numpy(np.float64)
                     + 0.5).astype(np.int64)
        y = np.floor(batch["l_discount"].to_numpy(np.float64) * 10000.0
                     + 0.5).astype(np.int64)
        d = pd.DataFrame({"l_returnflag": batch["l_returnflag"],
                          "n": np.int64(1), "sx": x, "sy": y,
                          "sxx": x * x, "syy": y * y, "sxy": x * y})
        return (d.groupby("l_returnflag", as_index=False)
                [["n", "sx", "sy", "sxx", "syy", "sxy"]].sum())

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("l_returnflag")
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
            .to_pandas().sort_values("l_returnflag").reset_index(drop=True))


def lineitem_corr_qty_discount(sf_dir: str) -> pd.DataFrame:
    """Grouped second-moment aggregate class: Pearson correlation of
    quantity vs discount per return flag, computed from INTEGER moment
    sums (qty, discount basis points) so every partial is
    order-independent and overflow-safe, with ONE shared float finish.

    The distributed part ships six int64 sums per (block, flag) —
    nothing else; the final correlation is a single float64 expression
    evaluated identically here and in the oracle, on sums that are exact
    integers, so the result is IEEE-bit-identical on both engines (same
    discipline as ``customer_balance_percentile``'s single division)."""
    sums = _qty_discount_moments(sf_dir)
    n = sums["n"].to_numpy(np.float64)
    sx = sums["sx"].to_numpy(np.float64)
    sy = sums["sy"].to_numpy(np.float64)
    sxx = sums["sxx"].to_numpy(np.float64)
    syy = sums["syy"].to_numpy(np.float64)
    sxy = sums["sxy"].to_numpy(np.float64)
    # keep this expression tree in sync with the oracle SQL verbatim
    corr = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                                  * np.sqrt(n * syy - sy * sy))
    return pd.DataFrame({"l_returnflag": sums["l_returnflag"],
                         "n_rows": sums["n"].astype("int64"),
                         "corr_qty_disc": corr})


def lineitem_regression(sf_dir: str) -> pd.DataFrame:
    """Grouped least-squares class: per return flag, the OLS slope and
    intercept of quantity (y) on discount basis points (x) — same one
    distributed integer-moment pass as :func:`lineitem_corr_qty_discount`
    (shared :func:`_qty_discount_moments`), different float finish:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²), intercept = (Σy −
    slope·Σx) / n, each a single expression over exact integer sums,
    mirrored verbatim in the oracle."""
    sums = _qty_discount_moments(sf_dir)
    n = sums["n"].to_numpy(np.float64)
    sx = sums["sy"].to_numpy(np.float64)    # x = discount bp
    sy = sums["sx"].to_numpy(np.float64)    # y = quantity
    sxx = sums["syy"].to_numpy(np.float64)
    sxy = sums["sxy"].to_numpy(np.float64)
    # keep this expression tree in sync with the oracle SQL verbatim
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({"l_returnflag": sums["l_returnflag"],
                         "n_rows": sums["n"].astype("int64"),
                         "slope_qty_per_bp": slope,
                         "intercept_qty": intercept})


def customer_balance_ntile(sf_dir: str, k: int = 4,
                           n_buckets: int = 32) -> ray.data.Dataset:
    """``ntile(k)`` over the whole table WITHOUT a global sort. Global
    row number = (rows with smaller cents, from the same domain-bounded
    histogram broadcast as :func:`customer_balance_percentile`) + (rank
    of the row among equal-cents peers, computed inside the cents-hash
    bucket where all peers are co-located). The tile boundary arithmetic
    — the first ``N % k`` tiles get one extra row — is pure int64, so
    the output is exact, not float-rounded."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_acctbal"])

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["c_acctbal"])
        out = c.value_counts().rename_axis("cents").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    h = (grouped_sum_bucketed(
            cust.map_batches(hist, batch_format="pandas"), "cents", ["n"],
            n_buckets)
         .to_pandas().sort_values("cents").reset_index(drop=True))
    values = h["cents"].to_numpy(np.int64)
    counts = h["n"].to_numpy(np.int64)
    n_total = int(counts.sum())
    n_smaller = np.concatenate(([0], np.cumsum(counts)[:-1]))
    side = ray.put((values, n_smaller))
    base, rem = n_total // k, n_total % k

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(batch["c_acctbal"]).to_numpy()
        return pd.DataFrame({"c_custkey": batch["c_custkey"],
                             "cents": cents,
                             "_bucket": cents % n_buckets})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        vals, smaller = ray.get(side)
        g = g.sort_values(["cents", "c_custkey"], kind="mergesort")
        peer_rank = g.groupby("cents").cumcount().to_numpy(np.int64)
        rn = smaller[np.searchsorted(
            vals, g["cents"].to_numpy(np.int64))] + peer_rank
        cut = rem * (base + 1)
        tile = np.where(rn < cut, rn // (base + 1),
                        rem + (rn - cut) // max(base, 1)) + 1
        return pd.DataFrame({
            "c_custkey": g["c_custkey"].to_numpy(np.int64),
            "bal_cents": g["cents"].to_numpy(np.int64),
            "tile": tile.astype(np.int64),
        })

    return (cust.map_batches(bucketize, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


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


def customer_order_dist(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q13 class — distribution of customers by order count,
    INCLUDING zero-order customers, with the LEFT OUTER JOIN eliminated
    algebraically: every customer with no orders lands in the same
    histogram row, so the zero bucket is just
    ``count(customer) − count(distinct o_custkey)`` and no customer row
    ever joins anything.

    Plan: bucketed per-customer order counts (one narrow exchange of
    (custkey, n) partials), a tiny second groupby over (c_count), plus a
    single scalar customer count — vs the textbook plan's full
    customer ⟕ orders shuffle.
    """
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    per_cust = grouped_sum_bucketed(
        orders.map_batches(lambda b: b.groupby("o_custkey", as_index=False)
                           .agg(n=("o_custkey", "size")),
                           batch_format="pandas"),
        "o_custkey", ["n"], n_buckets)
    hist = (per_cust.map_batches(
        lambda b: b.groupby("n", as_index=False).agg(
            n_custs=("o_custkey", "size")), batch_format="pandas")
        .groupby("n").aggregate(Sum("n_custs", alias_name="n_custs"))
        .to_pandas())
    n_customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()
    zero = n_customers - int(hist["n_custs"].sum())
    out = hist.rename(columns={"n": "c_count"})
    if zero > 0:        # SQL's LEFT JOIN GROUP BY emits no empty bucket row
        out = pd.concat([out, pd.DataFrame({"c_count": [0],
                                            "n_custs": [zero]})],
                        ignore_index=True)
    out = out.astype({"c_count": np.int64, "n_custs": np.int64})
    return (out.sort_values("c_count").reset_index(drop=True)
            [["c_count", "n_custs"]])


def part_price_iqr_outliers(sf_dir: str) -> ray.data.Dataset:
    """Robust per-type price-outlier screen: a part is flagged when its
    retail price (integer cents) falls outside Tukey's fences
    ``[q1 − 1.5·IQR, q3 + 1.5·IQR]`` of its OWN ``p_type`` — the
    data-hygiene scan a catalog/ingest pipeline runs before trusting a
    numeric column (robust where a z-score screen is itself dragged by
    the outliers it hunts).

    Exact and all-integer: quartiles use the cum-count convention
    (q_p = smallest cents with running count >= ceil(p·N/100), the
    :func:`customer_balance_percentile` family); the 1.5·IQR fence is
    evaluated as ``2·cents < 2·q1 − 3·IQR`` (and mirrored above) so no
    float ever enters the comparison on either engine.

    Scale shape: ONE (type, cents)-keyed histogram exchange — narrow
    partial-count rows, never the parts — then per-type threshold rows
    (≤ #types) broadcast via ``ray.put`` into a pruned second scan.

    Output: every part with ``p_partkey, p_type, price_cents, q1, q3,
    is_outlier`` (flag rather than filter — uniform synthetic prices
    produce zero true outliers, and downstream policies often want the
    fences alongside the verdict anyway).
    """
    from ray.data.aggregate import Sum

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type",
                                          "p_retailprice"])

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"p_type": batch["p_type"],
                          "cents": _cents(batch["p_retailprice"])})
        g = (d.groupby(["p_type", "cents"], as_index=False)
             .size().rename(columns={"size": "n"}))
        # (p_type, cents) cardinality approaches #parts — bucketed
        # partitioned-reduce, not a raw aggregate (see grouped_sum_bucketed)
        return g.assign(_bucket=g["cents"].to_numpy(np.int64) % 64)

    def fences(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        v = g["cents"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        q1 = int(v[np.searchsorted(cum, (25 * n + 99) // 100, "left")])
        q3 = int(v[np.searchsorted(cum, (75 * n + 99) // 100, "left")])
        return pd.DataFrame({"p_type": [g["p_type"].iloc[0]],
                             "q1": np.array([q1], np.int64),
                             "q3": np.array([q3], np.int64)})

    th = (part.map_batches(hist, batch_format="pandas")
          .groupby("_bucket")
          .map_groups(lambda g: g.groupby(["p_type", "cents"],
                                          as_index=False)
                      .agg(n=("n", "sum")), batch_format="pandas")
          .groupby("p_type").map_groups(fences, batch_format="pandas")
          .to_pandas())                           # ≤ #types rows
    fence_ref = ray.put({r.p_type: (int(r.q1), int(r.q3))
                         for r in th.itertuples()})

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        fm = ray.get(fence_ref)
        cents = _cents(batch["p_retailprice"]).to_numpy()
        q1 = np.array([fm[t][0] for t in batch["p_type"]], np.int64)
        q3 = np.array([fm[t][1] for t in batch["p_type"]], np.int64)
        iqr = q3 - q1
        out = (2 * cents < 2 * q1 - 3 * iqr) | (2 * cents > 2 * q3 + 3 * iqr)
        return pd.DataFrame({
            "p_partkey": batch["p_partkey"].to_numpy(np.int64),
            "p_type": batch["p_type"].to_numpy(),
            "price_cents": cents,
            "q1": q1, "q3": q3, "is_outlier": out})

    return part.map_batches(flag, batch_format="pandas")


def orders_total_reconcile(sf_dir: str,
                           n_buckets: int = 64) -> ray.data.Dataset:
    """Cross-table sum reconciliation: every order's header total
    checked against the integer-cents sum of its own line items —
    the table-scale analogue of the reference's ``sum_reconcile``
    tool-validation rule (``/root/reference/src/agents/
    validators.py`` routing, SURVEY §2.8), run as a distributed audit
    instead of a per-document tool call.

    Determinism: each line contributes ``floor(extendedprice · (1 −
    discount) · (1 + tax) · 100 + 0.5)`` — the float product is a
    fixed per-row expression (identical IEEE ops on both engines) and
    the SUM is integer, so no float-summation-order hazard exists.

    Scale shape: map-side per-batch partial sums keyed by orderkey
    (lineitems collapse ~4:1 before the wire), then ONE orderkey-hash
    bucketed exchange where the order headers (tagged rows in the same
    stream) merge against the folded line sums — a co-grouped join,
    no broadcast of either big side.

    Output: ``o_orderkey, total_cents, line_cents, diff_cents,
    is_consistent``.
    """
    from ..functions.hashing import bucket_int_array

    def line_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - batch["l_discount"].to_numpy(np.float64))
            * (1.0 + batch["l_tax"].to_numpy(np.float64))
            * 100.0 + 0.5).astype(np.int64)
        d = (pd.DataFrame({"k": batch["l_orderkey"].to_numpy(np.int64),
                           "cents": cents})
             .groupby("k", as_index=False).sum())
        d["_side"] = "l"
        d["_bucket"] = bucket_int_array(d["k"].to_numpy(np.int64),
                                        n_buckets)
        return d

    def order_tag(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "k": batch["o_orderkey"].to_numpy(np.int64),
            "cents": _cents(batch["o_totalprice"]).to_numpy()})
        d["_side"] = "o"
        d["_bucket"] = bucket_int_array(d["k"].to_numpy(np.int64),
                                        n_buckets)
        return d

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lines = (g[g["_side"] == "l"].groupby("k", as_index=False)
                 .agg(line_cents=("cents", "sum")))
        orders = (g[g["_side"] == "o"]
                  .rename(columns={"cents": "total_cents"}))
        m = orders.merge(lines, on="k", how="left")
        lc = m["line_cents"].fillna(0).astype(np.int64)
        tc = m["total_cents"].to_numpy(np.int64)
        return pd.DataFrame({
            "o_orderkey": m["k"].to_numpy(np.int64),
            "total_cents": tc,
            "line_cents": lc.to_numpy(),
            "diff_cents": tc - lc.to_numpy(),
            "is_consistent": tc == lc.to_numpy()})

    li = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
        .map_batches(line_partial, batch_format="pandas"))
    od = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
        .map_batches(order_tag, batch_format="pandas"))
    return (li.union(od).groupby("_bucket")
            .map_groups(merge, batch_format="pandas"))


def fk_integrity_audit(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Referential-integrity audit across the relational tables — the
    foreign-key health report an ingest pipeline runs before anything
    downstream trusts a join (reference analogue: the cross-field
    consistency validators of ``/root/reference/src/agents/
    validators.py``, run table-scale): for each FK relation
    (``orders→lineitem``, ``customer→orders``), the count of child ROWS
    whose key has no parent, distinct orphaned child KEYS, and parent
    keys with no children.

    Scale shape: each table collapses MAP-SIDE to per-block distinct
    ``(key, side, n_rows)`` partials over BLOCK-SIZED batches
    (``batch_size=None`` — the 1024-row default would defeat the
    collapse and ~4× the exchange, the recurring partial-combine trap);
    ONE key-hash bucketed exchange co-locates both sides of both
    relations (the relation tag keeps the keyspaces apart inside the
    bucket); per-bucket two vectorized ``isin`` indicator folds produce
    partial metric sums, and the final fold is a single-task sum over
    ≤2·buckets tiny rows."""
    from ..functions.hashing import bucket_int_array

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # one read wave per stream: the default splits each single-column
    # scan into 64 sub-blocks -> 256 near-empty tasks across the four
    # streams, pure scheduling overhead (measured 6.3s -> 0.9s at sf0.1)
    nb = max(8, cpus)

    def tagged(table: str, key: str, rel: str, side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            d = (pd.DataFrame({"k": batch[key].to_numpy(np.int64)})
                 .groupby("k", as_index=False).size()
                 .rename(columns={"size": "n"}))
            d["n"] = d["n"].astype(np.int64)
            d["_rel"] = rel
            d["_side"] = side
            d["_bucket"] = bucket_int_array(d["k"].to_numpy(np.int64),
                                            n_buckets)
            return d
        return (ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                      columns=[key],
                                      override_num_blocks=nb)
                .map_batches(fn, batch_format="pandas", batch_size=None))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rel, gr in g.groupby("_rel", sort=False):
            p_keys = gr.loc[gr["_side"] == "p", "k"].unique()
            c = (gr[gr["_side"] == "c"].groupby("k")["n"].sum())
            orphan = ~c.index.isin(p_keys)
            childless = int((~pd.Index(p_keys).isin(c.index)).sum())
            rows.append({
                "relation": rel,
                "n_child_rows_orphaned": int(c[orphan].sum()),
                "n_child_keys_orphaned": int(orphan.sum()),
                "n_parent_keys_childless": childless})
        return pd.DataFrame(rows, columns=[
            "relation", "n_child_rows_orphaned", "n_child_keys_orphaned",
            "n_parent_keys_childless"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("relation", as_index=False)[
            ["n_child_rows_orphaned", "n_child_keys_orphaned",
             "n_parent_keys_childless"]].sum()
        for c in out.columns[1:]:
            out[c] = out[c].astype(np.int64)
        return out

    streams = (
        tagged("orders", "o_orderkey", "orders->lineitem", "p")
        .union(tagged("lineitem", "l_orderkey", "orders->lineitem", "c"))
        .union(tagged("customer", "c_custkey", "customer->orders", "p"))
        .union(tagged("orders", "o_custkey", "customer->orders", "c")))
    return (streams.groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def orders_monthly_yoy(sf_dir: str) -> ray.data.Dataset:
    """Monthly revenue with year-over-year growth — the seasonality /
    trend report over the orders fact table: per calendar month, total
    revenue in exact cents, the same month one year earlier, and
    ``yoy_growth = round((cur − prev)/prev, 6)``. Months without a
    prior-year counterpart are excluded (inner join keeps every column
    non-null, so the hash compare is exact).

    Scale shape: map-side partial cents sums collapse each block to the
    bounded month domain; one small exchange, then a single
    bounded-domain self-merge on (year−1, month)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "month": batch["o_orderdate"].dt.strftime("%Y-%m"),
            "cents": _cents(batch["o_totalprice"]).to_numpy()})
        return d.groupby("month", as_index=False)["cents"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("month", as_index=False)["cents"].sum()
        m["cents"] = m["cents"].astype(np.int64)
        y = m["month"].str.slice(0, 4).astype(np.int64)
        prev_key = (y - 1).astype(str) + m["month"].str.slice(4)
        cur = m.assign(prev_month=prev_key)
        j = cur.merge(m.rename(columns={"month": "prev_month",
                                        "cents": "prev_cents"}),
                      on="prev_month", how="inner")
        c = j["cents"].to_numpy(np.int64)
        p = j["prev_cents"].to_numpy(np.int64)
        return pd.DataFrame({
            "month": j["month"].to_numpy(object),
            "revenue_cents": c,
            "prev_year_cents": p,
            "yoy_growth": round_sql((c - p) / p, 6)})

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])
    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))
