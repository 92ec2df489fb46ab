"""Round-3 event-operator additions: as-of join, exact grouped quantiles,
moving window, HLL distinct sketch, anti-join.

Each distributed result is checked against an independent single-process
pandas/numpy reference over the same parquet (the DuckDB oracle comparison
runs separately in test_queries_vs_duckdb.py)."""

import numpy as np
import pandas as pd
import pytest

from agentic_document_extraction_pdf_ray.functions.sketch import (
    HLL_M, _bitlen_u64, hll_estimate, hll_fold, hll_merge)

SF_DIR = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


class TestHLLKernel:
    def test_bitlen_matches_python(self):
        rng = np.random.default_rng(7)
        xs = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
        edges = np.array([0, 1, 2, 3, 2**32 - 1, 2**32, 2**63, 2**64 - 1],
                         dtype=np.uint64)
        for arr in (xs, edges):
            got = _bitlen_u64(arr)
            want = [int(v).bit_length() for v in arr]
            assert got.tolist() == want

    def test_merge_equals_single_pass(self):
        rng = np.random.default_rng(11)
        hashes = rng.integers(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
        single = hll_fold(hashes)
        parts = np.stack([hll_fold(c) for c in np.array_split(hashes, 7)])
        assert np.array_equal(hll_merge(parts), single)

    def test_large_cardinality_error(self):
        n = 200_000
        hashes = pd.util.hash_array(np.arange(n, dtype=np.int64))
        est = hll_estimate(hll_fold(hashes))
        # 1.04/sqrt(4096) ≈ 1.6% standard error; 3σ ≈ 4.9%
        assert abs(est - n) / n < 0.05

    def test_small_range_linear_counting(self):
        hashes = pd.util.hash_array(np.arange(150, dtype=np.int64))
        est = hll_estimate(hll_fold(hashes))
        assert abs(est - 150) / 150 < 0.05

    def test_duplicates_do_not_inflate(self):
        hashes = pd.util.hash_array(np.arange(1000, dtype=np.int64))
        rep = np.tile(hashes, 50)
        assert np.array_equal(hll_fold(rep), hll_fold(hashes))
        assert hll_fold(hashes).size == HLL_M


@pytest.mark.usefixtures("ray_session")
class TestHLLQuery:
    def test_per_type_estimates(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import events_hll_users
        got = events_hll_users(SF_DIR).set_index("event_type")["est_users"]
        exact = _events().groupby("event_type")["user_id"].nunique()
        assert sorted(got.index) == sorted(exact.index)
        for et, n in exact.items():
            assert abs(int(got[et]) - n) / n < 0.05, et


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_matches_bruteforce(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_asof_purchase_click)
        got = (events_asof_purchase_click(SF_DIR).to_pandas()
               .sort_values("event_id").reset_index(drop=True))

        ev = _events()
        p = ev[ev.event_type == "purchase"]
        c = (ev[ev.event_type == "click"]
             .groupby(["user_id", "ts"], as_index=False)
             .agg(event_id=("event_id", "max")))
        rows = []
        for _, r in p.iterrows():                   # O(n²) reference, tiny sf
            cand = c[(c.user_id == r.user_id) & (c.ts <= r.ts)]
            if len(cand):
                best = cand.sort_values(["ts", "event_id"]).iloc[-1]
                c_us = int(np.datetime64(best.ts, "us").astype(np.int64))
                rows.append({"event_id": r.event_id, "user_id": r.user_id,
                             "ts_us": int(np.datetime64(r.ts, "us").astype(np.int64)),
                             "click_id": best.event_id, "click_ts_us": c_us})
        want = (pd.DataFrame(rows).sort_values("event_id")
                .reset_index(drop=True))
        want["gap_us"] = want["ts_us"] - want["click_ts_us"]
        pd.testing.assert_frame_equal(
            got[["event_id", "user_id", "ts_us", "click_id",
                 "click_ts_us", "gap_us"]].astype("int64"),
            want.astype("int64"))

    def test_semantics(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_asof_purchase_click)
        got = events_asof_purchase_click(SF_DIR).to_pandas()
        assert (got["gap_us"] >= 0).all()           # click at-or-before
        assert got["event_id"].is_unique            # one match per purchase


@pytest.mark.usefixtures("ray_session")
class TestGroupedQuantiles:
    def test_histogram_path_equals_order_statistics(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            EVENT_QUANTILES, events_value_quantiles)
        got = events_value_quantiles(SF_DIR)
        ev = _events()
        ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        for et, g in ev.groupby("event_type"):
            vals = np.sort(g["cents"].to_numpy())
            n = len(vals)
            for ql, q in EVENT_QUANTILES:
                pos = (n - 1) * q
                lo = vals[int(np.floor(pos))]
                hi = vals[int(np.ceil(pos))]
                want = float(lo) + (pos - np.floor(pos)) * float(hi - lo)
                row = got[(got.event_type == et) & (got.ql == ql)]
                assert len(row) == 1
                assert row["q_cents"].iloc[0] == want, (et, ql)
                assert int(row["n"].iloc[0]) == n


@pytest.mark.usefixtures("ray_session")
class TestMovingWindow:
    def test_ma7_window_sums(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import events_daily_ma7
        got = events_daily_ma7(SF_DIR)
        ev = _events()
        ev["d"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
                   // 86_400_000_000)
        ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        daily = (ev.groupby(["event_type", "d"], as_index=False)
                 .agg(n_events=("cents", "size"), sum_cents=("cents", "sum")))
        for _, r in got.iterrows():                 # brute-force window
            win = daily[(daily.event_type == r.event_type)
                        & (daily.d.between(r.d - 6, r.d))]
            assert r.w7_sum_cents == win["sum_cents"].sum(), (r.event_type, r.d)
            assert r.w7_days == len(win)
        assert len(got) == len(daily)


@pytest.mark.usefixtures("ray_session")
class TestAntiJoin:
    def test_matches_pandas_reference(self):
        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            customers_without_urgent_orders)
        got = (customers_without_urgent_orders(SF_DIR).to_pandas()
               .sort_values("c_custkey").reset_index(drop=True))
        cust = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        orders = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                                 columns=["o_custkey", "o_orderpriority"])
        urgent = set(orders.loc[
            orders.o_orderpriority.str.startswith("1"), "o_custkey"])
        want = (cust[~cust.c_custkey.isin(urgent)]
                .sort_values("c_custkey").reset_index(drop=True))
        assert len(got) > 0                          # non-degenerate fixture
        pd.testing.assert_frame_equal(
            got.astype({"c_custkey": "int64"}),
            want.astype({"c_custkey": "int64"}))


@pytest.mark.usefixtures("ray_session")
class TestTDigest:
    def test_rank_error_bounded(self):
        """Estimated quantiles must sit within ±2% rank of the exact
        order statistics, per event type."""
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_value_tdigest)
        got = events_value_tdigest(SF_DIR).set_index("event_type")
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                             columns=["event_type", "value"])
        for et, g in ev.groupby("event_type"):
            v = np.sort(g["value"].to_numpy(np.float64))
            for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
                lo = np.quantile(v, max(q - 0.02, 0.0))
                hi = np.quantile(v, min(q + 0.02, 1.0))
                assert lo <= got.loc[et, col] <= hi, (et, col)

    def test_merge_permutation_invariant(self):
        from agentic_document_extraction_pdf_ray.functions.sketch import (
            tdigest_build, tdigest_merge, tdigest_quantile)
        rng = np.random.default_rng(7)
        blocks = [rng.lognormal(0, 1, 3000) for _ in range(8)]
        digs = [tdigest_build(b) for b in blocks]
        a = tdigest_merge(digs)
        b = tdigest_merge(digs[::-1])
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        # merged digest ~ single-pass digest of the full stream (rank err)
        full = np.sort(np.concatenate(blocks))
        est = tdigest_quantile(*a, [0.5, 0.99])
        for e, q in zip(est, (0.5, 0.99)):
            assert np.quantile(full, q - 0.02) <= e <= np.quantile(
                full, min(q + 0.02, 1.0))

    def test_weight_conservation(self):
        from agentic_document_extraction_pdf_ray.functions.sketch import (
            tdigest_build, tdigest_merge, TDIGEST_DELTA)
        rng = np.random.default_rng(3)
        v = rng.normal(size=10_000)
        m, w = tdigest_build(v)
        assert w.sum() == pytest.approx(10_000)
        assert len(m) <= 2 * TDIGEST_DELTA
        m2, w2 = tdigest_merge([(m, w), (m, w)])
        assert w2.sum() == pytest.approx(20_000)


@pytest.mark.usefixtures("ray_session")
class TestInterarrival:
    def test_matches_bruteforce(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_interarrival)
        got = (events_interarrival(SF_DIR).to_pandas()
               .sort_values("user_id").reset_index(drop=True))

        ev = _events().sort_values(["user_id", "ts", "event_id"])
        rows = []
        for uid, g in ev.groupby("user_id"):
            if len(g) < 2:
                continue
            ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            gap = np.diff(ts)
            rows.append({"user_id": uid, "n_events": len(g),
                         "max_gap_us": int(gap.max()),
                         "mean_gap_us": gap.sum() / len(gap)})
        want = (pd.DataFrame(rows).sort_values("user_id")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["user_id", "n_events", "max_gap_us", "mean_gap_us"]],
            want, check_dtype=False)

    def test_single_event_users_excluded(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_interarrival)
        got = events_interarrival(SF_DIR).to_pandas()
        assert (got["n_events"] >= 2).all()
        assert (got["max_gap_us"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
class TestFunnel:
    def test_matches_bruteforce(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_funnel)
        got = (events_funnel(SF_DIR).to_pandas()
               .set_index("step")["n_users"])

        ev = _events()
        nv = nc = npur = 0
        for _, g in ev.groupby("user_id"):
            views = g[g.event_type == "view"]["ts"]
            if not len(views):
                continue
            nv += 1
            t1 = views.min()
            clicks = g[(g.event_type == "click") & (g.ts > t1)]["ts"]
            if not len(clicks):
                continue
            nc += 1
            t2 = clicks.min()
            if ((g.event_type == "purchase") & (g.ts > t2)).any():
                npur += 1
        assert got["view"] == nv
        assert got["click_after_view"] == nc
        assert got["purchase_after_click"] == npur
        assert nv >= nc >= npur and nv > 0


@pytest.mark.usefixtures("ray_session")
class TestRetention:
    def test_designed_cohorts(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_retention)
        ts = pa.array(np.array(
            ["2020-01-01", "2020-01-03",   # u1 cohort 01-01, weeks 0,0
             "2020-01-09",                 # u1 week 1
             "2020-01-01",                 # u2 cohort 01-01, week 0
             "2020-01-02", "2020-01-20"],  # u3 cohort 01-02, weeks 0,2
            dtype="datetime64[us]"))
        tbl = pa.table({
            "event_id": pa.array(range(6), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            "event_type": pa.array(["view"] * 6, pa.string()),
            "value": pa.array([0.0] * 6, pa.float64()),
            "props": pa.array(["{}"] * 6, pa.string()),
        })
        d = tmp_path / "ret"
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"))
        out = (events_retention(str(d)).to_pandas()
               .set_index(["cohort_day", "week_offset"])["n_users"]
               .to_dict())
        assert out == {("2020-01-01", 0): 2, ("2020-01-01", 1): 1,
                       ("2020-01-02", 0): 1, ("2020-01-02", 2): 1}


class TestMisraGries:
    def test_fold_guarantee_and_bound(self):
        """Any key with freq > n/(k+1) survives; undercount <= n/(k+1)."""
        from agentic_document_extraction_pdf_ray.functions.sketch import (
            mg_fold)
        rng = np.random.RandomState(3)
        keys = rng.randint(0, 1000, size=20_000)
        keys[:6000] = 7       # one heavy key: 30% of the stream
        u, c = np.unique(keys, return_counts=True)
        k = 16
        summ = mg_fold(u, c.astype(np.int64), k)
        n = len(keys)
        assert 7 in summ
        exact = dict(zip(u.tolist(), c.tolist()))
        for key, kept in summ.items():
            assert 0 < kept <= exact[key]
            assert exact[key] - kept <= n // (k + 1) + 1
        assert len(summ) <= k

    def test_merge_equals_whole_stream_bound(self):
        from agentic_document_extraction_pdf_ray.functions.sketch import (
            mg_fold, mg_merge)
        rng = np.random.RandomState(4)
        a = rng.randint(0, 50, 5000)
        b = rng.randint(0, 50, 5000)
        a[:2000] = 9
        b[:2000] = 9
        k = 8

        def fold(arr):
            u, c = np.unique(arr, return_counts=True)
            return mg_fold(u, c.astype(np.int64), k)

        merged = mg_merge([fold(a), fold(b)], k)
        whole = np.concatenate([a, b])
        u, c = np.unique(whole, return_counts=True)
        exact = dict(zip(u.tolist(), c.tolist()))
        n = len(whole)
        assert 9 in merged                       # 40% of the stream
        for key, kept in merged.items():
            assert kept <= exact[key]
            assert exact[key] - kept <= 2 * (n // (k + 1) + 1)


@pytest.mark.usefixtures("ray_session")
class TestHeavyHittersQuery:
    def test_guarantee_on_events(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_heavy_hitters)
        k = 16
        got = events_heavy_hitters(SF_DIR, k=k)
        ev = _events()
        exact = ev.groupby("user_id").size()
        n = len(ev)
        heavy = exact[exact > n / (k + 1)]
        assert set(heavy.index) <= set(got["user_id"])
        for _, r in got.iterrows():
            assert r["min_count"] <= exact[r["user_id"]]


@pytest.mark.usefixtures("ray_session")
class TestAnomalyDays:
    def test_matches_bruteforce(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_anomaly_days)
        got = (events_anomaly_days(SF_DIR)
               .sort_values(["event_type", "d"]).reset_index(drop=True))

        ev = _events()
        days = (ev["ts"] - pd.Timestamp("1970-01-01")).dt.total_seconds()
        ev = ev.assign(d=np.floor(days.to_numpy() / 86400.0).astype(np.int64))
        daily = ev.groupby(["event_type", "d"]).size().reset_index(name="n")
        rows = []
        for (et, d), n in daily.set_index(["event_type", "d"])["n"].items():
            w = daily[(daily.event_type == et) & (daily.d >= d - 7)
                      & (daily.d <= d - 1)]["n"].to_numpy(np.float64)
            if len(w) < 4:
                continue
            var = ((w * w).sum() - w.sum() ** 2 / len(w)) / len(w)
            if var <= 0:
                continue
            rows.append({"event_type": et, "d": d, "n_events": n,
                         "w_days": len(w),
                         "z": round((n - w.sum() / len(w)) / np.sqrt(var), 6)})
        want = (pd.DataFrame(rows).sort_values(["event_type", "d"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestEventsUserRfm:
    def test_rfm_semantics(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import events_user_rfm
        got = events_user_rfm(SF_DIR).to_pandas()
        assert got["user_id"].is_unique
        for c in ("r_score", "f_score", "m_score"):
            assert got[c].between(1, 4).all()
        assert (got["rfm"] == got["r_score"] * 100 + got["f_score"] * 10
                + got["m_score"]).all()
        # the most recently active user(s) score r=4; recency_days==0
        # exists by construction (someone owns the corpus max ts)
        newest = got[got["recency_days"] == got["recency_days"].min()]
        assert (newest["r_score"] == 4).all()
        assert got["recency_days"].min() == 0
        # monotonicity: higher frequency can never LOWER f_score
        srt = got.sort_values("frequency")
        assert (srt["f_score"].diff().dropna() >= 0).all()

    def test_quartiles_balanced_on_distinct_values(self, tmp_path):
        """With all-distinct metric values the four buckets differ by
        at most 1 user (ceil boundaries)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.events import events_user_rfm
        n = 103
        rows = []
        base = np.datetime64("2024-01-01T00:00:00", "us")
        for u in range(n):
            for k in range(u + 1):            # frequency u+1, all distinct
                rows.append((len(rows), base + np.timedelta64(u, "D"),
                             u, "click", float(u + 1)))
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = events_user_rfm(str(tmp_path)).to_pandas()
        counts = got["f_score"].value_counts()
        assert counts.max() - counts.min() <= 1


@pytest.mark.usefixtures("ray_session")
class TestEventsFunnelLatency:
    def test_matches_brute(self):
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_funnel_latency,
        )
        got = (events_funnel_latency(SF_DIR)
               .set_index("transition").sort_index())
        ev = pq.read_table(f"{SF_DIR}/events.parquet",
                           columns=["user_id", "ts", "event_type"]
                           ).to_pandas()
        ev["ts_us"] = ev["ts"].astype("int64")
        lat = {"view_to_click": [], "click_to_purchase": []}
        for _, g in ev.groupby("user_id"):
            v = g[g["event_type"] == "view"]["ts_us"]
            if v.empty:
                continue
            t1 = v.min()
            c = g[(g["event_type"] == "click") & (g["ts_us"] > t1)]["ts_us"]
            if c.empty:
                continue
            t2 = c.min()
            lat["view_to_click"].append((t2 - t1) // 1_000_000)
            p = g[(g["event_type"] == "purchase")
                  & (g["ts_us"] > t2)]["ts_us"]
            if p.empty:
                continue
            t3 = p.min()
            lat["click_to_purchase"].append((t3 - t2) // 1_000_000)
        for name, secs in lat.items():
            secs = sorted(secs)
            n = len(secs)
            p50 = secs[(50 * n + 99) // 100 - 1]
            row = got.loc[name]
            assert int(row["n_users"]) == n
            assert int(row["p50_sec"]) == p50
            assert row["mean_sec"] == round(sum(secs) / n, 6)


@pytest.mark.usefixtures("ray_session")
class TestEventsAbLift:
    def test_lift_semantics(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.events import events_ab_lift
        # variant 0 (even users): 1 of 2 converts; variant 1: 2 of 2
        rows = [(0, "view"), (0, "purchase"), (2, "view"),
                (1, "purchase"), (3, "click"), (3, "purchase")]
        base = np.datetime64("2024-01-01T00:00:00", "us")
        t = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([base + np.timedelta64(i, "m")
                            for i in range(len(rows))], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = (events_ab_lift(str(tmp_path))
               .set_index("variant").sort_index())
        assert int(got.loc[0, "n_users"]) == 2
        assert int(got.loc[0, "n_converted"]) == 1
        assert got.loc[0, "conv_rate"] == 0.5
        assert int(got.loc[1, "n_converted"]) == 2
        assert got.loc[1, "conv_rate"] == 1.0
        assert (got["z_score"] > 0).all()        # variant 1 wins
        assert got["z_score"].nunique() == 1


@pytest.mark.usefixtures("ray_session")
class TestEventsUserFano:
    def test_designed_dispersion(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_user_fano,
        )
        # user 1: metronome — 2 events on each of 3 days (var 0, fano 0)
        # user 2: bursty — counts 1 and 5 over 2 days:
        #   mean 3, pop var ((1-3)^2+(5-3)^2)/2 = 4, fano 4/3
        ts = (["2026-01-01 01:00", "2026-01-01 02:00",
               "2026-01-02 01:00", "2026-01-02 02:00",
               "2026-01-03 01:00", "2026-01-03 02:00"]
              + ["2026-01-01 01:00"]
              + [f"2026-01-02 0{h}:00" for h in range(1, 6)])
        uid = [1] * 6 + [2] * 6
        tbl = pa.table({
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["click"] * len(ts), pa.string()),
            "value": pa.array([1.0] * len(ts), pa.float64()),
            "props": pa.array(["{}"] * len(ts), pa.string())})
        d = tmp_path / "fano"
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"))
        out = (events_user_fano(str(d)).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert out["n_days"].tolist() == [3, 2]
        assert out["n_events"].tolist() == [6, 6]
        assert out["fano"].tolist() == [0.0, round(4 / 3, 6)]
