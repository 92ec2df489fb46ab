"""Property-based tests (hypothesis) for core invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_document_extraction_pdf_ray.functions.extract import extract_turn
from agentic_document_extraction_pdf_ray.functions.text import (
    clean_text, levenshtein_distance, normalize_whitespace, similarity_ratio,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


class TestTextProperties:
    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_clean_idempotent(self, s):
        assert clean_text(clean_text(s)) == clean_text(s)

    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_normalize_ws_idempotent_and_single_spaced(self, s):
        n = normalize_whitespace(s)
        assert normalize_whitespace(n) == n
        assert "  " not in n and not n.startswith(" ") and not n.endswith(" ")

    @given(st.text(max_size=60), st.text(max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_levenshtein_symmetric_and_bounded(self, a, b):
        d = levenshtein_distance(a, b)
        assert d == levenshtein_distance(b, a)
        assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))

    @given(st.text(max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_similarity_self_is_one(self, a):
        assert similarity_ratio(a, a) == 1.0


class TestExtractProperties:
    @given(text_strategy, st.sampled_from(["user", "assistant", "system", "tool"]))
    @settings(max_examples=150, deadline=None)
    def test_extract_total_and_deterministic(self, s, role):
        r1 = extract_turn(s, role)
        r2 = extract_turn(s, role)
        assert r1 == r2
        assert 0.0 <= r1["confidence"] <= 1.0
        assert r1["n_kept"] <= r1["n_blocks"]

    @given(text_strategy)
    @settings(max_examples=150, deadline=None)
    def test_spans_index_into_cleaned(self, s):
        r = extract_turn(s, "user")
        cleaned = clean_text(s)
        prev_end = -1
        for sp in r["spans"]:
            assert 0 <= sp["start"] <= sp["end"] <= len(cleaned)
            assert sp["start"] >= prev_end, "spans must be ordered, non-overlapping"
            prev_end = sp["end"]

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_flags_sorted_unique(self, s):
        flags = extract_turn(s, "user")["flags"]
        assert flags == sorted(set(flags))


class TestRulesProperties:
    @given(
        st.sampled_from(["EQUALS", "NOT_EQUALS", "GT", "LT", "GE", "LE",
                         "DATE_BEFORE", "DATE_AFTER", "REQUIRES",
                         "REQUIRES_IF", "SUM_EQUALS", "BOGUS"]),
        st.dictionaries(st.sampled_from(["a", "b", "c"]),
                        st.text(max_size=20), max_size=3),
    )
    @settings(max_examples=200, deadline=None)
    def test_evaluate_rule_total(self, op, fields):
        from agentic_document_extraction_pdf_ray.functions.rules import (
            FAILED, INCONCLUSIVE, PASSED, SKIPPED, Rule, evaluate_rule,
        )
        r = Rule("fuzz", op, ("a", "b", "c"))
        res = evaluate_rule(r, fields)
        assert res.status in (PASSED, FAILED, SKIPPED, INCONCLUSIVE)

    @given(st.text(max_size=200))
    @settings(max_examples=150, deadline=None)
    def test_repair_json_total_and_idempotent(self, s):
        from agentic_document_extraction_pdf_ray.functions.json_repair import repair_json
        once = repair_json(s)
        assert repair_json(once) == once


class TestRound2Properties:
    @given(text_strategy)
    @settings(max_examples=150, deadline=None)
    def test_html_extraction_total_and_subset(self, s):
        from agentic_document_extraction_pdf_ray.functions.html_extract import (
            html_main_text, parse_dom_nodes,
        )
        nodes = parse_dom_nodes(s)          # never raises
        text = html_main_text(s)
        assert isinstance(text, str)
        kept = [n for n in nodes if n.kept]
        for n in kept:
            assert 0.0 <= n.link_density <= 1.0

    @given(text_strategy)
    @settings(max_examples=150, deadline=None)
    def test_table_parser_total(self, s):
        from agentic_document_extraction_pdf_ray.functions.tables import (
            extract_table_regions, parse_pipe_table,
        )
        t = parse_pipe_table(s)             # never raises
        if t is not None:
            assert t.n_cols >= 2
            for row in t.rows:
                assert len(row) == t.n_cols
        for reg in extract_table_regions(s):
            assert 0 <= reg.start <= reg.end <= len(s)

    @given(st.floats(allow_nan=False, allow_infinity=False, width=32),
           st.floats(allow_nan=False, allow_infinity=False, width=32),
           st.lists(st.sampled_from(["fax", "handwritten", "visual",
                                     "printed", "junk"]), max_size=4))
    @settings(max_examples=200, deadline=None)
    def test_combine_confidence_bounded(self, dual, critic, mods):
        from agentic_document_extraction_pdf_ray.functions.confidence import (
            combine_confidence,
        )
        r = combine_confidence(dual, critic, mods)
        assert 0.0 <= r["raw_combined"] <= 1.0
        assert 0.0 <= r["dual_pass"] <= 1.0
        assert 0.0 <= r["critic"] <= 1.0
        assert 0.0 <= r["modality_penalty"] <= 1.0

    @given(st.lists(st.lists(st.sampled_from("abcdef"), min_size=1,
                             max_size=4, unique=True),
                    min_size=1, max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_schema_versions_monotone(self, field_sets):
        from agentic_document_extraction_pdf_ray.state.schemas import (
            FieldBuilder, SchemaBuilder, SchemaVersionManager,
        )
        m = SchemaVersionManager()
        seen = []
        for fs in field_sets:
            b = SchemaBuilder("p")
            for name in fs:
                b.field(FieldBuilder(name))
            v = m.register_version(b.build())
            seen.append(tuple(int(x) for x in v.version.split(".")))
        # versions never decrease; consecutive versions always differ
        # (re-registering an OLD schema later legitimately re-versions it)
        hist = m.get_history("p")
        versions = [tuple(int(x) for x in h.version.split(".")) for h in hist]
        assert versions == sorted(versions)
        assert len(set(versions)) == len(versions)
        for a, b in zip(hist, hist[1:]):
            assert a.content_hash != b.content_hash


class TestPayloadKindSqlParity:
    """The batch payload-kind classifier IS the SQL mirror's semantics:
    for arbitrary ASCII payloads, the Arrow/RE2 ladder must agree with
    the _KIND_CASE fragment the conv_modalities / critic_combined
    oracles embed — evaluated through DuckDB itself."""

    _ALPHABET = st.sampled_from(list(
        "ab|*-•~{}ISA0123456789.) \t\n\r"))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_ALPHABET, max_size=40).map("".join))
    def test_batch_matches_duckdb_kind_case(self, s):
        import duckdb

        import __ray_entry__ as e
        from agentic_document_extraction_pdf_ray.functions.modality import (
            detect_payload_kind_batch,
        )
        con = duckdb.connect()
        sql = (f"WITH c0 AS (SELECT ? AS text), "
               f"c1 AS (SELECT text, trim(text, ' \t\n\r') AS t FROM c0) "
               f"SELECT {e._KIND_CASE} FROM c1")
        want = con.execute(sql, [s]).fetchone()[0]
        got = detect_payload_kind_batch([s])[0]
        assert got == want, repr(s)


class TestSkylineProperties:
    """skyline_mask (doc_pareto_front kernel) vs the O(n²) dominance
    definition, plus the split-merge soundness the distributed plan
    relies on (local skyline of any partition ⊇ its global survivors)."""

    @staticmethod
    def _brute(q, t):
        import numpy as np
        q = np.asarray(q, np.int64)
        t = np.asarray(t, np.int64)
        keep = []
        for i in range(len(q)):
            dom = ((q >= q[i]) & (t >= t[i])
                   & ((q > q[i]) | (t > t[i]))).any()
            keep.append(not dom)
        return np.array(keep, bool)

    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_matches_brute_force(self, pts):
        import numpy as np

        from agentic_document_extraction_pdf_ray.pipelines.documents import skyline_mask
        q = np.array([p[0] for p in pts], np.int64)
        t = np.array([p[1] for p in pts], np.int64)
        assert (skyline_mask(q, t) == self._brute(q, t)).all()

    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                    min_size=1, max_size=120),
           st.integers(1, 119))
    @settings(max_examples=100, deadline=None)
    def test_split_merge_equals_global(self, pts, cut):
        import numpy as np

        from agentic_document_extraction_pdf_ray.pipelines.documents import skyline_mask
        q = np.array([p[0] for p in pts], np.int64)
        t = np.array([p[1] for p in pts], np.int64)
        cut = min(cut, len(q))
        # local skylines per partition, then skyline of the union of
        # survivors == skyline of the whole set (as multisets of points)
        ka, kb = skyline_mask(q[:cut], t[:cut]), skyline_mask(q[cut:], t[cut:])
        cq = np.r_[q[:cut][ka], q[cut:][kb]]
        ct = np.r_[t[:cut][ka], t[cut:][kb]]
        km = skyline_mask(cq, ct)
        got = sorted(zip(cq[km], ct[km]))
        kg = skyline_mask(q, t)
        want = sorted(zip(q[kg], t[kg]))
        assert got == want


class TestRound3WindowProperties:
    """Distributed-soundness properties for the round-3 window/combiner
    operators: the contribution-expansion rolling distinct count equals
    the brute-force window definition, and the first/last partial
    combiner is associative under arbitrary block splits."""

    @given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 14)),
                    max_size=80))
    @settings(max_examples=150, deadline=None)
    def test_rolling_distinct_expansion_equals_bruteforce(self, pts):
        # pts: (user, day) events; window = 7 days ending on w
        import numpy as np
        import pandas as pd
        if not pts:
            return
        df = pd.DataFrame(pts, columns=["user", "day"]).drop_duplicates()
        # engine formulation: expand each active day to windows d..d+6,
        # dedup (user, window), count per window
        users = np.repeat(df["user"].to_numpy(np.int64), 7)
        w = (np.repeat(df["day"].to_numpy(np.int64), 7)
             + np.tile(np.arange(7, dtype=np.int64), len(df)))
        got = (pd.DataFrame({"user": users, "w": w}).drop_duplicates()
               .groupby("w").size().to_dict())
        # brute force: for each window day, count distinct users active
        # in [w-6, w]
        for wd in range(int(df["day"].min()),
                        int(df["day"].max()) + 7):
            active = df[(df["day"] >= wd - 6) & (df["day"] <= wd)]
            n = active["user"].nunique()
            if n:
                assert got.get(wd, 0) == n
            else:
                assert wd not in got

    @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                              st.integers(0, 9),
                              st.sampled_from(["a", "b", "c"])),
                    min_size=1, max_size=60),
           st.integers(1, 59))
    @settings(max_examples=150, deadline=None)
    def test_first_last_combiner_associative(self, rows, cut):
        # rows: (user, ts, event_id, type). Combining per-block partials
        # (first/last by (ts, eid) + count) must equal the global answer
        # regardless of the split point.
        import pandas as pd

        def partial(df):
            b = df.sort_values(["user", "ts", "eid"])
            return b.groupby("user", as_index=False).agg(
                f_ts=("ts", "first"), f_eid=("eid", "first"),
                first_type=("typ", "first"),
                l_ts=("ts", "last"), l_eid=("eid", "last"),
                last_type=("typ", "last"), n=("eid", "size"))

        def combine(parts):
            g = pd.concat(parts, ignore_index=True)
            f = (g.sort_values(["user", "f_ts", "f_eid"])
                 .groupby("user", as_index=False)
                 .agg(first_type=("first_type", "first")))
            l = (g.sort_values(["user", "l_ts", "l_eid"])
                 .groupby("user", as_index=False)
                 .agg(last_type=("last_type", "last")))
            n = g.groupby("user", as_index=False)["n"].sum()
            return f.merge(l, on="user").merge(n, on="user")

        df = pd.DataFrame(rows, columns=["user", "ts", "eid", "typ"])
        # event ids must be unique for a deterministic order
        df["eid"] = range(len(df))
        cut = min(cut, len(df))
        split = combine([partial(df.iloc[:cut]), partial(df.iloc[cut:])]) \
            if cut < len(df) else combine([partial(df)])
        whole = combine([partial(df)])
        pd.testing.assert_frame_equal(
            split.sort_values("user").reset_index(drop=True),
            whole.sort_values("user").reset_index(drop=True))
