"""Brute-force property tests for the round-5 closing operators
(blocklist filter, vocab overlap, Zipf slope, co-occurrence, contamination
matrix, curriculum order, cosine pairs, prefix containment, tool stats,
bot screen, confusion matrix) — each distributed plan is compared against
a direct single-process computation at sf0.001, independent of the DuckDB
oracle (which tests/test_queries_vs_duckdb.py already enforces)."""

import collections
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _clean(s: str) -> str:
    return re.sub(r"\s+", " ", s or "").strip()


def _toks(s: str) -> list[str]:
    t = _clean(s).lower().split(" ")
    return [x for x in t if x]


@pytest.mark.usefixtures("ray_session")
class TestCurriculumOrder:
    def test_positions_are_a_permutation_in_band_hash_order(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_curriculum_order,
        )
        out = doc_curriculum_order(SF).to_pandas()
        n = len(out)
        assert sorted(out["curriculum_pos"]) == list(range(1, n + 1))
        s = out.sort_values("curriculum_pos")
        key = list(zip(-s["band"].to_numpy(), s["shuffle_key"],
                       s["doc_id"].to_numpy()))
        assert key == sorted(key)


@pytest.mark.usefixtures("ray_session")
class TestPrefixContainment:
    def test_matches_brute_force(self):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_prefix_containment,
        )
        docs = _docs()
        texts = {int(r.doc_id): _clean(r.text)
                 for r in docs.itertuples()}
        brute = set()
        eligible = {d: t for d, t in texts.items()
                    if len([x for x in t.split(" ") if x]) >= 8}
        for a, ta in eligible.items():
            for b, tb in texts.items():
                if len(tb) > len(ta) and tb.startswith(ta + " "):
                    brute.add((a, b))
        out = doc_prefix_containment(SF).to_pandas()
        got = set(zip(out["contained"].astype(int),
                      out["container"].astype(int)))
        assert got == brute       # blocking is lossless at this scale


@pytest.mark.usefixtures("ray_session")
class TestCountCosinePairs:
    def test_matches_brute_force(self):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_count_cosine_pairs,
        )
        docs = _docs()
        tf = {int(r.doc_id): collections.Counter(_toks(r.text))
              for r in docs.itertuples()}
        n2 = {d: sum(v * v for v in c.values()) for d, c in tf.items()}
        ids = sorted(tf)
        brute = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                small, big = (tf[a], tf[b]) if len(tf[a]) < len(tf[b]) \
                    else (tf[b], tf[a])
                dot = sum(v * big.get(k, 0) for k, v in small.items())
                if dot and dot / np.sqrt(float(n2[a] * n2[b])) >= 0.99:
                    brute[(a, b)] = dot
        out = doc_count_cosine_pairs(SF).to_pandas()
        got = {(int(r.doc_a), int(r.doc_b)): int(r.dot)
               for r in out.itertuples()}
        assert got == brute       # df cap (1000) is inactive at 500 docs


@pytest.mark.usefixtures("ray_session")
class TestVocabOverlapAndZipf:
    def test_vocab_overlap_matches_sets(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            source_vocab_overlap,
        )
        docs = _docs()
        vocab: dict[str, set] = collections.defaultdict(set)
        for r in docs.itertuples():
            vocab[r.source].update(_toks(r.text))
        out = source_vocab_overlap(SF)
        for r in out.itertuples():
            va, vb = vocab[r.source_a], vocab[r.source_b]
            assert r.n_common == len(va & vb)
            assert r.n_a == len(va) and r.n_b == len(vb)
            assert r.jaccard == round(len(va & vb) / len(va | vb), 6)
        srcs = sorted(vocab)
        expected_pairs = {(a, b) for i, a in enumerate(srcs)
                          for b in srcs[i + 1:]
                          if vocab[a] & vocab[b]}
        assert set(zip(out["source_a"], out["source_b"])) == expected_pairs

    def test_zipf_slope_matches_direct_ols(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            lang_zipf_slope,
        )
        docs = _docs()
        out = lang_zipf_slope(SF).set_index("lang")
        for lang, g in docs.groupby("lang"):
            cnt = collections.Counter(
                t for txt in g["text"] for t in _toks(txt))
            top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
            y = np.log([n for _, n in top])
            x = np.log(np.arange(1, len(top) + 1))
            xc, yc = x - x.mean(), y - y.mean()
            assert out.loc[lang, "slope"] == round((xc @ yc) / (xc @ xc), 6)
            assert out.loc[lang, "n_terms"] == len(top)


@pytest.mark.usefixtures("ray_session")
class TestCooccurrenceAndBlocklist:
    def test_cooccurrence_matches_counter(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            token_cooccurrence,
        )
        docs = _docs()
        brute: collections.Counter = collections.Counter()
        for txt in docs["text"]:
            t = _toks(txt)
            for d in (1, 2):
                for i in range(len(t) - d):
                    a, b = sorted((t[i], t[i + d]))
                    brute[(a, b)] += 1
        out = token_cooccurrence(SF).to_pandas()
        got = {(r.tok_a, r.tok_b): int(r.n_cooccur)
               for r in out.itertuples()}
        assert got == dict(brute)

    def test_blocklist_matches_direct(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            BLOCKLIST_TOKENS, doc_blocklist_filter,
        )
        docs = _docs()
        out = doc_blocklist_filter(SF).to_pandas().set_index("doc_id")
        bl = set(BLOCKLIST_TOKENS)
        for r in docs.itertuples():
            t = _toks(r.text)
            if not t:
                assert int(r.doc_id) not in out.index
                continue
            row = out.loc[int(r.doc_id)]
            hits = sum(1 for x in t if x in bl)
            assert row["n_tokens"] == len(t)
            assert row["n_flagged"] == hits
            assert row["keep"] == (round(hits / len(t), 6) <= 0.1)


@pytest.mark.usefixtures("ray_session")
class TestContaminationMatrix:
    def test_coheres_with_per_doc_decontaminate(self):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_decontaminate, source_contamination_matrix,
        )
        docs = _docs()
        per_doc = doc_decontaminate(SF).to_pandas()
        mat = source_contamination_matrix(SF).to_pandas()
        src_of = dict(zip(docs["doc_id"].astype(int), docs["source"]))
        by_src = collections.Counter(
            src_of[int(d)] for d in per_doc["doc_id"])
        ov_by_src: collections.Counter = collections.Counter()
        for r in per_doc.itertuples():
            ov_by_src[src_of[int(r.doc_id)]] += int(r.n_overlap)
        train_by_src = collections.Counter(
            r.source for r in docs.itertuples() if int(r.doc_id) % 7 != 0)
        assert set(mat["source"]) == set(train_by_src)
        for r in mat.itertuples():
            assert r.n_train == train_by_src[r.source]
            assert r.n_contaminated == by_src.get(r.source, 0)
            assert r.total_overlap == ov_by_src.get(r.source, 0)
            assert r.n_contaminated <= r.n_train


@pytest.mark.usefixtures("ray_session")
class TestToolBotConfusion:
    def test_tool_stats_match_pandas(self, tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_tool_stats,
        )
        t = pq.read_table(tiny_transcripts).to_pandas()
        out = conv_tool_stats(tiny_transcripts).to_pandas() \
            .set_index("conv_id")
        assert len(out) == t["conv_id"].nunique()
        for conv, g in t.groupby("conv_id"):
            row = out.loc[conv]
            calls = g[g["tool"].fillna("") != ""]
            assert row["n_turns"] == len(g)
            assert row["n_tool_calls"] == len(calls)
            assert row["n_tools"] == calls["tool"].nunique()
            if len(calls):
                cnt = calls["tool"].value_counts()
                best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                assert row["top_tool"] == best[0]
            else:
                assert row["top_tool"] == ""

    def test_bot_users_match_pandas(self):
        from agentic_document_extraction_pdf_ray.pipelines.events import (
            BOT_CV_THRESHOLD, BOT_MIN_GAPS, events_bot_users,
        )
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        out = events_bot_users(SF).to_pandas().set_index("user_id")
        ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        n_checked = 0
        for uid, g in ev.groupby("user_id"):
            gaps = np.diff(g["ts"].to_numpy()
                           .astype("datetime64[us]").astype(np.int64))
            if len(gaps) < BOT_MIN_GAPS:
                assert uid not in out.index
                continue
            n, sg = len(gaps), int(gaps.sum())
            sg2 = sum(int(x) * int(x) for x in gaps)
            cv = np.sqrt(float(n * sg2 - sg * sg)) / float(sg)
            row = out.loc[uid]
            assert row["n_gaps"] == n and row["sum_gap_us"] == sg
            assert row["cv"] == round(cv, 6)
            assert row["is_regular"] == (cv < BOT_CV_THRESHOLD)
            n_checked += 1
        assert n_checked == len(out)

    def test_confusion_rows_sum_to_one(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            lang_confusion_matrix,
        )
        out = lang_confusion_matrix(SF)
        docs = _docs()
        assert out["n"].sum() == len(docs)
        for _, g in out.groupby("lang"):
            assert abs(g["row_share"].sum() - 1.0) < 1e-5


@pytest.mark.usefixtures("ray_session")
class TestSoftDedupAndDimVariance:
    def test_softdedup_weights_cohere_with_components(self):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_dup_components, doc_softdedup_weights,
        )
        comp = doc_dup_components(SF).to_pandas()
        out = doc_softdedup_weights(SF).to_pandas()
        assert len(out) == len(_docs())
        sizes = comp.groupby("cluster_id").size()
        by_doc = dict(zip(comp["doc_id"].astype(int),
                          comp["cluster_id"].astype(int)))
        for r in out.itertuples():
            cid = by_doc.get(int(r.doc_id))
            if cid is None:
                assert r.family_size == 1 and r.soft_weight == 1.0
                assert r.canonical_id == r.doc_id
            else:
                assert r.canonical_id == cid
                assert r.family_size == sizes[cid]
                assert r.soft_weight == round(1.0 / sizes[cid], 6)
        # each family's weights sum to ~1: the SoftDeDup invariant
        fam = out.groupby("canonical_id")["soft_weight"].sum()
        assert np.allclose(fam.to_numpy(), 1.0, atol=1e-4)

    def test_dim_variance_matches_numpy(self):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_dim_variance,
        )
        emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        mat = np.stack(emb["embedding"].to_numpy())
        q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        out = embedding_dim_variance(SF)
        assert len(out) == q.shape[1]
        for r in out.itertuples():
            col = q[:, int(r.dim)]
            n, sq = len(col), int(col.sum())
            sq2 = sum(int(x) * int(x) for x in col)
            assert r.n == n and r.q_sum == sq
            assert r.mean_q == round(float(sq) / float(n), 6)
            assert r.var_q == round(
                float(n * sq2 - sq * sq) / (float(n) * float(n)), 6)


@pytest.mark.usefixtures("ray_session")
class TestReviewRegressionPins:
    def _write_docs(self, tmp_path, texts):
        import pyarrow as pa
        df = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        })
        pq.write_table(df, f"{tmp_path}/documents.parquet")
        return str(tmp_path)

    def test_cooccurrence_survives_all_empty_batch(self, tmp_path):
        # untyped empty partial frames used to break schema unification
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            token_cooccurrence,
        )
        d = self._write_docs(tmp_path, ["", "   ", "x"])
        assert token_cooccurrence(d).count() == 0

    def test_cosine_norm_product_beyond_int64(self, tmp_path):
        # n2_a * n2_b > 2^63 used to wrap to a negative under int64,
        # silently dropping the pair the HUGEINT oracle emits
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_count_cosine_pairs,
        )
        big = "tok " * 60_000            # n2 = 3.6e9; product = 1.3e19
        d = self._write_docs(tmp_path, [big, big + "tok"])
        out = doc_count_cosine_pairs(d).to_pandas()
        assert len(out) == 1
        assert out["cosine"].iloc[0] == 1.0


@pytest.mark.usefixtures("ray_session")
class TestTranscriptAnalyticsAndNormOutliers:
    def test_response_latency_matches_pandas(self, tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_response_latency,
        )
        t = pq.read_table(tiny_transcripts).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        out = conv_response_latency(tiny_transcripts).to_pandas() \
            .set_index("conv_id")
        n_with = 0
        for conv, g in t.groupby("conv_id"):
            ts = g["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            role = g["role"].to_numpy(object)
            lats = [ts[i + 1] - ts[i] for i in range(len(g) - 1)
                    if role[i] == "user" and role[i + 1] == "assistant"]
            if not lats:
                assert conv not in out.index
                continue
            row = out.loc[conv]
            assert row["n_responses"] == len(lats)
            assert row["sum_latency_us"] == sum(lats)
            assert row["max_latency_us"] == max(lats)
            n_with += 1
        assert n_with == len(out)

    def test_role_alternation_matches_pandas(self, tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_role_alternation,
        )
        t = pq.read_table(tiny_transcripts).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        out = conv_role_alternation(tiny_transcripts).to_pandas() \
            .set_index("conv_id")
        assert len(out) == t["conv_id"].nunique()
        for conv, g in t.groupby("conv_id"):
            role = g["role"].to_numpy(object)
            bad = sum(1 for i in range(len(role) - 1)
                      if role[i] == role[i + 1]
                      and role[i + 1] in ("user", "assistant"))
            row = out.loc[conv]
            assert row["n_turns"] == len(g)
            assert row["n_same_role_adjacent"] == bad
            assert row["alternation_ok"] == (bad == 0)

    def test_norm_outliers_match_numpy(self):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            NORM_OUTLIER_SIGMA, embedding_norm_outliers,
        )
        emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        mat = np.stack(emb["embedding"].to_numpy())
        q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        n = len(n2)
        sn, sn2 = int(n2.sum()), sum(int(x) * int(x) for x in n2)
        mean = float(sn) / float(n)
        sigma = float(np.sqrt(float(n * sn2 - sn * sn))) / float(n)
        cut = mean + NORM_OUTLIER_SIGMA * sigma
        expect = {int(v): int(x) for v, x in
                  zip(emb["vec_id"], n2) if float(x) > cut}
        out = embedding_norm_outliers(SF).to_pandas()
        assert {int(r.vec_id): int(r.n2)
                for r in out.itertuples()} == expect
        for r in out.itertuples():
            assert r.z == round((float(r.n2) - mean) / sigma, 6)


@pytest.mark.usefixtures("ray_session")
class TestContextGrowth:
    def test_matches_pandas_cumsum(self, tiny_transcripts):
        import re as _re
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            CONTEXT_BUDGET_TOKENS, conv_context_growth,
        )
        t = pq.read_table(tiny_transcripts).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        # ASCII \s, matching the engine's RE2 semantics (Python's
        # unicode \s also eats  -class chars in the noise turns)
        t["n"] = [len(_re.sub(r"\s+", " ", x or "", flags=_re.ASCII)
                      .strip(" \t\n\r\f\v").split(" "))
                  for x in t["text"]]
        t["cum"] = t.groupby("conv_id")["n"].cumsum()
        out = conv_context_growth(tiny_transcripts).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        assert len(out) == len(t)
        assert list(out["n_tokens"]) == list(t["n"])
        assert list(out["cum_tokens"]) == list(t["cum"])
        assert list(out["fits_budget"]) == \
            list(t["cum"] <= CONTEXT_BUDGET_TOKENS)


@pytest.mark.usefixtures("ray_session")
class TestFirstMsgDedup:
    def test_matches_pandas_brute(self, tiny_transcripts):
        import hashlib

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_first_msg_dedup,
        )
        t = pq.read_table(tiny_transcripts).to_pandas()
        users = t[t["role"] == "user"] \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort") \
            .groupby("conv_id", as_index=False).first()

        # RE2 \s (engine + DuckDB oracle) is ASCII-only, unlike Python
        # re — normalize with the same Arrow kernels the engine uses.
        import pyarrow as pa
        import pyarrow.compute as pc

        def norm(s: str) -> str:
            return pc.utf8_lower(pc.utf8_trim_whitespace(
                pc.replace_substring_regex(
                    pa.scalar(s or ""), r"\s+", " "))).as_py()

        key = {r.conv_id: hashlib.md5(norm(r.text).encode()).hexdigest()
               for r in users.itertuples()}
        fams = collections.Counter(key.values())
        canon = {}
        for c, k in key.items():
            canon[k] = min(canon.get(k, c), c)
        out = conv_first_msg_dedup(tiny_transcripts).to_pandas() \
            .set_index("conv_id")
        assert set(out.index) == set(key)
        for c, k in key.items():
            row = out.loc[c]
            assert row["first_msg_key"] == k
            assert row["n_convs"] == fams[k]
            assert row["canonical_conv_id"] == canon[k]
            assert row["keep"] == (c == canon[k])

    def test_designed_families(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_first_msg_dedup,
        )
        # c1/c2 share a first prompt modulo case+whitespace; c3 unique;
        # c4 has no user turn (excluded); c2's first user turn is NOT
        # turn 0 (selection by min turn_idx among user rows).
        rows = [
            ("c1", 0, "user", "  Hello   World "),
            ("c1", 1, "assistant", "hi"),
            ("c2", 0, "system", "sys"),
            ("c2", 1, "user", "hello world"),
            ("c2", 2, "user", "different later turn"),
            ("c3", 0, "user", "another prompt"),
            ("c4", 0, "assistant", "no user here"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
        })
        d = tmp_path / "fmd"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = conv_first_msg_dedup(str(d)).to_pandas() \
            .set_index("conv_id").sort_index()
        assert list(out.index) == ["c1", "c2", "c3"]
        assert out.loc["c1", "first_msg_key"] == \
            out.loc["c2", "first_msg_key"]
        assert out.loc["c1", "n_convs"] == 2
        assert bool(out.loc["c1", "keep"]) is True
        assert bool(out.loc["c2", "keep"]) is False
        assert out.loc["c2", "canonical_conv_id"] == "c1"
        assert out.loc["c3", "n_convs"] == 1
        assert bool(out.loc["c3", "keep"]) is True


@pytest.mark.usefixtures("ray_session")
class TestRenderSft:
    def test_matches_pandas(self, tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_render_sft,
        )
        t = pq.read_table(tiny_transcripts).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        t["line"] = t["role"] + ": " + t["text"].fillna("")
        want = t.groupby("conv_id")["line"].agg("\n".join)
        out = conv_render_sft(tiny_transcripts).to_pandas() \
            .set_index("conv_id")
        assert set(out.index) == set(want.index)
        for conv, text in want.items():
            row = out.loc[conv]
            assert row["sft_text"] == text
            assert row["n_turns"] == (t["conv_id"] == conv).sum()
            assert row["n_chars"] == len(text)

    def test_designed(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_render_sft,
        )
        tbl = pa.table({
            "conv_id": pa.array(["c1", "c1", "c1"], pa.string()),
            "turn_idx": pa.array([2, 0, 1], pa.int32()),
            "role": pa.array(["assistant", "user", "tool"], pa.string()),
            "text": pa.array(["done", "go", None], pa.string()),
            "tool": pa.array([""] * 3, pa.string()),
        })
        d = tmp_path / "sft"
        d.mkdir()
        pq.write_table(tbl, str(d / "p.parquet"))
        out = conv_render_sft(str(d)).to_pandas()
        assert out.loc[0, "sft_text"] == "user: go\ntool: \nassistant: done"
        assert out.loc[0, "n_turns"] == 3


@pytest.mark.usefixtures("ray_session")
class TestSftFilterAndSplit:
    def test_sft_filter_matches_pandas(self, tiny_transcripts):
        import pyarrow as pa
        import pyarrow.compute as pc

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            SFT_MAX_CHARS, SFT_MIN_CHARS, conv_sft_filter,
        )
        t = pq.read_table(tiny_transcripts).to_pandas()
        norm = pc.utf8_trim(pc.replace_substring_regex(
            pa.array(t["text"].fillna(""), pa.string()), r"\s+", " "),
            " ")
        t["nc"] = pc.utf8_length(norm).to_numpy(zero_copy_only=False)
        out = conv_sft_filter(tiny_transcripts).to_pandas() \
            .set_index("conv_id")
        assert set(out.index) == set(t["conv_id"])
        for conv, g in t.groupby("conv_id"):
            row = out.loc[conv]
            assert row["n_turns"] == len(g)
            assert row["n_chars"] == g["nc"].sum()
            assert row["has_user"] == (g["role"] == "user").any()
            assert row["has_assistant"] == (g["role"] == "assistant").any()
            ne = not ((g["role"] == "assistant") & (g["nc"] == 0)).any()
            assert row["no_empty_assistant"] == ne
            so = SFT_MIN_CHARS <= g["nc"].sum() <= SFT_MAX_CHARS
            assert row["size_ok"] == so
            assert row["keep"] == (row["has_user"] and row["has_assistant"]
                                   and ne and so)

    def test_sft_filter_designed_rejections(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_sft_filter,
        )
        rows = [
            ("ok", 0, "user", "hello there how are the hash joins"),
            ("ok", 1, "assistant", "quite well, thank you very much"),
            ("no_asst", 0, "user", "anyone home in this empty room?"),
            ("empty_a", 0, "user", "say absolutely nothing right now"),
            ("empty_a", 1, "assistant", "   "),      # normalizes empty
            ("tiny", 0, "user", "hi"),
            ("tiny", 1, "assistant", "yo"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
        })
        d = tmp_path / "sftf"
        d.mkdir()
        pq.write_table(tbl, str(d / "p.parquet"))
        out = conv_sft_filter(str(d)).to_pandas().set_index("conv_id")
        assert bool(out.loc["ok", "keep"]) is True
        assert bool(out.loc["no_asst", "keep"]) is False
        assert bool(out.loc["no_asst", "has_assistant"]) is False
        assert bool(out.loc["empty_a", "keep"]) is False
        assert bool(out.loc["empty_a", "no_empty_assistant"]) is False
        assert bool(out.loc["tiny", "keep"]) is False
        assert bool(out.loc["tiny", "size_ok"]) is False

    def test_split_assign_matches_md5_and_is_stable(self):
        import hashlib

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_split_assign,
        )
        out = doc_split_assign(SF).to_pandas()
        for r in out.itertuples():
            k = hashlib.md5(f"{r.doc_id}|split".encode()).hexdigest()[:8]
            assert r.split_key == k
            want = ("test" if k < "0ccccccc"
                    else "val" if k < "19999999" else "train")
            assert r.split == want
        # all three splits materialize even at 500 docs, train dominates
        counts = out["split"].value_counts()
        assert counts["train"] > counts.get("val", 0) > 0
        assert counts.get("test", 0) > 0


@pytest.mark.usefixtures("ray_session")
class TestSourceQualityWinsorKS:
    def test_winsor_matches_brute(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import quality_arrays
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            source_quality_winsor,
        )
        docs = _docs()
        import pyarrow as pa
        *_, qx = quality_arrays(pa.array(
            [_clean(t) for t in docs["text"]], pa.string()))
        d = pd.DataFrame({"source": docs["source"],
                          "q": np.asarray(qx, np.int64)})
        got = (source_quality_winsor(SF).to_pandas()
               .set_index("source").sort_index())
        for src, g in d.groupby("source"):
            v = np.sort(g["q"].to_numpy(np.int64))
            n = len(v)
            p_lo = v[np.searchsorted(np.arange(1, n + 1),
                                     (5 * n + 99) // 100, side="left")]
            p_hi = v[np.searchsorted(np.arange(1, n + 1),
                                     (95 * n + 99) // 100, side="left")]
            want = round(int(np.clip(v, p_lo, p_hi).sum()) / n, 6)
            row = got.loc[src]
            assert int(row["n_docs"]) == n
            assert (int(row["p_lo"]), int(row["p_hi"])) == (p_lo, p_hi)
            assert row["winsor_mean"] == want

    def test_winsor_robust_to_outlier_burst(self, tmp_path):
        """Injecting 4% zero-quality spam into one source barely moves
        its winsorized mean, while the plain mean drops visibly."""
        import pyarrow as pa
        import pyarrow.parquet as pq2

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            source_quality_winsor,
        )
        base = ["clean readable prose " * 10] * 96
        spam = ["00000 11111 22222 33333"] * 4
        texts = base + spam
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        pq2.write_table(t, str(tmp_path / "documents.parquet"))
        got = source_quality_winsor(str(tmp_path)).to_pandas().iloc[0]
        from agentic_document_extraction_pdf_ray.pipelines.documents import quality_arrays
        *_, qx = quality_arrays(pa.array([_clean(x) for x in texts],
                                         pa.string()))
        qx = np.asarray(qx, np.float64)
        clean_q = qx[0]
        assert abs(got["winsor_mean"] - clean_q) < 1.0   # winsor ~ clean
        assert clean_q - qx.mean() > 100                 # plain mean hit

    def test_ks_bounds_and_self_consistency(self, tmp_path):
        """Identical distributions -> ks 0; disjoint supports -> ks 1."""
        import pyarrow as pa
        import pyarrow.parquet as pq2

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            source_quality_ks,
        )
        hiq = "clean readable prose " * 10
        loq = "00000 11111 22222 33333"
        texts = [hiq] * 10 + [hiq] * 10 + [loq] * 10
        srcs = ["a"] * 10 + ["b"] * 10 + ["c"] * 10
        t = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 30, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        pq2.write_table(t, str(tmp_path / "documents.parquet"))
        got = source_quality_ks(str(tmp_path)).set_index(
            ["source_a", "source_b"])["ks_stat"]
        assert got.loc[("a", "b")] == 0.0
        assert got.loc[("a", "c")] == 1.0
        assert got.loc[("b", "c")] == 1.0


@pytest.mark.usefixtures("ray_session")
class TestLossMaskSpans:
    def test_spans_slice_back_to_turn_text(self, tiny_transcripts):
        """THE invariant: sft_text[mask_start:mask_end] equals the
        assistant turn's raw text, for every span."""
        import pyarrow.parquet as pq2

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_loss_mask_spans, conv_render_sft,
        )
        rendered = (conv_render_sft(tiny_transcripts).to_pandas()
                    .set_index("conv_id")["sft_text"])
        spans = conv_loss_mask_spans(tiny_transcripts).to_pandas()
        raw = pq2.read_table(tiny_transcripts).to_pandas()
        raw_text = {(r.conv_id, r.turn_idx): (r.text or "")
                    for r in raw.itertuples()}
        assert len(spans) == (raw["role"] == "assistant").sum()
        for r in spans.itertuples():
            sliced = rendered[r.conv_id][r.mask_start:r.mask_end]
            assert sliced == raw_text[(r.conv_id, r.turn_idx)], \
                (r.conv_id, r.turn_idx)

    def test_no_user_spans(self, tiny_transcripts):
        import pyarrow.parquet as pq2

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_loss_mask_spans,
        )
        spans = conv_loss_mask_spans(tiny_transcripts).to_pandas()
        raw = pq2.read_table(tiny_transcripts).to_pandas()
        assistant_keys = set(
            zip(raw.loc[raw["role"] == "assistant", "conv_id"],
                raw.loc[raw["role"] == "assistant", "turn_idx"]))
        assert set(zip(spans["conv_id"], spans["turn_idx"])) \
            == assistant_keys


@pytest.mark.usefixtures("ray_session")
class TestConvTurnRepeats:
    def test_semantics_on_synthetic(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq2

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_turn_repeats,
        )
        rows = [("c1", 0, "user", "hello"),
                ("c1", 1, "assistant", "hi"),
                ("c1", 2, "user", "hello"),      # repeat of turn 0
                ("c1", 3, "assistant", "hi"),    # repeat of turn 1
                ("c1", 4, "assistant", "hi"),    # second repeat
                ("c2", 0, "user", "hello")]      # other conv: NOT a repeat
        t = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        })
        pq2.write_table(t, str(tmp_path / "part-0.parquet"))
        got = (conv_turn_repeats(str(tmp_path)).to_pandas()
               .set_index(["conv_id", "turn_idx"]).sort_index())
        assert got.loc[("c1", 0), "n_prior"] == 0
        assert got.loc[("c1", 2), "n_prior"] == 1
        assert got.loc[("c1", 3), "n_prior"] == 1
        assert got.loc[("c1", 4), "n_prior"] == 2
        assert not got.loc[("c2", 0), "is_repeat"]
        assert got["is_repeat"].equals(got["n_prior"] > 0)


@pytest.mark.usefixtures("ray_session")
class TestConvEchoRate:
    def test_echo_semantics(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq2

        from agentic_document_extraction_pdf_ray.pipelines.extract import conv_echo_rate
        rows = [
            ("c1", 0, "user", "please summarize the quarterly revenue report"),
            # full echo: every assistant trigram is in the user turn
            ("c1", 1, "assistant", "summarize the quarterly revenue"),
            ("c1", 2, "user", "thanks now something else entirely"),
            # zero echo
            ("c1", 3, "assistant", "here is a totally fresh novel answer"),
            # short turn: < 3 tokens -> n_tri 0, rate 0
            ("c1", 4, "assistant", "ok sure"),
        ]
        t = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        })
        pq2.write_table(t, str(tmp_path / "part-0.parquet"))
        got = (conv_echo_rate(str(tmp_path)).to_pandas()
               .set_index("turn_idx").sort_index())
        assert set(got.index) == {1, 3, 4}       # assistant turns only
        assert got.loc[1, "echo_rate"] == 1.0
        assert got.loc[1, "n_tri"] == 2
        assert got.loc[3, "echo_rate"] == 0.0
        assert got.loc[4, "n_tri"] == 0
        assert got.loc[4, "echo_rate"] == 0.0


@pytest.mark.usefixtures("ray_session")
class TestConvDpoPairs:
    def _write(self, tmp_path, rows):
        import pyarrow as pa
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
        })
        d = tmp_path / "dpo"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        return str(d)

    def test_chosen_rejected_by_score(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_dpo_pairs,
        )
        # family A: c1 (5 assistant tokens) vs c2 (2) vs c3 (3) —
        # chosen = c1, rejected = c2; c4 is a singleton prompt (no
        # pair); c5 has no user turn (excluded entirely).
        rows = [
            ("c1", 0, "user", "same  prompt"),
            ("c1", 1, "assistant", "one two three four five"),
            ("c2", 0, "user", "Same Prompt"),
            ("c2", 1, "assistant", "one two"),
            ("c3", 0, "user", "same prompt "),
            ("c3", 1, "assistant", "a b c"),
            ("c4", 0, "user", "lonely prompt"),
            ("c4", 1, "assistant", "x"),
            ("c5", 0, "assistant", "no user"),
        ]
        out = conv_dpo_pairs(self._write(tmp_path, rows)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["n_convs"] == 3
        assert r["chosen_conv_id"] == "c1" and r["chosen_score"] == 5
        assert r["rejected_conv_id"] == "c2" and r["rejected_score"] == 2

    def test_full_tie_still_distinct(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_dpo_pairs,
        )
        # equal scores: chosen = min conv_id, rejected = max conv_id
        rows = [
            ("a1", 0, "user", "p"), ("a1", 1, "assistant", "x y"),
            ("a2", 0, "user", "p"), ("a2", 1, "assistant", "u v"),
        ]
        out = conv_dpo_pairs(self._write(tmp_path, rows)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["chosen_conv_id"] == "a1"
        assert r["rejected_conv_id"] == "a2"
        assert r["chosen_score"] == r["rejected_score"] == 2

    def test_score_sums_across_blocks(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_dpo_pairs,
        )
        # split one conversation across TWO files: block-partial
        # assistant sums and first-user candidates must fold exactly
        d = tmp_path / "dpo2"
        d.mkdir()

        def tbl(rows):
            return pa.table({
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "tool": pa.array([""] * len(rows), pa.string())})

        pq.write_table(tbl([
            ("b1", 2, "assistant", "three more tokens here"),
            ("b1", 3, "user", "later user turn"),
            ("b2", 0, "user", "shared  q"),
            ("b2", 1, "assistant", "one"),
        ]), str(d / "part-0.parquet"))
        pq.write_table(tbl([
            ("b1", 0, "user", "shared q"),
            ("b1", 1, "assistant", "two tokens"),
        ]), str(d / "part-1.parquet"))
        out = conv_dpo_pairs(str(d)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        # b1: 4 + 2 = 6 assistant tokens, first user turn is idx 0 in
        # the OTHER file; b2: 1 token
        assert r["chosen_conv_id"] == "b1" and r["chosen_score"] == 6
        assert r["rejected_conv_id"] == "b2" and r["rejected_score"] == 1


@pytest.mark.usefixtures("ray_session")
class TestConvWindowTruncate:
    def test_keeps_suffix_within_budget(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_window_truncate,
        )
        # turns of 3 / 2 / 4 tokens, budget 6: reverse sums are 9/6/4 —
        # only the last two turns fit
        rows = [("c", 0, "user", "a b c"),
                ("c", 1, "assistant", "d e"),
                ("c", 2, "user", "f g h i")]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "wt"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_window_truncate(str(d), budget=6).to_pandas()
               .sort_values("turn_idx").reset_index(drop=True))
        assert out["n_tokens"].tolist() == [3, 2, 4]
        assert out["tail_tokens"].tolist() == [9, 6, 4]
        assert out["kept"].tolist() == [False, True, True]

    def test_matches_forward_growth_totals(self, ray_session,
                                           tiny_transcripts):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_context_growth,
            conv_window_truncate,
        )
        # the final forward cumsum and the first tail sum are both the
        # conversation total — cross-check the two operators
        fwd = conv_context_growth(tiny_transcripts).to_pandas()
        bwd = conv_window_truncate(tiny_transcripts).to_pandas()
        tot_f = fwd.groupby("conv_id")["cum_tokens"].max()
        tot_b = bwd.groupby("conv_id")["tail_tokens"].max()
        assert tot_f.sort_index().equals(tot_b.sort_index())


@pytest.mark.usefixtures("ray_session")
class TestConvLangMismatch:
    def test_designed_mismatch(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_lang_mismatch,
        )
        # c1: user turns are English-marked; assistant replies one EN,
        # one ES -> majority 'en', 1 of 2 assistants mismatch.
        # c2: user Spanish-marked, assistant Spanish -> 0 mismatch.
        rows = [
            ("c1", 0, "user", "the cat and the dog"),
            ("c1", 1, "assistant", "the answer is here"),
            ("c1", 2, "user", "to be in a house is the point"),
            ("c1", 3, "assistant", "el gato y la casa que es"),
            ("c2", 0, "user", "el que la y los es"),
            ("c2", 1, "assistant", "la y el los que es"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "lm"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_lang_mismatch(str(d)).to_pandas()
               .set_index("conv_id").sort_index())
        assert out.loc["c1", "user_lang"] == "en"
        assert out.loc["c1", "n_assistant"] == 2
        assert out.loc["c1", "n_mismatch"] == 1
        assert out.loc["c1", "mismatch_frac"] == 0.5
        assert out.loc["c2", "user_lang"] == "es"
        assert out.loc["c2", "n_mismatch"] == 0


@pytest.mark.usefixtures("ray_session")
class TestConvRefusalRate:
    def test_designed_rates(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_refusal_rate,
        )
        rows = [
            ("c1", 0, "user", "do the thing"),
            ("c1", 1, "assistant", "I cannot help with that"),
            ("c1", 2, "user", "please?"),
            ("c1", 3, "assistant", "Sure, here it is"),
            ("c2", 0, "user", "hi"),
            ("c2", 1, "assistant", "As an AI, I'm sorry but no"),
            ("c3", 0, "user", "no assistant here"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "rr"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_refusal_rate(str(d)).to_pandas()
               .set_index("conv_id").sort_index())
        assert out.loc["c1", "n_assistant"] == 2
        assert out.loc["c1", "n_refusal"] == 1
        assert out.loc["c1", "refusal_rate"] == 0.5
        assert out.loc["c2", "n_refusal"] == 1
        assert out.loc["c2", "refusal_rate"] == 1.0
        assert out.loc["c3", "n_assistant"] == 0
        assert out.loc["c3", "refusal_rate"] == 0.0


@pytest.mark.usefixtures("ray_session")
class TestConvToolTransitions:
    def test_designed_chain(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_tool_transitions,
        )
        # c1 tool subsequence: search -> db -> search (turns 1,3,5;
        # non-tool turns in between must be skipped, not break chains).
        # c2: db -> db. Corpus pairs: search->db x1, db->search x1,
        # db->db x1.
        rows = [
            ("c1", 0, "user", "q", ""),
            ("c1", 1, "tool", "r", "search"),
            ("c1", 2, "assistant", "a", ""),
            ("c1", 3, "tool", "r", "db"),
            ("c1", 4, "user", "q", ""),
            ("c1", 5, "tool", "r", "search"),
            ("c2", 0, "tool", "r", "db"),
            ("c2", 1, "tool", "r", "db"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string())})
        d = tmp_path / "tt"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_tool_transitions(str(d)).to_pandas()
               .set_index(["from_tool", "to_tool"]).sort_index())
        assert out.loc[("search", "db"), "n"] == 1
        assert out.loc[("db", "search"), "n"] == 1
        assert out.loc[("db", "db"), "n"] == 1
        # db fan-out normalizes across its two destinations
        assert out.loc[("db", "search"), "prob"] == 0.5
        assert out.loc[("db", "db"), "prob"] == 0.5
        assert out.loc[("search", "db"), "prob"] == 1.0
        assert len(out) == 3


@pytest.mark.usefixtures("ray_session")
class TestConvVerbosityRatio:
    def test_designed_ratio(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_verbosity_ratio,
        )
        rows = [
            ("c1", 0, "user", "abcd"),          # 4 chars
            ("c1", 1, "assistant", "abcdefgh"),  # 8 chars
            ("c1", 2, "system", "ignored-for-chars"),
            ("c2", 0, "assistant", "xy"),        # no user turns -> /1
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "vr"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_verbosity_ratio(str(d)).to_pandas()
               .set_index("conv_id").sort_index())
        assert out.loc["c1", "user_chars"] == 4
        assert out.loc["c1", "assistant_chars"] == 8
        assert out.loc["c1", "verbosity_ratio"] == 2.0
        assert out.loc["c2", "n_user"] == 0
        assert out.loc["c2", "verbosity_ratio"] == 2.0  # 2 chars / max(0,1)


@pytest.mark.usefixtures("ray_session")
class TestConvPiiLeakRate:
    def test_seeded_rate(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_pii_leak_rate,
        )
        # conv-00000007: k = 7*37 + turn_idx = 259 + i.
        # i=0 -> k=259, 259%7=0 (email seeded); i=1 -> 260%7=1 (ssn);
        # i=2 -> 261%7=2 (phone); i=3 -> 262%7=3 (ipv4);
        # i=4 -> 263%7=4 (none); i=5 -> 264%7=5 (none).
        rows = [
            ("conv-00000007", 0, "assistant", "a"),   # seeded email
            ("conv-00000007", 1, "user", "b"),        # seeded but user
            ("conv-00000007", 2, "assistant", "c"),   # seeded phone
            ("conv-00000007", 3, "user", "d"),
            ("conv-00000007", 4, "assistant", "e"),   # NOT seeded
            ("conv-00000007", 5, "assistant", "f"),   # NOT seeded
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "pl"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_pii_leak_rate(str(d)).to_pandas()
               .set_index("conv_id"))
        assert out.loc["conv-00000007", "n_assistant"] == 4
        assert out.loc["conv-00000007", "n_pii"] == 2
        assert out.loc["conv-00000007", "pii_rate"] == 0.5


@pytest.mark.usefixtures("ray_session")
class TestConvTimeSplits:
    def test_designed_segments(self, tmp_path):
        from datetime import datetime, timedelta

        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_time_splits,
        )
        t0 = datetime(2024, 1, 1)
        # c1: gaps 10s, 400s (break), 5s -> 2 segments, max 400s
        c1 = [t0, t0 + timedelta(seconds=10), t0 + timedelta(seconds=410),
              t0 + timedelta(seconds=415)]
        # c2: single turn -> 1 segment, max gap 0
        rows = ([("c1", i, ts) for i, ts in enumerate(c1)]
                + [("c2", 0, t0)])
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))})
        d = tmp_path / "ts"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_time_splits(str(d)).to_pandas()
               .set_index("conv_id").sort_index())
        assert out.loc["c1", "n_turns"] == 4
        assert out.loc["c1", "n_segments"] == 2
        assert out.loc["c1", "max_gap_us"] == 400_000_000
        assert out.loc["c2", "n_turns"] == 1
        assert out.loc["c2", "n_segments"] == 1
        assert out.loc["c2", "max_gap_us"] == 0


def _write_doc_table(tmp_path, texts):
    import pyarrow as pa
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s0"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestDocLinkDensity:
    def test_designed_densities(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_link_density,
        )
        sf = _write_doc_table(tmp_path, [
            "plain text no links here",              # 0 urls
            "go https://a.io/x now",                 # 1 url, 12 chars
            "https://b.co https://c.de",             # all-link doc
            None,                                    # null -> ''
        ])
        out = doc_link_density(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_urls"] == 0
        assert out.loc[0, "link_heavy"] == False  # noqa: E712
        assert out.loc[1, "n_urls"] == 1
        assert out.loc[1, "url_chars"] == len("https://a.io/x")
        assert out.loc[2, "n_urls"] == 2
        # 'https://b.co https://c.de': 25 chars, 24 in urls
        assert out.loc[2, "url_chars"] == 24
        assert out.loc[2, "link_heavy"] == True  # noqa: E712
        assert out.loc[3, "total_chars"] == 0
        assert out.loc[3, "link_density"] == 0.0


@pytest.mark.usefixtures("ray_session")
class TestDocReadability:
    def test_designed_scores(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_readability,
        )
        sf = _write_doc_table(tmp_path, [
            "The cat sat. The dog ran!",   # 6 words, 2 sentences
            "",                            # empty doc
        ])
        out = doc_readability(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_words"] == 6
        assert out.loc[0, "n_sentences"] == 2
        # vowel groups in 'the cat sat. the dog ran!':
        # e,a,a,e,o,a -> 6
        assert out.loc[0, "n_syllables"] == 6
        exp = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
        assert out.loc[0, "flesch"] == exp
        assert out.loc[1, "n_words"] == 0
        assert out.loc[1, "flesch"] == 206.835


@pytest.mark.usefixtures("ray_session")
class TestEventsCusumChangepoint:
    def test_designed_shift(self, tmp_path):
        from datetime import datetime

        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_cusum_changepoint,
        )
        # type 'a': counts 1,1,5,5 over 4 days -> mean 3; cusum numerator
        # P_k*D - k*T: (1*4-12), (2*4-24), (7*4-36), (12*4-48)
        # = -8, -16, -8, 0 -> argmax |.| at day 2.
        rows = []
        eid = 0
        for day, cnt in (("2024-01-01", 1), ("2024-01-02", 1),
                         ("2024-01-03", 5), ("2024-01-04", 5)):
            for _ in range(cnt):
                rows.append((eid, datetime.fromisoformat(day + "T12:00:00"),
                             "u1", "a", 1.0, "{}"))
                eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.string()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string())})
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        out = (events_cusum_changepoint(str(tmp_path)).to_pandas()
               .set_index("event_type"))
        assert out.loc["a", "n_days"] == 4
        assert out.loc["a", "total_events"] == 12
        assert out.loc["a", "mean_daily"] == 3.0
        assert out.loc["a", "cp_day"] == "2024-01-02"
        assert out.loc["a", "cp_cusum"] == -4.0   # -16/4


@pytest.mark.usefixtures("ray_session")
class TestConvLinkDomains:
    def test_seeded_and_literal_domains(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_link_domains,
        )
        # conv-00000005: k = 185 + i. i=0 -> k=185 (k%5==0: seeded
        # site35.example), i=1..4 not seeded; i=5 -> k=190 (site40).
        rows = [
            ("conv-00000005", 0, "see https://a.io/x and https://a.io/y"),
            ("conv-00000005", 1, "no links"),
            ("conv-00000005", 5, "plain"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "ld"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = conv_link_domains(str(d)).set_index("domain")
        assert out.loc["a.io", "n"] == 2
        assert out.loc["a.io", "n_convs"] == 1
        assert out.loc["site35.example", "n"] == 1   # k=185 seeded
        assert out.loc["site40.example", "n"] == 1   # k=190 seeded
        assert len(out) == 3


@pytest.mark.usefixtures("ray_session")
class TestConvStockLines:
    def test_cross_conv_threshold(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_stock_lines,
        )
        # 'banner' appears in c1 (twice, one turn two lines) and c2;
        # 'only-once-per-conv' appears twice but in ONE conv -> dropped.
        rows = [
            ("c1", 0, "Banner\n\nbody text one"),
            ("c1", 1, "banner \nonly twice here\nonly twice here"),
            ("c2", 0, "\tBANNER\nbody text two"),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "sl"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = conv_stock_lines(str(d)).set_index("line")
        assert out.loc["banner", "n"] == 3
        assert out.loc["banner", "n_convs"] == 2
        assert "only twice here" not in out.index   # single-conv line
        assert len(out) == 1


@pytest.mark.usefixtures("ray_session")
class TestCorpusSnapshotDiff:
    def test_designed_statuses(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            corpus_snapshot_diff,
        )
        # ids 0..14: removed = {3, 14}; changed = {2, 9}; added from
        # {1} -> 10000001, {14 % 13 == 1} -> 10000014 (14 is ALSO
        # removed from v2's base — add still applies).
        sf = _write_doc_table(tmp_path, [f"text {i}" for i in range(15)])
        out = (corpus_snapshot_diff(sf).to_pandas()
               .set_index("doc_id")["status"])
        assert out.loc[3] == "removed"
        assert out.loc[14] == "removed"
        assert out.loc[2] == "changed"
        assert out.loc[9] == "changed"
        assert out.loc[10000001] == "added"
        assert out.loc[10000014] == "added"
        assert out.loc[0] == "same"
        assert (out == "same").sum() == 15 - 2 - 2
        assert len(out) == 17


@pytest.mark.usefixtures("ray_session")
class TestFkIntegrityAudit:
    def test_designed_orphans(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            fk_integrity_audit,
        )
        # customers 1..3; orders: o1->cust1, o2->cust9 (orphan row),
        # o3->cust9 (same orphan key); customer 2,3 childless.
        # lineitems: 2 rows for o1, 1 row for o77 (orphan); orders
        # o2, o3 childless.
        pq.write_table(pa.table({
            "c_custkey": pa.array([1, 2, 3], pa.int64())}),
            f"{tmp_path}/customer.parquet")
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 9, 9], pa.int64())}),
            f"{tmp_path}/orders.parquet")
        pq.write_table(pa.table({
            "l_orderkey": pa.array([1, 1, 77], pa.int64())}),
            f"{tmp_path}/lineitem.parquet")
        out = (fk_integrity_audit(str(tmp_path)).to_pandas()
               .set_index("relation"))
        co = out.loc["customer->orders"]
        assert co["n_child_rows_orphaned"] == 2
        assert co["n_child_keys_orphaned"] == 1
        assert co["n_parent_keys_childless"] == 2
        ol = out.loc["orders->lineitem"]
        assert ol["n_child_rows_orphaned"] == 1
        assert ol["n_child_keys_orphaned"] == 1
        assert ol["n_parent_keys_childless"] == 2


@pytest.mark.usefixtures("ray_session")
class TestConvToolLatency:
    def test_designed_gaps(self, tmp_path):
        from datetime import datetime, timedelta

        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_tool_latency,
        )
        t0 = datetime(2024, 1, 1)
        # c1: search at t=0 (next at +10s), db at +10s (next at +40s),
        # search at +40s is LAST turn -> no successor.
        rows = [
            ("c1", 0, "search", t0),
            ("c1", 1, "db", t0 + timedelta(seconds=10)),
            ("c1", 2, "search", t0 + timedelta(seconds=40)),
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["tool"] * len(rows), pa.string()),
            "text": pa.array(["r"] * len(rows), pa.string()),
            "tool": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us"))})
        d = tmp_path / "tl"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_tool_latency(str(d)).to_pandas().set_index("tool"))
        assert out.loc["search", "n"] == 1          # last search dropped
        assert out.loc["search", "sum_us"] == 10_000_000
        assert out.loc["db", "n"] == 1
        assert out.loc["db", "max_us"] == 30_000_000
        assert out.loc["db", "mean_us"] == 30_000_000.0


@pytest.mark.usefixtures("ray_session")
class TestEventsTypeOverlap:
    def test_designed_jaccard(self, tmp_path):
        from datetime import datetime

        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_type_overlap,
        )
        # users: u1 {click, buy}, u2 {click, buy}, u3 {click},
        # u4 {view}. click∩buy=2, click∪buy=3 -> 2/3; view overlaps none.
        pairs = [("u1", "click"), ("u1", "buy"), ("u2", "click"),
                 ("u2", "buy"), ("u3", "click"), ("u3", "click"),
                 ("u4", "view")]
        tbl = pa.table({
            "event_id": pa.array(range(len(pairs)), pa.int64()),
            "ts": pa.array([datetime(2024, 1, 1)] * len(pairs),
                           pa.timestamp("us")),
            "user_id": pa.array([p[0] for p in pairs], pa.string()),
            "event_type": pa.array([p[1] for p in pairs], pa.string()),
            "value": pa.array([1.0] * len(pairs), pa.float64()),
            "props": pa.array(["{}"] * len(pairs), pa.string())})
        pq.write_table(tbl, f"{tmp_path}/events.parquet")
        out = (events_type_overlap(str(tmp_path)).to_pandas()
               .set_index(["type_a", "type_b"]))
        assert len(out) == 1                       # view pairs excluded
        row = out.loc[("buy", "click")]
        assert row["n_both"] == 2
        assert row["n_a"] == 2 and row["n_b"] == 3
        assert row["jaccard"] == round(2 / 3, 6)


@pytest.mark.usefixtures("ray_session")
class TestOrdersMonthlyYoy:
    def test_designed_growth(self, tmp_path):
        from datetime import datetime

        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.relational import (
            orders_monthly_yoy,
        )
        rows = [
            (datetime(1995, 3, 1), 100.00),
            (datetime(1995, 3, 15), 50.00),
            (datetime(1996, 3, 2), 300.00),   # yoy vs 150.00 -> +1.0
            (datetime(1996, 4, 2), 10.00),    # no 1995-04 -> excluded
        ]
        tbl = pa.table({
            "o_orderkey": pa.array(range(len(rows)), pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[0] for r in rows],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * len(rows), pa.string())})
        pq.write_table(tbl, f"{tmp_path}/orders.parquet")
        out = (orders_monthly_yoy(str(tmp_path)).to_pandas()
               .set_index("month"))
        assert len(out) == 1
        assert out.loc["1996-03", "revenue_cents"] == 30000
        assert out.loc["1996-03", "prev_year_cents"] == 15000
        assert out.loc["1996-03", "yoy_growth"] == 1.0


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    import pyarrow as pa
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.string()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(tbl, f"{tmp_path}/events.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestEventsAttributionLastTouch:
    def test_designed_attribution(self, tmp_path):
        from datetime import datetime, timedelta

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_attribution_last_touch,
        )
        t0 = datetime(2024, 1, 1)
        s = lambda k: t0 + timedelta(seconds=k)  # noqa: E731
        rows = [
            # u1: click -> purchase (click credited); then purchase
            # again with NO new touch in between -> still click
            (0, s(0), "u1", "click", 1.0),
            (1, s(1), "u1", "purchase", 1.0),
            (2, s(2), "u1", "purchase", 1.0),
            # u2: purchase with no prior touch -> none
            (3, s(0), "u2", "purchase", 1.0),
            # u3: view then signup then purchase -> signup (LAST touch)
            (4, s(0), "u3", "view", 1.0),
            (5, s(1), "u3", "signup", 1.0),
            (6, s(2), "u3", "purchase", 1.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = (events_attribution_last_touch(sf).to_pandas()
               .set_index("attributed_type"))
        assert out.loc["click", "n"] == 2
        assert out.loc["none", "n"] == 1
        assert out.loc["signup", "n"] == 1
        assert out.loc["click", "share"] == 0.5


@pytest.mark.usefixtures("ray_session")
class TestEventsDowChisq:
    def test_uniform_vs_spiked(self, tmp_path):
        from datetime import datetime, timedelta

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_dow_chisq,
        )
        t0 = datetime(2024, 1, 1)  # a Monday
        rows = []
        eid = 0
        # 'flat': one event each day of one week -> chi2 = 0
        for d in range(7):
            rows.append((eid, t0 + timedelta(days=d), "u", "flat", 1.0))
            eid += 1
        # 'spike': 7 events all on one day -> o=(7,0,...); T=7;
        # num = (49-7)^2 + 6*49 = 1764+294 = 2058; chi2 = 2058/49 = 42
        for _ in range(7):
            rows.append((eid, t0, "u", "spike", 1.0))
            eid += 1
        sf = _write_events(tmp_path, rows)
        out = (events_dow_chisq(sf).to_pandas().set_index("event_type"))
        assert out.loc["flat", "chi2"] == 0.0
        assert out.loc["spike", "total"] == 7
        assert out.loc["spike", "chi2"] == 42.0


@pytest.mark.usefixtures("ray_session")
class TestJsonlRoundTrip:
    def test_exact_roundtrip(self, tmp_path):
        import ray.data

        from agentic_document_extraction_pdf_ray.sources.jsonl import (
            read_transcripts_jsonl, write_transcripts_jsonl,
        )
        from agentic_document_extraction_pdf_ray.sources.transcripts import (
            transcripts_path,
        )
        src = transcripts_path(2000, 11)
        out = str(tmp_path / "jl")
        ds = ray.data.read_parquet(src)
        write_transcripts_jsonl(ds, out)
        back = read_transcripts_jsonl(out)
        a = (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
             .reset_index(drop=True))
        b = (back.to_pandas().sort_values(["conv_id", "turn_idx"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b[a.columns])

    def test_pipeline_runs_on_jsonl_turns(self, tmp_path):
        import ray.data

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            extract_turns,
        )
        from agentic_document_extraction_pdf_ray.sources.jsonl import (
            read_transcripts_jsonl, write_transcripts_jsonl,
        )
        from agentic_document_extraction_pdf_ray.sources.transcripts import (
            transcripts_path,
        )
        src = transcripts_path(2000, 11)
        out = str(tmp_path / "jl2")
        write_transcripts_jsonl(ray.data.read_parquet(src), out)
        n = extract_turns(read_transcripts_jsonl(out)).count()
        assert n == 2000


@pytest.mark.usefixtures("ray_session")
class TestEventsChurnLabels:
    def test_designed_labels(self, tmp_path):
        from datetime import datetime, timedelta

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_churn_labels,
        )
        t0 = datetime(2024, 1, 1)
        rows = [
            # watermark is u2's event at +40d. u1's last is day 0
            # -> idle 40d > 28d -> churned. u2 idle 0 -> active.
            (0, t0, "u1", "click", 1.0),
            (1, t0 + timedelta(days=1), "u1", "view", 1.0),
            (2, t0 + timedelta(days=41), "u2", "click", 1.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = (events_churn_labels(sf).to_pandas().set_index("user_id"))
        assert out.loc["u1", "n_events"] == 2
        assert out.loc["u1", "idle_us"] == 40 * 86400 * 1_000_000
        assert bool(out.loc["u1", "churned"]) is True
        assert out.loc["u2", "idle_us"] == 0
        assert bool(out.loc["u2", "churned"]) is False


@pytest.mark.usefixtures("ray_session")
class TestConvCurationReport:
    def test_equals_individual_screens(self):
        import pandas as _pd

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_curation_report, conv_lang_mismatch, conv_pii_leak_rate,
            conv_refusal_rate, conv_time_splits, conv_verbosity_ratio,
        )
        from agentic_document_extraction_pdf_ray.sources.transcripts import (
            transcripts_path,
        )
        src = transcripts_path(5000, 7)
        fused = (conv_curation_report(src).to_pandas()
                 .sort_values("conv_id").reset_index(drop=True))
        v = conv_verbosity_ratio(src).to_pandas()
        r = conv_refusal_rate(src).to_pandas()
        p = conv_pii_leak_rate(src).to_pandas()
        lm = conv_lang_mismatch(src).to_pandas()
        t = conv_time_splits(src).to_pandas()
        joined = (v.merge(r.drop(columns=["n_assistant"]), on="conv_id")
                  .merge(p.drop(columns=["n_assistant"]), on="conv_id")
                  .merge(lm.drop(columns=["n_assistant"]), on="conv_id")
                  .merge(t, on="conv_id")
                  .sort_values("conv_id").reset_index(drop=True))
        _pd.testing.assert_frame_equal(fused[joined.columns], joined)


@pytest.mark.usefixtures("ray_session")
class TestDocCurationReport:
    def test_equals_individual_screens(self):
        import pandas as _pd

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_curation_report, doc_gopher_flags, doc_lang_id,
            doc_link_density, doc_pii_scrub, doc_quality, doc_readability,
        )
        sf = SF
        fused = (doc_curation_report(sf).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
        q = doc_quality(sf).to_pandas()
        g = (doc_gopher_flags(sf).to_pandas()
             .rename(columns={"keep": "gopher_keep"}))
        r = doc_readability(sf).to_pandas().drop(columns=["n_words"])
        ld = doc_link_density(sf).to_pandas().drop(columns=["total_chars"])
        p = doc_pii_scrub(sf).to_pandas().drop(columns=["redacted_len"])
        li = doc_lang_id(sf).to_pandas()[["doc_id", "predicted_lang"]]
        joined = (q.merge(g, on="doc_id").merge(r, on="doc_id")
                  .merge(ld, on="doc_id").merge(p, on="doc_id")
                  .merge(li, on="doc_id")
                  .sort_values("doc_id").reset_index(drop=True))
        _pd.testing.assert_frame_equal(fused[joined.columns], joined)


@pytest.mark.usefixtures("ray_session")
class TestDocScreenCorr:
    def test_matches_numpy_corrcoef(self):
        import numpy as _np

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            SCREEN_CORR_COLS, doc_curation_report, doc_screen_corr,
        )
        rep = doc_curation_report(SF).to_pandas()
        out = (doc_screen_corr(SF).to_pandas()
               .set_index(["col_a", "col_b"]))
        assert len(out) == len(SCREEN_CORR_COLS) * (
            len(SCREEN_CORR_COLS) - 1) // 2
        # spot-check pairs against numpy's corrcoef
        for a, b in (("n_chars", "n_tokens"), ("n_tokens", "n_words"),
                     ("n_chars", "n_syllables")):
            want = _np.corrcoef(rep[a].to_numpy(float),
                                rep[b].to_numpy(float))[0, 1]
            got = out.loc[(a, b), "r"] if (a, b) in out.index \
                else out.loc[(b, a), "r"]
            assert abs(got - want) < 6e-7   # engine rounds r to 6 dp
        # zero-variance convention: sf0.001 docs carry no URLs, so
        # every n_urls pair reports r = 0 (numpy would give nan)
        if rep["n_urls"].nunique() == 1:
            assert out.loc[("n_urls", "n_stopwords"), "r"] == 0.0
        # strongly-coupled token counts correlate near 1
        assert out.loc[("n_tokens", "n_words"), "r"] > 0.99


@pytest.mark.usefixtures("ray_session")
class TestEventsUserTypeEntropy:
    def test_designed_entropies(self, tmp_path):
        import math
        from datetime import datetime

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_user_type_entropy,
        )
        t = datetime(2024, 1, 1)
        rows = ([(i, t, "mono", "click", 1.0) for i in range(4)]
                + [(10, t, "duo", "click", 1.0),
                   (11, t, "duo", "view", 1.0)])
        sf = _write_events(tmp_path, rows)
        out = (events_user_type_entropy(sf).to_pandas()
               .set_index("user_id"))
        assert out.loc["mono", "entropy"] == 0.0
        assert out.loc["duo", "entropy"] == round(math.log(2), 6)
        assert out.loc["mono", "n_events"] == 4


@pytest.mark.usefixtures("ray_session")
class TestEventsBenford:
    def test_designed_digits(self, tmp_path):
        from datetime import datetime

        from agentic_document_extraction_pdf_ray.pipelines.events import (
            events_benford,
        )
        t = datetime(2024, 1, 1)
        # cents: 123 (d=1), 190 (d=1), 25000 (d=2), 0 (excluded)
        rows = [(0, t, "u", "a", 1.23), (1, t, "u", "a", 1.90),
                (2, t, "u", "a", 250.00), (3, t, "u", "a", 0.0)]
        sf = _write_events(tmp_path, rows)
        out = (events_benford(sf).to_pandas()
               .set_index(["event_type", "digit"]))
        assert out.loc[("a", "1"), "n"] == 2
        assert out.loc[("a", "2"), "n"] == 1
        assert out.loc[("a", "1"), "frac"] == round(2 / 3, 6)
        assert len(out) == 2


@pytest.mark.usefixtures("ray_session")
class TestConvRoleTrigrams:
    def test_designed_trigrams(self, tmp_path):
        import pyarrow as pa

        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            conv_role_trigrams,
        )
        rows = [
            ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
            ("c1", 3, "assistant"),
            ("c2", 0, "system"), ("c2", 1, "user"),  # len<3: no trigram
        ]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "tool": pa.array([""] * len(rows), pa.string())})
        d = tmp_path / "rt"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        out = (conv_role_trigrams(str(d)).to_pandas()
               .set_index(["r1", "r2", "r3"]))
        assert out.loc[("user", "assistant", "user"), "n"] == 1
        assert out.loc[("assistant", "user", "assistant"), "n"] == 1
        assert len(out) == 2
        assert out["frac"].sum() == 1.0


@pytest.mark.usefixtures("ray_session")
class TestDocScreenProfile:
    def test_matches_pandas_describe(self):
        import numpy as _np

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            SCREEN_CORR_COLS, doc_curation_report, doc_screen_profile,
        )
        rep = doc_curation_report(SF).to_pandas()
        out = doc_screen_profile(SF).to_pandas().set_index("col")
        assert set(out.index) == set(SCREEN_CORR_COLS)
        for c in ("n_chars", "n_tokens", "quality_x100"):
            x = _np.sort(rep[c].to_numpy(_np.int64))
            n = len(x)
            assert out.loc[c, "n"] == n
            assert out.loc[c, "min_v"] == x[0]
            assert out.loc[c, "max_v"] == x[-1]
            assert out.loc[c, "sum_v"] == x.sum()
            # cum-count convention: value at 1-based rank ceil(pN/4)
            assert out.loc[c, "p25"] == x[(n + 3) // 4 - 1]
            assert out.loc[c, "p50"] == x[(n + 1) // 2 - 1]
            assert out.loc[c, "p75"] == x[(3 * n + 3) // 4 - 1]


@pytest.mark.usefixtures("ray_session")
class TestEmptyInputRobustness:
    """Every closing-session operator must return an EMPTY result (not
    crash) on a zero-row corpus — the behavior a production run needs
    when a partition filter matches nothing."""

    def _empty_transcripts(self, tmp_path):
        import pyarrow as pa
        tbl = pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us"))})
        d = tmp_path / "empty_t"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        return str(d)

    def test_conv_ops_on_empty(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines import extract as E
        src = self._empty_transcripts(tmp_path)
        for fn in (E.conv_refusal_rate, E.conv_lang_mismatch,
                   E.conv_verbosity_ratio, E.conv_pii_leak_rate,
                   E.conv_time_splits, E.conv_tool_transitions,
                   E.conv_tool_latency, E.conv_curation_report,
                   E.conv_role_trigrams):
            out = fn(src)
            n = out.count() if hasattr(out, "count") else len(out)
            assert n == 0, fn.__name__
        for fn in (E.conv_stock_lines, E.conv_link_domains):
            assert len(fn(src)) == 0, fn.__name__

    def test_doc_ops_on_empty(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines import (
            documents as D,
        )
        sf = _write_doc_table(tmp_path, [])
        for fn in (D.doc_link_density, D.doc_readability,
                   D.doc_curation_report, D.corpus_snapshot_diff):
            assert fn(sf).count() == 0, fn.__name__

    def test_events_ops_on_empty(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines import (
            events as EV,
        )
        sf = _write_events(tmp_path, [])
        for fn in (EV.events_type_overlap, EV.events_cusum_changepoint,
                   EV.events_dow_chisq, EV.events_benford,
                   EV.events_user_type_entropy,
                   EV.events_attribution_last_touch):
            assert fn(sf).count() == 0, fn.__name__

    def test_events_ops_on_empty_reviewed(self, tmp_path):
        # review findings: these four crashed (unpack / int(None) /
        # ZeroDivision / KeyError) on a zero-row corpus before the guards
        from agentic_document_extraction_pdf_ray.pipelines import (
            events as EV,
        )
        sf = _write_events(tmp_path, [])
        assert EV.events_user_rfm(sf).count() == 0
        for fn in (EV.events_funnel_latency, EV.events_ab_lift,
                   EV.events_user_gini):
            out = fn(sf)
            assert len(out) == 0, fn.__name__
            assert list(out.columns), fn.__name__   # typed empty frame

    def test_ab_lift_single_variant(self, tmp_path):
        # all user_ids share parity -> one variant -> no lift computable
        import datetime as dt
        ts = dt.datetime(2024, 1, 1)
        rows = [(i, ts, "2", "purchase", 1.0) for i in range(4)]
        sf = _write_events(tmp_path, rows)
        from agentic_document_extraction_pdf_ray.pipelines import (
            events as EV,
        )
        assert len(EV.events_ab_lift(sf)) == 0

    def test_embedding_norm_outliers_on_empty(self, tmp_path):
        import pyarrow as pa
        tbl = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32())})
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
        from agentic_document_extraction_pdf_ray.pipelines import (
            similarity as S,
        )
        assert S.embedding_norm_outliers(str(tmp_path)).count() == 0
