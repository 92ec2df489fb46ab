"""Round-4 LLM-pipeline operators: domain-mixing weights (DoReMi-lite),
SemDeDup keep-first within clusters, ExactSubstr duplication coverage.
Oracle equality is covered by the auto-discovered DuckDB gate; these
tests pin the BEHAVIORAL semantics on crafted fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(d, texts, sources=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(sources or ["web"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
class TestSourceMixWeights:
    def test_uniform_target_math(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import source_mix_weights
        # web: 6 tokens over 2 docs; books: 2 tokens over 1 doc
        _write_docs(tmp_path, ["a b c", "d e f", "g h"],
                    sources=["web", "web", "books"])
        got = (source_mix_weights(str(tmp_path)).to_pandas()
               .set_index("source"))
        assert got.loc["web", "n_docs"] == 2
        assert got.loc["web", "n_tokens"] == 6
        assert got.loc["books", "n_tokens"] == 2
        assert got.loc["web", "token_share"] == 6 / 8
        # uniform target 1/2 each: web weight = (1/2)/(6/8) = 8/12
        assert got.loc["web", "mix_weight"] == 8 / (2 * 6)
        assert got.loc["books", "mix_weight"] == 8 / (2 * 2)

    def test_balanced_corpus_weights_one(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import source_mix_weights
        _write_docs(tmp_path, ["a b", "c d"], sources=["s1", "s2"])
        got = source_mix_weights(str(tmp_path)).to_pandas()
        assert (got["mix_weight"] == 1.0).all()


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingSemdedup:
    def _write_emb(self, d, vecs, labels):
        t = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        pq.write_table(t, str(d / "embeddings.parquet"))

    def test_keep_first_is_cluster_confined(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import embedding_semdedup
        v = [1.0, 0.0, 0.0]
        w = [0.0, 1.0, 0.0]
        # ids 0,1: identical vectors, SAME label -> 1 dropped
        # id 2: identical to 0 but OTHER label -> kept (cluster-confined)
        # id 3: orthogonal, same label as 0 -> kept
        self._write_emb(tmp_path, [v, v, v, w], [0, 0, 1, 0])
        got = (embedding_semdedup(str(tmp_path)).to_pandas()
               .set_index("vec_id").sort_index())
        assert got.loc[0, "is_kept"] and got.loc[0, "max_prior_cos"] == -1.0
        assert not got.loc[1, "is_kept"]
        assert got.loc[1, "max_prior_cos"] == 1.0
        assert got.loc[2, "is_kept"]          # same vector, other cluster
        assert got.loc[3, "is_kept"]
        assert got.loc[3, "max_prior_cos"] == 0.0

    def test_zero_norm_vector_does_not_poison_cluster(self, tmp_path):
        """0/0 cosine is NULL under the SQL oracle and excluded from
        max() — a zero vector must not disable dedup for later vectors
        in its cluster (review finding: NaN poisoned the column max)."""
        from agentic_document_extraction_pdf_ray.pipelines.similarity import embedding_semdedup
        v = [1.0, 0.0]
        z = [0.0, 0.0]
        self._write_emb(tmp_path, [v, z, v], [0, 0, 0])
        got = (embedding_semdedup(str(tmp_path)).to_pandas()
               .set_index("vec_id").sort_index())
        assert got.loc[1, "max_prior_cos"] == -1.0 and got.loc[1, "is_kept"]
        assert got.loc[2, "max_prior_cos"] == 1.0
        assert not got.loc[2, "is_kept"]      # the duplicate still drops

    def test_tau_boundary_uses_rounded_cos(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import embedding_semdedup
        # cos exactly at tau is KEPT (strict >)
        a = [1.0, 0.0]
        b = [0.97, float(np.sqrt(1 - 0.97 ** 2))]
        self._write_emb(tmp_path, [a, b], [0, 0])
        got = (embedding_semdedup(str(tmp_path), tau=0.97).to_pandas()
               .set_index("vec_id"))
        assert got.loc[1, "max_prior_cos"] == 0.97
        assert got.loc[1, "is_kept"]


@pytest.mark.usefixtures("ray_session")
class TestDupSpanCoverage:
    def test_interval_union_not_sum(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import doc_dup_span_coverage
        shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"      # 9 tokens: two
        # overlapping duplicated 8-grams -> union covers 9, not 16
        doc0 = shared + " x1 x2 x3"
        doc1 = shared + " y1 y2 y3"
        doc2 = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"    # no dup grams
        _write_docs(tmp_path, [doc0, doc1, doc2])
        got = (doc_dup_span_coverage(str(tmp_path)).to_pandas()
               .set_index("doc_id").sort_index())
        assert got.loc[0, "n_tokens"] == 12 and got.loc[0, "n_grams"] == 5
        assert got.loc[0, "n_dup_starts"] == 2    # starts at pos 0 and 1
        assert got.loc[0, "n_covered"] == 9       # union of [0,8) and [1,9)
        assert got.loc[0, "coverage"] == 9 / 12
        assert got.loc[1, "n_covered"] == 9
        assert got.loc[2, "n_dup_starts"] == 0
        assert got.loc[2, "n_covered"] == 0 and got.loc[2, "coverage"] == 0.0

    def test_short_docs_and_full_dup(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import doc_dup_span_coverage
        full = "a b c d e f g h"                   # exactly one 8-gram
        _write_docs(tmp_path, [full, full, "tiny doc"])
        got = (doc_dup_span_coverage(str(tmp_path)).to_pandas()
               .set_index("doc_id").sort_index())
        assert (got.loc[[0, 1], "coverage"] == 1.0).all()
        assert got.loc[2, "n_grams"] == 0 and got.loc[2, "coverage"] == 0.0


@pytest.mark.usefixtures("ray_session")
class TestDedupSurvivorsAndPplBuckets:
    def test_survivors_keep_min_id_per_family(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import dedup_survivors
        base = " ".join(f"w{i}" for i in range(40))
        _write_docs(tmp_path, [base + " a", base + " b", base + " c",
                               "totally different standalone words " * 5])
        got = (dedup_survivors(str(tmp_path)).to_pandas()
               .set_index("doc_id").sort_index())
        assert got.loc[0, "is_kept"] and got.loc[0, "canonical_id"] == 0
        assert not got.loc[1, "is_kept"] and got.loc[1, "canonical_id"] == 0
        assert not got.loc[2, "is_kept"] and got.loc[2, "canonical_id"] == 0
        assert got.loc[3, "is_kept"] and got.loc[3, "canonical_id"] == 3

    def test_survivors_best_keeps_highest_quality(self, tmp_path):
        """Quality-argmax policy: the digit-laden family member loses to
        its cleaner sibling even though it has the lower doc_id; exact
        ties fall back to min id; singletons keep themselves."""
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            dedup_survivors_best,
        )
        base = " ".join(f"w{i}" for i in range(40))
        _write_docs(tmp_path, [
            base + " 111 222 333",                  # digits → lower quality
            base + " aaa bbb ccc",                  # clean → family winner
            "totally different standalone words " * 5,   # singleton
            base + " ddd eee fff",                  # same q as doc 1? no —
        ])                                           # distinct tail, same stats
        got = (dedup_survivors_best(str(tmp_path)).to_pandas()
               .set_index("doc_id").sort_index())
        # docs 1 and 3 have identical char/token/alpha/digit stats →
        # equal quality; the tie breaks to the lower id (1).
        assert got.loc[1, "is_kept"] and got.loc[1, "canonical_id"] == 1
        assert not got.loc[0, "is_kept"] and got.loc[0, "canonical_id"] == 1
        assert not got.loc[3, "is_kept"] and got.loc[3, "canonical_id"] == 1
        assert got.loc[2, "is_kept"] and got.loc[2, "canonical_id"] == 2

    def test_ppl_tertiles_balanced_and_ordered(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import doc_lang_ppl_buckets
        # 7 distinct-fluency docs in one lang: ntile sizes 3/2/2
        texts = [" ".join(np.random.RandomState(i).choice(
            ["the", "a", "of", f"rare{i}x", f"rare{i}y"], 30))
            for i in range(7)]
        _write_docs(tmp_path, texts)
        got = doc_lang_ppl_buckets(str(tmp_path)).to_pandas()
        sizes = got["ppl_bucket"].value_counts()
        assert sizes["head"] == 3 and sizes["middle"] == 2 \
            and sizes["tail"] == 2
        assert got.loc[got["ppl_bucket"] == "head", "bits_per_token"].max() \
            <= got.loc[got["ppl_bucket"] == "tail", "bits_per_token"].min()

    def test_skewed_language_spans_ranges(self, tmp_path):
        """90 %-one-language corpus with n_ranges=4: the dominant
        language is range-partitioned over several tasks, yet the
        stitched rank must reproduce the exact per-language ntile
        (sizes AND monotone label order)."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import doc_lang_ppl_buckets
        rs = np.random.RandomState(7)
        texts, langs = [], []
        for i in range(44):                      # 40 en + 4 fr
            vocab = ["the", "a", "of", "to", f"r{i}a", f"r{i}b", f"r{i}c"]
            texts.append(" ".join(rs.choice(vocab, 20 + (i % 11))))
            langs.append("fr" if i % 11 == 5 else "en")
        n = len(texts)
        t = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["web"] * n, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = doc_lang_ppl_buckets(str(tmp_path), n_ranges=4).to_pandas()
        order = {"head": 0, "middle": 1, "tail": 2}
        for lang, g in got.groupby("lang"):
            g = g.sort_values(["bits_per_token", "doc_id"])
            labs = g["ppl_bucket"].map(order).to_numpy()
            assert (np.diff(labs) >= 0).all()    # monotone along the rank
            base, extra = divmod(len(g), 3)
            want = [base + (1 if i < extra else 0) for i in range(3)]
            assert list(np.bincount(labs, minlength=3)) == want


@pytest.mark.usefixtures("ray_session")
class TestDocPostings:
    def test_cap_bounds_postings_not_df(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import doc_postings
        # 'common' in all 20 docs; 'pair' in docs 3 and 7 only
        texts = [f"common filler{i}" + (" pair" if i in (3, 7) else "")
                 for i in range(20)]
        _write_docs(tmp_path, texts)
        got = (doc_postings(str(tmp_path), cap=5).to_pandas()
               .set_index("token"))
        assert got.loc["common", "df"] == 20          # df stays exact
        assert got.loc["common", "postings"] == "0,1,2,3,4"   # capped
        assert got.loc["pair", "df"] == 2
        assert got.loc["pair", "postings"] == "3,7"
        assert "filler0" not in got.index             # min_df filter


@pytest.mark.usefixtures("ray_session")
class TestBm25:
    def test_ranking_semantics(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import doc_bm25_topk
        _write_docs(tmp_path, [
            "hash join filter",                      # all terms, short
            "hash " + "padding " * 40,               # one term, long
            "nothing relevant here at all",          # no terms -> excluded
            "join filter " + "pad " * 5,             # two terms
        ])
        got = doc_bm25_topk(str(tmp_path), k=10)
        assert got["doc_id"].tolist()[0] == 0        # best: all terms, short
        assert 2 not in got["doc_id"].tolist()       # no-term doc excluded
        s = got.set_index("doc_id")["score"]
        assert s[0] > s[3] > s[1] > 0

    def test_mixed_case_and_null_oracle_parity(self, tmp_path):
        """Engine lowercases + null-fills before tokenizing; the oracle
        must use the identical token source (ADVICE r4: the bare _CLEAN
        fragment diverged on 'Hash join filter hash' and NULL text)."""
        import duckdb

        from __ray_entry__ import _bm25_sql
        from agentic_document_extraction_pdf_ray.pipelines.documents import doc_bm25_topk
        texts = ["Hash join filter hash", "HASH " + "Padding " * 30,
                 None, "Join FILTER pad pad", "no match at all"]
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = doc_bm25_topk(str(tmp_path), k=10).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        want = con.execute(_bm25_sql()).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["score"].tolist() == want["score"].tolist()
        assert 0 in got["doc_id"].tolist()           # uppercase doc scored

    def test_postings_fed_path_bit_identical(self, tmp_path):
        """doc_bm25_from_postings (constants riding the index build)
        must reproduce doc_bm25_topk exactly — including a term absent
        from the corpus (df=0) and NULL text."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_bm25_from_postings, doc_bm25_topk,
        )
        texts = ["hash join filter hash", "hash " + "padding " * 30,
                 None, "join filter pad pad", "no match at all"]
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        terms = ("hash", "join", "nosuchterm")
        a = doc_bm25_topk(str(tmp_path), terms=terms).reset_index(drop=True)
        b = doc_bm25_from_postings(str(tmp_path),
                                   terms=terms).reset_index(drop=True)
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["score"].tolist() == b["score"].tolist()

    def test_postings_stats_rows(self, tmp_path):
        """with_stats=True emits exactly two reserved rows carrying
        N and Σdl; default output is unchanged."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            _POSTINGS_STAT_DL, _POSTINGS_STAT_N, doc_postings,
        )
        _write_docs(tmp_path, ["a b c", "a b", ""])
        got = (doc_postings(str(tmp_path), min_df=1, with_stats=True)
               .to_pandas().set_index("token"))
        assert got.loc[_POSTINGS_STAT_N, "df"] == 3
        # dl convention: '' splits to one empty token -> 3 + 2 + 1
        assert got.loc[_POSTINGS_STAT_DL, "df"] == 6
        plain = (doc_postings(str(tmp_path), min_df=1).to_pandas()
                 ["token"].tolist())
        assert _POSTINGS_STAT_N not in plain


@pytest.mark.usefixtures("ray_session")
class TestDocPackBins:
    """Sequence packing (doc_pack_bins): bin = per-source exclusive
    token prefix // budget, doc_id order. Oracle equality is in the
    auto-discovered DuckDB gate; these pin the packing semantics and
    the range-partition invariance."""

    def _run(self, d, budget, n_ranges=32):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_pack_bins,
        )
        out = doc_pack_bins(str(d), token_budget=budget,
                            n_ranges=n_ranges).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def test_budget_boundary_and_source_independence(self, tmp_path):
        # web docs: 3 + 3 + 3 tokens, budget 4 -> exclusive prefixes
        # 0,3,6 -> bins 0,0,1; books restarts its own scan at 0.
        _write_docs(tmp_path,
                    ["a b c", "d e f", "g h i", "x y z w"],
                    sources=["web", "web", "web", "books"])
        got = self._run(tmp_path, budget=4)
        by = got.set_index("doc_id")
        assert by.loc[0, "bin_id"] == 0
        assert by.loc[1, "bin_id"] == 0
        assert by.loc[2, "bin_id"] == 1
        assert by.loc[3, "bin_id"] == 0          # own source, own scan
        assert by.loc[3, "n_tokens"] == 4

    def test_range_partition_invariance(self, tmp_path):
        # the bin assignment must not depend on how many id-ranges the
        # prefix scan is split into (cross-range offsets do the work)
        rng = np.random.default_rng(3)
        texts = [" ".join(["t"] * int(k)) for k in rng.integers(1, 9, 60)]
        srcs = [("web", "books", "wiki")[i % 3] for i in range(60)]
        _write_docs(tmp_path, texts, sources=srcs)
        a = self._run(tmp_path, budget=10, n_ranges=1)
        b = self._run(tmp_path, budget=10, n_ranges=7)
        c = self._run(tmp_path, budget=10, n_ranges=32)
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)
        pd.testing.assert_frame_equal(a, c)
        # every bin except a source's last holds <= budget tokens and
        # bins are contiguous non-decreasing per source in doc_id order
        for _, g in a.groupby("source"):
            bins = g["bin_id"].to_numpy()
            assert (np.diff(bins) >= 0).all()


@pytest.mark.usefixtures("ray_session")
class TestDocChunkWindows:
    """Sliding-window chunker boundary math (oracle equality is in the
    auto-discovered DuckDB gate)."""

    def _run(self, d, window, stride):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_chunk_windows,
        )
        out = doc_chunk_windows(str(d), window=window,
                                stride=stride).to_pandas()
        return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    def test_window_and_overlap_content(self, tmp_path):
        toks = [f"t{i}" for i in range(10)]
        _write_docs(tmp_path, [" ".join(toks), "a b", ""])
        got = self._run(tmp_path, window=6, stride=4)
        d0 = got[got["doc_id"] == 0]
        # n=10, W=6, S=4 -> 1 + ceil(4/4) = 2 chunks: [0,6) and [4,10)
        assert list(d0["chunk_idx"]) == [0, 1]
        assert list(d0["chunk_text"]) == [
            " ".join(toks[0:6]), " ".join(toks[4:10])]
        assert list(d0["n_chunk_tokens"]) == [6, 6]
        # short doc: single full chunk; empty text: one empty chunk
        d1 = got[got["doc_id"] == 1]
        assert list(d1["chunk_text"]) == ["a b"]
        d2 = got[got["doc_id"] == 2]
        assert list(d2["n_chunk_tokens"]) == [1]  # split('') -> ['']
        assert list(d2["chunk_text"]) == [""]

    def test_exact_multiple_and_tail(self, tmp_path):
        # n = W + k*S exactly -> last chunk is full-width; n = W + 1
        # -> a 1-token-new tail chunk still appears (cover-all rule)
        _write_docs(tmp_path, [" ".join(["x"] * 14), " ".join(["y"] * 7)])
        got = self._run(tmp_path, window=6, stride=4)
        d0 = got[got["doc_id"] == 0]          # 14 = 6 + 2*4 -> 3 chunks
        assert list(d0["n_chunk_tokens"]) == [6, 6, 6]
        d1 = got[got["doc_id"] == 1]          # 7 = 6 + 1 -> 2 chunks
        assert list(d1["n_chunk_tokens"]) == [6, 3]
