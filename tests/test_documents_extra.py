"""Round-3 document-operator additions: Gopher repetition filters,
per-source KL divergence, grouped bottom-k sampling.

Designed tiny fixtures with hand-computed expectations; the DuckDB oracle
comparison runs separately in test_queries_vs_duckdb.py."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, name, **cols):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(pa.table(cols), str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestRepetitionStats:
    def test_designed_values(self, tmp_path):
        """doc 0: 'a b' occurs 3x among 5 2-grams of 6 tokens; 3 lines of
        which 'dup' repeats (2 dup lines of 3 total, 6 of 16 chars)."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_repetition_stats,
        )
        sf = _write_docs(
            tmp_path, "rep",
            doc_id=pa.array([0, 1], pa.int64()),
            text=pa.array(["dup\ndup\nlongerline\na b a b a b",
                           "no repeats at all"], pa.string()),
        )
        out = (doc_repetition_stats(sf).to_pandas()
               .set_index("doc_id").sort_index())
        # doc 0 lines: dup, dup, longerline, a b a b a b ->
        #   4 lines, 'dup' dup'd (2 rows), chars 3+3+10+11=27, dup chars 6
        assert out.loc[0, "frac_dup_lines"] == 2 / 4
        assert out.loc[0, "frac_dup_line_chars"] == 6 / 27
        # clean text 'dup dup longerline a b a b a b': 2-gram 'a b' x3,
        # 'b a' x2, 'dup dup' x1 ... champion 'a b' -> 3*3 chars / 30
        assert out.loc[0, "top_2gram"] == "a b"
        assert out.loc[0, "frac_top_2gram"] == 9 / len(
            "dup dup longerline a b a b a b")
        assert out.loc[1, "frac_dup_lines"] == 0.0
        # all 2-grams unique -> champion is lexicographically smallest
        assert out.loc[1, "top_2gram"] == "at all"

    def test_tiebreak_lexicographic(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_repetition_stats,
        )
        sf = _write_docs(
            tmp_path, "tie",
            doc_id=pa.array([0], pa.int64()),
            text=pa.array(["z y z y b a b a"], pa.string()),
        )
        out = doc_repetition_stats(sf).to_pandas()
        # 'b a' and 'z y' both occur twice; 'a b' and 'y z' once each.
        assert out.loc[0, "top_2gram"] == "b a"


@pytest.mark.usefixtures("ray_session")
class TestSourceTokenKL:
    def test_identical_sources_zero_kl(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            source_token_kl,
        )
        sf = _write_docs(
            tmp_path, "kl0",
            doc_id=pa.array([0, 1], pa.int64()),
            text=pa.array(["a b c d", "a b c d"], pa.string()),
            source=pa.array(["s1", "s2"], pa.string()),
        )
        out = source_token_kl(sf).set_index("source")
        assert out.loc["s1", "kl"] == 0.0 and out.loc["s2", "kl"] == 0.0
        assert out.loc["s1", "n_tokens"] == 4

    def test_disjoint_sources_known_kl(self, tmp_path):
        """Disjoint vocabularies, equal sizes: p_t = p_st/2 for every
        token of the source, so KL = log2(2) = 1 bit exactly."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            source_token_kl,
        )
        sf = _write_docs(
            tmp_path, "kl1",
            doc_id=pa.array([0, 1], pa.int64()),
            text=pa.array(["a a b c", "x y z w"], pa.string()),
            source=pa.array(["s1", "s2"], pa.string()),
        )
        out = source_token_kl(sf).set_index("source")
        assert out.loc["s1", "kl"] == 1.0 and out.loc["s2", "kl"] == 1.0


@pytest.mark.usefixtures("ray_session")
class TestPerLangSample:
    def test_size_and_determinism(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_per_lang_sample,
        )
        rng = np.random.RandomState(7)
        langs = rng.choice(["en", "de", "fr"], size=60)
        sf = _write_docs(
            tmp_path, "pls",
            doc_id=pa.array(range(60), pa.int64()),
            text=pa.array(["t"] * 60, pa.string()),
            lang=pa.array(langs, pa.string()),
        )
        out = doc_per_lang_sample(sf, k=5)
        assert (out.groupby("lang").size() == 5).all()
        assert set(out["rank"]) == {1, 2, 3, 4, 5}
        # brute-force reference: 5 smallest md5(doc_id|pls) per lang
        keys = {i: hashlib.md5(f"{i}|pls".encode()).hexdigest()
                for i in range(60)}
        for lang in ("en", "de", "fr"):
            ids = [i for i in range(60) if langs[i] == lang]
            want = sorted(ids, key=lambda i: (keys[i], i))[:5]
            got = (out[out["lang"] == lang].sort_values("rank")["doc_id"]
                   .tolist())
            assert got == want


@pytest.mark.usefixtures("ray_session")
class TestQualityDeciles:
    def test_matches_bruteforce(self):
        import pyarrow.compute as pc

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            _norm_ws, doc_quality_deciles, quality_arrays,
        )
        sf = "/root/testdata/sf0.001"
        tbl = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
        *_, qx = quality_arrays(_norm_ws(tbl["text"]))
        qx = np.sort(qx)
        n = len(qx)
        got = doc_quality_deciles(sf).set_index("decile")
        for d in range(1, 10):
            thr = (d * n + 9) // 10
            assert got.loc[d, "quality_x100"] == qx[thr - 1]

    def test_monotone(self):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_quality_deciles,
        )
        out = doc_quality_deciles("/root/testdata/sf0.001")
        assert (np.diff(out["quality_x100"].to_numpy()) >= 0).all()


@pytest.mark.usefixtures("ray_session")
class TestUnigramLogprob:
    def test_known_distribution(self, tmp_path):
        """Corpus 'a a' + 'a b': N=4, n_a=3, n_b=1. doc0 bits/token =
        log2(4/3); doc1 = (log2(4/3) + log2(4)) / 2."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_unigram_logprob,
        )
        sf = _write_docs(
            tmp_path, "lm",
            doc_id=pa.array([0, 1], pa.int64()),
            text=pa.array(["a a", "a b"], pa.string()),
        )
        out = doc_unigram_logprob(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_tokens"] == 2
        assert out.loc[0, "bits_per_token"] == round(np.log2(4 / 3), 6)
        assert out.loc[1, "bits_per_token"] == round(
            (np.log2(4 / 3) + 2.0) / 2, 6)

    def test_uniform_corpus(self, tmp_path):
        """Every token unique -> every doc scores exactly log2(N)."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_unigram_logprob,
        )
        sf = _write_docs(
            tmp_path, "lmu",
            doc_id=pa.array([0, 1], pa.int64()),
            text=pa.array(["t1 t2 t3 t4", "t5 t6 t7 t8"], pa.string()),
        )
        out = doc_unigram_logprob(sf).to_pandas()
        assert (out["bits_per_token"] == 3.0).all()


@pytest.mark.usefixtures("ray_session")
class TestLmBackoffScore:
    @staticmethod
    def _brute(texts_by_id, lm_mod=7):
        import math
        toks = {i: [t for t in " ".join(s.lower().split()).split(" ")
                    if t] for i, s in texts_by_id.items()}
        c1, c12 = {}, {}
        n = 0
        for i, ts in toks.items():
            if i % lm_mod == 0:
                n += len(ts)
                for t in ts:
                    c1[t] = c1.get(t, 0) + 1
                for a, b in zip(ts, ts[1:]):
                    c12[(a, b)] = c12.get((a, b), 0) + 1
        out = {}
        for i, ts in toks.items():
            if i % lm_mod == 0 or len(ts) < 2:
                continue
            score, m_tot = 0.0, 0
            pairs = {}
            for a, b in zip(ts, ts[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
            for (a, b), m in pairs.items():
                if (a, b) in c12:
                    s = math.log10(c12[(a, b)] / max(c1.get(a, 0), 1))
                else:
                    s = math.log10(0.4 * max(c1.get(b, 0), 1) / n)
                score += m * s
                m_tot += m
            out[i] = (m_tot, round(score, 6))
        return out

    def test_all_three_branches(self, tmp_path):
        """doc 7 is also LM; doc 1 has a seen bigram ('the cat', c12=2,
        c1(the)=3), a backoff pair ('cat runs': 'runs' seen c2=1) and a
        full-OOV pair ('runs zz')."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_lm_backoff_score,
        )
        texts = {0: "the cat sat the cat sat", 7: "a dog runs",
                 1: "the cat runs zz", 2: "the cat sat"}
        sf = _write_docs(
            tmp_path, "lmb",
            doc_id=pa.array(sorted(texts), pa.int64()),
            text=pa.array([texts[i] for i in sorted(texts)], pa.string()),
        )
        got = (doc_lm_backoff_score(sf).to_pandas()
               .set_index("doc_id").sort_index())
        want = self._brute(texts)
        assert set(got.index) == set(want)
        for i, (m, s) in want.items():
            assert got.loc[i, "n_pairs"] == m
            assert got.loc[i, "log10_score"] == pytest.approx(s, abs=2e-6)

    def test_randomized_vs_bruteforce(self, tmp_path):
        rng = np.random.RandomState(11)
        vocab = [f"w{j}" for j in range(30)]
        texts = {i: " ".join(rng.choice(vocab, size=rng.randint(2, 25)))
                 for i in range(40)}
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_lm_backoff_score,
        )
        sf = _write_docs(
            tmp_path, "lmbr",
            doc_id=pa.array(sorted(texts), pa.int64()),
            text=pa.array([texts[i] for i in sorted(texts)], pa.string()),
        )
        got = (doc_lm_backoff_score(sf).to_pandas()
               .set_index("doc_id").sort_index())
        want = self._brute(texts)
        assert set(got.index) == set(want)
        for i, (m, s) in want.items():
            assert got.loc[i, "n_pairs"] == m
            assert got.loc[i, "log10_score"] == pytest.approx(s, abs=2e-6)


@pytest.mark.usefixtures("ray_session")
class TestCompressionRatio:
    def test_matches_direct_zlib(self):
        import re
        import zlib

        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_compression_ratio,
        )
        sf = "/root/testdata/sf0.001"
        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        out = doc_compression_ratio(sf).to_pandas().set_index("doc_id")
        import pyarrow as pa
        import pyarrow.compute as pc
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pa.array(docs["text"].fillna(""), pa.string()), r"\s+", " "))
        n_checked = 0
        for did, t in zip(docs["doc_id"], norm.to_pylist()):
            b = t.encode()
            if not b:
                assert did not in out.index
                continue
            row = out.loc[did]
            assert row["n_bytes"] == len(b)
            assert row["n_compressed"] == len(zlib.compress(b, 6))
            r = round(len(zlib.compress(b, 6)) / len(b), 6)
            assert row["compression_ratio"] == r
            assert row["keep"] == ((0.30 <= r <= 0.95)
                                   or len(b) < 256)
            n_checked += 1
        assert n_checked == len(out)

    def test_tails_are_dropped(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_compression_ratio,
        )
        sf = _write_docs(
            tmp_path, "cz",
            doc_id=pa.array([0, 1], pa.int64()),
            text=pa.array(["spam " * 2000,               # hyper-compressible
                           " ".join(hashlib.md5(str(i).encode())
                                    .hexdigest()[:7]
                                    for i in range(80))],   # ratio ~0.58
                          pa.string()),
        )
        out = doc_compression_ratio(sf).to_pandas().set_index("doc_id")
        assert bool(out.loc[0, "keep"]) is False
        assert out.loc[0, "compression_ratio"] < 0.05
        assert bool(out.loc[1, "keep"]) is True


@pytest.mark.usefixtures("ray_session")
class TestHapaxRisk:
    def test_designed_values(self, tmp_path):
        """tokens: 'common' in all three docs (df=3); 'xkey9' only in
        doc 0 (hapax); 'share2' in docs 1+2 (df=2); 'zid7' only in
        doc 2 (hapax, repeated within the doc but still ONE distinct
        token); doc 3 is empty."""
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_hapax_risk,
        )
        sf = _write_docs(
            tmp_path, "hx",
            doc_id=pa.array([0, 1, 2, 3], pa.int64()),
            text=pa.array(["common xkey9",
                           "common share2",
                           "common share2 zid7 zid7",
                           ""], pa.string()),
            lang=pa.array(["en"] * 4, pa.string()),
            source=pa.array(["s"] * 4, pa.string()),
            n_chars=pa.array([12, 13, 23, 0], pa.int64()))
        out = (doc_hapax_risk(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [0, 1, 2, 3]
        assert out["n_distinct"].tolist() == [2, 2, 3, 0]
        assert out["n_hapax"].tolist() == [1, 0, 1, 0]
        assert out["hapax_frac"].tolist() == [0.5, 0.0,
                                              round(1 / 3, 6), 0.0]


@pytest.mark.usefixtures("ray_session")
class TestTemplateDetect:
    def test_digit_masked_families(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_template_detect,
        )
        # docs 0/2 differ only in numbers (one family, canonical 0);
        # doc 1 differs in a WORD (its own family); doc 3 differs only
        # in whitespace+case from doc 0's skeleton (same family)
        sf = _write_docs(
            tmp_path, "tpl",
            doc_id=pa.array([0, 1, 2, 3], pa.int64()),
            text=pa.array(["Invoice 123 total 45.60 due 2026",
                           "Receipt 123 total 45.60 due 2026",
                           "Invoice 999 total 1.23 due 1999",
                           "  invoice 7  TOTAL 8.9 due 12  "],
                          pa.string()),
            lang=pa.array(["en"] * 4, pa.string()),
            source=pa.array(["s"] * 4, pa.string()),
            n_chars=pa.array([32, 32, 31, 30], pa.int64()))
        out = (doc_template_detect(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out.loc[0, "skeleton_key"] == out.loc[2, "skeleton_key"]
        assert out.loc[0, "skeleton_key"] == out.loc[3, "skeleton_key"]
        assert out.loc[1, "skeleton_key"] != out.loc[0, "skeleton_key"]
        assert out["n_docs"].tolist() == [3, 1, 3, 3]
        assert out["canonical_doc_id"].tolist() == [0, 1, 0, 0]
        assert out["keep"].tolist() == [True, True, False, False]
