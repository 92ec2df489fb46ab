"""Engine-vs-oracle agreement on an ADVERSARIAL corpus.

The driver-graded corpora are all-lowercase with zero NULL / empty
texts, so an engine/oracle pair that silently disagrees on ``lower()``
/ ``coalesce(text, '')`` conventions still gate-passes (the round-4
ADVICE ``doc_bm25_topk`` finding was exactly this class). This suite
re-runs the queries that FAILED the round-5 adversarial audit — before
the NULL-safe ``_norm_ws`` / ``_CLEAN`` convention landed — on a corpus
with mixed case, NULL text, empty / whitespace-only text, unicode
accents, tabs / newlines and padded ends (``scripts/
adversarial_corpus.py``), hash-comparing engine output against the
DuckDB oracle exactly like the driver does.
"""

import hashlib
import subprocess
import sys

import duckdb
import pandas as pd
import pytest

# every query that crashed or hash-diverged on the adversarial corpus
# before the NULL-safe normalize convention (round-5 audit)
REGRESSED = [
    "doc_fingerprint",          # engine crash: None.encode
    "doc_curation_report",      # engine crash via the fused fingerprint
    "doc_dup_span_coverage",
    "doc_cdc_chunks",
    "doc_cdc_dedup_ratio",
    "doc_curriculum_order",
    "doc_budget_select",
    "doc_code_validation",      # oracle NULL list -> float column
    "doc_length_shards",
    "dedup_exact_prefix",
    "doc_fuzzy_pairs",
    # convention-critical anchors that already passed (keep them honest)
    "doc_normalize", "doc_token_stats", "doc_bm25_topk", "doc_postings",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")
    subprocess.run([sys.executable, "scripts/adversarial_corpus.py",
                    str(d)], check=True)
    return str(d)


@pytest.fixture(scope="module")
def duck(adv_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{adv_dir}/{t}.parquet')")
    return con


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", REGRESSED)
def test_query_matches_oracle_on_adversarial_corpus(name, adv_dir, duck):
    import __ray_entry__ as e
    res = e.queries()[name](adv_dir)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    want = duck.execute(e.oracle_sql()[name]).fetchdf()
    assert len(got) == len(want), name
    assert sorted(got.columns) == sorted(want.columns), name
    assert _value_hash(got) == _value_hash(want), name


class TestEmbeddingContractFailFast:
    """Embeddings are a typed internal product: NULL / non-finite
    vectors must raise a CLEAR error, never flow through matmuls as
    silently-wrong similarities."""

    def _write(self, tmp_path, vecs):
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32())})
        pq.write_table(t, f"{tmp_path}/embeddings.parquet")
        return str(tmp_path)

    @pytest.mark.usefixtures("ray_session")
    def test_nan_component_raises(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            ann_topk, embedding_norm_outliers,
        )
        sf = self._write(tmp_path, [[1.0, 2.0], [float("nan"), 4.0],
                                    [5.0, 6.0]])
        with pytest.raises(Exception, match="non-finite|corruption"):
            ann_topk(sf, k=1, n_queries=1)
        with pytest.raises(Exception, match="non-finite|corruption"):
            embedding_norm_outliers(sf).count()

    @pytest.mark.usefixtures("ray_session")
    def test_null_vector_raises(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_norm_outliers,
        )
        sf = self._write(tmp_path, [[1.0, 2.0], None, [5.0, 6.0]])
        with pytest.raises(Exception, match="NULL embedding|corruption|ragged|reshape"):
            embedding_norm_outliers(sf).count()
