"""Corpus curation: the canonical training-data cleaning recipe as ONE
composed plan — quality floor + language filter + exact-dedup keep-first.

This is the composition a 100-TB pre-training pipeline actually runs
(quality scoring → language ID → dedup → keep), built from the engine's
already-oracle-verified parts (doc_quality, doc_lang_id,
dedup_exact_prefix) and kept exactly SQL-expressible so the driver
hash-verifies the COMPOSITION, not just the parts.

Plan shape: one streaming map computes quality/lang/dedup-key per doc
(no shuffle), then ONE bounded-bucket groupby on the dedup-key hash
decides keep-first per key — the only exchange. Filters apply after the
dedup decision (dedup is corpus-level identity; a low-quality duplicate
must not resurrect its twin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import hash_str_array
from .documents import (
    _norm_ws, lang_id_arrays, quality_arrays, read_documents,
)

QUALITY_FLOOR_X100 = 6000          # quality score ≥ 0.60
KEEP_LANG = "en"
PREFIX_TOKENS = 8                  # dedup key = first-8-token prefix


def curate_corpus(sf_dir: str, quality_floor_x100: int = QUALITY_FLOOR_X100,
                  keep_lang: str = KEEP_LANG,
                  n_buckets: int = 64) -> ray.data.Dataset:
    """Kept documents: (doc_id, quality_x100, predicted_lang)."""

    def metrics(batch: pa.Table) -> pd.DataFrame:
        # one shared kernel per signal — curate IS the composition of the
        # already-oracle-verified parts, not a re-derivation of them
        clean = _norm_ws(batch["text"])
        _, _, _, _, quality = quality_arrays(clean)
        texts = batch["text"].to_pylist()
        _, _, _, _, lang = lang_id_arrays(texts)
        keys = [" ".join((clean[i].as_py() or "").split(" ")[:PREFIX_TOKENS])
                for i in range(len(texts))]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "quality_x100": quality,
            "predicted_lang": lang,
            "norm_key": keys,
            "_kb": (hash_str_array(keys) % np.uint64(n_buckets)).astype(np.int64),
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        keeper = g.groupby("norm_key", as_index=False).agg(
            _keeper=("doc_id", "min"))
        m = g.merge(keeper, on="norm_key")
        m = m[m["doc_id"] == m["_keeper"]]
        m = m[(m["quality_x100"] >= quality_floor_x100)
              & (m["predicted_lang"] == keep_lang)]
        return m[["doc_id", "quality_x100", "predicted_lang"]]

    return (read_documents(sf_dir).map_batches(metrics, batch_format="pyarrow")
            .groupby("_kb").map_groups(keep_first, batch_format="pandas"))


CURATE_ORACLE_SQL = """
    WITH c AS (SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS ct,
                      lower(text) AS lt FROM documents),
    m AS (SELECT doc_id,
                 CAST(length(ct) AS BIGINT) AS n_chars,
                 CAST(len(string_split_regex(ct, '\\s+')) AS BIGINT) AS n_tokens,
                 CAST(length(regexp_replace(ct, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha,
                 CAST(length(regexp_replace(ct, '[^0-9]', '', 'g')) AS BIGINT) AS digit
          FROM c),
    q AS (SELECT doc_id,
                 CAST(floor((0.4 * (alpha / CAST(greatest(n_chars, 1) AS DOUBLE))
                           + 0.3 * least(1.0, n_tokens / 100.0)
                           + 0.3 * (1.0 - digit / CAST(greatest(n_chars, 1) AS DOUBLE)))
                          * 10000 + 0.5) AS BIGINT) AS quality_x100
          FROM m),
    toks AS (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS tk FROM documents),
    lc AS (SELECT doc_id,
             CAST(len(list_filter(tk, x -> list_contains(['the','and','of','to','a','in','is'], x))) AS BIGINT) AS en_n,
             CAST(len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS BIGINT) AS de_n,
             CAST(len(list_filter(tk, x -> list_contains(['el','la','los','que','y','es'], x))) AS BIGINT) AS es_n,
             CAST(len(list_filter(tk, x -> list_contains(['le','les','des','et','est','une'], x))) AS BIGINT) AS fr_n
           FROM toks),
    lang AS (SELECT doc_id,
             CASE WHEN en_n >= de_n AND en_n >= es_n AND en_n >= fr_n THEN 'en'
                  WHEN de_n >= es_n AND de_n >= fr_n THEN 'de'
                  WHEN es_n >= fr_n THEN 'es' ELSE 'fr' END AS predicted_lang
             FROM lc),
    k AS (SELECT doc_id,
                 array_to_string(list_slice(string_split(ct, ' '), 1, 8), ' ') AS norm_key
          FROM c),
    keepers AS (SELECT norm_key, min(doc_id) AS keeper FROM k GROUP BY norm_key)
    SELECT q.doc_id, q.quality_x100, lang.predicted_lang
    FROM q JOIN lang USING (doc_id) JOIN k USING (doc_id)
    JOIN keepers ON k.norm_key = keepers.norm_key AND k.doc_id = keepers.keeper
    WHERE q.quality_x100 >= 6000 AND lang.predicted_lang = 'en'
"""
