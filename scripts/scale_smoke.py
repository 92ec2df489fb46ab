"""Round-4 scale smoke (VERDICT r3 #6): the round-3 operator families at
10× sf0.1 — 50k documents / 1M events — against the same operators at
sf0.1, recorded in BASELINE.md ("Round-3 operator families at 10×").

Corpus: sf0.1 tiled ×10 with per-copy perturbation (every copy appends a
distinct token to the text, so each source doc becomes a 10-member
near-dup family — the duplicate-heavy worst case, same convention as the
round-2 "Dedup family at 10×" table). Events get shifted ids/timestamps
and keep their users, so per-user/day densities grow 10×.

The graph family runs LSH-FED (pairs=minhash_lsh_pairs) — the corpus-
scale composition the round-3 verdict asked to evidence; the exact
n-gram pair plan is the small-scale verification path only.

``--x100`` (VERDICT r4 ask #8): 100× — 500k documents, every source doc
a 100-member near-dup family — for the operators whose EXCHANGES grow
with duplicate density (`doc_dup_span_coverage`, `dedup_survivors[lsh]`,
`doc_lang_ppl_buckets`, `doc_postings`). The 100× corpus additionally
skews language: tiles 10–99 are forced to 'en', so one language holds
≥ 90 % of docs — the regime the range-partitioned per-language rank
(r5 ask #1) must spread over many tasks instead of one.

Usage:
    python scripts/scale_smoke.py               # 10x scales + report
    python scripts/scale_smoke.py --x100        # 100x dup-density ops
    python scripts/scale_smoke.py --tile-only   # just build /tmp corpus
    python scripts/scale_smoke.py --r5ops       # round-5 closing ops 10x
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale10x"
TILES = 10


def build_tiled(base: str, out: str, tiles: int = TILES) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(f"{base}/documents.parquet")
    parts = []
    for c in range(tiles):
        t = docs
        if c:
            text = pc.binary_join_element_wise(
                t["text"], f"tile{c}", " ")
            t = t.set_column(t.schema.get_field_index("text"), "text", text)
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                             pc.cast(pc.utf8_length(text), pa.int64()))
        t = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pc.add(t["doc_id"], pa.scalar(c * 10_000_000, pa.int64())))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{out}/documents.parquet",
                   row_group_size=8192)

    ev = pq.read_table(f"{base}/events.parquet")
    parts = []
    for c in range(tiles):
        t = ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pc.add(ev["event_id"], pa.scalar(c * 100_000_000, pa.int64())))
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts",
            pc.add(t["ts"], pa.scalar(c, pa.duration("s"))))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet",
                   row_group_size=32768)
    emb = pq.read_table(f"{base}/embeddings.parquet")
    parts = []
    for c in range(tiles):
        # identical copies per tile: the semantic-dedup worst case
        # (every cluster is 10x denser and full of exact twins)
        t = emb.set_column(
            emb.schema.get_field_index("vec_id"), "vec_id",
            pc.add(emb["vec_id"], pa.scalar(c * 10_000_000, pa.int64())))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet",
                   row_group_size=8192)
    # tables the family doesn't read can stay at base scale
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        src = f"{base}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")


def run_family(sf_dir: str) -> dict[str, dict]:
    from agentic_document_extraction_pdf_ray.pipelines import (
        dedup, documents, events, similarity,
    )

    res: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        import pandas as _pd
        n = len(out) if isinstance(out, _pd.DataFrame) else out.count()
        res[name] = {"rows": int(n), "wall_sec": round(time.time() - t0, 2)}
        print(f"  {name}: {n} rows, {res[name]['wall_sec']}s", flush=True)

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(sf_dir).materialize()
    res["minhash_lsh_pairs"] = {"rows": int(pairs.count()),
                                "wall_sec": round(time.time() - t0, 2)}
    print(f"  minhash_lsh_pairs: {res['minhash_lsh_pairs']}", flush=True)

    timed("dup_degree_hist[lsh]",
          lambda: dedup.dup_degree_hist(sf_dir, pairs=pairs))
    timed("dup_source_matrix[lsh]",
          lambda: dedup.dup_source_matrix(sf_dir, pairs=pairs))
    timed("dup_clustering_coeff[lsh]",
          lambda: dedup.dup_clustering_coeff(sf_dir, pairs=pairs))
    timed("dup_pagerank[lsh]",
          lambda: dedup.dup_pagerank(sf_dir, pairs=pairs))
    timed("doc_dup_components[lsh]",
          lambda: dedup.doc_dup_components(sf_dir, pairs=pairs))
    timed("doc_bigram_pmi", lambda: documents.doc_bigram_pmi(sf_dir))
    timed("doc_decontaminate", lambda: dedup.doc_decontaminate(sf_dir))
    timed("doc_line_dedup", lambda: dedup.doc_line_dedup(sf_dir))
    timed("events_rolling_distinct_users",
          lambda: events.events_rolling_distinct_users(sf_dir))
    # round-4 operators
    timed("dedup_survivors[lsh]",
          lambda: dedup.dedup_survivors(sf_dir, pairs=pairs))
    timed("doc_dup_span_coverage",
          lambda: dedup.doc_dup_span_coverage(sf_dir))
    timed("embedding_semdedup",
          lambda: similarity.embedding_semdedup(sf_dir))
    timed("source_mix_weights",
          lambda: documents.source_mix_weights(sf_dir))
    timed("doc_lang_ppl_buckets",
          lambda: documents.doc_lang_ppl_buckets(sf_dir))
    return res


OUT100 = "/tmp/scale100x"


def build_docs_tiled(base: str, out: str, tiles: int,
                     skew_lang: bool = False) -> None:
    """documents + embeddings tiling (the only tables the x100 family
    reads); with ``skew_lang``, tiles >= tiles//10 are forced to 'en' so
    one language dominates (>= 90 %)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(f"{base}/documents.parquet")
    writer = pq.ParquetWriter(f"{out}/documents.parquet",
                              docs.schema)
    for c in range(tiles):
        t = docs
        if c:
            text = pc.binary_join_element_wise(t["text"], f"tile{c}", " ")
            t = t.set_column(t.schema.get_field_index("text"), "text", text)
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                             pc.cast(pc.utf8_length(text), pa.int64()))
        if skew_lang and c >= tiles // 10:
            t = t.set_column(
                t.schema.get_field_index("lang"), "lang",
                pa.array(["en"] * len(t), pa.string()))
        t = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pc.add(t["doc_id"], pa.scalar(c * 10_000_000, pa.int64())))
        writer.write_table(t, row_group_size=16384)
    writer.close()

    # the embeddings-reading member of the x100 family (embedding_quantize)
    # needs the table present at the same scale factor
    emb = pq.read_table(f"{base}/embeddings.parquet")
    ew = pq.ParquetWriter(f"{out}/embeddings.parquet", emb.schema)
    for c in range(tiles):
        t = emb.set_column(
            emb.schema.get_field_index("vec_id"), "vec_id",
            pc.add(emb["vec_id"], pa.scalar(c * 10_000_000, pa.int64())))
        ew.write_table(t, row_group_size=16384)
    ew.close()


def run_x100_family(sf_dir: str) -> dict[str, dict]:
    from agentic_document_extraction_pdf_ray.pipelines import dedup, documents

    res: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        import pandas as _pd
        n = len(out) if isinstance(out, _pd.DataFrame) else out.count()
        res[name] = {"rows": int(n), "wall_sec": round(time.time() - t0, 2)}
        print(f"  {name}: {n} rows, {res[name]['wall_sec']}s", flush=True)

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(sf_dir).materialize()
    res["minhash_lsh_pairs"] = {"rows": int(pairs.count()),
                                "wall_sec": round(time.time() - t0, 2)}
    print(f"  minhash_lsh_pairs: {res['minhash_lsh_pairs']}", flush=True)
    timed("dedup_survivors[lsh]",
          lambda: dedup.dedup_survivors(sf_dir, pairs=pairs))
    timed("doc_dup_span_coverage",
          lambda: dedup.doc_dup_span_coverage(sf_dir))
    timed("doc_postings", lambda: documents.doc_postings(sf_dir))
    timed("doc_lang_ppl_buckets",
          lambda: documents.doc_lang_ppl_buckets(sf_dir))
    # round-5 additions: the packing prefix-scan (range-partitioned —
    # the source-skew-proof claim) and the no-exchange chunker.
    timed("doc_pack_bins", lambda: documents.doc_pack_bins(sf_dir))
    timed("doc_chunk_windows",
          lambda: documents.doc_chunk_windows(sf_dir))
    # round-5 late additions: the no-exchange RE2 scrub, the 256-range
    # epoch-shuffle rank (its sort exchange grows with the corpus), and
    # the two-pass no-exchange quantizer (embeddings table).
    from agentic_document_extraction_pdf_ray.pipelines import similarity
    timed("doc_pii_scrub", lambda: documents.doc_pii_scrub(sf_dir))
    timed("doc_epoch_shuffle",
          lambda: documents.doc_epoch_shuffle(sf_dir))
    timed("embedding_quantize",
          lambda: similarity.embedding_quantize(sf_dir))
    # round-5 final additions: the DSIR two-pass (bounded K=1024 bucket
    # stats + no-exchange apply) and the trigram-diversity single
    # token-keyed exchange (its (source, trigram) partial volume grows
    # with the corpus).
    timed("doc_dsir_weights",
          lambda: documents.doc_dsir_weights(sf_dir))
    timed("source_trigram_diversity",
          lambda: documents.source_trigram_diversity(sf_dir))
    # closing additions: the quality-range budget scan (its pruning
    # claim — ~3/4 of the corpus never enters the exchange — is what
    # the 100x run exercises), the fixed-broadcast Bloom incremental
    # dedup (misses answered with zero shuffle bytes), and the
    # bounded-partial temperature-weights fold.
    timed("doc_budget_select",
          lambda: documents.doc_budget_select(sf_dir))
    timed("dedup_incremental",
          lambda: dedup.dedup_incremental(sf_dir))
    timed("lang_temperature_weights",
          lambda: documents.lang_temperature_weights(sf_dir))
    # this session's additions: the vocab-Jaccard set-similarity join
    # (its (source, token) DISTINCT partial volume grows with corpus
    # vocab), the shingle semi-join + doc-bucket source attach (both
    # sides corpus-sized), the GloVe window-pair combiner (pair partials
    # bounded by vocab² per batch), and the composite-range curriculum
    # rank (its sort exchange grows with the corpus).
    timed("source_vocab_overlap",
          lambda: documents.source_vocab_overlap(sf_dir))
    timed("source_contamination_matrix",
          lambda: dedup.source_contamination_matrix(sf_dir))
    timed("token_cooccurrence",
          lambda: documents.token_cooccurrence(sf_dir))
    timed("doc_curriculum_order",
          lambda: documents.doc_curriculum_order(sf_dir))
    # pair-generating additions (the dup-density-sensitive class): the
    # sparse-cosine three-shuffle and the lossless prefix-containment
    # blocking — the tiled corpus makes every source doc a 100-member
    # shared-prefix family, the worst case for both.
    timed("doc_count_cosine_pairs",
          lambda: dedup.doc_count_cosine_pairs(sf_dir))
    timed("doc_prefix_containment",
          lambda: dedup.doc_prefix_containment(sf_dir))
    # SoftDeDup composes the CC family with two more bucketed attaches
    # (LSH-fed here, like the survivors row); dim-variance is the
    # no-exchange fixed-d partial fold.
    timed("doc_softdedup_weights[lsh]",
          lambda: dedup.doc_softdedup_weights(
              sf_dir, pairs=dedup.minhash_lsh_pairs(sf_dir)))
    timed("embedding_dim_variance",
          lambda: similarity.embedding_dim_variance(sf_dir))
    # final-session additions: the Stupid-Backoff LM (its scored
    # bigram-TYPE partial volume grows with the corpus — three
    # token/doc-keyed bucket folds), and the label-confined kNN graph
    # over the x100 embeddings (50k vectors, every cluster 100x denser
    # and full of exact twins — the Σ|c|² worst case shared with
    # semdedup; forced onto the scale route, never the broadcast one).
    timed("doc_lm_backoff_score",
          lambda: documents.doc_lm_backoff_score(sf_dir))
    timed("embedding_knn_graph[labels]",
          lambda: similarity.embedding_knn_graph(
              sf_dir, max_broadcast_rows=0))
    # closing-session additions: CDC chunking (its chunk_hash exchange
    # grows with the corpus AND the tiled corpus makes every chunk a
    # 100-copy dup family — the transform("size") worst case), its
    # doc-level ratio fold, the containment twin of the jaccard pair
    # plan, and the bounded-histogram winsor/KS pair (the claim under
    # test: the exchange stays <= #sources x 10001 however large the
    # input).
    timed("doc_cdc_chunks", lambda: dedup.doc_cdc_chunks(sf_dir))
    timed("doc_cdc_dedup_ratio",
          lambda: dedup.doc_cdc_dedup_ratio(sf_dir))
    timed("doc_ngram_containment",
          lambda: dedup.doc_ngram_containment(sf_dir))
    timed("source_quality_winsor",
          lambda: documents.source_quality_winsor(sf_dir))
    timed("source_quality_ks",
          lambda: documents.source_quality_ks(sf_dir))
    # chunked-broadcast hard negatives over the x100 embeddings: forced
    # into multi-chunk streaming (chunk_rows far below the corpus) so
    # the per-task memory bound — batch x ONE chunk — is what runs.
    timed("embedding_hard_negatives[chunked]",
          lambda: similarity.embedding_hard_negatives(
              sf_dir, chunk_rows=8192))
    return res


def report_lang_spread(sf_dir: str, n_ranges: int = 32) -> dict:
    """Evidence for r5 ask #1: the largest single (lang, bits-range)
    task slice vs the dominant language's total row count, recomputed
    from the operator output with the operator's own boundary helper
    (exact quantiles of the full output bits — the sampled in-operator
    boundaries approximate these)."""
    import numpy as np

    from agentic_document_extraction_pdf_ray.pipelines.documents import (
        doc_lang_ppl_buckets, ppl_range_boundaries,
    )
    out = doc_lang_ppl_buckets(sf_dir, n_ranges=n_ranges).to_pandas()
    bnd = ppl_range_boundaries(
        out["bits_per_token"].to_numpy(np.float64), n_ranges)
    r = np.searchsorted(bnd, out["bits_per_token"].to_numpy(np.float64),
                        side="right")
    cell = out.groupby([out["lang"], r]).size()
    lang_n = out.groupby("lang").size()
    return {"n_docs": int(len(out)),
            "dominant_lang_rows": int(lang_n.max()),
            "dominant_share": round(float(lang_n.max()) / len(out), 3),
            "max_task_rows": int(cell.max()),
            "n_task_slices": int(len(cell))}


def run_r5ops_family(sf_dir: str, transcripts_dir: str) -> dict[str, dict]:
    """Round-5 closing-session operators at base vs 10× (VERDICT r4 #8
    convention): the ops whose exchanges grow with corpus size —
    line-grain stock mining, the hash-manifest diff, the pair-expanding
    audience overlap — plus the conv-bucket screens over a 10× turn
    stream."""
    from agentic_document_extraction_pdf_ray.pipelines import (
        documents, events, extract, relational,
    )

    res: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        import pandas as _pd
        n = len(out) if isinstance(out, _pd.DataFrame) else out.count()
        res[name] = {"rows": int(n), "wall_sec": round(time.time() - t0, 2)}
        print(f"  {name}: {n} rows, {res[name]['wall_sec']}s", flush=True)

    timed("doc_link_density", lambda: documents.doc_link_density(sf_dir))
    timed("doc_readability", lambda: documents.doc_readability(sf_dir))
    timed("corpus_snapshot_diff",
          lambda: documents.corpus_snapshot_diff(sf_dir))
    timed("events_type_overlap",
          lambda: events.events_type_overlap(sf_dir))
    timed("events_cusum_changepoint",
          lambda: events.events_cusum_changepoint(sf_dir))
    timed("fk_integrity_audit",
          lambda: relational.fk_integrity_audit(sf_dir))
    timed("orders_monthly_yoy",
          lambda: relational.orders_monthly_yoy(sf_dir))
    timed("conv_stock_lines",
          lambda: extract.conv_stock_lines(transcripts_dir))
    timed("conv_link_domains",
          lambda: extract.conv_link_domains(transcripts_dir))
    timed("conv_tool_transitions",
          lambda: extract.conv_tool_transitions(transcripts_dir))
    timed("conv_tool_latency",
          lambda: extract.conv_tool_latency(transcripts_dir))
    timed("conv_time_splits",
          lambda: extract.conv_time_splits(transcripts_dir))
    timed("conv_verbosity_ratio",
          lambda: extract.conv_verbosity_ratio(transcripts_dir))
    timed("conv_pii_leak_rate",
          lambda: extract.conv_pii_leak_rate(transcripts_dir))
    timed("conv_refusal_rate",
          lambda: extract.conv_refusal_rate(transcripts_dir))
    timed("conv_lang_mismatch",
          lambda: extract.conv_lang_mismatch(transcripts_dir))
    return res


def main() -> None:
    if "--r5ops" in sys.argv:
        import ray

        import agentic_document_extraction_pdf_ray  # noqa: F401
        from agentic_document_extraction_pdf_ray.sources.transcripts import (
            transcripts_path,
        )
        if not os.path.exists(f"{OUT}/documents.parquet"):
            print(f"tiling {BASE} x{TILES} -> {OUT}", flush=True)
            build_tiled(BASE, OUT)
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=32, include_dashboard=False,
                     logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        t_base = transcripts_path(100_000, 42)
        t_10x = transcripts_path(1_000_000, 42)
        report = {"loadavg_start": round(os.getloadavg()[0], 1)}
        print(f"== base ({BASE}; transcripts 100k)", flush=True)
        report["base"] = run_r5ops_family(BASE, t_base)
        print(f"== 10x ({OUT}; transcripts 1M)", flush=True)
        report["x10"] = run_r5ops_family(OUT, t_10x)
        report["loadavg_end"] = round(os.getloadavg()[0], 1)
        for name, b in report["base"].items():
            x = report["x10"][name]
            ratio = x["wall_sec"] / max(b["wall_sec"], 0.01) / TILES
            print(f"{name}: {b['wall_sec']}s -> {x['wall_sec']}s "
                  f"(x10 wall / 10·base = {ratio:.2f})", flush=True)
        print(json.dumps(report))
        ray.shutdown()
        return
    if "--x100" in sys.argv:
        import ray

        import agentic_document_extraction_pdf_ray  # noqa: F401
        if not (os.path.exists(f"{OUT100}/documents.parquet")
                and os.path.exists(f"{OUT100}/embeddings.parquet")):
            print(f"tiling {BASE} docs x100 -> {OUT100} (lang-skewed)",
                  flush=True)
            build_docs_tiled(BASE, OUT100, 100, skew_lang=True)
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=32, include_dashboard=False,
                     logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        report = {"loadavg_start": round(os.getloadavg()[0], 1)}
        print(f"== sf0.1 base ({BASE})", flush=True)
        report["base"] = run_x100_family(BASE)
        print(f"== 100x ({OUT100})", flush=True)
        report["x100"] = run_x100_family(OUT100)
        print("== lang spread at 100x (skewed: >=90% 'en')", flush=True)
        report["lang_spread_x100"] = report_lang_spread(OUT100)
        print(f"  {report['lang_spread_x100']}", flush=True)
        report["loadavg_end"] = round(os.getloadavg()[0], 1)
        for name, b in report["base"].items():
            x = report["x100"][name]
            ratio = x["wall_sec"] / max(b["wall_sec"], 0.01) / 100
            print(f"{name}: {b['wall_sec']}s -> {x['wall_sec']}s "
                  f"(x100 wall / 100·base = {ratio:.2f})", flush=True)
        print(json.dumps(report))
        ray.shutdown()
        return
    if not os.path.exists(f"{OUT}/documents.parquet"):
        print(f"tiling {BASE} x{TILES} -> {OUT}", flush=True)
        build_tiled(BASE, OUT)
    if "--tile-only" in sys.argv:
        return

    import ray

    import agentic_document_extraction_pdf_ray  # noqa: F401 (PYTHONPATH)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    report = {"loadavg_start": round(os.getloadavg()[0], 1)}
    print(f"== sf0.1 base ({BASE})", flush=True)
    report["base"] = run_family(BASE)
    print(f"== 10x ({OUT})", flush=True)
    report["x10"] = run_family(OUT)
    report["loadavg_end"] = round(os.getloadavg()[0], 1)
    for name, b in report["base"].items():
        x = report["x10"][name]
        ratio = x["wall_sec"] / max(b["wall_sec"], 0.01) / TILES
        print(f"{name}: {b['wall_sec']}s -> {x['wall_sec']}s "
              f"(x10 wall / 10·base = {ratio:.2f})", flush=True)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
