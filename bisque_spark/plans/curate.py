"""End-to-end training-data curation plan — the batch twin of
plans/crawl.py for the document/embedding side of the engine.

One deterministic pass from raw documents to a curated, deduplicated,
diversity-sampled corpus in the snapshot catalog:

 0. line dedup        — optional CCNet step: cross-document boilerplate
                        lines keep one occurrence (text.dedup_lines_corpus)
 0b. substring dedup  — optional Lee-et-al step: duplicated k-token
                        windows cut at all but their first occurrence
                        (text.dedup_spans_corpus)
 1. quality gate      — token/stopword stats + langid (JVM exprs)
 2. safety scrub      — PII redaction (emails/phones/IPs → placeholders)
 3. repetition gate   — Gopher-style dup-line / top-2-gram signals
 4. LM gate           — corpus unigram log-prob (drop the junk tail)
 5. exact dedup       — min-id per md5
 6. near-dup keep     — MinHash/LSH pairs → connected components →
                        canonical representative per cluster
 6b. semantic dedup   — optional SemDeDup step: within-IVF-cell
                        embedding pairs at cosine ≥ tau keep the
                        minimal id (reuses stage 7's index build)
 7. diversity sample  — ≤ k docs per IVF cell of the embedding space
 8. sink              — MERGE into the snapshot catalog (copy-on-write,
                        file-stats pruned), so re-runs upsert instead
                        of duplicating

Every stage is an operator verified elsewhere (DuckDB hash oracles,
reference diffs, or property tests); this plan pins their COMPOSITION:
deterministic output (no rand(), ties by id), stable counts, and an
idempotent sink. Scale shape: stages 1-4 are pure Column expressions
over one scan; 5-6 shuffle on content hashes / band keys only; 7 is
one window shuffle; 8 rewrites only files whose key ranges intersect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def run_curation(
    spark: SparkSession,
    documents: DataFrame,
    embeddings: DataFrame,
    workdir: str,
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.6,
    lm_drop_frac: float = 0.05,
    near_dup_threshold: float = 0.5,
    sample_per_cell: int = 50,
    n_cells: int = 8,
    dedup_lines: bool = False,
    dedup_span_k: int | None = None,
    semantic_tau: float | None = None,
) -> dict:
    """documents(doc_id, text, ...) + embeddings(vec_id, embedding) →
    curated corpus in the catalog at ``workdir``; returns stage counts.
    ``vec_id`` is assumed to key documents (the synth tables share the
    id space)."""
    from bisque_spark.functions.text import (
        corpus_unigram_logprob,
        langid_col,
        quality_cols,
        repetition_cols,
        scrub_pii_col,
    )
    from bisque_spark.operators.cluster import keep_canonical
    from bisque_spark.operators.dedup import exact_dedup, minhash_dedup_pairs
    from bisque_spark.operators.similarity import diversity_sample, ivf_build
    from bisque_spark.sources.catalog import ParquetCatalog
    from bisque_spark.util import pin, release_caches

    counts: dict[str, int] = {"input": documents.count()}

    # 0 (optional): corpus-level line dedup — the CCNet preprocessing
    # step: cross-document boilerplate lines vanish from every copy
    # but the first BEFORE quality signals are computed, so nav bars /
    # cookie banners don't inflate dup_line_frac or token counts.
    # Doc count is unchanged (lines shrink, docs never drop here).
    if dedup_lines:
        from bisque_spark.functions.text import dedup_lines_corpus

        documents = pin(
            dedup_lines_corpus(documents).select("doc_id", "text")
        )
        counts["after_line_dedup"] = documents.count()

    # 0b (optional): corpus substring dedup — copied PASSAGES (quotes,
    # syndicated paragraphs) vanish everywhere but their first
    # occurrence before quality/repetition signals see them. Docs
    # never drop here either; their texts shrink.
    if dedup_span_k is not None:
        from bisque_spark.functions.text import dedup_spans_corpus

        documents = pin(
            dedup_spans_corpus(documents, k=dedup_span_k).select(
                "doc_id", "text"
            )
        )
        counts["after_span_dedup"] = documents.count()

    # 1-3: one scan, pure Column expressions
    q = quality_cols("text")
    r = repetition_cols("text")
    scored = documents.select(
        "doc_id",
        scrub_pii_col("text").alias("text"),
        q["n_tokens"].alias("n_tokens"),
        langid_col("text").alias("lang_pred"),
        r["dup_line_frac"].alias("dup_line_frac"),
    )
    gated = pin(
        scored.where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("lang_pred") != "und")
            & (F.col("dup_line_frac") <= max_dup_line_frac)
        )
    )
    counts["after_quality"] = gated.count()

    # 4: LM junk tail — drop the lowest lm_drop_frac by mean log-prob.
    # The percentile cutoff stays IN-PLAN as a broadcast one-row
    # aggregate (the corpus_unigram_logprob pattern) — no driver-side
    # scalar collect, stage 4 stays lazy until the stage-5 action.
    # NULL percentile (nothing survived the earlier gates) → -inf keeps
    # the empty frame empty.
    lm = pin(corpus_unigram_logprob(gated))
    cutoff = lm.agg(
        F.coalesce(
            F.expr(f"percentile(mean_logprob, {lm_drop_frac})"),
            F.lit(float("-inf")),
        ).alias("__lm_cutoff")
    )
    keep_lm = (
        lm.crossJoin(F.broadcast(cutoff))
        .where(F.col("mean_logprob") >= F.col("__lm_cutoff"))
        .select("doc_id")
    )
    survivors = pin(gated.join(keep_lm, "doc_id"))
    counts["after_lm"] = survivors.count()

    # 5-6: exact + near-dup canonical keep
    exact_keep = exact_dedup(survivors, "doc_id", "text").select("doc_id")
    deduped = survivors.join(exact_keep, "doc_id")
    pairs = minhash_dedup_pairs(
        deduped, "doc_id", "text", threshold=near_dup_threshold
    )
    kept = pin(keep_canonical(deduped, pairs, "doc_id"))
    counts["after_dedup"] = kept.count()

    # 7: diversity sample over the embedding space (docs without an
    # embedding row are passed through — sampling only prunes dense
    # embedded regions)
    emb = embeddings.select(
        F.col("vec_id").alias("doc_id"), "embedding"
    ).join(kept.select("doc_id"), "doc_id")
    assigned, _ = ivf_build(
        emb, id_col="doc_id", n_cells=n_cells, pin_index=False
    )
    # 6b (optional): SemDeDup over the SAME index build stage 7 uses —
    # text near-dups are already gone (stages 5-6); this drops docs
    # whose EMBEDDINGS nearly coincide (paraphrases, templated pages
    # with different surface text). Embedded survivors only; docs
    # without an embedding row can't be compared and pass through
    # below as before.
    if semantic_tau is not None:
        from bisque_spark.operators.similarity import semantic_dedup

        assigned = semantic_dedup(
            assigned, tau=semantic_tau, id_col="doc_id"
        )
        counts["after_semantic_embedded"] = assigned.count()
    sampled_ids = diversity_sample(
        assigned, k_per_cell=sample_per_cell, id_col="doc_id"
    ).select("doc_id")
    no_embedding = kept.select("doc_id").join(
        emb.select("doc_id"), "doc_id", "left_anti"
    )
    # distinct: the sink upsert must be keyed uniquely even if the
    # embedding table carries >1 row per vec_id (duplicate cell
    # assignments would otherwise duplicate kept rows through the join
    # and break the idempotent-sink contract)
    final_ids = sampled_ids.unionByName(no_embedding).distinct()
    final = kept.join(final_ids, "doc_id")
    counts["final"] = final.count()

    # 8: idempotent catalog sink (re-running upserts, never duplicates)
    cat = ParquetCatalog(spark, workdir)
    if not cat.exists("curated"):
        cat.create_table(
            "curated",
            "doc_id bigint, text string, n_tokens int, lang_pred string,"
            " dup_line_frac double",
            stats_key="doc_id",
        )
    cat.merge_by_key(
        "curated",
        final.select(
            "doc_id", "text", F.col("n_tokens").cast("int").alias("n_tokens"),
            "lang_pred", "dup_line_frac",
        ),
        key="doc_id",
    )
    counts["catalog_version"] = cat.version("curated")
    release_caches()
    return counts
