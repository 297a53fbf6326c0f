"""plans/curate.py: the end-to-end curation composition — monotone
stage counts, determinism, PII actually scrubbed, idempotent sink."""

import pytest

import pyspark.sql.functions as F

from bisque_spark.plans.curate import run_curation


def _tables(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    return docs, embs


@pytest.mark.slow
def test_curation_pipeline_end_to_end(spark, tmp_path):
    docs, embs = _tables(spark)
    wd = str(tmp_path / "cat")
    counts = run_curation(spark, docs, embs, wd, sample_per_cell=10)

    # monotone funnel
    assert (
        counts["input"]
        >= counts["after_quality"]
        >= counts["after_lm"]
        >= counts["after_dedup"]
        >= counts["final"]
        > 0
    )
    assert counts["catalog_version"] == 1

    from bisque_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, wd)
    out = cat.read("curated")
    assert out.count() == counts["final"]
    # PII scrub ran: no raw email shapes survive
    assert (
        out.where(
            F.col("text").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        ).count()
        == 0
    )
    # determinism + idempotent sink: re-running produces the SAME doc
    # set and upserts rather than duplicating
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    counts2 = run_curation(spark, docs, embs, wd, sample_per_cell=10)
    assert counts2["final"] == counts["final"]
    out2 = cat.read("curated")
    assert out2.count() == counts["final"]
    assert {r["doc_id"] for r in out2.select("doc_id").collect()} == ids1
    assert counts2["catalog_version"] == 2  # a new snapshot, same rows


@pytest.mark.slow
def test_curation_with_line_dedup_stage(spark, tmp_path):
    """dedup_lines=True strips cross-document boilerplate BEFORE the
    quality gate: the funnel stays monotone and exactly one surviving
    catalog row still carries the boilerplate line."""
    docs, embs = _tables(spark)
    boiler = "Accept all cookies to continue reading this website now"
    docs_b = docs.select(
        "doc_id",
        F.concat(F.lit(boiler + "\n"), F.col("text")).alias("text"),
    )
    wd = str(tmp_path / "cat_lines")
    counts = run_curation(
        spark, docs_b, embs, wd, sample_per_cell=10, dedup_lines=True
    )
    assert counts["after_line_dedup"] == counts["input"]  # docs never drop
    assert (
        counts["input"]
        >= counts["after_quality"]
        >= counts["after_lm"]
        >= counts["after_dedup"]
        >= counts["final"]
        > 0
    )
    from bisque_spark.sources.catalog import ParquetCatalog

    out = ParquetCatalog(spark, wd).read("curated")
    n_boiler = out.where(F.col("text").contains(boiler)).count()
    assert n_boiler <= 1  # at most the first-occurrence doc keeps it


@pytest.mark.slow
def test_curation_duplicate_embedding_rows_never_duplicate_docs(
    spark, tmp_path
):
    """An embeddings table with >1 row per vec_id must not duplicate
    kept docs through the diversity-sample join (final_ids distinct)."""
    docs, embs = _tables(spark)
    dup_embs = embs.unionByName(embs.limit(40))
    wd = str(tmp_path / "cat_dup")
    counts = run_curation(spark, docs, dup_embs, wd, sample_per_cell=10)

    from bisque_spark.sources.catalog import ParquetCatalog

    out = ParquetCatalog(spark, wd).read("curated")
    assert out.count() == counts["final"]
    assert (
        out.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    )


@pytest.mark.slow
def test_curation_with_semantic_dedup_stage(spark, tmp_path):
    """semantic_tau drops docs whose EMBEDDINGS nearly coincide even
    when their text is distinct: plant an exact embedding duplicate
    onto a second surviving doc and assert exactly that doc vanishes
    from the catalog output (sampling disabled via a huge k)."""
    from bisque_spark.sources.catalog import ParquetCatalog

    docs, embs = _tables(spark)
    wd_off = str(tmp_path / "off")
    run_curation(spark, docs, embs, wd_off, sample_per_cell=10**6)
    out_off = {
        r["doc_id"]
        for r in ParquetCatalog(spark, wd_off)
        .read("curated")
        .select("doc_id")
        .collect()
    }
    emb_ids = {r["vec_id"] for r in embs.select("vec_id").collect()}
    a, b = sorted(out_off & emb_ids)[:2]
    a_vec = [
        float(x)
        for x in embs.where(F.col("vec_id") == a).first()["embedding"]
    ]
    embs2 = embs.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == b,
            F.array(*[F.lit(x) for x in a_vec]).cast("array<float>"),
        ).otherwise(F.col("embedding")),
    )
    wd_on = str(tmp_path / "on")
    counts = run_curation(
        spark,
        docs,
        embs2,
        wd_on,
        sample_per_cell=10**6,
        semantic_tau=0.999,
    )
    out_on = {
        r["doc_id"]
        for r in ParquetCatalog(spark, wd_on)
        .read("curated")
        .select("doc_id")
        .collect()
    }
    assert out_on == out_off - {b}
    assert counts["after_semantic_embedded"] == len(out_off & emb_ids) - 1


@pytest.mark.slow
def test_curation_with_span_dedup_stage(spark, tmp_path):
    """dedup_span_k cuts a cross-document copied PASSAGE everywhere
    but its first occurrence before the gates run."""
    docs, embs = _tables(spark)
    passage = (
        "this exact syndicated paragraph appears verbatim in every "
        "copy of the story today"
    )
    docs_p = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" " + passage)).alias("text"),
    )
    wd = str(tmp_path / "cat_spans")
    counts = run_curation(
        spark, docs_p, embs, wd, sample_per_cell=10, dedup_span_k=8
    )
    assert counts["after_span_dedup"] == counts["input"]  # docs never drop
    assert counts["final"] > 0
    from bisque_spark.sources.catalog import ParquetCatalog

    out = ParquetCatalog(spark, wd).read("curated")
    n_pass = out.where(F.col("text").contains(passage)).count()
    assert n_pass <= 1  # at most the first-occurrence doc keeps it
