"""plans/curate.py: the end-to-end curation composition — monotone
stage counts, determinism, PII actually scrubbed, idempotent sink."""

import pyspark.sql.functions as F

from bisque_spark.plans.curate import run_curation


def _tables(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    return docs, embs


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
