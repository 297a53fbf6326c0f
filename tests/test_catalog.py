"""Catalog shim: create/append/merge/version semantics (Iceberg-shaped
operations on the parquet fallback)."""

import pyspark.sql.functions as F
import pytest

from bisque_spark.sources.catalog import ParquetCatalog, get_catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return ParquetCatalog(spark, str(tmp_path / "warehouse"))


SCHEMA = "image_id string, caption string, phash long"


def test_create_append_read(spark, cat):
    cat.create_table("images", SCHEMA)
    assert cat.exists("images")
    assert cat.version("images") == 0
    df = spark.createDataFrame(
        [("a", "one", 1), ("b", "two", 2)], SCHEMA
    )
    cat.append("images", df)
    assert cat.version("images") == 1
    got = cat.read("images")
    assert got.count() == 2
    assert dict(got.dtypes)["phash"] == "bigint"


def test_merge_by_key_upsert(spark, cat):
    cat.create_table("images", SCHEMA)
    cat.append(
        "images",
        spark.createDataFrame([("a", "one", 1), ("b", "two", 2)], SCHEMA),
    )
    cat.merge_by_key(
        "images",
        spark.createDataFrame([("b", "TWO", 20), ("c", "three", 3)], SCHEMA),
        key="image_id",
    )
    rows = {r["image_id"]: (r["caption"], r["phash"]) for r in cat.read("images").collect()}
    assert rows == {"a": ("one", 1), "b": ("TWO", 20), "c": ("three", 3)}
    assert cat.version("images") == 2


def test_partitioned_table(spark, cat):
    cat.create_table("frontier", "url string, bucket int", partition_by=["bucket"])
    df = spark.range(20).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 4).cast("int").alias("bucket"),
    )
    cat.append("frontier", df)
    got = cat.read("frontier")
    assert got.count() == 20
    # partition pruning: a bucket filter scans one partition directory
    plan = got.where(F.col("bucket") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_get_catalog_fallback(spark, tmp_path):
    c = get_catalog(spark, str(tmp_path / "w2"))
    assert isinstance(c, ParquetCatalog)
