"""Bucketed co-located joins (sources/bucketed.py): one write-time
shuffle buys every downstream join/agg on the key a shuffle-free plan
— the plan property is asserted, not assumed."""

import pyspark.sql.functions as F
import pytest

from bisque_spark.sources.bucketed import (
    colocated_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bkt_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucket_db):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    write_bucketed(orders, f"{bucket_db}.orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{bucket_db}.lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    joined = colocated_join(
        spark, f"{bucket_db}.orders_b", f"{bucket_db}.lineitem_b",
        "o_orderkey",
    )
    # keep the join a SortMergeJoin so the exchange elision is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert exchange_count(joined) == 0  # co-located: no shuffle
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        assert exchange_count(plain) >= 2  # the baseline pays twice
        got = joined.groupBy("o_orderkey").count()
        want = plain.groupBy("o_orderkey").count()
        assert exchange_count(got) == 0  # agg on the bucket key: free
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_requires_matching_bucket_counts(spark, bucket_db):
    """Mismatched bucket counts fall back to a correct (but shuffled)
    plan — correctness never depends on the layout."""
    a = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(100).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    write_bucketed(a, f"{bucket_db}.a8", "k", buckets=8)
    write_bucketed(b, f"{bucket_db}.b4", "k", buckets=4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, f"{bucket_db}.a8", f"{bucket_db}.b4", "k")
        assert j.count() == 100
        assert exchange_count(j) >= 1  # at least one side re-shuffles
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
