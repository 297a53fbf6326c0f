"""Bucketed tables: co-located joins without a shuffle.

The canonical 100-TB strategy for a join both sides pay for
repeatedly (orders ⋈ lineitem on orderkey, frontier ⋈ seen on
url_hash): write both tables bucketed AND sorted on the join key with
the same bucket count, and every subsequent equi-join on that key is
planned WITHOUT an Exchange on either side — the bucket files are
already hash-partitioned and sorted, so SortMergeJoin reads them
co-located (and with sorted buckets, without a per-task Sort either).
One shuffle at write time amortizes over every downstream join/agg on
the key.

Spark-native mechanism (`DataFrameWriter.bucketBy` + `saveAsTable`,
hash = Murmur3 on the key, same function the shuffle uses) — no
reference analogue (the reference is single-process); this is engine
scale infrastructure like sources/catalog.py. The reader is the
session catalog (`spark.table`), so Catalyst knows the output
partitioning and elides exchanges automatically; nothing here
hand-schedules.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default bucket-sorted)
    parquet table in the session catalog. Joins/aggs on ``key``
    between tables written with the SAME bucket count skip their
    exchanges (and sorts, when ``sort=True``)."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed catalog tables on their bucket key.
    This is a plain ``DataFrame.join`` — the co-location is a property
    of the tables, and Catalyst plans the shuffle-free SortMergeJoin
    on its own. Kept as a helper so callers (and tests) have one place
    that documents/asserts the contract."""
    return spark.table(left_table).join(
        spark.table(right_table), on=key, how=how
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan —
    0 for a fully co-located join. (ShuffleExchange only;
    BroadcastExchange is not a shuffle.)"""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "Broadcast" not in line
    )
