"""Hypertable-style time rollup: multi-granularity continuous
aggregates in ONE pass.

The TimescaleDB "continuous aggregate" shape re-expressed Spark-first:
instead of one scan per granularity, compute every granularity's bucket
column and aggregate them all in a single GROUPING SETS pass — one
shuffle, partial aggregation map-side, and the scan read once. At 100
TB this is the difference between k scans and 1.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

GRANULARITIES = {
    "minute": "yyyy-MM-dd HH:mm",
    "hour": "yyyy-MM-dd HH",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
}


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grans: tuple[str, ...] = ("hour", "day"),
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """→ (gran, bucket, *extra_keys, n, sum_v, min_v, max_v) for every
    granularity at once (single scan + single grouping-sets aggregate).
    Bucket rendered as a string so every granularity shares one column.
    """
    for g in grans:
        if g not in GRANULARITIES:
            raise ValueError(f"unknown granularity {g!r}")
    with_buckets = df
    for g in grans:
        with_buckets = with_buckets.withColumn(
            f"__b_{g}",
            F.date_format(F.date_trunc(g, F.col(ts_col)), GRANULARITIES[g]),
        )
    sets = [[f"__b_{g}", *extra_keys] for g in grans]
    agg = with_buckets.groupingSets(
        sets, *[F.col(c) for c in {c for s in sets for c in s}]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 4).alias("sum_v"),
        F.round(F.min(value_col), 4).alias("min_v"),
        F.round(F.max(value_col), 4).alias("max_v"),
    )
    # each output row belongs to exactly one grouping set: the non-null
    # bucket column identifies its granularity
    gran_col = F.coalesce(
        *[
            F.when(F.col(f"__b_{g}").isNotNull(), F.lit(g))
            for g in grans
        ]
    )
    bucket_col = F.coalesce(*[F.col(f"__b_{g}") for g in grans])
    return agg.select(
        gran_col.alias("gran"),
        bucket_col.alias("bucket"),
        *extra_keys,
        "n",
        "sum_v",
        "min_v",
        "max_v",
    ).where(F.col("gran").isNotNull())
