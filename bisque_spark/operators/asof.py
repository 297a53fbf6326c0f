"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key ("backward" direction,
inclusive — the same semantics as pandas ``merge_asof`` and DuckDB
``ASOF JOIN``).

Spark-first implementation (SURVEY-style: composition of existing
DataFrame ops, no UDF): tag both sides, union, and window-fill with
``last(..., ignorenulls=True)`` ordered by (ts, side) where the right
side sorts first at equal timestamps (inclusivity). One shuffle on the
key — the same cost as a sort-merge join, with no range-explosion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join; right value columns arrive as
    ``<col><suffix>`` (None where no right row precedes)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    l_tagged = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        if c in left.columns:
            l_tagged = l_tagged.withColumnRenamed(c, f"__l_{c}")
        l_tagged = l_tagged.withColumn(f"{c}{suffix}", F.lit(None).cast(
            dict(right.dtypes)[c]
        ))
    l_tagged = l_tagged.withColumn(f"{on}{suffix}", F.lit(None).cast(
        dict(right.dtypes)[on]
    ))
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(on).alias(f"{on}{suffix}"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in [*(f"{c}{suffix}" for c in value_cols), f"{on}{suffix}"]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = filled.where(F.col("__side") == 1).drop("__side")
    for c in value_cols:
        if f"__l_{c}" in out.columns:
            out = out.withColumnRenamed(f"__l_{c}", c)
    return out
