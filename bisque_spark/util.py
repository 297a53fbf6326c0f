"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Ensure a CPU-bound (UDF) stage has at least one partition per
    core. Local small-file reads arrive as 1 partition, serializing
    Arrow UDF work; at cluster scale inputs already have thousands of
    partitions and this is a no-op (guarded, not an unconditional
    repartition — no shuffle unless needed)."""
    if df.isStreaming:
        # partitioning of a stream is the source's concern; .rdd is
        # also unavailable on streaming DataFrames
        return df
    spark = df.sparkSession
    target = int(spark.sparkContext.defaultParallelism * min_factor)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
