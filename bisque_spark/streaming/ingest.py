"""Structured Streaming ingestion: continuous page → images pipeline.

The crawl's frontier loop is batch-iterative by necessity (epoch N's
input is epoch N-1's output — SURVEY.md §1.5/§7). What Structured
Streaming *does* fit is the ingestion side: fetched pages landing in a
directory/queue are parsed, extracted, validated, and appended to the
images sink continuously, with exactly-once file-source semantics and
checkpointed progress. This module provides that stage:

    pages parquet dir (url, status, content)  --readStream-->
    fused decode+parse+extract (mapInPandas)  -->
    explode images  -->  images sink (append, checkpointed)

plus a windowed per-host throughput aggregation with a watermark for
late arrivals — the monitoring stream a production crawl would run.

Tests drive it with ``trigger(availableNow=True)`` so the pipeline is
exercised end-to-end without a long-running query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bisque_spark.operators.extract import EXTRACT_SCHEMA, extract_batches

PAGES_SCHEMA = "url string, status int, content binary, fetched_at timestamp"


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream over a directory of pages parquet files.
    Exactly-once per file via the source's checkpoint log."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )


def extract_images_stream(pages: DataFrame) -> DataFrame:
    """Streaming decode+parse+extract → one row per image."""
    extracted = pages.select("url", "status", "content").mapInPandas(
        extract_batches, schema=EXTRACT_SCHEMA
    )
    return extracted.select(
        "url", F.explode("images").alias("img")
    ).select("url", "img.image_id", "img.src", "img.caption")


def write_images_stream(
    images: DataFrame, sink_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Append-mode sink with checkpointing; availableNow drains the
    source and stops (test/batch-catchup mode)."""
    writer = (
        images.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_urls_stream(urls: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Custom stateful streaming operator: continuous URL-seen dedup.

    The streaming twin of operators/seen.py — state is one seen-hash
    set per hash bucket, held by the streaming state store
    (``applyInPandasWithState``), so the dedup survives micro-batches
    and restarts via the checkpoint. Emits each canonical URL exactly
    once across the stream's lifetime.

    Input must have a ``url`` column (canonical). Keyed by
    pmod(xxhash64(url), n_buckets) — the same sharding as the batch
    Bloom table, so state size per key is bounded and parallel.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = urls.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
    ).groupBy("bucket")

    def dedup(key, pdf_iter, state):
        seen = (
            np.frombuffer(state.get[0], dtype=np.int64)
            if state.exists
            else np.empty(0, dtype=np.int64)
        )
        seen_set = set(seen.tolist())
        out_urls, out_hashes = [], []
        for pdf in pdf_iter:
            for url, h in zip(pdf["url"], pdf["url_hash"]):
                h = int(h)
                if h not in seen_set:
                    seen_set.add(h)
                    out_urls.append(url)
                    out_hashes.append(h)
        state.update((np.array(sorted(seen_set), dtype=np.int64).tobytes(),))
        yield pd.DataFrame({"url": out_urls, "url_hash": out_hashes})

    return keyed.applyInPandasWithState(
        dedup,
        outputStructType="url string, url_hash long",
        stateStructType="seen binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_throughput_stream(pages: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked windowed aggregation: fetched pages per host per
    window (late rows beyond 2 minutes dropped)."""
    return (
        pages.withColumn(
            "host", F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
        )
        .withWatermark("fetched_at", "2 minutes")
        .groupBy(F.window("fetched_at", window), "host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum((F.col("status") == 200).cast("long")).alias("n_ok"),
        )
    )


def sessionize_stream(
    events: DataFrame, gap_s: float = 1800.0
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization
    with state timeouts (the streaming twin of the batch lag-window
    sessionizer in __spark_entry__._q_events_sessionize).

    State per user = (session_start, last_ts, n_events). An event
    within ``gap_s`` of last_ts extends the open session; a larger gap
    CLOSES it (the closed session row is emitted) and opens a new one.
    A processing-time timeout flushes sessions idle longer than the
    gap, so sessions end even when a user goes silent — the part a
    batch window can't express without re-reading everything.

    Input: ``user_id long, ts double`` (event-time seconds), assumed
    in-order per micro-batch arrival (the synthetic feed's property;
    out-of-order handling would add a watermark + buffer here).
    Output (append): one row per CLOSED session.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = events.select("user_id", "ts").groupBy("user_id")

    def sessionize(key, pdf_iter, state):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, int(n)))
            state.remove()
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        for pdf in pdf_iter:
            for ts in sorted(float(t) for t in pdf["ts"]):
                if start is None:
                    start, last, n = ts, ts, 1
                elif ts - last > gap_s:
                    closed.append((user_id, start, last, int(n)))
                    start, last, n = ts, ts, 1
                else:
                    last, n = ts, n + 1
        if start is not None:
            state.update((float(start), float(last), int(n)))
            state.setTimeoutDuration(int(gap_s * 1000))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return keyed.applyInPandasWithState(
        sessionize,
        outputStructType=(
            "user_id long, session_start double, session_end double, "
            "n_events long"
        ),
        stateStructType="session_start double, last_ts double, n_events long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
