"""The crawl plan: iterative frontier epochs with checkpointed lineage.

The distributed re-expression of the scrape loop around the reference
(SURVEY.md §3.4): each epoch is one Catalyst-planned batch
    frontier → robots ⋈ → politeness window-rank → fetch (Arrow UDF)
    → decode+parse+extract (Arrow UDF) → images sink append
    → link explode → canonicalize → bloom+exact dedup → next frontier
and every epoch commits its state tables (frontier, seen_exact, bloom
shards, images, order log, lineage) to the checkpoint directory before
advancing, so a killed driver resumes bit-identically from the last
complete epoch (north_rule). Batch-iterative rather than Structured
Streaming because the frontier is feedback — epoch N's input is epoch
N-1's output — which streaming cannot express without an external
round-trip anyway (SURVEY.md §1.5).

Determinism: every value is a pure function of (url, epoch); ordering
keys are (epoch, host, priority desc, url_hash); no wall-clock, no
rand(), fixed shuffle-partition counts. These are the conditions for
the resume-bit-identity and oracle-equality tests.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

_TIMING = os.environ.get("BISQUE_CRAWL_TIMING") == "1"


def _tick(label: str, t0: float) -> float:
    now = time.time()
    if _TIMING:
        print(f"    [crawl-timing] {label}: {now - t0:.2f}s", flush=True)
    return now

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bisque_spark.operators.extract import (
    EXTRACT_SCHEMA,
    make_fetch_extract_batches,
    materialize_images_batches,
)
from bisque_spark.operators.schedule import (
    apply_robots,
    politeness_select,
    with_frontier_columns,
)
from bisque_spark.operators.seen import build_shards, filter_unseen, merge_shards
from bisque_spark.synth import World

FRONTIER_COLS = ["url", "url_hash", "host", "depth", "priority", "crawl_delay"]


@dataclass
class CrawlState:
    epoch: int
    frontier: DataFrame | None
    seen_exact: DataFrame | None
    shards: DataFrame | None


def _epoch_dir(workdir: str, epoch: int) -> str:
    return os.path.join(workdir, f"epoch={epoch:05d}")


def _write(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def _read_seen_union(spark: SparkSession, workdir: str, last: int) -> DataFrame:
    """seen_exact = union of per-epoch deltas (append-only: the seen set
    is written as O(new URLs) per epoch, never rewritten — at 10^10
    URLs a full rewrite per epoch would dominate the job)."""
    paths = [os.path.join(workdir, "seen_seed")]
    paths += [
        os.path.join(_epoch_dir(workdir, e), "seen_delta")
        for e in range(last + 1)
    ]
    existing = [p for p in paths if os.path.exists(p)]
    return spark.read.parquet(*existing)


def latest_complete_epoch(workdir: str) -> int | None:
    """Highest epoch with a commit marker (atomic: written last)."""
    best = None
    if not os.path.isdir(workdir):
        return None
    for name in os.listdir(workdir):
        if name.startswith("epoch=") and os.path.exists(
            os.path.join(workdir, name, "_COMMIT")
        ):
            e = int(name.split("=")[1])
            best = e if best is None or e > best else best
    return best


def run_crawl(
    spark: SparkSession,
    world: World,
    seeds: list[tuple[str, int]],
    workdir: str,
    max_epochs: int = 10,
    resume: bool = False,
    n_buckets: int = 32,
) -> dict:
    """Run (or resume) the crawl; returns summary dict with table paths.

    Output tables under ``workdir``: images/, order/, lineage/ plus
    per-epoch state snapshots for resume.
    """
    from bisque_spark.functions.robots import fetch_robots
    from bisque_spark.functions.urlnorm import with_canonical

    # robots table via the fetch+parse stage (functions/robots.py);
    # round-trips to exactly robots_rows(world) — pinned by
    # tests/test_robots.py — so the oracle contract is unchanged
    hosts = spark.createDataFrame(
        [(world.host(i),) for i in range(world.n_hosts)], "host string"
    )
    robots = fetch_robots(hosts, world).persist()

    start_epoch = 0
    frontier: DataFrame | None = None
    seen_exact: DataFrame | None = None
    shards: DataFrame | None = None

    if resume:
        last = latest_complete_epoch(workdir)
        if last is not None:
            d = _epoch_dir(workdir, last)
            frontier_path = os.path.join(d, "frontier")
            frontier = (
                spark.read.parquet(frontier_path)
                if os.path.exists(frontier_path)
                else None
            )
            seen_exact = _read_seen_union(spark, workdir, last)
            shards = spark.read.parquet(os.path.join(d, "shards"))
            start_epoch = last + 1
    elif os.path.isdir(workdir):
        shutil.rmtree(workdir)

    if start_epoch == 0 and frontier is None:
        raw = spark.createDataFrame(seeds, schema="url string, rank int")
        canon = with_canonical(raw).where(F.col("url").isNotNull())
        seeded = with_frontier_columns(
            canon.withColumn("depth", F.lit(0)).drop("rank"), epoch=0
        ).dropDuplicates(["url_hash"])
        seeded = apply_robots(seeded, robots)
        frontier = seeded.select(*FRONTIER_COLS)
        seen_exact = frontier.select("url_hash")
        _write(seen_exact, os.path.join(workdir, "seen_seed"))
        seen_exact = spark.read.parquet(os.path.join(workdir, "seen_seed"))
        shards = build_shards(seen_exact, n_buckets=n_buckets)

    epoch = start_epoch
    while epoch < max_epochs:
        t = time.time()
        # persist the frontier before fanning out: epoch 0's frontier is
        # the seed plan (canonicalize UDF + dedup + robots join) and the
        # politeness/deferred branches would otherwise recompute it per
        # downstream action
        frontier = frontier.persist()
        if frontier.isEmpty():
            frontier.unpersist()
            break
        t = _tick("isEmpty", t)
        scheduled, deferred = politeness_select(frontier, world.host_budget_base)
        scheduled = scheduled.persist()
        deferred = deferred.persist()
        order_log = scheduled.select(
            F.lit(epoch).alias("epoch"),
            "host",
            "host_rank",
            "priority",
            "url_hash",
            "url",
        )

        # fused fetch+decode+parse+extract: one Arrow stage per epoch
        extracted = (
            scheduled.select("url")
            .mapInPandas(make_fetch_extract_batches(world), schema=EXTRACT_SCHEMA)
            .persist()
        )

        images_flat = extracted.select(
            F.explode("images").alias("img")
        ).select("img.image_id", "img.caption")
        images = images_flat.mapInPandas(
            materialize_images_batches,
            schema="image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )

        links = (
            extracted.select(F.explode("links").alias("url"))
            .dropDuplicates(["url"])
        )
        candidates = with_frontier_columns(
            links.withColumn("depth", F.lit(epoch + 1)), epoch=epoch + 1
        )
        candidates = apply_robots(candidates, robots)
        # persisted: reused by the frontier/seen_exact/shards writes
        new_urls = (
            filter_unseen(candidates, shards, seen_exact, n_buckets=n_buckets)
            .select(*FRONTIER_COLS)
            .persist()
        )

        # one aggregation job for all lineage counters (scheduled rows ==
        # extracted rows, so no separate count on `scheduled`)
        counts = extracted.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("error").isNull().cast("long")).alias("ok"),
        ).first()
        rows_scheduled = counts["n"] or 0
        rows_fetched = counts["ok"] or 0
        rows_failed = rows_scheduled - rows_fetched
        t = _tick("schedule+fetch+extract+counts", t)

        next_frontier = deferred.select(*FRONTIER_COLS).unionByName(new_urls)
        new_hashes = new_urls.select("url_hash")
        next_shards = merge_shards(
            shards, build_shards(new_hashes, n_buckets=n_buckets)
        )

        # ---- commit epoch state ------------------------------------------
        # the five state tables are independent → submit their write
        # jobs concurrently (Spark schedules jobs from multiple driver
        # threads; FIFO within the shared pool). The _COMMIT marker is
        # only written after ALL writes return, so atomicity of the
        # epoch commit is unchanged.
        d = _epoch_dir(workdir, epoch)
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            (images, os.path.join(d, "images")),
            (order_log, os.path.join(d, "order")),
            (next_frontier, os.path.join(d, "frontier")),
            # seen set is append-only: O(new URLs) delta per epoch
            (new_hashes, os.path.join(d, "seen_delta")),
            (next_shards, os.path.join(d, "shards")),
        ]
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futures = [pool.submit(_write, df, path) for df, path in writes]
            for f in futures:
                f.result()
        t = _tick("write epoch state (5 tables, concurrent)", t)
        lineage = {
            "epoch": epoch,
            "rows_scheduled": rows_scheduled,
            "rows_fetched": rows_fetched,
            "rows_failed": rows_failed,
            "bloom_version": epoch + 1,
        }
        with open(os.path.join(d, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        with open(os.path.join(d, "_COMMIT"), "w") as f:
            f.write("ok")
        scheduled.unpersist()
        extracted.unpersist()
        deferred.unpersist()
        new_urls.unpersist()
        frontier.unpersist()

        # read the committed state back: cuts lineage growth across the
        # iterative loop and makes resume = continue exactly
        frontier = spark.read.parquet(os.path.join(d, "frontier"))
        seen_exact = _read_seen_union(spark, workdir, epoch)
        shards = spark.read.parquet(os.path.join(d, "shards"))
        epoch += 1

    return {
        "workdir": workdir,
        "epochs": epoch,
        "order_paths": [
            os.path.join(_epoch_dir(workdir, e), "order")
            for e in range(epoch)
            if os.path.exists(os.path.join(_epoch_dir(workdir, e), "order"))
        ],
        "images_paths": [
            os.path.join(_epoch_dir(workdir, e), "images")
            for e in range(epoch)
            if os.path.exists(os.path.join(_epoch_dir(workdir, e), "images"))
        ],
    }


def read_order(spark: SparkSession, result: dict) -> DataFrame:
    return spark.read.parquet(*result["order_paths"])


def read_images(spark: SparkSession, result: dict) -> DataFrame:
    return spark.read.parquet(*result["images_paths"])


def read_seen(spark: SparkSession, result: dict) -> DataFrame:
    last = latest_complete_epoch(result["workdir"])
    return _read_seen_union(spark, result["workdir"], last)
