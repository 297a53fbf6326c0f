#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the per-round driver runs): executes the headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] plus a fixed-size synthetic-web crawl, and
prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "crawl_urls_per_sec": ...}

--scaling mode (BASELINE.json north_rule evidence): reruns the same
crawl job at two parallelism levels (local[8] vs local[32]) in fresh
subprocesses and reports throughput at both plus
efficiency = (T8/T32)/(32/8); results appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "events_politeness_topk",
    "events_sessionize",
    "revenue_by_nation",
    "doc_token_stats",
    "doc_exact_dedup",
    "minhash_near_dups",
    "emb_knn_query0",
    "lsh_embedding_pairs",
    "extract_captions",
    "image_features",
]

BENCH_WORLD = dict(n_hosts=150, n_seeds=200, pages_per_host=60)
BENCH_EPOCHS = 3


def _force(df) -> int:
    """Materialize every column (count() would let Catalyst prune the
    UDF columns away)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_crawl_bench(spark) -> tuple[float, int]:
    """→ (seconds, urls scheduled+fetched)."""
    from bisque_spark.plans.crawl import run_crawl
    from bisque_spark.synth import World, seed_urls

    world = World(**BENCH_WORLD)
    wd = tempfile.mkdtemp(prefix="bench_crawl_")
    t0 = time.time()
    res = run_crawl(
        spark, world, seed_urls(world), workdir=wd, max_epochs=BENCH_EPOCHS
    )
    dt = time.time() - t0
    urls = 0
    for e in range(res["epochs"]):
        with open(os.path.join(wd, f"epoch={e:05d}", "lineage.json")) as f:
            urls += json.load(f)["rows_scheduled"]
    return dt, urls


def bench_once() -> dict:
    from bisque_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bisque_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    timings = run_queries(spark, sf_dir)
    crawl_s, crawl_urls = run_crawl_bench(spark)
    timings["crawl_3epochs"] = round(crawl_s, 3)
    spark.stop()
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "headline queries + 3-epoch frontier crawl wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl_urls_per_sec": round(crawl_urls / crawl_s, 2),
        "cpus": cpus,
    }


def _crawl_only(cpus: int) -> dict:
    """Subprocess entry: run only the crawl at a given parallelism."""
    from bisque_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    crawl_s, urls = run_crawl_bench(spark)
    spark.stop()
    return {"cpus": cpus, "sec": round(crawl_s, 3), "urls": urls,
            "urls_per_sec": round(urls / crawl_s, 2)}


def scaling() -> None:
    results = []
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--crawl-only", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    r8, r32 = results
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / (32 / 8)
    report = {
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(report))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n| crawl {BENCH_WORLD} x{BENCH_EPOCHS} epochs "
            f"| local[8]: {r8['urls_per_sec']} urls/s "
            f"| local[32]: {r32['urls_per_sec']} urls/s "
            f"| efficiency {report['scaling_efficiency']} (target ≥0.8, "
            f"normalized by 4x cores) |\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    elif len(sys.argv) > 2 and sys.argv[1] == "--crawl-only":
        print(json.dumps(_crawl_only(int(sys.argv[2]))))
    else:
        print(json.dumps(bench_once()))
