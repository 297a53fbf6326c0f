#!/usr/bin/env python
"""Per-query isolation harness for the r8 optimization round.

bench.py is FROZEN for measurement (the driver re-runs the round-start
copy), so every extra measurement lives here:

  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries lsh_embedding_pairs,minhash_near_dups --reps 3
  python bench_extra.py --sf /root/testdata/sf1.0 --explain plans/r08 \
      --tag before --queries lsh_embedding_pairs

Protocol matches bench.py exactly: local[$SPARK_GRAFT_CPUS], shuffle
partitions = cpus, AQE off (BENCH_AQE=true to override), noop sink
(guide §1.4 — forces every column of every row), caches released
between replicates, per-query job descriptions (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="", help="dir to write plans into")
    ap.add_argument("--tag", default="before", help="plan file suffix")
    ap.add_argument("--crawl", action="store_true", help="time the bench crawl")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bisque_spark.session import get_spark
    from bisque_spark.util import release_caches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bisque_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.conf.set(
        "spark.sql.adaptive.enabled", os.environ.get("BENCH_AQE", "false")
    )
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "mapreduce.fileoutputcommitter.algorithm.version", "2"
    )
    # same warm-up as bench.run_queries
    import bench as benchmod

    benchmod._warm_session(spark)

    qs = entrymod.queries()
    names = [n for n in args.queries.split(",") if n] or benchmod.HEADLINE
    out: dict[str, object] = {"sf": args.sf, "reps": args.reps}
    times: dict[str, list] = {}
    for name in names:
        fn = qs[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
            release_caches()
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            _force(fn(spark, args.sf))
            runs.append(round(time.time() - t0, 3))
            release_caches()
        spark.sparkContext.setJobDescription(None)
        if not runs:
            continue
        times[name] = runs
        print(
            f"{name}: median {statistics.median(runs):.3f}s {runs}",
            flush=True,
        )
    if args.crawl:
        runs = []
        benchmod.run_crawl_bench(
            spark, world_spec=dict(n_hosts=4, n_seeds=4, pages_per_host=6)
        )
        for _ in range(args.reps):
            s, urls = benchmod.run_crawl_bench(spark)
            runs.append(round(s, 3))
            print(f"crawl_3epochs: {s:.3f}s ({urls} urls)", flush=True)
        times["crawl_3epochs"] = runs
    out["times"] = times
    out["medians"] = {
        k: round(statistics.median(v), 3) for k, v in times.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
