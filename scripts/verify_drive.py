import sys

sys.path.insert(0, "/root/repo")
import json
import os
import tempfile

from bisque_spark.plans.crawl import read_images, read_order, run_crawl
from bisque_spark.session import get_spark
from bisque_spark.synth import World, seed_urls

spark = get_spark(master="local[8]", shuffle_partitions=8)
world = World(n_hosts=10, n_seeds=12)
wd = tempfile.mkdtemp(prefix="verify_crawl_")
res = run_crawl(spark, world, seed_urls(world), workdir=wd, max_epochs=3)
print("EPOCHS RUN:", res["epochs"])
images = read_images(spark, res)
order = read_order(spark, res)
print("IMAGES ROWS:", images.count())
print("ORDER ROWS:", order.count())
r = images.orderBy("image_id").first()
print("SAMPLE IMAGE:", r["image_id"], "| fmt:", r["fmt"], "| w×h:", r["w"], "x",
      r["h"], "| caption:", repr(r["caption"][:60]))
for r in order.orderBy("epoch", "host", "host_rank").limit(4).collect():
    print("ORDER:", r["epoch"], r["host"], r["host_rank"], r["url"])
for e in range(res["epochs"]):
    print("LINEAGE", e,
          json.load(open(os.path.join(wd, f"epoch={e:05d}", "lineage.json"))))

wd2 = tempfile.mkdtemp(prefix="verify_resume_")
run_crawl(spark, world, seed_urls(world), workdir=wd2, max_epochs=1)
res2 = run_crawl(spark, world, seed_urls(world), workdir=wd2, max_epochs=3,
                 resume=True)
o1 = sorted((r["epoch"], r["host"], r["host_rank"], r["url"])
            for r in read_order(spark, res).collect())
o2 = sorted((r["epoch"], r["host"], r["host_rank"], r["url"])
            for r in read_order(spark, res2).collect())
print("PROBE resume bit-identity:", "OK" if o1 == o2 else "MISMATCH")

wd3 = tempfile.mkdtemp(prefix="verify_empty_")
try:
    res3 = run_crawl(spark, world, [], workdir=wd3, max_epochs=2)
    print("PROBE empty seeds: epochs =", res3["epochs"], "(no crash)")
except Exception as ex:
    print("PROBE empty seeds: EXC", type(ex).__name__, str(ex)[:150])

wd4 = tempfile.mkdtemp(prefix="verify_garbage_")
try:
    res4 = run_crawl(
        spark, world,
        [("ftp://x/y", 0), ("not a url", 1), ("mailto:a@b", 2)],
        workdir=wd4, max_epochs=2,
    )
    print("PROBE garbage seeds: epochs =", res4["epochs"])
except Exception as ex:
    print("PROBE garbage seeds: EXC", type(ex).__name__, str(ex)[:150])
spark.stop()
print("DRIVE COMPLETE")
