"""Crawl equivalence under extreme host skew (Zipf head concentration):
the salted two-phase politeness rank must still reproduce the oracle
exactly while no single task sees the hot host's whole queue."""

import pytest

from bisque_spark.plans.crawl import read_order, read_seen, run_crawl
from bisque_spark.synth import World, seed_urls
from oracle_crawler import crawl_oracle

# zipf_power=8 → almost every cross-host link targets host 0
WORLD = World(n_hosts=10, n_seeds=16, zipf_power=8.0, links_per_page=8)


@pytest.mark.slow
def test_skewed_crawl_matches_oracle(spark, tmp_path):
    oracle = crawl_oracle(WORLD, seed_urls(WORLD), max_epochs=3)
    res = run_crawl(
        spark, WORLD, seed_urls(WORLD), workdir=str(tmp_path / "wd"), max_epochs=3
    )
    got = sorted(
        (r["epoch"], r["host"], r["host_rank"], r["url_hash"])
        for r in read_order(spark, res).collect()
    )
    want = sorted(
        (e, h, rk, uh) for (e, h, rk, _p, uh, _u) in oracle["order"]
    )
    assert got == want
    seen = {r["url_hash"] for r in read_seen(spark, res).collect()}
    assert seen == oracle["seen"]
    # skew sanity: the head host dominates the frontier
    hosts = [h for (_e, h, _rk, _uh) in want]
    head_share = hosts.count(WORLD.host(0)) / len(hosts)
    assert head_share >= 0.2
