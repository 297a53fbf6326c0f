"""Authority-weighted crawl ordering: link_rank wired into the frontier
priority (VERDICT r4 #2 — the Cho/Garcia-Molina/Page recrawl loop).

Crawl 1 commits the observed link graph; link_rank over that graph
produces the authority table; crawl 2 runs with priority =
-depth + weight·rank. The oracle crawler is handed the SAME authority
values (rank correctness is pinned separately by the numpy oracle in
test_linkrank.py), so order equality here pins the scheduling
integration itself, bit-exact floats included.
"""

import pytest

from bisque_spark.operators.linkrank import authority_from_crawl
from bisque_spark.plans.crawl import read_links, read_order, run_crawl
from bisque_spark.synth import World, seed_urls
from bisque_spark.util import release_caches
from oracle_crawler import crawl_oracle

WORLD = World(n_hosts=12, n_seeds=18)
MAX_EPOCHS = 3
WEIGHT = 8.0


def _order_tuples(spark, res):
    rows = read_order(spark, res).collect()
    return sorted(
        (r["epoch"], r["host"], r["host_rank"], float(r["priority"]),
         r["url_hash"], r["url"])
        for r in rows
    )


@pytest.mark.slow
def test_authority_weighted_crawl_matches_oracle(spark, tmp_path_factory):
    # crawl 1 (unweighted) — its committed link graph is the rank input
    wd1 = str(tmp_path_factory.mktemp("crawl_auth_base"))
    res1 = run_crawl(
        spark, WORLD, seed_urls(WORLD), workdir=wd1, max_epochs=MAX_EPOCHS
    )
    oracle1 = crawl_oracle(WORLD, seed_urls(WORLD), max_epochs=MAX_EPOCHS)

    # the committed link slice IS the raw observed graph (multi-edges
    # preserved, before robots/dedup)
    got_edges = sorted(
        (r["url_hash"], r["dst_hash"])
        for r in read_links(spark, res1).collect()
    )
    assert got_edges == sorted(oracle1["links"])
    assert got_edges, "world produced no links — test would be vacuous"

    auth_df = authority_from_crawl(spark, res1, iters=6)
    auth = {r["url_hash"]: r["rank"] for r in auth_df.collect()}
    assert abs(sum(auth.values()) - 1.0) < 1e-6

    # crawl 2: authority-weighted, Spark and oracle fed the same table
    wd2 = str(tmp_path_factory.mktemp("crawl_auth_on"))
    res2 = run_crawl(
        spark, WORLD, seed_urls(WORLD), workdir=wd2,
        max_epochs=MAX_EPOCHS, authority=auth_df, authority_weight=WEIGHT,
    )
    oracle2 = crawl_oracle(
        WORLD, seed_urls(WORLD), max_epochs=MAX_EPOCHS,
        authority=auth, authority_weight=WEIGHT,
    )
    got = _order_tuples(spark, res2)
    want = sorted(
        (e, h, rk, float(p), uh, u)
        for (e, h, rk, p, uh, u) in oracle2["order"]
    )
    assert got == want

    # the authority signal actually reorders the crawl (not vacuous):
    # compare fetch sequences ignoring the priority values themselves
    seq_base = [
        (e, h, rk, uh) for (e, h, rk, p, uh, u) in sorted(oracle1["order"])
    ]
    seq_auth = [
        (e, h, rk, uh) for (e, h, rk, p, uh, u) in sorted(oracle2["order"])
    ]
    assert seq_base != seq_auth

    # kill-and-resume under authority: the resumed crawl is handed the
    # SAME authority table (determinism contract) and must reproduce
    # the uninterrupted run bit-identically
    wd3 = str(tmp_path_factory.mktemp("crawl_auth_resume"))
    run_crawl(
        spark, WORLD, seed_urls(WORLD), workdir=wd3,
        max_epochs=2, authority=auth_df, authority_weight=WEIGHT,
    )
    res3 = run_crawl(
        spark, WORLD, seed_urls(WORLD), workdir=wd3,
        max_epochs=MAX_EPOCHS, resume=True,
        authority=auth_df, authority_weight=WEIGHT,
    )
    assert _order_tuples(spark, res3) == got
    release_caches()
