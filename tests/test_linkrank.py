"""link_rank (operators/linkrank.py) vs a dense numpy power-iteration
oracle of the same definition."""

import numpy as np
import pyspark.sql.functions as F

from bisque_spark.operators.linkrank import link_rank
from bisque_spark.util import release_caches


def _numpy_pagerank(n, edge_list, damping=0.85, iters=10):
    deg = np.zeros(n)
    for s, _d in edge_list:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[d] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return r


def test_link_rank_matches_numpy_oracle(spark):
    rng = np.random.RandomState(11)
    n = 40
    edge_list = list(
        {
            (int(rng.randint(n)), int(rng.randint(n)))
            for _ in range(150)
        }
    )
    edge_list = [(s, d) for s, d in edge_list if s != d]
    # ensure some dangling nodes exist (no out-links)
    edge_list = [(s, d) for s, d in edge_list if s not in (0, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["rank"] for r in link_rank(edges, iters=10).collect()}
    release_caches()

    present = sorted({v for e in edge_list for v in e})
    remap = {v: i for i, v in enumerate(present)}
    oracle = _numpy_pagerank(
        len(present), [(remap[s], remap[d]) for s, d in edge_list], iters=10
    )
    assert set(got) == set(present)
    for v in present:
        assert abs(got[v] - oracle[remap[v]]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-6  # proper distribution


def test_link_rank_authority_ordering(spark):
    """A sink pointed at by everyone outranks the pointers (its rank
    re-enters only via uniform dangling redistribution); empty graph
    is a clean no-op."""
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 9)], "src long, dst long"
    )
    ranks = {r["id"]: r["rank"] for r in link_rank(edges, iters=8).collect()}
    release_caches()
    assert ranks[99] == max(ranks.values())
    assert ranks[99] > 3 * ranks[2]

    empty = spark.createDataFrame([], "src long, dst long")
    assert link_rank(empty).count() == 0
