"""Connected-components clustering vs a pure-Python union-find oracle."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from bisque_spark.operators.cluster import connected_components, keep_canonical


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    want = _union_find(edges)
    # oracle roots are not necessarily the min id — normalize both to
    # min-of-component
    comp = {}
    for x, r in want.items():
        comp.setdefault(r, []).append(x)
    norm = {x: min(members) for members in comp.values() for x in members}
    assert got == norm, (edges, got, norm)


def test_cc_shapes(spark):
    # chain, star, cycle, two components, self-loop, singleton pair
    _check(spark, [(1, 2), (2, 3), (3, 4)])
    _check(spark, [(10, 11), (10, 12), (10, 13)])
    _check(spark, [(1, 2), (2, 3), (3, 1)])
    _check(spark, [(1, 2), (5, 6), (6, 7), (9, 9)])
    # long path exercises multiple propagation rounds
    _check(spark, [(i, i + 1) for i in range(0, 30)])


def test_cc_random_graphs(spark):
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=40,
        )
    )
    def check(edges):
        _check(spark, [(int(a), int(b)) for a, b in edges])

    check()


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in keep_canonical(docs, pairs, "doc_id").collect()
    )
    # cluster {1,3,5} keeps 1; cluster {6,7} keeps 6; 0,2,4 untouched
    assert kept == [0, 1, 2, 4, 6]


def test_long_chain_converges_logarithmically(spark):
    """A 120-node path (diameter 119 >> the old 50-round hop limit)
    labels correctly: pointer jumping makes convergence O(log d), and
    non-convergence is a hard error, never a silent mislabel (the
    pre-fix code left 69 of these 120 nodes wrong)."""
    from bisque_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges, max_iters=15).collect()
    }
    assert len(out) == 120
    assert set(out.values()) == {0}

    import pytest

    with pytest.raises(ValueError, match="did not converge"):
        connected_components(edges, max_iters=2).collect()
