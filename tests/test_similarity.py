"""Similarity search: brute-force cosine top-k vs numpy; LSH pairs."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from bisque_spark.operators.similarity import (
    cosine_topk,
    knn_join_bruteforce,
    lsh_near_pairs,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    mat = rng.normal(size=(50, 16)).astype(np.float32)
    mat[10] = mat[3]  # exact duplicate vector
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, mat


def test_cosine_topk_matches_numpy(spark, vecs):
    df, mat = vecs
    q = mat[0].astype(np.float64)
    m = mat.astype(np.float64)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    want = sorted(range(50), key=lambda i: (-cos[i], i))[:5]
    got = [r["vec_id"] for r in cosine_topk(df, "embedding", list(mat[0]), k=5).collect()]
    assert got == want


def test_knn_join(spark, vecs):
    df, mat = vecs
    queries = spark.createDataFrame(
        [(0, [float(x) for x in mat[0]]), (1, [float(x) for x in mat[1]])],
        "query_id long, qvec array<float>",
    )
    out = knn_join_bruteforce(df, queries, k=3)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert len(per_q[0]) == 3 and len(per_q[1]) == 3
    assert 0 in per_q[0]  # self is its own nearest neighbor


def test_ivf_topk_high_recall(spark, vecs):
    from bisque_spark.operators.similarity import ivf_topk

    df, mat = vecs
    q = list(mat[0])
    exact = [r["vec_id"] for r in cosine_topk(df, "embedding", q, k=5).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(df, q, k=5, n_cells=8, n_probe=4).collect()
    ]
    # the query vector itself must be found; recall@5 ≥ 3/5 with 4/8 probes
    assert 0 in approx
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_probe_prunes(spark, vecs):
    from bisque_spark.operators.similarity import ivf_assign

    df, _ = vecs
    assigned, centroids = ivf_assign(df, n_cells=8)
    assert len(centroids) == 8
    cells = assigned.select("cell").distinct().count()
    assert 1 < cells <= 8


def test_lsh_finds_identical_vectors(spark, vecs):
    df, _ = vecs
    pairs = lsh_near_pairs(df, dim=16, n_bits=8, min_cosine=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (3, 10) in got  # identical vectors share every bucket


def test_ivf_clustered_recall_beats_lowest_id_quantizer(spark):
    """Clustered corpus whose first n_cells ids all sit in ONE cluster —
    round 1's lowest-id centroids collapse there (cluster members
    scatter across near-identical centroids; probing misses most of
    them). The sampled+Lloyd quantizer must reach recall@10 >= 0.9."""
    import numpy as np

    from bisque_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.RandomState(11)
    n_clusters, per, dim = 10, 60, 16
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    # ids ordered BY CLUSTER: ids 0..59 are all cluster 0
    for c in range(n_clusters):
        pts = centers[c] + 0.08 * rng.normal(size=(per, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in centers[7]]
    exact = [r["vec_id"] for r in cosine_topk(df, "embedding", q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(df, q, k=10, n_cells=10, n_probe=3).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, (recall, exact, approx)
