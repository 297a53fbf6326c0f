"""URL-seen set: partitioned Bloom shards + exact-confirm anti-join.

North-star operator (BASELINE.json): "deduplicated via a partitioned
Bloom/cuckoo URL-seen filter (one shard per hash-bucketed partition,
merged as binary state tables)".

Why shards-as-data: Spark's ``DataFrame.stat.bloomFilter`` builds ONE
driver-side filter — at 10^10 URLs that is a driver OOM and a broadcast
bottleneck. Here the filter is a table ``url_seen(bucket int, bloom
binary)``: bucket = pmod(url_hash, P), each shard sized for its bucket's
share, built and merged executor-side via ``applyInPandas`` (numpy
bitwise ops per batch, no per-row Python).

Correctness contract (SURVEY.md §7.3 hard-part 3): Bloom positives are
*maybes* — dropping them would lose URLs the oracle visits. So the
filter is a pre-filter only: definite-negatives skip the expensive
exact check; maybes are confirmed by a left-anti join against
``seen_exact(url_hash)``. Bloom false-negative-freedom is
property-tested with hypothesis.

Scale shape: candidates ⋈ shards is a join on ``bucket`` (P rows on the
right — broadcastable at any frontier size since P is fixed);
candidates ⋈ seen_exact is a shuffle join on url_hash, both sides
pre-partitioned by pmod(url_hash, P) so the shuffle is a no-op when the
tables are bucketed to the same layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_BUCKETS = 32
DEFAULT_BITS_PER_SHARD = 1 << 17  # 16 KiB / shard at sandbox scale
DEFAULT_NUM_HASHES = 5


def bits_for(expected_per_shard: int, target_fpr: float = 0.01) -> int:
    """Shard geometry sizing: bits for an expected element count at a
    target false-positive rate (m = -n·ln p / ln²2, rounded up to a
    power of two). At 10^10 URLs over 4096 buckets and 1% fpr this
    gives ~2^25 bits (4 MiB) per shard — data-sized state, never driver
    state. NOTE: geometry must be chosen ONCE per crawl (merge assumes
    identical m/k across epochs); pick from the expected final size."""
    import math

    if expected_per_shard <= 0:
        return DEFAULT_BITS_PER_SHARD
    m = -expected_per_shard * math.log(target_fpr) / (math.log(2) ** 2)
    return 1 << max(10, math.ceil(math.log2(m)))

_SHARD_SCHEMA = "bucket int, bloom binary"


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Double-hashing index set per element: (h1 + i·h2) mod m. Shape (n, k)."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m_bits)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(m_bits)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def _set_bits(bloom: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bloom, (pos >> np.uint64(3)).ravel().astype(np.int64),
                     np.left_shift(np.uint8(1), (pos & np.uint64(7)).ravel().astype(np.uint8)))


def _test_bits(bloom: np.ndarray, pos: np.ndarray) -> np.ndarray:
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
    return ((bloom[byte_idx] & bit) != 0).all(axis=1)


def build_shards(
    hashes_df: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_BITS_PER_SHARD,
    k: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """DataFrame with ``url_hash`` → url_seen shard table (one row/bucket)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bloom = np.zeros(m_bits // 8, dtype=np.uint8)
        h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        _set_bits(bloom, _positions(h, m_bits, k))
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bloom": [bloom.tobytes()]}
        )

    return (
        hashes_df.withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(build, schema=_SHARD_SCHEMA)
    )


def or_merge_shards(shards: DataFrame) -> DataFrame:
    """Collapse a multi-row-per-bucket shard table (e.g. a union of
    per-epoch deltas) to one OR-merged row per bucket — the compaction
    primitive."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: np.ndarray | None = None
        for blob in pdf["bloom"]:
            arr = np.frombuffer(blob, dtype=np.uint8)
            acc = arr.copy() if acc is None else (acc | arr)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bloom": [acc.tobytes()]}
        )

    return shards.groupBy("bucket").applyInPandas(merge, schema=_SHARD_SCHEMA)


def merge_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two shard tables (same geometry) bucket-wise."""
    return or_merge_shards(a.unionByName(b))


def mark_maybe_seen(
    candidates: DataFrame,
    shards: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_BITS_PER_SHARD,
    k: int = DEFAULT_NUM_HASHES,
    dedup_key: str | None = None,
) -> DataFrame:
    """+ boolean ``maybe_seen`` column (false ⇒ definitely new).

    Shape (round 2): candidates COGROUP shards on bucket. The round-1
    broadcast join copied the shard blob into every candidate row's
    Tungsten buffer — megabytes per row at the documented 10^10
    geometry (4 MiB/shard). Cogrouping ships each blob to its bucket's
    group exactly once per epoch; only url_hash-sized rows ride the
    shuffle. ``shards`` may hold MULTIPLE rows per bucket (per-epoch
    deltas) — they are OR-merged inside the group, which also removes
    the separate merge_shards pass from the crawl loop.

    ``dedup_key``: drop duplicate candidate rows by this column inside
    the group — the bucket shuffle already co-locates equal keys, so
    the caller's separate dropDuplicates shuffle is free here. Only
    safe when rows with equal keys are FULLY identical (true for crawl
    candidates: every column derives from the url).
    """
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
    )
    out_schema = f"{out_fields}, maybe_seen boolean"
    cand_cols = [f.name for f in candidates.schema.fields]

    def test_group(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        cand_pdf = cand_pdf.drop(columns=["bucket"])
        if dedup_key is not None and not cand_pdf.empty:
            cand_pdf = cand_pdf.drop_duplicates(subset=[dedup_key])
        if cand_pdf.empty:
            return cand_pdf.assign(maybe_seen=pd.Series([], dtype=bool))
        if shard_pdf.empty:
            return cand_pdf.assign(maybe_seen=False)
        acc: np.ndarray | None = None
        for blob in shard_pdf["bloom"]:
            arr = np.frombuffer(blob, dtype=np.uint8)
            acc = arr.copy() if acc is None else (acc | arr)
        h = cand_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        res = _test_bits(acc, _positions(h, m_bits, k))
        return cand_pdf.assign(maybe_seen=res)

    with_bucket = candidates.withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    shard_b = shards.select(
        F.col("bucket").cast("int").alias("bucket"), "bloom"
    )
    return (
        with_bucket.groupBy("bucket")
        .cogroup(shard_b.groupBy("bucket"))
        .applyInPandas(test_group, schema=out_schema)
        .select(*cand_cols, "maybe_seen")
    )


def filter_unseen(
    candidates: DataFrame,
    shards: DataFrame | None,
    seen_exact: DataFrame | None,
    n_buckets: int = DEFAULT_BUCKETS,
    dedup_key: str | None = None,
) -> DataFrame:
    """Exact-correct dedup: bloom pre-filter + anti-join confirmation.

    ``shards``/``seen_exact`` may be None on the first epoch.
    """
    if shards is None or seen_exact is None:
        if dedup_key is not None:
            candidates = candidates.dropDuplicates([dedup_key])
        return candidates
    marked = mark_maybe_seen(
        candidates, shards, n_buckets=n_buckets, dedup_key=dedup_key
    )
    definite_new = marked.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = marked.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybes.join(
        seen_exact.select("url_hash"), on="url_hash", how="left_anti"
    )
    return definite_new.unionByName(confirmed_new)
