"""Cuckoo-filter URL-seen shards — the deletable twin of the Bloom
shards in operators/seen.py.

North-star operator (BASELINE.json): "deduplicated via a partitioned
Bloom/cuckoo URL-seen filter (one shard per hash-bucketed partition,
merged as binary state tables)". Bloom is the crawl's default (smaller
at equal fpr, O(1) merge by OR); the cuckoo variant adds the one thing
Bloom cannot do: DELETION — e.g. recrawl scheduling that re-opens a
URL, or retracting a poisoned host's pages from the seen set without
rebuilding the filter.

Design = partial-key cuckoo hashing (Fan, Andersen, Kaminsky,
Mitzenmacher: "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014 — public paper): nb buckets × 4 slots of 16-bit fingerprints;
item with hash h lives in bucket i1 = h mod nb or i2 = i1 XOR H(fp).
Because the alternate index depends only on (index, fingerprint), any
occupied slot can be re-inserted during merges/evictions without
knowing which of its two homes it currently uses.

Same shard-table contract as seen.py: state is DATA
(``bucket int, cuckoo binary``), one shard per hash-bucketed
partition, built/merged/queried executor-side via applyInPandas with
numpy batch ops — never driver state. Lookups are fully vectorized;
inserts walk elements (eviction is inherently sequential) but
amortize over Arrow batches. The exact-confirm contract is identical:
cuckoo positives are maybes, false-negative-freedom is the invariant
(property-tested), and deletion REQUIRES prior insertion (deleting a
never-inserted key can evict a same-fingerprint stranger — the
documented cuckoo-filter contract, enforced here by deleting only
confirmed-seen keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_BUCKETS = 32
SLOTS = 4
_MAX_KICKS = 500

_SHARD_SCHEMA = "bucket int, cuckoo binary"


def nb_for(expected_per_shard: int) -> int:
    """Bucket count for an expected element count: 4-slot buckets at
    ≤ ~0.84 load (the paper's high-load operating point), rounded up
    to a power of two (index arithmetic uses masks)."""
    import math

    need = max(1, int(expected_per_shard / (SLOTS * 0.84)))
    return 1 << max(4, math.ceil(math.log2(need)))


def _fp_of(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from 64-bit hashes."""
    fp = ((h.astype(np.uint64) >> np.uint64(40)) & np.uint64(0xFFFF)).astype(
        np.uint16
    )
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _i1_of(h: np.ndarray, nb: int) -> np.ndarray:
    return (h.astype(np.uint64) & np.uint64(nb - 1)).astype(np.int64)


def _alt(idx: np.ndarray | int, fp: np.ndarray | int, nb: int):
    """Partial-key alternate index: i XOR H(fp). Self-inverse, so it
    maps i1→i2 and i2→i1 — re-insertion never needs to know which."""
    hfp = (np.uint64(0x5BD1E995) * np.asarray(fp, dtype=np.uint64)) & np.uint64(
        nb - 1
    )
    return (np.asarray(idx, dtype=np.uint64) ^ hfp).astype(np.int64)


def _empty_table(nb: int) -> np.ndarray:
    return np.zeros((nb, SLOTS), dtype=np.uint16)


def _insert_many(table: np.ndarray, hashes: np.ndarray) -> None:
    """Insert a batch (idempotent for already-present fingerprints).
    Raises on overflow — size shards with nb_for."""
    nb = table.shape[0]
    if len(hashes) == 0:
        return
    h = np.asarray(hashes, dtype=np.uint64)
    fps = _fp_of(h)
    i1s = _i1_of(h, nb)
    i2s = _alt(i1s, fps, nb)
    # vectorized present-check first: present keys are no-ops
    present = (table[i1s] == fps[:, None]).any(axis=1) | (
        table[i2s] == fps[:, None]
    ).any(axis=1)
    for fp, i1, i2 in zip(fps[~present], i1s[~present], i2s[~present]):
        fp = int(fp)
        # re-check (an earlier insert in this batch may have added it)
        if fp in table[i1] or fp in table[i2]:
            continue
        placed = False
        for idx in (int(i1), int(i2)):
            free = np.flatnonzero(table[idx] == 0)
            if len(free):
                table[idx, free[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_fp, cur_idx = fp, int(i1)
        for kick in range(_MAX_KICKS):
            slot = (cur_fp + kick) % SLOTS  # deterministic victim
            cur_fp, table[cur_idx, slot] = int(table[cur_idx, slot]), cur_fp
            cur_idx = int(_alt(cur_idx, cur_fp, nb))
            free = np.flatnonzero(table[cur_idx] == 0)
            if len(free):
                table[cur_idx, free[0]] = cur_fp
                break
        else:
            raise ValueError(
                f"cuckoo shard overflow (nb={nb}, {SLOTS} slots): size "
                "with nb_for(expected_per_shard)"
            )


def _contains_many(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fully vectorized membership: maybe-seen per hash."""
    nb = table.shape[0]
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    h = np.asarray(hashes, dtype=np.uint64)
    fps = _fp_of(h)
    i1s = _i1_of(h, nb)
    i2s = _alt(i1s, fps, nb)
    return (table[i1s] == fps[:, None]).any(axis=1) | (
        table[i2s] == fps[:, None]
    ).any(axis=1)


def _delete_many(table: np.ndarray, hashes: np.ndarray) -> int:
    """Remove ONE matching fingerprint per key (contract: key was
    inserted). Returns the number of removals."""
    nb = table.shape[0]
    removed = 0
    h = np.asarray(hashes, dtype=np.uint64)
    fps = _fp_of(h)
    i1s = _i1_of(h, nb)
    i2s = _alt(i1s, fps, nb)
    for fp, i1, i2 in zip(fps, i1s, i2s):
        fp = int(fp)
        for idx in (int(i1), int(i2)):
            hit = np.flatnonzero(table[idx] == fp)
            if len(hit):
                table[idx, hit[0]] = 0
                removed += 1
                break
    return removed


# ---- shard-table operators (same shapes as seen.py's Bloom ops) ---------


def build_shards(
    df: DataFrame,
    hash_col: str = "url_hash",
    buckets: int = DEFAULT_BUCKETS,
    nb: int = 1 << 12,
) -> DataFrame:
    """(url_hash) rows → ``(bucket, cuckoo)`` shard table."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = _empty_table(nb)
        _insert_many(table, pdf[hash_col].to_numpy(dtype=np.uint64))
        b = int(pdf["bucket"].iloc[0])
        return pd.DataFrame({"bucket": [b], "cuckoo": [table.tobytes()]})

    keyed = df.select(
        F.col(hash_col),
        F.pmod(F.col(hash_col), F.lit(buckets)).cast("int").alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandas(build, schema=_SHARD_SCHEMA)


def merge_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two shard tables per bucket: every occupied fingerprint of
    one table re-inserts into the other (the partial-key property makes
    (index, fp) alone sufficient)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        tables = [
            np.frombuffer(blob, dtype=np.uint16).reshape(-1, SLOTS).copy()
            for blob in pdf["cuckoo"]
        ]
        base = tables[0]
        nb = base.shape[0]
        for other in tables[1:]:
            if other.shape[0] != nb:
                raise ValueError("cuckoo shard geometry mismatch in merge")
            occ_idx, occ_slot = np.nonzero(other)
            for idx, slot in zip(occ_idx, occ_slot):
                fp = int(other[idx, slot])
                i2 = int(_alt(idx, fp, nb))
                if fp in base[idx] or fp in base[i2]:
                    continue
                placed = False
                for t in (int(idx), i2):
                    free = np.flatnonzero(base[t] == 0)
                    if len(free):
                        base[t, free[0]] = fp
                        placed = True
                        break
                if not placed:
                    cur_fp, cur_idx = fp, int(idx)
                    for kick in range(_MAX_KICKS):
                        slot2 = (cur_fp + kick) % SLOTS
                        cur_fp, base[cur_idx, slot2] = (
                            int(base[cur_idx, slot2]),
                            cur_fp,
                        )
                        cur_idx = int(_alt(cur_idx, cur_fp, nb))
                        free = np.flatnonzero(base[cur_idx] == 0)
                        if len(free):
                            base[cur_idx, free[0]] = cur_fp
                            break
                    else:
                        raise ValueError("cuckoo shard overflow in merge")
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "cuckoo": [base.tobytes()]}
        )

    both = a.unionByName(b)
    return both.groupBy("bucket").applyInPandas(merge, schema=_SHARD_SCHEMA)


def mark_maybe_seen(
    candidates: DataFrame,
    shards: DataFrame,
    hash_col: str = "url_hash",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """candidates + ``maybe_seen`` boolean (vectorized lookup per
    bucket via cogroup — the shard blob never rides the row plan)."""
    keyed = candidates.withColumn(
        "bucket", F.pmod(F.col(hash_col), F.lit(buckets)).cast("int")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields
    ) + ", maybe_seen boolean"

    def test_group(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return pd.DataFrame(columns=list(cand.columns) + ["maybe_seen"])
        if len(shard) == 0:
            cand = cand.copy()
            cand["maybe_seen"] = False
            return cand
        table = (
            np.frombuffer(shard["cuckoo"].iloc[0], dtype=np.uint16)
            .reshape(-1, SLOTS)
        )
        cand = cand.copy()
        cand["maybe_seen"] = _contains_many(
            table, cand[hash_col].to_numpy(dtype=np.uint64)
        )
        return cand

    return keyed.groupBy("bucket").cogroup(
        shards.groupBy("bucket")
    ).applyInPandas(test_group, schema=out_schema)


def delete_from_shards(
    shards: DataFrame,
    deletions: DataFrame,
    hash_col: str = "url_hash",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Remove keys from the filter (the operation Bloom cannot do).
    Contract: every deleted key was previously inserted — enforced by
    callers deleting only confirmed-seen keys (a never-inserted key
    could evict a same-fingerprint stranger)."""
    keyed = deletions.select(
        F.col(hash_col),
        F.pmod(F.col(hash_col), F.lit(buckets)).cast("int").alias("bucket"),
    )

    def drop_group(shard: pd.DataFrame, dels: pd.DataFrame) -> pd.DataFrame:
        if len(shard) == 0:
            return pd.DataFrame(columns=["bucket", "cuckoo"])
        table = (
            np.frombuffer(shard["cuckoo"].iloc[0], dtype=np.uint16)
            .reshape(-1, SLOTS)
            .copy()
        )
        if len(dels):
            _delete_many(table, dels[hash_col].to_numpy(dtype=np.uint64))
        return pd.DataFrame(
            {
                "bucket": [int(shard["bucket"].iloc[0])],
                "cuckoo": [table.tobytes()],
            }
        )

    return shards.groupBy("bucket").cogroup(
        keyed.groupBy("bucket")
    ).applyInPandas(drop_group, schema=_SHARD_SCHEMA)


def filter_unseen_cuckoo(
    candidates: DataFrame,
    shards: DataFrame | None,
    seen_exact: DataFrame | None,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Drop-in twin of seen.filter_unseen with cuckoo shards: filter
    positives are maybes, confirmed by the exact anti-join — the
    correctness contract is identical (never depends on the filter),
    plus this family supports delete_from_shards for recrawl."""
    if shards is None or seen_exact is None:
        return candidates
    marked = mark_maybe_seen(candidates, shards, buckets=buckets)
    definite_new = marked.where(~F.col("maybe_seen")).drop(
        "maybe_seen", "bucket"
    )
    maybes = marked.where(F.col("maybe_seen")).drop("maybe_seen", "bucket")
    confirmed_new = maybes.join(
        seen_exact.select("url_hash"), on="url_hash", how="left_anti"
    )
    return definite_new.unionByName(confirmed_new)
