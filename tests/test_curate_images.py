"""Composition tests for plans/curate_images.run_image_curation:
monotone funnel, planted-junk elimination, canonical dedup keeps,
determinism, idempotent catalog sink."""

import pyspark.sql.functions as F
import pytest

from bisque_spark.operators.extract import materialize_images_batches
from bisque_spark.plans.curate_images import run_image_curation
from bisque_spark.synth import synth_image

IMG_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

# ids planted to FAIL a specific gate (zzz- prefix sorts after every
# real synth id, so min-id canonical keeps never pick a plant)
JUNK_IDS = {
    "zzz-flat",      # constant fill: sharpness 0, entropy 0
    "zzz-garbage",   # undecodable bytes → error column
    "zzz-tiny",      # 4×4 < min_side
    "zzz-aspect",    # 72×8 > max_aspect·min_side
    "zzz-nocap",     # empty caption
    "zzz-dup",       # byte-identical to img-t-0 (exact dedup loser)
    "zzz-near",      # phash 1 bit from img-t-1 (near-dup loser)
}


def _plants():
    base0 = synth_image("img-t-0")
    base1 = synth_image("img-t-1")
    flat = bytes([77]) * (16 * 16 * 3)
    ramp = bytes(range(256)) * 6  # 16×32 pseudo-texture, decodable
    rows = [
        ("zzz-flat", flat, 16, 16, "raw", "flat fill", 1),
        ("zzz-garbage", b"\x00\x01\x02", 8, 8, "png", "broken", 2),
        ("zzz-tiny", bytes(4 * 4 * 3), 4, 4, "raw", "tiny", 3),
        ("zzz-aspect", bytes(range(216)) * 8, 72, 8, "raw", "banner", 4),
        ("zzz-nocap", ramp, 32, 16, "raw", "", 5),
        (
            "zzz-dup", base0["bytes"], base0["w"], base0["h"],
            base0["fmt"], "copied caption", base0["phash"],
        ),
        (
            "zzz-near", ramp, 32, 16, "raw", "near twin",
            base1["phash"] ^ 1,
        ),
    ]
    assert {r[0] for r in rows} == JUNK_IDS
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    ids = spark.range(40).select(
        F.concat(F.lit("img-t-"), F.col("id")).alias("image_id"),
        F.lit("a synthetic caption").alias("caption"),
    )
    real = ids.mapInPandas(materialize_images_batches, schema=IMG_SCHEMA)
    plants = spark.createDataFrame(_plants(), IMG_SCHEMA)
    return real.unionByName(plants).cache()


def _run(spark, corpus, workdir, **kw):
    kw.setdefault("sample_per_cell", 1000)  # diversity: no-op by default
    return run_image_curation(spark, corpus, str(workdir), **kw)


def test_funnel_and_planted_junk(spark, corpus, tmp_path):
    counts = _run(spark, corpus, tmp_path / "cat")
    assert counts["input"] == 47
    # monotone funnel
    assert (
        counts["input"]
        >= counts["after_quality"]
        >= counts["after_caption"]
        >= counts["after_dedup"]
        >= counts["final"]
    )
    from bisque_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    out = cat.read("curated_images")
    got = {r["image_id"] for r in out.select("image_id").collect()}
    # every plant dies at its gate; every real synth id survives
    assert got.isdisjoint(JUNK_IDS)
    assert got == {f"img-t-{i}" for i in range(40)}
    # the catalog row carries the stage-1 scores
    row = out.where(F.col("image_id") == "img-t-0").collect()[0]
    assert row["sharpness"] > 1.0 and row["entropy"] > 0.5
    assert row["caption"] == "a synthetic caption"


def test_gate_attribution(spark, corpus, tmp_path):
    """Each plant falls at the INTENDED stage, visible in the counts."""
    counts = _run(spark, corpus, tmp_path / "cat")
    # quality gate removes flat, garbage, tiny, aspect (4 rows)
    assert counts["after_quality"] == counts["input"] - 4
    # caption gate removes the empty-caption row
    assert counts["after_caption"] == counts["after_quality"] - 1
    # dedup removes the exact copy and the phash near-twin
    assert counts["after_dedup"] == counts["after_caption"] - 2
    assert counts["final"] == counts["after_dedup"]


@pytest.mark.slow
def test_deterministic(spark, corpus, tmp_path):
    c1 = _run(spark, corpus, tmp_path / "a")
    c2 = _run(spark, corpus, tmp_path / "b")
    assert {k: v for k, v in c1.items() if k != "catalog_version"} == {
        k: v for k, v in c2.items() if k != "catalog_version"
    }


@pytest.mark.slow
def test_idempotent_sink(spark, corpus, tmp_path):
    from bisque_spark.sources.catalog import ParquetCatalog

    c1 = _run(spark, corpus, tmp_path / "cat")
    c2 = _run(spark, corpus, tmp_path / "cat")
    assert c2["final"] == c1["final"]
    assert c2["catalog_version"] > c1["catalog_version"]
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    out = cat.read("curated_images")
    assert out.count() == c1["final"]  # upsert, never duplicate
    assert out.select("image_id").distinct().count() == c1["final"]


def test_diversity_prunes_dense_cells(spark, corpus, tmp_path):
    n_cells, k = 4, 3
    counts = _run(
        spark, corpus, tmp_path / "cat",
        sample_per_cell=k, n_cells=n_cells,
    )
    assert 0 < counts["final"] <= n_cells * k
    assert counts["final"] < counts["after_dedup"]


def test_semantic_stage_drops_thumbnail_twin(spark, corpus, tmp_path):
    """A pixel-near-copy with a DIFFERENT phash (so stage 6 cannot see
    it) dies at the optional SemDeDup stage; its source survives."""
    from bisque_spark.hashing import xxhash64_bytes
    from bisque_spark.synth import image_pixels, synth_image

    base = synth_image("img-t-2")
    px = bytearray(image_pixels("img-t-2", base["w"], base["h"]))
    px[0] ^= 1  # one-bit pixel change: phash differs, cosine ~ 1
    twin = bytes(px)
    extra = spark.createDataFrame(
        [(
            "zzz-semtwin", twin, base["w"], base["h"], "raw",
            "semantic twin", xxhash64_bytes(twin),
        )],
        IMG_SCHEMA,
    )
    counts = _run(
        spark, corpus.unionByName(extra), tmp_path / "cat",
        semantic_tau=0.999,
    )
    assert counts["after_semantic"] == counts["after_dedup"] - 1
    from bisque_spark.sources.catalog import ParquetCatalog

    got = {
        r["image_id"]
        for r in ParquetCatalog(spark, str(tmp_path / "cat"))
        .read("curated_images").select("image_id").collect()
    }
    assert "img-t-2" in got and "zzz-semtwin" not in got
