"""Multimodal image-column plumbing: decode, features, thumbnails."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from bisque_spark.operators.extract import materialize_images_batches
from bisque_spark.operators.multimodal import (
    image_features,
    image_thumbnails,
    phash_near_pairs,
)
from bisque_spark.synth import decode_image, synth_image


@pytest.fixture(scope="module")
def images(spark):
    ids = spark.range(30).select(
        F.concat(F.lit("img-t-"), F.col("id")).alias("image_id"),
        F.lit("cap").alias("caption"),
    )
    return ids.mapInPandas(
        materialize_images_batches,
        schema="image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    ).cache()


def test_features_match_numpy(spark, images):
    feats = {r["image_id"]: r for r in image_features(images).collect()}
    assert all(r["error"] is None for r in feats.values())
    for image_id in ["img-t-0", "img-t-7"]:
        meta = synth_image(image_id)
        arr = np.frombuffer(
            decode_image(meta["bytes"], meta["fmt"]), dtype=np.uint8
        ).reshape(meta["h"], meta["w"], 3)
        r = feats[image_id]
        assert abs(r["mean_r"] - arr[..., 0].mean()) < 1e-9
        assert abs(r["mean_b"] - arr[..., 2].mean()) < 1e-9


def test_thumbnails(spark, images):
    rows = image_thumbnails(images, target=8).collect()
    for r in rows:
        assert r["error"] is None
        assert r["w"] <= 8 and r["h"] <= 8
        assert len(r["thumb"]) == r["w"] * r["h"] * 3


def test_unknown_codec_contained(spark):
    df = spark.createDataFrame(
        [("x", b"\x00\x01", 2, 2, "jpeg")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = image_features(df).first()
    assert r["error"] == "codec_unavailable:jpeg"
    assert r["mean_r"] is None


def test_phash_pairs_identical_images(spark, images):
    # duplicate one image id → identical phash → hamming 0 pair
    dup = images.limit(1).withColumn("image_id", F.lit("img-t-0-copy"))
    out = phash_near_pairs(images.unionByName(dup), max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert any("img-t-0-copy" in p for pair in got for p in pair)
