"""Batch validators vs an actual Pydantic model (the oracle): the same
rows must pass/fail identically."""

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pydantic import BaseModel, ValidationError, field_validator

from bisque_spark.operators.validate import (
    IMAGES_SPEC,
    validate_images,
    validate_rows,
)
from bisque_spark.synth import synth_image


class ImageRow(BaseModel):
    """Pydantic twin of IMAGES_SPEC (oracle)."""

    image_id: str
    bytes: bytes
    w: int
    h: int
    fmt: str
    caption: str
    phash: int

    @field_validator("image_id")
    @classmethod
    def _id_nonempty(cls, v):
        if len(v) < 1:
            raise ValueError("empty")
        return v

    @field_validator("bytes")
    @classmethod
    def _bytes_nonempty(cls, v):
        if len(v) < 1:
            raise ValueError("empty")
        return v

    @field_validator("w", "h")
    @classmethod
    def _dims(cls, v):
        if not (1 <= v <= 2**31 - 1):
            raise ValueError("out of range")
        return v

    @field_validator("fmt")
    @classmethod
    def _fmt(cls, v):
        if v not in {"raw", "png", "jpeg", "gif", "tiff", "ico", "webp"}:
            raise ValueError("bad fmt")
        return v


def _good_row(i=0):
    meta = synth_image(f"img-val-{i}")
    return {
        "image_id": f"img-val-{i}",
        "bytes": meta["bytes"],
        "w": meta["w"],
        "h": meta["h"],
        "fmt": meta["fmt"],
        "caption": "a caption",
        "phash": meta["phash"],
    }


CORRUPTIONS = [
    {"image_id": ""},
    {"bytes": b""},
    {"w": 0},
    {"h": -5},
    {"fmt": "jpeg"},
    {"caption": None},
    {"w": None},
    {},  # clean
]


def test_matches_pydantic_verdicts():
    rows = []
    for i, corr in enumerate(CORRUPTIONS):
        row = _good_row(i)
        row.update(corr)
        rows.append(row)
    valid, errors = validate_rows(pd.DataFrame(rows), IMAGES_SPEC)
    for row, got_valid, errs in zip(rows, valid, errors):
        try:
            ImageRow(**{k: v for k, v in row.items() if v is not None})
            # Pydantic won't see explicit None (we drop them) — treat a
            # dropped required field as invalid, like missing
            want_valid = all(v is not None for v in row.values())
        except ValidationError:
            want_valid = False
        assert got_valid == want_valid, (row, errs)


def test_all_field_errors_collected():
    row = _good_row()
    row.update({"w": 0, "fmt": "svg", "image_id": ""})
    valid, errors = validate_rows(pd.DataFrame([row]), IMAGES_SPEC)
    assert not valid[0]
    assert len(errors[0]) == 3  # every failing field reported


def test_raw_length_cross_check():
    row = _good_row()
    if row["fmt"] != "raw":
        row["fmt"] = "raw"
        row["bytes"] = b"\x00" * (row["w"] * row["h"] * 3)
    good_valid, _ = validate_rows(pd.DataFrame([row]), IMAGES_SPEC, "images")
    assert good_valid[0]
    row["bytes"] = row["bytes"][:-1]
    bad_valid, bad_errors = validate_rows(pd.DataFrame([row]), IMAGES_SPEC, "images")
    assert not bad_valid[0]
    assert "w*h*3" in bad_errors[0][0]


def test_spark_stage(spark):
    ids = spark.range(20).select(
        F.concat(F.lit("img-vs-"), F.col("id")).alias("image_id"),
        F.lit("cap").alias("caption"),
    )
    from bisque_spark.operators.extract import materialize_images_batches

    images = ids.mapInPandas(
        materialize_images_batches,
        schema="image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    out = validate_images(images)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["valid"] for r in rows), [r["errors"] for r in rows if not r["valid"]]
    # corrupt one column → invalid with the right error
    bad = validate_images(images.withColumn("w", F.lit(0))).collect()
    assert all(not r["valid"] for r in bad)
    assert any("min" in e for r in bad for e in r["errors"])
