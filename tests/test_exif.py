"""EXIF APP1 metadata (functions/exif.py + multimodal.image_exif):
build/parse round-trip both endians, marker-stream extraction from
real JPEGs, damage containment, orientation transform algebra, and the
Spark batch operator."""

import numpy as np
import pytest

from bisque_spark.functions.exif import (
    apply_orientation,
    build_exif_app1,
    extract_exif,
    parse_exif_app1,
)
from bisque_spark.functions.jpeg import _seg, decode_jpeg, encode_jpeg

FIELDS = dict(
    orientation=6,
    make="NikonCorp",
    model="D7",
    datetime_original="2026:08:17 12:00:01",
)


@pytest.mark.parametrize("big_endian", [False, True])
def test_build_parse_roundtrip(big_endian):
    d = parse_exif_app1(build_exif_app1(big_endian=big_endian, **FIELDS))
    assert d["orientation"] == 6
    assert d["make"] == "NikonCorp"
    assert d["model"] == "D7"
    assert d["datetime_original"] == "2026:08:17 12:00:01"


def _jpeg_with_exif(**kw):
    img = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    j = encode_jpeg(img, 95)
    return j[:2] + _seg(0xE1, build_exif_app1(**kw)) + j[2:]


def test_extract_from_jpeg_and_decoder_tolerates_app1():
    j = _jpeg_with_exif(orientation=8, make="X")
    got = extract_exif(j)
    assert got["orientation"] == 8 and got["make"] == "X"
    decode_jpeg(j)  # APP1 segment must not disturb the pixel decode
    # EXIF-less JPEG and non-JPEG bytes → {}
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    assert extract_exif(encode_jpeg(img)) == {}
    assert extract_exif(b"\x89PNG....") == {}


def test_damage_contained():
    p = build_exif_app1(**FIELDS)
    assert parse_exif_app1(b"Exif\x00\x00XX") == {}
    assert parse_exif_app1(b"XMP\x00" + p[4:]) == {}
    for cut in (8, 12, 20, len(p) - 3):
        parse_exif_app1(p[:cut])  # partial fields OK, raising is not
    # invalid orientation values are dropped, not propagated
    bad = build_exif_app1(orientation=9)
    assert "orientation" not in parse_exif_app1(bad)


def test_orientation_transform_algebra():
    px = np.arange(24).reshape(3, 4, 2)
    assert np.array_equal(apply_orientation(px, 1), px)
    assert np.array_equal(apply_orientation(px, 3), px[::-1, ::-1])
    # 6 (rot90 CW) then 8 (rot90 CCW) is identity
    assert np.array_equal(
        apply_orientation(apply_orientation(px, 6), 8), px
    )
    # mirror pairs are involutions
    for o in (2, 3, 4, 5, 7):
        assert np.array_equal(
            apply_orientation(apply_orientation(px, o), o), px
        )
    # transposing orientations swap the axes
    for o in (5, 6, 7, 8):
        assert apply_orientation(px, o).shape == (4, 3, 2)
    # unknown values pass through
    assert np.array_equal(apply_orientation(px, 0), px)
    assert np.array_equal(apply_orientation(px, 42), px)


def test_image_exif_operator(spark):
    rows = [
        ("a", bytearray(_jpeg_with_exif(orientation=6, make="Canon"))),
        ("b", bytearray(_jpeg_with_exif(model="P30",
                                        datetime_original="2026:01:02 03:04:05"))),
        ("c", bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))),
        ("d", bytearray(b"not an image")),
        ("e", None),
    ]
    from bisque_spark.operators.multimodal import image_exif

    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r.asDict() for r in image_exif(df).collect()}
    assert got["a"]["orientation"] == 6 and got["a"]["make"] == "Canon"
    assert got["a"]["has_exif"]
    assert got["b"]["model"] == "P30"
    assert got["b"]["datetime_original"] == "2026:01:02 03:04:05"
    assert not got["c"]["has_exif"] and got["c"]["orientation"] is None
    assert not got["d"]["has_exif"]
    assert not got["e"]["has_exif"]


def test_synth_world_plants_exif_rows():
    """A third of synth jpeg rows carry an Exif APP1; planting must not
    perturb pixels (phash is pixel-derived) or the PSNR gate."""
    from bisque_spark.functions.jpeg import psnr
    from bisque_spark.synth import decode_image, image_pixels, synth_image

    tagged = untagged = 0
    for i in range(120):
        meta = synth_image(f"exif-world-{i}")
        if meta["fmt"] != "jpeg":
            continue
        d = extract_exif(bytes(meta["bytes"]))
        if d:
            tagged += 1
            assert 1 <= d["orientation"] <= 8
            assert d["make"].startswith("synthcam")
        else:
            untagged += 1
        # pixels unaffected by the APP1 segment
        w, h = meta["w"], meta["h"]
        want = np.frombuffer(
            image_pixels(f"exif-world-{i}", w, h), dtype=np.uint8
        ).reshape(h, w, 3)
        got = np.frombuffer(
            decode_image(bytes(meta["bytes"]), "jpeg"), dtype=np.uint8
        ).reshape(h, w, 3)
        assert psnr(want, got) >= 40.0
    assert tagged >= 5 and untagged >= 5


def test_xmp_app1_before_exif_and_fill_bytes():
    """Real-web layout: an XMP APP1 often PRECEDES the Exif APP1, and
    0xFF fill bytes pad between markers (T.81 B.1.1.2) — neither may
    abort the walk (r6 ADVICE)."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    j = encode_jpeg(img, 95)
    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
    exif = build_exif_app1(orientation=6, make="X")
    # SOI, XMP APP1, fill bytes, Exif APP1, rest
    crafted = (
        j[:2] + _seg(0xE1, xmp) + b"\xff\xff\xff" + _seg(0xE1, exif) + j[2:]
    )
    got = extract_exif(crafted)
    assert got["orientation"] == 6 and got["make"] == "X"
    # XMP-only JPEG: no Exif fields, but no crash either
    assert extract_exif(j[:2] + _seg(0xE1, xmp) + j[2:]) == {}
