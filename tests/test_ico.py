"""ICO (favicon) codec tests — functions/ico.py.

Round-trips cover every DIB depth (1/4/8/24/32) plus PNG-in-ICO,
the doubled-height XOR+AND layout, the legacy all-zero-alpha quirk,
largest-entry selection, the 0-means-256 directory encoding, and
damage containment. Expected pixels are computed by inline formulas
(palette lookup / alpha over white), independent of the module.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bisque_spark.functions.ico import decode_ico, encode_ico, ico_entries

RNG = np.random.default_rng(20260818)


def _over_white(rgb, alpha):
    a = alpha.astype(np.float64)[..., None] / 255.0
    return np.clip(
        np.rint(rgb.astype(np.float64) * a + 255.0 * (1.0 - a)), 0, 255
    ).astype(np.uint8)


def test_dib32_alpha_roundtrip():
    rgb = RNG.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    alpha = RNG.integers(0, 256, (10, 7), dtype=np.uint8)
    data = encode_ico([(rgb, {"kind": "dib32", "alpha": alpha})])
    assert (decode_ico(data) == _over_white(rgb, alpha)).all()


def test_dib32_zero_alpha_quirk_uses_and_mask():
    """All-zero alpha channel ⇒ the AND mask governs (legacy files)."""
    rgb = RNG.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    alpha = np.zeros((6, 6), dtype=np.uint8)
    alpha[:3] = 1  # only drives the AND mask (>0 ⇒ opaque bit)
    data = encode_ico([(rgb, {"kind": "dib32", "alpha": alpha})])
    # encoder writes alpha channel 1 for top rows — tweak them to 0
    # so the CHANNEL is all-zero but the mask says top half opaque
    raw = bytearray(data)
    # locate XOR plane: 6 hdr + 16 dir + 40 bih
    xor_off = 6 + 16 + 40
    stride = 6 * 4
    for y in range(6):
        for x in range(6):
            raw[xor_off + y * stride + 4 * x + 3] = 0
    got = decode_ico(bytes(raw))
    expect = _over_white(rgb, np.where(alpha > 0, 255, 0).astype(np.uint8))
    assert (got == expect).all()


def test_dib24_and_mask_transparency():
    rgb = RNG.integers(0, 256, (8, 5, 3), dtype=np.uint8)
    alpha = np.where(RNG.random((8, 5)) < 0.4, 0, 255).astype(np.uint8)
    data = encode_ico([(rgb, {"kind": "dib24", "alpha": alpha})])
    assert (decode_ico(data) == _over_white(rgb, alpha)).all()


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_palette_dib_roundtrip(bpp):
    n = 1 << bpp
    palette = RNG.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = RNG.integers(0, n, (9, 14), dtype=np.uint16)
    alpha = np.where(RNG.random((9, 14)) < 0.3, 0, 255).astype(np.uint8)
    data = encode_ico(
        [(idx, {"kind": f"dib{bpp}", "palette": palette, "alpha": alpha})]
    )
    expect = _over_white(palette[idx], alpha)
    assert (decode_ico(data) == expect).all()


def test_png_in_ico_and_largest_entry_selection():
    small = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    big = RNG.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    data = encode_ico(
        [(small, {"kind": "dib24"}), (big, {"kind": "png"})]
    )
    ents = ico_entries(data)
    assert [e["w"] for e in ents] == [16, 48]
    assert [e["is_png"] for e in ents] == [False, True]
    assert (decode_ico(data) == big).all()  # largest wins, PNG lossless


def test_256_directory_encoding():
    img = RNG.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    data = encode_ico([(img, {"kind": "png"})])
    (ent,) = ico_entries(data)
    assert ent["w"] == ent["h"] == 256
    assert data[6] == 0 and data[7] == 0  # 0 encodes 256
    assert (decode_ico(data) == img).all()
    with pytest.raises(ValueError):
        encode_ico([(np.zeros((257, 10, 3), np.uint8), {"kind": "png"})])


def test_entries_is_header_only_and_guards():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    data = encode_ico([(rgb, {"kind": "dib24"})])
    # metadata works even when pixel data is garbage
    raw = bytearray(data)
    raw[-10:] = b"\x00" * 10
    assert ico_entries(bytes(raw))[0]["w"] == 4

    with pytest.raises(ValueError):
        ico_entries(b"\x00" * 4)
    with pytest.raises(ValueError):
        ico_entries(struct.pack("<HHH", 1, 1, 1) + b"\x00" * 16)  # reserved
    with pytest.raises(ValueError):
        ico_entries(struct.pack("<HHH", 0, 9, 1) + b"\x00" * 16)  # type
    # directory pointing beyond the file
    bad = bytearray(data)
    struct.pack_into("<I", bad, 6 + 12, 1 << 20)
    with pytest.raises(ValueError):
        ico_entries(bytes(bad))

    # truncated XOR plane
    with pytest.raises(ValueError):
        decode_ico(data[: 6 + 16 + 40 + 8])


def test_dib_geometry_and_unsupported():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_ico([(rgb, {"kind": "dib24"})]))
    bih = 6 + 16
    struct.pack_into("<i", data, bih + 8, 7)  # odd doubled height
    struct.pack_into("<I", data, 6 + 8, len(data) - 22)
    with pytest.raises(ValueError):
        decode_ico(bytes(data))

    data = bytearray(encode_ico([(rgb, {"kind": "dib24"})]))
    struct.pack_into("<I", data, bih + 16, 3)  # compression != 0
    with pytest.raises(NotImplementedError):
        decode_ico(bytes(data))


def test_favicon_flows_through_image_pipeline(spark):
    from bisque_spark.operators.multimodal import image_features

    palette = np.array([[10, 200, 50], [240, 10, 10]], dtype=np.uint8)
    idx = RNG.integers(0, 2, (16, 16), dtype=np.uint16)
    data = encode_ico([(idx, {"kind": "dib1", "palette": palette})])
    expect = palette[idx]
    df = spark.createDataFrame(
        [("fav-0", bytearray(data), 16, 16, "ico")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    row = image_features(df).collect()[0]
    assert row["error"] is None
    assert row["mean_r"] == pytest.approx(expect[..., 0].mean(), abs=1e-9)
    assert row["mean_b"] == pytest.approx(expect[..., 2].mean(), abs=1e-9)
