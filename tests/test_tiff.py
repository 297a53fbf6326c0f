"""Baseline TIFF 6.0 codec tests — functions/tiff.py.

Round-trips cover the layout matrix the decoder claims (endianness ×
compression × predictor × photometric × bit depth × strip size);
tiled and planar files are hand-built with an independent minimal
IFD writer so the decode path is not graded against the module's own
encoder. Expected pixels come from inline formulas (scale8 rounding,
palette lookup, alpha over white), independent of the module.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bisque_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_rle,
    unpackbits_rle,
)

RNG = np.random.default_rng(20260817)


def _scale8(v, depth):
    maxv = (1 << depth) - 1
    return ((v.astype(np.uint32) * 255 + maxv // 2) // maxv).astype(np.uint8)


def _over_white(rgb, alpha, maxv=255):
    a = alpha.astype(np.float64)[..., None] / maxv
    return np.clip(
        np.rint(rgb.astype(np.float64) * a + 255.0 * (1.0 - a)), 0, 255
    ).astype(np.uint8)


def _write_tiff(endian, entries, blobs, offset_tag=273, count_tag=279):
    """Independent minimal IFD writer (test-side twin of the layout).

    entries: [(tag, type, values)]; blobs land after the IFD and their
    offsets/byte-counts are appended as offset_tag/count_tag.
    """
    e = endian
    fmt = {3: "H", 4: "I"}

    def vb(typ, vals):
        return b"".join(struct.pack(e + fmt[typ], v) for v in vals)

    all_entries = entries + [
        (offset_tag, 4, [0] * len(blobs)),
        (count_tag, 4, [len(b) for b in blobs]),
    ]
    all_entries.sort(key=lambda t: t[0])
    n = len(all_entries)
    ext_off = 8 + 2 + 12 * n + 4
    ext_len = sum(
        len(vb(t, v)) for _, t, v in all_entries if len(vb(t, v)) > 4
    )
    pos = ext_off + ext_len
    offs = []
    for b in blobs:
        offs.append(pos)
        pos += len(b)
    out = bytearray(b"II*\x00" if e == "<" else b"MM\x00*")
    out += struct.pack(e + "I", 8)
    out += struct.pack(e + "H", n)
    ext = bytearray()
    for tag, typ, vals in all_entries:
        if tag == offset_tag:
            vals = offs
        v = vb(typ, vals)
        out += struct.pack(e + "HHI", tag, typ, len(vals))
        if len(v) <= 4:
            out += v + b"\x00" * (4 - len(v))
        else:
            out += struct.pack(e + "I", ext_off + len(ext))
            ext += v
    out += struct.pack(e + "I", 0)
    return bytes(out + ext + b"".join(blobs))


# ---- compression primitives -------------------------------------------------


def test_packbits_roundtrip_mixed_runs():
    data = (
        b"\x00" * 300 + bytes(RNG.integers(0, 256, 500, dtype=np.uint8))
        + b"\xff" * 129 + b"ab" * 64 + b"\x07"
    )
    assert unpackbits_rle(packbits_rle(data), len(data)) == data


def test_packbits_noop_128_and_underrun():
    # 128 is a spec no-op byte; a stream of only no-ops yields nothing
    with pytest.raises(ValueError):
        unpackbits_rle(b"\x80\x80", 1)


@pytest.mark.parametrize(
    "data",
    [
        bytes(RNG.integers(0, 256, 20_000, dtype=np.uint8)),  # resets
        b"\x42" * 5000,  # maximal runs
        bytes(RNG.integers(0, 4, 1023, dtype=np.uint8)),  # width boundary
        b"",
        b"\x00",
    ],
    ids=["random-20k", "run-5k", "boundary-1023", "empty", "one"],
)
def test_lzw_roundtrip(data):
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_lzw_rejects_truncation():
    enc = lzw_encode(b"abcabcabc" * 50)
    with pytest.raises(ValueError):
        lzw_decode(enc[: len(enc) // 2], 450)


# ---- encode/decode round-trips ----------------------------------------------


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("predictor", [1, 2])
def test_rgb8_roundtrip_matrix(endian, compression, predictor):
    img = RNG.integers(0, 256, (13, 11, 3), dtype=np.uint8)
    data = encode_tiff(
        img,
        endian=endian,
        compression=compression,
        predictor=predictor,
        rows_per_strip=5,
    )
    assert (decode_tiff(data) == img).all()


@pytest.mark.parametrize("endian", ["<", ">"])
def test_rgb16_predictor_lzw_exact_downscale(endian):
    img = RNG.integers(0, 256, (9, 6, 3), dtype=np.uint8)
    data = encode_tiff(
        img.astype(np.uint16) * 257,
        endian=endian,
        compression=5,
        predictor=2,
        bit_depth=16,
        rows_per_strip=4,
    )
    assert (decode_tiff(data) == img).all()


def test_gray8_and_inverted_polarity():
    g = RNG.integers(0, 256, (8, 13), dtype=np.uint8)
    normal = decode_tiff(encode_tiff(g, photometric=1))
    assert (normal == np.repeat(g[..., None], 3, axis=2)).all()
    inv = decode_tiff(encode_tiff(g, photometric=0))
    assert (inv == np.repeat((255 - g)[..., None], 3, axis=2)).all()


def test_gray16():
    g16 = RNG.integers(0, 65536, (7, 5), dtype=np.uint16)
    got = decode_tiff(encode_tiff(g16, photometric=1, bit_depth=16))
    assert (got == np.repeat(_scale8(g16, 16)[..., None], 3, axis=2)).all()


@pytest.mark.parametrize("depth", [1, 4])
def test_subbyte_gray_odd_width(depth):
    # width 13 forces per-row bit padding
    g = RNG.integers(0, 1 << depth, (6, 13), dtype=np.uint16)
    got = decode_tiff(encode_tiff(g, photometric=1, bit_depth=depth))
    assert (got == np.repeat(_scale8(g, depth)[..., None], 3, axis=2)).all()


@pytest.mark.parametrize("depth", [4, 8])
def test_palette_roundtrip(depth):
    n = 1 << depth
    pal = RNG.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = RNG.integers(0, n, (10, 9), dtype=np.uint16)
    data = encode_tiff(idx, photometric=3, bit_depth=depth, palette=pal)
    assert (decode_tiff(data) == pal[idx]).all()


def test_rgba_alpha_composited_over_white():
    rgb = RNG.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    alpha = RNG.integers(0, 256, (6, 8), dtype=np.uint8)
    rgba = np.dstack([rgb, alpha])
    got = decode_tiff(encode_tiff(rgba))
    assert (got == _over_white(rgb, alpha)).all()


def test_packbits_multistrip_big_endian_gray():
    g = np.tile(np.arange(256, dtype=np.uint8), 4).reshape(16, 64)
    data = encode_tiff(
        g, endian=">", compression=32773, photometric=1, rows_per_strip=3
    )
    assert (decode_tiff(data) == np.repeat(g[..., None], 3, axis=2)).all()


# ---- hand-built layouts the encoder does not emit ---------------------------


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5])
def test_tiled_chunky_decode(endian, compression):
    h, w, th, tw = 20, 25, 16, 16
    img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    padded = np.zeros((32, 32, 3), dtype=np.uint8)
    padded[:h, :w] = img
    tiles = []
    for r in range(2):
        for c in range(2):
            raw = padded[r * 16 : r * 16 + 16, c * 16 : c * 16 + 16].tobytes()
            tiles.append(lzw_encode(raw) if compression == 5 else raw)
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]),
        (259, 3, [compression]), (262, 3, [2]), (277, 3, [3]),
        (322, 4, [tw]), (323, 4, [th]),
    ]
    data = _write_tiff(endian, entries, tiles, offset_tag=324, count_tag=325)
    assert (decode_tiff(data) == img).all()


def test_legacy_deflate_32946_decode():
    import zlib

    img = RNG.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    entries = [
        (256, 4, [9]), (257, 4, [9]), (258, 3, [8, 8, 8]),
        (259, 3, [32946]), (262, 3, [2]), (277, 3, [3]),
    ]
    data = _write_tiff("<", entries, [zlib.compress(img.tobytes())])
    assert (decode_tiff(data) == img).all()


def test_planar_strips_decode():
    h, w, rps = 10, 7, 4
    img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blobs = [
        img[s * rps : s * rps + rps, :, p].tobytes()
        for p in range(3)
        for s in range((h + rps - 1) // rps)
    ]
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [3]), (278, 4, [rps]), (284, 3, [2]),
    ]
    assert (decode_tiff(_write_tiff("<", entries, blobs)) == img).all()


def test_planar_tiled_16bit_decode():
    h = w = 8
    img8 = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img16 = img8.astype(">u2") * 257
    blobs = [img16[:, :, p].tobytes() for p in range(3)]
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [16, 16, 16]), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [3]), (284, 3, [2]),
        (322, 4, [8]), (323, 4, [8]),
    ]
    data = _write_tiff(">", entries, blobs, offset_tag=324, count_tag=325)
    assert (decode_tiff(data) == img8).all()


# ---- containment -------------------------------------------------------------


def test_rejects_bad_magic():
    with pytest.raises(ValueError):
        decode_tiff(b"XX\x00\x2a" + b"\x00" * 64)


def test_unsupported_compression_is_not_implemented():
    entries = [
        (256, 4, [4]), (257, 4, [4]), (258, 3, [8]), (259, 3, [7]),
        (262, 3, [1]), (277, 3, [1]),
    ]
    with pytest.raises(NotImplementedError):
        decode_tiff(_write_tiff("<", entries, [b"\x00" * 16]))


def test_dimension_bomb_rejected_before_allocation():
    entries = [
        (256, 4, [1 << 20]), (257, 4, [1 << 20]), (258, 3, [8]),
        (259, 3, [1]), (262, 3, [1]), (277, 3, [1]),
    ]
    with pytest.raises(ValueError):
        decode_tiff(_write_tiff("<", entries, [b""]))


def test_truncated_strip_data_rejected():
    img = RNG.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    data = encode_tiff(img)
    with pytest.raises(ValueError):
        decode_tiff(data[: len(data) - 40])


# ---- Spark pipeline ----------------------------------------------------------


def test_tiff_flows_through_image_features(spark):
    from bisque_spark.operators.multimodal import image_features

    imgs = [
        RNG.integers(0, 256, (10, 14, 3), dtype=np.uint8) for _ in range(3)
    ]
    rows = [
        (
            f"tiff-{i}",
            bytearray(
                encode_tiff(
                    im,
                    endian=">" if i % 2 else "<",
                    compression=(1, 5, 32773)[i],
                    predictor=2 if i == 1 else 1,
                    rows_per_strip=4,
                )
            ),
            14,
            10,
            "tiff",
        )
        for i, im in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = {r["image_id"]: r for r in image_features(df).collect()}
    for i, im in enumerate(imgs):
        r = out[f"tiff-{i}"]
        assert r["error"] is None
        assert abs(r["mean_r"] - im[..., 0].mean()) < 1e-9
        assert abs(r["mean_b"] - im[..., 2].mean()) < 1e-9


# ---- r6 ADVICE regressions -------------------------------------------------


def _lzw_decode_strict(enc: bytes) -> bytes:
    """Independent SPEC decoder (TIFF 6.0 §13): applies the early
    width change after EVERY table append — including the one for the
    final data code — and requires a readable EOI at the bumped width.
    Grades the encoder's output against libtiff behavior, unlike the
    in-repo lzw_decode which stops at expected bytes."""
    CLEAR, EOI = 256, 257
    bits = 0
    acc = 0
    pos = 0

    def get(width):
        nonlocal bits, acc, pos
        while bits < width:
            if pos >= len(enc):
                raise ValueError("truncated before EOI")
            acc = (acc << 8) | enc[pos]
            pos += 1
            bits += 8
        bits -= width
        return (acc >> bits) & ((1 << width) - 1)

    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev = None
    while True:
        code = get(width)
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        if prev is not None and len(table) == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def test_lzw_final_code_early_change_boundary():
    """254 distinct bytes land next_code exactly on 511 at the final
    data code: a spec decoder bumps to 10 bits before reading EOI, so
    the encoder must too (r6 ADVICE tiff.py:227)."""
    data = bytes(range(254))
    assert _lzw_decode_strict(lzw_encode(data)) == data
    # neighbors of the boundary + a repeat-heavy stream, same grader
    for probe in (bytes(range(253)), bytes(range(255)), b"abcabcabc" * 200):
        assert _lzw_decode_strict(lzw_encode(probe)) == probe
    rnd = RNG.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    assert _lzw_decode_strict(lzw_encode(rnd)) == rnd


def test_associated_alpha_not_double_multiplied():
    """ExtraSamples=1 samples arrive premultiplied: compositing over
    white is rgb + 255*(1-a), NOT rgb*a + 255*(1-a) (r6 ADVICE
    tiff.py:411)."""
    rgb = RNG.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    alpha = RNG.integers(1, 256, (6, 8), dtype=np.uint8)
    a = alpha.astype(np.float64)[..., None] / 255.0
    premul = np.rint(rgb * a).astype(np.uint8)
    tif = encode_tiff(np.dstack([premul, alpha]), extra_samples=1)
    got = decode_tiff(tif)
    want = np.clip(np.rint(premul + 255.0 * (1.0 - a)), 0, 255).astype(
        np.uint8
    )
    assert (got == want).all()
    # fully-opaque associated == unassociated == plain RGB
    opaque = np.dstack([rgb, np.full((6, 8), 255, np.uint8)])
    assert (decode_tiff(encode_tiff(opaque, extra_samples=1)) == rgb).all()
    assert (decode_tiff(encode_tiff(opaque, extra_samples=2)) == rgb).all()
