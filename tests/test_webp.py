"""Lossless WebP (VP8L) codec — functions/webp.py.

Round-trips cover every encoder mode (plain literals, subtract-green,
color cache, palette at each packing width, row-LZ77, RGBA); the
decoder-only features (predictor transform's 14 modes, cross-color,
meta Huffman) are graded against hand-built streams whose FORWARD
transforms are implemented here in the test, independently of the
module's inverse code paths. Prefix coding and the 2D distance map
are pinned by direct fixtures from the spec (RFC 9649 §3.6.2).
"""

from __future__ import annotations

import numpy as np
import pytest

from bisque_spark.functions.webp import (
    _BitReader,
    _BitWriter,
    _DIST_MAP,
    _encode_entropy_image,
    _plane_code_to_distance,
    _prefix_decode,
    _prefix_encode,
    decode_webp,
    encode_webp_lossless,
)

RNG = np.random.default_rng(20260818)


def _rand(h, w, ch=3):
    return RNG.integers(0, 256, (h, w, ch), dtype=np.uint8)


# ---- round-trips over every encoder mode -----------------------------------


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"cache_bits": 6},
        {"subtract_green": True, "cache_bits": 4},
        {"lz77_rows": True},
        {"lz77_rows": True, "cache_bits": 5},
        {"lz77_rows": True, "subtract_green": True, "cache_bits": 3},
    ],
)
def test_roundtrip_modes(kw):
    img = _rand(13, 17)
    assert (decode_webp(encode_webp_lossless(img, **kw)) == img).all()
    rows = np.tile(_rand(2, 33), (9, 1, 1))[:17]  # repeated rows for LZ77
    assert (decode_webp(encode_webp_lossless(rows, **kw)) == rows).all()


@pytest.mark.parametrize("ncolors,xbits", [(2, 3), (4, 2), (13, 1), (200, 0)])
def test_palette_roundtrip_every_packing(ncolors, xbits):
    lut = RNG.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = RNG.integers(0, ncolors, (11, 29))
    img = lut[idx]
    got_distinct = len(np.unique(img.reshape(-1, 3), axis=0))
    assert got_distinct <= ncolors
    data = encode_webp_lossless(img, palette=True)
    assert (decode_webp(data) == img).all()


def test_odd_width_packing_edge():
    # width not a multiple of pixels-per-byte: trailing packed pixel
    lut = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    for w in (7, 8, 9, 15):
        img = lut[RNG.integers(0, 2, (5, w))]
        assert (decode_webp(encode_webp_lossless(img, palette=True)) == img).all()


def test_rgba_composites_over_white():
    rgba = _rand(6, 5, 4)
    a = rgba[..., 3:4].astype(np.float64) / 255.0
    want = np.clip(
        np.rint(rgba[..., :3] * a + 255.0 * (1.0 - a)), 0, 255
    ).astype(np.uint8)
    assert (decode_webp(encode_webp_lossless(rgba)) == want).all()


def test_single_pixel_and_single_row():
    one = _rand(1, 1)
    assert (decode_webp(encode_webp_lossless(one)) == one).all()
    row = _rand(1, 40)
    assert (decode_webp(encode_webp_lossless(row)) == row).all()
    col = _rand(40, 1)
    assert (decode_webp(encode_webp_lossless(col)) == col).all()


# ---- spec fixtures -----------------------------------------------------------


def test_prefix_code_spec_fixtures():
    """RFC 9649 §3.6.2.2: prefix 0-3 are literals 1-4; prefix p ≥ 4
    covers [(2+(p&1))<<((p-2)>>1) + 1, ...] with (p-2)>>1 extra bits."""
    # encode→decode identity over a dense range
    for val in list(range(1, 2000)) + [4096, 100_000]:
        p, lo, nb = _prefix_encode(val)
        bw = _BitWriter()
        bw.write(lo, nb)
        br = _BitReader(bw.getvalue() + b"\x00" * 4)
        assert _prefix_decode(br, p) == val
    # pinned boundary table (derived by hand from the spec formula)
    for val, want_prefix in [(1, 0), (4, 3), (5, 4), (7, 5), (8, 5),
                             (9, 6), (13, 7), (17, 8), (25, 9), (33, 10)]:
        assert _prefix_encode(val)[0] == want_prefix, val


def test_distance_map_spec_fixtures():
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[0] == (0, 1)   # straight up ⇒ dist = xsize
    assert _DIST_MAP[1] == (1, 0)   # left neighbor ⇒ dist = 1
    assert _DIST_MAP[-1] == (8, 7)
    assert _plane_code_to_distance(100, 1) == 100
    assert _plane_code_to_distance(100, 2) == 1
    # negative dx clamps at 1 minimum
    assert _plane_code_to_distance(2, 4) >= 1
    # codes beyond the map are linear
    assert _plane_code_to_distance(50, 121) == 1
    assert _plane_code_to_distance(50, 500) == 380


# ---- decoder-only features: hand-built streams with a forward twin ----------


def _wrap_riff(payload: bytes) -> bytes:
    import struct

    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _forward_predictor(px: np.ndarray, bits: int, modes: np.ndarray):
    """Test-side FORWARD predictor transform (residuals), written from
    the spec text independently of the module's inverse."""
    h, w, _ = px.shape
    bw_blocks = (w + (1 << bits) - 1) >> bits
    out = np.zeros_like(px, dtype=np.int32)
    dec = px.astype(np.int32)  # forward sees the true pixels as context

    def avg2(a, b):
        return (a.astype(np.int64) + b.astype(np.int64)) >> 1

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255])
            elif y == 0:
                pred = dec[0, x - 1]
            elif x == 0:
                pred = dec[y - 1, 0]
            else:
                m = int(modes[(y >> bits) * bw_blocks + (x >> bits)])
                L, T, TL = dec[y, x - 1], dec[y - 1, x], dec[y - 1, x - 1]
                TR = dec[y - 1, x + 1] if x + 1 < w else dec[y, 0]
                if m == 0:
                    pred = np.array([0, 0, 0, 255])
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = avg2(avg2(L, TR), T)
                elif m == 6:
                    pred = avg2(L, TL)
                elif m == 7:
                    pred = avg2(L, T)
                elif m == 8:
                    pred = avg2(TL, T)
                elif m == 9:
                    pred = avg2(T, TR)
                elif m == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif m == 11:
                    d = int((np.abs(L - TL) - np.abs(T - TL)).sum())
                    pred = T if d <= 0 else L
                elif m == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:  # 13
                    ave = avg2(L, T)
                    diff = ave - TL
                    half = np.where(diff >= 0, diff >> 1, -((-diff) >> 1))
                    pred = np.clip(ave + half, 0, 255)
            out[y, x] = (dec[y, x] - pred) & 0xFF
    return out.astype(np.uint8)


def _bgra_to_argb_words(px_bgra_channels: np.ndarray) -> np.ndarray:
    """(h, w, 4) channel-order [B, G, R, A] → uint32 ARGB words."""
    b, g, r, a = (px_bgra_channels[..., i].astype(np.uint32) for i in range(4))
    return ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_all_modes(mode):
    """Hand-built stream: predictor transform with one fixed mode per
    block; residuals computed by the independent forward twin above.
    Decoding must reproduce the original pixels for every mode."""
    h, w, bits = 9, 13, 2
    img = _rand(h, w)
    # channel layout used by the twin: B,G,R,A (little-endian ARGB)
    px = np.stack(
        [img[..., 2], img[..., 1], img[..., 0],
         np.full((h, w), 255, np.uint8)], axis=-1
    )
    bwb = (w + (1 << bits) - 1) >> bits
    bhb = (h + (1 << bits) - 1) >> bits
    modes = np.full(bwb * bhb, mode, dtype=np.int64)
    residuals = _forward_predictor(px, bits, modes)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(bits - 2, 3)
    mode_argb = (np.uint32(0xFF) << 24) | (modes.astype(np.uint32) << 8)
    _encode_entropy_image(bw, mode_argb, bwb, bhb, cache_bits=0, lz77=False,
                          is_level0=False)
    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(
        bw, _bgra_to_argb_words(residuals), w, h, cache_bits=0, lz77=False
    )
    got = decode_webp(_wrap_riff(bw.getvalue()))
    assert (got == img).all(), f"mode {mode}"


def test_cross_color_transform():
    """Hand-built stream: cross-color transform with nonzero
    green_to_red / green_to_blue / red_to_blue deltas; the forward
    direction below is the spec's §3.5.3 subtraction."""
    h, w, bits = 8, 10, 2
    img = _rand(h, w)
    g2r, g2b, r2b = 23, -17, 5  # int8 deltas

    def ctd(t, c):
        c = c if c < 128 else c - 256  # int8 view of the channel
        return (t * c) >> 5

    fwd = img.astype(np.int32).copy()
    for y in range(h):
        for x in range(w):
            r, g, b = int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2])
            new_r = (r - ctd(g2r, g)) & 0xFF
            # red_to_blue applies to the ORIGINAL red (the inverse
            # restores red first, then uses it for blue — §3.5.3)
            new_b = (b - ctd(g2b, g) - ctd(r2b, r)) & 0xFF
            fwd[y, x] = (new_r, g, new_b)
    fwd = fwd.astype(np.uint8)
    bwb = (w + (1 << bits) - 1) >> bits
    bhb = (h + (1 << bits) - 1) >> bits
    cte = (
        (np.uint32(0xFF) << 24)
        | (np.uint32(r2b & 0xFF) << 16)
        | (np.uint32(g2b & 0xFF) << 8)
        | np.uint32(g2r & 0xFF)
    )
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR
    bw.write(bits - 2, 3)
    _encode_entropy_image(
        bw, np.full(bwb * bhb, cte, dtype=np.uint32), bwb, bhb,
        cache_bits=0, lz77=False, is_level0=False,
    )
    bw.write(0, 1)
    words = (
        (np.uint32(255) << 24)
        | (fwd[..., 0].astype(np.uint32) << 16)
        | (fwd[..., 1].astype(np.uint32) << 8)
        | fwd[..., 2].astype(np.uint32)
    ).reshape(-1)
    _encode_entropy_image(bw, words, w, h, cache_bits=0, lz77=False)
    got = decode_webp(_wrap_riff(bw.getvalue()))
    assert (got == img).all()


def test_meta_huffman_two_groups():
    """Hand-built stream with a Huffman image selecting between two
    tree groups by block column — exercises the per-block group
    switch in the main decode loop."""
    from bisque_spark.functions.webp import (
        _canonical_codes_from_lengths,
        _huffman_lengths,
        _write_code,
        _write_huffman_code,
    )

    h, w, bits = 4, 8, 2  # two 4-wide block columns
    img = _rand(h, w)
    words = (
        (np.uint32(255) << 24)
        | (img[..., 0].astype(np.uint32) << 16)
        | (img[..., 1].astype(np.uint32) << 8)
        | img[..., 2].astype(np.uint32)
    ).reshape(-1)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta huffman present
    bw.write(bits - 2, 3)
    # huffman image: 2x1 blocks with meta indices 0 and 1 (in green)
    himg = np.array([0xFF000000, 0xFF000100], dtype=np.uint32)
    _encode_entropy_image(bw, himg, 2, 1, cache_bits=0, lz77=False,
                          is_level0=False)
    # two groups, each trained on its own half's bytes
    halves = [words.reshape(h, w)[:, :4].reshape(-1),
              words.reshape(h, w)[:, 4:].reshape(-1)]
    group_codes = []
    for part in halves:
        trees = []
        for shift, size in ((8, 256 + 24), (16, 256), (0, 256), (24, 256)):
            freqs: dict[int, int] = {}
            for v in part:
                s = int((v >> shift) & 0xFF)
                freqs[s] = freqs.get(s, 0) + 1
            trees.append(_write_huffman_code(bw, _huffman_lengths(freqs), size))
        dist: dict[int, int] = {0: 1}
        trees.append(_write_huffman_code(bw, _huffman_lengths(dist), 40))
        group_codes.append(trees)
    for pos, v in enumerate(words):
        x = pos % w
        gc, rc, bc, ac, _ = group_codes[0 if x < 4 else 1]
        _write_code(bw, *gc[int((v >> 8) & 0xFF)])
        _write_code(bw, *rc[int((v >> 16) & 0xFF)])
        _write_code(bw, *bc[int(v & 0xFF)])
        _write_code(bw, *ac[int((v >> 24) & 0xFF)])
    got = decode_webp(_wrap_riff(bw.getvalue()))
    assert (got == img).all()


# ---- containment -------------------------------------------------------------


def test_hostile_streams_contained():
    good = encode_webp_lossless(_rand(9, 9))
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    with pytest.raises(ValueError):
        decode_webp(good[:20])  # truncated
    with pytest.raises(NotImplementedError):
        # lossy VP8 chunk stays an honest error
        import struct

        payload = b"\x00" * 10
        riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload
        decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    # bit flips must raise or return an image, never hang/crash
    rng = np.random.default_rng(99)
    for _ in range(60):
        bad = bytearray(good)
        for _ in range(3):
            bad[rng.integers(20, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            decode_webp(bytes(bad))
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_lossless_is_lossless_psnr_inf():
    """The input_hint PSNR gate is trivially met: lossless ⇒ identical
    pixels ⇒ PSNR = ∞ (guarded as exact equality everywhere here)."""
    img = _rand(32, 24)
    assert (
        decode_webp(encode_webp_lossless(img, subtract_green=True)) == img
    ).all()


def test_hostile_dimensions_contained_fast():
    """ADVICE r7 #2: the predictor inverse is a per-pixel Python loop,
    so hostile declared dimensions must be rejected in O(1), not walked
    for minutes — both at the crawl-facing cap and at the predictor's
    own sub-second bound."""
    import struct
    import time

    from bisque_spark.functions.webp import _inv_predictor

    # direct: predictor transform over 8000x8000 px raises immediately
    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        _inv_predictor(
            np.zeros(8000 * 8000, dtype=np.uint32), 8000, 8000, 4,
            np.zeros(1, dtype=np.uint32),
        )
    assert time.perf_counter() - t0 < 1.0

    # container-level: a VP8L header declaring 3000x3000 trips the
    # crawl dispatcher's 4M-pixel cap before any buffer is allocated
    bits = (2999) | (2999 << 14) | (0 << 28) | (0 << 29)
    hdr = bytes([0x2F]) + bits.to_bytes(5, "little")
    payload = hdr + b"\x00" * 16
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    t0 = time.perf_counter()
    with pytest.raises((ValueError, NotImplementedError, IndexError, KeyError)):
        decode_webp(data, max_pixels=1 << 22)
    assert time.perf_counter() - t0 < 1.0
