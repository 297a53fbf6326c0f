"""Lossless WebP (VP8L) codec — pure numpy/stdlib, no external libs.

Decoder covers the full VP8L feature set a real-web lossless .webp can
use: LSB-first bitstream, simple + code-length-coded Huffman trees
(incl. the 16/17/18 repeat codes and the max_symbol short form), meta
Huffman (spatially varying tree groups), color cache, LZ77 backward
references with the 120-entry 2D distance mapping, and all four
transforms (predictor with its 14 modes, cross-color, subtract-green,
color indexing incl. sub-byte pixel packing). Output follows the repo
image contract: H×W×3 uint8 RGB, alpha composited over white.

Encoder (for synth/test rows) emits conforming streams: canonical
Huffman literals, optional subtract-green, optional color-indexing
palette (with packing), optional row-level LZ77 (distance = width —
exercises the prefix/ distance machinery), optional color cache.
Lossless ⇒ decode(encode(x)) == x bit-for-bit; the PSNR gate is ∞.

Format facts are from the public "WebP Lossless Bitstream
Specification" (RFC 9649 §3; Google, 2012-2023). Lossy VP8 stays in
the honest error column (boolean arithmetic coder — out of scope).
The reference engine (lmmx/bisque) has no image layer; this module is
engine-side surface for the crawl's multimodal sink (SURVEY §2 image
operators).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- bit I/O (LSB-first within bytes, little-endian byte order) ------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("truncated VP8L stream")
        byte0 = self.pos >> 3
        # up to 15-bit codes + 7-bit skew ⇒ 5 bytes always suffice
        chunk = int.from_bytes(self.data[byte0 : byte0 + 5], "little")
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return v

    def peek(self, n: int) -> int:
        byte0 = self.pos >> 3
        chunk = int.from_bytes(self.data[byte0 : byte0 + 5], "little")
        return (chunk >> (self.pos & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise ValueError("truncated VP8L stream")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nacc
        self.nacc += n
        while self.nacc >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def getvalue(self) -> bytes:
        out = bytes(self.out)
        if self.nacc:
            out += bytes([self.acc & 0xFF])
        return out


# ---- canonical Huffman ------------------------------------------------------

# code-length-code symbol transmission order (spec §3.7.2 / RFC 9649)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _HuffTree:
    """Flat single-level decode table over max code length bits.

    VP8L codes are canonical (shorter codes first, then symbol order)
    and read bit-by-bit in stream order, the first-read bit being the
    code's MSB — same layout as DEFLATE, so the table is indexed by
    the bit-reversed code padded with every possible suffix."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty Huffman code")
        if len(nz) == 1:
            # single-symbol tree: zero bits per symbol
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        max_len = max(l for l, _ in nz)
        if max_len > 15:
            raise ValueError("code length > 15")
        # canonical code assignment
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        # completeness (Kraft) — an over/under-subscribed code is a
        # hostile stream, never a crash
        kraft = sum(1 << (max_len - l) for l, _ in nz)
        if kraft != (1 << max_len):
            raise ValueError("invalid (incomplete) Huffman code")
        table = np.zeros(1 << max_len, dtype=np.int32)
        tlen = np.zeros(1 << max_len, dtype=np.int8)
        # canonical order: shorter codes first, ties by symbol index
        for l, sym in sorted(nz, key=lambda t: (t[0], t[1])):
            c = next_code[l]
            next_code[l] += 1
            # bit-reverse the l-bit code (first-read bit = code MSB)
            rev = int(f"{c:0{l}b}"[::-1], 2)
            step = 1 << l
            table[rev::step] = sym
            tlen[rev::step] = l
        self.table = (table, tlen)
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        v = br.peek(self.max_len)
        sym = int(self.table[0][v])
        br.skip(int(self.table[1][v]))
        return sym


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _HuffTree:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        s0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            s1 = br.read(8)
            if s0 >= alphabet_size or s1 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            if s0 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[s0] = 1  # single-symbol: _HuffTree reads 0 bits
        return _HuffTree(lengths)
    # code-length-coded
    num_codes = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _HuffTree(clc_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):  # limited max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("repeat overflows alphabet")
                lengths[sym] = prev_len
                sym += 1
        elif code_len == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("repeat overflows alphabet")
    return _HuffTree(lengths)


# ---- LZ77 prefix + distance mapping ----------------------------------------


def _prefix_decode(br: _BitReader, prefix: int) -> int:
    """Length/distance prefix coding (spec §3.6.2.2): 1-based value."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (1-based) → (prefix_symbol, extra_bits_value, extra_bits)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    extra = v.bit_length() - 2
    if v < (3 << extra):
        prefix, base = 2 * extra + 2, 2 << extra
    else:
        prefix, base = 2 * extra + 3, 3 << extra
    return prefix, v - base, extra


# 120-entry (dx, dy) neighborhood for short distances (spec §3.6.2.3)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ---- entropy-coded image decode ---------------------------------------------

_HASH_MUL = 0x1E35A7BD


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
):
    """→ (argb uint32 array of len xsize*ysize, transforms, final_xsize).

    transforms is the list of (type, data...) read (level 0 only), in
    READ order; xsize may shrink when a color-indexing transform packs
    pixels."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                bits = br.read(3) + 2
                bw = _subsample_size(xsize, bits)
                bh = _subsample_size(ysize, bits)
                data, _, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append(("predictor", bits, data))
            elif ttype == 1:  # COLOR (cross-color)
                bits = br.read(3) + 2
                bw = _subsample_size(xsize, bits)
                bh = _subsample_size(ysize, bits)
                data, _, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append(("color", bits, data))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            else:  # 3: COLOR_INDEXING
                palette_size = br.read(8) + 1
                pal, _, _ = _decode_image_stream(br, palette_size, 1, False)
                # palette deltas accumulate per channel, mod 256
                acc = np.cumsum(
                    pal.view(np.uint8).reshape(-1, 4).astype(np.uint32),
                    axis=0,
                ).astype(np.uint8)
                palette = acc.copy().view(np.uint32).reshape(-1)
                if palette_size <= 2:
                    xbits = 3
                elif palette_size <= 4:
                    xbits = 2
                elif palette_size <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append(
                    ("color_indexing", xbits, palette, xsize)
                )
                xsize = _subsample_size(xsize, xbits)
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # Huffman groups (meta Huffman only at level 0)
    huff_image = None
    huff_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):
        huff_bits = br.read(3) + 2
        hw = _subsample_size(xsize, huff_bits)
        hh = _subsample_size(ysize, huff_bits)
        huff_image, _, _ = _decode_image_stream(br, hw, hh, False)
        meta = ((huff_image >> 8) & 0xFFFF).astype(np.int64)
        huff_image = meta
        num_groups = int(meta.max()) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    alphabets = (green_size, 256, 256, 256, 40)
    groups = []
    for _ in range(num_groups):
        groups.append(tuple(_read_huffman_code(br, a) for a in alphabets))
    # main pixel loop
    n = xsize * ysize
    argb = np.zeros(n, dtype=np.uint32)
    hw = _subsample_size(xsize, huff_bits) if huff_image is not None else 0
    pos = 0
    x = 0
    g_tree, r_tree, b_tree, a_tree, d_tree = groups[0]
    single_group = huff_image is None
    y_block_row = 0
    while pos < n:
        if not single_group:
            gi = int(
                huff_image[y_block_row * hw + (x >> huff_bits)]
            )
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[gi]
        s = g_tree.read(br)
        if s < 256:
            red = r_tree.read(br)
            blue = b_tree.read(br)
            alpha = a_tree.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            argb[pos] = px
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
            x += 1
            if x >= xsize:
                x = 0
                y_block_row = (pos // xsize) >> huff_bits if not single_group else 0
        elif s < 280:
            length = _prefix_decode(br, s - 256)
            dist_prefix = d_tree.read(br)
            dist_code = _prefix_decode(br, dist_prefix)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            if cache is None:
                src = pos - dist
                if dist >= length:
                    argb[pos : pos + length] = argb[src : src + length]
                else:
                    for i in range(length):
                        argb[pos + i] = argb[src + i]
            else:
                src = pos - dist
                for i in range(length):
                    px = int(argb[src + i])
                    argb[pos + i] = px
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += length
            x += length
            while x >= xsize:
                x -= xsize
            if not single_group:
                y_block_row = (pos // xsize) >> huff_bits
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            px = cache[s - 280]
            argb[pos] = px
            pos += 1
            x += 1
            if x >= xsize:
                x = 0
                if not single_group:
                    y_block_row = (pos // xsize) >> huff_bits
        if not single_group and x == 0 and pos < n:
            y_block_row = (pos // xsize) >> huff_bits
    return argb, transforms, xsize


# ---- inverse transforms ------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1


# Hard bound on predictor-transform inversion: the inverse is an
# inherently row-sequential per-pixel Python loop (~10 µs/px), so a
# few-hundred-byte hostile stream declaring e.g. 8000×8000 with a
# predictor transform would spin an executor for tens of minutes
# (ADVICE r7 #2 — the parse_avi DoS class). 65536 px (256×256) keeps
# the worst hostile row sub-second while covering every crawl/synth
# image (≤ 64×64) by 16×; larger predictor-transformed images raise
# and route to the per-row error column like every other unsupported
# codec shape.
_MAX_PREDICTOR_PIXELS = 65536


def _inv_predictor(
    argb: np.ndarray, w: int, h: int, bits: int, data: np.ndarray
) -> np.ndarray:
    """Residuals + per-block predictor mode → pixels. Row-sequential:
    each pixel needs its decoded neighbors (L, T, TL, TR in the linear
    buffer — TR at the right edge wraps to the next row's first pixel,
    the libwebp linear-buffer semantics)."""
    if w * h > _MAX_PREDICTOR_PIXELS:
        raise ValueError(
            f"predictor transform over {w}x{h} px exceeds the "
            f"{_MAX_PREDICTOR_PIXELS}-px containment bound"
        )
    bw = _subsample_size(w, bits)
    modes = ((data >> 8) & 0xFF).astype(np.int64)
    px = argb.view(np.uint8).reshape(h, w, 4).astype(np.int32)  # B,G,R,A LE
    out = np.zeros_like(px)

    def clip255(v):
        return np.clip(v, 0, 255)

    for y in range(h):
        mode_row = modes[(y >> bits) * bw : (y >> bits) * bw + bw]
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255], dtype=np.int32)  # opaque black
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                m = int(mode_row[x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if m == 0:
                    pred = np.array([0, 0, 0, 255], dtype=np.int32)
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = _avg2(_avg2(L, TR), T).astype(np.int32)
                elif m == 6:
                    pred = _avg2(L, TL).astype(np.int32)
                elif m == 7:
                    pred = _avg2(L, T).astype(np.int32)
                elif m == 8:
                    pred = _avg2(TL, T).astype(np.int32)
                elif m == 9:
                    pred = _avg2(T, TR).astype(np.int32)
                elif m == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR)).astype(np.int32)
                elif m == 11:
                    # Select(T, L, TL): per-channel |L-TL| - |T-TL| summed
                    d = int(
                        (np.abs(L - TL) - np.abs(T - TL)).sum()
                    )
                    pred = T if d <= 0 else L
                elif m == 12:
                    pred = clip255(L + T - TL)
                elif m == 13:
                    ave = _avg2(L, T).astype(np.int32)
                    # C-truncating /2 on (ave - TL)
                    diff = ave - TL
                    half = np.where(diff >= 0, diff >> 1, -((-diff) >> 1))
                    pred = clip255(ave + half)
                else:
                    raise ValueError(f"predictor mode {m}")
            out[y, x] = (px[y, x] + pred) & 0xFF
    return (
        out.astype(np.uint8).reshape(h * w, 4).view(np.uint32).reshape(-1)
    )


def _inv_color(
    argb: np.ndarray, w: int, h: int, bits: int, data: np.ndarray
) -> np.ndarray:
    bw = _subsample_size(w, bits)
    img = argb.reshape(h, w)
    cte = data.reshape(_subsample_size(h, bits), bw)
    ys = (np.arange(h) >> bits)[:, None]
    xs = (np.arange(w) >> bits)[None, :]
    blk = cte[ys, xs]
    g2r = ((blk >> 0) & 0xFF).astype(np.int32)
    g2b = ((blk >> 8) & 0xFF).astype(np.int32)
    r2b = ((blk >> 16) & 0xFF).astype(np.int32)
    # int8 reinterpretation
    g2r = np.where(g2r >= 128, g2r - 256, g2r)
    g2b = np.where(g2b >= 128, g2b - 256, g2b)
    r2b = np.where(r2b >= 128, r2b - 256, r2b)
    a = (img >> 24) & 0xFF
    r = ((img >> 16) & 0xFF).astype(np.int32)
    g = ((img >> 8) & 0xFF).astype(np.int32)
    b = (img & 0xFF).astype(np.int32)
    gs = np.where(g >= 128, g - 256, g)
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = np.where(r >= 128, r - 256, r)
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    out = (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )
    return out.reshape(-1)


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(
    argb: np.ndarray, h: int, xbits: int, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    packed_w = _subsample_size(orig_w, xbits)
    img = argb.reshape(h, packed_w)
    if xbits == 0:
        idx = (img >> 8) & 0xFF
    else:
        bpp = 8 >> xbits
        xs = np.arange(orig_w)
        packed = img[:, xs >> xbits]
        shift = ((xs & ((1 << xbits) - 1)) * bpp)[None, :]
        idx = ((packed >> 8) >> shift) & ((1 << bpp) - 1)
    idx = idx.astype(np.int64)
    safe = np.where(idx < len(palette), idx, 0)
    out = np.where(idx < len(palette), palette[safe], np.uint32(0))
    return out.reshape(-1)


# ---- public decode -----------------------------------------------------------


def decode_vp8l(payload: bytes, *, max_pixels: int = 64_000_000) -> np.ndarray:
    """VP8L chunk payload → H×W×3 uint8 RGB (alpha over white)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > max_pixels:
        raise ValueError("image too large")
    argb, transforms, xsize = _decode_image_stream(br, w, h, True)
    # inverse transforms, reverse read order; xsize tracks packing
    for t in reversed(transforms):
        if t[0] == "color_indexing":
            _, xbits, palette, orig_w = t
            argb = _inv_color_indexing(argb, h, xbits, palette, orig_w)
            xsize = orig_w
        elif t[0] == "subtract_green":
            argb = _inv_subtract_green(argb)
        elif t[0] == "color":
            argb = _inv_color(argb, xsize, h, t[1], t[2])
        else:  # predictor
            argb = _inv_predictor(argb, xsize, h, t[1], t[2])
    a = ((argb >> 24) & 0xFF).astype(np.float64) / 255.0
    r = ((argb >> 16) & 0xFF).astype(np.float64)
    g = ((argb >> 8) & 0xFF).astype(np.float64)
    b = (argb & 0xFF).astype(np.float64)
    rgb = np.stack([r, g, b], axis=-1)
    comp = np.rint(rgb * a[..., None] + 255.0 * (1.0 - a[..., None]))
    return np.clip(comp, 0, 255).astype(np.uint8).reshape(h, w, 3)


def decode_webp(data: bytes, *, max_pixels: int = 64_000_000) -> np.ndarray:
    """RIFF WebP container → H×W×3 RGB. Lossless (VP8L) only; lossy
    VP8 raises NotImplementedError (honest error-column contract)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body, max_pixels=max_pixels)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 (boolean arithmetic coder) not supported"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk")


# ---- encoder (synth/test rows) ------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Frequencies → canonical code lengths (package-merge-free greedy
    merge; depths verified ≤ max_len — our inputs are byte histograms,
    far from the pathological skew that needs length limiting)."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    i = len(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    if max(depth.values()) > max_len:
        raise ValueError("Huffman depth limit exceeded")
    return depth


def _canonical_codes_from_lengths(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for l in lengths.values():
        bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def _write_code(bw: _BitWriter, code: int, length: int) -> None:
    """Huffman code bits go out MSB-first (the decoder's tree walk
    reads the code's MSB first)."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_huffman_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit a tree (simple or code-length-coded); → symbol→(code,len)."""
    nz = sorted(lengths)
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if len(nz) == 1:
            s = nz[0]
            if s == 0:
                bw.write(0, 1)  # 1-bit form
                bw.write(0, 1)
            elif s == 1:
                bw.write(0, 1)
                bw.write(1, 1)
            else:
                bw.write(1, 1)
                bw.write(s, 8)
            return {s: (0, 0)}
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(nz[0], 8)
        bw.write(nz[1], 8)
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    bw.write(0, 1)  # full (code-length-coded) path
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    last_nz = max(s for s, l in enumerate(seq) if l)
    seq = seq[: last_nz + 1]
    clc_freq: dict[int, int] = {}
    for v in seq:
        clc_freq[v] = clc_freq.get(v, 0) + 1
    clc_len = _huffman_lengths(clc_freq, max_len=7)
    if len(clc_len) == 1:
        # complete the 1-symbol code with a dummy sibling
        only = next(iter(clc_len))
        dummy = 0 if only != 0 else 1
        clc_len = {only: 1, dummy: 1}
    clc_codes = _canonical_codes_from_lengths(clc_len)
    bw.write(15, 4)  # num_code_lengths = 19: cover every position
    for s in _CLC_ORDER:
        bw.write(clc_len.get(s, 0), 3)
    # limited max_symbol form: stop after the last nonzero length
    n_to_write = len(seq)
    if n_to_write == alphabet_size:
        bw.write(0, 1)
    else:
        bw.write(1, 1)
        # max_symbol = 2 + ReadBits(length_nbits) must equal n_to_write
        need = max(n_to_write - 2, 0)
        nbits = 8 if need >= 2 ** 6 else max(2, (need.bit_length() + 1) & ~1)
        while (nbits - 2) % 2 or nbits < 2 or (need >> nbits):
            nbits += 1
        # length_nbits = 2 + 2*ReadBits(3) ∈ {2,4,...,16}
        bw.write((nbits - 2) // 2, 3)
        bw.write(need, nbits)
    for v in seq:
        c, l = clc_codes[v]
        _write_code(bw, c, l)
    return _canonical_codes_from_lengths(lengths)


def encode_webp_lossless(
    pixels: np.ndarray,
    *,
    subtract_green: bool = False,
    palette: bool = False,
    lz77_rows: bool = False,
    cache_bits: int = 0,
) -> bytes:
    """H×W×3 (or H×W×4 RGBA) uint8 → conforming lossless WebP bytes.

    Options exercise distinct decoder machinery: subtract-green (the
    near-universal real-web transform), color indexing with sub-byte
    packing (palette=True, ≤256 distinct colors required), row-level
    LZ77 (repeated rows become length/distance references through the
    full prefix + 2D distance mapping), and the color cache."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    has_alpha = arr.ndim == 3 and arr.shape[2] == 4
    r = arr[..., 0].astype(np.uint32)
    g = arr[..., 1].astype(np.uint32)
    b = arr[..., 2].astype(np.uint32)
    a = arr[..., 3].astype(np.uint32) if has_alpha else np.full((h, w), 255, np.uint32)
    argb = (a << 24) | (r << 16) | (g << 8) | b

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)

    xsize = w
    if palette:
        colors, inverse = np.unique(argb.reshape(-1), return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette encode needs <= 256 distinct colors")
        n = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n - 1, 8)
        # palette image: delta-coded per channel mod 256
        ch = colors.view(np.uint8).reshape(-1, 4).astype(np.int32)
        deltas = ch.copy()
        deltas[1:] -= ch[:-1]
        deltas &= 0xFF
        pal_argb = deltas.astype(np.uint8).reshape(-1, 4).view(np.uint32).reshape(-1)
        _encode_entropy_image(
            bw, pal_argb, n, 1, cache_bits=0, lz77=False, is_level0=False
        )
        xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        idx = inverse.reshape(h, w).astype(np.uint32)
        if xbits:
            packed_w = _subsample_size(w, xbits)
            bpp = 8 >> xbits
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for sub in range(1 << xbits):
                xs = np.arange(sub, w, 1 << xbits)
                packed[:, : len(xs)] |= idx[:, xs] << (sub * bpp)
            green = packed
            xsize = packed_w
        else:
            green = idx
        argb = (np.uint32(0xFF) << 24) | (green << 8)
    elif subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        gg = (argb >> 8) & 0xFF
        rr = (((argb >> 16) & 0xFF) - gg) & 0xFF
        bb = ((argb & 0xFF) - gg) & 0xFF
        argb = (argb & 0xFF00FF00) | (rr << 16) | bb
    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(
        bw, argb.reshape(-1), xsize, h, cache_bits=cache_bits, lz77=lz77_rows
    )
    payload = bw.getvalue()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_entropy_image(
    bw: _BitWriter,
    argb: np.ndarray,
    xsize: int,
    ysize: int,
    *,
    cache_bits: int,
    lz77: bool,
    is_level0: bool = True,
) -> None:
    """Tokenize (literals / row-copies / cache hits) then emit one
    Huffman group."""
    n = xsize * ysize
    cache = [0] * (1 << cache_bits) if cache_bits else None
    tokens = []  # ("lit", px) | ("copy", length, dist) | ("cache", idx)
    pos = 0
    while pos < n:
        if (
            lz77
            and pos >= xsize
            and pos % xsize == 0
            and pos + xsize <= n
            and np.array_equal(argb[pos : pos + xsize], argb[pos - xsize : pos])
        ):
            tokens.append(("copy", xsize, xsize))
            if cache is not None:
                for i in range(pos, pos + xsize):
                    px = int(argb[i])
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += xsize
            continue
        px = int(argb[pos])
        if cache is not None:
            ci = ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[ci] == px and pos > 0:
                tokens.append(("cache", ci))
                pos += 1
                continue
            cache[ci] = px
        tokens.append(("lit", px))
        pos += 1

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if is_level0:
        bw.write(0, 1)  # no meta Huffman (the bit only exists at level 0)

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[(px >> 24) & 0xFF] = af.get((px >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            lp, _, _ = _prefix_encode(t[1])
            gf[256 + lp] = gf.get(256 + lp, 0) + 1
            # distance through the 2D map: dist==xsize is plane code 1
            # ((0,1) is the first map entry)
            dp, _, _ = _prefix_encode(1)
            df[dp] = df.get(dp, 0) + 1
        else:
            gf[280 + t[1]] = gf.get(280 + t[1], 0) + 1
    for f in (gf, rf, bf, af, df):
        if not f:
            f[0] = 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    gc = _write_huffman_code(bw, _huffman_lengths(gf), green_size)
    rc = _write_huffman_code(bw, _huffman_lengths(rf), 256)
    bc = _write_huffman_code(bw, _huffman_lengths(bf), 256)
    ac = _write_huffman_code(bw, _huffman_lengths(af), 256)
    dc = _write_huffman_code(bw, _huffman_lengths(df), 40)
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            _write_code(bw, *gc[(px >> 8) & 0xFF])
            _write_code(bw, *rc[(px >> 16) & 0xFF])
            _write_code(bw, *bc[px & 0xFF])
            _write_code(bw, *ac[(px >> 24) & 0xFF])
        elif t[0] == "copy":
            lp, lextra, lbits = _prefix_encode(t[1])
            _write_code(bw, *gc[256 + lp])
            bw.write(lextra, lbits)
            dp, dextra, dbits = _prefix_encode(1)  # plane code 1 = (0, 1)
            _write_code(bw, *dc[dp])
            bw.write(dextra, dbits)
        else:
            _write_code(bw, *gc[280 + t[1]])
