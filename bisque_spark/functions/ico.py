"""ICO (favicon) container codec — pure numpy/stdlib.

Favicons are the one image class a crawler fetches for EVERY host
(/favicon.ico), so the engine decodes them natively. The ICO format
(Windows ICONDIR layout, de-facto spec) is a directory of images,
each either

- a PNG stream (Vista+ convention for 256x256 entries — delegated to
  the full codec in functions/png.py), or
- an ICO-style DIB: a BITMAPINFOHEADER whose biHeight is DOUBLED
  (XOR color plane + 1-bit AND transparency mask, both bottom-up,
  rows padded to 32 bits) at 1/4/8 bpp (BGRA palette), 24 bpp (BGR)
  or 32 bpp (BGRA). The classic 32-bpp quirk is honored: if every
  alpha byte is zero the AND mask governs transparency instead
  (pre-XP encoders wrote no alpha channel).

``decode_ico`` returns the LARGEST entry (ties → highest bit depth)
as H×W×3 uint8 RGB with transparency composited over white — the
same output contract as every other decoder in the image layer.
``ico_entries`` surfaces the directory metadata without decoding any
pixel data (header-only cost, the favicon-inventory path).

Reference parity note: the reference engine (lmmx/bisque) has no
image layer; this serves the crawl input_hint, not a reference row.
"""

from __future__ import annotations

import struct

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def ico_entries(data: bytes) -> list[dict]:
    """ICONDIR metadata: [{w, h, bpp, size, offset, is_png}] —
    header/directory parse only, no pixel decode."""
    if len(data) < 6:
        raise ValueError("truncated ICONDIR")
    reserved, typ, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO/CUR file")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("truncated ICONDIRENTRY")
        w, h, _ncol, _res, _planes, bpp, size, img_off = struct.unpack(
            "<BBBBHHII", data[off : off + 16]
        )
        if img_off + size > len(data):
            raise ValueError("entry image data out of bounds")
        is_png = data[img_off : img_off + 8] == _PNG_SIG
        out.append(
            {
                # 0 encodes 256 in the 1-byte directory fields
                "w": w or 256,
                "h": h or 256,
                "bpp": bpp,
                "size": size,
                "offset": img_off,
                "is_png": is_png,
            }
        )
    return out


def _rows(buf: bytes, off: int, h: int, stride: int, what: str) -> np.ndarray:
    need = off + h * stride
    if need > len(buf):
        raise ValueError(f"truncated {what} plane")
    return (
        np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
        .reshape(h, stride)[::-1]  # bottom-up → top-down
    )


def _decode_dib(blob: bytes) -> np.ndarray:
    """ICO-style DIB (doubled-height XOR+AND) → H×W×3 RGB over white."""
    if len(blob) < 40:
        raise ValueError("truncated BITMAPINFOHEADER")
    (hdr_size, w, h2, _planes, bpp, comp) = struct.unpack(
        "<IiiHHI", blob[:20]
    )
    if hdr_size != 40 or comp != 0:
        raise NotImplementedError(
            f"ICO DIB header={hdr_size} compression={comp}"
        )
    if w <= 0 or h2 <= 0 or h2 % 2:
        raise ValueError(f"bad ICO DIB geometry {w}x{h2}")
    h = h2 // 2
    pos = hdr_size
    palette = None
    if bpp in (1, 4, 8):
        n_pal = 1 << bpp
        if pos + 4 * n_pal > len(blob):
            raise ValueError("truncated DIB palette")
        palette = (
            np.frombuffer(blob, np.uint8, count=4 * n_pal, offset=pos)
            .reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRA quads → RGB
            .copy()
        )
        pos += 4 * n_pal
    elif bpp not in (24, 32):
        raise NotImplementedError(f"ICO DIB bpp={bpp}")

    xor_stride = (w * bpp + 31) // 32 * 4
    xor = _rows(blob, pos, h, xor_stride, "XOR")
    pos += h * xor_stride
    and_stride = (w + 31) // 32 * 4
    mask = _rows(blob, pos, h, and_stride, "AND")
    opaque = (
        np.unpackbits(mask, axis=1)[:, :w] == 0
    )  # AND bit 1 = transparent

    if palette is not None:
        bits = np.unpackbits(xor, axis=1)
        per = bits.reshape(h, -1, bpp)
        idx = np.zeros(per.shape[:2], dtype=np.uint16)
        for b in range(bpp):
            idx = (idx << 1) | per[:, :, b]
        idx = idx[:, :w]
        rgb = palette[idx].astype(np.uint8)
        alpha = np.where(opaque, 255, 0).astype(np.uint8)
    elif bpp == 24:
        rgb = xor[:, : w * 3].reshape(h, w, 3)[..., ::-1]
        alpha = np.where(opaque, 255, 0).astype(np.uint8)
    else:  # 32: BGRA
        px = xor[:, : w * 4].reshape(h, w, 4)
        rgb = px[..., 2::-1]
        a = px[..., 3]
        if int(a.max(initial=0)) == 0:
            # legacy quirk: all-zero alpha ⇒ the AND mask governs
            alpha = np.where(opaque, 255, 0).astype(np.uint8)
        else:
            alpha = a
    af = alpha.astype(np.float64)[..., None] / 255.0
    out = np.rint(rgb.astype(np.float64) * af + 255.0 * (1.0 - af))
    return np.clip(out, 0, 255).astype(np.uint8)


def decode_ico(data: bytes) -> np.ndarray:
    """ICO bytes → H×W×3 uint8 RGB of the best (largest, then
    deepest) directory entry, transparency over white."""
    entries = ico_entries(data)
    best = max(entries, key=lambda e: (e["w"] * e["h"], e["bpp"]))
    blob = data[best["offset"] : best["offset"] + best["size"]]
    if best["is_png"]:
        from bisque_spark.functions.png import decode_png

        return decode_png(blob)
    return _decode_dib(blob)


# ---- encoder (tests + favicon re-emission) --------------------------------


def encode_ico(
    frames: list[tuple[np.ndarray, dict]],
) -> bytes:
    """[(pixels, opts)] → ICO bytes. Per-frame opts:

    - ``kind``: 'png' | 'dib32' | 'dib24' | 'dib8' | 'dib4' | 'dib1'
    - ``alpha``: H×W uint8 (dib32: channel; others: >0 ⇒ opaque bit)
    - ``palette``: (n,3) for dibN<=8 (pixels are then H×W indices)

    Frames larger than 255 use the 0-means-256 directory encoding
    (only 256 is legal beyond the byte range).
    """
    dir_entries = bytearray()
    blobs: list[bytes] = []
    for pixels, opts in frames:
        kind = opts.get("kind", "dib32")
        alpha = opts.get("alpha")
        h, w = pixels.shape[:2]
        if w > 256 or h > 256:
            raise ValueError("ICO entries cap at 256x256")
        if kind == "png":
            from bisque_spark.functions.png import encode_png

            blob = encode_png(np.asarray(pixels, dtype=np.uint16))
            bpp = 32
        else:
            blob = _encode_dib(np.asarray(pixels), kind, alpha, opts)
            bpp = int(kind[3:]) if kind != "dib32" else 32
        blobs.append(blob)
        dir_entries += struct.pack(
            "<BBBBHHII",
            w & 0xFF if w < 256 else 0,
            h & 0xFF if h < 256 else 0,
            0,
            0,
            1,
            bpp,
            len(blob),
            0,  # offset patched below
        )
    off = 6 + len(dir_entries)
    for i, blob in enumerate(blobs):
        struct.pack_into("<I", dir_entries, 16 * i + 12, off)
        off += len(blob)
    out = bytearray(struct.pack("<HHH", 0, 1, len(frames))) + dir_entries
    for blob in blobs:
        out += blob
    return bytes(out)


def _pack_rows(rows: np.ndarray, stride: int) -> bytes:
    h, nbytes = rows.shape
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, :nbytes] = rows
    return padded[::-1].tobytes()  # top-down → bottom-up


def _encode_dib(pixels, kind, alpha, opts) -> bytes:
    h, w = pixels.shape[:2]
    bpp = 32 if kind == "dib32" else int(kind[3:])
    if alpha is None:
        alpha = np.full((h, w), 255, dtype=np.uint8)
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0, 0, 0, 0, 0, 0
    )
    body = bytearray(hdr)
    if bpp in (1, 4, 8):
        palette = np.asarray(opts["palette"], dtype=np.uint8).reshape(-1, 3)
        quads = np.zeros((1 << bpp, 4), dtype=np.uint8)
        quads[: len(palette), :3] = palette[:, ::-1]  # RGB → BGR
        body += quads.tobytes()
        idx = pixels.astype(np.uint16)
        bits = np.zeros((h, w, bpp), dtype=np.uint8)
        for b in range(bpp):
            bits[:, :, bpp - 1 - b] = (idx >> b) & 1
        flat = bits.reshape(h, -1)
        pad = (-flat.shape[1]) % 8
        if pad:
            flat = np.pad(flat, ((0, 0), (0, pad)))
        rows = np.packbits(flat, axis=1)
    elif bpp == 24:
        rows = pixels[..., ::-1].reshape(h, w * 3)
    else:
        px = np.zeros((h, w, 4), dtype=np.uint8)
        px[..., :3] = pixels[..., ::-1]
        px[..., 3] = alpha
        rows = px.reshape(h, w * 4)
    body += _pack_rows(rows, (w * bpp + 31) // 32 * 4)
    # AND mask: bit 1 = transparent
    trans = (alpha == 0).astype(np.uint8)
    pad = (-w) % 8
    if pad:
        trans = np.pad(trans, ((0, 0), (0, pad)))
    mask_rows = np.packbits(trans, axis=1)
    body += _pack_rows(mask_rows, (w + 31) // 32 * 4)
    return bytes(body)
