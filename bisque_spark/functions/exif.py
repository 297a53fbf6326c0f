"""EXIF metadata: APP1/TIFF parse + orientation transform (pure
python/numpy — public specs: JEITA CP-3451 (Exif 2.x), the TIFF 6.0
IFD layout it embeds, and JPEG APP1 packaging per ITU-T T.81 B.2.4.6).

Real-web JPEGs carry camera metadata in an APP1 segment ("Exif\\0\\0" +
a little- or big-endian TIFF stream of IFDs). A crawl/curation engine
needs (a) the provenance fields (camera make/model, capture time) and
(b) the ORIENTATION tag — phones store sensor-native pixels and expect
viewers to rotate, so pixel-space features (phash, thumbnails,
embeddings) computed without honoring tag 274 disagree across
otherwise-identical images.

Scope: IFD0 + the Exif sub-IFD, the string/short/long/rational field
types real cameras emit, both endians, bounds-checked against the
segment (a truncated or hostile TIFF returns partial fields, never
raises past the per-row error contract). Writer included so the synth
world and tests can plant real EXIF rows. No reference analogue
(bisque has no image layer); the decode side of the engine's
input_hint owns this.
"""

from __future__ import annotations

import struct

import numpy as np

# IFD0 tags
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
# Exif sub-IFD tags
TAG_DATETIME_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_value(data: bytes, endian: str, ftype: int, count: int, off: int):
    """One IFD entry's value (already resolved to its data offset)."""
    size = _TYPE_SIZES.get(ftype)
    if size is None or off + size * count > len(data):
        return None
    if ftype == 2:  # ASCII, NUL-terminated
        raw = data[off : off + count]
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if ftype == 3:
        vals = struct.unpack_from(f"{endian}{count}H", data, off)
    elif ftype in (4, 9):
        fmt = "I" if ftype == 4 else "i"
        vals = struct.unpack_from(f"{endian}{count}{fmt}", data, off)
    elif ftype in (5, 10):
        fmt = "II" if ftype == 5 else "ii"
        flat = struct.unpack_from(f"{endian}{2 * count}{fmt[0]}", data, off)
        vals = tuple(
            (flat[2 * i], flat[2 * i + 1]) for i in range(count)
        )
    elif ftype in (1, 7):
        vals = tuple(data[off : off + count])
    else:
        return None
    return vals[0] if count == 1 else vals


def _parse_ifd(data: bytes, endian: str, ifd_off: int) -> dict[int, object]:
    """One IFD → {tag: value}; bounds-checked, stops at damage."""
    out: dict[int, object] = {}
    if ifd_off + 2 > len(data):
        return out
    (n,) = struct.unpack_from(f"{endian}H", data, ifd_off)
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag, ftype, count = struct.unpack_from(f"{endian}HHI", data, e)
        size = _TYPE_SIZES.get(ftype)
        if size is None:
            continue
        total = size * count
        if total <= 4:
            off = e + 8  # value inlined in the entry
        else:
            (off,) = struct.unpack_from(f"{endian}I", data, e + 8)
        v = _read_value(data, endian, ftype, count, off)
        if v is not None:
            out[tag] = v
    return out


def parse_exif_app1(payload: bytes) -> dict:
    """APP1 payload (starting at "Exif\\0\\0") → flat field dict.

    Returns {} for non-Exif APP1 (e.g. XMP) or a damaged TIFF header;
    partial damage yields the fields that parse (per-row honesty — a
    crawl never dies on one hostile image)."""
    if payload[:6] != b"Exif\x00\x00":
        return {}
    tiff = payload[6:]
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return {}
    try:
        magic, ifd0_off = struct.unpack_from(f"{endian}HI", tiff, 2)
    except struct.error:
        return {}
    if magic != 42:
        return {}
    ifd0 = _parse_ifd(tiff, endian, ifd0_off)
    out: dict[str, object] = {}
    if TAG_MAKE in ifd0:
        out["make"] = ifd0[TAG_MAKE]
    if TAG_MODEL in ifd0:
        out["model"] = ifd0[TAG_MODEL]
    if TAG_DATETIME in ifd0:
        out["datetime"] = ifd0[TAG_DATETIME]
    o = ifd0.get(TAG_ORIENTATION)
    if isinstance(o, int) and 1 <= o <= 8:
        out["orientation"] = o
    sub = ifd0.get(TAG_EXIF_IFD)
    if isinstance(sub, int):
        exif = _parse_ifd(tiff, endian, sub)
        if TAG_DATETIME_ORIGINAL in exif:
            out["datetime_original"] = exif[TAG_DATETIME_ORIGINAL]
        if isinstance(exif.get(TAG_PIXEL_X), int):
            out["pixel_x"] = exif[TAG_PIXEL_X]
        if isinstance(exif.get(TAG_PIXEL_Y), int):
            out["pixel_y"] = exif[TAG_PIXEL_Y]
    return out


def extract_exif(jpeg_bytes: bytes) -> dict:
    """JPEG bytes → EXIF field dict ({} when absent/not a JPEG).
    Walks the marker stream up to SOS only (metadata lives before the
    entropy data, so this never touches the payload bytes)."""
    data = jpeg_bytes
    if data[:2] != b"\xff\xd8":
        return {}
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return {}
        # 0xFF fill bytes between markers are legal padding (T.81 B.1.1.2)
        while i + 4 <= len(data) and data[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(data):
            return {}
        marker = data[i + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        ln = int.from_bytes(data[i + 2 : i + 4], "big")
        if ln < 2:
            return {}
        if marker == 0xE1:
            payload = data[i + 4 : i + 2 + ln]
            # Only the Exif APP1 counts — an XMP APP1 (common layout:
            # XMP first) must not abort the walk (r6 ADVICE).
            if payload[:6] == b"Exif\x00\x00":
                return parse_exif_app1(payload)
        if marker == 0xDA:  # SOS: metadata section over
            return {}
        i += 2 + ln
    return {}


def build_exif_app1(
    orientation: int | None = None,
    make: str | None = None,
    model: str | None = None,
    datetime_original: str | None = None,
    big_endian: bool = False,
) -> bytes:
    """Minimal valid Exif APP1 payload (writer for synth/test rows):
    IFD0 with the passed fields + an Exif sub-IFD when
    ``datetime_original`` is set. Returns the payload (caller wraps in
    the 0xFFE1 segment, e.g. via jpeg._seg)."""
    endian = ">" if big_endian else "<"

    entries0: list[tuple[int, int, int, bytes, bytes | None]] = []

    def ascii_entry(tag: int, s: str):
        raw = s.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            entries0.append((tag, 2, len(raw), inline, None))
        else:
            entries0.append((tag, 2, len(raw), b"", raw))

    if make is not None:
        ascii_entry(TAG_MAKE, make)
    if model is not None:
        ascii_entry(TAG_MODEL, model)
    if orientation is not None:
        inline = struct.pack(f"{endian}H", orientation) + b"\x00\x00"
        entries0.append((TAG_ORIENTATION, 3, 1, inline, None))

    sub_ifd = b""
    if datetime_original is not None:
        raw = datetime_original.encode("ascii") + b"\x00"
        # the sub-IFD is appended after IFD0's data area; its single
        # entry points just past itself
        entries0.append((TAG_EXIF_IFD, 4, 1, b"\x00" * 4, None))

    # layout: header(8) + IFD0 + next-ptr + out-of-line data + sub-IFD
    n0 = len(entries0)
    ifd0_off = 8
    data_off = ifd0_off + 2 + 12 * n0 + 4
    blobs: list[bytes] = []
    fixed: list[bytes] = []
    for tag, ftype, count, inline, blob in entries0:
        if tag == TAG_EXIF_IFD and datetime_original is not None:
            continue  # patched below once data_off is final
        if blob is not None:
            fixed.append(
                struct.pack(f"{endian}HHI", tag, ftype, count)
                + struct.pack(f"{endian}I", data_off + sum(map(len, blobs)))
            )
            blobs.append(blob)
        else:
            fixed.append(struct.pack(f"{endian}HHI", tag, ftype, count) + inline)
    if datetime_original is not None:
        sub_off = data_off + sum(map(len, blobs))
        fixed.append(
            struct.pack(f"{endian}HHI", TAG_EXIF_IFD, 4, 1)
            + struct.pack(f"{endian}I", sub_off)
        )
        raw = datetime_original.encode("ascii") + b"\x00"
        dt_data_off = sub_off + 2 + 12 + 4
        if len(raw) <= 4:
            entry = struct.pack(
                f"{endian}HHI", TAG_DATETIME_ORIGINAL, 2, len(raw)
            ) + raw + b"\x00" * (4 - len(raw))
            sub_blob = b""
        else:
            entry = struct.pack(
                f"{endian}HHI", TAG_DATETIME_ORIGINAL, 2, len(raw)
            ) + struct.pack(f"{endian}I", dt_data_off)
            sub_blob = raw
        sub_ifd = (
            struct.pack(f"{endian}H", 1) + entry
            + struct.pack(f"{endian}I", 0) + sub_blob
        )
    # entries must be sorted by tag per TIFF 6.0
    order = sorted(
        range(len(fixed)),
        key=lambda i: struct.unpack_from(f"{endian}H", fixed[i], 0)[0],
    )
    fixed = [fixed[i] for i in order]
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(f"{endian}HI", 42, ifd0_off)
        + struct.pack(f"{endian}H", len(fixed))
        + b"".join(fixed)
        + struct.pack(f"{endian}I", 0)
        + b"".join(blobs)
        + sub_ifd
    )
    return b"Exif\x00\x00" + tiff


def apply_orientation(pixels: np.ndarray, orientation: int) -> np.ndarray:
    """Tag-274 transform → pixels as a viewer would display them.
    1=as-is, 2=mirror-H, 3=rot180, 4=mirror-V, 5=transpose,
    6=rot90CW, 7=transverse, 8=rot90CCW. Unknown values pass through
    (the conservative per-row contract)."""
    if orientation == 2:
        return pixels[:, ::-1]
    if orientation == 3:
        return pixels[::-1, ::-1]
    if orientation == 4:
        return pixels[::-1, :]
    if orientation == 5:
        return np.swapaxes(pixels, 0, 1)
    if orientation == 6:
        return np.swapaxes(pixels, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(pixels, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(pixels, 0, 1)[::-1, :]
    return pixels
