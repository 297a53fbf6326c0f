"""MP4 / ISO base media file format (ISO/IEC 14496-12) — pure stdlib.

Real-web video is MP4-dominant; this walker gives the crawl the same
surface the AVI path has (functions/avi.py): container metadata
(dims, fps, codec, sample count) plus the actual sample bytes, so
Motion-JPEG tracks ('jpeg' sample entries, the QuickTime MJPEG class)
decode to pixels through the in-repo JPEG codec while compressed
codecs (avc1/hvc1/vp09/av01) stay honest per-row errors — the same
metadata-scan-only contract as EXIF.

The writer emits a minimal conforming single-track file (ftyp + mdat
+ moov with the full stbl: stsd/stts/stsc/stsz/stco) for synth/test
rows. Box layouts follow the public ISO/IEC 14496-12 spec; no
reference-engine analogue exists (lmmx/bisque has no media layer).
"""

from __future__ import annotations

import struct

# sample-entry fourccs whose samples are self-contained JPEG images
_JPEG_FORMATS = {b"jpeg", b"mjpa", b"mjpb", b"JPEG"}
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta",
}


def _boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) at one nesting level.
    Sizes are clamped to the buffer (hostile-header rule learned from
    the AVI walker: a declared size beyond the buffer must not spin)."""
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8:
            raise ValueError("mp4 box size < 8")
        box_end = min(pos + size, end)
        yield btype, body, box_end
        pos += size


def _find(data: bytes, pos: int, end: int, path: list[bytes]):
    """First box at the given nested path → (body_start, body_end)."""
    for btype, body, box_end in _boxes(data, pos, end):
        if btype == path[0]:
            if len(path) == 1:
                return body, box_end
            return _find(data, body, box_end, path[1:])
    return None


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {w, h, fps, codec, n_frames, frames:[sample bytes]}
    for the first video track — same shape as avi.parse_avi."""
    head = _find(data, 0, len(data), [b"ftyp"])
    if head is None:
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    moov = _find(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("mp4 missing moov")
    meta: dict = {"codec": None, "fps": None, "w": None, "h": None}
    frames: list[bytes] = []
    for btype, body, box_end in _boxes(data, moov[0], moov[1]):
        if btype != b"trak":
            continue
        hdlr = _find(data, body, box_end, [b"mdia", b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        # dims from tkhd (16.16 fixed point); version 1 uses 64-bit
        # times, shifting width/height by +12 — reading the v0 offsets
        # there yields garbage nonzero dims that also defeat the stsd
        # fallback (ADVICE r7 #4), mirroring the mdhd version handling
        tkhd = _find(data, body, box_end, [b"tkhd"])
        if tkhd is not None:
            t = data[tkhd[0] : tkhd[1]]
            off = 76 if (len(t) > 0 and t[0] == 0) else 88
            meta["w"] = int.from_bytes(t[off : off + 4], "big") >> 16
            meta["h"] = int.from_bytes(t[off + 4 : off + 8], "big") >> 16
        mdhd = _find(data, body, box_end, [b"mdia", b"mdhd"])
        timescale = None
        if mdhd is not None:
            m = data[mdhd[0] : mdhd[1]]
            if m[0] == 0:  # version 0
                timescale = int.from_bytes(m[12:16], "big")
            else:  # version 1: 64-bit times
                timescale = int.from_bytes(m[20:24], "big")
        stbl = _find(data, body, box_end, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            raise ValueError("video trak missing stbl")
        tables: dict[bytes, tuple[int, int]] = {}
        for bt, bs, be in _boxes(data, stbl[0], stbl[1]):
            tables[bt] = (bs, be)
        # stsd → codec fourcc (+ dims fallback)
        if b"stsd" in tables:
            s, e = tables[b"stsd"]
            n = int.from_bytes(data[s + 4 : s + 8], "big")
            if n >= 1 and s + 16 <= e:
                fmt = data[s + 12 : s + 16]
                meta["codec"] = fmt.decode("ascii", "replace").strip()
                if not meta["w"] and s + 44 <= e:
                    meta["w"] = int.from_bytes(data[s + 40 : s + 42], "big")
                    meta["h"] = int.from_bytes(data[s + 42 : s + 44], "big")
        if meta["codec"] is None:
            raise ValueError("video trak missing stsd entry")
        # fps from stts (uniform delta assumed for the headline rate)
        if b"stts" in tables and timescale:
            s, e = tables[b"stts"]
            cnt = int.from_bytes(data[s + 4 : s + 8], "big")
            if cnt >= 1:
                delta = int.from_bytes(data[s + 12 : s + 16], "big")
                if delta:
                    meta["fps"] = round(timescale / delta, 3)
        # sample byte ranges: stsz sizes + stsc chunk map + stco offsets
        sizes: list[int] = []
        if b"stsz" in tables:
            s, e = tables[b"stsz"]
            fixed = int.from_bytes(data[s + 4 : s + 8], "big")
            count = int.from_bytes(data[s + 8 : s + 12], "big")
            if fixed:
                sizes = [fixed] * count
            else:
                sizes = [
                    int.from_bytes(data[s + 12 + 4 * i : s + 16 + 4 * i], "big")
                    for i in range(count)
                    if s + 16 + 4 * i <= e
                ]
        offsets: list[int] = []
        if b"stco" in tables:
            s, e = tables[b"stco"]
            count = int.from_bytes(data[s + 4 : s + 8], "big")
            offsets = [
                int.from_bytes(data[s + 8 + 4 * i : s + 12 + 4 * i], "big")
                for i in range(count)
                if s + 12 + 4 * i <= e
            ]
        stsc_rows: list[tuple[int, int]] = []
        if b"stsc" in tables:
            s, e = tables[b"stsc"]
            count = int.from_bytes(data[s + 4 : s + 8], "big")
            for i in range(count):
                o = s + 8 + 12 * i
                if o + 12 > e:
                    break
                stsc_rows.append((
                    int.from_bytes(data[o : o + 4], "big"),
                    int.from_bytes(data[o + 4 : o + 8], "big"),
                ))
        # expand chunk map → per-sample absolute offsets
        si = 0
        for ci, chunk_off in enumerate(offsets, start=1):
            per = 1
            for first, n_per in stsc_rows:
                if first <= ci:
                    per = n_per
            off = chunk_off
            for _ in range(per):
                if si >= len(sizes):
                    break
                sz = sizes[si]
                if off + sz > len(data):
                    raise ValueError("sample range beyond file")
                frames.append(data[off : off + sz])
                off += sz
                si += 1
        break  # first video track only
    if meta["codec"] is None:
        raise ValueError("mp4 has no video track")
    meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


# ---- writer (synth/test rows) -------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")[-3:]) + payload)


def encode_mp4(frames: list, fps: float = 10.0, quality: int = 90) -> bytes:
    """RGB frame arrays → minimal conforming MP4 with a 'jpeg'
    (Motion-JPEG) video track: ftyp + mdat (JPEG samples) + moov with
    the full sample table. Layout per ISO/IEC 14496-12 v0 boxes."""
    import numpy as np

    from bisque_spark.functions.jpeg import encode_jpeg

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    samples = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(samples)
    timescale = 600
    delta = max(int(round(timescale / fps)), 1)
    duration = delta * n

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    # chunk 0 = whole mdat body; sample offsets are absolute file offsets
    mdat_off = len(ftyp) + 8  # ftyp + mdat header

    mvhd = _full(b"mvhd", struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, duration
    ) + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16), flags=3)
    mdhd = _full(b"mdhd", struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0
    ))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    # stsd with one 'jpeg' visual sample entry
    entry = (
        struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", struct.pack(">II", 1, mdat_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
