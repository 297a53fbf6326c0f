"""AVI/MJPEG video frame sampling — container round trips, the
DHT-less camera-stream path, and the Spark operator vs a driver-side
python twin. Replaces the r1-r5 video stub (the decode is now real
for MJPG/DIB; other codecs stay honest errors)."""

import numpy as np
import pytest

from bisque_spark.functions.avi import (
    decode_avi_frames,
    decode_frame,
    encode_avi,
    ensure_dht,
    parse_avi,
)
from bisque_spark.functions.jpeg import decode_jpeg, psnr
from bisque_spark.operators.multimodal import (
    decode_ppm,
    synth_video,
    video_frame_sample,
)


def _smooth_frames(n=6, h=24, w=40):
    """Band-limited content (JPEG's favorable case) with per-frame
    drift so consecutive frames differ."""
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        r = 128 + 100 * np.sin(xx / 9.0 + t / 3.0)
        g = 128 + 100 * np.cos(yy / 7.0 - t / 4.0)
        b = 128 + 80 * np.sin((xx + yy) / 11.0 + t / 5.0)
        out.append(np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8))
    return out


def test_mjpg_roundtrip_psnr_gate():
    frames = _smooth_frames()
    data = encode_avi(frames, fps=12.5, codec="MJPG", quality=92)
    meta, dec = decode_avi_frames(data)
    assert (meta["w"], meta["h"]) == (40, 24)
    assert meta["fps"] == 12.5
    assert meta["codec"] == "MJPG"
    assert meta["n_frames"] == len(frames)
    for orig, got in zip(frames, dec):
        assert psnr(orig, got) >= 40.0


def test_dib_roundtrip_bit_exact_and_selective_decode():
    frames = _smooth_frames(n=7, h=18, w=21)  # odd width → row padding
    data = encode_avi(frames, fps=30, codec="DIB ")
    meta, dec = decode_avi_frames(data, [0, 3, 6])
    assert meta["codec"] == "DIB"
    for i, got in zip([0, 3, 6], dec):
        assert (frames[i] == got).all()


def _strip_dht(jpeg: bytes) -> bytes:
    out = bytearray(jpeg[:2])
    i = 2
    while i < len(jpeg) - 1:
        marker = jpeg[i + 1]
        if marker == 0xDA:
            out += jpeg[i:]
            break
        ln = int.from_bytes(jpeg[i + 2 : i + 4], "big")
        if marker != 0xC4:
            out += jpeg[i : i + 2 + ln]
        i += 2 + ln
    return bytes(out)


def test_dhtless_mjpeg_camera_stream_decodes():
    """Real-camera MJPEG omits DHT (OpenDML MJPEG appendix);
    ensure_dht must make such frames decode identically to the
    table-carrying form."""
    frames = _smooth_frames(n=2)
    data = encode_avi(frames, codec="MJPG")
    meta = parse_avi(data)
    full = meta["frames"][0]
    stripped = _strip_dht(full)
    assert b"\xff\xc4" not in stripped[: stripped.find(b"\xff\xda")]
    with pytest.raises(Exception):
        decode_jpeg(stripped)
    assert (decode_jpeg(ensure_dht(stripped)) == decode_jpeg(full)).all()
    # already-tabled frames pass through untouched
    assert ensure_dht(full) is full


def test_idx1_offsets_point_at_chunk_headers():
    frames = _smooth_frames(n=4)
    data = encode_avi(frames, codec="MJPG")
    # locate idx1 and the movi LIST
    movi_at = data.find(b"LIST", 12)
    while data[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = data.find(b"LIST", movi_at + 4)
    idx_at = data.rfind(b"idx1")
    n = int.from_bytes(data[idx_at + 4 : idx_at + 8], "little") // 16
    assert n == 4
    base = movi_at + 8  # the 'movi' fourcc position
    for k in range(n):
        e = idx_at + 8 + 16 * k
        ckid = data[e : e + 4]
        off = int.from_bytes(data[e + 8 : e + 12], "little")
        size = int.from_bytes(data[e + 12 : e + 16], "little")
        assert data[base + off : base + off + 4] == ckid
        assert int.from_bytes(
            data[base + off + 4 : base + off + 8], "little"
        ) == size


def test_parse_rejects_non_avi():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi(b"garbage")


def test_unsupported_codec_in_valid_container():
    frames = _smooth_frames(n=2)
    data = bytearray(encode_avi(frames, codec="MJPG"))
    # rewrite the strh fccHandler to a codec we don't ship
    at = bytes(data).find(b"vids") + 4
    data[at : at + 4] = b"XVID"
    meta = parse_avi(bytes(data))
    assert meta["codec"] == "XVID"
    with pytest.raises(NotImplementedError):
        decode_frame(meta, 0)


def _parse_clip(v):
    from bisque_spark.functions.mp4 import parse_mp4

    return parse_mp4(v["bytes"]) if v["fmt"] == "mp4" else parse_avi(v["bytes"])


def _twin_frame(v, meta, j):
    if v["fmt"] == "mp4":
        from bisque_spark.functions.avi import ensure_dht
        from bisque_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(ensure_dht(bytes(meta["frames"][j])))
    return decode_frame(meta, j)


def test_synth_video_deterministic_and_decodable():
    a, b = synth_video("clip-42"), synth_video("clip-42")
    assert a["bytes"] == b["bytes"]
    meta = _parse_clip(a)
    assert meta["n_frames"] == a["n_frames"]
    assert (meta["w"], meta["h"]) == (a["w"], a["h"])
    # both containers and both AVI codecs appear across ids
    containers = set()
    codecs = set()
    for i in range(16):
        v = synth_video(f"clip-{i}")
        containers.add(v["fmt"])
        codecs.add(_parse_clip(v)["codec"])
    assert containers == {"avi", "mp4"}
    assert {"MJPG", "DIB", "jpeg"} <= codecs


def test_video_frame_sample_matches_python_twin(spark):
    """Spark operator == driver twin, including sampled-frame PPM
    bytes, motion signal, and both honest error classes."""
    rows = []
    for i in range(6):
        v = synth_video(f"clip-{i}")
        rows.append((f"clip-{i}", bytearray(v["bytes"]), v["fmt"]))
    rows.append(("clip-h264", bytearray(b"\x00\x01"), "h264"))
    rows.append(("clip-corrupt", bytearray(b"RIFF\xff\xff\xff\xffAVI x"), "avi"))
    df = spark.createDataFrame(
        rows, "media_id string, bytes binary, fmt string"
    )
    every_n = 2
    got = {r["media_id"]: r for r in video_frame_sample(df, every_n).collect()}
    assert len(got) == 8
    assert got["clip-h264"]["error"] == "codec_unavailable:h264"
    assert got["clip-h264"]["frames"] is None
    assert got["clip-corrupt"]["error"].startswith("decode_error:")
    for i in range(6):
        mid = f"clip-{i}"
        v = synth_video(mid)
        meta = _parse_clip(v)
        idx = list(range(0, meta["n_frames"], every_n))
        r = got[mid]
        assert r["error"] is None
        assert r["codec"] == meta["codec"]
        assert (r["w"], r["h"]) == (meta["w"], meta["h"])
        assert r["fps"] == meta["fps"]
        assert r["n_frames"] == meta["n_frames"]
        assert list(r["sampled_idx"]) == idx
        assert len(r["frames"]) == len(idx)
        lumas = []
        for j, frame_ppm in zip(idx, r["frames"]):
            twin = _twin_frame(v, meta, j)
            px, w, h = decode_ppm(bytes(frame_ppm))
            assert (px == twin).all()
            lumas.append(twin.astype(np.float64).mean(axis=-1))
        motion = (
            float(
                np.mean(
                    [np.abs(b - a).mean() for a, b in zip(lumas, lumas[1:])]
                )
            )
            if len(lumas) > 1
            else 0.0
        )
        assert abs(r["motion"] - motion) < 1e-12
        # the clips are synthesized with a drifting square: motion is
        # a real nonzero signal, not a constant
        assert r["motion"] > 0


def test_sampled_frames_feed_image_pipeline(spark):
    """Decoded-frame PPMs flow into the existing image feature
    operator (the advertised reason frames are re-encoded PPM)."""
    import pyspark.sql.functions as F

    from bisque_spark.operators.multimodal import image_features

    v = synth_video("clip-0")
    df = spark.createDataFrame(
        [("clip-0", bytearray(v["bytes"]), v["fmt"])],
        "media_id string, bytes binary, fmt string",
    )
    frames = (
        video_frame_sample(df, 3)
        .select(
            "media_id",
            F.posexplode("frames").alias("fi", "bytes"),
        )
        .select(
            F.concat_ws("#", "media_id", "fi").alias("image_id"),
            "bytes",
            F.lit(v["w"]).cast("int").alias("w"),
            F.lit(v["h"]).cast("int").alias("h"),
            F.lit("ppm").alias("fmt"),
        )
    )
    out = image_features(frames).collect()
    assert len(out) > 0
    assert all(r["error"] is None for r in out)
    assert all(r["w"] == v["w"] and r["h"] == v["h"] for r in out)


def test_hostile_riff_size_contained_fast():
    """A header claiming size 0xFFFFFFFF over a 14-byte body must fail
    in microseconds, not walk ~500M empty chunk steps (r7: measured
    ~5 min of spin per row before the clamp — a crawler DoS class)."""
    import time

    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\xff\xff\xff\xffAVI x")
    # generous bound: the pre-fix behavior took minutes
    assert time.perf_counter() - t0 < 1.0


def test_mp4_container_parse_and_hostile_containment():
    """ISO-BMFF walk fixtures: metadata fields, sample extraction, and
    hostile-header containment (clamped sizes, no spin — the AVI
    lesson applied from day one)."""
    import time

    import numpy as np

    from bisque_spark.functions.jpeg import decode_jpeg, psnr
    from bisque_spark.functions.mp4 import encode_mp4, parse_mp4

    rng = np.random.RandomState(11)
    frames = [
        ((np.mgrid[0:20, 0:28][0] * 9 + t * 13) % 256)
        .astype(np.uint8)[..., None]
        .repeat(3, axis=2)
        for t in range(4)
    ]
    data = encode_mp4(frames, fps=15.0, quality=95)
    m = parse_mp4(data)
    assert m["codec"] == "jpeg"
    assert (m["w"], m["h"]) == (28, 20)
    assert m["fps"] == 15.0
    assert m["n_frames"] == 4
    for fr, orig in zip(m["frames"], frames):
        assert psnr(orig, decode_jpeg(fr)) >= 40.0
    # hostile: truncated, no ftyp, declared-size overflow
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError):
        parse_mp4(data[: len(data) // 2])  # moov at end → missing
    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        parse_mp4(b"\xff\xff\xff\xffftypisom" + b"\x00" * 8)
    assert time.perf_counter() - t0 < 1.0


def test_mp4_clips_flow_through_spark_operator(spark):
    """An MP4 synth clip runs the full Spark sampling path, and an
    avc1-coded MP4 stays an honest codec_unavailable row."""
    import struct

    from bisque_spark.functions.mp4 import encode_mp4

    mids = [f"clip-{i}" for i in range(16)]
    clips = {m: synth_video(m) for m in mids}
    mp4_ids = [m for m in mids if clips[m]["fmt"] == "mp4"]
    assert mp4_ids, "seed mix should contain mp4 clips"
    # forge an avc1 file by patching the stsd fourcc of a real one
    forged = bytearray(clips[mp4_ids[0]]["bytes"])
    at = forged.find(b"jpeg", forged.find(b"stsd"))
    forged[at : at + 4] = b"avc1"
    rows = [
        (m, bytearray(clips[m]["bytes"]), clips[m]["fmt"]) for m in mp4_ids
    ] + [("clip-avc1", bytearray(bytes(forged)), "mp4")]
    df = spark.createDataFrame(
        rows, "media_id string, bytes binary, fmt string"
    )
    got = {r["media_id"]: r for r in video_frame_sample(df, 2).collect()}
    for m in mp4_ids:
        assert got[m]["error"] is None, got[m]["error"]
        assert got[m]["codec"] == "jpeg"
        assert got[m]["n_frames"] == clips[m]["n_frames"]
        assert len(got[m]["frames"]) >= 1
    assert got["clip-avc1"]["error"] == "codec_unavailable:avc1"


def test_mp4_tkhd_version1_dims():
    """ADVICE r7 #4: a version-1 tkhd (64-bit times) shifts
    width/height by +12 bytes; reading the v0 offsets yields garbage
    nonzero dims that also defeat the stsd fallback."""
    import struct

    import numpy as np

    from bisque_spark.functions.mp4 import encode_mp4, parse_mp4

    frames = [
        ((np.mgrid[0:20, 0:28][0] * 7 + t * 11) % 256)
        .astype(np.uint8)[..., None]
        .repeat(3, axis=2)
        for t in range(2)
    ]
    data = encode_mp4(frames, fps=10.0, quality=95)
    m0 = parse_mp4(data)
    assert (m0["w"], m0["h"]) == (28, 20)

    # rebuild the tkhd as version 1: 64-bit creation/modification/
    # duration, same track id / matrix / dims
    i = data.find(b"tkhd")
    assert i > 0
    size = struct.unpack(">I", data[i - 4 : i])[0]
    old = data[i + 4 : i - 4 + size]  # payload incl. version+flags
    duration = struct.unpack(">I", old[20:24])[0]
    v1 = (
        b"\x01\x00\x00\x03"
        + struct.pack(">QQI", 0, 0, 1)
        + b"\x00" * 4
        + struct.pack(">Q", duration)
        + old[24:]  # reserved/layer/volume + matrix + w/h unchanged
    )
    v1box = struct.pack(">I", len(v1) + 8) + b"tkhd" + v1
    patched = bytearray(data)
    patched[i - 4 : i - 4 + size] = v1box
    # fix enclosing box sizes (trak, moov) for the +12 growth
    grow = len(v1box) - size
    for tag in (b"trak", b"moov"):
        j = bytes(patched).find(tag)
        old_sz = struct.unpack(">I", bytes(patched[j - 4 : j]))[0]
        patched[j - 4 : j] = struct.pack(">I", old_sz + grow)
    m1 = parse_mp4(bytes(patched))
    assert (m1["w"], m1["h"]) == (28, 20)
