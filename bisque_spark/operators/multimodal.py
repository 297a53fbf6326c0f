"""Multimodal (image/audio/video) column operators.

Images/audio/video are opaque ``binary`` columns + typed metadata
(the `images` table shape from BASELINE.json input_hint). Decode /
resize / feature-extract run as Arrow-batched pandas UDFs over
``mapInPandas``; the Spark plumbing (schemas, batch shape,
partitioning) is real and tested, while codec support is limited to
the sandbox's formats ('raw', 'jpeg' via the pure-numpy baseline
codec in functions/jpeg.py, 'png' via the full real-web codec in
functions/png.py). Other codecs raise NotImplementedError per row →
captured in the ``error`` column, never a task failure (same row-level
error containment as the fetch/extract stages).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bisque_spark.synth import decode_image

FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, error string"
)

THUMB_SCHEMA = "image_id string, w int, h int, thumb binary, error string"


# ---- codec-free container formats (pure numpy, no codec library) ---------
#
# PPM (P6) and uncompressed 24-bit BMP are spec-trivial byte layouts:
# decoding them needs no codec, so they get REAL decoders — the
# NotImplementedError stub is reserved for formats that genuinely need
# an absent library (jpeg, webp, video codecs).


def decode_ppm(data: bytes) -> tuple[np.ndarray, int, int]:
    """P6 binary PPM → (h×w×3 uint8, w, h). Handles comments and
    arbitrary header whitespace per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    # header = 4 tokens (magic, w, h, maxval); '#' starts a comment
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3), w, h


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels.astype(np.uint8)
    ).tobytes()


def decode_bmp(data: bytes) -> tuple[np.ndarray, int, int]:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP → (h×w×3 RGB, w, h).
    Rows are 4-byte padded, BGR, bottom-up (top-down if height < 0)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"bmp bpp={bpp} compression={comp}")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1].copy(), w, h  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    raw = body.tobytes()
    header = (
        b"BM"
        + (54 + len(raw)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raw).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + raw


def _decode(row_bytes, fmt: str, w: int, h: int) -> np.ndarray:
    data = bytes(row_bytes)
    if fmt == "ppm":
        arr, _, _ = decode_ppm(data)
        return arr
    if fmt == "bmp":
        arr, _, _ = decode_bmp(data)
        return arr
    if fmt == "ico":
        # favicon container: best entry's own dims, not the row's
        from bisque_spark.functions.ico import decode_ico

        return decode_ico(data)
    pixels = decode_image(data, fmt)
    return np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)


def _row_orientation(data) -> int:
    """EXIF tag-274 of the row bytes (1 when absent / non-JPEG /
    hostile — the conservative per-row contract)."""
    from bisque_spark.functions.exif import extract_exif

    try:
        o = extract_exif(bytes(data)).get("orientation")
    except Exception:  # noqa: BLE001 — hostile bytes never kill a task
        o = None
    return o if isinstance(o, int) and 1 <= o <= 8 else 1


def make_image_features_batches(orient: bool = False):
    """Per-image channel means (the feature-extraction stand-in).

    orient=True applies the EXIF tag-274 transform after decode so the
    reported dims (and any pixel-order-dependent downstream) are
    viewer-space — a tag-6 phone photo then features identically to
    its upright re-encode. Channel means are orientation-invariant by
    construction; w/h swap for orientations 5-8."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": [], "w": [], "h": [], "fmt": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "error": [],
            }
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                err = None
                means = (None, None, None)
                ow, oh = int(w), int(h)
                try:
                    arr = _decode(data, fmt, int(w), int(h))
                    if orient:
                        arr = oriented_pixels(arr, _row_orientation(data))
                        oh, ow = arr.shape[0], arr.shape[1]
                    means = tuple(
                        float(arr[..., c].mean()) for c in range(3)
                    )
                except NotImplementedError:
                    err = f"codec_unavailable:{fmt}"
                except Exception as exc:  # noqa: BLE001
                    err = f"decode_error:{type(exc).__name__}"
                out["image_id"].append(image_id)
                out["w"].append(ow)
                out["h"].append(oh)
                out["fmt"].append(fmt)
                out["mean_r"].append(means[0])
                out["mean_g"].append(means[1])
                out["mean_b"].append(means[2])
                out["error"].append(err)
            yield pd.DataFrame(out)

    return run


# module-level name kept: tests and the bench call it directly
image_features_batches = make_image_features_batches(orient=False)


def image_features(images: DataFrame, orient: bool = False) -> DataFrame:
    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        make_image_features_batches(orient), schema=FEATURES_SCHEMA
    )


EXIF_SCHEMA = (
    "image_id string, orientation int, make string, model string, "
    "datetime_original string, has_exif boolean"
)


def image_exif_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-image EXIF provenance (functions/exif.py): orientation tag,
    camera make/model, capture time. Marker-stream walk only — the
    entropy payload is never decoded, so this costs parse-of-headers
    per row, not a pixel pass. Non-JPEG / EXIF-less rows get NULLs
    with has_exif = false (per-row honesty contract)."""
    from bisque_spark.functions.exif import extract_exif

    for pdf in batches:
        out = {
            "image_id": [], "orientation": [], "make": [], "model": [],
            "datetime_original": [], "has_exif": [],
        }
        for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
            try:
                d = extract_exif(bytes(data)) if data is not None else {}
            except Exception:  # noqa: BLE001 — hostile bytes never kill a task
                d = {}
            out["image_id"].append(image_id)
            out["orientation"].append(d.get("orientation"))
            out["make"].append(d.get("make"))
            out["model"].append(d.get("model"))
            out["datetime_original"].append(d.get("datetime_original"))
            out["has_exif"].append(bool(d))
        yield pd.DataFrame(out)


def image_exif(images: DataFrame) -> DataFrame:
    return images.select("image_id", "bytes").mapInPandas(
        image_exif_batches, schema=EXIF_SCHEMA
    )


def oriented_pixels(arr: np.ndarray, orientation: int | None) -> np.ndarray:
    """Viewer-space pixels: apply the EXIF orientation before any
    pixel-space feature (phash/thumbnail/embedding) — without this,
    tag-274 rotated phone photos hash differently from their upright
    re-encodes. Exposed separately (not auto-applied inside the
    existing feature operators) so committed phash oracles stay
    stable; curation plans opt in."""
    from bisque_spark.functions.exif import apply_orientation

    return apply_orientation(arr, orientation or 1)


def make_thumbnail_batches(target: int = 8):
    def thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "thumb": [], "error": []}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                err, blob, tw, th = None, None, None, None
                try:
                    arr = _decode(data, fmt, int(w), int(h))
                    # nearest-neighbor subsample (deterministic resize)
                    ys = np.linspace(0, int(h) - 1, min(target, int(h))).astype(int)
                    xs = np.linspace(0, int(w) - 1, min(target, int(w))).astype(int)
                    t = arr[np.ix_(ys, xs)]
                    th, tw = t.shape[0], t.shape[1]
                    blob = t.tobytes()
                except NotImplementedError:
                    err = f"codec_unavailable:{fmt}"
                except Exception as exc:  # noqa: BLE001
                    err = f"decode_error:{type(exc).__name__}"
                out["image_id"].append(image_id)
                out["w"].append(tw)
                out["h"].append(th)
                out["thumb"].append(blob)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return thumbs


def image_thumbnails(images: DataFrame, target: int = 8) -> DataFrame:
    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        make_thumbnail_batches(target), schema=THUMB_SCHEMA
    )


PIPELINE_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, thumb binary, error string"
)


def image_pipeline(
    images: DataFrame, thumb_target: int = 8, orient: bool = False
) -> DataFrame:
    """Fused features + thumbnail stage: ONE decode per image (the
    decode dominates at 100 TB — running image_features and
    image_thumbnails separately pays it twice). Emits the features
    columns plus the thumbnail blob in a single Arrow pass.

    orient=True (VERDICT r6 #2) applies the EXIF tag-274 transform
    after decode, so thumbnails/dims are viewer-space: a tag-6 phone
    photo then thumbs byte-identically to its upright re-encode
    instead of hashing as a different image. The marker-walk EXIF
    extraction is header-only — no second pixel pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "image_id": [], "w": [], "h": [], "fmt": [], "mean_r": [],
                "mean_g": [], "mean_b": [], "thumb": [], "error": [],
            }
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                err, blob = None, None
                means = (None, None, None)
                ow, oh = int(w), int(h)
                try:
                    arr = _decode(data, fmt, int(w), int(h))
                    if orient:
                        arr = oriented_pixels(arr, _row_orientation(data))
                        oh, ow = arr.shape[0], arr.shape[1]
                    means = tuple(float(arr[..., c].mean()) for c in range(3))
                    ys = np.linspace(
                        0, oh - 1, min(thumb_target, oh)
                    ).astype(int)
                    xs = np.linspace(
                        0, ow - 1, min(thumb_target, ow)
                    ).astype(int)
                    blob = arr[np.ix_(ys, xs)].tobytes()
                except NotImplementedError:
                    err = f"codec_unavailable:{fmt}"
                except Exception as exc:  # noqa: BLE001
                    err = f"decode_error:{type(exc).__name__}"
                out["image_id"].append(image_id)
                out["w"].append(ow)
                out["h"].append(oh)
                out["fmt"].append(fmt)
                out["mean_r"].append(means[0])
                out["mean_g"].append(means[1])
                out["mean_b"].append(means[2])
                out["thumb"].append(blob)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema=PIPELINE_SCHEMA
    )


QUALITY_SCHEMA = (
    "image_id string, sharpness double, entropy double, "
    "colorfulness double, error string"
)


def _gray(arr: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, float64."""
    a = arr.astype(np.float64)
    return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]


def sharpness_of(arr: np.ndarray) -> float:
    """Variance of the 3×3 Laplacian of the luma — the standard
    no-reference blur metric (higher = sharper). 0.0 when the image
    is too small for the kernel."""
    g = _gray(arr)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0.0
    lap = (
        g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
        - 4.0 * g[1:-1, 1:-1]
    )
    return float(lap.var())


def entropy_of(arr: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin luma histogram — near 0
    for flat/synthetic fills, up to 8 for noise-like content."""
    counts = np.bincount(
        np.clip(_gray(arr), 0, 255).astype(np.uint8).ravel(), minlength=256
    )
    p = counts[counts > 0] / counts.sum()
    return float(-(p * np.log2(p)).sum())


def colorfulness_of(arr: np.ndarray) -> float:
    """Hasler & Süsstrunk (SPIE 2003) colorfulness:
    sqrt(σ²_rg + σ²_yb) + 0.3·sqrt(μ²_rg + μ²_yb) over the opponent
    axes rg = R−G, yb = (R+G)/2 − B. 0 for grayscale images."""
    a = arr.astype(np.float64)
    rg = a[..., 0] - a[..., 1]
    yb = 0.5 * (a[..., 0] + a[..., 1]) - a[..., 2]
    return float(
        np.sqrt(rg.var() + yb.var())
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )


def image_quality_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode ONCE per image, emit the three no-reference quality
    signals; undecodable rows route to the error column (row-level
    containment, same contract as every multimodal stage)."""
    for pdf in batches:
        out: dict[str, list] = {
            "image_id": [], "sharpness": [], "entropy": [],
            "colorfulness": [], "error": [],
        }
        for image_id, data, w, h, fmt in zip(
            pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
        ):
            err = None
            vals = (None, None, None)
            try:
                arr = _decode(data, fmt, int(w), int(h))
                vals = (
                    sharpness_of(arr), entropy_of(arr), colorfulness_of(arr)
                )
            except NotImplementedError:
                err = f"codec_unavailable:{fmt}"
            except Exception as exc:  # noqa: BLE001
                err = f"decode_error:{type(exc).__name__}"
            out["image_id"].append(image_id)
            out["sharpness"].append(vals[0])
            out["entropy"].append(vals[1])
            out["colorfulness"].append(vals[2])
            out["error"].append(err)
        yield pd.DataFrame(out)


def image_quality(images: DataFrame) -> DataFrame:
    """No-reference quality signals for the curation funnel
    (plans/curate_images.py): blur cut by Laplacian variance, flat
    synthetic fills by histogram entropy, grayscale spam by
    colorfulness."""
    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        image_quality_batches, schema=QUALITY_SCHEMA
    )


SIGNALS_SCHEMA = (
    "image_id string, sharpness double, entropy double, "
    "colorfulness double, thumb_vec array<float>, error string"
)


def make_image_signals_batches(thumb_target: int = 8):
    """Factory (lazy, picklable) for the fused curation-signals stage:
    ONE decode per image feeding BOTH the quality formulas and the
    thumbnail luma vector that the diversity sampler embeds on. At
    100 TB the decode dominates — running image_quality and a
    thumbnail pass separately pays it twice (same fusion rationale as
    image_pipeline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "image_id": [], "sharpness": [], "entropy": [],
                "colorfulness": [], "thumb_vec": [], "error": [],
            }
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                err, vec = None, None
                vals = (None, None, None)
                try:
                    arr = _decode(data, fmt, int(w), int(h))
                    vals = (
                        sharpness_of(arr),
                        entropy_of(arr),
                        colorfulness_of(arr),
                    )
                    # FIXED-length grid (unlike image_pipeline's
                    # thumbnails): tiny images upsample by nearest
                    # neighbour so every vector is thumb_target² dims,
                    # as the IVF centroid math requires
                    ys = np.linspace(0, int(h) - 1, thumb_target).astype(int)
                    xs = np.linspace(0, int(w) - 1, thumb_target).astype(int)
                    # luma thumbnail, scaled to [0,1]: a cheap, fully
                    # in-sandbox stand-in for a learned embedding with
                    # the right invariance (near-identical pixels →
                    # near-identical vectors) for diversity sampling
                    vec = (
                        _gray(arr[np.ix_(ys, xs)]).ravel() / 255.0
                    ).astype(np.float32)
                except NotImplementedError:
                    err = f"codec_unavailable:{fmt}"
                except Exception as exc:  # noqa: BLE001
                    err = f"decode_error:{type(exc).__name__}"
                out["image_id"].append(image_id)
                out["sharpness"].append(vals[0])
                out["entropy"].append(vals[1])
                out["colorfulness"].append(vals[2])
                out["thumb_vec"].append(vec)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return run


def image_signals(images: DataFrame, thumb_target: int = 8) -> DataFrame:
    """Fused quality + thumbnail-embedding stage for
    plans/curate_images.run_image_curation (decode-once)."""
    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        make_image_signals_batches(thumb_target), schema=SIGNALS_SCHEMA
    )


# ---- audio / video columns ----------------------------------------------
#
# Same opaque-binary + typed-metadata pattern as images. Audio: raw
# s16le PCM is decodable in-sandbox (numpy); compressed codecs and all
# video codecs raise NotImplementedError per row → error column (the
# Spark plumbing — schema, batching, partitioning — is real; the codec
# is the stubbed part, per the task brief).

AUDIO_FEATURES_SCHEMA = (
    "media_id string, fmt string, sample_rate int, duration_s double, "
    "rms double, peak double, error string"
)


def synth_audio(media_id: str, sample_rate: int = 8000) -> dict:
    """Deterministic s16le PCM clip derived from the id."""
    import numpy as np

    from bisque_spark.hashing import xxh64

    rng_seed = xxh64(("audio:" + media_id).encode()) % (2**32)
    rng = np.random.RandomState(rng_seed)
    n = int(sample_rate * (0.1 + (rng_seed % 20) / 100))  # 0.1-0.3 s
    wave = (rng.standard_normal(n) * 3000).astype(np.int16)
    return {
        "bytes": wave.tobytes(),
        "fmt": "pcm_s16le",
        "sample_rate": sample_rate,
    }


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE container with 16-bit PCM → (int16 samples, rate).
    Pure byte-layout parsing (walks the chunk list for fmt/data) — a
    codec-free container, like PPM/BMP on the image side."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, n_ch, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(body[0:2], "little")
            if fmt_tag != 1:  # 1 = integer PCM
                raise NotImplementedError(f"wav format tag {fmt_tag}")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("wav missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"wav bits={bits}")
    wave = np.frombuffer(pcm, dtype=np.int16)
    if n_ch and n_ch > 1:  # downmix to mono (mean of channels)
        wave = (
            wave[: len(wave) - len(wave) % n_ch]
            .reshape(-1, n_ch)
            .mean(axis=1)
            .astype(np.int16)
        )
    return wave, rate


def encode_wav(wave: np.ndarray, rate: int) -> bytes:
    """16-bit PCM → RIFF/WAVE. A 2-D (frames, channels) array encodes
    as interleaved multi-channel with the channel count in the header;
    1-D encodes mono."""
    arr = np.asarray(wave, dtype=np.int16)
    n_ch = arr.shape[1] if arr.ndim == 2 else 1
    pcm = np.ascontiguousarray(arr).tobytes()
    block_align = 2 * n_ch
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    # RIFF chunks are word-aligned; int16 PCM is always even, so this
    # pad only fires if a future 8-bit path reuses the encoder
    if len(pcm) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "media_id": [], "fmt": [], "sample_rate": [],
            "duration_s": [], "rms": [], "peak": [], "error": [],
        }
        for media_id, data, fmt, sr in zip(
            pdf["media_id"], pdf["bytes"], pdf["fmt"], pdf["sample_rate"]
        ):
            err = None
            dur = rms = peak = None
            try:
                if fmt == "pcm_s16le":
                    wave = np.frombuffer(bytes(data), dtype=np.int16)
                elif fmt == "wav":
                    wave, sr = decode_wav(bytes(data))
                else:
                    raise NotImplementedError(fmt)
                dur = float(len(wave) / int(sr))
                f = wave.astype(np.float64)
                rms = float(np.sqrt((f * f).mean())) if len(f) else 0.0
                peak = float(np.abs(f).max()) if len(f) else 0.0
            except NotImplementedError:
                err = f"codec_unavailable:{fmt}"
            except Exception as exc:  # noqa: BLE001
                err = f"decode_error:{type(exc).__name__}"
            out["media_id"].append(media_id)
            out["fmt"].append(fmt)
            # sr can be null/NaN when the decode above failed before
            # normalizing it — emit the row with error set, don't let
            # int(NaN) kill the whole Arrow batch
            out["sample_rate"].append(
                int(sr) if sr is not None and not pd.isna(sr) else None
            )
            out["duration_s"].append(dur)
            out["rms"].append(rms)
            out["peak"].append(peak)
            out["error"].append(err)
        yield pd.DataFrame(out)


def audio_features(media: DataFrame) -> DataFrame:
    return media.select("media_id", "bytes", "fmt", "sample_rate").mapInPandas(
        audio_features_batches, schema=AUDIO_FEATURES_SCHEMA
    )


PDF_TEXT_SCHEMA = "doc_id string, text string, n_pages int, error string"


def pdf_text_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Opaque PDF bytes → extracted text + page count (functions/
    pdf.py). Per-row honesty: unsupported features (encryption,
    LZW/DCT content streams, ToUnicode-less Type0 fonts) land in the
    error column as codec_unavailable; damage as decode_error —
    hostile bytes never kill the task."""
    from bisque_spark.functions.pdf import pdf_text

    for pdf_batch in batches:
        out = {"doc_id": [], "text": [], "n_pages": [], "error": []}
        for doc_id, data in zip(pdf_batch["doc_id"], pdf_batch["bytes"]):
            text = n_pages = None
            err = None
            try:
                got = pdf_text(bytes(data))
                text, n_pages = got["text"], got["n_pages"]
            except NotImplementedError as exc:
                err = f"codec_unavailable:{exc}"
            except Exception as exc:  # noqa: BLE001
                err = f"decode_error:{type(exc).__name__}"
            out["doc_id"].append(doc_id)
            out["text"].append(text)
            out["n_pages"].append(n_pages)
            out["error"].append(err)
        yield pd.DataFrame(out)


def pdf_text_extract(docs: DataFrame) -> DataFrame:
    """PDF text extraction over (doc_id, bytes) rows — the documents-
    pipeline entry point for the crawl's non-HTML text class. The
    output text column feeds the existing curation gates (langid,
    quality, token stats, dedup) unchanged."""
    return docs.select("doc_id", "bytes").mapInPandas(
        pdf_text_batches, schema=PDF_TEXT_SCHEMA
    )


def synth_pdf(doc_id: str) -> dict:
    """Deterministic PDF row: 1-3 pages of DetRng word text in a
    layout drawn from the id (classic/xref-stream × plain/Flate × Tj/
    TJ-arrays, 1 in 5 with the Identity-H unicode font). The page
    texts are the ground truth the extractor must recover."""
    from bisque_spark.functions.pdf import encode_pdf
    from bisque_spark.synth import DetRng, _words

    rng = DetRng("pdf:" + doc_id)
    n_pages = rng.randint(1, 3)
    pages = []
    for p in range(n_pages):
        lines = [
            _words(rng, rng.randint(3, 8)) for _ in range(rng.randint(1, 5))
        ]
        pages.append("\n".join(lines))
    unicode_font = rng.u01() < 0.2
    if unicode_font:
        pages = [p + "\ncafé — naïve 日本語" for p in pages]
    data = encode_pdf(
        pages,
        compress=rng.u01() < 0.7,
        use_tj_arrays=not unicode_font and rng.u01() < 0.4,
        xref_stream=rng.u01() < 0.5,
        unicode_font=unicode_font,
    )
    return {"bytes": data, "pages": pages, "n_pages": n_pages}


def synth_video(media_id: str) -> dict:
    """Deterministic short clip derived from the id: a moving
    gradient plus a drifting bright square (nonzero inter-frame
    motion, so the sampled-frame motion signal is a real measurement).
    Container alternates AVI / MP4 by seed (r7: real-web video is
    MP4-dominant); AVI codec alternates MJPG / DIB, MP4 carries
    'jpeg' (QuickTime Motion-JPEG) samples."""
    from bisque_spark.functions.avi import encode_avi
    from bisque_spark.hashing import xxh64

    seed = xxh64(("video:" + media_id).encode()) % (2**32)
    rng = np.random.RandomState(seed)
    w = 16 + 2 * int(rng.randint(0, 9))  # 16-32, even
    h = 16 + 2 * int(rng.randint(0, 9))
    n_frames = 6 + int(rng.randint(0, 7))  # 6-12
    fps = float(rng.choice([5.0, 10.0, 15.0, 24.0, 30.0]))
    container = "mp4" if seed % 4 == 0 else "avi"
    codec = "MJPG" if seed % 3 else "DIB "
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n_frames):
        r = ((xx * 7 + t * 11) % 256).astype(np.uint8)
        g = ((yy * 5 + t * 17) % 256).astype(np.uint8)
        b = ((xx + yy + t * 29) % 256).astype(np.uint8)
        fr = np.stack([r, g, b], axis=-1)
        # drifting 4x4 bright square
        sx = (seed % max(w - 4, 1) + t * 3) % max(w - 4, 1)
        sy = (seed // 7 % max(h - 4, 1) + t * 2) % max(h - 4, 1)
        fr[sy : sy + 4, sx : sx + 4] = 255
        frames.append(fr)
    if container == "mp4":
        from bisque_spark.functions.mp4 import encode_mp4

        data = encode_mp4(frames, fps=fps, quality=90)
    else:
        data = encode_avi(frames, fps=fps, codec=codec, quality=90)
    return {
        "bytes": data,
        "fmt": container,
        "n_frames": n_frames,
        "w": w,
        "h": h,
    }


VIDEO_FRAMES_SCHEMA = (
    "media_id string, fmt string, codec string, w int, h int, fps double, "
    "n_frames int, sampled_idx array<int>, frames array<binary>, "
    "motion double, error string"
)


def video_frame_sample_batches(
    every_n: int,
) -> "callable":
    """Batch fn factory (lazy, session-safe — CLAUDE.md pandas_udf
    rule). Decodes ONLY the sampled frame indices (the codec work
    scales with the sample, not the clip) and emits each sampled frame
    re-encoded as codec-free PPM so downstream image operators
    (image_features, phash) consume them directly. ``motion`` = mean
    absolute luma delta between consecutive sampled frames — the
    cheap curation signal for static-clip filtering."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bisque_spark.functions.avi import decode_frame, ensure_dht, parse_avi
        from bisque_spark.functions.jpeg import decode_jpeg
        from bisque_spark.functions.mp4 import parse_mp4

        def mp4_frame(meta: dict, i: int) -> np.ndarray:
            if meta["codec"].lower() not in ("jpeg", "mjpa", "mjpb"):
                raise NotImplementedError(meta["codec"])
            return decode_jpeg(ensure_dht(bytes(meta["frames"][i])))

        for pdf in batches:
            out = {
                "media_id": [], "fmt": [], "codec": [], "w": [], "h": [],
                "fps": [], "n_frames": [], "sampled_idx": [], "frames": [],
                "motion": [], "error": [],
            }
            for media_id, data, fmt in zip(
                pdf["media_id"], pdf["bytes"], pdf["fmt"]
            ):
                codec = w = h = fps = n_frames = None
                idx = frames = motion = err = None
                try:
                    if fmt == "avi":
                        meta = parse_avi(bytes(data))
                        frame_of = decode_frame
                    elif fmt == "mp4":
                        meta = parse_mp4(bytes(data))
                        frame_of = mp4_frame
                    else:
                        raise NotImplementedError(fmt)
                    idx = list(range(0, meta["n_frames"], every_n))
                    decoded = [frame_of(meta, i) for i in idx]
                    codec, w, h = meta["codec"], meta["w"], meta["h"]
                    fps, n_frames = meta["fps"], meta["n_frames"]
                    frames = [encode_ppm(fr) for fr in decoded]
                    if len(decoded) > 1:
                        lumas = [
                            fr.astype(np.float64).mean(axis=-1)
                            for fr in decoded
                        ]
                        motion = float(
                            np.mean(
                                [
                                    np.abs(b - a).mean()
                                    for a, b in zip(lumas, lumas[1:])
                                ]
                            )
                        )
                    else:
                        motion = 0.0
                except NotImplementedError as exc:
                    err = f"codec_unavailable:{exc}"
                    idx = frames = None
                except Exception as exc:  # noqa: BLE001
                    err = f"decode_error:{type(exc).__name__}"
                    idx = frames = None
                out["media_id"].append(media_id)
                out["fmt"].append(fmt)
                out["codec"].append(codec)
                out["w"].append(w)
                out["h"].append(h)
                out["fps"].append(fps)
                out["n_frames"].append(n_frames)
                out["sampled_idx"].append(idx)
                out["frames"].append(frames)
                out["motion"].append(motion)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return run


def video_frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling over opaque ``binary`` clips. Real decode
    for AVI containers carrying MJPG (per-frame baseline JPEG, incl.
    DHT-less camera streams — Annex K.3 defaults injected) or
    uncompressed DIB frames, and (r7) MP4/ISO-BMFF containers carrying
    'jpeg' Motion-JPEG sample entries (functions/mp4.py); compressed
    codecs (avc1/hvc1/...) stay honest per-row ``codec_unavailable``
    errors (the r1-r5 stub contract, now the exception rather than
    the rule)."""
    return media.select("media_id", "bytes", "fmt").mapInPandas(
        video_frame_sample_batches(every_n), schema=VIDEO_FRAMES_SCHEMA
    )


def phash_near_pairs(images: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Perceptual-hash near-dup pairs via the pigeonhole banding shared
    with SimHash (dedup.simhash_pairs_from_sigs): n_bands =
    max_hamming+1 contiguous bands guarantee every within-distance pair
    shares a band key (round 1 hard-coded 4 bands — silent recall loss
    for hamming > 3)."""
    from bisque_spark.operators.dedup import simhash_pairs_from_sigs

    sig = images.select(
        F.col("image_id").alias("img"), F.col("phash").alias("simhash")
    )
    return simhash_pairs_from_sigs(
        sig, "img", max_hamming=max_hamming
    ).select(
        F.col("id_a"), F.col("id_b"), F.col("hamming")
    )
