"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch shape, partitioning, UDF
signatures) is real and tested, and so is the decode step for the
formats a pure Python + numpy codec can handle: PNG (``ops.png``),
GIF (``ops.gif``), baseline JPEG (``ops.jpeg``), PCM WAV
(``ops.wav``), and MJPEG-AVI / YUV4MPEG2 video (``ops.video``).
Formats that need DSP/entropy codec libraries this container does not
ship (WebP/AVIF images, compressed audio, inter-frame video codecs)
raise ``NotImplementedError`` behind the same dispatch; swapping in
Pillow/PyAV is a one-function change -- the dataflow does not move.

Scale notes: media bytes ride in ``binary`` columns bounded by
``arrow.maxBytesPerBatch``; feature extraction is ``mapInPandas`` so a
128 MB input split streams through the Python worker in byte-bounded
Arrow batches rather than materializing whole.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("data", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def decode_image(data: bytes) -> "np.ndarray":
    """Decode image bytes to a uint8/uint16 pixel array.

    The four dominant web image formats decode natively, pure
    Python + numpy:

    * PNG (``ops.png``): every static flavor -- bit depths 1-16,
      gray / palette(+tRNS) / RGB / gray+alpha / RGBA, none + Adam7;
    * GIF (``ops.gif``): full LZW, first composited frame (RGBA);
    * JPEG (``ops.jpeg``): baseline (Huffman + IDCT + 4:2:0/4:2:2
      upsampling + restart markers) and progressive (multi-scan
      spectral selection + successive approximation); arithmetic
      coding raises, named;
    * WebP lossless (``ops.vp8l``): prefix codes, LZ77 + color cache,
      all four transforms; lossy VP8 raises, named.

    Everything else (AVIF, lossy WebP) stays environment-gated --
    they need DSP codec libraries this container doesn't ship;
    swapping in Pillow is a one-function change, the dataflow doesn't
    move.
    """
    from .gif import GIF_MAGICS, decode_gif_first
    from .jpeg import decode_jpeg
    from .png import PNG_MAGIC, decode_png
    from .vp8l import decode_webp

    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:6] in GIF_MAGICS:
        return decode_gif_first(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return decode_webp(data)
    raise NotImplementedError(
        "non-PNG/GIF/JPEG/WebP-lossless image decoding requires a "
        "codec library (e.g. Pillow for AVIF); not available in this "
        "environment"
    )


def fake_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: dim floats derived from the
    sha256 of the payload, in [-1, 1].  Keeps the pipeline testable and
    reproducible without codecs."""
    digest = hashlib.sha256(data).digest()
    raw = np.frombuffer(digest[: 4 * dim], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**31 - 1.0).astype(np.float32).tolist()


def synth_media(spark: SparkSession, docs: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from a docs table: one fake
    image + one fake audio blob per doc (bytes from the doc id)."""
    base = docs.select(F.col(id_col).cast("string").alias("doc_id"))
    img = base.select(
        F.concat(F.col("doc_id"), F.lit("/img0")).alias("media_id"),
        "doc_id",
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.encode(F.concat(F.lit("PNGFAKE:"), F.col("doc_id")), "utf-8")
        .alias("data"),
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    aud = base.select(
        F.concat(F.col("doc_id"), F.lit("/aud0")).alias("media_id"),
        "doc_id",
        F.lit("audio").alias("kind"),
        F.lit("audio/wav").alias("mime"),
        F.encode(F.concat(F.lit("WAVFAKE:"), F.col("doc_id")), "utf-8")
        .alias("data"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(2000).alias("duration_ms"),
    )
    return img.unionByName(aud)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media -> (media_id, kind, n_bytes, feature[dim]).

    Arrow-batched; one pass; never materializes more than a batch of
    blobs in the Python worker.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in pdf["data"]],
                    "feature": [fake_feature(bytes(b), dim)
                                for b in pdf["data"]],
                }
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        run, FEATURE_SCHEMA
    )


FINGERPRINT_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("fp", LongType(), False),
    ]
)


def media_fingerprint(media: DataFrame) -> DataFrame:
    """media -> (media_id, kind, n_bytes, fp): ``fp`` is the first four
    bytes of sha256(data) as a little-endian uint32 -- the integer-exact
    surface of :func:`fake_feature` (``fake_feature(data)[0] ==
    float32(fp / 2**31 - 1)``), so the whole media dataflow is
    oracle-checkable without float comparisons.  Same Arrow-batched
    mapInPandas shape as :func:`extract_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = [bytes(b) for b in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in datas],
                    "fp": [
                        int.from_bytes(
                            hashlib.sha256(b).digest()[:4], "little"
                        )
                        for b in datas
                    ],
                }
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        run, FINGERPRINT_SCHEMA
    )


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        # integer ppm of the per-channel mean (mean/255 * 1e6, floor):
        # exact across engines, no float comparisons
        StructField("mean_ppm", ArrayType(LongType(), False), False),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Decode image blobs and emit per-channel pixel statistics --
    the first operator whose output depends on actual pixel values,
    proving the decode step participates in the Spark dataflow (same
    Arrow-batched mapInPandas shape as :func:`extract_features`).

    Non-decodable blobs (non-PNG, unsupported PNG flavors) are
    dropped; a production pipeline would route them to a quarantine
    sink instead of failing the batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                try:
                    img = decode_image(bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                if img.ndim == 2:
                    img = img[:, :, None]
                h, w, ch = img.shape
                maxv = 65535 if img.dtype == np.uint16 else 255
                sums = img.astype(np.int64).sum(axis=(0, 1))
                n = h * w
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "channels": ch,
                        "mean_ppm": [
                            int(s) * 1_000_000 // (n * maxv) for s in sums
                        ],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels",
                         "mean_ppm"],
            )

    return media.select("media_id", "data").mapInPandas(
        run, PIXEL_STATS_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        # per-channel mean of the RESIZED pixels, ppm (floor): the
        # gate-checkable proof the resample ran on real pixel values
        StructField("mean_ppm", ArrayType(LongType(), False), False),
        StructField("data", BinaryType(), True),
    ]
)


def resize_image(
    media: DataFrame,
    width: int,
    height: int,
    method: str = "nearest",
    reencode: bool = False,
) -> DataFrame:
    """Decode image blobs, resample to ``width`` x ``height``, and
    emit the resized dimensions plus per-channel mean (integer ppm)
    of the resampled pixels -- completing the multimodal pipeline's
    decode / feature-extract / resize / frame-sample quartet.  With
    ``reencode=True`` the resized image is also re-encoded to PNG in
    the ``data`` column (a real thumbnail transform); the default
    keeps bytes out of the output so stats-only consumers don't pay
    encode cost or shuffle blobs.

    ``method='nearest'``: index-picking (``src = floor(dst * n /
    n')``), works for any target size, up or down.  ``method='box'``:
    exact mean pooling for integer downscale factors -- the
    anti-aliasing choice for thumbnail pyramids; images whose
    dimensions are not integer multiples of the target are dropped
    like undecodable blobs (on a mixed-size crawl corpus one odd
    image must not fail the job).  Both are pure integer/numpy, so
    outputs replay exactly in an analytic oracle; no codec libraries.

    Same Arrow-batched ``mapInPandas`` shape as
    :func:`image_pixel_stats`: map-only, scan-parallel, byte-bounded
    batches, undecodable blobs dropped (quarantine-sink semantics).
    """
    if method not in ("nearest", "box"):
        raise ValueError(f"unknown resize method: {method}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rsoup_spark.ops.png import encode_png

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                try:
                    img = decode_image(bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                if img.ndim == 2:
                    img = img[:, :, None]
                h, w, ch = img.shape
                if method == "nearest":
                    iy = (np.arange(height) * h) // height
                    ix = (np.arange(width) * w) // width
                    out = img[iy][:, ix]
                else:  # box: exact mean pool, integer factors only
                    if h % height or w % width:
                        continue  # quarantine-drop, never job-fatal
                    fy, fx = h // height, w // width
                    out = (
                        img.reshape(height, fy, width, fx, ch)
                        .astype(np.int64)
                        .sum(axis=(1, 3))
                        // (fy * fx)
                    ).astype(img.dtype)
                maxv = 65535 if img.dtype == np.uint16 else 255
                sums = out.astype(np.int64).sum(axis=(0, 1))
                n = height * width
                rows.append(
                    {
                        "media_id": mid,
                        "width": width,
                        "height": height,
                        "channels": ch,
                        "mean_ppm": [
                            int(s) * 1_000_000 // (n * maxv) for s in sums
                        ],
                        "data": encode_png(out[:, :, 0] if ch == 1 else out)
                        if reencode
                        else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels",
                         "mean_ppm", "data"],
            )

    return media.select("media_id", "data").mapInPandas(run, RESIZE_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode PCM WAV blobs (``ops.wav``) and emit per-clip sample
    statistics: rate, sample/channel counts, integer duration, and the
    mean absolute amplitude in ppm of full scale -- the audio analogue
    of :func:`image_pixel_stats`, proving the decode step operates on
    real samples inside the Arrow-batched dataflow.  Undecodable or
    compressed blobs are dropped (quarantine-sink semantics)."""
    schema = StructType([
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("duration_ms", IntegerType(), False),
        StructField("mean_abs_ppm", LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import decode_wav

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                try:
                    samples, rate, bits = decode_wav(bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                n, nch = samples.shape
                if samples.dtype == np.float64:
                    total = float(np.abs(samples).sum())
                    ppm = int(total * 1_000_000 // (n * nch)) if n else 0
                else:
                    full = (1 << (bits - 1)) - 1
                    total = int(np.abs(samples.astype(np.int64)).sum())
                    ppm = total * 1_000_000 // (n * nch * full) if n \
                        else 0
                rows.append({
                    "media_id": mid,
                    "sample_rate": rate,
                    "n_samples": n,
                    "channels": nch,
                    "duration_ms": n * 1000 // rate if rate else 0,
                    "mean_abs_ppm": ppm,
                })
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples",
                         "channels", "duration_ms", "mean_abs_ppm"],
            )

    return media.select("media_id", "data").mapInPandas(run, schema)


def audio_features(media: DataFrame, window: int = 256) -> DataFrame:
    """Windowed audio feature extraction over decoded PCM samples --
    the DSP step a training pipeline runs after :func:`audio_stats`'
    whole-clip screen.  Per non-overlapping ``window``-sample window of
    the first channel: RMS level in ppm of full scale (floor), the
    zero-crossing count (strict sign flips), and the dominant
    spectral bin (argmax of the rFFT magnitude over bins
    ``1..window/2`` -- DC excluded, numpy FFT so the transform is
    vectorized per clip).  The trailing partial window is dropped.

    Integer outputs only, so results are exact across engines for
    quantization-exact signals (e.g. square waves).  Undecodable or
    compressed blobs are dropped (quarantine-sink semantics).
    """
    schema = StructType([
        StructField("media_id", StringType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("rms_ppm", LongType(), False),
        StructField("zero_crossings", IntegerType(), False),
        StructField("dom_bin", IntegerType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import decode_wav

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                try:
                    samples, rate, bits = decode_wav(bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                mono = samples[:, 0]
                if mono.dtype == np.float64:
                    x = mono
                    full = 1.0
                else:
                    x = mono.astype(np.float64)
                    full = float((1 << (bits - 1)) - 1)
                nwin = len(x) // window
                if nwin == 0:
                    continue
                w = x[: nwin * window].reshape(nwin, window)
                rms = np.sqrt((w * w).mean(axis=1))
                zc = (np.sign(w[:, 1:]) * np.sign(w[:, :-1]) < 0) \
                    .sum(axis=1)
                mag = np.abs(np.fft.rfft(w, axis=1))
                dom = mag[:, 1:].argmax(axis=1) + 1
                for k in range(nwin):
                    rows.append({
                        "media_id": mid,
                        "window_idx": k,
                        "rms_ppm": int(rms[k] * 1_000_000 // full),
                        "zero_crossings": int(zc[k]),
                        "dom_bin": int(dom[k]),
                    })
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "rms_ppm",
                         "zero_crossings", "dom_bin"],
            )

    return media.select("media_id", "data").mapInPandas(run, schema)


def gif_frame_stats(media: DataFrame) -> DataFrame:
    """Decode ANIMATED media (GIF -- the container's one natively
    decodable timed format, ``ops.gif``) and emit one row per
    composited frame: presentation start time (cumulative delays) and
    the integer mean over the RGB channels in ppm of full scale.
    This is the real counterpart of :func:`frame_sample_plan`: the
    plan says which timestamps to decode, this actually decodes them.

    Same Arrow-batched mapInPandas shape as the other media passes;
    non-GIF / undecodable blobs are dropped (quarantine-sink
    semantics), never fatal.
    """
    schema = StructType([
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_ms", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_rgb_ppm", LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import decode_gif

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                try:
                    frames = decode_gif(bytes(blob))
                except ValueError:
                    continue
                t = 0
                for k, (frame, delay) in enumerate(frames):
                    h, w = frame.shape[:2]
                    s = int(frame[:, :, :3].astype(np.int64).sum())
                    rows.append({
                        "media_id": mid,
                        "frame_idx": k,
                        "t_ms": t,
                        "width": w,
                        "height": h,
                        "mean_rgb_ppm": s * 1_000_000 // (h * w * 3 * 255),
                    })
                    t += delay
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "t_ms", "width",
                         "height", "mean_rgb_ppm"],
            )

    return media.select("media_id", "data").mapInPandas(run, schema)


def video_frame_stats(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Sample VIDEO clips at a fixed timestamp grid and decode the
    sampled frames for real (``ops.video``: MJPEG-AVI via the baseline
    JPEG codec, YUV4MPEG2 raw) -- the executed counterpart of
    :func:`frame_sample_plan`.  Sample timestamps are
    ``0, every_ms, 2*every_ms, ... < n_frames * frame_ms`` and each
    maps to the frame on screen at that instant
    (``frame_idx = t // frame_ms``); a frame needed by several samples
    is decoded once per clip.

    Same Arrow-batched mapInPandas shape as the other media passes;
    non-video / undecodable / inter-frame-codec blobs are dropped
    (quarantine-sink semantics), never fatal.  Per-clip cost is
    bounded by the clip's own frame count -- clips parallelize across
    Arrow batches exactly like images, so the 100 TB story is the
    scan's, not this operator's.
    """
    schema = StructType([
        StructField("media_id", StringType(), False),
        StructField("sample_at_ms", IntegerType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_ppm", LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .video import decode_video

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                try:
                    frame_ms, frames = decode_video(bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                if not frames:
                    continue
                stats: dict[int, tuple[int, int, int]] = {}
                duration = len(frames) * frame_ms
                for t in range(0, duration, every_ms):
                    idx = t // frame_ms
                    if idx not in stats:
                        fr = frames[idx]
                        if fr.ndim == 2:
                            fr = fr[:, :, None]
                        h, w, ch = fr.shape
                        s = int(fr.astype(np.int64).sum())
                        stats[idx] = (w, h,
                                      s * 1_000_000 // (h * w * ch * 255))
                    w, h, ppm = stats[idx]
                    rows.append({
                        "media_id": mid,
                        "sample_at_ms": t,
                        "frame_idx": idx,
                        "width": w,
                        "height": h,
                        "mean_ppm": ppm,
                    })
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_at_ms", "frame_idx",
                         "width", "height", "mean_ppm"],
            )

    return media.select("media_id", "data").mapInPandas(run, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: which timestamps to decode per clip
    -- pure relational (sequence + explode, no Python), so the grid can
    be joined/filtered before any decode happens.
    :func:`video_frame_stats` is the executing counterpart."""
    vids = media.where(F.col("duration_ms").isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("sample_at_ms"),
    )
