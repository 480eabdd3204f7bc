"""Pure-Python WAV (RIFF/PCM) codec for the multimodal audio path.

The audio counterpart of ``ops.png``/``ops.gif``/``ops.jpeg``: PCM
WAV is just RIFF framing + raw samples, so the container decodes it
natively and the audio leg of the media pipeline operates on real
samples instead of byte-hash fakes.  Supports 8-bit unsigned and
16/24/32-bit signed little-endian PCM plus 32-bit IEEE float, any
channel count; compressed formats (MP3/AAC/etc.) raise with the
missing piece named.

Reference semantics: RIFF WAVE format (Microsoft/IBM spec);
no reference-repo counterpart (rsoup has no media codecs).
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_errors import normalize_decode_errors

WAV_FMT_PCM = 1
WAV_FMT_FLOAT = 3


@normalize_decode_errors("WAV")
def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (samples (n, channels), rate, bits).

    Integer PCM is returned as int32 at its native signed range
    (8-bit unsigned is re-centered to signed -128..127), float PCM as
    float64; ``bits`` is the source sample width so callers know the
    full-scale magnitude (2^(bits-1)-1 for int, 1.0 for float).
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    tag, nch, rate, _byte_rate, _align, bits = fmt
    if tag == 0xFFFE and len(data) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        raise NotImplementedError(
            "WAVE_FORMAT_EXTENSIBLE (GUID subformat dispatch)"
        )
    if tag == WAV_FMT_FLOAT:
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit float WAV")
        samples = np.frombuffer(
            raw, "<f4", len(raw) // 4
        ).astype(np.float64)
    elif tag == WAV_FMT_PCM:
        if bits == 8:
            samples = (
                np.frombuffer(raw, np.uint8).astype(np.int32) - 128
            )
        elif bits == 16:
            samples = np.frombuffer(
                raw, "<i2", len(raw) // 2
            ).astype(np.int32)
        elif bits == 24:
            b = np.frombuffer(
                raw, np.uint8, len(raw) // 3 * 3
            ).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            samples = np.where(v >= 1 << 23, v - (1 << 24), v)
        elif bits == 32:
            samples = np.frombuffer(raw, "<i4", len(raw) // 4).copy()
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV")
    else:
        raise NotImplementedError(
            f"compressed WAV format tag {tag} (needs an audio codec)"
        )
    if nch < 1:
        raise ValueError("WAV with zero channels")
    n = len(samples) // nch * nch
    return samples[:n].reshape(-1, nch), rate, bits


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n,) or (n, channels) int samples -> PCM WAV bytes (8-bit
    unsigned or 16-bit signed little-endian)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    if bits == 16:
        body = np.clip(a, -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        body = np.clip(a + 128, 0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError("encoder supports 8/16-bit PCM only")
    block = nch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", WAV_FMT_PCM, nch, rate, rate * block, block, bits
    )
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
