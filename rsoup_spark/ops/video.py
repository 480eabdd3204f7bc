"""Pure-Python video demux/decode for the multimodal path.

Two containers decode natively in this environment, completing the
frame-sampling story (plan -> real pixels) without codec libraries:

* **MJPEG-in-AVI** -- the classic RIFF container carrying one baseline
  JPEG per frame; the per-frame decode reuses ``ops.jpeg``.  This is
  the dominant "video without inter-frame prediction" web format and
  exercises a real chunked-container parse (RIFF LIST tree, word
  alignment, ``NNdc``/``NNdb`` stream chunks).
* **YUV4MPEG2 (y4m)** -- the standard uncompressed interchange format
  (mono/444 variants), covering the raw-frames path.

Inter-frame codecs (H.264/VP9/AV1) stay environment-gated: they need
entropy/DSP libraries this container does not ship; swapping in
PyAV/ffmpeg is a one-function change (``decode_video``), the Spark
dataflow does not move.

The muxers are fixture/test helpers (spec-valid minimal writers).

Reference semantics: AVI RIFF specification (Microsoft "AVI RIFF File
Reference"), YUV4MPEG2 header spec (mjpegtools); no reference-repo
counterpart (the rsoup reference has no media codecs).
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_errors import normalize_decode_errors

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_FORM = b"AVI "
Y4M_MAGIC = b"YUV4MPEG2 "


def is_avi(data: bytes) -> bool:
    return data[:4] == AVI_MAGIC_RIFF and data[8:12] == AVI_MAGIC_FORM


# -- muxers (fixture/test helpers) -----------------------------------------

def mux_avi_mjpeg(frames: list[bytes], width: int, height: int,
                  us_per_frame: int = 100_000) -> bytes:
    """JPEG frame payloads -> minimal spec-valid MJPEG AVI (one video
    stream, ``00dc`` chunks, idx1 index)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        us_per_frame,                     # dwMicroSecPerFrame
        max_bytes * 1_000_000 // max(us_per_frame, 1),  # dwMaxBytesPerSec
        0,                                # dwPaddingGranularity
        0x10,                             # dwFlags: AVIF_HASINDEX
        len(frames), 0, 1,                # totalframes/initial/streams
        max_bytes,                        # dwSuggestedBufferSize
        width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<10I4H",
        0, 0, 0,                          # flags/prio+lang/initialframes
        us_per_frame, 1_000_000,          # scale, rate -> fps
        0, len(frames),                   # start, length
        max_bytes, 0xFFFFFFFF, 0,         # bufsize, quality, samplesize
        0, 0, width, height,              # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(b"00dc", f) for f in frames]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the 'movi' fourcc
    idx, off = [], 4
    for f, ch in zip(frames, movi_chunks):
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(ch)
    body = AVI_MAGIC_FORM + hdrl + movi + chunk(b"idx1", b"".join(idx))
    return chunk(b"RIFF", body)


def mux_y4m(frames: list[np.ndarray], fps_num: int = 10,
            fps_den: int = 1) -> bytes:
    """(h, w) uint8 gray frames -> YUV4MPEG2 mono stream."""
    if not frames:
        raise ValueError("y4m needs at least one frame")
    h, w = frames[0].shape
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (
        w, h, fps_num, fps_den)
    out = bytearray(head)
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("y4m frames must share one geometry")
        out += b"FRAME\n"
        out += np.ascontiguousarray(f, dtype=np.uint8).tobytes()
    return bytes(out)


# -- demux / decode ---------------------------------------------------------

def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) honoring word
    alignment."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def demux_avi(data: bytes) -> tuple[int, list[bytes]]:
    """AVI bytes -> (us_per_frame, list of compressed frame payloads).

    Accepts any ``NNdc``/``NNdb`` stream chunks (compressed / DIB video
    data) inside the ``movi`` LIST, including nested ``rec `` groups.
    Raises ValueError on malformed containers and NotImplementedError
    for non-MJPEG/DIB video handlers so callers keep one
    quarantine-able error class per cause.
    """
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI container")
    us_per_frame = 0
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal us_per_frame
        for fourcc, body, size in _riff_chunks(data, start, end):
            if fourcc == b"LIST":
                kind = data[body:body + 4]
                if kind in (b"hdrl", b"movi", b"rec ", b"strl"):
                    walk(body + 4, body + size)
            elif fourcc == b"avih" and size >= 4:
                (us_per_frame,) = struct.unpack_from("<I", data, body)
            elif fourcc == b"strh" and size >= 8:
                if data[body:body + 4] == b"vids":
                    handler = data[body + 4:body + 8]
                    if handler not in (b"MJPG", b"mjpg",
                                       b"\x00\x00\x00\x00"):
                        raise NotImplementedError(
                            f"AVI video handler {handler!r} needs a codec "
                            "library (e.g. PyAV); only MJPEG decodes here")
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(data[body:body + size])

    walk(12, len(data))
    if us_per_frame <= 0:
        raise ValueError("AVI missing avih frame timing")
    return us_per_frame, frames


def demux_y4m(data: bytes) -> tuple[int, int, tuple[int, int], str,
                                    list[bytes]]:
    """y4m bytes -> (width, height, (fps_num, fps_den), colourspace,
    raw frame payloads)."""
    if data[:10] != Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("y4m missing header newline")
    w = h = 0
    fps = (0, 1)
    cs = "420jpeg"  # spec default
    for tok in data[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C":
            cs = val.decode("ascii")
    if w <= 0 or h <= 0 or fps[0] <= 0:
        raise ValueError("y4m header missing W/H/F")
    if cs == "mono":
        fsize = w * h
    elif cs in ("444", "444alpha"):
        fsize = w * h * (4 if cs == "444alpha" else 3)
    elif cs.startswith("420"):
        fsize = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    else:
        raise NotImplementedError(f"y4m colourspace {cs!r} unsupported")
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError("y4m frame marker missing")
        body = fnl + 1
        if body + fsize > len(data):
            raise ValueError("truncated y4m frame")
        frames.append(data[body:body + fsize])
        pos = body + fsize
    return w, h, fps, cs, frames


def _y4m_frame_to_rgb(raw: bytes, w: int, h: int, cs: str) -> np.ndarray:
    if cs == "mono":
        return np.frombuffer(raw, np.uint8).reshape(h, w)
    if cs in ("444", "444alpha"):
        y, u, v = (np.frombuffer(raw, np.uint8, w * h, w * h * i)
                   .reshape(h, w).astype(np.float64) for i in range(3))
    else:  # 420*
        cw, ch = (w + 1) // 2, (h + 1) // 2
        y = np.frombuffer(raw, np.uint8, w * h).reshape(h, w) \
            .astype(np.float64)
        u = np.frombuffer(raw, np.uint8, cw * ch, w * h) \
            .reshape(ch, cw).repeat(2, 0).repeat(2, 1)[:h, :w] \
            .astype(np.float64)
        v = np.frombuffer(raw, np.uint8, cw * ch, w * h + cw * ch) \
            .reshape(ch, cw).repeat(2, 0).repeat(2, 1)[:h, :w] \
            .astype(np.float64)
    # BT.601 full-range, same matrix as ops.jpeg's YCbCr path
    cb, cr = u - 128.0, v - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


@normalize_decode_errors("video")
def decode_video(data: bytes) -> tuple[int, list[np.ndarray]]:
    """Video bytes -> (frame_duration_ms, decoded frames as uint8
    arrays).  MJPEG-AVI and YUV4MPEG2 decode natively; anything else
    raises NotImplementedError (inter-frame codecs need PyAV/ffmpeg)."""
    if is_avi(data):
        from .jpeg import decode_jpeg

        us, payloads = demux_avi(data)
        return max(us // 1000, 1), [decode_jpeg(p) for p in payloads]
    if data[:10] == Y4M_MAGIC:
        w, h, (num, den), cs, payloads = demux_y4m(data)
        ms = max(1000 * den // num, 1)
        return ms, [_y4m_frame_to_rgb(p, w, h, cs) for p in payloads]
    raise NotImplementedError(
        "non-AVI/y4m video decoding requires a codec library "
        "(e.g. PyAV for H.264/VP9); not available in this environment")
