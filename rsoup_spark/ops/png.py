"""Pure-Python PNG codec (stdlib zlib + numpy) for the multimodal path.

No imaging library ships in this container, but PNG itself is just
zlib (stdlib) plus five per-scanline byte filters -- so 8-bit
gray / gray+alpha / RGB / RGBA PNGs decode natively and
``ops.multimodal.decode_image`` no longer needs to stub them.  The
remaining codec gaps (palette + 16-bit + Adam7 PNG, JPEG, video) stay
explicitly gated: they need real codec tables/DSP, not byte algebra.

Decode cost is O(bytes) with numpy-vectorized None/Sub/Up rows; the
sequential Average/Paeth filters fall back to a per-pixel loop, fine
for the thumbnail-scale blobs a training pipeline fingerprint pass
touches (heavy decode at 100 TB belongs on a codec library anyway --
this keeps the *dataflow* real end-to-end).

All arithmetic stays in int64: np.uint64 % python-int silently
promotes to float64 (see crawl/cuckoo.py for the same trap).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channels (3 = palette, unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_OF_CH = {1: 0, 2: 4, 3: 2, 4: 6}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for grayscale or (h, w, ch).

    Supports bit depth 8, color types 0/2/4/6, non-interlaced --
    i.e. every PNG this repo's encoder (or any standard encoder asked
    for 8-bit truecolor/gray) produces.  Raises NotImplementedError
    for palette/16-bit/Adam7 with the exact missing piece named.
    """
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat: list[bytes] = []
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG (only 8-bit)")
    if color not in _CHANNELS:
        raise NotImplementedError("palette PNG (PLTE indexing)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG scanline payload size mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int64)
        pos += stride
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-ch]
            # column-wise cumsum over pixels == the recurrence mod 256
            recon = np.cumsum(
                line.reshape(w, ch), axis=0, dtype=np.int64
            ).reshape(stride) % 256
        elif ftype == 2:  # Up
            recon = (line + prev) % 256
        elif ftype == 3:  # Average (sequential in x)
            recon = np.empty(stride, dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (line[s] + ((left + prev[s]) >> 1)) % 256
                recon[s] = left
        elif ftype == 4:  # Paeth (sequential in x)
            recon = np.empty(stride, dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            upleft = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s]
                p = left + up - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, upleft),
                )
                left = (line[s] + pred) % 256
                recon[s] = left
                upleft = up
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, ch in {1,2,3,4}) -> PNG bytes
    (8-bit, non-interlaced, filter None per row)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_OF_CH:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_OF_CH[ch], 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
