"""Pure-Python GIF codec (LZW + numpy) for the multimodal path.

GIF is the one *animated* format this container can decode natively --
LZW is plain bit algebra, no DSP -- so the frame-sampling path gets a
real end-to-end decode: ``decode_gif`` returns every composited frame
with its presentation delay, honoring local/global color tables,
interlacing, transparency, and disposal methods 0-3.

The encoder is a fixture/test helper: it writes spec-valid LZW in
"literal mode" (a Clear code before the table can grow past the
initial code width), which every conforming decoder -- including this
one -- reads back bit-exactly.

Reference semantics: GIF89a specification (W3C); no reference-repo
counterpart (the rsoup reference has no media codecs).
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_errors import normalize_decode_errors

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes,
                max_pixels: int) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, Clear/End codes,
    code width grows to 12 bits when the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    big = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    bitpos = 0
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    out: list[int] = []
    while bitpos + code_size <= total_bits:
        code = (big >> bitpos) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= max_pixels:
            break
    return out


def _lzw_encode_literal(min_code_size: int,
                        indices: np.ndarray) -> bytes:
    """Spec-valid LZW stream that never grows the code width: every
    index is emitted as its literal code, with a Clear code re-issued
    before the decoder's table could reach 2^(min_code_size+1)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    since_clear = 0
    for v in indices.ravel().tolist():
        if since_clear >= clear - 2:
            emit(clear)
            since_clear = 0
        emit(int(v))
        since_clear += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _read_color_table(data: bytes, pos: int, n: int):
    table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
    return table, pos + n * 3


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        parts.append(data[pos:pos + size])
        pos += size


@normalize_decode_errors("GIF")
def decode_gif(data: bytes) -> list[tuple[np.ndarray, int]]:
    """GIF bytes -> [(frame RGBA uint8 (h, w, 4), delay_ms), ...].

    Each frame is the fully composited canvas at that point of the
    animation (RGBA; alpha 0 = never-painted/disposed-to-background).
    Honors per-frame local color tables, interlacing, the transparent
    index, and disposal methods 0-3.
    """
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    w, h, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 7))

    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    frames: list[tuple[np.ndarray, int]] = []
    # pending graphic-control state for the next image
    transparent = -1
    delay_ms = 0
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", payload[:4]
                )
                disposal = (gflags >> 2) & 7
                transparent = tidx if (gflags & 1) else -1
                delay_ms = delay_cs * 10
            continue
        if block != 0x2C:  # image descriptor is all that remains
            raise ValueError(f"bad GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (iflags & 7))
        if table is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = np.array(
            _lzw_decode(min_code, lzw, iw * ih), dtype=np.int64
        )
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data truncated")
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n = len(range(start, ih, step))
                deinter[start::step] = idx[src:src + n]
                src += n
            idx = deinter
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF color index out of range")

        before = canvas.copy() if disposal == 3 else None
        region = canvas[iy:iy + ih, ix:ix + iw]
        rgba = np.dstack([
            table[idx], np.full((ih, iw), 255, np.uint8)
        ])
        paint = (
            idx != transparent if transparent >= 0
            else np.ones((ih, iw), dtype=bool)
        )
        region[paint] = rgba[paint]
        frames.append((canvas.copy(), delay_ms))
        if disposal == 2:  # restore to background = transparent
            canvas[iy:iy + ih, ix:ix + iw] = 0
        elif disposal == 3 and before is not None:
            canvas = before
        transparent = -1
        delay_ms = 0
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


def decode_gif_first(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 4) RGBA."""
    return decode_gif(data)[0][0]


def encode_gif(frames, palette: np.ndarray, delays_ms=None,
               transparent: int = -1, disposals=None) -> bytes:
    """Fixture/test encoder: list of (h, w) uint8 index arrays (all
    full-canvas) + one (n, 3) global palette -> animated GIF89a.
    ``delays_ms`` are rounded down to centiseconds per the format."""
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    n = len(pal)
    size_field = max(1, int(n - 1).bit_length() - 1) if n > 2 else 0
    table_n = 2 << size_field
    if table_n < n:
        size_field += 1
        table_n = 2 << size_field
    h, w = np.asarray(frames[0]).shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes() + b"\x00" * ((table_n - n) * 3)
    min_code = max(2, size_field + 1)
    delays_ms = delays_ms or [0] * len(frames)
    disposals = disposals or [0] * len(frames)
    for idx, delay, disp in zip(frames, delays_ms, disposals):
        gflags = (disp & 7) << 2 | (1 if transparent >= 0 else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gflags, delay // 10, max(transparent, 0)
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        lzw = _lzw_encode_literal(
            min_code, np.ascontiguousarray(idx, dtype=np.uint8)
        )
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
