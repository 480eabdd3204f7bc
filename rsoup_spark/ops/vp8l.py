"""Pure-Python WebP-lossless (VP8L) codec for the multimodal path.

VP8L is pure entropy coding + integer pixel transforms -- no DSP --
so the third major web image family decodes natively: canonical
prefix codes (simple + code-length-coded), LZ77 backward references
with the 2-D distance neighborhood map, color cache, and all four
inverse transforms (predictor modes 0-13, color transform,
subtract-green, color indexing with sub-byte packing).  Lossy WebP
(VP8) needs a DCT codec library and raises, named.

The encoder is a fixture/test helper covering every decoder path it
can reach deterministically: literal coding under real Huffman codes,
run-length LZ77 (dist=1), an optional color cache, and each transform
individually.

Reference semantics: "WebP Lossless Bitstream Specification"
(Google, RFC-style public spec); no reference-repo counterpart
(rsoup has no media codecs).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from .codec_errors import normalize_decode_errors

WEBP_RIFF = b"RIFF"
WEBP_FORM = b"WEBP"

# code-length-code symbol order (spec section 6.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]

# distance neighborhood map: codes 1..120 -> (dx, dy) (spec 4.2.2)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _LsbReader:
    """LSB-first bit reader (VP8L bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _Prefix:
    """Canonical prefix code (DEFLATE length convention).  Decoding
    walks the code MSB-first while the stream itself is LSB-first --
    the VP8L arrangement."""

    def __init__(self, lengths: dict[int, int]):
        used = sorted((l, s) for s, l in lengths.items() if l > 0)
        if not used:
            raise ValueError("empty prefix code")
        self.lut: dict[tuple[int, int], int] = {}
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        prev_len = used[0][0]
        # completeness check via Kraft sum
        kraft = 0
        for length, sym in used:
            code <<= length - prev_len
            prev_len = length
            self.lut[(length, code)] = sym
            self.codes[sym] = (code, length)
            code += 1
            kraft += 1 << (15 - length) if length <= 15 else 0
        if len(used) == 1:
            # single-symbol code consumes zero bits
            self.single = used[0][1]
        else:
            self.single = None
            if kraft != 1 << 15:
                raise ValueError("incomplete prefix code")

    def decode(self, reader: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | reader.bits(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad VP8L prefix code")

    def put(self, writer: _LsbWriter, sym: int) -> None:
        if self.single is not None:
            return
        code, length = self.codes[sym]
        for i in range(length - 1, -1, -1):
            writer.bits((code >> i) & 1, 1)


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict:
    """Frequencies -> prefix-code lengths (package-merge-free heap
    Huffman; fixture inputs never approach the depth cap)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(freqs.items())
            if f > 0]
    heapq.heapify(heap)
    lengths = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    if max(lengths.values()) > max_len:
        raise ValueError("fixture code too deep")
    return lengths


# -- decoder -----------------------------------------------------------------

def _prefix_value(r: _LsbReader, prefix: int) -> int:
    """LZ77 length/distance prefix -> value (spec 4.2.1.1)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + r.bits(extra) + 1


def _read_prefix_code(r: _LsbReader, alphabet_size: int) -> _Prefix:
    if r.bits(1):  # simple code
        nsym = r.bits(1) + 1
        first8 = r.bits(1)
        s0 = r.bits(8 if first8 else 1)
        if nsym == 2:
            return _Prefix({s0: 1, r.bits(8): 1})
        return _Prefix({s0: 1})
    num_cl = r.bits(4) + 4
    cl_lens = {}
    for i in range(num_cl):
        ln = r.bits(3)
        if ln:
            cl_lens[_CLC_ORDER[i]] = ln
    cl = _Prefix(cl_lens)
    if r.bits(1):  # explicit symbol-count cap
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev = 8
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl.decode(r)
        if s < 16:
            if s:
                lengths[sym] = s
                prev = s
            sym += 1
        elif s == 16:
            rep = 3 + r.bits(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev
                sym += 1
        elif s == 17:
            sym += 3 + r.bits(3)
        else:
            sym += 11 + r.bits(7)
    return _Prefix(lengths)


def _read_group(r: _LsbReader, cache_size: int) -> list[_Prefix]:
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    return [_read_prefix_code(r, n) for n in sizes]


def _decode_pixels(r: _LsbReader, w: int, h: int, groups, meta,
                   meta_bits: int, cache_bits: int) -> np.ndarray:
    """Entropy-coded ARGB pixel stream -> (h, w) uint32."""
    n = w * h
    pix = np.zeros(n, np.uint32)
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    g = groups[0]
    while pos < n:
        x, y = pos % w, pos // w
        if meta is not None:
            g = groups[meta[y >> meta_bits, x >> meta_bits]]
        s = g[0].decode(r)
        if s < 256:
            red = g[1].decode(r)
            blue = g[2].decode(r)
            alpha = g[3].decode(r)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = p
            if cache_bits:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> shift] = p
            pos += 1
        elif s < 280:
            length = _prefix_value(r, s - 256)
            dcode = _prefix_value(r, g[4].decode(r))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                p = int(pix[pos - dist])
                pix[pos] = p
                if cache_bits:
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> shift] = p
                pos += 1
        else:
            if not cache_bits or s - 280 >= len(cache):
                raise ValueError("VP8L cache index without cache")
            pix[pos] = cache[s - 280]
            pos += 1
    return pix.reshape(h, w)


def _decode_subimage(r: _LsbReader, w: int, h: int) -> np.ndarray:
    """Transform / entropy sub-image: no transforms, optional cache,
    single-or-meta-free group set (spec: sub-images have no meta
    codes)."""
    cache_bits = r.bits(4) if r.bits(1) else 0
    groups = [_read_group(r, (1 << cache_bits) if cache_bits else 0)]
    return _decode_pixels(r, w, h, groups, None, 0, cache_bits)


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255


def _pack(a: int, r_: int, g: int, b: int) -> int:
    return (a << 24) | (r_ << 16) | (g << 8) | b


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    la, lr, lg, lb = _channels(L)
    ta, tr_, tg, tb = _channels(T)
    if mode == 5:
        ra, rr, rg, rb = _channels(TR)
        return _pack(
            _avg2(_avg2(la, ra), ta), _avg2(_avg2(lr, rr), tr_),
            _avg2(_avg2(lg, rg), tg), _avg2(_avg2(lb, rb), tb))
    ja, jr, jg, jb = _channels(TL)
    if mode == 6:
        return _pack(_avg2(la, ja), _avg2(lr, jr),
                     _avg2(lg, jg), _avg2(lb, jb))
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, tr_),
                     _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _pack(_avg2(ja, ta), _avg2(jr, tr_),
                     _avg2(jg, tg), _avg2(jb, tb))
    ra, rr, rg, rb = _channels(TR)
    if mode == 9:
        return _pack(_avg2(ta, ra), _avg2(tr_, rr),
                     _avg2(tg, rg), _avg2(tb, rb))
    if mode == 10:
        return _pack(
            _avg2(_avg2(la, ja), _avg2(ta, ra)),
            _avg2(_avg2(lr, jr), _avg2(tr_, rr)),
            _avg2(_avg2(lg, jg), _avg2(tg, rg)),
            _avg2(_avg2(lb, jb), _avg2(tb, rb)))
    if mode == 11:  # Select
        pa = la + ta - ja
        pr = lr + tr_ - jr
        pg = lg + tg - jg
        pb = lb + tb - jb
        dl = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        dt = abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb)
        return L if dl < dt else T
    if mode == 12:  # ClampAddSubtractFull
        return _pack(_clamp(la + ta - ja), _clamp(lr + tr_ - jr),
                     _clamp(lg + tg - jg), _clamp(lb + tb - jb))
    if mode == 13:  # ClampAddSubtractHalf
        def half(a, b):
            d = a - b
            return _clamp(a + (d // 2 if d >= 0 else -((-d) // 2)))
        return _pack(half(_avg2(la, ta), ja), half(_avg2(lr, tr_), jr),
                     half(_avg2(lg, tg), jg), half(_avg2(lb, tb), jb))
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _inv_predictor(img: np.ndarray, bb: int, sub: np.ndarray) -> None:
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(img[0, x - 1])  # L
            elif x == 0:
                pred = int(img[y - 1, 0])  # T
            else:
                mode = (int(sub[y >> bb, x >> bb]) >> 8) & 255
                L = int(img[y, x - 1])
                T = int(img[y - 1, x])
                TL = int(img[y - 1, x - 1])
                TR = int(img[y - 1, x + 1]) if x + 1 < w \
                    else int(img[y, 0])
                pred = _predict(mode, L, T, TL, TR)
            p = int(img[y, x])
            pa, pr, pg, pb = _channels(p)
            qa, qr, qg, qb = _channels(pred)
            img[y, x] = _pack((pa + qa) & 255, (pr + qr) & 255,
                              (pg + qg) & 255, (pb + qb) & 255)


def _ct_delta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5 (spec color-transform delta)."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, bb: int,
                         sub: np.ndarray) -> None:
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            te = int(sub[y >> bb, x >> bb])
            g2r = (te >> 0) & 255   # blue channel
            g2b = (te >> 8) & 255   # green channel
            r2b = (te >> 16) & 255  # red channel
            p = int(img[y, x])
            a, r_, g, b = _channels(p)
            r_ = (r_ + _ct_delta(g2r, g)) & 255
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r_)) & 255
            img[y, x] = _pack(a, r_, g, b)


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> uint8 (h, w, 4) RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    r = _LsbReader(payload[1:])
    w = r.bits(14) + 1
    h = r.bits(14) + 1
    r.bits(1)  # alpha-used hint
    if r.bits(3) != 0:
        raise ValueError("bad VP8L version")
    out_w = w
    transforms = []
    seen = set()
    while r.bits(1):
        t = r.bits(2)
        if t in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(t)
        if t in (0, 1):  # predictor / color transform
            bb = r.bits(3) + 2
            sub = _decode_subimage(
                r, -(-w // (1 << bb)), -(-h // (1 << bb)))
            transforms.append((t, bb, sub))
        elif t == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            psize = r.bits(8) + 1
            pal = _decode_subimage(r, psize, 1)[0]
            # palette entries are delta-coded component-wise
            acc = np.zeros(4, np.int64)
            entries = np.zeros(psize, np.uint32)
            for i in range(psize):
                a, r_, g, b = _channels(int(pal[i]))
                acc = (acc + (a, r_, g, b)) & 255
                entries[i] = _pack(*(int(v) for v in acc))
            wb = 3 if psize <= 2 else 2 if psize <= 4 else \
                1 if psize <= 16 else 0
            transforms.append((3, wb, entries, w))
            w = -(-w // (1 << wb))
    cache_bits = r.bits(4) if r.bits(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if r.bits(1):  # meta prefix codes
        meta_bits = r.bits(3) + 2
        eimg = _decode_subimage(
            r, -(-w // (1 << meta_bits)), -(-h // (1 << meta_bits)))
        meta = (((eimg >> 16) & 255) << 8 | ((eimg >> 8) & 255)) \
            .astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = [_read_group(r, cache_size) for _ in range(n_groups)]
    img = _decode_pixels(r, w, h, groups, meta, meta_bits, cache_bits)
    for tf in reversed(transforms):
        if tf[0] == 3:
            _, wb, entries, orig_w = tf
            if wb:
                bits_pp = 8 >> wb
                mask = (1 << bits_pp) - 1
                idx = np.empty((h, orig_w), np.int64)
                for x in range(orig_w):
                    packed = (img[:, x >> wb] >> 8) & 255
                    idx[:, x] = (packed >> ((x & ((1 << wb) - 1))
                                            * bits_pp)) & mask
            else:
                idx = ((img >> 8) & 255).astype(np.int64)
                orig_w = img.shape[1]
            if (idx >= len(entries)).any():
                raise ValueError("VP8L palette index out of range")
            img = entries[idx]
            w = orig_w
        elif tf[0] == 2:
            g = (img >> 8) & 255
            r_ = (((img >> 16) & 255) + g) & 255
            b = ((img & 255) + g) & 255
            img = (img & 0xFF00FF00) | (r_ << 16) | b
        elif tf[0] == 1:
            _inv_color_transform(img, tf[1], tf[2])
        else:
            _inv_predictor(img, tf[1], tf[2])
    rgba = np.empty((h, out_w, 4), np.uint8)
    rgba[:, :, 0] = (img >> 16) & 255
    rgba[:, :, 1] = (img >> 8) & 255
    rgba[:, :, 2] = img & 255
    rgba[:, :, 3] = (img >> 24) & 255
    return rgba


@normalize_decode_errors("WebP")
def decode_webp(data: bytes) -> np.ndarray:
    """WebP container bytes -> uint8 (h, w, 4) RGBA.  Lossless (VP8L)
    decodes natively; lossy VP8 / extended VP8X raise, named."""
    if data[:4] != WEBP_RIFF or data[8:12] != WEBP_FORM:
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP (VP8 DCT) needs a codec library "
                "(e.g. Pillow); only lossless VP8L decodes here")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP without image chunk")


# -- encoder (fixture/test helper) ------------------------------------------

def _length_to_prefix(v: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits, extra_value); inverse of
    _prefix_value."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    n = u.bit_length() - 1
    if u < (1 << n) + (1 << (n - 1)):
        return 2 * n, n - 1, u - (1 << n)
    return 2 * n + 1, n - 1, u - (1 << n) - (1 << (n - 1))


def _write_prefix_code(wtr: _LsbWriter, lengths: dict[int, int]):
    """Emit one prefix code (simple when possible, else
    code-length-coded with the explicit symbol-count cap) and return
    the _Prefix for symbol emission."""
    used = sorted(s for s, l in lengths.items() if l > 0)
    if 1 <= len(used) <= 2 and used[-1] <= 255:
        wtr.bits(1, 1)  # simple
        wtr.bits(len(used) - 1, 1)
        first8 = 0 if used[0] <= 1 else 1
        wtr.bits(first8, 1)
        wtr.bits(used[0], 8 if first8 else 1)
        if len(used) == 2:
            wtr.bits(used[1], 8)
        return _Prefix({s: 1 for s in used})
    wtr.bits(0, 1)  # normal
    # code-length symbol stream covering positions 0..max(used)
    stream: list[tuple[int, int, int]] = []  # (cl_sym, xbits, xval)
    pos = 0
    for s in used:
        gap = s - pos
        while gap >= 11:
            n = min(gap, 138)
            stream.append((18, 7, n - 11))
            gap -= n
        while gap >= 3:
            n = min(gap, 10)
            stream.append((17, 3, n - 3))
            gap -= n
        for _ in range(gap):
            stream.append((0, 0, 0))
        stream.append((lengths[s], 0, 0))
        pos = s + 1
    cl_freqs: dict[int, int] = {}
    for cs, _, _ in stream:
        cl_freqs[cs] = cl_freqs.get(cs, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, max_len=7)
    num_cl = max(4, max(_CLC_ORDER.index(s) for s in cl_lengths) + 1)
    wtr.bits(num_cl - 4, 4)
    for i in range(num_cl):
        wtr.bits(cl_lengths.get(_CLC_ORDER[i], 0), 3)
    cl = _Prefix(cl_lengths)
    # explicit cap = number of CL symbols emitted
    wtr.bits(1, 1)
    wtr.bits(7, 3)  # length_nbits = 16
    wtr.bits(len(stream) - 2, 16)
    for cs, xb, xv in stream:
        cl.put(wtr, cs)
        if xb:
            wtr.bits(xv, xb)
    return _Prefix(lengths)


def _tokenize(flat: np.ndarray, cache_bits: int,
              use_lz77: bool) -> list[tuple]:
    """Pixel stream -> tokens: ('lit', p) | ('run', length) |
    ('cache', slot).  Runs use distance 1 only (plain dist code 121);
    the cache mirrors the decoder's."""
    tokens: list[tuple] = []
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)
    shift = 32 - cache_bits if cache_bits else 0
    n = len(flat)
    i = 0
    while i < n:
        p = int(flat[i])
        if use_lz77 and i > 0 and p == int(flat[i - 1]):
            run = 1
            while i + run < n and int(flat[i + run]) == p and \
                    run < 4096:
                run += 1
            tokens.append(("run", run))
            if cache_bits:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> shift] = p
            i += run
            continue
        if cache_bits:
            slot = (0x1E35A7BD * p & 0xFFFFFFFF) >> shift
            if cache[slot] == p:
                tokens.append(("cache", slot))
                i += 1
                continue
            cache[slot] = p
        tokens.append(("lit", p))
        i += 1
    return tokens


def _write_image_data(wtr: _LsbWriter, flat: np.ndarray,
                      cache_bits: int, use_lz77: bool,
                      level0: bool = False) -> None:
    """Cache info + (level0: meta-prefix bit) + one prefix-code group
    + entropy-coded pixels (shared by sub-images -- cache_bits=0, no
    LZ77 -- and the main image)."""
    if cache_bits:
        wtr.bits(1, 1)
        wtr.bits(cache_bits, 4)
    else:
        wtr.bits(0, 1)
    if level0:
        wtr.bits(0, 1)  # no meta prefix codes
    tokens = _tokenize(flat, cache_bits, use_lz77)
    freqs = [dict() for _ in range(5)]

    def bump(fi, s):
        freqs[fi][s] = freqs[fi].get(s, 0) + 1

    for kind, v in tokens:
        if kind == "lit":
            bump(0, (v >> 8) & 255)
            bump(1, (v >> 16) & 255)
            bump(2, v & 255)
            bump(3, (v >> 24) & 255)
        elif kind == "run":
            bump(0, 256 + _length_to_prefix(v)[0])
            bump(4, _length_to_prefix(121)[0])
        else:
            bump(0, 280 + v)
    for fi, fallback in ((0, 0), (1, 0), (2, 0), (3, 255), (4, 0)):
        if not freqs[fi]:
            freqs[fi][fallback] = 1
    codes = [
        _write_prefix_code(wtr, _huffman_lengths(freqs[i]))
        for i in range(5)
    ]
    for kind, v in tokens:
        if kind == "lit":
            codes[0].put(wtr, (v >> 8) & 255)
            codes[1].put(wtr, (v >> 16) & 255)
            codes[2].put(wtr, v & 255)
            codes[3].put(wtr, (v >> 24) & 255)
        elif kind == "run":
            pfx, xb, xv = _length_to_prefix(v)
            codes[0].put(wtr, 256 + pfx)
            if xb:
                wtr.bits(xv, xb)
            dpfx, dxb, dxv = _length_to_prefix(121)  # distance 1
            codes[4].put(wtr, dpfx)
            if dxb:
                wtr.bits(dxv, dxb)
        else:
            codes[0].put(wtr, 280 + v)


def _to_argb(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr, np.uint32)
    if a.ndim == 2:
        return (np.uint32(0xFF) << 24) | (a << 16) | (a << 8) | a
    if a.shape[2] == 3:
        alpha = np.full(a.shape[:2], 0xFF, np.uint32)
    else:
        alpha = a[:, :, 3]
    return (alpha << 24) | (a[:, :, 0] << 16) | (a[:, :, 1] << 8) \
        | a[:, :, 2]


def encode_vp8l(arr: np.ndarray, transform: str | None = None,
                cache_bits: int = 0, use_lz77: bool = True) -> bytes:
    """uint8 gray / RGB / RGBA -> lossless WebP bytes.

    ``transform``: None, 'subtract_green', 'predictor:<mode 0-13>',
    'color:<g2r>,<g2b>,<r2b>', or 'palette' (needs <= 256 distinct
    colors; indices pack sub-byte when <= 16).  One transform per
    fixture keeps each decoder path separately attributable.
    """
    img = _to_argb(arr)
    h, w = img.shape
    wtr = _LsbWriter()
    wtr.bits(0x2F, 8)
    wtr.bits(w - 1, 14)
    wtr.bits(h - 1, 14)
    wtr.bits(1 if arr.ndim == 3 and arr.shape[2] == 4 else 0, 1)
    wtr.bits(0, 3)  # version
    flat_w = w
    if transform == "subtract_green":
        wtr.bits(1, 1)
        wtr.bits(2, 2)
        g = (img >> 8) & 255
        r_ = (((img >> 16) & 255) - g) & 255
        b = ((img & 255) - g) & 255
        img = (img & 0xFF00FF00) | (r_ << 16) | b
    elif transform and transform.startswith("predictor:"):
        mode = int(transform.split(":")[1])
        bb = 9  # 512-px blocks; fixtures use one block
        wtr.bits(1, 1)
        wtr.bits(0, 2)
        wtr.bits(bb - 2, 3)
        sw, sh = -(-w // (1 << bb)), -(-h // (1 << bb))
        sub = np.full((sh, sw), 0xFF000000 | (mode << 8), np.uint32)
        _write_image_data(wtr, sub.ravel(), 0, False)
        res = np.empty_like(img)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(img[0, x - 1])
                elif x == 0:
                    pred = int(img[y - 1, 0])
                else:
                    tr_ = int(img[y - 1, x + 1]) if x + 1 < w \
                        else int(img[y, 0])
                    pred = _predict(mode, int(img[y, x - 1]),
                                    int(img[y - 1, x]),
                                    int(img[y - 1, x - 1]), tr_)
                pa, pr, pg, pb = _channels(int(img[y, x]))
                qa, qr, qg, qb = _channels(pred)
                res[y, x] = _pack((pa - qa) & 255, (pr - qr) & 255,
                                  (pg - qg) & 255, (pb - qb) & 255)
        img = res
    elif transform and transform.startswith("color:"):
        g2r, g2b, r2b = (int(v) & 255
                         for v in transform.split(":")[1].split(","))
        bb = 9
        wtr.bits(1, 1)
        wtr.bits(1, 2)
        wtr.bits(bb - 2, 3)
        sw, sh = -(-w // (1 << bb)), -(-h // (1 << bb))
        te = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        sub = np.full((sh, sw), te, np.uint32)
        _write_image_data(wtr, sub.ravel(), 0, False)
        res = np.empty_like(img)
        for y in range(h):
            for x in range(w):
                a, r_, g, b = _channels(int(img[y, x]))
                nr = (r_ - _ct_delta(g2r, g)) & 255
                nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r_)) & 255
                res[y, x] = _pack(a, nr, g, nb)
        img = res
    elif transform == "palette":
        colors = sorted(set(int(p) for p in img.ravel()))
        if len(colors) > 256:
            raise ValueError("palette fixture needs <= 256 colors")
        lut = {c: i for i, c in enumerate(colors)}
        psize = len(colors)
        wtr.bits(1, 1)
        wtr.bits(3, 2)
        wtr.bits(psize - 1, 8)
        deltas = np.zeros(psize, np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            pa, pr, pg, pb = _channels(c)
            qa, qr, qg, qb = _channels(prev)
            deltas[i] = _pack((pa - qa) & 255, (pr - qr) & 255,
                              (pg - qg) & 255, (pb - qb) & 255)
            prev = c
        _write_image_data(wtr, deltas, 0, False)
        wb = 3 if psize <= 2 else 2 if psize <= 4 else \
            1 if psize <= 16 else 0
        idx = np.vectorize(lut.get)(img.astype(np.int64))
        if wb:
            bits_pp = 8 >> wb
            flat_w = -(-w // (1 << wb))
            packed = np.zeros((h, flat_w), np.uint32)
            for x in range(w):
                packed[:, x >> wb] |= idx[:, x].astype(np.uint32) << (
                    (x & ((1 << wb) - 1)) * bits_pp)
            img = 0xFF000000 | (packed << 8)
        else:
            flat_w = w
            img = (0xFF000000 | (idx.astype(np.uint32) << 8))
    elif transform is not None:
        raise ValueError(f"unknown fixture transform {transform!r}")
    wtr.bits(0, 1)  # end of transforms
    _write_image_data(wtr, img.ravel(), cache_bits, use_lz77,
                      level0=True)
    payload = wtr.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
            + chunk)
