"""Pure-Python baseline JPEG codec (numpy) for the multimodal path.

Closes the last image-decode gap named in round-4 review: baseline
(sequential DCT, SOF0) JPEG decodes natively -- Huffman entropy
decode, dequantize, 8x8 IDCT, chroma upsampling, YCbCr->RGB --
covering grayscale and 3-component JFIF images at any sampling factor
(4:4:4 / 4:2:2 / 4:2:0), with restart-marker support.  Progressive
(SOF2) decodes too: multi-scan spectral selection and successive
approximation (DC refinement bits, AC EOB-run correction-bit
interleaving per T.81 G.1.2) accumulate into coefficient planes that
IDCT once at EOI.  Arithmetic-coded, hierarchical, and lossless
JPEGs raise with the missing piece named.

The encoder is a fixture/test helper: standard Annex K tables scaled
by a quality factor, 4:4:4, no subsampling tricks -- every conforming
decoder reads it back within quantization error, and a
constant-per-block image at quality 100 round-trips bit-exactly
(quant steps are 1 and all AC coefficients are exactly zero).

Decode cost is O(pixels) with a per-block Python loop over numpy
8x8 math -- fine for the thumbnail-scale blobs a fingerprint pass
touches (heavy decode at 100 TB belongs on a codec library; this
keeps the dataflow real end-to-end).

Reference semantics: ITU-T T.81 (the JPEG spec) + JFIF colorspace;
no reference-repo counterpart (rsoup has no media codecs).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II basis: _C[k, n] = s(k) * cos((2n+1) k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16)

# Annex K quantization tables (luminance, chrominance)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99,
], dtype=np.int64)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], values)
_HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_huffman_codes(bits, values):
    """JPEG canonical code assignment: (code, length) per symbol."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffmanTree:
    """Decode table: (length, code) -> symbol, max 16-bit codes."""

    def __init__(self, bits, values):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad JPEG Huffman code")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; stops at any non-stuffed marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError("unconsumed restart marker")
                else:
                    raise ValueError("marker inside entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_restart(self) -> None:
        """Skip to just past the next RSTn marker."""
        self.nbits = 0
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> uint8 (h, w) grayscale
    or (h, w, 3) RGB.

    Raises NotImplementedError for arithmetic-coded/12-bit/lossless
    streams (the missing piece named), ValueError for malformed data
    (truncation anywhere in the stream is normalized to ValueError so
    callers get one quarantine-able error class).
    """
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error, StopIteration) as e:
        raise ValueError(f"malformed JPEG ({type(e).__name__})") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffmanTree] = {}
    huff_ac: dict[int, _HuffmanTree] = {}
    frame = None
    restart_interval = 0
    coefs = None  # progressive: per-component zigzag coefficients
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected JPEG marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    qt[tq] = np.array(
                        struct.unpack(">64H", seg[p:p + 128]), np.int64
                    )
                    p += 128
                else:
                    qt[tq] = np.frombuffer(
                        seg, np.uint8, 64, p
                    ).astype(np.int64)
                    p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                tree = _HuffmanTree(bits, values)
                (huff_ac if tc else huff_dc)[th] = tree
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -- entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], \
                seg[3 + 2 * ns]
            if frame["progressive"]:
                # T.81 scan-header constraints: DC scans span exactly
                # [0, 0]; AC scans are single-component inside [1, 63]
                if (ss == 0) != (se == 0) or se > 63 or \
                        (ss > 0 and ns != 1):
                    raise ValueError("malformed progressive scan header")
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                scan = []
                for i in range(ns):
                    cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                    ci = next(j for j, c in enumerate(frame["comps"])
                              if c["id"] == cs)
                    scan.append((
                        ci, frame["comps"][ci],
                        huff_dc.get(tdta >> 4) if ss == 0 else None,
                        huff_ac.get(tdta & 15) if ss > 0 else None,
                    ))
                pos = _progressive_scan(
                    data, pos + seglen, frame, scan, ss, se,
                    ahl >> 4, ahl & 15, restart_interval, coefs
                )
                continue
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append(
                    (comp, huff_dc[tdta >> 4], huff_ac[tdta & 15])
                )
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qt, restart_interval
            )
        pos += seglen
    if coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("JPEG without SOS scan")


def _decode_scan(data, pos, frame, scan, qt, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, dct, act) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int64)
                        t = dct.decode(reader)
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = act.decode(reader)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, np.int64)
                        block[_ZZ] = zz * qt[comp["tq"]]
                        coef = block.reshape(8, 8).astype(np.float64)
                        pix = _C.T @ coef @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    return _assemble_planes(comps, planes, h, w, hmax, vmax)


def _assemble_planes(comps, planes, h, w, hmax, vmax):
    """Upsample subsampled planes, crop to the frame, convert
    YCbCr->RGB (shared by the baseline and progressive paths)."""
    out_planes = []
    for c, plane in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1
            )
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(
            np.round(out_planes[0]), 0, 255
        ).astype(np.uint8)
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- progressive (SOF2) decode ---------------------------------------------

def _alloc_coefs(frame):
    """Zigzag-order coefficient planes, one (blocks_y, blocks_x, 64)
    array per component, sized to the MCU-padded grid so interleaved
    DC scans and non-interleaved AC scans index the same storage."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
        for c in frame["comps"]
    ]


def _block_order(frame, scan):
    """Yield (comp_index_in_scan, by, bx) in the spec's data ordering:
    MCU-interleaved when the scan has several components, component
    raster over the non-padded block grid when it has one.  One yield
    group per restart unit (MCU or single block)."""
    if len(scan) > 1:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                unit = []
                for si, (ci, comp, *_t) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            unit.append((
                                si,
                                my * comp["v"] + by,
                                mx * comp["h"] + bx,
                            ))
                yield unit
    else:
        _, comp, *_t = scan[0]
        cw = -(-(frame["w"] * comp["h"]) // frame["hmax"])
        ch = -(-(frame["h"] * comp["v"]) // frame["vmax"])
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield [(0, by, bx)]


def _progressive_scan(data, pos, frame, scan, ss, se, ah, al,
                      restart_interval, coefs):
    """Decode one progressive SOS into the coefficient planes and
    return the stream position after its entropy data.

    DC scans (ss == 0) may be interleaved; first pass (ah == 0) codes
    DC diffs at precision ``al``, refinement appends one bit per
    block.  AC scans are single-component with EOB-run coding; the
    refinement pass follows T.81 G.1.2.3: correction bits for
    already-nonzero coefficients interleave with the run walk.
    """
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    eobrun = 0
    unit_count = 0
    for unit in _block_order(frame, scan):
        if restart_interval and unit_count and \
                unit_count % restart_interval == 0:
            reader.align_to_restart()
            pred = [0] * len(scan)
            eobrun = 0
        unit_count += 1
        for si, by, bx in unit:
            ci = scan[si][0]
            block = coefs[ci][by, bx]
            if ss == 0:
                dct = scan[si][2]
                if ah == 0:
                    t = dct.decode(reader)
                    pred[si] += _extend(reader.receive(t), t)
                    block[0] = pred[si] << al
                elif reader.bit():
                    block[0] |= 1 << al
                continue
            act = scan[si][3]
            if ah == 0:
                # AC first pass
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = act.decode(reader)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC overflow")
                    block[k] = _extend(reader.receive(s), s) << al
                    k += 1
                continue
            # AC refinement pass (T.81 G.1.2.3 / libjpeg structure)
            p1, m1 = 1 << al, -1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = act.decode(reader)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "bad refinement magnitude")
                        val = p1 if reader.bit() else m1
                    while k <= se:
                        if block[k] != 0:
                            if reader.bit() and not (block[k] & p1):
                                block[k] += p1 if block[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= se:
                        block[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if block[k] != 0:
                        if reader.bit() and not (block[k] & p1):
                            block[k] += p1 if block[k] > 0 else m1
                    k += 1
                eobrun -= 1
    # skip to the next marker (any partial byte is padding)
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] != 0x00
        and not 0xD0 <= data[p + 1] <= 0xD7
    ):
        p += 1
    return p


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT every accumulated block (vectorized per
    component) and assemble exactly like the baseline path."""
    planes = []
    for c, zz in zip(frame["comps"], coefs):
        nat = np.zeros_like(zz, np.float64)
        nat[:, :, _ZZ] = zz * qt[c["tq"]]
        by, bx = zz.shape[:2]
        blocks = nat.reshape(by, bx, 8, 8)
        pix = np.einsum("mk,yxmn,nl->yxkl", _C, blocks, _C) + 128.0
        planes.append(
            pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _assemble_planes(
        frame["comps"], planes, frame["h"], frame["w"],
        frame["hmax"], frame["vmax"]
    )


# -- encoder (fixture/test helper) ----------------------------------------

def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling; quality 100 -> all-ones tables."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (size, raw bits) per T.81."""
    if v == 0:
        return 0, 0
    n = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << n) - 1
    return n, raw


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JFIF JPEG
    (Annex K tables scaled by ``quality``).  ``subsample=True`` emits
    4:2:0 chroma (box-averaged, 16x16 MCUs) like most web JPEGs;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs -- both exist mainly to exercise the decoder's MCU,
    upsampling, and restart paths from tests."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        subsample = False
        planes = [a - 128.0]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]
    qts = [_scale_q(_Q_LUM, quality)]
    if not gray:
        qts.append(_scale_q(_Q_CHR, quality))
    nc = 1 if gray else 3
    # per-component sampling factors
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * nc
    hmax = max(s[0] for s in samp[:nc])
    vmax = max(s[1] for s in samp[:nc])
    if subsample:
        # box-average chroma down to half resolution
        for ci in (1, 2):
            p = planes[ci]
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2
            pp = np.empty((ph, pw))
            pp[:h, :w] = p
            pp[h:, :w] = p[-1:, :]
            pp[:, w:] = pp[:, w - 1:w]
            planes[ci] = (
                pp[0::2, 0::2] + pp[1::2, 0::2]
                + pp[0::2, 1::2] + pp[1::2, 1::2]
            ) / 4.0

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(x) for x in q)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        out += bytes([
            i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1,
        ])
    tables = [(_HT_DC_LUM, 0x00), (_HT_AC_LUM, 0x10)]
    if not gray:
        tables += [(_HT_DC_CHR, 0x01), (_HT_AC_CHR, 0x11)]
    for (bits, values), tc_th in tables:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(values), tc_th
        ) + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_lum = _build_huffman_codes(*_HT_DC_LUM)
    ac_lum = _build_huffman_codes(*_HT_AC_LUM)
    dc_chr = _build_huffman_codes(*_HT_DC_CHR)
    ac_chr = _build_huffman_codes(*_HT_AC_CHR)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci in range(nc):
        p = planes[ci]
        ch, cw = mcuy * samp[ci][1] * 8, mcux * samp[ci][0] * 8
        pp = np.empty((ch, cw))
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[-1:, :]
        pp[:, pw:] = pp[:, pw - 1:pw]
        padded.append(pp)

    bw = _BitWriter()

    def put_block(block, q, dc_codes, ac_codes, pred_dc):
        coef = _C @ block @ _C.T
        zz = np.round(coef.reshape(64)[_ZZ] / q).astype(np.int64)
        diff = int(zz[0]) - pred_dc
        n, raw = _magnitude(diff)
        code, length = dc_codes[n]
        bw.put(code, length)
        if n:
            bw.put(raw, n)
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) \
            else 0
        k = 1
        while k <= last_nz:
            run = 0
            while zz[k] == 0:
                run += 1
                k += 1
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            n, raw = _magnitude(int(zz[k]))
            code, length = ac_codes[(run << 4) | n]
            bw.put(code, length)
            bw.put(raw, n)
            k += 1
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            bw.put(code, length)
        return int(zz[0])

    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                sh, sv = samp[ci]
                q = qts[0 if ci == 0 else 1]
                dc_codes = dc_lum if ci == 0 else dc_chr
                ac_codes = ac_lum if ci == 0 else ac_chr
                for byy in range(sv):
                    for bxx in range(sh):
                        y0 = (my * sv + byy) * 8
                        x0 = (mx * sh + bxx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = put_block(
                            block, q, dc_codes, ac_codes, pred[ci]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 90,
                            successive: bool = False) -> bytes:
    """uint8 gray or RGB -> progressive (SOF2) JPEG, 4:4:4, Annex K
    tables (fixture/test helper for the progressive decode path).

    Scan script: one interleaved DC scan, then one full AC scan
    (Ss=1..63) per component.  With ``successive=True`` every scan is
    split into a coarse pass at Al=1 plus a refinement pass (Ah=1,
    Al=0), exercising the successive-approximation decoder: DC
    refinement bits, AC EOB-run correction bits, and newly-nonzero
    insertion.  Quantized coefficients are identical to
    :func:`encode_jpeg`'s at the same quality, so progressive and
    baseline decodes of the same input are pixel-identical.
    """
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a - 128.0]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nc = len(planes)
    qts = [_scale_q(_Q_LUM, quality)]
    if not gray:
        qts.append(_scale_q(_Q_CHR, quality))

    # quantized zigzag coefficients per component, (by, bx, 64)
    bh, bw_ = -(-h // 8), -(-w // 8)
    zzs = []
    for ci in range(nc):
        pp = np.empty((bh * 8, bw_ * 8))
        pp[:h, :w] = planes[ci]
        pp[h:, :w] = planes[ci][-1:, :]
        pp[:, w:] = pp[:, w - 1:w]
        # per-block matmul in the baseline encoder's exact float
        # order, so quantized coefficients -- and therefore decoded
        # pixels -- are identical between the two encoders
        q = qts[0 if ci == 0 else 1]
        zz = np.empty((bh, bw_, 64), np.int64)
        for by in range(bh):
            for bx in range(bw_):
                block = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _C @ block @ _C.T
                zz[by, bx] = np.round(
                    coef.reshape(64)[_ZZ] / q
                ).astype(np.int64)
        zzs.append(zz)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(x) for x in q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    tables = [(_HT_DC_LUM, 0x00), (_HT_AC_LUM, 0x10)]
    if not gray:
        tables += [(_HT_DC_CHR, 0x01), (_HT_AC_CHR, 0x11)]
    for (bits, values), tc_th in tables:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(values), tc_th
        ) + bytes(bits) + bytes(values)

    dc_codes = [_build_huffman_codes(*(_HT_DC_LUM if i == 0
                                       else _HT_DC_CHR))
                for i in range(nc)]
    ac_codes = [_build_huffman_codes(*(_HT_AC_LUM if i == 0
                                       else _HT_AC_CHR))
                for i in range(nc)]

    def sos_header(comp_ids, tds, tas, ss, se, ah, al):
        seg = bytearray(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids),
                                      len(comp_ids))
        )
        for cid, td, ta in zip(comp_ids, tds, tas):
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    def dc_first(al):
        bw = _BitWriter()
        pred = [0] * nc
        for by in range(bh):
            for bx in range(bw_):
                for ci in range(nc):
                    v = int(zzs[ci][by, bx, 0]) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    n, raw = _magnitude(diff)
                    code, length = dc_codes[ci][n]
                    bw.put(code, length)
                    if n:
                        bw.put(raw, n)
        bw.flush()
        return bytes(bw.out)

    def dc_refine(al):
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                for ci in range(nc):
                    bw.put((int(zzs[ci][by, bx, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_first(ci, al):
        """Al-truncated magnitudes, per-block EOB (no run
        accumulation -- EOB0 is spec-valid and simplest)."""
        bw = _BitWriter()
        codes = ac_codes[ci]
        for by in range(bh):
            for bx in range(bw_):
                zz = zzs[ci][by, bx]
                vals = np.sign(zz) * (np.abs(zz) >> al)
                nz = np.nonzero(vals[1:])[0]
                last = (int(nz[-1]) + 1) if len(nz) else 0
                k, run = 1, 0
                while k <= last:
                    if vals[k] == 0:
                        run += 1
                        k += 1
                        continue
                    while run > 15:
                        code, length = codes[0xF0]
                        bw.put(code, length)
                        run -= 16
                    n, raw = _magnitude(int(vals[k]))
                    code, length = codes[(run << 4) | n]
                    bw.put(code, length)
                    bw.put(raw, n)
                    run = 0
                    k += 1
                if last < 63:
                    code, length = codes[0x00]  # EOB (run of 1)
                    bw.put(code, length)
        bw.flush()
        return bytes(bw.out)

    def ac_refine(ci, ah, al):
        """Correction-bit pass: history = |coef| >> ah, target adds
        bit al.  Bit order mirrors the decoder's walk: symbol, sign,
        then correction bits of crossed nonzero-history positions;
        EOB0 flushes the block's remaining correction bits."""
        bw = _BitWriter()
        codes = ac_codes[ci]
        for by in range(bh):
            for bx in range(bw_):
                zz = zzs[ci][by, bx]
                absv = np.abs(zz)
                hist = absv >> ah
                newly = [int(k) for k in range(1, 64)
                         if hist[k] == 0 and (absv[k] >> al)]
                k = 1
                for nk in newly:
                    run, pend = 0, []
                    while k < nk:
                        if hist[k]:
                            pend.append((int(absv[k]) >> al) & 1)
                        else:
                            if run == 15:
                                code, length = codes[0xF0]
                                bw.put(code, length)
                                for bit in pend:
                                    bw.put(bit, 1)
                                pend, run = [], 0
                            else:
                                run += 1
                        k += 1
                    code, length = codes[(run << 4) | 1]
                    bw.put(code, length)
                    bw.put(1 if zz[nk] > 0 else 0, 1)
                    for bit in pend:
                        bw.put(bit, 1)
                    k = nk + 1
                # EOB0 + corrections for the rest of the block
                if k <= 63:
                    code, length = codes[0x00]
                    bw.put(code, length)
                    for kk in range(k, 64):
                        if hist[kk]:
                            bw.put((int(absv[kk]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    ids = list(range(1, nc + 1))
    tds = [0 if i == 0 else 1 for i in range(nc)]
    if successive:
        out += sos_header(ids, tds, [0] * nc, 0, 0, 0, 1) + dc_first(1)
        for ci in range(nc):
            ta = 0 if ci == 0 else 1
            out += sos_header([ci + 1], [0], [ta], 1, 63, 0, 1)
            out += ac_first(ci, 1)
        out += sos_header(ids, [0] * nc, [0] * nc, 0, 0, 1, 0)
        out += dc_refine(0)
        for ci in range(nc):
            ta = 0 if ci == 0 else 1
            out += sos_header([ci + 1], [0], [ta], 1, 63, 1, 0)
            out += ac_refine(ci, 1, 0)
    else:
        out += sos_header(ids, tds, [0] * nc, 0, 0, 0, 0) + dc_first(0)
        for ci in range(nc):
            ta = 0 if ci == 0 else 1
            out += sos_header([ci + 1], [0], [ta], 1, 63, 0, 0)
            out += ac_first(ci, 0)
    out += b"\xff\xd9"
    return bytes(out)
