"""Pure-numpy JPEG codec (ITU-T T.81 / JFIF): baseline + progressive.

Decode supports the formats real corpora actually contain: baseline
sequential DCT (SOF0/1) and progressive DCT (SOF2, r5) — 8-bit
samples, gray / 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart
markers, 0xFF00 byte stuffing, multiple DQT/DHT segments, and for
progressive the full scan alphabet of T.81 G.1.2: spectral-selection
bands, successive-approximation DC/AC first and refinement passes,
interleaved DC scans, EOB runs (EOBn) and in-run correction bits.
Coefficients accumulate across every scan and the image is
reconstructed once at EOI.  Arithmetic coding, hierarchical mode and
12-bit depth reject loudly.

Encode emits baseline 4:4:4 (or grayscale) with the spec's Annex K
tables and a quality knob, or — with ``progressive=True`` — an SOF2
stream using libjpeg's standard simple-progression scan script with
OPTIMIZED per-scan huffman tables (T.81 K.2 two-least-frequent merge
with the 16-bit length limit), which exercises EOBn symbols Annex K
tables cannot express.  Both modes quantize identically, so decoding
a progressive encode is bit-identical to decoding the baseline
encode of the same image (pinned by test).

Everything here follows the PUBLIC spec; the entropy decode is a
Python bit loop (sequential by nature), while dequantize + IDCT +
color convert run whole-image in numpy (the IDCT is two 8x8 matrix
multiplies batched over every block with einsum).  Speed is fixture-
grade, not throughput-grade — production clusters plug libjpeg into
the same ``decode_media`` seam.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K (informative) tables — the de-facto standard set
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K huffman specs: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
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
     0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
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
     0xF9, 0xFA])

# 8-point DCT-II basis: _DCT_M[k, x] = c(k)/2 * cos((2x+1)k*pi/16)
_DCT_M = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.5) if _k == 0 else 1.0
    for _x in range(8):
        _DCT_M[_k, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _k *
                                           np.pi / 16)


# LUT memo keyed by table content: a 2^16-entry LUT costs ~10 ms to
# build, which DOMINATES decode of small images (the mm fixtures are
# 8x8-tile JPEGs, and real corpora overwhelmingly reuse the Annex K
# standard tables) — measured 2x on the mm_decode oracle pass.
# Bounded: real streams carry at most a handful of distinct tables.
_LUT_CACHE: dict = {}
_LUT_CACHE_MAX = 64


class _HuffTable:
    """Decode table: the (length, code) dict for the bit-by-bit tail
    path plus a flat 2^16 peek LUT — entry = (code_length << 8) |
    symbol, 0 = no code with that prefix — for the fast path (r6).
    Same codes, same symbols, just O(1) per symbol instead of walking
    code lengths one bit at a time.  The LUT is memoized on the table
    content, so repeated DHT segments (every image of a corpus using
    the standard tables) build it once per process."""

    __slots__ = ("codes", "lut")

    def __init__(self, codes: dict):
        self.codes = codes
        key = tuple(sorted(codes.items()))
        lut = _LUT_CACHE.get(key)
        if lut is None:
            lut = [0] * (1 << 16)
            for (ln, code), sym in codes.items():
                span = 1 << (16 - ln)
                base = code << (16 - ln)
                lut[base:base + span] = [(ln << 8) | sym] * span
            if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
                _LUT_CACHE.clear()
            _LUT_CACHE[key] = lut
        self.lut = lut

    def get(self, key):
        return self.codes.get(key)


def _build_huffman(bits, values):
    """(code -> (symbol, length)) decode table keyed by (length, code),
    built per T.81 C.2: codes assigned in increasing length order."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return _HuffTable(table)


def _encode_huffman(bits, values):
    """symbol -> (code, length) for the encoder."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing removal; stops at any real marker.

    r6 rewrite — same consumption semantics, orders of magnitude
    faster: (1) the accumulator keeps only UNCONSUMED bits (the old
    one grew by 8 bits per byte and never dropped consumed bits, so
    every fill shifted an ever-growing bigint — quadratic in segment
    size, the dominant cost of the whole decoder); (2) fills prefetch
    up to 16 bits, recording a marker/EOF encountered mid-prefetch as
    PENDING — nothing is consumed for it — and delivering (for RSTn:
    consuming) it only when a bit is actually needed, exactly when the
    on-demand reader would have hit it; (3) huffman decode peeks 16
    bits through the table's flat LUT instead of walking code lengths
    bit by bit.  Decoded values are bit-identical on every stream the
    old reader accepted."""

    __slots__ = ("data", "pos", "acc", "n", "_pending")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self._pending = None

    def _pull(self) -> bool:
        """Append one byte to the accumulator; a marker/EOF becomes
        pending (RSTn stays UNCONSUMED until delivered by bit())."""
        if self._pending is not None:
            return False
        d = self.data
        pos = self.pos
        if pos >= len(d):
            self._pending = IndexError("index out of range")
            return False
        b = d[pos]
        if b == 0xFF:
            if pos + 1 >= len(d):
                self._pending = IndexError("index out of range")
                return False
            nxt = d[pos + 1]
            if nxt == 0x00:
                self.pos = pos + 2
            elif 0xD0 <= nxt <= 0xD7:
                self._pending = _RestartMarker(nxt)
                return False
            else:
                self._pending = ValueError(
                    f"jpeg: marker 0xFF{nxt:02X} inside scan")
                return False
        else:
            self.pos = pos + 1
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | b
        self.n += 8
        return True

    def _raise_pending(self):
        exc = self._pending
        self._pending = None
        if isinstance(exc, _RestartMarker):
            self.pos += 2            # consume the RSTn on delivery
        raise exc

    def bit(self) -> int:
        if self.n == 0:
            if not self._pull():
                self._raise_pending()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        n = self.n
        while n < k and self._pull():
            n = self.n
        if n >= k:
            self.n = n - k
            return (self.acc >> self.n) & ((1 << k) - 1)
        # not enough bits before a marker/EOF: consume what is there,
        # then deliver the pending event exactly like the old reader
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        self.acc = 0
        self.n = 0
        self._pending = None   # unconsumed; re-seen from pos if real

    def decode(self, table) -> int:
        n = self.n
        while n < 16 and self._pull():
            n = self.n
        if n >= 16:
            e = table.lut[(self.acc >> (n - 16)) & 0xFFFF]
            if e == 0:
                raise ValueError("jpeg: invalid huffman code")
            self.n = n - (e >> 8)
            return e & 0xFF
        # tail of the stream: walk the dict bit by bit (may legally
        # finish within the remaining bits, or hit the pending event)
        code = 0
        codes = table.codes
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = codes.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG -> (h, w, 3) RGB
    uint8 (grayscale broadcasts).  Progressive accumulates DCT
    coefficients across every scan and reconstructs once at EOI."""
    d = bytes(payload)
    if d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> table
    frame = None
    progressive = False
    restart_interval = 0
    scanned = False
    while pos < len(d) - 1:
        if d[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        while d[pos + 1] == 0xFF:            # optional fill bytes
            pos += 1
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue             # standalone
        ln = struct.unpack_from(">H", d, pos)[0]
        seg = d[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i) \
                        .astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i) \
                        .astype(np.int64)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:     # DHT (redefinable between scans)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = _build_huffman(bits, values)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], \
                struct.unpack_from(">H", seg, 1)[0], \
                struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise ValueError(f"jpeg: {prec}-bit precision "
                                 f"unsupported (baseline is 8)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3], seg[7 + c * 3], \
                    seg[8 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]          # blocks per row
                c["bh"] = mcuy * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
                # non-interleaved scan grid (T.81 A.2.2): ceil of the
                # component's own sample dimensions, NOT the MCU pad
                cw = -(-w * c["h"] // hmax)
                ch = -(-h * c["v"] // vmax)
                c["nbw"] = -(-cw // 8)
                c["nbh"] = -(-ch // 8)
            frame = {"h": h, "w": w, "comps": comps, "hmax": hmax,
                     "vmax": vmax, "mcux": mcux, "mcuy": mcuy}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF 0x{marker:02X} unsupported (arithmetic/"
                f"hierarchical/lossless — SOF0/1/2 only)")
        elif marker == 0xDD:     # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:     # SOS: decode one scan, keep parsing
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            pos = _decode_scan(d, pos, seg, frame, huff,
                               restart_interval, progressive)
            scanned = True
        # APPn / COM / others: skipped via the length field
    if frame is None or not scanned:
        raise ValueError("jpeg: no image scan present")
    return _reconstruct(frame, qt)


def _decode_scan(d: bytes, pos: int, seg: bytes, frame, huff,
                 restart_interval: int, progressive: bool) -> int:
    """Decode one entropy-coded scan into the frame's coefficient
    arrays; returns the offset of the next marker.  Handles baseline
    full-band scans and all four progressive scan kinds."""
    ns = seg[0]
    scomps = []
    for c in range(ns):
        cs, tt = seg[1 + c * 2], seg[2 + c * 2]
        comp = next((cc for cc in frame["comps"] if cc["id"] == cs),
                    None)
        if comp is None:
            raise ValueError(f"jpeg: scan references unknown "
                             f"component {cs}")
        comp["dc_t"], comp["ac_t"] = tt >> 4, tt & 15
        comp["pred"] = 0
        scomps.append(comp)
    if progressive:
        ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
        ahal = seg[3 + ns * 2]
        ah, al = ahal >> 4, ahal & 15
        if ss > 0 and ns != 1:
            raise ValueError("jpeg: interleaved progressive AC scan")
        if ss == 0 and se != 0:
            raise ValueError("jpeg: progressive DC scan with Se != 0")
    else:
        ss, se, ah, al = 0, 63, 0, 0

    interleaved = ns > 1
    if interleaved:
        n_units = frame["mcux"] * frame["mcuy"]
    else:
        c0 = scomps[0]
        n_units = c0["nbw"] * c0["nbh"]
    state = {"eobrun": 0}
    br = _BitReader(d, pos)

    def visit(unit):
        """Yield (comp, storage_index) for each block of this unit in
        scan order."""
        if interleaved:
            my, mx = divmod(unit, frame["mcux"])
            for c in scomps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        yield c, row * c["bw"] + col
        else:
            c = scomps[0]
            row, col = divmod(unit, c["nbw"])
            yield c, row * c["bw"] + col

    u = 0
    while u < n_units:
        try:
            for c, idx in visit(u):
                blk = c["coef"][idx]
                if not progressive:
                    _block_baseline(br, blk, c, huff)
                elif ss == 0 and ah == 0:
                    _block_dc_first(br, blk, c, huff, al)
                elif ss == 0:
                    blk[0] |= br.bit() << al
                elif ah == 0:
                    _block_ac_first(br, blk, huff[(1, c["ac_t"])],
                                    ss, se, al, state)
                else:
                    _block_ac_refine(br, blk, huff[(1, c["ac_t"])],
                                     ss, se, al, state)
            u += 1
            if restart_interval and u % restart_interval == 0 \
                    and u < n_units:
                br.align_to_marker()
                if d[br.pos] == 0xFF and 0xD0 <= d[br.pos + 1] <= 0xD7:
                    br.pos += 2
                for c in scomps:
                    c["pred"] = 0
                state["eobrun"] = 0
        except _RestartMarker:
            # marker arrived mid-unit: resync (the unit restarts)
            br.align_to_marker()
            for c in scomps:
                c["pred"] = 0
            state["eobrun"] = 0
    # skip any padding / stray RSTs up to the next true marker
    p = br.pos
    while p < len(d) - 1:
        if d[p] == 0xFF and d[p + 1] not in (0x00, 0xFF):
            if 0xD0 <= d[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(d)


def _block_baseline(br, blk, c, huff):
    """Full-band sequential block (T.81 F.2.2)."""
    dct = huff[(0, c["dc_t"])]
    act = huff[(1, c["ac_t"])]
    t = br.decode(dct)
    diff = _extend(br.bits(t), t)
    c["pred"] += diff
    blk[0] = c["pred"]
    k = 1
    while k < 64:
        rs = br.decode(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16   # ZRL
                continue
            break         # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past block end")
        blk[k] = _extend(br.bits(s), s)
        k += 1


def _block_dc_first(br, blk, c, huff, al):
    """Progressive DC first pass (G.1.2.1): the point-transformed DC
    arrives as a normal DPCM diff, stored shifted up by Al."""
    t = br.decode(huff[(0, c["dc_t"])])
    diff = _extend(br.bits(t), t)
    c["pred"] += diff
    blk[0] = c["pred"] << al


def _block_ac_first(br, blk, act, ss, se, al, state):
    """Progressive AC first pass over band [Ss, Se] (G.1.2.2) with
    EOBn run-length accounting shared across blocks via ``state``."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16          # ZRL
                continue
            er = 1 << r          # EOBn: run of 2^r + appended bits
            if r:
                er += br.bits(r)
            state["eobrun"] = er - 1   # this block is run member 1
            return
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past band end")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1


def _block_ac_refine(br, blk, act, ss, se, al, state):
    """Progressive AC refinement (G.1.2.3): correction bits for
    history-nonzero coefficients, magnitude-1 insertions for newly
    nonzero ones, EOB runs still carrying correction bits."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.decode(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    er = 1 << r
                    if r:
                        er += br.bits(r)
                    state["eobrun"] = er
                    break        # rest of block under EOB logic below
                newval = 0       # ZRL: skip 16 zero-history coeffs
            else:
                if s != 1:
                    raise ValueError(
                        "jpeg: refinement coefficient size != 1")
                newval = p1 if br.bit() else m1
            # advance over r zero-history coefficients, correcting
            # the nonzero-history ones passed on the way
            while k <= se:
                if blk[k] != 0:
                    if br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break    # target zero-history slot
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("jpeg: refinement run past band")
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # EOB-run blocks still carry correction bits for their
        # remaining nonzero-history coefficients
        while k <= se:
            if blk[k] != 0:
                if br.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, qt) -> np.ndarray:
    """Dequantize + dezigzag + IDCT, whole-plane batched; upsample
    and color-convert."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        coef = c["coef"] * q          # (nblocks, 64) zigzag order
        nat = np.zeros_like(coef)
        nat[:, ZIGZAG] = coef
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # IDCT: M.T @ B @ M batched
        px = np.einsum("kx,nky,yl->nxl", _DCT_M, blocks, _DCT_M)
        px = np.clip(np.round(px + 128), 0, 255).astype(np.uint8)
        plane = px.reshape(c["bh"], c["bw"], 8, 8) \
            .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full MCU-padded resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = planes[0]
        return np.repeat(y[:, :, None], 3, axis=2).copy()
    if len(planes) != 3:
        raise ValueError(f"jpeg: {len(planes)}-component images "
                         f"unsupported (gray or YCbCr)")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# -------------------------------------------------------------------
# encoder (baseline, 4:4:4 / grayscale, Annex K tables)
# -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | code
        self.n += ln
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # 1-fill per spec


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K matrix."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(bw, blk_zz, qtab, dc_codes, ac_codes, pred):
    """One quantized-zigzag block -> bits; returns the new DC pred."""
    dc = int(blk_zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    bw.write(*dc_codes[t])
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        bw.write(v & ((1 << t) - 1), t)
    run = 0
    last_nz = 0
    nz = np.nonzero(blk_zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(blk_zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])   # ZRL
            run -= 16
        s = abs(v).bit_length()
        bw.write(*ac_codes[(run << 4) | s])
        u = v if v >= 0 else v + (1 << s) - 1
        bw.write(u & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        bw.write(*ac_codes[0x00])       # EOB
    return dc


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                progressive: bool = False) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> JFIF bytes.  Baseline
    SOF0 with Annex K tables by default; ``progressive=True`` emits
    an SOF2 stream (libjpeg's simple-progression scan script,
    optimized per-scan AC huffman tables).  Both modes quantize
    identically, so their decodes are bit-identical."""
    a = np.asarray(arr, np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qts = [_scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)]
    bh_, bw_ = -(-h // 8), -(-w // 8)
    # pad planes to block multiples by edge replication, then forward
    # DCT whole-plane (blocks (n, 8, 8)); store quantized zigzag
    quant = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)),
                    mode="edge")
        blocks = pp.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - 128.0
        coef = np.einsum("kx,nxy,ly->nkl", _DCT_M, blocks, _DCT_M)
        q = qts[0 if ci == 0 else 1]
        qn = np.round(coef.reshape(-1, 64) /
                      _nat_order(q)[None, :]).astype(np.int64)
        quant.append(qn[:, ZIGZAG])

    out = bytearray(b"\xFF\xD8")
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xE0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, q in enumerate(qts[:1 if gray else 2]):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + \
            bytes(int(x) for x in q)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    sof_marker = b"\xFF\xC2" if progressive else b"\xFF\xC0"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    if progressive:
        _emit_progressive_scans(out, quant, gray)
    else:
        _emit_baseline_scan(out, quant, gray, nc)
    out += b"\xFF\xD9"
    return bytes(out)


def _dht_segment(tc: int, th: int, bits, values) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body


def _emit_baseline_scan(out: bytearray, quant, gray: bool, nc: int):
    specs = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if not gray:
        specs += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, values) in specs:
        out += _dht_segment(tc, th, bits, values)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
    dc_l = _encode_huffman(*_DC_LUMA)
    ac_l = _encode_huffman(*_AC_LUMA)
    dc_c = _encode_huffman(*_DC_CHROMA)
    ac_c = _encode_huffman(*_AC_CHROMA)
    bw = _BitWriter()
    preds = [0] * len(quant)
    for m in range(quant[0].shape[0]):
        for ci in range(len(quant)):
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_block(bw, quant[ci][m],
                                      None, dct, act, preds[ci])
    bw.flush()
    out += bw.out


def _nat_order(q_zz: np.ndarray) -> np.ndarray:
    """Zigzag-order quant table -> natural (row-major) order."""
    nat = np.zeros(64, np.int64)
    nat[ZIGZAG] = q_zz
    return nat


# -------------------------------------------------------------------
# progressive encoder (SOF2, libjpeg simple-progression scan script,
# optimized per-scan AC huffman tables per T.81 K.2)
# -------------------------------------------------------------------

# (component indices, Ss, Se, Ah, Al) — ends at Al=0 everywhere, so
# the full quantized coefficients are transmitted losslessly
_SCANS_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),   # DC first, coarse
    ((0,), 1, 5, 0, 2),        # luma low AC band, coarse
    ((2,), 1, 63, 0, 1),       # chroma full AC bands
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),       # luma high AC band, coarse
    ((0,), 1, 63, 2, 1),       # luma AC refine 2 -> 1
    ((0, 1, 2), 0, 0, 1, 0),   # DC refine -> exact
    ((2,), 1, 63, 1, 0),       # chroma AC refine -> exact
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),       # luma AC refine -> exact
]
_SCANS_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _emit_progressive_scans(out: bytearray, quant, gray: bool):
    """Emit every scan of the progression: per scan, an optimized
    DHT (AC scans) or the Annex K DC tables (first DC scan), the SOS
    header, then the entropy-coded token stream."""
    dc_emitted = False
    for scan in (_SCANS_GRAY if gray else _SCANS_COLOR):
        comps, ss, se, ah, al = scan
        toks = _scan_tokens(quant, comps, ss, se, ah, al)
        tables = {}
        if ss == 0 and ah == 0:          # DC first needs DC tables
            if not dc_emitted:
                out += _dht_segment(0, 0, *_DC_LUMA)
                if not gray:
                    out += _dht_segment(0, 1, *_DC_CHROMA)
                dc_emitted = True
            tables[(0, 0)] = _encode_huffman(*_DC_LUMA)
            tables[(0, 1)] = _encode_huffman(*_DC_CHROMA)
        elif ss > 0:                     # AC scan: optimized table
            tid = 0 if comps[0] == 0 else 1
            freqs = {}
            for t in toks:
                if t[0] == "s":
                    freqs[t[3]] = freqs.get(t[3], 0) + 1
            if freqs:
                bits, values = _optimal_table(freqs)
            else:                        # all-EOB scan still needs
                bits, values = _optimal_table({0x00: 1})   # a table
            out += _dht_segment(1, tid, bits, values)
            tables[(1, tid)] = _encode_huffman(bits, values)
        # DC refinement reads raw bits only: no tables
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) |
                          (0 if ci == 0 else 1)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
        bw = _BitWriter()
        for t in toks:
            if t[0] == "s":
                code, ln = tables[(t[1], t[2])][t[3]]
                bw.write(code, ln)
            else:
                bw.write(t[1], t[2])
        bw.flush()
        out += bw.out


def _scan_tokens(quant, comps, ss, se, ah, al):
    """One scan -> token list: ("s", tc, th, symbol) huffman symbols
    and ("b", value, nbits) raw appended bits, in stream order."""
    if ss == 0 and ah == 0:
        return _tokens_dc_first(quant, comps, al)
    if ss == 0:
        return _tokens_dc_refine(quant, comps, al)
    ci = comps[0]
    tid = 0 if ci == 0 else 1
    if ah == 0:
        return _tokens_ac_first(quant[ci], ss, se, al, tid)
    return _tokens_ac_refine(quant[ci], ss, se, al, tid)


def _tokens_dc_first(quant, comps, al):
    toks = []
    preds = {ci: 0 for ci in comps}
    for m in range(quant[comps[0]].shape[0]):
        for ci in comps:
            v = int(quant[ci][m][0]) >> al   # DC: arithmetic shift
            diff = v - preds[ci]
            preds[ci] = v
            t = abs(diff).bit_length()
            toks.append(("s", 0, 0 if ci == 0 else 1, t))
            if t:
                u = diff if diff >= 0 else diff + (1 << t) - 1
                toks.append(("b", u & ((1 << t) - 1), t))
    return toks


def _tokens_dc_refine(quant, comps, al):
    return [("b", (int(quant[ci][m][0]) >> al) & 1, 1)
            for m in range(quant[comps[0]].shape[0])
            for ci in comps]


def _tokens_ac_first(q, ss, se, al, tid):
    toks = []
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            toks.append(("s", 1, tid, nb << 4))
            if nb:
                toks.append(("b", eobrun - (1 << nb), nb))
            eobrun = 0

    for m in range(q.shape[0]):
        blk = q[m]
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al                 # AC: magnitude shift
            if t == 0:
                r += 1
                continue
            if v < 0:
                t = -t
            flush()
            while r > 15:
                toks.append(("s", 1, tid, 0xF0))   # ZRL
                r -= 16
            s = abs(t).bit_length()
            toks.append(("s", 1, tid, (r << 4) | s))
            u = t if t >= 0 else t + (1 << s) - 1
            toks.append(("b", u & ((1 << s) - 1), s))
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()
    return toks


def _tokens_ac_refine(q, ss, se, al, tid):
    """G.1.2.3 refinement encoder: correction bits buffer per block
    (``br``), EOB-run correction bits (``pend``) flushed after the
    EOBn symbol, ZRLs suppressed past the last newly-nonzero
    coefficient (folded into the EOB run)."""
    toks = []
    eobrun = 0
    pend = []

    def flush():
        nonlocal eobrun, pend
        if eobrun:
            nb = eobrun.bit_length() - 1
            toks.append(("s", 1, tid, nb << 4))
            if nb:
                toks.append(("b", eobrun - (1 << nb), nb))
            eobrun = 0
        toks.extend(("b", b, 1) for b in pend)
        pend = []

    for m in range(q.shape[0]):
        blk = q[m]
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        br = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush()
                toks.append(("s", 1, tid, 0xF0))
                toks.extend(("b", b, 1) for b in br)
                br = []
                r -= 16
            if t > 1:                    # history-nonzero: 1 bit
                br.append(t & 1)
                continue
            flush()                      # newly nonzero (t == 1)
            toks.append(("s", 1, tid, (r << 4) | 1))
            toks.append(("b", 1 if int(blk[ss + i]) > 0 else 0, 1))
            toks.extend(("b", b, 1) for b in br)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 900:
                flush()
    flush()
    return toks


def _optimal_table(freq_map):
    """Frequencies -> (bits[1..16], values) per T.81 K.2: repeated
    two-least-frequent merge with the ``others`` chain, 16-bit code
    length limiting (figure K.3), reserved all-ones symbol dropped."""
    freq = [0] * 257
    for s, f in freq_map.items():
        freq[s] = f
    freq[256] = 1          # reserved: guarantees no all-1s code
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1, mn = -1, None
        for i in range(257):
            if freq[i] > 0 and (mn is None or freq[i] <= mn):
                mn, v1 = freq[i], i
        v2, mn = -1, None
        for i in range(257):
            if freq[i] > 0 and i != v1 and \
                    (mn is None or freq[i] <= mn):
                mn, v2 = freq[i], i
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for ln in range(32, 16, -1):         # limit to 16 bits
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    ln = 16
    while bits[ln] == 0:
        ln -= 1
    bits[ln] -= 1                        # drop the reserved symbol
    values = [sym for L in range(1, 33) for sym in range(256)
              if codesize[sym] == L]
    return bits[1:17], values
