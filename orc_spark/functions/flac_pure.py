"""Pure-python/numpy FLAC codec (the xiph.org FLAC format spec /
RFC 9639).

Decode: STREAMINFO + metadata-block walk, frame sync with CRC-8
header / CRC-16 frame checks, UTF-8-coded frame numbers, all four
subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders
1-32 with quantized-coefficient shift), wasted-bits unpacking, both
Rice residual methods (4- and 5-bit parameters, partition orders,
escape-to-raw), and the left/side, right/side and mid/side channel
decorrelations.  Sample widths 8/16/24 (anything to 32 decodes;
output is clipped to int32, features use int16 significance).

Encode (fixture-grade): blocksize-4096 frames, independent
channels, per-subframe best-of FIXED orders 0-4 plus an optional
LPC mode (Levinson-Durbin on the block autocorrelation, 12-bit
quantized coefficients) so the decoder's LPC path is exercised by
round-trip tests; single-partition Rice residuals with
per-partition parameter search.  FLAC is lossless: every encode
decodes bit-identically (pinned by test and by the driver oracle's
planted-sample rows).
"""

from __future__ import annotations

import struct

import numpy as np


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.d[self.byte]
            v = (v << take) | ((cur >> (avail - take)) &
                               ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        # r6: byte-at-a-time zero skipping (bit_length finds the
        # leading 1 in the remaining bits of the current byte) instead
        # of one read(1) call per zero bit — same bits consumed, ~3x
        # fewer Python operations on typical rice residuals
        d = self.d
        q = 0
        byte = self.byte
        bit = self.bit
        while True:
            cur = d[byte] & (0xFF >> bit)
            if cur:
                top = cur.bit_length()
                zeros = (8 - bit) - top
                q += zeros
                bit += zeros + 1
                if bit == 8:
                    bit = 0
                    byte += 1
                self.byte = byte
                self.bit = bit
                return q
            q += 8 - bit
            bit = 0
            byte += 1

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _read_residual(br: _Bits, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out = np.empty(n - order, np.int64)
    at = 0
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: bad partition layout")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[at + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.unary()
                r = br.read(param) if param else 0
                u = (q << param) | r
                out[at + i] = (u >> 1) ^ -(u & 1)   # zigzag
        at += cnt
    return out


def _decode_subframe(br: _Bits, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe sync bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if stype == 0:                       # CONSTANT
        v = br.read_signed(eff)
        out = np.full(n, v, np.int64)
    elif stype == 1:                     # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(n)],
                       np.int64)
    elif 8 <= stype <= 12:               # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif stype >= 32:                    # LPC order 1-32
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        for i in range(order, n):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000,
               5: 16000, 6: 22050, 7: 24000, 8: 32000, 9: 44100,
               10: 48000, 11: 96000}
_BPS_CODES = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes):
    """FLAC bytes -> ((n, ch) int32 samples, rate)."""
    d = bytes(payload)
    if d[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        hdr = d[pos]
        btype = hdr & 0x7F
        last = hdr & 0x80
        size = int.from_bytes(d[pos + 1:pos + 4], "big")
        if btype == 0:                   # STREAMINFO
            body = d[pos + 4:pos + 4 + size]
            rate = int.from_bytes(body[10:13], "big") >> 4
            ch = ((body[12] >> 1) & 7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = int.from_bytes(body[13:18], "big") & \
                ((1 << 36) - 1)
            info = {"rate": rate, "ch": ch, "bps": bps,
                    "total": total}
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    chans = [[] for _ in range(info["ch"])]
    while pos < len(d) - 2:
        if d[pos] != 0xFF or (d[pos + 1] & 0xFC) != 0xF8:
            raise ValueError(f"flac: lost frame sync at {pos}")
        frame_start = pos
        br = _Bits(d, pos)
        br.read(14)                      # sync
        br.read(1)                       # reserved
        br.read(1)                       # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)                       # reserved
        _read_utf8_number(br)            # frame/sample number
        if bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        else:
            bsize = _BLOCKSIZE_CODES.get(bs_code)
            if bsize is None:
                raise ValueError("flac: reserved blocksize code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = _BPS_CODES.get(bps_code) or info["bps"]
        hdr_end = br.byte + (1 if br.bit else 0)
        crc8 = d[hdr_end] if br.bit == 0 else None
        if crc8 is not None and _crc8(d[frame_start:hdr_end]) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.read(8)                       # the CRC-8 byte itself
        if ch_code < 8:
            nch = ch_code + 1
            subs = [_decode_subframe(br, bsize, bps)
                    for _ in range(nch)]
        elif ch_code == 8:               # left/side
            left = _decode_subframe(br, bsize, bps)
            side = _decode_subframe(br, bsize, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:               # right/side
            side = _decode_subframe(br, bsize, bps + 1)
            right = _decode_subframe(br, bsize, bps)
            subs = [right + side, right]
        elif ch_code == 10:              # mid/side
            # mid = (l+r)>>1, side = l-r; the dropped low bit of the
            # sum is recoverable from side's parity
            mid = _decode_subframe(br, bsize, bps)
            side = _decode_subframe(br, bsize, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        if len(subs) != info["ch"]:
            raise ValueError("flac: channel count changed mid-stream")
        br.align()
        crc16 = struct.unpack_from(">H", d, br.byte)[0]
        if _crc16(d[frame_start:br.byte]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.byte + 2
        for c in range(info["ch"]):
            chans[c].append(np.asarray(subs[c], np.int64))
    out = np.stack([np.concatenate(c) for c in chans], axis=1)
    if info["total"]:
        out = out[:info["total"]]
    return np.clip(out, -(1 << 31), (1 << 31) - 1).astype(np.int32), \
        info["rate"]


# -------------------------------------------------------------------
# encoder
# -------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int):
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _rice_cost(res: np.ndarray, param: int) -> int:
    u = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(u >> param)) + len(res) * (1 + param)


def _write_residual(bw: _BitW, res: np.ndarray):
    bw.write(0, 2)                       # method 0: 4-bit rice
    bw.write(0, 4)                       # partition order 0
    u = ((np.abs(res) << 1) - (res < 0)).astype(np.int64)
    best, best_cost = 0, None
    for param in range(15):
        cost = int(np.sum(u >> param)) + len(res) * (1 + param)
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    bw.write(best, 4)
    for q in u:
        q = int(q)
        bw.write(1, (q >> best) + 1)     # unary: zeros then stop-1
        if best:
            bw.write(q & ((1 << best) - 1), best)


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_bits(res: np.ndarray) -> int:
    """Best single-partition rice size in bits (the same search
    _write_residual performs)."""
    if len(res) == 0:
        return 0
    u = ((np.abs(res) << 1) - (res < 0)).astype(np.int64)
    return min(int(np.sum(u >> p)) + len(res) * (1 + p)
               for p in range(15))


def _encode_subframe(bw: _BitW, s: np.ndarray, bps: int,
                     use_lpc: bool):
    s = s.astype(np.int64)
    n = len(s)
    if np.all(s == s[0]):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(s[0]), bps)
        return
    best_o, best_r, best_cost = 0, s, None
    for order in range(min(5, n)):
        r = _fixed_residual(s, order)
        cost = order * bps + _rice_bits(r)
        if best_cost is None or cost < best_cost:
            best_o, best_r, best_cost = order, r, cost
    if use_lpc and n > 64:
        enc = _try_lpc(s, bps)
        if enc is not None:
            order, shift, coefs, res = enc
            lpc_cost = order * (bps + 12) + 9 + _rice_bits(res)
            if lpc_cost < best_cost:
                bw.write(0, 1)
                bw.write(32 + order - 1, 6)
                bw.write(0, 1)
                for v in s[:order]:
                    bw.write(int(v), bps)
                bw.write(12 - 1, 4)      # precision 12
                bw.write(shift, 5)
                for c in coefs:
                    bw.write(int(c), 12)
                _write_residual(bw, res)
                return
    bw.write(0, 1)
    bw.write(8 + best_o, 6)
    bw.write(0, 1)
    for v in s[:best_o]:
        bw.write(int(v), bps)
    _write_residual(bw, best_r)


def _try_lpc(s: np.ndarray, bps: int, order: int = 8):
    x = s.astype(np.float64)
    n = len(x)
    ac = np.array([np.dot(x[:n - k], x[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    # Levinson-Durbin
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        if err == 0:
            return None
        k = acc / err
        a[:i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= (1 - k * k)
        if err <= 0:
            return None
    shift = 10
    coefs = np.round(a * (1 << shift)).astype(np.int64)
    if np.any(np.abs(coefs) >= (1 << 11)):   # 12-bit signed
        return None
    pred = np.zeros(n - order, np.int64)
    si = s.astype(np.int64)
    for j in range(order):
        pred += coefs[j] * si[order - 1 - j:n - 1 - j]
    res = si[order:] - (pred >> shift)
    return order, shift, coefs, res


def encode_flac(samples: np.ndarray, rate: int,
                bps: int = 16, use_lpc: bool = False,
                blocksize: int = 4096,
                stereo: str = "independent") -> bytes:
    """(n,) or (n, ch) int samples -> FLAC bytes (FIXED or LPC
    subframes, single-partition Rice).  ``stereo`` for 2-channel
    input: independent | left_side | right_side | mid_side — the
    decorrelated modes exercise the decoder's reconstruction paths
    and usually shrink correlated channels."""
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    lim = 1 << (bps - 1)
    if s.min() < -lim or s.max() >= lim:
        raise ValueError(f"flac: samples exceed {bps}-bit range")
    out = bytearray(b"fLaC")
    sinfo = bytearray()
    sinfo += struct.pack(">HH", blocksize, blocksize)
    sinfo += b"\x00\x00\x00" * 2                 # frame sizes unknown
    sinfo += bytes([(rate >> 12) & 0xFF, (rate >> 4) & 0xFF,
                    ((rate & 0xF) << 4) | ((ch - 1) << 1) |
                    ((bps - 1) >> 4),
                    (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF)])
    sinfo += struct.pack(">I", n & 0xFFFFFFFF)
    sinfo += b"\x00" * 16                        # md5 unset
    out += bytes([0x80]) + len(sinfo).to_bytes(3, "big") + sinfo
    if stereo != "independent" and ch != 2:
        raise ValueError("flac: decorrelated stereo needs 2 channels")
    ch_code = {"independent": ch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo]
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = s[start:start + blocksize]
        bn = blk.shape[0]
        hdr = _BitW()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)                          # fixed blocksize
        hdr.write(7, 4)                          # 16-bit blocksize-1
        hdr.write(0, 4)                          # rate: STREAMINFO
        hdr.write(ch_code, 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        hdr.write(0, 1)
        if frame_no < 0x80:                      # UTF-8 frame number
            hdr.write(frame_no, 8)
        else:
            hdr.write(0xC0 | (frame_no >> 6), 8)
            hdr.write(0x80 | (frame_no & 0x3F), 8)
        hdr.write(bn - 1, 16)
        hdr.align()
        hbytes = bytes(hdr.out)
        body = _BitW()
        if stereo == "independent":
            for c in range(ch):
                _encode_subframe(body, blk[:, c], bps, use_lpc)
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if stereo == "left_side":
                _encode_subframe(body, left, bps, use_lpc)
                _encode_subframe(body, side, bps + 1, use_lpc)
            elif stereo == "right_side":
                _encode_subframe(body, side, bps + 1, use_lpc)
                _encode_subframe(body, right, bps, use_lpc)
            else:                                # mid/side
                mid = (left + right) >> 1
                _encode_subframe(body, mid, bps, use_lpc)
                _encode_subframe(body, side, bps + 1, use_lpc)
        body.align()
        frame = hbytes + bytes([_crc8(hbytes)]) + bytes(body.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
