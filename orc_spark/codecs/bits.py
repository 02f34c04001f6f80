"""Bit-level primitives shared by the ORC-style integer codecs.

Re-creates (from public ORC spec semantics; behavioral reference:
scritchley/orc utils.go:11-141 bit-width tables, utils.go:233-269
percentile/closest-bits, utils.go:271-343 MSB-first bit packing,
utils.go:704-750 base-128 varints, utils.go:1196-1204 zigzag) as
vectorized numpy kernels. Array-in / bytes-out; no per-row Python in
the hot paths.
"""

from __future__ import annotations

import numpy as np

U64_MASK = 0xFFFFFFFFFFFFFFFF
I64_MIN = -(1 << 63)

# Legal ORC fixed bit widths: 1..24, 26, 28, 30, 32, 40, 48, 56, 64
# (utils.go:48-115).  Lookup tables indexed by raw bit count 0..64.

_CLOSEST_FIXED = np.zeros(65, dtype=np.int64)
for _w in range(65):
    if _w == 0:
        _CLOSEST_FIXED[_w] = 1
    elif _w <= 24:
        _CLOSEST_FIXED[_w] = _w
    elif _w <= 26:
        _CLOSEST_FIXED[_w] = 26
    elif _w <= 28:
        _CLOSEST_FIXED[_w] = 28
    elif _w <= 30:
        _CLOSEST_FIXED[_w] = 30
    elif _w <= 32:
        _CLOSEST_FIXED[_w] = 32
    elif _w <= 40:
        _CLOSEST_FIXED[_w] = 40
    elif _w <= 48:
        _CLOSEST_FIXED[_w] = 48
    elif _w <= 56:
        _CLOSEST_FIXED[_w] = 56
    else:
        _CLOSEST_FIXED[_w] = 64

_CLOSEST_ALIGNED = np.zeros(65, dtype=np.int64)
for _w in range(65):
    for _a in (1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64):
        if _w <= _a:
            _CLOSEST_ALIGNED[_w] = _a
            break

# encodeBitWidth: width (1..64) -> 5-bit header code (utils.go:70-90).
_ENCODE_WIDTH = np.zeros(65, dtype=np.int64)
for _w in range(65):
    if 1 <= _w <= 24:
        _ENCODE_WIDTH[_w] = _w - 1
    elif _w <= 26:
        _ENCODE_WIDTH[_w] = 24
    elif _w <= 28:
        _ENCODE_WIDTH[_w] = 25
    elif _w <= 30:
        _ENCODE_WIDTH[_w] = 26
    elif _w <= 32:
        _ENCODE_WIDTH[_w] = 27
    elif _w <= 40:
        _ENCODE_WIDTH[_w] = 28
    elif _w <= 48:
        _ENCODE_WIDTH[_w] = 29
    elif _w <= 56:
        _ENCODE_WIDTH[_w] = 30
    else:
        _ENCODE_WIDTH[_w] = 31
_ENCODE_WIDTH[0] = 31  # matches Go fall-through for n=0

# decodeBitWidth: header code 0..31 -> width (utils.go:48-68).
_DECODE_WIDTH = np.array(
    list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64], dtype=np.int64
)


def get_closest_fixed_bits(w: int) -> int:
    return int(_CLOSEST_FIXED[w])


def get_closest_aligned_fixed_bits(w: int) -> int:
    return int(_CLOSEST_ALIGNED[w])


def encode_bit_width(w: int) -> int:
    return int(_ENCODE_WIDTH[w])


def decode_bit_width(code: int) -> int:
    return int(_DECODE_WIDTH[code])


# 16-bit bit-length lookup table (cache-friendly uint8)
_BL16 = np.zeros(1 << 16, dtype=np.uint8)
for _k in range(16):
    _BL16[1 << _k:1 << (_k + 1)] = _k + 1


def bit_length_u64(a: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit bit-length (number of significant bits)."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    m16 = np.uint64(0xFFFF)
    if a.size and int(a.max()) <= 0xFFFFFFFF:
        lo = _BL16[(a & m16).astype(np.int32)]
        hi = (a >> np.uint64(16)).astype(np.int32)
        return np.where(hi > 0, _BL16[hi] + 16, lo).astype(np.int64)
    b0 = _BL16[(a & m16).astype(np.int32)]
    b1 = _BL16[((a >> np.uint64(16)) & m16).astype(np.int32)]
    b2 = _BL16[((a >> np.uint64(32)) & m16).astype(np.int32)]
    b3 = _BL16[(a >> np.uint64(48)).astype(np.int32)]
    out = np.where(b3 > 0, b3 + 48,
                   np.where(b2 > 0, b2 + 32,
                            np.where(b1 > 0, b1 + 16, b0)))
    return out.astype(np.int64)


def find_closest_num_bits(value: int) -> int:
    """Scalar findClosestNumBits (utils.go:262-269): bit length of the
    64-bit pattern, snapped to the closest legal fixed width."""
    return int(_CLOSEST_FIXED[(value & U64_MASK).bit_length()])


def percentile_bits(zz: np.ndarray, p: float) -> int:
    """Width (legal fixed bits) needed by the p-th percentile of values.

    Mirrors utils.go:233-260 exactly, including float64 arithmetic on
    the histogram scan. ``zz`` must be uint64.
    """
    n = len(zz)
    bl = bit_length_u64(zz)
    idx = _ENCODE_WIDTH[_CLOSEST_FIXED[bl]]
    hist = np.bincount(idx, minlength=32)
    per_len = float(n) * (1.0 - p)
    for i in range(31, -1, -1):
        per_len -= float(hist[i])
        if per_len < 0:
            return int(_DECODE_WIDTH[i])
    return 0


def zigzag_encode(a: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag ((i<<1) ^ (i>>63))."""
    a = np.ascontiguousarray(a, dtype=np.int64)
    u = a.view(np.uint64)
    sign = (a >> np.int64(63)).view(np.uint64)
    return (u << np.uint64(1)) ^ sign


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    mask = (u & np.uint64(1)) * np.uint64(U64_MASK)
    return ((u >> np.uint64(1)) ^ mask).view(np.int64)


def zigzag_encode_scalar(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & U64_MASK


def zigzag_decode_scalar(u: int) -> int:
    r = (u >> 1) ^ (U64_MASK if (u & 1) else 0)
    return r - (1 << 64) if r >= (1 << 63) else r


def is_safe_subtract(left: int, right: int) -> bool:
    """True when left-right cannot overflow int64 (utils.go:229-231)."""
    diff = (left - right) & U64_MASK
    if diff >= (1 << 63):
        diff -= 1 << 64
    return (left ^ right) >= 0 or (left ^ diff) >= 0


# ---------------------------------------------------------------------------
# MSB-first bit packing (writeInts/readInts, utils.go:271-343 + unrolled
# byte-width fast paths).  Values are packed as a contiguous MSB-first bit
# stream; the final partial byte is zero-padded.
# ---------------------------------------------------------------------------

_BYTE_WIDTHS = frozenset((8, 16, 24, 32, 40, 48, 56, 64))


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values at the given bit width, MSB-first."""
    n = len(values)
    if n == 0 or width < 1:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width in _BYTE_WIDTHS:
        nb = width // 8
        be = v.astype(">u8").view(np.uint8).reshape(n, 8)
        return be[:, 8 - nb:].tobytes()
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(data, n: int, width: int, offset: int = 0) -> np.ndarray:
    """Unpack n values of the given bit width from ``data`` starting at
    byte ``offset``; returns uint64 array."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width in _BYTE_WIDTHS:
        nb = width // 8
        raw = np.frombuffer(data, dtype=np.uint8, count=n * nb, offset=offset)
        out = np.zeros((n, 8), dtype=np.uint8)
        out[:, 8 - nb:] = raw.reshape(n, nb)
        return out.view(">u8").ravel().astype(np.uint64)
    total_bits = n * width
    nbytes = (total_bits + 7) // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=nbytes, offset=offset)
    bits = np.unpackbits(raw, count=total_bits).reshape(n, width)
    padded = np.zeros((n, 64), dtype=np.uint8)
    padded[:, 64 - width:] = bits
    return np.packbits(padded, axis=1).view(">u8").ravel().astype(np.uint64)


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8


# ---------------------------------------------------------------------------
# Base-128 varints (utils.go:704-750)
# ---------------------------------------------------------------------------


def write_vulong(out: bytearray, value: int) -> None:
    v = value & U64_MASK
    while True:
        if v & ~0x7F == 0:
            out.append(v)
            return
        out.append(0x80 | (v & 0x7F))
        v >>= 7


def write_vslong(out: bytearray, value: int) -> None:
    write_vulong(out, ((value << 1) ^ (value >> 63)) & U64_MASK)


def read_vulong(buf, pos: int) -> tuple[int, int]:
    result = 0
    offset = 0
    while True:
        b = int(buf[pos])
        pos += 1
        result |= (b & 0x7F) << offset
        if not b & 0x80:
            return result & U64_MASK, pos
        offset += 7


def read_vslong(buf, pos: int) -> tuple[int, int]:
    u, pos = read_vulong(buf, pos)
    return zigzag_decode_scalar(u), pos


def encode_varints(values: np.ndarray) -> bytes:
    """Vectorized unsigned LEB128 encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    bl = bit_length_u64(v)
    nbytes = np.maximum((bl + 6) // 7, 1)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.empty(total, dtype=np.uint8)
    starts = ends - nbytes
    rem = v.copy()
    idx = starts.copy()
    active = np.ones(n, dtype=bool)
    for _ in range(10):
        more = rem > np.uint64(0x7F)
        byte = (rem & np.uint64(0x7F)).astype(np.uint8)
        byte[more] |= 0x80
        out[idx[active]] = byte[active]
        rem >>= np.uint64(7)
        idx += 1
        active = active & more
        if not active.any():
            break
    return out.tobytes()


def decode_varints(buf: np.ndarray, pos: int, n: int) -> tuple[np.ndarray, int]:
    """Vectorized unsigned LEB128 decode of n varints from a uint8 array."""
    if n == 0:
        return np.empty(0, dtype=np.uint64), pos
    # find the end byte of each varint: bytes with MSB clear.  The
    # window is BOUNDED to n*10 bytes (a uint64 varint is <= 10 bytes):
    # scanning buf[pos:] made per-group decodes quadratic in stream
    # size (measured 13.6 us/value at 640k values, 0.9 us at 20k)
    window = buf[pos:pos + n * 10]
    stops = np.flatnonzero(window < 0x80)
    if len(stops) < n:
        raise ValueError("truncated varint stream")
    ends = stops[:n] + 1  # exclusive, relative to pos
    starts = np.concatenate(([0], ends[:-1]))
    out = np.zeros(n, dtype=np.uint64)
    nb = ends - starts
    max_nb = int(nb.max())
    for k in range(max_nb):
        sel = nb > k
        b = window[starts[sel] + k].astype(np.uint64)
        out[sel] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
    return out, pos + int(ends[n - 1])


def bytes_to_long_be(buf, pos: int, n: int) -> tuple[int, int]:
    b = bytes(buf[pos:pos + n])
    if len(b) < n:
        # a silent short read would decode a WRONG value from a
        # truncated stream (fail loud like the other codec paths)
        raise ValueError("truncated stream: big-endian read past end")
    return int.from_bytes(b, "big"), pos + n
