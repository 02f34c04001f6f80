"""Decimal codec: base-128 zigzag varint mantissas + scale stream.

Behavioral reference: scritchley/orc treereader.go:880-948 +
decimal.go:53-79 (read-only in the reference; we implement both
directions).  DATA = one signed (zigzag) varint per value holding the
unscaled mantissa (arbitrary precision, big.Int semantics — Python ints
here), SECONDARY = scales as signed RLE v2.
"""

from __future__ import annotations

import numpy as np

from . import rle2

_MASK = (1 << 64) - 1


def encode_mantissas(mantissas: list[int]) -> bytes:
    """Zigzag varint encode of arbitrary-precision mantissas."""
    out = bytearray()
    for m in mantissas:
        z = (m << 1) if m >= 0 else ((-m << 1) - 1)
        while z > 0x7F:
            out.append(0x80 | (z & 0x7F))
            z >>= 7
        out.append(z)
    return bytes(out)


def decode_mantissas(data: bytes, n: int) -> list[int]:
    out = []
    pos = 0
    for _ in range(n):
        z = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        out.append((z >> 1) if not z & 1 else -((z + 1) >> 1))
    return out


def encode_decimals(mantissas: list[int], scales) -> dict[str, bytes]:
    return {
        "DATA": encode_mantissas(mantissas),
        "SECONDARY": rle2.encode(
            np.asarray(scales, dtype=np.int64), signed=True),
    }


def decode_decimals(streams: dict, n: int) -> tuple[list[int], np.ndarray]:
    # all-null stripes elide the empty streams entirely — .get keeps
    # the n == 0 decode path alive instead of KeyError
    mants = decode_mantissas(streams.get("DATA", b""), n)
    scales = rle2.decode(streams.get("SECONDARY", b""), n, signed=True)
    return mants, scales
