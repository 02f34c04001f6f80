"""Bloom filters for ORC BLOOM_FILTER_UTF8 streams (beyond the
reference: scritchley/orc only declares the proto messages,
proto/orc.proto:83-100, and never writes or reads them).

Bit-compatible with Java ORC's ``org.apache.orc.util.BloomFilterUtf8``
(verified against golden vectors extracted from Spark's bundled
orc-core via py4j — tests/test_bloom.py): same Murmur3 64-bit hash
(x64_128 h1 lane, seed 104729), same sizing quirk (numBits rounded UP
to the next multiple of 64, adding a full word when already aligned),
same (hash1 + i*hash2) double-hashing with the negative-flip, so a
Java/Spark reader that consults our bloom stream prunes EXACTLY the
row groups Java's own writer would let it prune — a hash mismatch
here would silently drop matching rows under predicate pushdown.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
DEFAULT_SEED = 104729  # org.apache.orc.util.Murmur3.DEFAULT_SEED
DEFAULT_FPP = 0.05


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _MASK64
    h ^= h >> 33
    return h


def hash64(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Murmur3 64-bit (x64_128 h1 lane), Java-signed result."""
    length = len(data)
    h = seed & _MASK64
    nblocks = length >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8:(i + 1) * 8], "little")
        k = (k * _C1) & _MASK64
        k = _rotl64(k, 31)
        k = (k * _C2) & _MASK64
        h ^= k
        h = _rotl64(h, 27)
        h = (h * 5 + 0x52DCE729) & _MASK64
    tail = data[nblocks * 8:]
    if tail:
        k1 = int.from_bytes(tail, "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h ^= k1
    h ^= length
    h = _fmix64(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def _optimal_num_bits(n: int, p: float) -> int:
    return int(-n * math.log(p) / (math.log(2) ** 2))


_U5 = np.uint64(5)
_UN1 = np.uint64(0x52DCE729)
_UC1 = np.uint64(_C1)
_UC2 = np.uint64(_C2)


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _vfmix(h: np.ndarray) -> np.ndarray:
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _hash64_block(mat: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized Murmur3 hash64 over same-length byte rows
    (mat: uint8 matrix, one value per row)."""
    m, L = mat.shape
    h = np.full(m, seed, dtype=np.uint64)
    nblocks = L >> 3
    if nblocks:
        body = np.ascontiguousarray(
            mat[:, :nblocks * 8]).view("<u8").reshape(m, nblocks)
        for k in range(nblocks):
            k1 = body[:, k] * _UC1
            k1 = _vrotl(k1, 31)
            k1 *= _UC2
            h ^= k1
            h = _vrotl(h, 27) * _U5 + _UN1
    t = L & 7
    if t:
        tail = mat[:, nblocks * 8:].astype(np.uint64)
        weights = (np.uint64(1) << (np.uint64(8) *
                                    np.arange(t, dtype=np.uint64)))
        k1 = (tail * weights).sum(axis=1, dtype=np.uint64)
        k1 *= _UC1
        k1 = _vrotl(k1, 31)
        k1 *= _UC2
        h ^= k1
    h ^= np.uint64(L)
    return _vfmix(h)


def hash64_many(values: list[bytes],
                seed: int = DEFAULT_SEED) -> np.ndarray:
    """Murmur3 hash64 of many byte values, numpy-vectorized: values
    are grouped by length (ids/keys have few distinct lengths), each
    group hashed as one uint8 matrix — loop count is O(#lengths x
    blocks), never O(#values) interpreted hashing.  Returns int64
    (Java-signed), elementwise equal to hash64()."""
    n = len(values)
    out = np.empty(n, dtype=np.uint64)
    if not n:
        return out.view(np.int64)
    lens = np.fromiter((len(v) for v in values), dtype=np.int64,
                       count=n)
    order = np.argsort(lens, kind="stable")
    sorted_lens = lens[order]
    pos = 0
    while pos < n:
        L = int(sorted_lens[pos])
        end = pos + int(np.searchsorted(sorted_lens[pos:], L, "right"))
        idx = order[pos:end]
        if L == 0:
            out[idx] = _hash64_block(
                np.zeros((len(idx), 0), np.uint8), seed)
        else:
            blob = b"".join(values[int(i)] for i in idx)
            mat = np.frombuffer(blob, np.uint8).reshape(len(idx), L)
            out[idx] = _hash64_block(mat, seed)
        pos = end
    return out.view(np.int64)


class BloomFilterUtf8:
    """Java-ORC-compatible bloom filter over UTF-8 byte values."""

    def __init__(self, expected_entries: int, fpp: float = DEFAULT_FPP):
        nb = _optimal_num_bits(expected_entries, fpp)
        # Java quirk: always rounds UP by (64 - nb % 64), adding a
        # whole word when nb is already 64-aligned
        self.num_bits = nb + (64 - (nb % 64))
        # Java Math.round is floor(x + 0.5) (half-up), NOT Python's
        # banker's round() — at an exact .5 boundary they differ by 1
        # (r4 / ADVICE fix; k is also stored in the stream, so only
        # filter SIZING parity was at stake, not readability)
        self.num_hash_functions = max(
            1, int(math.floor(
                self.num_bits / expected_entries * math.log(2) + 0.5)))
        self.bitset = np.zeros(self.num_bits >> 6, dtype=np.uint64)

    def _positions(self, h64: int) -> list[int]:
        # Java int casts: low/high 32 bits, signed
        hash1 = h64 & 0xFFFFFFFF
        if hash1 >= 1 << 31:
            hash1 -= 1 << 32
        hash2 = (h64 >> 32) & 0xFFFFFFFF if h64 >= 0 else \
            ((h64 + (1 << 64)) >> 32) & 0xFFFFFFFF
        if hash2 >= 1 << 31:
            hash2 -= 1 << 32
        out = []
        for i in range(1, self.num_hash_functions + 1):
            combined = hash1 + i * hash2
            # wrap to java int
            combined &= 0xFFFFFFFF
            if combined >= 1 << 31:
                combined -= 1 << 32
            if combined < 0:
                combined = ~combined
            out.append(combined % self.num_bits)
        return out

    def add_bytes(self, val: bytes) -> None:
        for pos in self._positions(hash64(val)):
            self.bitset[pos >> 6] |= np.uint64(1 << (pos & 63))

    def add_many(self, values: list[bytes]) -> None:
        """Vectorized bulk add: one numpy pass per hash function
        (hash64_many + int32-wrapped double hashing), bit-identical to
        looping add_bytes."""
        if not values:
            return
        h = hash64_many(values).view(np.uint64)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h1[h1 >= 1 << 31] -= 1 << 32
        h2 = (h >> np.uint64(32)).astype(np.int64)
        h2[h2 >= 1 << 31] -= 1 << 32
        for i in range(1, self.num_hash_functions + 1):
            comb = h1 + i * h2
            # wrap to java int, flip negatives
            comb = ((comb + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)
            comb = np.where(comb < 0, ~comb, comb)
            pos = comb % self.num_bits
            np.bitwise_or.at(
                self.bitset, pos >> 6,
                np.uint64(1) << (pos & 63).astype(np.uint64))

    def test_bytes(self, val: bytes) -> bool:
        return all(
            self.bitset[pos >> 6] & np.uint64(1 << (pos & 63))
            for pos in self._positions(hash64(val)))

    def serialized_bitset(self) -> bytes:
        """utf8bitset payload: the longs little-endian."""
        return b"".join(struct.pack("<Q", int(w)) for w in self.bitset)


def serialize_filter(values: list[bytes],
                     fpp: float = DEFAULT_FPP) -> bytes:
    """One standalone filter blob for a value set:
    [vulong num_hash_functions][vulong num_bits][bitset LE longs] —
    the stripe-table `{col}__BLOOM` column payload."""
    from .bits import write_vulong
    bf = BloomFilterUtf8(max(len(values), 64), fpp)
    bf.add_many(list(values))
    out = bytearray()
    write_vulong(out, bf.num_hash_functions)
    write_vulong(out, bf.num_bits)
    out.extend(bf.serialized_bitset())
    return bytes(out)


def test_serialized(blob: bytes, value: bytes) -> bool:
    """Membership test against a serialize_filter() blob."""
    from .bits import read_vulong
    k, pos = read_vulong(blob, 0)
    num_bits, pos = read_vulong(blob, pos)
    words = np.frombuffer(blob, dtype="<u8", offset=pos)
    bf = BloomFilterUtf8.__new__(BloomFilterUtf8)
    bf.num_hash_functions = int(k)
    bf.num_bits = int(num_bits)
    bf.bitset = words
    return bf.test_bytes(value)


def bloom_filter_index(per_stride_values: list[list[bytes]],
                       expected_entries: int,
                       fpp: float = DEFAULT_FPP) -> bytes:
    """Serialize a BloomFilterIndex protobuf message: one BloomFilter
    entry per row-group stride (orc.proto BloomFilterIndex /
    BloomFilter with numHashFunctions + utf8bitset)."""
    from .bits import write_vulong
    out = bytearray()
    for values in per_stride_values:
        bf = BloomFilterUtf8(expected_entries, fpp)
        bf.add_many(list(values))
        body = bytearray()
        # field 1 varint: numHashFunctions
        body.append((1 << 3) | 0)
        write_vulong(body, bf.num_hash_functions)
        # field 3 bytes: utf8bitset
        bits = bf.serialized_bitset()
        body.append((3 << 3) | 2)
        write_vulong(body, len(bits))
        body.extend(bits)
        # BloomFilterIndex field 1: repeated BloomFilter
        out.append((1 << 3) | 2)
        write_vulong(out, len(body))
        out.extend(body)
    return bytes(out)
