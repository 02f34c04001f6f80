"""Pure-Python Snappy block codec.

The reference reads ORC-framed snappy chunks but cannot write them
(compressioncodec.go:222-300; the encoder errors at 290-300).  r5
goes beyond: ``compress`` emits real snappy blocks (greedy 4-byte
hash matching, literal + 1/2-byte-offset copy emission per the
public format spec), so the engine can WRITE snappy .orc files that
Java/C++ snappy readers — including Spark's own JVM ORC reader —
consume (pinned by test_orcwriter_snappy_jvm_interop).

Format (public Snappy spec): a varint uncompressed length followed by
tagged elements — literals and back-references with 1/2/4-byte offsets.
Python-loop speed (~5-20 MB/s decode, similar encode) is fine for its
uses here: golden tests, legacy-file ingest, and compatibility writes;
zlib/zstd remain the recommended write codecs for throughput.
"""

from __future__ import annotations


def _emit_literal(out: bytearray, data: bytes, lo: int, hi: int) -> None:
    ln = hi - lo
    if ln <= 0:
        return
    lv = ln - 1
    if lv < 60:
        out.append(lv << 2)
    elif lv < (1 << 8):
        out.append(60 << 2)
        out.append(lv)
    elif lv < (1 << 16):
        out.append(61 << 2)
        out += lv.to_bytes(2, "little")
    elif lv < (1 << 24):
        out.append(62 << 2)
        out += lv.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += lv.to_bytes(4, "little")
    out += data[lo:hi]


def _emit_one_copy(out: bytearray, offset: int, ml: int) -> None:
    if 4 <= ml <= 11 and offset < 2048:
        out.append(0x01 | ((ml - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    elif offset < (1 << 16):
        out.append(0x02 | ((ml - 1) << 2))
        out += offset.to_bytes(2, "little")
    else:
        out.append(0x03 | ((ml - 1) << 2))
        out += offset.to_bytes(4, "little")


def _emit_copy(out: bytearray, offset: int, ml: int) -> None:
    # copies carry at most 64 bytes; split long matches, never
    # leaving a <4-byte tail (a copy length below 4 is unencodable
    # with the 1-byte-offset form and wasteful with the others)
    while ml >= 68:
        _emit_one_copy(out, offset, 64)
        ml -= 64
    if ml > 64:
        _emit_one_copy(out, offset, 60)
        ml -= 60
    _emit_one_copy(out, offset, ml)


def compress(data: bytes) -> bytes:
    """Raw input -> one snappy block (varint uncompressed length +
    literal/copy elements).  Greedy single-entry 4-byte hash table —
    the standard fast-level strategy; ORC's per-chunk original
    fallback absorbs incompressible chunks above this layer."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    u = n
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | (0x80 if u else 0))
        if not u:
            break
    table: dict[bytes, int] = {}
    pos = 0
    anchor = 0
    limit = n - 4
    while pos <= limit:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None:
            pos += 1
            continue
        # extend the match in slices (runs/periodic data extend far;
        # overlapping compares are correct — raw bytes either side)
        ml = 4
        while True:
            step = min(n - (pos + ml), 512)
            if step <= 0:
                break
            a = data[cand + ml:cand + ml + step]
            b = data[pos + ml:pos + ml + step]
            if a == b:
                ml += step
                continue
            for i in range(step):
                if a[i] != b[i]:
                    break
            ml += i
            break
        _emit_literal(out, data, anchor, pos)
        _emit_copy(out, pos - cand, ml)
        pos += ml
        anchor = pos
    _emit_literal(out, data, anchor, n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    pos = 0
    # uncompressed length varint
    ulen = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                ln = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            ln += 1
            out += data[pos:pos + ln]
            pos += ln
            continue
        if t == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif t == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0:
            raise ValueError("corrupt snappy: zero offset")
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt snappy: offset before start")
        if offset >= ln:
            out += out[start:start + ln]
        else:
            # overlapping copy: byte-by-byte run extension
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(f"snappy length mismatch: {len(out)} != {ulen}")
    return bytes(out)
