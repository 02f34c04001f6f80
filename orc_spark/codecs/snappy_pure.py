"""Pure-Python Snappy block decompressor (decode only).

The reference reads ORC-framed snappy chunks but cannot write them
(compressioncodec.go:222-300; the encoder errors at 290-300).  We match
that surface: decode-only, used by the ORC file reader for
snappy-compressed example files; the engine's own write path stays on
NONE/ZLIB exactly like the reference writer gate (writer.go:70-87).

Format (public Snappy spec): a varint uncompressed length followed by
tagged elements — literals and back-references with 1/2/4-byte offsets.
Python-loop speed (~5-20 MB/s) is fine for its only use here: golden
tests and legacy-file ingest.
"""

from __future__ import annotations


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
