"""Pure-Python LZ4 block decompressor (decode only), for reading
lz4-compressed ORC files (public LZ4 block format spec).  Same
decode-only stance as snappy: the engine writes NONE/ZLIB like the
reference writer gate."""

from __future__ import annotations


def decompress(data: bytes, max_out: int | None = None) -> bytes:
    """``max_out`` bounds the decompressed size (decompression-bomb
    guard); truncated input raises instead of returning silently short
    data."""
    data = bytes(data)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("corrupt lz4: truncated literals")
        out += data[pos:pos + lit_len]
        pos += lit_len
        if max_out is not None and len(out) > max_out:
            raise ValueError("lz4 output exceeds max_out")
        if pos >= n:
            break  # last sequence is literals-only
        offset = int.from_bytes(data[pos:pos + 2], "little")
        pos += 2
        if offset == 0:
            raise ValueError("corrupt lz4: zero offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt lz4: offset before start")
        if offset >= match_len:
            out += out[start:start + match_len]
        else:
            for i in range(match_len):
                out.append(out[start + i])
        if max_out is not None and len(out) > max_out:
            raise ValueError("lz4 output exceeds max_out")
    return bytes(out)
