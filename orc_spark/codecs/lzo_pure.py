"""Pure-Python LZO1X decompressor (decode only), per the public LZO
stream documentation (Linux Documentation/lzo.txt), for reading
lzo-compressed ORC files."""

from __future__ import annotations


def _ext_length(data: bytes, pos: int, base: int) -> tuple[int, int]:
    """Run-length extension: base + 255 per zero byte + final byte."""
    length = base
    while data[pos] == 0:
        length += 255
        pos += 1
    length += data[pos]
    pos += 1
    return length, pos


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    pos = 0
    n = len(data)
    state = 0
    saw_eos = False

    t = data[pos]
    if t > 17:
        pos += 1
        t -= 17
        if t < 4:
            out += data[pos:pos + t]
            pos += t
            state = t
        else:
            out += data[pos:pos + t]
            pos += t
            state = 4

    while pos < n:
        t = data[pos]
        pos += 1
        if t >= 64:
            # M2: 1-byte-distance match
            length = (t >> 5) + 1
            d = data[pos]
            pos += 1
            offset = ((t >> 2) & 7) + (d << 3) + 1
            state = t & 3
        elif t >= 32:
            # M3
            length = t & 31
            if length == 0:
                length, pos = _ext_length(data, pos, 31)
            length += 2
            ds = data[pos] | (data[pos + 1] << 8)
            pos += 2
            offset = (ds >> 2) + 1
            state = ds & 3
        elif t >= 16:
            # M4 (far match / end marker)
            length = t & 7
            if length == 0:
                length, pos = _ext_length(data, pos, 7)
            length += 2
            ds = data[pos] | (data[pos + 1] << 8)
            pos += 2
            offset = ((t & 8) << 11) + (ds >> 2) + 16384
            if offset == 16384:
                saw_eos = True
                break  # end of stream
            state = ds & 3
        else:
            if state == 0:
                # long literal run
                length = t
                if length == 0:
                    length, pos = _ext_length(data, pos, 15)
                length += 3
                out += data[pos:pos + length]
                pos += length
                state = 4
                continue
            if state == 4:
                # 3-byte match at 2049+ distance
                length = 3
                d = data[pos]
                pos += 1
                offset = (t >> 2) + (d << 2) + 2049
            else:
                # 2-byte match, short distance
                length = 2
                d = data[pos]
                pos += 1
                offset = (t >> 2) + (d << 2) + 1
            state = t & 3
        # copy match
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt lzo: offset before start")
        if offset >= length:
            out += out[start:start + length]
        else:
            for i in range(length):
                out.append(out[start + i])
        # trailing literals encoded in state
        if state:
            out += data[pos:pos + state]
            pos += state
    if not saw_eos:
        # reference LZO decoders return LZO_E_EOF_NOT_FOUND here; a
        # truncated chunk must not come back as silently short data
        raise ValueError("corrupt lzo: stream ended without EOS marker")
    return bytes(out)
