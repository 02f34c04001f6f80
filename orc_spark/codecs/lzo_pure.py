"""Pure-Python LZO1X codec, per the public LZO stream documentation
(Linux Documentation/lzo.txt), for reading and writing lzo-compressed
ORC files.  The reference (compressioncodec.go:290-300) can only
decode lzo; the encoder here goes beyond it (r5), emitting the
LZO1X-1 instruction alphabet any conforming decoder accepts."""

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


def _emit_ext(out: bytearray, rem: int) -> None:
    """Extension bytes for a length that exceeds its field: 255 per
    zero byte, then a final 1..255 byte (a 0 final byte would read as
    another zero extension, so rem is split accordingly)."""
    k = (rem - 1) // 255
    out += b"\x00" * k
    out.append(rem - 255 * k)


def _emit_literals(out: bytearray, data: bytes, lo: int, hi: int,
                   state_idx: int) -> None:
    """Emit the literal run data[lo:hi].  Runs of 1-3 ride in the
    low 2 state bits of the PREVIOUS match instruction (byte index
    ``state_idx``); longer runs get a literal-run instruction, which
    the decoder only accepts while state==0 (guaranteed: the previous
    instruction's state bits were left 0).  At stream start (no
    previous instruction) short runs use the >17 first-byte form."""
    run = hi - lo
    if run == 0:
        return
    if run <= 3:
        if state_idx < 0:
            out.append(17 + run)       # first-byte short-literal form
        else:
            out[state_idx] |= run
    elif run <= 18:
        out.append(run - 3)
    else:
        out.append(0)
        _emit_ext(out, run - 18)       # base 15 (+3 later) = 18
    out += data[lo:hi]


def compress(data: bytes) -> bytes:
    """Greedy single-entry 4-byte hash LZO1X-1 style encoder.  Only
    state-independent match forms are emitted (M2 t>=64, M3 t>=32,
    M4 t>=16), so the decoder's literal/short-match state machine is
    exercised exactly as documented: literal runs of 1-3 are stuffed
    into the preceding instruction's low bits, longer runs use the
    state==0 literal-run instruction.  Max match distance 0xBFFF; the
    M4 offset==16384 encoding is reserved for EOS (distance 16384
    itself always goes out as M3, so no collision)."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    pos = 0
    anchor = 0
    state_idx = -1                     # byte carrying the state bits
    limit = n - 4
    while pos <= limit:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xBFFF:
            pos += 1
            continue
        # extend the match in slices (overlapping compares are fine:
        # both sides are raw input bytes)
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
        _emit_literals(out, data, anchor, pos, state_idx)
        off = pos - cand
        if ml <= 8 and off <= 2048:
            # M2: 1-byte distance tail, length 3..8
            v = off - 1
            state_idx = len(out)
            out.append(((ml - 1) << 5) | ((v & 7) << 2))
            out.append(v >> 3)
        elif off <= 16384:
            # M3: 14-bit distance, unbounded length
            length = ml - 2
            if length <= 31:
                out.append(32 | length)
            else:
                out.append(32)
                _emit_ext(out, length - 31)
            ds = (off - 1) << 2
            state_idx = len(out)
            out.append(ds & 0xFF)
            out.append(ds >> 8)
        else:
            # M4: far match, distance 16385..49151 (h >= 1 here, so
            # the EOS encoding offset==16384 can never be produced)
            h = off - 16384
            length = ml - 2
            t = 16 | (((h >> 14) & 1) << 3)
            if length <= 7:
                out.append(t | length)
            else:
                out.append(t)
                _emit_ext(out, length - 7)
            ds = (h & 0x3FFF) << 2
            state_idx = len(out)
            out.append(ds & 0xFF)
            out.append(ds >> 8)
        pos += ml
        anchor = pos
    _emit_literals(out, data, anchor, n, state_idx)
    out += b"\x11\x00\x00"             # EOS: M4 with offset 16384
    return bytes(out)


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
