"""Byte-level RLE codec (ORC byte runs) and the boolean bit codec.

Behavioral reference: scritchley/orc runlengthbytewriter.go:22-119 /
runlengthbytereader.go:17-99 (byte RLE: runs of >=3 equal bytes emit
``[count-3][value]``, literal groups of <=128 emit ``[256-n][bytes]``)
and booleanwriter.go:13-62 (8 bools packed MSB-first into a byte, then
byte-RLE). Encodes are run-level numpy simulations of the per-byte
state machines (bit-identical); ``encode_slow`` is the per-byte port
used by tests for cross-validation.
"""

from __future__ import annotations

import numpy as np

MIN_REPEAT = 3
MAX_REPEAT = 127 + MIN_REPEAT  # 130
MAX_LITERAL = 128


def encode(data) -> bytes:
    """Bit-identical byte-RLE encode of a uint8 array / bytes."""
    a = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.ascontiguousarray(
            data, dtype=np.uint8)
    n = len(a)
    out = bytearray()
    if n == 0:
        return bytes(out)

    change = np.flatnonzero(np.diff(a)) + 1
    starts = np.empty(len(change) + 1, dtype=np.int64)
    starts[0] = 0
    starts[1:] = change
    ends = np.append(starts[1:], n)

    mv = a  # indexable
    lit = 0  # pending literal count
    rep = 0  # pending repeat count
    rep_val = 0

    def emit_literals(end_idx: int, count: int):
        # literal group header: byte(-n), then the n bytes
        out.append((256 - count) & 0xFF)
        out.extend(mv[end_idx - count:end_idx].tobytes())

    def emit_repeat(value: int, count: int):
        out.append(count - MIN_REPEAT)
        out.append(value)

    for ri in range(len(starts)):
        s = int(starts[ri])
        e = int(ends[ri])
        v = int(a[s])
        j = s
        if rep:
            # pending repeat ends (value differs): flush it
            emit_repeat(rep_val, rep)
            rep = 0
        tail = 0  # within-run bytes currently in the literal buffer
        while j < e:
            # feed bytes that cannot complete a triple
            room = min(e - j, 2 - tail)
            while room > 0:
                take = min(room, MAX_LITERAL - lit)
                lit += take
                tail += take
                j += take
                room -= take
                if lit == MAX_LITERAL:
                    emit_literals(j, MAX_LITERAL)
                    lit = 0
                    tail = 0
                    room = min(e - j, 2 - tail)
            if j >= e:
                break
            # third consecutive equal byte: convert to repeat
            j += 1
            if lit - 2 > 0:
                emit_literals(j - 3, lit - 2)
            lit = 0
            rep = 3
            # accumulate the rest of the run as repeats
            while j < e:
                take = min(e - j, MAX_REPEAT - rep)
                rep += take
                j += take
                if rep == MAX_REPEAT:
                    emit_repeat(v, MAX_REPEAT)
                    rep = 0
                    if j < e:
                        tail = 0
                        break  # back to literal phase for run remainder
            else:
                break  # run exhausted with pending repeat
            if rep == 0 and j >= e:
                break
            if rep:
                break
        if rep:
            rep_val = v
    # final flush
    if rep:
        emit_repeat(rep_val, rep)
    elif lit:
        emit_literals(int(ends[-1]), lit)
    return bytes(out)


def encode_slow(data) -> bytes:
    """Per-byte port of the reference state machine (tests only)."""
    a = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    out = bytearray()
    literals: list[int] = []
    repeat = False
    tail = 0

    def flush():
        nonlocal literals, repeat, tail
        if literals:
            if repeat:
                out.append(len(literals) - MIN_REPEAT)
                out.append(literals[0])
            else:
                out.append((256 - len(literals)) & 0xFF)
                out.extend(literals)
            repeat = False
            tail = 0
            literals = []

    for value in a.tolist():
        if not literals:
            literals.append(value)
            tail = 1
        elif repeat:
            if value == literals[0]:
                literals.append(value)
                if len(literals) == MAX_REPEAT:
                    flush()
            else:
                flush()
                literals.append(value)
                tail = 1
        else:
            if value == literals[-1]:
                tail += 1
            else:
                tail = 1
            if tail == MIN_REPEAT:
                if len(literals) + 1 == MIN_REPEAT:
                    repeat = True
                    literals.append(value)
                else:
                    del literals[-(MIN_REPEAT - 1):]
                    flush()
                    literals = [value] * MIN_REPEAT
                    repeat = True
            else:
                literals.append(value)
                if len(literals) == MAX_LITERAL:
                    flush()
    flush()
    return bytes(out)


def decode(data, n: int) -> np.ndarray:
    """Decode n bytes from a byte-RLE stream -> uint8 array."""
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    out = np.empty(n, dtype=np.uint8)
    got = 0
    pos = 0
    while got < n:
        h = int(buf[pos])
        pos += 1
        if h < 128:  # repeat
            count = min(h + MIN_REPEAT, n - got)
            out[got:got + count] = buf[pos]
            pos += 1
            got += count
        else:  # literals
            count = 256 - h
            take = min(count, n - got)
            out[got:got + take] = buf[pos:pos + take]
            pos += count
            got += take
    return out


# ---------------------------------------------------------------------------
# Boolean codec: MSB-first bit packing + byte RLE (booleanwriter.go:13-62)
# ---------------------------------------------------------------------------


def encode_bools(bits) -> bytes:
    b = np.ascontiguousarray(bits, dtype=bool)
    packed = np.packbits(b)  # MSB-first, zero-padded
    return encode(packed)


def decode_bools(data, n_bits: int) -> np.ndarray:
    n_bytes = (n_bits + 7) // 8
    packed = decode(data, n_bytes)
    return np.unpackbits(packed, count=n_bits).astype(bool)
