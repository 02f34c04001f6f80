"""ORC RLE v1 integer codec.

Behavioral reference: scritchley/orc runlengthintegerwriter.go:7-159
(runs of 3..130 values with a fixed delta in [-128,127] emit
``[count-3][delta][base varint]``; literal groups of <=128 emit
``[256-n][n varints]``) and runlengthintegerreader.go:29-114.

The reference writer only ever uses RLE v2 for column data
(treewriter.go:221 DIRECT_V2), so v1 exists for format parity and for
the golden decode vectors; the encoder is a faithful per-value port,
the decoder is vectorized per segment.
"""

from __future__ import annotations

import numpy as np

from .bits import (
    U64_MASK,
    decode_varints,
    read_vslong,
    read_vulong,
    write_vslong,
    write_vulong,
    zigzag_decode,
)

MIN_REPEAT = 3
MAX_REPEAT = 127 + MIN_REPEAT
MIN_DELTA = -128
MAX_DELTA = 127
MAX_LITERAL = 128


def _wrap_i64(v: int) -> int:
    v &= U64_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def encode(values, signed: bool) -> bytes:
    out = bytearray()
    literals: list[int] = []
    repeat = False
    delta = 0
    tail = 0

    def write_val(v: int):
        if signed:
            write_vslong(out, v)
        else:
            write_vulong(out, v)

    def flush():
        nonlocal literals, repeat, tail
        if literals:
            if repeat:
                out.append(len(literals) - MIN_REPEAT)
                out.append(delta & 0xFF)
                write_val(literals[0])
            else:
                out.append((256 - len(literals)) & 0xFF)
                for v in literals:
                    write_val(v)
            repeat = False
            literals = []
            tail = 0

    for value in np.asarray(values, dtype=np.int64).tolist():
        if not literals:
            literals.append(value)
            tail = 1
        elif repeat:
            if value == _wrap_i64(literals[0] + delta * len(literals)):
                literals.append(value)
                if len(literals) == MAX_REPEAT:
                    flush()
            else:
                flush()
                literals.append(value)
                tail = 1
        else:
            if tail >= 2 and value == _wrap_i64(literals[-1] + delta):
                tail += 1
            else:
                # start (or restart) a candidate delta run
                delta = _wrap_i64(value - literals[-1])
                tail = 2 if MIN_DELTA <= delta <= MAX_DELTA else 1
            if tail == MIN_REPEAT:
                if len(literals) + 1 == MIN_REPEAT:
                    repeat = True
                    literals.append(value)
                else:
                    base = literals[-(MIN_REPEAT - 1)]
                    del literals[-(MIN_REPEAT - 1):]
                    flush()
                    repeat = True
                    literals = [base, _wrap_i64(base + delta), value]
            else:
                literals.append(value)
                if len(literals) == MAX_LITERAL:
                    flush()
    flush()
    return bytes(out)


def decode(data, n: int, signed: bool) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    out = np.empty(n, dtype=np.int64)
    got = 0
    pos = 0
    while got < n:
        h = int(buf[pos])
        pos += 1
        if h < 128:  # run with delta
            count = h + MIN_REPEAT
            delta = int(np.int8(buf[pos]))
            pos += 1
            if signed:
                base, pos = read_vslong(buf, pos)
            else:
                base, pos = read_vulong(buf, pos)
                base = _wrap_i64(base)
            with np.errstate(over="ignore"):
                seq = np.uint64(base & U64_MASK) + np.arange(
                    count, dtype=np.uint64) * np.uint64(delta & U64_MASK)
            out[got:got + count] = seq.view(np.int64)
            got += count
        else:
            count = 256 - h
            vals, pos = decode_varints(buf, pos, count)
            if signed:
                out[got:got + count] = zigzag_decode(vals)
            else:
                out[got:got + count] = vals.view(np.int64)
            got += count
    return out
