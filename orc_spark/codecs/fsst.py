"""FSST: Fast Static Symbol Table string compression.

Implements the algorithm from "FSST: Fast Random Access String
Compression" (Boncz, Neumann, Leis — VLDB 2020; see PAPERS.md): a table
of up to 255 symbols, each 1-8 bytes, trained by iteratively counting
symbol (and symbol-pair) frequencies on a sample and keeping the
highest-gain symbols; encoding replaces greedy longest-match symbol
occurrences with 1-byte codes, escaping unmatched bytes as
``255, <byte>``.

This codec is NOT in the scritchley/orc reference — it is the
north-star extension codec offered as an additional candidate next to
DICT/DIRECT string encoding (chosen only when it wins on size), so it
is kept behind an explicit encoding name and excluded from
reference-parity tests.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
TRAIN_ITERATIONS = 5
SAMPLE_TARGET = 1 << 14  # 16 KiB training sample


class SymbolTable:
    __slots__ = ("symbols", "_by_first")

    def __init__(self, symbols: list[bytes]):
        self.symbols = symbols  # code -> symbol bytes
        # first byte -> [(symbol, code)] sorted by length desc (greedy
        # longest match)
        by_first: dict[int, list[tuple[bytes, int]]] = {}
        for code, sym in enumerate(symbols):
            by_first.setdefault(sym[0], []).append((sym, code))
        for lst in by_first.values():
            lst.sort(key=lambda t: -len(t[0]))
        self._by_first = by_first

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for sym in self.symbols:
            out.append(len(sym))
            out.extend(sym)
        return bytes(out)

    @classmethod
    def deserialize(cls, data, pos: int = 0) -> tuple["SymbolTable", int]:
        data = bytes(data)
        n = data[pos]
        pos += 1
        symbols = []
        for _ in range(n):
            ln = data[pos]
            pos += 1
            symbols.append(data[pos:pos + ln])
            pos += ln
        return cls(symbols), pos


def _sample(data: bytes) -> bytes:
    if len(data) <= SAMPLE_TARGET:
        return data
    # stride-sample 512-byte blocks across the input
    n_blocks = SAMPLE_TARGET // 512
    stride = len(data) // n_blocks
    return b"".join(
        data[i * stride:i * stride + 512] for i in range(n_blocks))


def train(data: bytes) -> SymbolTable:
    """Train a symbol table on (a sample of) ``data``.

    Bottom-up pair merging in the spirit of the FSST paper's
    make-sample + iterative count/merge loop: start from single bytes,
    repeatedly count occurrences of current symbols and concatenations
    of adjacent matches, keep the MAX_SYMBOLS highest-gain symbols.
    """
    sample = _sample(data)
    if not sample:
        return SymbolTable([])
    table = SymbolTable([bytes([b]) for b in sorted(set(sample))])
    for _ in range(TRAIN_ITERATIONS):
        counts: dict[bytes, int] = {}
        pos = 0
        prev: bytes | None = None
        n = len(sample)
        while pos < n:
            cands = table._by_first.get(sample[pos])
            match = None
            if cands:
                window = sample[pos:pos + MAX_SYMBOL_LEN]
                for sym, _code in cands:
                    if window.startswith(sym):
                        match = sym
                        break
            if match is None:
                match = sample[pos:pos + 1]
            counts[match] = counts.get(match, 0) + 1
            if prev is not None and len(prev) + len(match) <= MAX_SYMBOL_LEN:
                pair = prev + match
                counts[pair] = counts.get(pair, 0) + 1
            prev = match
            pos += len(match)
        # gain = count * len (bytes covered).  NOTE: no single-byte
        # priority floor — bytes not covered by any symbol fall back to
        # the 2-byte ESCAPE path, which on adversarial input expands
        # ~1.1x; callers gate on a 0.9 size ratio (stripe.py), so a
        # losing table is discarded rather than shipped
        scored = sorted(
            counts.items(), key=lambda kv: -(kv[1] * len(kv[0])))
        table = SymbolTable([s for s, _ in scored[:MAX_SYMBOLS]])
    return table


def compress(data: bytes, table: SymbolTable) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    by_first = table._by_first
    while pos < n:
        cands = by_first.get(data[pos])
        if cands:
            window = data[pos:pos + MAX_SYMBOL_LEN]
            for sym, code in cands:
                if window.startswith(sym):
                    out.append(code)
                    pos += len(sym)
                    break
            else:
                out.append(ESCAPE)
                out.append(data[pos])
                pos += 1
        else:
            out.append(ESCAPE)
            out.append(data[pos])
            pos += 1
    return bytes(out)


_BYTES = [bytes([i]) for i in range(256)]


def decompress(data: bytes, table: SymbolTable) -> bytes:
    """Decode via numpy classification + one join: true escape
    positions are found with run-parity arithmetic (in a run of
    consecutive ESCAPE bytes, escapes sit at even offsets — the odd
    ones are escaped literals), then codes/literals map through the
    symbol list in C-level list comprehensions.  Replaces the r2
    per-byte Python while-loop; byte-identical output."""
    symbols = table.symbols
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return b""
    esc = arr == ESCAPE
    if not esc.any():
        return b"".join([symbols[b] for b in arr])
    idx = np.arange(n)
    starts = esc & np.concatenate(([True], ~esc[:-1]))
    last_start = np.maximum.accumulate(np.where(starts, idx, -1))
    true_esc = esc & (((idx - last_start) & 1) == 0)
    lit = np.zeros(n, dtype=bool)
    le = idx[true_esc] + 1
    lit[le[le < n]] = True
    codes = ~true_esc & ~lit
    out = np.empty(n, dtype=object)
    out[true_esc] = b""
    out[lit] = [_BYTES[v] for v in arr[lit]]
    out[codes] = [symbols[v] for v in arr[codes]]
    return b"".join(out.tolist())


def encode_blob(data: bytes) -> bytes:
    """Self-contained FSST frame: [table][varint orig_len][payload]."""
    table = train(data)
    payload = compress(data, table)
    header = table.serialize()
    out = bytearray()
    out.extend(len(header).to_bytes(4, "little"))
    out.extend(header)
    out.extend(len(payload).to_bytes(4, "little"))
    out.extend(payload)
    return bytes(out)


def decode_blob(frame: bytes) -> bytes:
    frame = bytes(frame)
    hlen = int.from_bytes(frame[:4], "little")
    table, _ = SymbolTable.deserialize(frame[4:4 + hlen])
    plen = int.from_bytes(frame[4 + hlen:8 + hlen], "little")
    payload = frame[8 + hlen:8 + hlen + plen]
    return decompress(payload, table)
