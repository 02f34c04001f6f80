"""Pure-numpy baseline TIFF codec (TIFF 6.0).

Decode covers the baseline profile real corpora contain: II/MM byte
orders, IFD tag walk, strip-based storage (multiple strips,
RowsPerStrip), 8-bit gray / RGB / RGBA (alpha dropped) / palette
images, uncompressed + PackBits + LZW compression (TIFF's LZW is
MSB-first with the EARLY code-width change, unlike GIF's LSB-first
late change), and the horizontal-differencing predictor (tag 317)
used with LZW.  Tiled TIFFs, 16-bit samples and planar configuration
2 reject loudly.

Encode emits uncompressed or PackBits RGB/gray (single strip) —
lossless, so fixtures round-trip bit-exactly; the LZW decoder is
additionally pinned against a hand-built stream and the horizontal
predictor against its own inverse.
"""

from __future__ import annotations

import struct

import numpy as np

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_PACKBITS = 32773


def _unpackbits(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and (i - lit) < 128:
            if i + 2 < n and data[i] == data[i + 1] == data[i + 2]:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, CLEAR=256, EOI=257,
    code width grows at table size 511/1023/2047 (one code EARLIER
    than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitpos = 0
    nbits = 9
    table: list[bytes] = []

    def reset():
        nonlocal table, nbits
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        nbits = 9

    reset()
    prev = None
    total_bits = len(data) * 8
    while len(out) < expect and bitpos + nbits <= total_bits:
        byte0 = bitpos >> 3
        acc = int.from_bytes(data[byte0:byte0 + 4].ljust(4, b"\0"),
                             "big")
        code = (acc >> (32 - (bitpos & 7) - nbits)) & \
            ((1 << nbits) - 1)
        bitpos += nbits
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: LZW code out of range")
        out += entry
        prev = entry
        # EARLY change: width grows when the NEXT code would not fit
        if len(table) + 1 >= (1 << nbits) and nbits < 12:
            nbits += 1
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Fixture-grade TIFF LZW encoder (exercises the decoder's
    early-change path)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    accbits = 0
    nbits = 9

    def emit(code):
        nonlocal acc, accbits
        acc = (acc << nbits) | code
        accbits += nbits
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)
        acc &= (1 << accbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4094:
            table[wc] = next_code
            next_code += 1
            # the decoder is one appended entry behind the encoder,
            # so it crosses the early-change threshold one emission
            # later: grow when next_code reaches 2^n, not 2^n - 1
            if next_code >= (1 << nbits) and nbits < 12:
                nbits += 1
        else:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(EOI)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _read_ifd(d: bytes, bo: str, off: int
              ) -> tuple[dict[int, tuple], int]:
    """IFD at ``off`` -> (tags, next-IFD offset; 0 = last page)."""
    n = struct.unpack_from(bo + "H", d, off)[0]
    tags = {}
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    fmts = {1: "B", 3: "H", 4: "I"}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI",
                                           d, off + 2 + i * 12)
        vpos = off + 2 + i * 12 + 8
        total = sizes.get(typ, 1) * cnt
        if total > 4:
            vpos = struct.unpack_from(bo + "I", d, vpos)[0]
        if typ in fmts:
            vals = struct.unpack_from(bo + str(cnt) + fmts[typ],
                                      d, vpos)
        elif typ == 5:       # rational
            raw = struct.unpack_from(bo + str(cnt * 2) + "I", d, vpos)
            vals = tuple(raw[j] / max(1, raw[j + 1])
                         for j in range(0, len(raw), 2))
        else:
            vals = (d[vpos:vpos + total],)
        tags[tag] = vals
    nxt = struct.unpack_from(bo + "I", d, off + 2 + n * 12)[0]
    return tags, nxt


def _byte_order(d: bytes) -> str:
    if d[:4] == b"II*\x00":
        return "<"
    if d[:4] == b"MM\x00*":
        return ">"
    raise ValueError("not a TIFF payload")


def decode_tiff_pages(payload: bytes) -> list[np.ndarray]:
    """Multi-page TIFF (IFD chain) -> list of (h, w, 3) RGB uint8
    frames — the scanned-document layout."""
    d = bytes(payload)
    bo = _byte_order(d)
    off = struct.unpack_from(bo + "I", d, 4)[0]
    pages = []
    seen = set()
    while off and off not in seen:
        seen.add(off)                    # cycle guard
        tags, off = _read_ifd(d, bo, off)
        pages.append(_decode_ifd(d, bo, tags))
    if not pages:
        raise ValueError("tiff: no pages")
    return pages


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF -> (h, w, 3) RGB uint8 (first page)."""
    d = bytes(payload)
    bo = _byte_order(d)
    tags, _ = _read_ifd(d, bo, struct.unpack_from(bo + "I", d, 4)[0])
    return _decode_ifd(d, bo, tags)


def _decode_ifd(d: bytes, bo: str, tags: dict) -> np.ndarray:
    w = tags[256][0]
    h = tags[257][0]
    spp = tags.get(277, (1,))[0]
    bits = tags.get(258, (8,) * spp)
    comp = tags.get(259, (_COMP_NONE,))[0]
    photo = tags.get(262, (1,))[0]
    predictor = tags.get(317, (1,))[0]
    planar = tags.get(284, (1,))[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"tiff: {bits}-bit samples unsupported "
                         f"(baseline 8-bit only)")
    if planar != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiff: tiled layout unsupported (strips only)")
    offsets = tags[273]
    counts = tags.get(279, (len(d) - offsets[0],))
    rows_per_strip = tags.get(278, (h,))[0]
    raw = bytearray()
    rows_done = 0
    for k, (o, c) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - rows_done)
        expect = nrows * w * spp
        chunk = d[o:o + c]
        if comp == _COMP_NONE:
            strip = chunk[:expect]
        elif comp == _COMP_PACKBITS:
            strip = _unpackbits(chunk, expect)
        elif comp == _COMP_LZW:
            strip = _lzw_decode_tiff(chunk, expect)
        else:
            raise ValueError(f"tiff: compression {comp} unsupported "
                             f"(none/LZW/PackBits)")
        if len(strip) < expect:
            raise ValueError("tiff: strip shorter than declared")
        if predictor == 2:   # horizontal differencing per row/sample
            a = np.frombuffer(strip, np.uint8, expect).reshape(
                nrows, w, spp).astype(np.uint8).copy()
            np.cumsum(a, axis=1, dtype=np.uint8, out=a)
            strip = a.tobytes()
        raw += strip
        rows_done += nrows
    px = np.frombuffer(bytes(raw), np.uint8,
                       h * w * spp).reshape(h, w, spp)
    if photo == 3:           # palette: 16-bit colormap, R then G then B
        cmap = tags[320]
        ncol = len(cmap) // 3
        pal = (np.array(cmap, np.uint32).reshape(3, ncol).T >> 8) \
            .astype(np.uint8)
        return pal[px[:, :, 0]]
    if photo in (0, 1):      # gray (0 = white-is-zero)
        g = px[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    if photo == 2:           # RGB(A)
        if spp < 3:
            raise ValueError("tiff: RGB image with <3 samples")
        return px[:, :, :3].copy()
    raise ValueError(f"tiff: photometric {photo} unsupported")


def encode_tiff(arr, compression: str = "none") -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 — or a LIST of such arrays
    for a multi-page file (IFD chain) — to little-endian baseline
    TIFF (single strip per page; compression "none", "packbits" or
    "lzw")."""
    pages = arr if isinstance(arr, (list, tuple)) else [arr]
    if not pages:
        raise ValueError("tiff: need at least one page")
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)          # first IFD right after header
    next_ptr_pos = 4                     # where the IFD offset lives
    for page in pages:
        a = np.asarray(page, np.uint8)
        gray = a.ndim == 2
        h, w = a.shape[:2]
        spp = 1 if gray else 3
        data = a.tobytes()
        if compression == "none":
            comp_code, body = _COMP_NONE, data
        elif compression == "packbits":
            comp_code, body = _COMP_PACKBITS, _packbits(data)
        elif compression == "lzw":
            comp_code, body = _COMP_LZW, _lzw_encode_tiff(data)
        else:
            raise ValueError(
                f"tiff: unknown compression {compression!r}")
        if len(out) & 1:
            out += b"\x00"               # IFDs must be word-aligned
        ifd_off = len(out)
        struct.pack_into("<I", out, next_ptr_pos, ifd_off)
        entries = [
            (256, 3, 1, w), (257, 3, 1, h),
            (259, 3, 1, comp_code),
            (262, 3, 1, 1 if gray else 2),
            (277, 3, 1, spp),
            (278, 3, 1, h),
            (279, 4, 1, len(body)),
        ]
        nent = len(entries) + 2          # + bits + strip offset
        data_off = ifd_off + 2 + nent * 12 + 4
        extra = bytearray()
        if gray:
            bits_entry = (258, 3, 1, 8)
        else:
            bits_entry = (258, 3, 3, data_off)
            extra += struct.pack("<3H", 8, 8, 8) + b"\x00\x00"
        strip_off = data_off + len(extra)
        entries = sorted(entries + [bits_entry,
                                    (273, 4, 1, strip_off)])
        out += struct.pack("<H", nent)
        for tag, typ, cnt, val in entries:
            out += struct.pack("<HHI", tag, typ, cnt)
            if typ == 3 and cnt == 1:
                out += struct.pack("<HH", val, 0)
            else:
                out += struct.pack("<I", val)
        next_ptr_pos = len(out)          # this IFD's next pointer
        out += struct.pack("<I", 0)      # patched by the next page
        out += extra
        out += body
    return bytes(out)
