"""Pure-numpy GIF codec (GIF87a/89a).

Decode handles what real corpora contain: global/local color tables,
variable-width LSB-first LZW with CLEAR/END codes, dictionary growth
to 12 bits and deferred-clear streams, interlaced images (the four
row passes), multi-frame animations with graphic-control extensions
(frame delays, transparency index, disposal methods 0-3 including
restore-to-background and restore-to-previous), and sub-block framed
data.  Unknown extension blocks are skipped by their sub-block
structure.

Encode emits grayscale-palette GIF89a (optionally animated with
per-frame delays) — GIF is lossless, so encoded fixtures decode
bit-exactly and carry exact DuckDB oracles, the same pattern as the
BMP/PNG rows.  Everything follows the public GIF89a specification;
no reference-repo counterpart exists (the reference decodes no media
formats at all).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# -------------------------------------------------------------------
# LZW (variable-width, LSB-first, per GIF89a appendix F)
# -------------------------------------------------------------------


def _lzw_decode(min_code: int, data: bytes, npix: int) -> np.ndarray:
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    codesize = min_code + 1
    out = np.empty(npix + 4096, np.uint8)    # slack for last entry
    n = 0
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    while n < npix:
        while nbits < codesize:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << codesize) - 1)
        acc >>= codesize
        nbits -= codesize
        if code == clear:
            table = list(base)
            codesize = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out[n:n + len(entry)] = np.frombuffer(entry, np.uint8)
        n += len(entry)
        prev = entry
        if len(table) == (1 << codesize) and codesize < 12:
            codesize += 1
    return out[:npix]


def _lzw_encode(min_code: int, pixels: bytes) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    codesize = min_code + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += codesize
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for px in pixels:
        wc = w + bytes([px])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << codesize) + 1 and codesize < 12:
                codesize += 1
        else:                       # table full: reset both sides
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            codesize = min_code + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -------------------------------------------------------------------
# container
# -------------------------------------------------------------------


def _read_color_table(d: bytes, pos: int, n: int):
    tbl = np.frombuffer(d, np.uint8, n * 3, pos).reshape(n, 3).copy()
    return tbl, pos + n * 3


def _read_subblocks(d: bytes, pos: int):
    chunks = []
    while True:
        sz = d[pos]
        pos += 1
        if sz == 0:
            break
        chunks.append(d[pos:pos + sz])
        pos += sz
    return b"".join(chunks), pos


def decode_gif_frames(payload: bytes):
    """GIF bytes -> (frames, delays_ms): full-canvas (h, w, 3) RGB
    uint8 frames composited per the disposal rules, and per-frame
    delays in milliseconds (0 for still images)."""
    d = bytes(payload)
    if d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", d, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(d, pos, 2 << (flags & 7))
    if gct is not None and bg < len(gct):
        canvas = np.empty((h, w, 3), np.uint8)
        canvas[:, :] = gct[bg]
    else:
        canvas = np.zeros((h, w, 3), np.uint8)
    frames = []
    delays = []
    delay_ms = 0
    transparent = None
    disposal = 0
    prev_canvas = None
    while pos < len(d):
        b = d[pos]
        pos += 1
        if b == 0x3B:            # trailer
            break
        if b == 0x21:            # extension
            label = d[pos]
            pos += 1
            if label == 0xF9:    # graphic control
                blk, pos = _read_subblocks(d, pos)
                gflags = blk[0]
                disposal = (gflags >> 2) & 7
                delay_ms = struct.unpack_from("<H", blk, 1)[0] * 10
                transparent = blk[3] if gflags & 1 else None
            else:                # app / comment / plain text: skip
                _, pos = _read_subblocks(d, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unknown block 0x{b:02X}")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", d,
                                                       pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            pal, pos = _read_color_table(d, pos, 2 << (iflags & 7))
        if pal is None:
            raise ValueError("gif: image without a color table")
        min_code = d[pos]
        pos += 1
        data, pos = _read_subblocks(d, pos)
        idx = _lzw_decode(min_code, data, iw * ih)
        if iflags & 0x40:        # interlaced: reorder rows
            rows = np.empty(ih, np.int64)
            r = 0
            for start, step in _INTERLACE:
                for y in range(start, ih, step):
                    rows[y] = r
                    r += 1
            idx = idx.reshape(ih, iw)[rows].reshape(-1)
        idx = idx.reshape(ih, iw)
        if disposal == 3:
            prev_canvas = canvas.copy()
        rect = canvas[top:top + ih, left:left + iw]
        rgb = pal[np.clip(idx, 0, len(pal) - 1)]
        if transparent is not None:
            opaque = idx != transparent
            rect[opaque] = rgb[opaque]
        else:
            rect[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:        # restore rect to background
            if gct is not None and bg < len(gct):
                canvas[top:top + ih, left:left + iw] = gct[bg]
            else:
                canvas[top:top + ih, left:left + iw] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
            prev_canvas = None
    if not frames:
        raise ValueError("gif: no image data")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First (composited) frame as (h, w, 3) RGB uint8."""
    return decode_gif_frames(payload)[0][0]


def encode_gif(frames, delays_ms=None) -> bytes:
    """Grayscale frames -> GIF89a bytes.  ``frames``: one (h, w)
    uint8 array or a list of them (animation); ``delays_ms``:
    per-frame delays (rounded down to 10 ms ticks).  The 256-entry
    grayscale global palette makes the encode lossless."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, np.uint8) for f in frames]
    if any(f.ndim != 2 for f in frames):
        raise ValueError("encode_gif takes grayscale (h, w) frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("gif: all frames must share one shape")
    if delays_ms is None:
        delays_ms = [0] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)   # GCT, 256 gray
    for i in range(256):
        out += bytes([i, i, i])
    animated = len(frames) > 1
    for f, delay in zip(frames, delays_ms):
        if animated or delay:
            out += b"\x21\xF9\x04" + bytes([0x04]) + \
                struct.pack("<H", delay // 10) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += b"\x08"                               # min LZW code
        comp = _lzw_encode(8, f.tobytes())
        for i in range(0, len(comp), 255):
            chunk = comp[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
