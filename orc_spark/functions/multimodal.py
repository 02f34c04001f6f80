"""Multimodal (image/audio/video) column operators.

Media ride as opaque ``binary`` payload columns with typed metadata;
all transforms run as Arrow-batched kernels over ``mapInPandas`` /
``mapInArrow``.

REAL decoders (r4, pure numpy — no codec libraries needed):

* ``decode_bmp`` — uncompressed 24-bit Windows BMP (BITMAPINFOHEADER,
  bottom-up or top-down, 4-byte row padding) -> (h, w, 3) RGB uint8.
* ``decode_ppm`` — binary P6 PPM (comments + whitespace grammar,
  maxval <= 255) -> (h, w, 3) RGB uint8.
* ``decode_wav`` — RIFF/WAVE PCM (8-bit unsigned / 16-bit signed,
  any channel count; chunk-walking parser) -> (n, ch) samples + rate.
* ``decode_png`` (r5) — 8-bit gray/RGB/RGBA non-interlaced PNG:
  chunk walk with CRC verification, stdlib-zlib inflate, all five
  scanline filters (None/Sub/Up/Average/Paeth) -> (h, w, 3) RGB.
* ``jpeg_pure.decode_jpeg`` (r5) — baseline JPEG (SOF0): huffman
  entropy decode, gray/4:4:4/4:2:2/4:2:0 subsampling, restart
  markers, batched-einsum IDCT, YCbCr->RGB; ``encode_jpeg`` emits
  baseline 4:4:4/gray with the spec's Annex K tables.  Verified
  against real libjpeg-produced files (tests decode them) and
  q=100 round-trips within +-3/255 on noise.

All container formats are fully public (BMP and WAVE documented by
Microsoft, PPM by netpbm, PNG by the W3C spec, JPEG — baseline AND
progressive as of r5 — by ITU-T T.81, GIF by the GIF89a spec; the
relevant patents expired decades ago) — exactly the "decode behind
the mapInPandas surface" the brief asks for without shipping a codec
stack.  ``extract_features`` dispatches on mime and produces
fixed-width pixel/sample statistics; ``media_frame_stats`` decodes
every frame of animated GIFs and of AVI videos (RIFF container walk
+ MJPEG/DIB frame codecs — real temporal media end-to-end).  The
remaining formats (MP3, modern video codecs like H.264) still raise
NotImplementedError — plug PIL/ffmpeg into the same kernel seam on
a production cluster.
``_fake_decode`` remains only for the legacy ``image/x-fake`` mime
used by the plumbing oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])


def synthesize_media(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents (payload =
    utf-8 text bytes), used to exercise the plumbing end to end."""
    return docs.select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string"))
        .alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/x-fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.pmod(F.xxhash64("text"), F.lit(512)) + 32).cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(512)) + 32).cast("int")
        .alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


FEATURE_DIM = 16


# -------------------------------------------------------------------
# real container codecs (pure numpy)
# -------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> uncompressed 24-bit BMP (bottom-up,
    rows padded to 4 bytes — the standard Windows layout)."""
    import struct
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    # pixel data: bottom-up row order, BGR channel order, padded rows
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) RGB uint8.  Handles
    bottom-up (positive height) and top-down (negative) rasters and
    4-byte row padding; rejects compressed/paletted variants loudly."""
    import struct
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = (w * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("BMP payload shorter than raster")
    rows = np.frombuffer(payload, np.uint8, row_bytes * h, data_off) \
        .reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> binary P6 PPM."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) RGB uint8 (netpbm grammar: '#'
    comments and arbitrary whitespace between header tokens; a single
    whitespace byte separates maxval from the raster)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError("PPM payload shorter than raster")
    return np.frombuffer(payload, np.uint8, need, pos) \
        .reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples, (n,) mono or (n, ch) -> RIFF/WAVE PCM16."""
    import struct
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> ((n, ch) int16 samples, sample_rate).  Walks
    chunks (fmt may be followed by LIST/fact before data); 8-bit
    unsigned PCM is centered to int16 range; rejects non-PCM loudly."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM WAV supported (fmt={audio_fmt})")
    if bits == 16:
        s = np.frombuffer(data, "<i2")
    elif bits == 8:
        s = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    return s.reshape(-1, ch), rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data +
            struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 -> PNG
    (8-bit, non-interlaced).  Rows are filtered with type ``row % 5``
    — filtering uses RAW neighbors so it vectorizes whole-row, and
    cycling through None/Sub/Up/Average/Paeth means a decoder must
    implement every filter correctly to round-trip."""
    import struct
    import zlib
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"encode_png: {ch} channels unsupported")
    raw = a.reshape(h, w * ch).astype(np.int16)
    up = np.vstack([np.zeros((1, w * ch), np.int16), raw[:-1]])
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    ul = np.zeros_like(raw)
    ul[1:, ch:] = raw[:-1, :-ch]
    # Paeth predictor, whole-array (PNG spec §9.4)
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    paeth = np.where((pa <= pb) & (pa <= pc), left,
                     np.where(pb <= pc, up, ul))
    preds = [np.zeros_like(raw), left, up, (left + up) // 2, paeth]
    out = bytearray()
    for r in range(h):
        ft = r % 5
        out.append(ft)
        out += ((raw[r] - preds[ft][r]) % 256).astype(np.uint8) \
            .tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) +
            _png_chunk(b"IDAT", zlib.compress(bytes(out), 6)) +
            _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) RGB uint8 (r5, pure numpy + stdlib zlib —
    PNG is DEFLATE (we already ship inflate for ORC zlib chunks) plus
    the five scanline filters of spec §9).  Supports 8-bit gray /
    RGB / RGBA, non-interlaced; gray broadcasts to 3 channels, alpha
    is dropped (feature pipelines read color planes).  CRCs are
    verified; palette/16-bit/interlaced variants reject loudly.
    Up is whole-row vectorized; Sub/Average/Paeth recurrences run
    per-byte within a row (sequential by construction)."""
    import struct
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + ln]
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"interlace={interlace})")
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color} "
                         f"(palette needs PLTE handling)")
    data = zlib.decompress(bytes(idat))
    rb = w * ch
    if len(data) != h * (rb + 1):
        raise ValueError("PNG raster length mismatch")
    out = np.zeros((h, rb), np.uint8)
    prev = np.zeros(rb, np.int32)
    for r in range(h):
        ft = data[r * (rb + 1)]
        cur = np.frombuffer(data, np.uint8, rb,
                            r * (rb + 1) + 1).astype(np.int32)
        if ft == 0:
            pass
        elif ft == 2:                      # Up: whole-row
            cur = (cur + prev) % 256
        elif ft in (1, 3, 4):              # left-recurrent filters
            row = cur.tolist()
            pv = prev.tolist()
            for i in range(rb):
                a = row[i - ch] if i >= ch else 0
                if ft == 1:
                    row[i] = (row[i] + a) & 0xFF
                elif ft == 3:
                    row[i] = (row[i] + ((a + pv[i]) >> 1)) & 0xFF
                else:
                    b = pv[i]
                    c = pv[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                    row[i] = (row[i] + pr) & 0xFF
            cur = np.array(row, np.int32)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2).copy()
    return px[:, :, :3].copy()


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """(h0, w0, 3) -> (h, w, 3) nearest-neighbor resize, pure numpy
    index arithmetic (the standard training-pipeline pre-resize)."""
    h0, w0, _ = arr.shape
    yi = (np.arange(h) * h0) // h
    xi = (np.arange(w) * w0) // w
    return arr[yi][:, xi]


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    a real deployment replaces this with PIL/torch decode.  Raises
    NotImplementedError for kinds we do not fake.  NULL payloads
    (nullable column) decode to the zero vector like empty ones."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = np.frombuffer(payload, dtype=np.uint8)
    if len(h) == 0:
        return np.zeros(dim, dtype=np.float32)
    # means in float64, quantized to float32 at the end — exactly
    # mirrorable by an independent oracle (double mean -> REAL cast)
    chunks = np.array_split(h.astype(np.float64), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                    dtype=np.float32)


# deterministic synthetic rasters/samples: pixel/sample i of doc d is
# a pure function of (d, i) — the DuckDB oracle recomputes the same
# values with list_transform(range(...)) and must match bit-exactly
MEDIA_W, MEDIA_H = 24, 16
MEDIA_SAMPLES, MEDIA_RATE = 480, 8000


def _pixels_for(seed: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return ((seed * 7 + i * 13) % 256).astype(np.uint8)


def _samples_for(seed: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return (((seed * 31 + i * 17) % 65536) - 32768).astype(np.int16)


def synthesize_real_media(spark, docs: DataFrame) -> DataFrame:
    """REAL container payloads (r4): even doc_ids become 24x16
    24-bit BMP images, odd doc_ids 480-sample PCM16 WAVs — rasters
    and samples are deterministic functions of doc_id so an oracle
    can recompute the decoded statistics independently.  Built in an
    Arrow-batched kernel (byte assembly is not a Catalyst job)."""
    out_schema = MEDIA_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    arr = _pixels_for(d, MEDIA_W * MEDIA_H * 3) \
                        .reshape(MEDIA_H, MEDIA_W, 3)
                    rows["media_id"].append(f"bmp-{d}")
                    rows["kind"].append("image")
                    rows["mime"].append("image/bmp")
                    rows["payload"].append(encode_bmp(arr))
                    rows["width"].append(MEDIA_W)
                    rows["height"].append(MEDIA_H)
                    rows["duration_ms"].append(None)
                else:
                    s = _samples_for(d, MEDIA_SAMPLES)
                    rows["media_id"].append(f"wav-{d}")
                    rows["kind"].append("audio")
                    rows["mime"].append("audio/wav")
                    rows["payload"].append(encode_wav(s, MEDIA_RATE))
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["duration_ms"].append(
                        MEDIA_SAMPLES * 1000 // MEDIA_RATE)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, out_schema)


def _png_pixels_for(seed: int, n: int) -> np.ndarray:
    # distinct formula from _pixels_for so a PNG-path bug can't hide
    # behind the BMP oracle's identical statistics
    i = np.arange(n, dtype=np.int64)
    return ((seed * 11 + i * 19) % 256).astype(np.uint8)


def synthesize_png_media(spark, docs: DataFrame) -> DataFrame:
    """REAL PNG payloads (r5): every doc becomes a 24x16 RGB PNG
    whose pixel i is ``(doc_id*11 + i*19) % 256`` — rows are filtered
    with cycling types (row % 5), so decoding exercises all five
    scanline filters; the oracle recomputes the decoded statistics
    from the formula."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                arr = _png_pixels_for(d, MEDIA_W * MEDIA_H * 3) \
                    .reshape(MEDIA_H, MEDIA_W, 3)
                rows["media_id"].append(f"png-{d}")
                rows["kind"].append("image")
                rows["mime"].append("image/png")
                rows["payload"].append(encode_png(arr))
                rows["width"].append(MEDIA_W)
                rows["height"].append(MEDIA_H)
                rows["duration_ms"].append(None)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


def synthesize_jpeg_media(spark, docs: DataFrame) -> DataFrame:
    """REAL JPEG payloads with an EXACT oracle (r5): each doc becomes
    a 24x16 grayscale JPEG of 8x8-CONSTANT tiles, tile t of doc d
    valued ``2*((d*13 + t*29) % 128)``.  Constant tiles have a
    DC-only DCT; at quality 50 the Annex K tables apply unscaled and
    even tile values make the quantized DC exact, so the decode is
    BIT-EXACT (pinned by test) and a DuckDB oracle recomputes the
    decoded statistics from the tile formula — a real lossy-format
    codec behind a driver correctness row.  ODD docs encode
    PROGRESSIVE (SOF2, successive approximation + EOB runs); both
    modes transmit identical quantized coefficients, so the oracle
    formula is mode-blind while the driver row exercises both entropy
    layouts."""
    from .jpeg_pure import encode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                img = np.zeros((MEDIA_H, MEDIA_W), np.uint8)
                for t in range(6):
                    ty, tx = divmod(t, 3)
                    img[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = \
                        2 * ((d * 13 + t * 29) % 128)
                rows["media_id"].append(f"jpg-{d}")
                rows["kind"].append("image")
                rows["mime"].append("image/jpeg")
                rows["payload"].append(
                    encode_jpeg(img, quality=50, progressive=d % 2 == 1))
                rows["width"].append(MEDIA_W)
                rows["height"].append(MEDIA_H)
                rows["duration_ms"].append(None)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


def _gif_gray_for(seed: int, frame: int, n: int) -> np.ndarray:
    # distinct multipliers from the BMP/PNG formulas so a GIF-path
    # bug can't hide behind another format's identical statistics
    i = np.arange(n, dtype=np.int64)
    return ((seed * 23 + frame * 31 + i * 29) % 256).astype(np.uint8)


GIF_FRAMES = 3
GIF_DELAY_MS = 100


def synthesize_gif_media(spark, docs: DataFrame) -> DataFrame:
    """REAL animated-GIF payloads (r5): every doc becomes a 3-frame
    24x16 grayscale GIF89a (256-entry gray palette, graphic-control
    delays), gray pixel i of frame f valued
    ``(doc_id*23 + f*31 + i*29) % 256``.  GIF's LZW is lossless, so
    the decode is bit-exact and a DuckDB oracle recomputes both the
    first-frame statistics (mm_decode) and every frame's mean
    (mm_transform's gifframe rows) from the formula."""
    from .gif_pure import encode_gif

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                frames = [_gif_gray_for(d, f, MEDIA_W * MEDIA_H)
                          .reshape(MEDIA_H, MEDIA_W)
                          for f in range(GIF_FRAMES)]
                rows["media_id"].append(f"gif-{d}")
                rows["kind"].append("image")
                rows["mime"].append("image/gif")
                rows["payload"].append(
                    encode_gif(frames, [GIF_DELAY_MS] * GIF_FRAMES))
                rows["width"].append(MEDIA_W)
                rows["height"].append(MEDIA_H)
                rows["duration_ms"].append(GIF_FRAMES * GIF_DELAY_MS)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


G711_SAMPLES = 480
G711_RATE = 8000


def synthesize_g711_media(spark, docs: DataFrame) -> DataFrame:
    """REAL telephony-audio payloads (r5): even docs become Sun AU
    files of raw mu-law codes ``(d*7 + i*11) % 256`` (ulw-*), odd
    docs RIFF/WAVE format-6 files of A-law codes ``(d*13 + i*29) %
    256`` (alw-*).  G.711 expansion is a fixed table (pinned
    bit-identical to CPython's audioop), so a DuckDB oracle
    recomputes the decoded samples from the CCITT segment formulas —
    two more container walks and both companding laws behind driver
    correctness rows."""
    import struct as _struct

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                i = np.arange(G711_SAMPLES, dtype=np.int64)
                if d % 2 == 0:
                    codes = ((d * 7 + i * 11) % 256).astype(np.uint8)
                    data = codes.tobytes()
                    payload = b".snd" + _struct.pack(
                        ">IIIII", 24, len(data), 1, G711_RATE, 1) + data
                    rows["media_id"].append(f"ulw-{d}")
                    rows["mime"].append("audio/basic")
                else:
                    codes = ((d * 13 + i * 29) % 256).astype(np.uint8)
                    data = codes.tobytes()
                    fmt = _struct.pack("<HHIIHH", 6, 1, G711_RATE,
                                       G711_RATE, 1, 8)
                    body = (b"WAVE" + b"fmt " +
                            _struct.pack("<I", len(fmt)) + fmt +
                            b"data" + _struct.pack("<I", len(data)) +
                            data)
                    payload = b"RIFF" + _struct.pack(
                        "<I", len(body)) + body
                    rows["media_id"].append(f"alw-{d}")
                    rows["mime"].append("audio/wav")
                rows["kind"].append("audio")
                rows["payload"].append(payload)
                rows["width"].append(None)
                rows["height"].append(None)
                rows["duration_ms"].append(
                    G711_SAMPLES * 1000 // G711_RATE)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


def synthesize_tiff_media(spark, docs: DataFrame) -> DataFrame:
    """REAL TIFF payloads (r5): every doc becomes a 24x16 RGB TIFF
    of pixels ``(d*29 + i*31) % 256`` with the compression cycling
    none / PackBits / LZW by ``d % 3`` — all three are lossless, so
    one DuckDB formula oracle covers every strip codec (including
    TIFF-LZW's early code-width change)."""
    from .tiff_pure import encode_tiff

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                i = np.arange(MEDIA_W * MEDIA_H * 3, dtype=np.int64)
                arr = ((d * 29 + i * 31) % 256).astype(np.uint8) \
                    .reshape(MEDIA_H, MEDIA_W, 3)
                comp = ("none", "packbits", "lzw")[d % 3]
                rows["media_id"].append(f"tif-{d}")
                rows["kind"].append("image")
                rows["mime"].append("image/tiff")
                rows["payload"].append(encode_tiff(arr, comp))
                rows["width"].append(MEDIA_W)
                rows["height"].append(MEDIA_H)
                rows["duration_ms"].append(None)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


FLAC_SAMPLES = 480
FLAC_RATE = 8000


def synthesize_flac_media(spark, docs: DataFrame) -> DataFrame:
    """REAL FLAC payloads (r5): every doc becomes a mono 16-bit FLAC
    of samples ``((d*19 + i*23) % 4096) - 2048``; odd docs encode
    with LPC subframes, even docs with FIXED predictors — FLAC is
    lossless, so both decode bit-exactly and one DuckDB oracle
    formula covers both entropy paths."""
    from .flac_pure import encode_flac

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                i = np.arange(FLAC_SAMPLES, dtype=np.int64)
                s = (((d * 19 + i * 23) % 4096) - 2048) \
                    .astype(np.int16)
                rows["media_id"].append(f"flc-{d}")
                rows["kind"].append("audio")
                rows["mime"].append("audio/flac")
                rows["payload"].append(
                    encode_flac(s, FLAC_RATE, use_lpc=d % 2 == 1))
                rows["width"].append(None)
                rows["height"].append(None)
                rows["duration_ms"].append(
                    FLAC_SAMPLES * 1000 // FLAC_RATE)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


AVI_FRAMES = 4
AVI_FPS = 10


def _avi_tile_value(d: int, f: int, t: int) -> int:
    # even values, distinct multipliers from the jpg-* rows: constant
    # 8x8 tiles quantize exactly at q=50 (DC-only, unscaled Annex K)
    return 2 * ((d * 37 + f * 19 + t * 41) % 128)


def synthesize_avi_media(spark, docs: DataFrame) -> DataFrame:
    """REAL video payloads (r5): every doc becomes a 4-frame MJPEG
    AVI (RIFF container, 10 fps), frame f a 24x16 grayscale image of
    8x8-constant tiles valued ``2*((d*37 + f*19 + t*41) % 128)``.
    Constant tiles decode BIT-EXACTLY through the JPEG path, so real
    video — container walk + per-frame codec — sits behind an exact
    DuckDB oracle."""
    from .avi_pure import encode_avi

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime",
                                    "payload", "width", "height",
                                    "duration_ms")}
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for f in range(AVI_FRAMES):
                    img = np.zeros((MEDIA_H, MEDIA_W), np.uint8)
                    for t in range(6):
                        ty, tx = divmod(t, 3)
                        img[ty * 8:(ty + 1) * 8,
                            tx * 8:(tx + 1) * 8] = _avi_tile_value(
                                d, f, t)
                    frames.append(img)
                rows["media_id"].append(f"avi-{d}")
                rows["kind"].append("video")
                rows["mime"].append("video/x-msvideo")
                rows["payload"].append(
                    encode_avi(frames, fps=AVI_FPS, codec="MJPG",
                               quality=50))
                rows["width"].append(MEDIA_W)
                rows["height"].append(MEDIA_H)
                rows["duration_ms"].append(
                    AVI_FRAMES * 1000 // AVI_FPS)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("mime_detected", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("frames", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
])


def probe_media_df(media: DataFrame) -> DataFrame:
    """Container-level probe (r5): magic sniff + header walk per
    payload — no pixel/sample decode — returning detected mime,
    dimensions, duration, frame/sample counts.  The probe-before-
    decode scheduling step: cheap enough to run over a whole lake,
    fails loudly on truncated/corrupt payloads (e.g. the MP3 prober
    requires every frame boundary to land on a sync).  Map-only
    Arrow kernel."""
    from .mediainfo import probe_media

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "mime_detected",
                                    "width", "height", "duration_ms",
                                    "frames", "sample_rate",
                                    "channels")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                info = probe_media(bytes(p)) if p is not None else {
                    k: None for k in ("mime", "width", "height",
                                      "duration_ms", "frames",
                                      "sample_rate", "channels")}
                rows["media_id"].append(mid)
                rows["mime_detected"].append(info["mime"])
                rows["width"].append(info["width"])
                rows["height"].append(info["height"])
                rows["duration_ms"].append(info["duration_ms"])
                rows["frames"].append(info["frames"])
                rows["sample_rate"].append(info["sample_rate"])
                rows["channels"].append(info["channels"])
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, PROBE_SCHEMA)


GIF_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("frame_mean", T.DoubleType()),
])


def media_frame_stats(media: DataFrame) -> DataFrame:
    """REAL multi-frame extraction (r5): decode every frame of
    temporal media — animated GIFs (composited per the disposal
    rules, timestamps cumulative over the graphic-control delays)
    and AVI videos (MJPG/DIB chunks, timestamps from the stream's
    scale/rate) — emitting (media_id, frame_idx, frame_ts_ms,
    frame_mean).  A map-only Arrow kernel; rows with other mimes are
    skipped (the frame_sample_stub plan remains for codecs this
    container lacks)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from orc_spark._alloc import tune_worker
        tune_worker()
        from .avi_pure import decode_avi_frames
        from .gif_pure import decode_gif_frames
        for pdf in batches:
            mids, idxs, tss, means = [], [], [], []
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"],
                                    pdf["payload"]):
                if p is None:
                    continue
                if mime == "image/gif":
                    frames, delays = decode_gif_frames(bytes(p))
                    ts_list = []
                    ts = 0
                    for de in delays:
                        ts_list.append(ts)
                        ts += de
                elif mime == "video/x-msvideo":
                    frames, ts_list = decode_avi_frames(bytes(p))
                elif mime == "image/tiff":
                    # multi-page documents: no timeline, ts stays 0
                    from .tiff_pure import decode_tiff_pages
                    frames = decode_tiff_pages(bytes(p))
                    ts_list = [0] * len(frames)
                else:
                    continue
                for i, (fr, ts) in enumerate(zip(frames, ts_list)):
                    mids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    means.append(float(np.float32(fr.mean())))
            yield pd.DataFrame({
                "media_id": pd.Series(mids, dtype=object),
                "frame_idx": pd.Series(idxs, dtype=np.int32),
                "frame_ts_ms": pd.Series(tss, dtype=np.int64),
                "frame_mean": pd.Series(means, dtype=np.float64),
            })

    return media.mapInPandas(kernel, GIF_FRAME_SCHEMA)


# decoded-frame statistics for GIFs and AVIs share one kernel
gif_frame_stats = media_frame_stats


def _image_features(arr: np.ndarray, dim: int) -> np.ndarray:
    h, w, _ = arr.shape
    px = arr.astype(np.float64)
    f = np.zeros(dim, dtype=np.float32)
    f[0], f[1], f[2] = w, h, 3
    f[3] = px.mean()
    f[4], f[5], f[6] = (px[:, :, c].mean() for c in range(3))
    f[7], f[8] = px.min(), px.max()
    return f


def _audio_features(samples: np.ndarray, rate: int,
                    dim: int) -> np.ndarray:
    s = samples.astype(np.float64)
    f = np.zeros(dim, dtype=np.float32)
    f[0], f[1], f[2] = s.shape[0], rate, s.shape[1]
    f[3], f[4], f[5] = s.mean(), s.min(), s.max()
    return f


def decode_media(payload: bytes, mime: str, dim: int = FEATURE_DIM
                 ) -> np.ndarray:
    """payload -> fixed-width feature vector, dispatched on mime.
    BMP/PNG/JPEG/PPM/WAV decode for REAL; image/x-fake keeps the
    legacy byte-math stand-in (plumbing oracle); anything else
    (progressive JPEG, MP3, video codecs) raises — plug a real codec
    stack into this seam."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    if mime == "image/bmp":
        return _image_features(decode_bmp(payload), dim)
    if mime == "image/png":
        return _image_features(decode_png(payload), dim)
    if mime == "image/jpeg":
        from .jpeg_pure import decode_jpeg
        return _image_features(decode_jpeg(payload), dim)
    if mime == "image/x-portable-pixmap":
        return _image_features(decode_ppm(payload), dim)
    if mime == "image/gif":
        from .gif_pure import decode_gif
        return _image_features(decode_gif(payload), dim)
    if mime == "image/tiff":
        from .tiff_pure import decode_tiff
        return _image_features(decode_tiff(payload), dim)
    if mime == "video/x-msvideo":
        from .avi_pure import decode_avi_frames
        return _image_features(decode_avi_frames(payload)[0][0], dim)
    if mime == "audio/wav":
        # extended decode (r5): PCM 8/16/24/32, IEEE float, G.711
        # mu-law/A-law, IMA ADPCM — PCM16 path value-identical to the
        # original decode_wav (pinned by the wav-* oracle rows)
        from .audio_pure import decode_wav_ex
        samples, rate = decode_wav_ex(payload)
        return _audio_features(samples, rate, dim)
    if mime == "audio/basic":
        from .audio_pure import decode_au
        samples, rate = decode_au(payload)
        return _audio_features(samples, rate, dim)
    if mime in ("audio/aiff", "audio/x-aiff"):
        from .audio_pure import decode_aiff
        samples, rate = decode_aiff(payload)
        return _audio_features(samples, rate, dim)
    if mime in ("audio/flac", "audio/x-flac"):
        from .flac_pure import decode_flac
        samples, rate = decode_flac(payload)
        return _audio_features(samples, rate, dim)
    if mime == "image/x-fake":
        return _fake_decode(payload, dim)
    raise NotImplementedError(
        f"media decode for mime={mime!r} requires codec libraries not "
        f"present in this container; plug a real decoder into "
        f"decode_media")


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction over payload bytes -> (media_id,
    features:array<float>).  Arrow-batched; one numpy pass per row's
    payload, no JVM round trips.  Decode dispatch is per-mime — BMP /
    P6 PPM / PCM WAV decode for real (pure numpy)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from orc_spark._alloc import tune_worker
        tune_worker()
        for pdf in batches:
            feats = [decode_media(p, m, dim)
                     for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": [f.tolist() for f in feats],
            })

    return media.select("media_id", "mime", "payload") \
        .mapInPandas(kernel, out_schema)


def resize_media(media: DataFrame, w: int, h: int) -> DataFrame:
    """Nearest-neighbor resize of BMP/PPM image payloads (decode ->
    numpy index resize -> re-encode, same container), passing
    non-image rows through untouched — the standard pre-training
    resize stage as a map-only Arrow kernel."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_w, out_h = [], [], []
            for p, m in zip(pdf["payload"], pdf["mime"]):
                if m == "image/bmp" and p is not None:
                    out_p.append(encode_bmp(
                        resize_nearest(decode_bmp(p), w, h)))
                    out_w.append(w)
                    out_h.append(h)
                elif m == "image/x-portable-pixmap" and p is not None:
                    out_p.append(encode_ppm(
                        resize_nearest(decode_ppm(p), w, h)))
                    out_w.append(w)
                    out_h.append(h)
                elif m == "image/png" and p is not None:
                    out_p.append(encode_png(
                        resize_nearest(decode_png(p), w, h)))
                    out_w.append(w)
                    out_h.append(h)
                elif m == "image/jpeg" and p is not None:
                    from .jpeg_pure import decode_jpeg, encode_jpeg
                    out_p.append(encode_jpeg(
                        resize_nearest(decode_jpeg(p), w, h)))
                    out_w.append(w)
                    out_h.append(h)
                elif m == "image/tiff" and p is not None:
                    from .tiff_pure import decode_tiff, encode_tiff
                    out_p.append(encode_tiff(
                        resize_nearest(decode_tiff(p), w, h)))
                    out_w.append(w)
                    out_h.append(h)
                elif m == "image/gif" and p is not None:
                    from .gif_pure import decode_gif, encode_gif
                    r = resize_nearest(decode_gif(p), w, h)
                    if not ((r[:, :, 0] == r[:, :, 1]).all() and
                            (r[:, :, 0] == r[:, :, 2]).all()):
                        raise NotImplementedError(
                            "gif re-encode of color frames needs "
                            "palette quantization; decode + resize "
                            "are supported, re-encode is gray-only")
                    out_p.append(encode_gif(r[:, :, 0]))
                    out_w.append(w)
                    out_h.append(h)
                else:
                    out_p.append(p)
                    out_w.append(pdf["width"].iloc[len(out_p) - 1])
                    out_h.append(pdf["height"].iloc[len(out_p) - 1])
            pdf = pdf.copy()
            pdf["payload"], pdf["width"], pdf["height"] = \
                out_p, out_w, out_h
            yield pdf

    return media.mapInPandas(kernel, media.schema)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan (stub): emits (media_id, frame_ts_ms)
    rows from duration metadata; the decode itself is NotImplemented.
    Videos with UNKNOWN duration (NULL) emit no frames — scheduling a
    phantom ts=0 frame for unprobed media would queue decode work that
    may not exist."""
    return (media.where((F.col("kind") == "video") &
                        F.col("duration_ms").isNotNull())
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0), F.col("duration_ms"),
                        F.lit(every_ms))).alias("frame_ts_ms")))
