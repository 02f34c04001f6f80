"""Pure-numpy AVI (RIFF) video container codec.

Decode walks the RIFF chunk tree (LIST/hdrl/strl/movi), reads the
``avih``/``strh``/``strf`` headers, and extracts the video stream's
frames: ``MJPG`` chunks are JPEG images (decoded by jpeg_pure; the
MJPEG convention of omitting huffman tables is handled by splicing
the Annex K DHT segments before the SOS when a frame carries none)
and uncompressed DIB chunks are bottom-up BGR rows padded to 4-byte
boundaries.  Frame timestamps derive from the stream's scale/rate
pair.  Audio streams and other codecs are skipped/fail-loud.

Encode emits a minimal standard-layout AVI (hdrl + movi + idx1) with
either MJPG frames (via jpeg_pure's encoder — constant-tile fixtures
therefore decode BIT-EXACTLY, giving real video an exact DuckDB
oracle) or raw DIB frames.  Everything follows the public RIFF/AVI
and BITMAPINFOHEADER layouts (documented by Microsoft); the
reference repo has no media decoding at all.
"""

from __future__ import annotations

import struct

import numpy as np


def _jpeg_ensure_dht(d: bytes) -> bytes:
    """MJPEG frames conventionally omit DHT segments; splice the
    Annex K tables in front of the SOS if none are present."""
    pos = 2
    has_dht = False
    sos_at = None
    while pos < len(d) - 1:
        if d[pos] != 0xFF:
            break
        marker = d[pos + 1]
        if marker == 0xC4:
            has_dht = True
            break
        if marker == 0xDA:
            sos_at = pos
            break
        if marker == 0xD9 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        pos += 2 + struct.unpack_from(">H", d, pos + 2)[0]
    if has_dht or sos_at is None:
        return d
    from .jpeg_pure import (_AC_CHROMA, _AC_LUMA, _DC_CHROMA,
                            _DC_LUMA, _dht_segment)
    dht = (_dht_segment(0, 0, *_DC_LUMA) +
           _dht_segment(1, 0, *_AC_LUMA) +
           _dht_segment(0, 1, *_DC_CHROMA) +
           _dht_segment(1, 1, *_AC_CHROMA))
    return d[:sos_at] + dht + d[sos_at:]


def _decode_dib(data: bytes, w: int, h: int, bits: int) -> np.ndarray:
    if bits != 24:
        raise ValueError(f"avi: {bits}-bit DIB unsupported (24 only)")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, h * stride).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)[::-1]      # bottom-up
    return bgr[:, :, ::-1].copy()                     # BGR -> RGB


def decode_avi_frames(payload: bytes):
    """AVI bytes -> (frames, ts_ms): (h, w, 3) RGB uint8 frames of
    the first video stream and each frame's start timestamp."""
    d = bytes(payload)
    if d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    streams = []          # per stream: dict(type, handler, scale, rate)
    frames_raw = []       # (stream_idx, bytes)

    def walk(start: int, end: int, in_movi: bool):
        pos = start
        while pos + 8 <= end:
            fourcc = d[pos:pos + 4]
            size = struct.unpack_from("<I", d, pos + 4)[0]
            body = pos + 8
            if fourcc in (b"RIFF", b"LIST"):
                ltype = d[body:body + 4]
                walk(body + 4, body + size,
                     in_movi or ltype == b"movi")
            elif fourcc == b"strh":
                fcc_type = d[body:body + 4]
                handler = d[body + 4:body + 8]
                scale, rate = struct.unpack_from("<II", d, body + 20)
                streams.append({"type": fcc_type, "handler": handler,
                                "scale": scale, "rate": rate,
                                "strf": None})
            elif fourcc == b"strf":
                if streams and streams[-1]["strf"] is None:
                    streams[-1]["strf"] = d[body:body + size]
            elif in_movi and len(fourcc) == 4 and \
                    fourcc[:2].isdigit() and fourcc[2:] in (b"dc", b"db"):
                frames_raw.append((int(fourcc[:2]),
                                   d[body:body + size]))
            pos = body + size + (size & 1)        # word alignment

    walk(12, 8 + struct.unpack_from("<I", d, 4)[0], False)
    vid_idx = None
    vid = None
    for i, s in enumerate(streams):
        if s["type"] == b"vids":
            vid_idx, vid = i, s
            break
    if vid is None:
        raise ValueError("avi: no video stream")
    strf = vid["strf"] or b""
    if len(strf) < 40:
        raise ValueError("avi: video stream without BITMAPINFOHEADER")
    bw, bh = struct.unpack_from("<ii", strf, 4)
    bits = struct.unpack_from("<H", strf, 14)[0]
    compression = strf[16:20]
    handler = vid["handler"]
    is_mjpg = compression in (b"MJPG", b"mjpg") or \
        handler in (b"MJPG", b"mjpg")
    is_dib = compression in (b"\x00\x00\x00\x00", b"DIB ", b"RGB ")
    if not (is_mjpg or is_dib):
        raise ValueError(
            f"avi: codec {compression!r} unsupported (MJPG/DIB only "
            f"in pure python; plug ffmpeg into the decode_media seam)")
    frames = []
    for sidx, raw in frames_raw:
        if sidx != vid_idx:
            continue
        if is_mjpg:
            from .jpeg_pure import decode_jpeg
            frames.append(decode_jpeg(_jpeg_ensure_dht(raw)))
        else:
            frames.append(_decode_dib(raw, bw, abs(bh), bits))
    if not frames:
        raise ValueError("avi: no video frames in movi")
    scale, rate = vid["scale"] or 1, vid["rate"] or 1
    ts = [i * 1000 * scale // rate for i in range(len(frames))]
    return frames, ts


def encode_avi(frames, fps: int = 10, codec: str = "MJPG",
               quality: int = 50) -> bytes:
    """Frames -> AVI bytes.  ``frames``: list of (h, w) gray or
    (h, w, 3) RGB uint8 arrays (one shape throughout).  ``codec``:
    "MJPG" (frames JPEG-encoded at ``quality``) or "DIB" (raw
    bottom-up BGR)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("avi: all frames must share one shape")
    payloads = []
    if codec == "MJPG":
        from .jpeg_pure import encode_jpeg
        for f in frames:
            payloads.append(encode_jpeg(f, quality=quality))
        compression = b"MJPG"
        bits = 24
    elif codec == "DIB":
        stride = (w * 3 + 3) & ~3
        for f in frames:
            rgb = np.repeat(f[:, :, None], 3, axis=2) \
                if f.ndim == 2 else f
            row = np.zeros((h, stride), np.uint8)
            row[:, :w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)
            payloads.append(row[::-1].tobytes())
        compression = b"\x00\x00\x00\x00"
        bits = 24
    else:
        raise ValueError(f"avi: unknown codec {codec!r}")
    maxbuf = max(len(p) for p in payloads)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<IIIIIIIIII", 1000000 // fps, 0, 0, 0x10,
                       len(frames), 0, 1, maxbuf, w, h) + b"\x00" * 16
    strh = (b"vids" + (b"MJPG" if codec == "MJPG" else b"\x00" * 4) +
            struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                        len(frames), maxbuf, 0, 0) +
            struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, bits,
                       compression, len(payloads[0]), 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) +
                   chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
