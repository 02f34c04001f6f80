"""Container-level media probing (magic sniff + header walk).

``probe_media`` identifies a payload by its magic bytes and walks
just enough structure to report (mime, width, height, duration_ms,
frames, sample_rate, channels) WITHOUT decoding pixels/samples —
the probe-before-decode step a training pipeline runs to schedule
decode work, detect corruption early and drop truncated files.

Covers every format the decode layer handles (BMP, PPM, PNG, JPEG,
GIF, AVI, WAV, AU, AIFF, FLAC) plus MPEG audio (MP3): for MP3 the
prober performs a full frame-sync walk — ID3v2 skip, per-frame
bitrate/samplerate/padding tables (MPEG-1/2/2.5, Layers I-III),
Xing/Info VBR headers — and requires every frame boundary to land
exactly on the next sync, so a corrupt stream fails loudly.  MP3
PCM decode itself stays NotImplemented (the Layer III huffman
tables belong to a codec library; plug one into decode_media's
seam) — but duration/bitrate probing is complete.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (parity with sibling modules)

_MPEG_RATES = {3: (44100, 48000, 32000),      # MPEG-1
               2: (22050, 24000, 16000),      # MPEG-2
               0: (11025, 12000, 8000)}       # MPEG-2.5
_BR_V1 = {3: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
              352, 384, 416, 448),            # Layer I
          2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
              256, 320, 384),                 # Layer II
          1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
              224, 256, 320)}                 # Layer III
_BR_V2 = {3: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
              192, 224, 256),                 # Layer I
          2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
              144, 160),                      # Layer II
          1: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
              144, 160)}                      # Layer III


def probe_mp3(payload: bytes) -> dict:
    """Frame-accurate MPEG-audio walk.  Every frame header is
    validated and its computed length must land exactly on the next
    sync (or end-of-stream) — truncated or corrupt streams raise."""
    d = bytes(payload)
    pos = 0
    if d[:3] == b"ID3":                       # ID3v2: syncsafe size
        size = ((d[6] & 0x7F) << 21) | ((d[7] & 0x7F) << 14) | \
            ((d[8] & 0x7F) << 7) | (d[9] & 0x7F)
        pos = 10 + size
    frames = 0
    samples = 0
    rate = None
    channels = None
    layer_out = None
    version_out = None
    br_sum = 0
    vbr = False
    last_br = None
    while pos + 4 <= len(d):
        if d[pos] == 0x00 and frames:         # trailing padding —
            if any(d[pos:]):                  # must be ALL zeros
                raise ValueError(
                    f"mp3: garbage after frame at {pos}")
            break
        if d[pos:pos + 3] == b"TAG":          # ID3v1 trailer
            break
        h = d[pos:pos + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            raise ValueError(f"mp3: lost frame sync at {pos}")
        ver = (h[1] >> 3) & 3                 # 3=MPEG1 2=MPEG2 0=2.5
        layer = (h[1] >> 1) & 3               # 3=I 2=II 1=III
        if ver == 1 or layer == 0:
            raise ValueError("mp3: reserved version/layer bits")
        br_idx = h[2] >> 4
        sr_idx = (h[2] >> 2) & 3
        pad = (h[2] >> 1) & 1
        mode = (h[3] >> 6) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: free/bad bitrate or samplerate")
        sr = _MPEG_RATES[ver][sr_idx]
        br = (_BR_V1 if ver == 3 else _BR_V2)[layer][br_idx]
        if layer == 3:                        # Layer I
            flen = (12000 * br // sr + pad) * 4
            spf = 384
        elif layer == 2 or ver == 3:          # Layer II, or L3@MPEG1
            flen = 144000 * br // sr + pad
            spf = 1152
        else:                                 # Layer III @ MPEG2/2.5
            flen = 72000 * br // sr + pad
            spf = 576
        if frames == 0:
            rate, layer_out, version_out = sr, layer, ver
            channels = 1 if mode == 3 else 2
            # Xing/Info header marks a VBR metadata frame
            for off in (pos + 13, pos + 21, pos + 36):
                if d[off:off + 4] in (b"Xing", b"Info"):
                    vbr = d[off:off + 4] == b"Xing"
                    break
        if last_br is not None and br != last_br:
            vbr = True
        last_br = br
        br_sum += br
        frames += 1
        samples += spf
        pos += flen
    if frames == 0:
        raise ValueError("mp3: no frames")
    return {"mime": "audio/mpeg", "frames": frames,
            "sample_rate": rate, "channels": channels,
            "duration_ms": samples * 1000 // rate,
            "bitrate_kbps": br_sum // frames, "vbr": vbr,
            "layer": {3: 1, 2: 2, 1: 3}[layer_out],
            "version": {3: 1, 2: 2, 0: 2.5}[version_out]}


def probe_media(payload: bytes) -> dict:
    """Magic-sniff + header walk -> dict(mime, width, height,
    duration_ms, frames, sample_rate, channels).  Fields that do not
    apply are None; still images report frames=1, duration_ms=0."""
    d = bytes(payload)
    out = {"mime": None, "width": None, "height": None,
           "duration_ms": None, "frames": None,
           "sample_rate": None, "channels": None}
    if d[:2] == b"BM":
        w, h = struct.unpack_from("<ii", d, 18)
        out.update(mime="image/bmp", width=w, height=abs(h),
                   frames=1, duration_ms=0)
    elif d[:2] == b"P6":
        parts = d[2:64].split()
        out.update(mime="image/x-portable-pixmap",
                   width=int(parts[0]), height=int(parts[1]),
                   frames=1, duration_ms=0)
    elif d[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", d, 16)
        out.update(mime="image/png", width=w, height=h, frames=1,
                   duration_ms=0)
    elif d[:2] == b"\xFF\xD8":
        pos = 2
        while pos + 4 <= len(d):
            if d[pos] != 0xFF:
                break
            m = d[pos + 1]
            if m in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", d, pos + 5)
                out.update(mime="image/jpeg", width=w, height=h,
                           frames=1, duration_ms=0)
                break
            if m == 0xD9 or m == 0x01 or 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            if m == 0xDA:
                break
            pos += 2 + struct.unpack_from(">H", d, pos + 2)[0]
    elif d[:4] in (b"II*\x00", b"MM\x00*"):
        bo = "<" if d[:2] == b"II" else ">"
        ifd = struct.unpack_from(bo + "I", d, 4)[0]
        w = h = None
        pages = 0
        seen = set()
        while ifd and ifd not in seen:   # IFD chain = page count
            seen.add(ifd)
            cnt = struct.unpack_from(bo + "H", d, ifd)[0]
            for i in range(cnt):
                tag, typ = struct.unpack_from(bo + "HH",
                                              d, ifd + 2 + i * 12)
                vpos = ifd + 2 + i * 12 + 8
                v = struct.unpack_from(
                    bo + ("H" if typ == 3 else "I"), d, vpos)[0]
                if tag == 256 and w is None:
                    w = v
                elif tag == 257 and h is None:
                    h = v
            pages += 1
            ifd = struct.unpack_from(bo + "I", d,
                                     ifd + 2 + cnt * 12)[0]
        if w is None or h is None or pages == 0:
            raise ValueError("tiff: missing dimensions")
        out.update(mime="image/tiff", width=w, height=h,
                   frames=pages, duration_ms=0)
    elif d[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", d, 6)
        # block walk: count image descriptors + sum GCE delays
        pos = 13
        flags = d[10]
        if flags & 0x80:
            pos += (2 << (flags & 7)) * 3
        frames = 0
        dur = 0
        while pos < len(d):
            b = d[pos]
            pos += 1
            if b == 0x3B:
                break
            if b == 0x21:
                label = d[pos]
                pos += 1
                while d[pos]:
                    if label == 0xF9 and d[pos] >= 4:
                        dur += struct.unpack_from("<H", d,
                                                  pos + 2)[0] * 10
                    pos += 1 + d[pos]
                pos += 1
            elif b == 0x2C:
                iflags = d[pos + 8]
                pos += 9
                if iflags & 0x80:
                    pos += (2 << (iflags & 7)) * 3
                pos += 1                       # LZW min code
                while d[pos]:
                    pos += 1 + d[pos]
                pos += 1
                frames += 1
            else:
                raise ValueError(f"gif: unknown block 0x{b:02X}")
        out.update(mime="image/gif", width=w, height=h,
                   frames=frames, duration_ms=dur)
    elif d[:4] == b"RIFF" and d[8:12] == b"AVI ":
        usec, _mb, _pad, _fl, total = struct.unpack_from("<IIIII",
                                                         d, 32)
        w, h = struct.unpack_from("<II", d, 64)
        out.update(mime="video/x-msvideo", width=w, height=h,
                   frames=total,
                   duration_ms=usec * total // 1000)
    elif d[:4] == b"RIFF" and d[8:12] == b"WAVE":
        pos = 12
        fmt = None
        nbytes = 0
        while pos + 8 <= len(d):
            cid = d[pos:pos + 4]
            size = struct.unpack_from("<I", d, pos + 4)[0]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", d, pos + 8)
            elif cid == b"data":
                nbytes = size
            pos += 8 + size + (size & 1)
        if fmt is None:
            raise ValueError("wav: missing fmt chunk")
        tag, ch, rate, _br, block, bits = fmt
        if tag in (1, 3, 6, 7) and bits:
            n = nbytes // (ch * max(1, bits // 8))
        else:                                  # ADPCM etc.: use rate
            n = nbytes * 8 // max(1, bits) // ch
        out.update(mime="audio/wav", sample_rate=rate, channels=ch,
                   frames=n, duration_ms=n * 1000 // rate)
    elif d[:4] == b".snd":
        off, size, enc, rate, ch = struct.unpack_from(">IIIII", d, 4)
        width = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 27: 1}.get(enc, 1)
        end = len(d) if size in (0, 0xFFFFFFFF) else off + size
        n = (end - off) // (width * ch)
        out.update(mime="audio/basic", sample_rate=rate, channels=ch,
                   frames=n, duration_ms=n * 1000 // rate)
    elif d[:4] == b"FORM" and d[8:12] in (b"AIFF", b"AIFC"):
        from .audio_pure import _read_extended80
        pos = 12
        while pos + 8 <= len(d):
            cid = d[pos:pos + 4]
            size = struct.unpack_from(">I", d, pos + 4)[0]
            if cid == b"COMM":
                ch, nf, _bits = struct.unpack_from(">HIH", d,
                                                   pos + 8)
                rate = _read_extended80(d[pos + 16:pos + 26])
                out.update(mime="audio/aiff", sample_rate=rate,
                           channels=ch, frames=nf,
                           duration_ms=nf * 1000 // max(1, rate))
            pos += 8 + size + (size & 1)
    elif d[:4] == b"fLaC":
        body = d[8:]
        rate = int.from_bytes(body[10:13], "big") >> 4
        ch = ((body[12] >> 1) & 7) + 1
        total = int.from_bytes(body[13:18], "big") & ((1 << 36) - 1)
        out.update(mime="audio/flac", sample_rate=rate, channels=ch,
                   frames=total,
                   duration_ms=total * 1000 // max(1, rate))
    elif d[:3] == b"ID3" or (len(d) > 1 and d[0] == 0xFF and
                             (d[1] & 0xE0) == 0xE0):
        p = probe_mp3(d)
        out.update(mime=p["mime"], sample_rate=p["sample_rate"],
                   channels=p["channels"], frames=p["frames"],
                   duration_ms=p["duration_ms"])
    else:
        raise ValueError("unrecognized media payload")
    return out
