"""Pure-numpy audio decoders beyond PCM16 WAV.

Formats real speech/audio corpora actually contain:

- RIFF/WAVE: PCM 8/16/24/32-bit, IEEE float32/64, G.711 mu-law and
  A-law, IMA ADPCM (format 0x11, block headers + nibble stream) and
  WAVE_FORMAT_EXTENSIBLE wrappers.
- Sun AU (``audio/basic`` — the classic telephony container):
  big-endian header, mu-law / A-law / PCM 8/16/24/32 encodings.
- AIFF / AIFC: IFF chunk walk, 80-bit extended-float sample rate,
  big-endian PCM, and the AIFC ``ulaw``/``alaw``/``sowt`` variants.

Everything decodes to (n, ch) int16 at 16-bit significance (24/32
bit PCM and floats are down-shifted/scaled — documented, exact and
deterministic).  The G.711 expansion tables are built from the
CCITT segment formulas and the test suite pins them bit-identical
to CPython's ``audioop`` (an independent public implementation), as
well as whole-file decodes against the stdlib ``wave``/``sunau``/
``aifc`` readers on Python's own test fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def _build_ulaw_table() -> np.ndarray:
    t = np.zeros(256, np.int16)
    for code in range(256):
        u = ~code & 0xFF
        e = (u >> 4) & 7
        m = u & 0xF
        mag = ((m << 3) + 0x84 << e) - 0x84
        t[code] = -mag if u & 0x80 else mag
    return t


def _build_alaw_table() -> np.ndarray:
    t = np.zeros(256, np.int16)
    for code in range(256):
        a = code ^ 0x55
        e = (a >> 4) & 7
        m = a & 0xF
        if e == 0:
            mag = (m << 4) + 8
        elif e == 1:
            mag = (m << 4) + 0x108
        else:
            mag = ((m << 4) + 0x108) << (e - 1)
        t[code] = mag if code & 0x80 else -mag
    return t


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()

# IMA/DVI ADPCM tables (public, e.g. IMA ADPCM reference and
# Microsoft's WAVE format 0x11 documentation)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                       -1, -1, -1, -1, 2, 4, 6, 8], np.int32)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767], np.int32)


def _ima_decode_nibbles(nibbles, pred: int, index: int):
    """Core IMA step: decode a nibble sequence from (pred, index)
    state; returns (int16 list, pred, index)."""
    out = []
    for nb in nibbles:
        step = int(_IMA_STEP[index])
        diff = step >> 3
        if nb & 1:
            diff += step >> 2
        if nb & 2:
            diff += step >> 1
        if nb & 4:
            diff += step
        pred = pred - diff if nb & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out.append(pred)
        index = max(0, min(88, index + int(_IMA_INDEX[nb])))
    return out, pred, index


def _decode_ima_wav(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """WAV format 0x11: per block and channel a 4-byte header
    (predictor int16, step index, reserved), then interleaved groups
    of 4 bytes (8 nibbles) per channel."""
    chans = [[] for _ in range(ch)]
    for b0 in range(0, len(data) - (len(data) % block_align) or
                    len(data), block_align):
        block = data[b0:b0 + block_align]
        if len(block) < 4 * ch:
            break
        state = []
        for c in range(ch):
            pred = struct.unpack_from("<h", block, c * 4)[0]
            index = block[c * 4 + 2]
            if index > 88:
                raise ValueError("adpcm: step index out of range")
            chans[c].append(pred)       # header carries sample 0
            state.append((pred, index))
        pos = 4 * ch
        while pos + 4 * ch <= len(block):
            for c in range(ch):
                grp = block[pos + c * 4:pos + c * 4 + 4]
                nibbles = []
                for byte in grp:
                    nibbles.append(byte & 0xF)       # low first
                    nibbles.append(byte >> 4)
                pred, index = state[c]
                smp, pred, index = _ima_decode_nibbles(nibbles, pred,
                                                       index)
                state[c] = (pred, index)
                chans[c].extend(smp)
            pos += 4 * ch
    n = min(len(c) for c in chans)
    out = np.empty((n, ch), np.int16)
    for c in range(ch):
        out[:, c] = np.asarray(chans[c][:n], np.int16)
    return out


def encode_ima_wav_block(samples: np.ndarray, pred: int = None,
                         index: int = 0):
    """Mono int16 -> one IMA block body (header + nibbles); fixture
    encoder for the decoder's round-trip tests."""
    s = np.asarray(samples, np.int64)
    if pred is None:
        pred = int(s[0])
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    p = pred
    for v in s[1:]:
        step = int(_IMA_STEP[index])
        diff = int(v) - p
        nb = 0
        if diff < 0:
            nb = 8
            diff = -diff
        if diff >= step:
            nb |= 4
            diff -= step
        if diff >= step >> 1:
            nb |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nb |= 1
        # reconstruct exactly as the decoder will
        d = step >> 3
        if nb & 1:
            d += step >> 2
        if nb & 2:
            d += step >> 1
        if nb & 4:
            d += step
        p = p - d if nb & 8 else p + d
        p = max(-32768, min(32767, p))
        nibbles.append(nb)
        index = max(0, min(88, index + int(_IMA_INDEX[nb])))
    if len(nibbles) % 8:
        nibbles += [0] * (8 - len(nibbles) % 8)
    for i in range(0, len(nibbles), 2):
        out.append(nibbles[i] | (nibbles[i + 1] << 4))
    return bytes(out)


def _pcm_to_i16(data: bytes, bits: int, big: bool = False) -> np.ndarray:
    bo = ">" if big else "<"
    if bits == 16:
        return np.frombuffer(data, f"{bo}i2").astype(np.int16)
    if bits == 8:
        # WAV 8-bit is unsigned; AU/AIFF 8-bit is signed (caller
        # pre-offsets for WAV)
        return (np.frombuffer(data, np.int8).astype(np.int16)) << 8
    if bits == 24:
        b = np.frombuffer(data, np.uint8,
                          len(data) - len(data) % 3).reshape(-1, 3)
        if big:
            v = (b[:, 0].astype(np.int32) << 16) | \
                (b[:, 1].astype(np.int32) << 8) | b[:, 2]
        else:
            v = (b[:, 2].astype(np.int32) << 16) | \
                (b[:, 1].astype(np.int32) << 8) | b[:, 0]
        v = (v ^ 0x800000) - 0x800000          # sign-extend
        return (v >> 8).astype(np.int16)       # 16-bit significance
    if bits == 32:
        return (np.frombuffer(data, f"{bo}i4") >> 16).astype(np.int16)
    raise ValueError(f"unsupported PCM width {bits}")


def decode_wav_ex(payload: bytes):
    """Extended RIFF/WAVE decode -> ((n, ch) int16, rate).  PCM
    8/16/24/32, IEEE float, G.711 mu-law/A-law, IMA ADPCM, and
    EXTENSIBLE wrappers."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_raw, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_raw = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt_raw is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _br, block_align, bits = \
        struct.unpack_from("<HHIIHH", fmt_raw, 0)
    if audio_fmt == 0xFFFE:                    # EXTENSIBLE
        if len(fmt_raw) < 26:
            raise ValueError("WAV extensible fmt truncated")
        audio_fmt = struct.unpack_from("<H", fmt_raw, 24)[0]
    if audio_fmt == 1:
        if bits == 8:
            s = (np.frombuffer(data, np.uint8).astype(np.int16)
                 - 128) << 8
        else:
            s = _pcm_to_i16(data, bits)
    elif audio_fmt == 3:                       # IEEE float
        f = np.frombuffer(data, "<f4" if bits == 32 else "<f8")
        s = np.clip(np.round(f.astype(np.float64) * 32767.0),
                    -32768, 32767).astype(np.int16)
    elif audio_fmt == 6:
        s = ALAW_TABLE[np.frombuffer(data, np.uint8)]
    elif audio_fmt == 7:
        s = ULAW_TABLE[np.frombuffer(data, np.uint8)]
    elif audio_fmt == 0x11:
        return _decode_ima_wav(data, ch, block_align), rate
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt:#x} "
                         f"(PCM/float/G.711/IMA-ADPCM only)")
    return s.reshape(-1, ch), rate


_AU_ENCODINGS = {1: ("ulaw", 1), 2: ("pcm", 1), 3: ("pcm", 2),
                 4: ("pcm", 3), 5: ("pcm", 4), 27: ("alaw", 1)}


def decode_au(payload: bytes):
    """Sun AU (audio/basic) -> ((n, ch) int16, rate)."""
    if payload[:4] != b".snd":
        raise ValueError("not a Sun AU payload")
    offset, size, enc, rate, ch = struct.unpack_from(">IIIII",
                                                     payload, 4)
    if enc not in _AU_ENCODINGS:
        raise ValueError(f"unsupported AU encoding {enc}")
    kind, width = _AU_ENCODINGS[enc]
    end = len(payload) if size in (0, 0xFFFFFFFF) else offset + size
    data = payload[offset:end]
    if kind == "ulaw":
        s = ULAW_TABLE[np.frombuffer(data, np.uint8)]
    elif kind == "alaw":
        s = ALAW_TABLE[np.frombuffer(data, np.uint8)]
    else:
        s = _pcm_to_i16(data[:len(data) - len(data) % (width * ch)],
                        width * 8, big=True)
    return s.reshape(-1, ch), rate


def encode_au(samples: np.ndarray, rate: int,
              encoding: str = "pcm16") -> bytes:
    """int16 (n,) or (n, ch) -> Sun AU bytes (fixture encoder).
    ``encoding``: pcm16 or ulaw (mu-law compresses via the inverse
    table search — exact for values that ARE table levels)."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if encoding == "pcm16":
        enc, data = 3, s.astype(">i2").tobytes()
    elif encoding == "ulaw":
        # nearest-level search against the expansion table
        order = np.argsort(ULAW_TABLE)
        flat = s.reshape(-1).astype(np.int32)
        idx = np.searchsorted(ULAW_TABLE[order], flat)
        idx = np.clip(idx, 0, 255)
        lo = ULAW_TABLE[order[np.maximum(idx - 1, 0)]].astype(np.int32)
        hi = ULAW_TABLE[order[idx]].astype(np.int32)
        pick = np.where(np.abs(flat - lo) <= np.abs(hi - flat),
                        np.maximum(idx - 1, 0), idx)
        enc, data = 1, order[pick].astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unknown AU encoding {encoding!r}")
    hdr = b".snd" + struct.pack(">IIIII", 24, len(data), enc, rate, ch)
    return hdr + data


def _read_extended80(b: bytes) -> int:
    """80-bit IEEE extended float (AIFF sample rate) -> int Hz."""
    expo = struct.unpack_from(">H", b, 0)[0]
    mant = struct.unpack_from(">Q", b, 2)[0]
    sign = -1 if expo & 0x8000 else 1
    expo &= 0x7FFF
    if expo == 0 and mant == 0:
        return 0
    return int(sign * mant * 2.0 ** (expo - 16383 - 63) + 0.5)


def decode_aiff(payload: bytes):
    """AIFF / AIFC -> ((n, ch) int16, rate).  Big-endian PCM widths
    8/16/24/32; AIFC compression NONE / sowt (little-endian PCM16) /
    ulaw / alaw."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF",
                                                       b"AIFC"):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos = 12
    comm = None
    ssnd = None
    comp = b"NONE"
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            ch, _nf, bits = struct.unpack_from(">HIH", body, 0)
            rate = _read_extended80(body[8:18])
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
            comm = (ch, bits, rate)
        elif cid == b"SSND":
            off = struct.unpack_from(">I", body, 0)[0]
            ssnd = body[8 + off:]
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    ch, bits, rate = comm
    if comp == b"NONE":
        s = _pcm_to_i16(ssnd[:len(ssnd) - len(ssnd) % max(1, bits // 8 * ch)],
                        bits, big=True)
    elif comp == b"sowt":
        s = np.frombuffer(ssnd[:len(ssnd) - len(ssnd) % (2 * ch)],
                          "<i2").astype(np.int16)
    elif comp in (b"ulaw", b"ULAW"):
        s = ULAW_TABLE[np.frombuffer(ssnd, np.uint8)]
    elif comp in (b"alaw", b"ALAW"):
        s = ALAW_TABLE[np.frombuffer(ssnd, np.uint8)]
    else:
        raise ValueError(f"unsupported AIFC compression {comp!r}")
    return s.reshape(-1, ch), rate
