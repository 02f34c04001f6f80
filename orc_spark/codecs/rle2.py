"""ORC RLE v2 integer codec (SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA)
with per-run adaptive encoding selection.

Behavioral reference: scritchley/orc runlengthintegerwriterv2.go (writer
state machine 87-212, determineEncoding 265-402, patched-base blob
415-517, emitters 526-788) and runlengthintegerreaderv2.go (106-421).
This module re-creates those semantics bit-identically as numpy kernels:

* ``encode`` is a run-level simulation of the writer state machine —
  instead of feeding one value at a time, it walks maximal equal-value
  runs and fast-forwards through fixed runs and 512-value windows, so
  the Python-loop iteration count is O(#segments), not O(#values).
* ``decode`` walks segment headers and materializes each segment with
  vectorized bit unpacking.
* ``_SlowWriter`` is a direct per-value port of the reference state
  machine, used only by tests to cross-validate the fast segmentation.

Constants pinned by the spec: MinRepeat=3, MaxShortRepeat=10,
MaxScope=512 (runlengthintegerreaderv2.go:14-21).
"""

from __future__ import annotations

import numpy as np

from .bits import (
    _CLOSEST_ALIGNED,
    _CLOSEST_FIXED,
    I64_MIN,
    U64_MASK,
    bit_length_u64,
    bytes_to_long_be,
    decode_bit_width,
    encode_bit_width,
    find_closest_num_bits,
    get_closest_aligned_fixed_bits,
    get_closest_fixed_bits,
    is_safe_subtract,
    pack_bits,
    percentile_bits,
    read_vslong,
    read_vulong,
    unpack_bits,
    write_vslong,
    write_vulong,
    zigzag_decode,
    zigzag_decode_scalar,
    zigzag_encode,
    zigzag_encode_scalar,
)

MIN_REPEAT = 3
MAX_SHORT_REPEAT = 10
MAX_SCOPE = 512

SHORT_REPEAT = 0
DIRECT = 1
PATCHED_BASE = 2
DELTA = 3


def _wrap_i64(v: int) -> int:
    v &= U64_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# Segment emitters (shared by the fast encoder and the slow test port).
# ---------------------------------------------------------------------------


def _emit_short_repeat(out: bytearray, value: int, count: int, signed: bool) -> None:
    """writeShortRepeatValues (writer v2:526-564); 3 <= count <= 10."""
    rep = zigzag_encode_scalar(value) if signed else (value & U64_MASK)
    nbits = find_closest_num_bits(rep)
    nbytes = (nbits >> 3) if nbits % 8 == 0 else (nbits >> 3) + 1
    header = (SHORT_REPEAT << 6) | ((nbytes - 1) << 3) | (count - MIN_REPEAT)
    out.append(header & 0xFF)
    for j in range(nbytes - 1, -1, -1):
        out.append((rep >> (j * 8)) & 0xFF)


def _emit_fixed_delta(out: bytearray, first: int, delta: int, count: int,
                      signed: bool) -> None:
    """writeDeltaValues, isFixedDelta branch: header + base varint +
    fixed-delta vslong; no blob."""
    run_len = count - 1
    header = (DELTA << 6) | ((run_len & 0x100) >> 8)
    out.append(header & 0xFF)
    out.append(run_len & 0xFF)
    if signed:
        write_vslong(out, first)
    else:
        write_vulong(out, first)
    write_vslong(out, delta)


def _emit_delta_blob(out: bytearray, vals: np.ndarray, initial_delta: int,
                     adj_abs: np.ndarray, bits_delta_max: int,
                     signed: bool) -> None:
    """writeDeltaValues, monotonic non-fixed branch."""
    n = len(vals)
    fb = get_closest_aligned_fixed_bits(bits_delta_max)
    if fb == 1:
        fb = 2
    efb = encode_bit_width(fb) << 1
    run_len = n - 1
    header = (DELTA << 6) | efb | ((run_len & 0x100) >> 8)
    out.append(header & 0xFF)
    out.append(run_len & 0xFF)
    if signed:
        write_vslong(out, int(vals[0]))
    else:
        write_vulong(out, int(vals[0]))
    write_vslong(out, initial_delta)
    # adj_abs holds |delta_j| for j >= 2 (n-2 entries), packed at fb
    if n > 2:
        out.extend(pack_bits(adj_abs.view(np.uint64), fb))


def _emit_direct(out: bytearray, zz: np.ndarray, zz100p: int) -> None:
    """writeDirectValues (writer v2:570-607) with aligned bit packing."""
    n = len(zz)
    fb = get_closest_aligned_fixed_bits(zz100p)
    efb = encode_bit_width(fb) << 1
    run_len = n - 1
    header = (DIRECT << 6) | efb | ((run_len & 0x100) >> 8)
    out.append(header & 0xFF)
    out.append(run_len & 0xFF)
    out.extend(pack_bits(zz, fb))


def _emit_patched_base(out: bytearray, vals: np.ndarray, vmin: int,
                       base_red: np.ndarray, br95p: int, br100p: int) -> None:
    """preparePatchedBlob + writePatchedBaseValues (writer v2:415-517,
    609-699), including the gap>255 padding entries and the
    patchWidth 64 -> 56 adjustment."""
    n = len(vals)
    br_bits_95p = br95p
    patch_width = get_closest_fixed_bits(br100p - br_bits_95p)
    if patch_width == 64:
        patch_width = 56
        br_bits_95p = 8
    mask = (1 << br_bits_95p) - 1

    br_list = None
    if n <= 128:
        # scalar path: python list ops beat numpy call overhead here
        br_list = base_red.tolist()
        idxs = []
        over_vals = []
        for i, bv in enumerate(br_list):
            if bv > mask:
                idxs.append(i)
                over_vals.append(bv)
                br_list[i] = bv & mask
    else:
        base_red = base_red.copy()
        idx_arr = np.flatnonzero(base_red > mask)
        idxs = idx_arr.tolist()
        over_vals = base_red[idx_arr].tolist()
        base_red[idx_arr] &= mask

    gaps = []
    patches = []
    prev = 0
    max_gap = 0
    for j, bv in zip(idxs, over_vals):
        gap = j - prev
        if gap > max_gap:
            max_gap = gap
        prev = j
        gaps.append(gap)
        patches.append((bv & U64_MASK) >> br_bits_95p)

    patch_length = len(idxs)
    if max_gap == 0 and patch_length != 0:
        patch_gap_width = 1
    else:
        patch_gap_width = find_closest_num_bits(max_gap)
    if patch_gap_width > 8:
        patch_gap_width = 8
        if max_gap == 511:
            patch_length += 2
        else:
            patch_length += 1

    # build gap-vs-patch list with >255 gap padding entries
    gvp = [0] * patch_length
    j = 0
    for g, p in zip(gaps, patches):
        while g > 255:
            gvp[j] = (255 << patch_width) & U64_MASK
            j += 1
            g -= 255
        gvp[j] = ((g << patch_width) | p) & U64_MASK
        j += 1

    fb = br_bits_95p
    efb = encode_bit_width(fb) << 1
    run_len = n - 1
    header1 = (PATCHED_BASE << 6) | efb | ((run_len & 0x100) >> 8)
    header2 = run_len & 0xFF

    is_negative = vmin < 0
    base_val = -vmin if is_negative else vmin
    base_width = find_closest_num_bits(base_val) + 1
    base_bytes = base_width // 8 if base_width % 8 == 0 else base_width // 8 + 1
    bb = (base_bytes - 1) << 5
    if is_negative:
        base_val |= 1 << (base_bytes * 8 - 1)

    header3 = bb | encode_bit_width(patch_width)
    header4 = ((patch_gap_width - 1) << 5) | patch_length

    out.append(header1 & 0xFF)
    out.append(header2 & 0xFF)
    out.append(header3 & 0xFF)
    out.append(header4 & 0xFF)
    for k in range(base_bytes - 1, -1, -1):
        out.append((base_val >> (k * 8)) & 0xFF)

    if br_list is not None:
        out.extend(_pack_bits_int(br_list, get_closest_fixed_bits(fb)))
    else:
        out.extend(pack_bits(base_red.view(np.uint64),
                             get_closest_fixed_bits(fb)))
    out.extend(_pack_bits_int(
        gvp, get_closest_fixed_bits(patch_gap_width + patch_width)))


_SMALL_SEGMENT = 48


def _pack_bits_int(vals, width: int) -> bytes:
    """MSB-first bit packing via one big Python int (fast for tiny n)."""
    mask = (1 << width) - 1
    big = 0
    for x in vals:
        big = (big << width) | (x & mask)
    nbits = len(vals) * width
    pad = (-nbits) % 8
    big <<= pad
    return big.to_bytes((nbits + pad) // 8, "big")


def _percentile_bits_small(widths_desc, p: float) -> int:
    """percentileBits on a pre-sorted-descending width list (scalar)."""
    k = int(float(len(widths_desc)) * (1.0 - p))
    return widths_desc[k]


def _write_segment_variable_small(out: bytearray, vals, signed: bool) -> None:
    """Pure-Python determineEncoding for short variable runs; avoids
    numpy call overhead on fragmented data. Identical output to the
    vectorized path."""
    n = len(vals)
    if signed:
        zz = [((x << 1) ^ (x >> 63)) & U64_MASK for x in vals]
    else:
        zz = [x & U64_MASK for x in vals]
    widths = sorted((int(_CLOSEST_FIXED[z.bit_length()]) for z in zz),
                    reverse=True)
    zz100p = widths[0]

    def emit_direct():
        fb = int(_CLOSEST_ALIGNED[zz100p])
        header = (DIRECT << 6) | (encode_bit_width(fb) << 1) | (
            ((n - 1) & 0x100) >> 8)
        out.append(header & 0xFF)
        out.append((n - 1) & 0xFF)
        out.extend(_pack_bits_int(zz, fb))

    if n <= MIN_REPEAT:
        emit_direct()
        return
    deltas = [_wrap_i64(vals[j + 1] - vals[j]) for j in range(n - 1)]
    vmin = min(vals)
    vmax = max(vals)
    initial_delta = deltas[0]
    if not is_safe_subtract(vmax, vmin):
        emit_direct()
        return
    if vmin == vmax:
        _emit_fixed_delta(out, vals[0], 0, n, signed)
        return
    if all(d == initial_delta for d in deltas):
        _emit_fixed_delta(out, vals[0], deltas[-1], n, signed)
        return
    if initial_delta != 0 and (
            all(d >= 0 for d in deltas) or all(d <= 0 for d in deltas)):
        adj_abs = [abs(d) if d != I64_MIN else I64_MIN for d in deltas[1:]]
        delta_max = max([initial_delta] + adj_abs) if adj_abs else initial_delta
        bits_delta_max = find_closest_num_bits(delta_max)
        fb = get_closest_aligned_fixed_bits(bits_delta_max)
        if fb == 1:
            fb = 2
        header = (DELTA << 6) | (encode_bit_width(fb) << 1) | (
            ((n - 1) & 0x100) >> 8)
        out.append(header & 0xFF)
        out.append((n - 1) & 0xFF)
        if signed:
            write_vslong(out, vals[0])
        else:
            write_vulong(out, vals[0])
        write_vslong(out, initial_delta)
        if n > 2:
            out.extend(_pack_bits_int([a & U64_MASK for a in adj_abs], fb))
        return
    zz90p = _percentile_bits_small(widths, 0.9)
    if zz100p - zz90p > 1:
        arr = np.array(vals, dtype=np.int64)
        with np.errstate(over="ignore"):
            base_red = arr - np.int64(vmin)
        br95p = percentile_bits(base_red.view(np.uint64), 0.95)
        br100p = percentile_bits(base_red.view(np.uint64), 1.0)
        if br100p - br95p != 0:
            _emit_patched_base(out, arr, vmin, base_red, br95p, br100p)
            return
    emit_direct()


def _write_segment_variable(out: bytearray, vals: np.ndarray, signed: bool) -> None:
    """determineEncoding (writer v2:265-402) + dispatch, over one buffered
    variable run of 1..512 values."""
    n = len(vals)
    if n == 0:
        return
    if n <= _SMALL_SEGMENT:
        _write_segment_variable_small(
            out, [int(x) for x in vals], signed)
        return
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    zz = zigzag_encode(vals) if signed else vals.view(np.uint64)
    zz_ws = np.sort(_CLOSEST_FIXED[bit_length_u64(zz)])  # ascending widths
    zz100p = int(zz_ws[-1])

    if n <= MIN_REPEAT:
        _emit_direct(out, zz, zz100p)
        return

    deltas = np.diff(vals)
    vmin = int(vals.min())
    vmax = int(vals.max())
    initial_delta = int(deltas[0])
    curr_delta = int(deltas[-1])
    is_increasing = bool(np.all(deltas >= 0))
    is_decreasing = bool(np.all(deltas <= 0))
    is_fixed_delta = bool(np.all(deltas == deltas[0]))

    if not is_safe_subtract(vmax, vmin):
        _emit_direct(out, zz, zz100p)
        return

    if vmin == vmax:
        # equal-value run flushed through the variable path
        _emit_fixed_delta(out, int(vals[0]), 0, n, signed)
        return

    if is_fixed_delta:
        _emit_fixed_delta(out, int(vals[0]), curr_delta, n, signed)
        return

    if initial_delta != 0 and (is_increasing or is_decreasing):
        adj_abs = np.abs(deltas[1:])
        delta_max = initial_delta
        if n > 2:
            delta_max = max(delta_max, int(adj_abs.max()))
        bits_delta_max = find_closest_num_bits(delta_max)
        _emit_delta_blob(out, vals, initial_delta, adj_abs, bits_delta_max, signed)
        return

    zz90p = int(zz_ws[n - 1 - int(float(n) * (1.0 - 0.9))])
    if zz100p - zz90p > 1:
        base_red = vals - np.int64(vmin)
        br_ws = np.sort(_CLOSEST_FIXED[bit_length_u64(base_red.view(np.uint64))])
        br95p = int(br_ws[n - 1 - int(float(n) * (1.0 - 0.95))])
        br100p = int(br_ws[-1])
        if br100p - br95p != 0:
            _emit_patched_base(out, vals, vmin, base_red, br95p, br100p)
            return
    _emit_direct(out, zz, zz100p)


def _write_segment_fixed(out: bytearray, value: int, count: int, signed: bool) -> None:
    """Flush a pending fixed (equal-value) run of count >= 3 values."""
    if count <= MAX_SHORT_REPEAT:
        _emit_short_repeat(out, value, count, signed)
    else:
        _emit_fixed_delta(out, value, 0, count, signed)


# ---------------------------------------------------------------------------
# Fast encoder: breaker/span simulation of the writer state machine.
#
# The per-value state machine's segmentation depends only on (a) maximal
# equal-value runs of length >= 3 ("breakers") and (b) the 512-value scope
# cap.  Values between breakers ("spans") accumulate into variable runs
# that flush every 512 values; breakers convert to fixed runs (flushing
# the variable prefix) and emit SHORT_REPEAT / fixed-delta segments.
# Python-loop iterations are therefore O(#segments + #breakers), and the
# determineEncoding analysis for full 512-value variable blocks is
# batched as one matrix computation per span.
# ---------------------------------------------------------------------------


# decision codes for the batched analyzer
_D_DIRECT = 0
_D_FIXED0 = 1  # min == max -> fixed delta 0
_D_FIXEDD = 2  # constant non-zero delta
_D_MONO = 3  # monotonic delta blob
_D_PATCHED = 4

from .bits import _DECODE_WIDTH, _ENCODE_WIDTH  # noqa: E402

_P90_FACTOR = 1.0 - 0.9
_P95_FACTOR = 1.0 - 0.95


def _percentile_from_hist(hist: np.ndarray, per_len: np.ndarray) -> np.ndarray:
    """Vectorized percentileBits over per-segment width-code histograms
    (nseg x 32): the highest width whose top-down cumulative count
    exceeds per_len (utils.go:233-260 scan)."""
    cum = np.cumsum(hist[:, ::-1], axis=1).astype(np.float64)
    col = np.argmax(cum > per_len[:, None], axis=1)
    return _DECODE_WIDTH[31 - col]


def _analyze_segments(v, zz, starts, lens):
    """Batched determineEncoding over all variable segments at once.

    starts/lens are per-segment slices of v (contiguous).  Returns
    (decision, params dict of per-segment arrays).
    """
    nseg = len(starts)
    total = int(lens.sum())
    # gather segment elements (segments may be separated by fixed runs)
    goff = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(lens, out=goff[1:])
    flat = np.repeat(starts - goff[:-1], lens) + np.arange(total, dtype=np.int64)
    g = v[flat]
    zz_g = zz[flat]
    seg_of = np.repeat(np.arange(nseg, dtype=np.int64), lens)

    # per-segment width-code histograms -> zz percentiles
    wcodes = _ENCODE_WIDTH[_CLOSEST_FIXED[bit_length_u64(zz_g)]]
    hist = np.bincount(seg_of * 32 + wcodes, minlength=nseg * 32).reshape(
        nseg, 32)
    zz100p = _percentile_from_hist(hist, np.zeros(nseg))
    lens_f = lens.astype(np.float64)
    zz90p = _percentile_from_hist(hist, lens_f * _P90_FACTOR)

    gs = goff[:-1]
    mn = np.minimum.reduceat(g, gs)
    mx = np.maximum.reduceat(g, gs)

    # per-delta arrays over the gathered values, junk at segment joins;
    # one trailing sentinel slot keeps reduceat in bounds
    dg = np.zeros(total, dtype=np.int64)
    if total > 1:
        np.subtract(g[1:], g[:-1], out=dg[:total - 1])
    junk = gs[1:] - 1
    first_d = dg[np.minimum(gs, max(total - 2, 0))]

    inc_ok = dg >= 0
    inc_ok[junk] = True
    inc_ok[-1] = True
    dec_ok = dg <= 0
    dec_ok[junk] = True
    dec_ok[-1] = True
    eq = dg == np.repeat(first_d, lens)
    eq[-1] = True
    eq[junk] = True
    inc = np.logical_and.reduceat(inc_ok, gs)
    dec = np.logical_and.reduceat(dec_ok, gs)
    fixedflag = np.logical_and.reduceat(eq, gs)

    diff = (mx.view(np.uint64) - mn.view(np.uint64)).view(np.int64)
    unsafe = ~(((mx ^ mn) >= 0) | ((mx ^ diff) >= 0))

    decision = np.full(nseg, _D_DIRECT, dtype=np.int8)
    eligible = (lens > MIN_REPEAT) & ~unsafe
    decision[eligible & (mn == mx)] = _D_FIXED0
    decision[eligible & (mn != mx) & fixedflag] = _D_FIXEDD
    mono = eligible & (mn != mx) & ~fixedflag & (first_d != 0) & (inc | dec)
    decision[mono] = _D_MONO
    cand = eligible & (mn != mx) & ~fixedflag & ~mono & (zz100p - zz90p > 1)
    br95p = br100p = None
    if cand.any():
        # base-reduced percentile analysis over candidate segments only
        cand_idx = np.flatnonzero(cand)
        clens = lens[cand_idx]
        cmask = cand[seg_of]
        g_c = g[cmask]
        br = (g_c.view(np.uint64) -
              np.repeat(mn[cand_idx], clens).view(np.uint64))
        brc = _ENCODE_WIDTH[_CLOSEST_FIXED[bit_length_u64(br)]]
        csub = np.repeat(np.arange(len(cand_idx), dtype=np.int64), clens)
        bh = np.bincount(csub * 32 + brc,
                         minlength=len(cand_idx) * 32).reshape(-1, 32)
        c100 = _percentile_from_hist(bh, np.zeros(len(cand_idx)))
        c95 = _percentile_from_hist(
            bh, clens.astype(np.float64) * _P95_FACTOR)
        br100p = np.zeros(nseg, dtype=np.int64)
        br95p = np.zeros(nseg, dtype=np.int64)
        br100p[cand_idx] = c100
        br95p[cand_idx] = c95
        decision[cand & (br100p != br95p)] = _D_PATCHED
    return decision, {
        "zz100p": zz100p, "mn": mn, "first_d": first_d,
        "br95p": br95p, "br100p": br100p,
    }


def encode(values: np.ndarray, signed: bool) -> bytes:
    """Bit-identical RLE v2 encode of an int64 array."""
    with np.errstate(over="ignore"):
        return _encode(values, signed)


_BYTE_FB = {8: 7, 16: 6, 24: 5, 32: 4, 40: 3, 48: 2, 56: 1, 64: 0}


def _emit_ops(out: bytearray, v: np.ndarray, ops: list, signed: bool) -> None:
    """Emit the collected (fixed-run | variable-segment) ops in order,
    with one batched determineEncoding pass over all variable segments."""
    v_idx = [i for i, op in enumerate(ops) if op[0] == 0]
    decision = params = None
    zz = None
    dv = None
    be_all = None
    if v_idx:
        starts = np.array([ops[i][1] for i in v_idx], dtype=np.int64)
        lens = np.array([ops[i][2] for i in v_idx], dtype=np.int64)
        zz = zigzag_encode(v) if signed else v.view(np.uint64)
        decision, params = _analyze_segments(v, zz, starts, lens)
        if (decision == _D_MONO).any():
            dv = np.diff(v)
        zz100p = params["zz100p"]
        mn = params["mn"]
        first_d = params["first_d"]
        br95p = params["br95p"]
        br100p = params["br100p"]
        # r6: when byte-aligned DIRECT segments cover most of the array
        # (the typical token-stream shape: thousands of 512-value
        # blocks), ONE whole-array big-endian conversion replaces one
        # small astype per segment (~6 us each); the coverage gate
        # keeps the old per-segment path when variable data is a tiny
        # tail of a mostly-fixed array, where the 8n cold alloc was
        # measured to dominate.  Output bytes are identical.
        direct = decision == _D_DIRECT
        if direct.any():
            aligned = np.isin(_CLOSEST_ALIGNED[zz100p],
                              list(_BYTE_FB.keys()))
            cov = int(lens[direct & aligned].sum())
            if 2 * cov >= len(v):
                be_all = zz.astype(">u8").view(np.uint8).reshape(-1, 8)

    si = 0  # index into variable-segment arrays
    for op in ops:
        if op[0] == 1:  # fixed run: (1, value, count)
            _write_segment_fixed(out, op[1], op[2], signed)
            continue
        if op[0] == 2:  # fixed-delta chunk(s): (2, value, count, repeatN)
            for _ in range(op[3]):
                _emit_fixed_delta(out, op[1], 0, op[2], signed)
            continue
        s, ln = op[1], op[2]
        e = s + ln
        d = int(decision[si])
        if d == _D_DIRECT:
            fb = int(_CLOSEST_ALIGNED[zz100p[si]])
            run_len = ln - 1
            header = (DIRECT << 6) | (encode_bit_width(fb) << 1) | (
                (run_len & 0x100) >> 8)
            out.append(header)
            out.append(run_len & 0xFF)
            col = _BYTE_FB.get(fb)
            if col is not None:
                if be_all is not None:
                    out.extend(be_all[s:e, col:].tobytes())
                else:
                    # big-endian bytes built PER SEGMENT: the 8n-byte
                    # whole-array matrix (be_all) only pays off when
                    # DIRECT segments cover most values — its cold
                    # first-touch alloc was measured at 742 ms for a
                    # 4M-value array with a 20-value variable tail
                    seg_be = zz[s:e].astype(">u8").view(np.uint8) \
                        .reshape(ln, 8)
                    out.extend(seg_be[:, col:].tobytes())
            elif ln <= _SMALL_SEGMENT:
                out.extend(_pack_bits_int(zz[s:e].tolist(), fb))
            else:
                out.extend(pack_bits(zz[s:e], fb))
        elif d == _D_FIXED0:
            _emit_fixed_delta(out, int(v[s]), 0, ln, signed)
        elif d == _D_FIXEDD:
            _emit_fixed_delta(out, int(v[s]), int(first_d[si]), ln, signed)
        elif d == _D_MONO:
            adj_abs = np.abs(dv[s + 1:e - 1])
            delta_max = int(first_d[si])
            if ln > 2:
                delta_max = max(delta_max, int(adj_abs.max()))
            _emit_delta_blob(out, v[s:e], int(first_d[si]), adj_abs,
                             find_closest_num_bits(delta_max), signed)
        else:  # _D_PATCHED
            vmin = int(mn[si])
            base_red = v[s:e] - np.int64(vmin)
            _emit_patched_base(out, v[s:e], vmin, base_red,
                               int(br95p[si]), int(br100p[si]))
        si += 1


def _encode(values: np.ndarray, signed: bool) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    out = bytearray()
    if n == 0:
        return bytes(out)

    # maximal equal-value runs of length >= 3 ("breakers"): positions i
    # with v[i]==v[i+1]==v[i+2], grouped into maximal stretches
    if n >= MIN_REPEAT:
        eq = v[1:] == v[:-1]
        both = eq[:-1] & eq[1:]
        bidx = np.flatnonzero(both)
    else:
        bidx = np.empty(0, dtype=np.int64)
    if len(bidx):
        gap = np.flatnonzero(np.diff(bidx) > 1)
        g_first = np.empty(len(gap) + 1, dtype=np.int64)
        g_first[0] = 0
        g_first[1:] = gap + 1
        g_last = np.empty(len(gap) + 1, dtype=np.int64)
        g_last[:-1] = gap
        g_last[-1] = len(bidx) - 1
        b_starts = bidx[g_first].tolist()
        b_ends = (bidx[g_last] + MIN_REPEAT).tolist()
    else:
        b_starts = []
        b_ends = []
    nb = len(b_starts)

    pos = 0
    k = 0
    buf_start = 0  # buffer is v[buf_start : buf_start+nlit]
    nlit = 0
    var = 0  # variableRunLength
    fixed = 0  # fixedRunLength
    ops: list = []  # (0,start,len)=variable (1,val,count)=fixed (2,val,512,k)

    while pos < n:
        if k < nb and pos == b_starts[k]:
            # ---- breaker run of L >= 3 equal values
            e = b_ends[k]
            L = e - pos
            val = int(v[pos])
            if fixed >= MIN_REPEAT:
                ops.append((1, int(v[buf_start]), fixed))
                nlit = var = fixed = 0
            elif 0 < fixed < MIN_REPEAT:
                # 1-2 pending equal values merge into the variable run
                var = nlit
                fixed = 0
            if var == 0:
                consumed = 0
            elif MAX_SCOPE - var <= 2:
                # the scope cap hits before the third equal value arrives:
                # the variable flush sweeps in the first 1-2 breaker values
                consumed = MAX_SCOPE - var
                ops.append((0, buf_start, pos + consumed - buf_start))
                nlit = var = 0
            else:
                # third equal value converts to a fixed run: flush the
                # variable prefix (the old buffer, without breaker values)
                consumed = 0
                ops.append((0, buf_start, var))
                nlit = var = 0
            # fixed accumulation over the remaining values, 512 per chunk
            l_f = L - consumed
            chunks, rem = divmod(l_f, MAX_SCOPE)
            if chunks:
                ops.append((2, val, MAX_SCOPE, chunks))
            if rem:
                buf_start = e - rem
                nlit = rem
                fixed = rem
                var = 1 if rem == 1 else 0
            else:
                nlit = fixed = var = 0
            pos = e
            k += 1
        else:
            # ---- span of runs shorter than 3: pure variable accumulation
            span_end = b_starts[k] if k < nb else n
            if fixed >= MIN_REPEAT:
                ops.append((1, int(v[buf_start]), fixed))
                nlit = var = fixed = 0
            elif 0 < fixed < MIN_REPEAT:
                var = nlit
                fixed = 0
            if nlit == 0:
                buf_start = pos
            # head: complete the current partially-filled block
            if var:
                take = min(span_end - pos, MAX_SCOPE - var)
                var += take
                nlit += take
                pos += take
                if var == MAX_SCOPE:
                    ops.append((0, buf_start, MAX_SCOPE))
                    buf_start = pos
                    nlit = var = 0
            # middle: full 512-value blocks
            full = (span_end - pos) // MAX_SCOPE
            if full:
                ops.extend(
                    (0, pos + i * MAX_SCOPE, MAX_SCOPE) for i in range(full))
                pos += full * MAX_SCOPE
                buf_start = pos
            # tail: remainder stays pending
            rem = span_end - pos
            if rem:
                if nlit == 0:
                    buf_start = pos
                var += rem
                nlit += rem
                pos += rem

    # --- Flush (writer v2:56-85)
    if nlit != 0:
        if var != 0 or fixed < MIN_REPEAT:
            ops.append((0, buf_start, nlit))
        else:
            ops.append((1, int(v[buf_start]), fixed))

    _emit_ops(out, v, ops, signed)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (reader v2:106-421), vectorized per segment.
# ---------------------------------------------------------------------------


def decode(data, n: int, signed: bool) -> np.ndarray:
    """Decode n int64 values from an RLE v2 byte stream."""
    with np.errstate(over="ignore"):
        return _decode(data, n, signed)


def _decode(data, n: int, signed: bool) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    out = np.empty(n, dtype=np.int64)
    got = 0
    pos = 0
    # r6: byte-aligned DIRECT segments (the dominant kind in token
    # streams: thousands of 512-value blocks at 8/16/24/... bits) are
    # only REGISTERED during the sequential header walk and then
    # materialized in ONE vectorized gather per byte width — replacing
    # one unpack_bits + zigzag + slice-assign per segment (~10 us each).
    ba_recs: list[tuple[int, int, int, int]] = []  # (pos, nb, take, got)
    while got < n:
        first = int(buf[pos])
        pos += 1
        enc = (first >> 6) & 0x03
        if enc == SHORT_REPEAT:
            size = ((first >> 3) & 0x07) + 1
            l = (first & 0x07) + MIN_REPEAT
            val, pos = bytes_to_long_be(buf, pos, size)
            if signed:
                val = zigzag_decode_scalar(val)
            else:
                val = _wrap_i64(val)
            # clamp the final run to the requested n (uniform partial-
            # read semantics across segment kinds — DIRECT/DELTA used
            # to surface an opaque numpy broadcast error instead)
            out[got:got + min(l, n - got)] = val
            got += min(l, n - got)
        elif enc == DIRECT:
            fb = decode_bit_width((first >> 1) & 0x1F)
            b2 = int(buf[pos])
            pos += 1
            l = (((first & 0x01) << 8) | b2) + 1
            take = min(l, n - got)
            if fb % 8 == 0:
                ba_recs.append((pos, fb // 8, take, got))
            else:
                vals = unpack_bits(buf, l, fb, pos)
                if signed:
                    out[got:got + take] = zigzag_decode(vals)[:take]
                else:
                    out[got:got + take] = vals.view(np.int64)[:take]
            pos += (l * fb + 7) // 8
            got += take
        elif enc == PATCHED_BASE:
            got, pos = _decode_patched_base(buf, pos, first, out, got)
        else:  # DELTA
            got, pos = _decode_delta(buf, pos, first, out, got, signed)
    if ba_recs:
        _fill_byte_aligned_direct(buf, out, ba_recs, signed)
    return out


def _fill_byte_aligned_direct(buf: np.ndarray, out: np.ndarray,
                              recs: list, signed: bool) -> None:
    """Materialize registered byte-aligned DIRECT segments: one fancy
    byte gather + one big-endian view + one zigzag + one scatter per
    distinct byte width.  Values are identical to the per-segment
    unpack_bits path (same bytes, same elementwise ops)."""
    by_nb: dict[int, list] = {}
    for rec in recs:
        by_nb.setdefault(rec[1], []).append(rec)
    for nb, rs in by_nb.items():
        poss = np.array([r[0] for r in rs], dtype=np.int64)
        takes = np.array([r[2] for r in rs], dtype=np.int64)
        gots = np.array([r[3] for r in rs], dtype=np.int64)
        total = int(takes.sum())
        if total == 0:
            continue
        # source byte index per gathered byte: pos_j + within-segment
        # offset (concat-arange trick, all vectorized)
        bl = takes * nb
        cum_b = np.zeros(len(rs) + 1, dtype=np.int64)
        np.cumsum(bl, out=cum_b[1:])
        src = np.repeat(poss - cum_b[:-1], bl) + \
            np.arange(cum_b[-1], dtype=np.int64)
        raw = buf[src].reshape(total, nb)
        mat = np.zeros((total, 8), dtype=np.uint8)
        mat[:, 8 - nb:] = raw
        vals = mat.view(">u8").ravel().astype(np.uint64)
        dec = zigzag_decode(vals) if signed else vals.view(np.int64)
        cum_t = np.zeros(len(rs) + 1, dtype=np.int64)
        np.cumsum(takes, out=cum_t[1:])
        tgt = np.repeat(gots - cum_t[:-1], takes) + \
            np.arange(total, dtype=np.int64)
        out[tgt] = dec


def _decode_delta(buf, pos, first, out, got, signed):
    fbo = (first >> 1) & 0x1F
    fb = decode_bit_width(fbo) if fbo != 0 else 0
    b2 = int(buf[pos])
    pos += 1
    l = ((first & 0x01) << 8) | b2  # actual run length - 1
    if signed:
        first_val, pos = read_vslong(buf, pos)
    else:
        first_val, pos = read_vulong(buf, pos)
        first_val = _wrap_i64(first_val)
    # clamp to the caller's remaining capacity (uniform partial-read
    # semantics with SHORT_REPEAT/DIRECT); pos still advances past the
    # whole segment so the stream stays consistent
    take = min(l + 1, out.size - got)
    if fb == 0:
        fd, pos = read_vslong(buf, pos)
        if fd == 0:
            out[got:got + take] = first_val
        else:
            seq = np.uint64(first_val & U64_MASK) + np.arange(
                l + 1, dtype=np.uint64) * np.uint64(fd & U64_MASK)
            out[got:got + take] = seq.view(np.int64)[:take]
        got += take
    else:
        delta_base, pos = read_vslong(buf, pos)
        nblob = l - 1
        blob = unpack_bits(buf, nblob, fb, pos)
        pos += (nblob * fb + 7) // 8
        deltas = np.empty(l + 1, dtype=np.uint64)
        deltas[0] = np.uint64(first_val & U64_MASK)
        deltas[1] = np.uint64(delta_base & U64_MASK)
        if delta_base < 0:
            deltas[2:] = (~blob + np.uint64(1))
        else:
            deltas[2:] = blob
        vals = np.cumsum(deltas, dtype=np.uint64)
        out[got:got + take] = vals.view(np.int64)[:take]
        got += take
    return got, pos


def _decode_patched_base(buf, pos, first, out, got):
    fixed_bits = decode_bit_width((first >> 1) & 0x1F)
    b2 = int(buf[pos])
    pos += 1
    length = (((first & 0x01) << 8) | b2) + 1
    third = int(buf[pos])
    pos += 1
    base_width = ((third >> 5) & 0x07) + 1
    patch_width = decode_bit_width(third & 0x1F)
    fourth = int(buf[pos])
    pos += 1
    patch_gap_width = ((fourth >> 5) & 0x07) + 1
    patch_list_length = fourth & 0x1F
    base, pos = bytes_to_long_be(buf, pos, base_width)
    sign_mask = 1 << (base_width * 8 - 1)
    if base & sign_mask:
        base = -(base & ~sign_mask)

    unpacked = unpack_bits(buf, length, fixed_bits, pos)
    pos += (length * fixed_bits + 7) // 8
    bit_size = get_closest_fixed_bits(patch_width + patch_gap_width)
    patch_blob = unpack_bits(buf, patch_list_length, bit_size, pos)
    pos += (patch_list_length * bit_size + 7) // 8

    # apply patches
    patch_mask = np.uint64((1 << patch_width) - 1)
    gaps = (patch_blob >> np.uint64(patch_width)).astype(np.int64)
    patches = patch_blob & patch_mask
    # expand >255-gap padding entries (gap==255, patch==0 chains)
    abs_idx = []
    vals = []
    acc = 0
    cur = 0
    for g, p in zip(gaps.tolist(), patches.tolist()):
        if g == 255 and p == 0:
            acc += 255
            continue
        cur += acc + g
        abs_idx.append(cur)
        vals.append(p)
        acc = 0
    if abs_idx:
        ai = np.array(abs_idx, dtype=np.int64)
        pv = np.array(vals, dtype=np.uint64)
        unpacked[ai] |= pv << np.uint64(fixed_bits)
    res = np.uint64(base & U64_MASK) + unpacked
    # clamp to remaining capacity (uniform partial-read semantics)
    take = min(length, out.size - got)
    out[got:got + take] = res.view(np.int64)[:take]
    return got + take, pos


# ---------------------------------------------------------------------------
# Slow per-value port of the writer state machine (tests only).
# ---------------------------------------------------------------------------


class _SlowWriter:
    """Direct per-value port of runlengthintegerwriterv2.go:87-212; used by
    tests to cross-validate the fast run-level encoder's segmentation."""

    def __init__(self, signed: bool):
        self.signed = signed
        self.out = bytearray()
        self.literals: list[int] = []
        self.prev_delta = 0
        self.fixed_run = 0
        self.var_run = 0

    def _flush_variable(self):
        _write_segment_variable(
            self.out, np.array(self.literals, dtype=np.int64), self.signed)
        self.literals = []
        self.var_run = 0

    def write(self, val: int) -> None:
        lits = self.literals
        if not lits:
            lits.append(val)
            self.fixed_run = 1
            self.var_run = 1
            return
        if len(lits) == 1:
            self.prev_delta = _wrap_i64(val - lits[0])
            lits.append(val)
            if val == lits[0]:
                self.fixed_run = 2
                self.var_run = 0
            else:
                self.fixed_run = 0
                self.var_run = 2
            return
        current_delta = _wrap_i64(val - lits[-1])
        if self.prev_delta == 0 and current_delta == 0:
            lits.append(val)
            if self.var_run > 0:
                self.fixed_run = 2
            self.fixed_run += 1
            if self.fixed_run >= MIN_REPEAT and self.var_run > 0:
                tail = lits[-MIN_REPEAT:]
                self.literals = lits[:-MIN_REPEAT]
                self.var_run -= MIN_REPEAT - 1
                self._flush_variable()
                self.literals = list(tail)
            if self.fixed_run == MAX_SCOPE:
                # determineEncoding on an all-equal buffer -> fixed delta 0
                _emit_fixed_delta(
                    self.out, self.literals[0], 0, self.fixed_run, self.signed)
                self.literals = []
                self.fixed_run = 0
                self.var_run = 0
            return
        # variable branch
        if self.fixed_run >= MIN_REPEAT:
            _write_segment_fixed(
                self.out, self.literals[0], self.fixed_run, self.signed)
            self.literals = []
            self.fixed_run = 0
            self.var_run = 0
        if 0 < self.fixed_run < MIN_REPEAT:
            if val != self.literals[-1]:
                self.var_run = self.fixed_run
                self.fixed_run = 0
        if not self.literals:
            self.literals.append(val)
            self.fixed_run = 1
            self.var_run = 1
        else:
            self.prev_delta = current_delta
            self.literals.append(val)
            self.var_run += 1
            if self.var_run == MAX_SCOPE:
                self._flush_variable()
                self.fixed_run = 0

    def flush(self) -> bytes:
        if self.literals:
            if self.var_run != 0:
                self._flush_variable()
            elif self.fixed_run != 0:
                if self.fixed_run < MIN_REPEAT:
                    self.var_run = self.fixed_run
                    self._flush_variable()
                elif self.fixed_run <= MAX_SHORT_REPEAT:
                    _emit_short_repeat(
                        self.out, self.literals[0], self.fixed_run, self.signed)
                    self.literals = []
                else:
                    _emit_fixed_delta(
                        self.out, self.literals[0], 0, self.fixed_run, self.signed)
                    self.literals = []
        return bytes(self.out)


def encode_slow(values, signed: bool) -> bytes:
    with np.errstate(over="ignore"):
        w = _SlowWriter(signed)
        for v in np.asarray(values, dtype=np.int64).tolist():
            w.write(v)
        return w.flush()
