"""Lossy WebP (VP8 key frame) decode — RFC 6386, stdlib + numpy only
(r4).

This closes the final WebP gap: lossless (VP8L) decodes natively
since r4 (extract/webp.py); the lossy VP8 still-image path — what
phone exports and CDN re-encodes actually emit — was the last typed
error.  WebP stills are VP8 KEY frames, so the inter-frame machinery
(reference buffers, motion vectors, golden/altref) is structurally
absent from valid files and stays out of scope; everything a key
frame can contain is implemented:

- **Boolean entropy decoder** (RFC 7): 8-bit probability arithmetic
  coder with the spec's renormalization; literals and tree decoding.
- **Headers** (RFC 9): frame tag + start code + scaled dimensions,
  color space, segmentation (map update with tree probs, per-segment
  absolute/delta quantizer and loop-filter values), loop filter
  type/level/sharpness with reference/mode deltas, token partitions,
  quantizer indices with the five per-plane deltas, and the
  coefficient probability update loop over the full
  [4][8][3][11] lattice.
- **Mode parsing** (RFC 11): key-frame Y modes (contextual B_PRED
  sub-modes with the 10x10 above/left probability lattice) and
  chroma modes.
- **Residual tokens** (RFC 13): the coefficient token tree with
  zero-runs, the six large-value categories with their extra-bit
  probabilities, sign bits, per-position band mapping, and the
  above/left non-zero context tracking (including the skipped-MB Y2
  context rule).
- **Reconstruction** (RFC 12/14): dequantization (per-segment
  indices, Y2 scaling with the x2 / x155/100 rules and clamps), the
  exact integer inverse WHT and DCT (20091/35468 multipliers),
  16x16 / 8x8 whole-block intra prediction (DC/V/H/TM with the
  127/129 frame-border conventions) and all ten 4x4 B_PRED modes
  with the above-right propagation quirks.
- **Loop filter** (RFC 15): both the normal (2/4/6-tap with
  high-edge-variance selection and interior limits) and simple
  filters, per-segment/delta levels, the inner-edge skip rule, and
  the normative macroblock filtering order.

Large constant tables (coefficient probabilities, their update
probabilities, key-frame B-mode probabilities, dequantization
lookups) are spec data reproduced in extract/vp8_tables.py and
cross-checked against a third-party codec's copies.

Verification: the system libwebp encodes AND decodes lossy WebP, and
``WebPDecodeYUV`` exposes the raw reconstructed planes — so
tests/test_vp8.py compares OUR Y/U/V planes BIT-EXACTLY against
libwebp's across a battery spanning quality levels (segmentation on
and off), filter strengths (normal/simple, sharpness), multiple
token partitions, B_PRED-heavy and flat content, and the real
third-party python.webp fixture.  Lossy decode is deterministic, so
exact plane equality is the strongest possible oracle.

Scale note: per-coefficient boolean decoding is a Python loop (same
bound as the other entropy decoders); prediction/IDCT/loop-filter
inner ops are plain integer math per pixel.  Fine for the
mapInPandas batch shapes; the honest 100 TB statement stays "swap a
codec library at this exact seam".
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QUANT,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QUANT,
    KF_BMODE_PROBS,
)

# RFC 13.3: coefficient position -> probability band
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
# RFC 13.3 zigzag
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# large-value categories 3-6: extra-bit probabilities (RFC 13.2)
_CAT3456 = (
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)

# key-frame mode trees (RFC 11.2): (tree, probs)
# Y modes: 0=DC 1=V 2=H 3=TM 4=B_PRED
_KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)
_KF_YMODE_PROBS = (145, 156, 163, 128)
# chroma modes: 0=DC 1=V 2=H 3=TM
_UV_TREE = (-0, 2, -1, 4, -2, -3)
_KF_UV_PROBS = (142, 114, 183)
# 4x4 sub-modes (RFC order): 0=DC 1=TM 2=VE 3=HE 4=LD 5=RD 6=VR 7=VL
# 8=HD 9=HU.  The third-party table copy indexes rows by a permuted
# enum (RD/VR/LD swapped); remap to RFC order once at import.
_LIB_ENUM = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)  # RFC mode -> table row id
KF_BMODE = [0] * 900
for _a in range(10):
    for _l in range(10):
        _src = (_LIB_ENUM[_a] * 10 + _LIB_ENUM[_l]) * 9
        _dst = (_a * 10 + _l) * 9
        KF_BMODE[_dst : _dst + 9] = KF_BMODE_PROBS[_src : _src + 9]
KF_BMODE = tuple(KF_BMODE)

_BMODE_TREE = (
    -0, 2,
    -1, 4,
    -2, 6,
    8, 12,
    -3, 10,
    -5, -6,
    -4, 14,
    -7, 16,
    -8, -9,
)


class _Bool:
    """RFC 7 boolean decoder (reads zero bytes past segment end)."""

    __slots__ = ("data", "n", "pos", "value", "range", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        b0 = data[0] if self.n > 0 else 0
        b1 = data[1] if self.n > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bits = 0

    def get(self, prob: int) -> int:
        rng = self.range
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        value = self.value
        if value >= big:
            bit = 1
            rng -= split
            value -= big
        else:
            bit = 0
            rng = split
        bits = self.bits
        while rng < 128:
            value <<= 1
            rng <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                if self.pos < self.n:
                    value |= self.data[self.pos]
                self.pos += 1
        self.value = value
        self.range = rng
        self.bits = bits
        return bit

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.get(128) else v

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(v: int) -> int:
    return 0 if v < 0 else (127 if v > 127 else v)


def _build_dequant(qi, y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d):
    """RFC 14.1 per-segment dequantization factors."""
    y1 = (DC_QUANT[_clamp_q(qi + y_dc_d)], AC_QUANT[_clamp_q(qi)])
    y2dc = DC_QUANT[_clamp_q(qi + y2_dc_d)] * 2
    y2ac = AC_QUANT[_clamp_q(qi + y2_ac_d)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QUANT[_clamp_q(qi + uv_dc_d)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QUANT[_clamp_q(qi + uv_ac_d)]
    return y1, (y2dc, y2ac), (uvdc, uvac)


def _get_large_value(bd: _Bool, p) -> int:
    """RFC 13.2 token categories beyond DCT_4."""
    if not bd.get(p[3]):
        if not bd.get(p[4]):
            v = 2
        else:
            v = 3 + bd.get(p[5])
    else:
        if not bd.get(p[6]):
            if not bd.get(p[7]):
                v = 5 + bd.get(159)
            else:
                v = 7 + 2 * bd.get(165)
                v += bd.get(145)
        else:
            bit1 = bd.get(p[8])
            bit0 = bd.get(p[9 + bit1])
            cat = 2 * bit1 + bit0
            v = 0
            for prob in _CAT3456[cat]:
                v += v + bd.get(prob)
            v += 3 + (8 << cat)
    return v


def _get_coeffs(bd: _Bool, probs, ctx: int, dq, first: int, out) -> int:
    """Decode one 4x4 block's tokens (RFC 13.3) into ``out`` (natural
    order, dequantized).  ``probs``: [band][ctx][11] for this block
    type; returns the number of decoded positions (nz hint)."""
    n = first
    p = probs[_BANDS[n]][ctx]
    while n < 16:
        if not bd.get(p[0]):
            return n  # end of block
        while not bd.get(p[1]):  # zero coefficient
            n += 1
            if n == 16:
                return 16
            p = probs[_BANDS[n]][0]
        if not bd.get(p[2]):
            v = 1
            nctx = 1
        else:
            v = _get_large_value(bd, p)
            nctx = 2
        if bd.get(128):
            v = -v
        out[_ZIGZAG[n]] = v * dq[1 if n > 0 else 0]
        n += 1
        if n == 16:
            return 16
        p = probs[_BANDS[n]][nctx]
    return 16


# ---------------------------------------------------------------------------
# inverse transforms (RFC 14.3 / 14.4) — exact integer
# ---------------------------------------------------------------------------


def _iwht4x4(block):
    out = [0] * 16
    tmp = [0] * 16
    for i in range(4):
        a1 = block[0 + i] + block[12 + i]
        b1 = block[4 + i] + block[8 + i]
        c1 = block[4 + i] - block[8 + i]
        d1 = block[0 + i] - block[12 + i]
        tmp[0 + i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        base = i * 4
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        a2 = a1 + b1 + 3
        b2 = c1 + d1
        c2 = a1 - b1
        d2 = d1 - c1
        out[base] = (a2) >> 3
        out[base + 1] = (b2 + 3) >> 3
        out[base + 2] = (c2 + 3) >> 3
        out[base + 3] = (d2 + 3) >> 3
    return out


def _mul1(a):  # (a * 20091) >> 16, then + a  == a * cospi8sqrt2 (RFC)
    return ((a * 20091) >> 16) + a


def _mul2(a):  # (a * 35468) >> 16
    return (a * 35468) >> 16


def _idct4x4_add(block, plane, y0, x0):
    """Inverse DCT + add to prediction in ``plane`` (RFC 14.4)."""
    tmp = [0] * 16
    for i in range(4):
        a = block[i] + block[8 + i]
        b = block[i] - block[8 + i]
        c = _mul2(block[4 + i]) - _mul1(block[12 + i])
        d = _mul1(block[4 + i]) + _mul2(block[12 + i])
        tmp[i] = a + d
        tmp[12 + i] = a - d
        tmp[4 + i] = b + c
        tmp[8 + i] = b - c
    for i in range(4):
        base = 4 * i
        dc = tmp[base] + 4
        a = dc + tmp[base + 2]
        b = dc - tmp[base + 2]
        c = _mul2(tmp[base + 1]) - _mul1(tmp[base + 3])
        d = _mul1(tmp[base + 1]) + _mul2(tmp[base + 3])
        row = plane[y0 + i]
        for j, v in ((0, a + d), (1, b + c), (2, b - c), (3, a - d)):
            px = row[x0 + j] + (v >> 3)
            row[x0 + j] = 0 if px < 0 else (255 if px > 255 else px)


# ---------------------------------------------------------------------------
# intra prediction (RFC 12) over bordered planes
# ---------------------------------------------------------------------------
# planes are lists of lists with a one-pixel border: row 0 = above
# (127), column 0 = left (129); plane[y+1][x+1] is pixel (y, x).


def _pred_whole(plane, y0, x0, size, mode, have_above, have_left):
    """DC/V/H/TM prediction for a size x size block at (y0, x0)."""
    a_row = plane[y0]  # above row (border-adjusted indices)
    if mode == 0:  # DC
        total = 0
        n = 0
        if have_above:
            total += sum(a_row[x0 + 1 : x0 + 1 + size])
            n += size
        if have_left:
            total += sum(plane[y0 + 1 + k][x0] for k in range(size))
            n += size
        dc = (total + (n >> 1)) // n if n else 128
        for k in range(size):
            plane[y0 + 1 + k][x0 + 1 : x0 + 1 + size] = [dc] * size
    elif mode == 1:  # V
        src = a_row[x0 + 1 : x0 + 1 + size]
        for k in range(size):
            plane[y0 + 1 + k][x0 + 1 : x0 + 1 + size] = list(src)
    elif mode == 2:  # H
        for k in range(size):
            plane[y0 + 1 + k][x0 + 1 : x0 + 1 + size] = [
                plane[y0 + 1 + k][x0]
            ] * size
    else:  # TM
        tl = plane[y0][x0]
        for k in range(size):
            left = plane[y0 + 1 + k][x0]
            row = plane[y0 + 1 + k]
            for j in range(size):
                v = left + a_row[x0 + 1 + j] - tl
                row[x0 + 1 + j] = 0 if v < 0 else (255 if v > 255 else v)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(plane, y0, x0, mode, above_right):
    """All ten 4x4 sub-block modes (RFC 12.3).  (y0, x0) are border
    coordinates of the block's top-left pixel; ``above_right`` is the
    4-pixel AR row for this block."""
    A = plane[y0][x0 + 1 : x0 + 5] + list(above_right)  # a0..a7
    L = [plane[y0 + 1 + k][x0] for k in range(4)]
    tl = plane[y0][x0]
    out = [[0] * 4 for _ in range(4)]
    if mode == 0:  # B_DC_PRED
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        for r in range(4):
            out[r] = [dc] * 4
    elif mode == 1:  # B_TM_PRED
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - tl
                out[r][c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == 2:  # B_VE_PRED
        row = [
            _avg3(tl, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        for r in range(4):
            out[r] = list(row)
    elif mode == 3:  # B_HE_PRED
        col = [
            _avg3(tl, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        for r in range(4):
            out[r] = [col[r]] * 4
    elif mode == 4:  # B_LD_PRED
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r][c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    out[r][c] = _avg3(A[6], A[7], A[7])
    elif mode == 5:  # B_RD_PRED
        e = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                out[r][c] = _avg3(e[c - r + 3], e[c - r + 4], e[c - r + 5])
    elif mode == 6:  # B_VR_PRED
        out[0] = [
            _avg2(tl, A[0]), _avg2(A[0], A[1]),
            _avg2(A[1], A[2]), _avg2(A[2], A[3]),
        ]
        out[1] = [
            _avg3(L[0], tl, A[0]), _avg3(tl, A[0], A[1]),
            _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3]),
        ]
        out[2] = [_avg3(L[1], L[0], tl)] + out[0][:3]
        out[3] = [_avg3(L[2], L[1], L[0])] + out[1][:3]
    elif mode == 7:  # B_VL_PRED
        out[0] = [
            _avg2(A[0], A[1]), _avg2(A[1], A[2]),
            _avg2(A[2], A[3]), _avg2(A[3], A[4]),
        ]
        out[1] = [
            _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]), _avg3(A[3], A[4], A[5]),
        ]
        out[2] = out[0][1:] + [_avg3(A[4], A[5], A[6])]
        out[3] = out[1][1:] + [_avg3(A[5], A[6], A[7])]
    elif mode == 8:  # B_HD_PRED
        pp = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2]]
        out[3][0] = _avg2(pp[0], pp[1])
        out[3][1] = _avg3(pp[0], pp[1], pp[2])
        out[2][0] = out[3][2] = _avg2(pp[1], pp[2])
        out[2][1] = out[3][3] = _avg3(pp[1], pp[2], pp[3])
        out[1][0] = out[2][2] = _avg2(pp[2], pp[3])
        out[1][1] = out[2][3] = _avg3(pp[2], pp[3], pp[4])
        out[0][0] = out[1][2] = _avg2(pp[3], pp[4])
        out[0][1] = out[1][3] = _avg3(pp[3], pp[4], pp[5])
        out[0][2] = _avg3(pp[4], pp[5], pp[6])
        out[0][3] = _avg3(pp[5], pp[6], pp[7])
    else:  # B_HU_PRED
        out[0][0] = _avg2(L[0], L[1])
        out[0][1] = _avg3(L[0], L[1], L[2])
        out[0][2] = out[1][0] = _avg2(L[1], L[2])
        out[0][3] = out[1][1] = _avg3(L[1], L[2], L[3])
        out[1][2] = out[2][0] = _avg2(L[2], L[3])
        out[1][3] = out[2][1] = _avg3(L[2], L[3], L[3])
        out[2][2] = out[2][3] = L[3]
        out[3] = [L[3]] * 4
    for r in range(4):
        plane[y0 + 1 + r][x0 + 1 : x0 + 5] = out[r]


# ---------------------------------------------------------------------------
# loop filter (RFC 15) — exact integer, normative order
# ---------------------------------------------------------------------------


def _c_s8(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def _c_u8(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _common_adjust(use_outer, px, pos, step, do_p1q1=False):
    """filter2/filter4 core (RFC 15.2) on pixels around an edge at
    ``pos`` with stride ``step`` (p1 = pos-2*step ... q1 = pos+step).
    Returns the unshifted adjustment ``a`` for the !hev p1/q1 pass."""
    p1 = px[pos - 2 * step]
    p0 = px[pos - step]
    q0 = px[pos]
    q1 = px[pos + step]
    a = _c_s8((_c_s8(p1 - q1 - 256 * 0) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c_s8(a + 4) >> 3
    f2 = _c_s8(a + 3) >> 3
    px[pos] = _c_u8(q0 - f1)
    px[pos - step] = _c_u8(p0 + f2)
    return f1


def _hev(px, pos, step, thresh):
    return (
        abs(px[pos - 2 * step] - px[pos - step]) > thresh
        or abs(px[pos + step] - px[pos]) > thresh
    )


def _filter_yes(px, pos, step, e_limit, i_limit):
    p3 = px[pos - 4 * step]
    p2 = px[pos - 3 * step]
    p1 = px[pos - 2 * step]
    p0 = px[pos - step]
    q0 = px[pos]
    q1 = px[pos + step]
    q2 = px[pos + 2 * step]
    q3 = px[pos + 3 * step]
    return (
        abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= e_limit
        and abs(p3 - p2) <= i_limit
        and abs(p2 - p1) <= i_limit
        and abs(p1 - p0) <= i_limit
        and abs(q1 - q0) <= i_limit
        and abs(q2 - q1) <= i_limit
        and abs(q3 - q2) <= i_limit
    )


def _subblock_filter(px, pos, step, hev_t, i_limit, e_limit):
    if not _filter_yes(px, pos, step, e_limit, i_limit):
        return
    hv = _hev(px, pos, step, hev_t)
    a = _common_adjust(hv, px, pos, step)
    if not hv:
        a = (a + 1) >> 1
        px[pos + step] = _c_u8(px[pos + step] - a)
        px[pos - 2 * step] = _c_u8(px[pos - 2 * step] + a)


def _mbedge_filter(px, pos, step, hev_t, i_limit, e_limit):
    if not _filter_yes(px, pos, step, e_limit, i_limit):
        return
    if _hev(px, pos, step, hev_t):
        _common_adjust(True, px, pos, step)
        return
    p2 = px[pos - 3 * step]
    p1 = px[pos - 2 * step]
    p0 = px[pos - step]
    q0 = px[pos]
    q1 = px[pos + step]
    q2 = px[pos + 2 * step]
    w = _c_s8(_c_s8(p1 - q1) + 3 * (q0 - p0))
    a = _c_s8((27 * w + 63) >> 7)
    px[pos] = _c_u8(q0 - a)
    px[pos - step] = _c_u8(p0 + a)
    a = _c_s8((18 * w + 63) >> 7)
    px[pos + step] = _c_u8(q1 - a)
    px[pos - 2 * step] = _c_u8(p1 + a)
    a = _c_s8((9 * w + 63) >> 7)
    px[pos + 2 * step] = _c_u8(q2 - a)
    px[pos - 3 * step] = _c_u8(p2 + a)


def _simple_filter(px, pos, step, e_limit):
    p1 = px[pos - 2 * step]
    p0 = px[pos - step]
    q0 = px[pos]
    q1 = px[pos + step]
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= e_limit:
        _common_adjust(True, px, pos, step)


# ---------------------------------------------------------------------------
# frame decode
# ---------------------------------------------------------------------------

# implied 4x4 sub-mode of a whole-MB Y mode, for B_PRED context
_IMPLIED_B = {0: 0, 1: 2, 2: 3, 3: 1}


def decode_vp8(data: bytes):
    """VP8 key-frame codestream -> (Y, U, V) uint8 planes (the raw
    reconstruction, bit-comparable with a third-party decoder)."""
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError("VP8 inter frame (not a still image)")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("VP8 frame with zero dimension")
    from .imaging import check_pixel_budget

    check_pixel_budget(w, h)
    if 10 + part1_size > len(data):
        raise ValueError("truncated VP8 first partition")
    bd = _Bool(data[10 : 10 + part1_size])

    bd.get(128)  # color space
    bd.get(128)  # clamping type

    # segmentation (RFC 9.3)
    seg_enabled = bd.get(128)
    update_map = 0
    seg_abs = 0
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            seg_abs = bd.get(128)
            for i in range(4):
                if bd.get(128):
                    seg_quant[i] = bd.signed(7)
            for i in range(4):
                if bd.get(128):
                    seg_lf[i] = bd.signed(6)
        if update_map:
            for i in range(3):
                if bd.get(128):
                    seg_tree_probs[i] = bd.literal(8)

    # loop filter (RFC 9.4)
    simple_filter = bd.get(128)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.get(128)
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.get(128):  # deltas updated this frame
            for i in range(4):
                if bd.get(128):
                    ref_deltas[i] = bd.signed(6)
            for i in range(4):
                if bd.get(128):
                    mode_deltas[i] = bd.signed(6)

    n_parts = 1 << bd.literal(2)

    # quantizers (RFC 9.6)
    y_ac_qi = bd.literal(7)
    y_dc_d = bd.signed(4) if bd.get(128) else 0
    y2_dc_d = bd.signed(4) if bd.get(128) else 0
    y2_ac_d = bd.signed(4) if bd.get(128) else 0
    uv_dc_d = bd.signed(4) if bd.get(128) else 0
    uv_ac_d = bd.signed(4) if bd.get(128) else 0

    bd.get(128)  # refresh entropy probs (key frame)

    # coefficient probability updates (RFC 13.4)
    probs = [
        [
            [list(COEFF_PROBS[((t * 8 + b) * 3 + c) * 11 : ((t * 8 + b) * 3 + c) * 11 + 11])
             for c in range(3)]
            for b in range(8)
        ]
        for t in range(4)
    ]
    k = 0
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get(COEFF_UPDATE_PROBS[k]):
                        probs[t][b][c][p] = bd.literal(8)
                    k += 1

    use_skip = bd.get(128)
    skip_prob = bd.literal(8) if use_skip else 0

    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4

    # per-MB mode parse (still partition 1)
    mbs = []
    above_b = [[0, 0, 0, 0] for _ in range(mb_w)]  # sub-modes for ctx
    for mb_y in range(mb_h):
        left_b = [0, 0, 0, 0]
        row = []
        for mb_x in range(mb_w):
            seg = 0
            if seg_enabled and update_map:
                if bd.get(seg_tree_probs[0]) == 0:
                    seg = bd.get(seg_tree_probs[1])
                else:
                    seg = 2 + bd.get(seg_tree_probs[2])
            skip = bd.get(skip_prob) if use_skip else 0
            ymode = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            bmodes = [0] * 16
            if ymode == 4:  # B_PRED: 16 contextual sub-modes
                for by in range(4):
                    for bx in range(4):
                        a = above_b[mb_x][bx] if by == 0 else bmodes[(by - 1) * 4 + bx]
                        l = left_b[by] if bx == 0 else bmodes[by * 4 + bx - 1]
                        base = (a * 10 + l) * 9
                        bmodes[by * 4 + bx] = bd.tree(
                            _BMODE_TREE, KF_BMODE[base : base + 9]
                        )
                above_b[mb_x] = bmodes[12:16]
                left_b = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                imp = _IMPLIED_B[ymode]
                above_b[mb_x] = [imp] * 4
                left_b = [imp] * 4
            uvmode = bd.tree(_UV_TREE, _KF_UV_PROBS)
            row.append([seg, skip, ymode, bmodes, uvmode])
        mbs.append(row)

    # token partitions
    base = 10 + part1_size
    sizes = []
    for i in range(n_parts - 1):
        off = base + 3 * i
        if off + 3 > len(data):
            raise ValueError("truncated VP8 partition table")
        sizes.append(data[off] | (data[off + 1] << 8) | (data[off + 2] << 16))
    pstart = base + 3 * (n_parts - 1)
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            parts.append(_Bool(data[pstart : pstart + sizes[i]]))
            pstart += sizes[i]
        else:
            parts.append(_Bool(data[pstart:]))

    # dequantization factors per segment
    def seg_qi(seg):
        if not seg_enabled:
            return y_ac_qi
        return _clamp_q(seg_quant[seg] if seg_abs else y_ac_qi + seg_quant[seg])

    dq = [
        _build_dequant(seg_qi(s), y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d)
        for s in range(4)
    ]

    # bordered reconstruction planes (lists of lists of int)
    W, H = mb_w * 16, mb_h * 16
    Wc, Hc = mb_w * 8, mb_h * 8
    yp = [[127] * (W + 5)] + [[129] + [0] * (W + 4) for _ in range(H)]
    up = [[127] * (Wc + 1)] + [[129] + [0] * Wc for _ in range(Hc)]
    vp = [[127] * (Wc + 1)] + [[129] + [0] * Wc for _ in range(Hc)]

    # nz context trackers: per-MB [y0..y3, u0,u1, v0,v1] + y2
    top_nz = [[0] * 8 for _ in range(mb_w)]
    top_nz_y2 = [0] * mb_w
    f_info = [[None] * mb_w for _ in range(mb_h)]

    for mb_y in range(mb_h):
        bd_t = parts[mb_y % n_parts]
        left_nz = [0] * 8
        left_nz_y2 = 0
        # right-edge above-right extension for this MB row (B_PRED)
        if mb_y > 0:
            r = yp[mb_y * 16]
            r.extend([0] * 0)
            pad = r[W]
            for k in range(4):
                r[W + 1 + k] = pad
        for mb_x in range(mb_w):
            seg, skip, ymode, bmodes, uvmode = mbs[mb_y][mb_x]
            y1q, y2q, uvq = dq[seg]
            coeffs = [[0] * 16 for _ in range(25)]  # 16 Y + 8 UV + Y2
            has_coeffs = False
            if not skip:
                first = 0
                if ymode != 4:  # Y2 block present
                    ctx = top_nz_y2[mb_x] + left_nz_y2
                    n = _get_coeffs(
                        bd_t, probs[1], ctx, y2q, 0, coeffs[24]
                    )
                    top_nz_y2[mb_x] = left_nz_y2 = 1 if n > 0 else 0
                    if n > 0:
                        has_coeffs = True
                    first = 1
                for by in range(4):
                    for bx in range(4):
                        ctx = top_nz[mb_x][bx] + left_nz[by]
                        n = _get_coeffs(
                            bd_t, probs[3 if ymode == 4 else 0], ctx,
                            y1q, first, coeffs[by * 4 + bx],
                        )
                        nz = 1 if n > first else 0
                        top_nz[mb_x][bx] = left_nz[by] = nz
                        has_coeffs = has_coeffs or nz
                for ch in range(2):  # U then V
                    for by in range(2):
                        for bx in range(2):
                            i = 4 + ch * 2 + bx
                            j = 4 + ch * 2 + by
                            ctx = top_nz[mb_x][i] + left_nz[j]
                            n = _get_coeffs(
                                bd_t, probs[2], ctx, uvq, 0,
                                coeffs[16 + ch * 4 + by * 2 + bx],
                            )
                            nz = 1 if n > 0 else 0
                            top_nz[mb_x][i] = left_nz[j] = nz
                            has_coeffs = has_coeffs or nz
            else:
                left_nz = [0] * 8
                top_nz[mb_x] = [0] * 8
                if ymode != 4:
                    top_nz_y2[mb_x] = left_nz_y2 = 0

            # reconstruction
            y0, x0 = mb_y * 16, mb_x * 16
            have_above = mb_y > 0
            have_left = mb_x > 0
            if ymode != 4:
                if coeffs[24] != [0] * 16:
                    wht = _iwht4x4(coeffs[24])
                    for i in range(16):
                        coeffs[i][0] = wht[i]
                _pred_whole(yp, y0, x0, 16, ymode, have_above, have_left)
                for by in range(4):
                    for bx in range(4):
                        blk = coeffs[by * 4 + bx]
                        if blk != [0] * 16:
                            _idct4x4_add(
                                blk, yp, y0 + 1 + by * 4, x0 + 1 + bx * 4
                            )
            else:
                for by in range(4):
                    for bx in range(4):
                        yb = y0 + by * 4
                        xb = x0 + bx * 4
                        if bx == 3 and by > 0:
                            # right-column quirk: reuse the MB's saved
                            # above-right (the above MB row / border)
                            ar = yp[y0][x0 + 17 : x0 + 21]
                        else:
                            ar = yp[yb][xb + 5 : xb + 9]
                        _pred_b(yp, yb, xb, bmodes[by * 4 + bx], ar)
                        blk = coeffs[by * 4 + bx]
                        if blk != [0] * 16:
                            _idct4x4_add(blk, yp, yb + 1, xb + 1)
            yc, xc = mb_y * 8, mb_x * 8
            for ch, plane in ((0, up), (1, vp)):
                _pred_whole(plane, yc, xc, 8, uvmode, have_above, have_left)
                for by in range(2):
                    for bx in range(2):
                        blk = coeffs[16 + ch * 4 + by * 2 + bx]
                        if blk != [0] * 16:
                            _idct4x4_add(
                                blk, plane, yc + 1 + by * 4, xc + 1 + bx * 4
                            )

            # loop-filter parameters for this MB
            if seg_enabled:
                level = seg_lf[seg] if seg_abs else filter_level + seg_lf[seg]
            else:
                level = filter_level
            level = 0 if level < 0 else (63 if level > 63 else level)
            if lf_delta_enabled:
                level += ref_deltas[0]  # intra frame
                if ymode == 4:
                    level += mode_deltas[0]
                level = 0 if level < 0 else (63 if level > 63 else level)
            f_info[mb_y][mb_x] = (level, has_coeffs or ymode == 4)

    # strip borders
    def flat(plane, height, width):
        out = []
        for yy in range(height):
            out.append(plane[yy + 1][1 : 1 + width])
        return out

    yf = flat(yp, H, W)
    uf = flat(up, Hc, Wc)
    vf = flat(vp, Hc, Wc)

    if filter_level > 0 or seg_enabled or lf_delta_enabled:
        _loop_filter(
            yf, uf, vf, f_info, mb_w, mb_h, simple_filter, sharpness
        )

    y_out = np.array(yf, dtype=np.uint8)[:h, :w]
    u_out = np.array(uf, dtype=np.uint8)[: (h + 1) // 2, : (w + 1) // 2]
    v_out = np.array(vf, dtype=np.uint8)[: (h + 1) // 2, : (w + 1) // 2]
    return y_out, u_out, v_out


def _loop_filter(yf, uf, vf, f_info, mb_w, mb_h, simple, sharpness):
    """RFC 15.1 normative per-MB filtering (flattened planes)."""
    W = mb_w * 16
    Wc = mb_w * 8
    y = [v for row in yf for v in row]
    u = [v for row in uf for v in row]
    v = [v for row in vf for v in row]
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            level, inner = f_info[mb_y][mb_x]
            if level == 0:
                continue
            interior = level
            if sharpness > 0:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_e = (level + 2) * 2 + interior
            sub_e = level * 2 + interior
            y0, x0 = mb_y * 16, mb_x * 16
            yc, xc = mb_y * 8, mb_x * 8
            if simple:
                if mb_x > 0:
                    for r in range(16):
                        _simple_filter(y, (y0 + r) * W + x0, 1, mb_e)
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(y, (y0 + r) * W + x0 + dx, 1, sub_e)
                if mb_y > 0:
                    for c in range(16):
                        _simple_filter(y, y0 * W + x0 + c, W, mb_e)
                if inner:
                    for dy in (4, 8, 12):
                        for c in range(16):
                            _simple_filter(
                                y, (y0 + dy) * W + x0 + c, W, sub_e
                            )
                continue
            if mb_x > 0:
                for r in range(16):
                    _mbedge_filter(y, (y0 + r) * W + x0, 1, hev_t, interior, mb_e)
                for r in range(8):
                    _mbedge_filter(u, (yc + r) * Wc + xc, 1, hev_t, interior, mb_e)
                    _mbedge_filter(v, (yc + r) * Wc + xc, 1, hev_t, interior, mb_e)
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _subblock_filter(
                            y, (y0 + r) * W + x0 + dx, 1, hev_t, interior, sub_e
                        )
                for r in range(8):
                    _subblock_filter(u, (yc + r) * Wc + xc + 4, 1, hev_t, interior, sub_e)
                    _subblock_filter(v, (yc + r) * Wc + xc + 4, 1, hev_t, interior, sub_e)
            if mb_y > 0:
                for c in range(16):
                    _mbedge_filter(y, y0 * W + x0 + c, W, hev_t, interior, mb_e)
                for c in range(8):
                    _mbedge_filter(u, yc * Wc + xc + c, Wc, hev_t, interior, mb_e)
                    _mbedge_filter(v, yc * Wc + xc + c, Wc, hev_t, interior, mb_e)
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        _subblock_filter(
                            y, (y0 + dy) * W + x0 + c, W, hev_t, interior, sub_e
                        )
                for c in range(8):
                    _subblock_filter(u, (yc + 4) * Wc + xc + c, Wc, hev_t, interior, sub_e)
                    _subblock_filter(v, (yc + 4) * Wc + xc + c, Wc, hev_t, interior, sub_e)
    for r in range(len(yf)):
        yf[r] = y[r * W : (r + 1) * W]
    for r in range(len(uf)):
        uf[r] = u[r * Wc : (r + 1) * Wc]
        vf[r] = v[r * Wc : (r + 1) * Wc]
