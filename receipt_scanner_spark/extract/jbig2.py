"""JBIG2 decode (ITU-T T.88) for the PDF ``JBIG2Decode`` filter —
stdlib + numpy only (r4).

JBIG2 is the bilevel codec scanned-document PDFs actually use (it is
what Acrobat and jbig2enc emit for text scans); until r4 it was the
last typed-error image codec the reference's OCR fan-out could meet
in the wild besides JPEG 2000.  This module implements the embedded
(PDF) organization of the spec:

- **MQ arithmetic decoder** (T.88 Annex E — the 47-state table E.1
  shared with JPEG 2000): ``_MQDecoder`` with the spec INITDEC /
  DECODE / BYTEIN procedures, 0xFF>0x8F marker convention, and
  per-context adaptive states with conditional MPS/LPS exchange.
- **Arithmetic integer decoding** (Annex A): the IAx prefix-tree
  procedure over a 512-entry context (``_decode_int``), OOB as None,
  and the IAID fixed-length variant (``_decode_iaid``).
- **Generic region decoding** (§6.2): templates 0-3 with adaptive
  (AT) pixels at the spec bit positions, TPGDON typical-prediction
  rows via the per-template pseudo-pixel contexts (0x9B25 / 0x0795 /
  0x00E5 / 0x0195), and the MMR=1 variant delegated to the existing
  T.6 decoder (extract/ccitt.py).  The two rows above the current
  pixel are composed vectorized per row (they are already decoded);
  only the strictly-causal current-row bits fold in per pixel.
- **Symbol dictionary** (§6.5) and **text region** (§6.4) segments:
  height classes via IADH/IADW, exported-flag runs via IAEX, strip
  placement via IADT/IAFS/IADS/IAIT with REFCORNER and TRANSPOSED
  handling, and OR/AND/XOR/XNOR composition.
- **Generic refinement** (§6.3, r5): templates 0/1 with AT pixels and
  TPGRON typical prediction (reference-centre pseudo-contexts 0x0100 /
  0x0080), vectorized reference context halves; wired into SBREFINE
  text-region instances (6.4.11 with the floor(delta/2) offset bias),
  SDREFAGG aggregate dictionaries (6.5.8.2 — single-instance AND
  multi-instance text-region aggregation with Table-17 context
  retention), refinement region segments (42/43) refining the page
  content composed so far (decode deferred to assembly order), and
  intermediate regions (4/36/20/40) stored as refinement inputs
  (8.2) instead of composing.
- **Huffman-coded regions** (Annex B, r5): canonical table machinery
  (B.3 code assignment, MSB-first reader), custom table segments
  (§7.4.13), runcode symbol-ID tables (§7.4.4.5), SDHUFF symbol
  dictionaries with per-height-class collective bitmaps (6.5.9,
  uncompressed or MMR) and SBHUFF text regions.  The standard-table
  transcriptions are pinned by two structural invariants (contiguous
  range tiling + Kraft-complete prefix codes); B.7 and B.10 failed
  them with no codec on this host to arbitrate, so selecting those
  two is a typed error rather than a guess.  SBHUFF+SBREFINE text
  regions (6.4.11: raw RI bit, B.14/B.15 deltas, byte-aligned
  per-instance MQ refinement streams) and SDHUFF+SDREFAGG
  dictionaries (6.5.8.2: raw-bit symbol codes, B.15 offsets, B.1
  BMSIZE; multi-instance via the Table-17 standard selections)
  decode as of the r5 continuation.
- **Halftone regions** (§6.6/6.7, r5): pattern dictionaries, C.5
  gray-coded bitplanes through one shared context, sheared-grid
  rendering; this session adds HENABLESKIP skip bitmaps (§6.2.5.7 —
  out-of-region grid cells are never coded) and multi-plane MMR
  grayscale (all bitplanes in ONE T.6 stream, per-plane EOFB,
  mid-bit continuation — ccitt.decode_t6_planes, the pdf.js/jbig2dec
  reading of §6.6.5.1).
- **Segment layer** (§7): embedded-organization segment headers
  (long referred-to form, 1/2/4-byte referred numbers, page
  association sizes), page info with default pixel, region info with
  external combination, end-of-{stripe,page,file} no-ops; standalone
  .jb2 files in BOTH D.2 organizations (sequential and
  random-access — all headers first, then all data parts in order).

Entry point ``decode_jbig2_embedded(data, globals_data)`` mirrors the
PDF filter contract (PDF 32000 §7.4.7): the optional /JBIG2Globals
stream's segments (symbol dictionaries shared across pages) parse
first, then the per-image segments; the assembled page-1 bitmap
returns as (h, w) uint8 luma (JBIG2 1 = black -> luma 0).

Verification: no third-party JBIG2 codec exists in this container
(no jbig2dec/ghostscript/pdf.js), so the evidence tier matches what
extract/ccitt.py shipped with in r3 — an independent in-test MQ
*encoder* plus generic-region/symbol/text encoders
(tests/test_jbig2.py) drive full round-trips, the MQ coder and
context layouts are transcribed from the public spec with the
per-template constants pinned by tests, and the PDF plumbing is
covered end-to-end (JBIG2Decode XObject -> extract_pdf_image_arrays
-> OCR).  Swapping in a library oracle later is test-only work.

Scale note: generic-region decode costs one MQ decision per pixel in
Python (the above-row context halves are numpy-vectorized); that is
the same per-pixel bound as the CCITT path and fine for the
mapInPandas batch shapes — the honest 100 TB statement stays "swap a
codec library at this seam".
"""

from __future__ import annotations

import struct

import numpy as np

# T.88 Table E.1 (= JPEG 2000 Table C.2): Qe, NMPS, NLPS, SWITCH
_MQ_STATES = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)
_MQ_QE = tuple(s[0] for s in _MQ_STATES)
_MQ_NMPS = tuple(s[1] for s in _MQ_STATES)
_MQ_NLPS = tuple(s[2] for s in _MQ_STATES)
_MQ_SW = tuple(s[3] for s in _MQ_STATES)


class _MQDecoder:
    """T.88 Annex E arithmetic decoder.  Context state bytes are
    (MPS << 7) | state-index, held in caller-owned bytearrays."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct", "pad_feeds")

    # A well-formed stream's flush leaves at most a few final decisions
    # to resolve from the virtual 0xFF padding; corrupt streams that
    # synthesize unbounded output renormalize (and feed) constantly.
    # The cap turns those into a typed error instead of minutes of
    # garbage pixels.
    _MAX_PAD_FEEDS = 4096

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bp = 0
        self.pad_feeds = 0
        b0 = data[0] if self.n else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self):
        data, bp, n = self.data, self.bp, self.n
        cur = data[bp] if bp < n else 0xFF
        if cur == 0xFF:
            nxt = data[bp + 1] if bp + 1 < n else 0x90  # past end: marker
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
                self.pad_feeds += 1
                if self.pad_feeds > self._MAX_PAD_FEEDS:
                    raise ValueError("JBIG2 arithmetic data exhausted")
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            self.c += (data[bp + 1] if bp + 1 < n else 0xFF) << 8
            self.ct = 8

    def decode(self, cx: bytearray, i: int) -> int:
        sv = cx[i]
        idx = sv & 0x7F
        qe = _MQ_QE[idx]
        a = self.a - qe
        if (self.c >> 16) < qe:
            # LPS exchange path
            if a < qe:
                d = sv >> 7
                cx[i] = (sv & 0x80) | _MQ_NMPS[idx]
            else:
                d = (sv >> 7) ^ 1
                cx[i] = ((sv ^ (_MQ_SW[idx] << 7)) & 0x80) | _MQ_NLPS[idx]
            a = qe
        else:
            self.c -= qe << 16
            if a & 0x8000:
                self.a = a
                return sv >> 7
            if a < qe:
                d = (sv >> 7) ^ 1
                cx[i] = ((sv ^ (_MQ_SW[idx] << 7)) & 0x80) | _MQ_NLPS[idx]
            else:
                d = sv >> 7
                cx[i] = (sv & 0x80) | _MQ_NMPS[idx]
        # renormalize
        c, ct = self.c, self.ct
        while True:
            if ct == 0:
                self.c = c
                self._bytein()
                c, ct = self.c, self.ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct
        return d


# ---------------------------------------------------------------------------
# Annex A: arithmetic integer decoding (IAx / IAID)
# ---------------------------------------------------------------------------

_OOB = object()  # out-of-band marker (end of height-class / strip)


def _decode_int(dec: _MQDecoder, cx: bytearray):
    """T.88 A.2 IAx procedure: prefix-selected offset classes over a
    PREV-tree context of 512 states.  Returns int or _OOB."""
    prev = 1

    def bit():
        nonlocal prev
        d = dec.decode(cx, prev)
        prev = (prev << 1) | d if prev < 256 else (((prev << 1) | d) & 511) | 256
        return d

    s = bit()
    if not bit():
        n, off = 2, 0
    elif not bit():
        n, off = 4, 4
    elif not bit():
        n, off = 6, 20
    elif not bit():
        n, off = 8, 84
    elif not bit():
        n, off = 12, 340
    else:
        n, off = 32, 4436
    v = 0
    for _ in range(n):
        v = (v << 1) | bit()
    v += off
    if s:
        if v == 0:
            return _OOB  # A.2: negative zero is the OOB value
        return -v
    return v


def _decode_iaid(dec: _MQDecoder, cx: bytearray, code_len: int) -> int:
    """T.88 A.3 IAID: fixed-length symbol ID through a prefix tree."""
    prev = 1
    for _ in range(code_len):
        prev = (prev << 1) | dec.decode(cx, prev)
    return prev - (1 << code_len)


# ---------------------------------------------------------------------------
# §6.2: generic region decoding
# ---------------------------------------------------------------------------

# (dx, dy, context bit) per template, spec figures 4-7 / 8-11: fixed
# bit positions, AT pixels marked by index into the AT list
_TEMPLATES = {
    # template 0: 16-bit context, 4 AT pixels (nominal +3-1 -3-1 +2-2 -2-2)
    0: {
        "fixed": [
            (-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
            (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8), (-2, -1, 9),
            (1, -2, 12), (0, -2, 13), (-1, -2, 14),
        ],
        "at_bits": {0: 4, 1: 10, 2: 11, 3: 15},
        "bits": 16,
        "tpgdon": 0x9B25,
        "nominal_at": [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    },
    1: {
        "fixed": [
            (-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
            (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
            (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12),
        ],
        "at_bits": {0: 3},
        "bits": 13,
        "tpgdon": 0x0795,
        "nominal_at": [(3, -1)],
    },
    2: {
        "fixed": [
            (-1, 0, 0), (-2, 0, 1),
            (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
            (1, -2, 7), (0, -2, 8), (-1, -2, 9),
        ],
        "at_bits": {0: 2},
        "bits": 10,
        "tpgdon": 0x00E5,
        "nominal_at": [(2, -1)],
    },
    3: {
        "fixed": [
            (-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
            (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8), (-3, -1, 9),
        ],
        "at_bits": {0: 4},
        "bits": 10,
        "tpgdon": 0x0195,
        "nominal_at": [(2, -1)],
    },
}


def decode_generic(
    dec: _MQDecoder,
    cx: bytearray,
    w: int,
    h: int,
    template: int,
    at: list[tuple[int, int]],
    tpgdon: bool,
    skip: np.ndarray | None = None,
) -> np.ndarray:
    """Decode one generic region to an (h, w) uint8 0/1 bitmap.

    The contributions of rows y-1 / y-2 (already decoded) are built
    for the whole row with vectorized shifts; the current-row bits
    (strictly causal, including any AT pixel with dy == 0) fold in
    per pixel.  ``skip`` (§6.2.5.7, USESKIP): pixels where it is 1
    are not coded at all and decode as 0 (context formation sees the
    zeros naturally)."""
    if template not in _TEMPLATES:
        raise ValueError(f"bad generic template {template}")
    spec = _TEMPLATES[template]
    n_at = len(spec["at_bits"])
    if len(at) != n_at:
        raise ValueError("wrong AT pixel count")
    for dx, dy in at:
        if dy > 0 or (dy == 0 and dx >= 0):
            raise ValueError("non-causal AT pixel")

    bitmap = np.zeros((h, w), dtype=np.uint8)
    # split template pixels by source row offset
    above: list[tuple[int, int, int]] = list(spec["fixed"])
    row0: list[tuple[int, int]] = []  # (dx, bit) on the current row
    for ai, bit in spec["at_bits"].items():
        dx, dy = at[ai]
        if dy == 0:
            row0.append((dx, bit))
        else:
            above.append((dx, dy, bit))
    # current-row fixed pixels: move from `above` to row0
    above2 = []
    for dx, dy, bit in above:
        if dy == 0:
            row0.append((dx, bit))
        else:
            above2.append((dx, dy, bit))
    above = above2
    ltp = 0
    tp_cx = spec["tpgdon"]
    xs = np.arange(w)
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(cx, tp_cx)
            if ltp:
                bitmap[y] = bitmap[y - 1] if y else 0
                continue
        # vectorized above-row context part
        ctx_above = np.zeros(w, dtype=np.int32)
        for dx, dy, bit in above:
            yy = y + dy
            if yy < 0:
                continue
            src = bitmap[yy]
            idx = xs + dx
            valid = (idx >= 0) & (idx < w)
            vals = np.zeros(w, dtype=np.int32)
            vals[valid] = src[np.clip(idx, 0, w - 1)][valid]
            ctx_above |= vals << bit
        ca = ctx_above.tolist()
        row = bitmap[y]
        rl = row  # numpy row; per-pixel writes
        decode_one = dec.decode
        skip_row = skip[y] if skip is not None else None
        for x in range(w):
            if skip_row is not None and skip_row[x]:
                continue  # not coded; stays 0
            ctx = ca[x]
            for dx, bit in row0:
                xx = x + dx
                if xx >= 0 and rl[xx]:
                    ctx |= 1 << bit
            rl[x] = decode_one(cx, ctx)
    return bitmap


def _decode_generic_mmr(body: bytes, w: int, h: int) -> np.ndarray:
    """§6.2.6: MMR=1 generic region = T.6 coding (existing decoder);
    JBIG2 bitmaps are 1 = black."""
    from .ccitt import decode_ccitt

    luma = decode_ccitt(body, columns=w, rows=h, k=-1)
    return (luma == 0).astype(np.uint8)


def new_gb_stats(template: int) -> bytearray:
    return bytearray(1 << _TEMPLATES[template]["bits"])


# ---------------------------------------------------------------------------
# §6.3: generic refinement region decoding
# ---------------------------------------------------------------------------

# Context layouts (spec figures 12/13, LSB = nearest causal neighbour —
# the same bit convention as _TEMPLATES, whose TPGDON constants match
# the spec's published values under it).  Template 0 is 13 bits:
# bits 0-3 from the bitmap being decoded ((x-1,y), (x+1,y-1), (x,y-1),
# A1), bits 4-12 from the reference ((+1,+1),(0,+1),(-1,+1),(+1,0),
# (0,0),(-1,0),(+1,-1),(0,-1), A2 — offsets relative to the shifted
# reference pixel).  Template 1 is 10 bits with no AT pixels.  The
# TPGRON pseudo-pixel context is "reference centre set": 0x0100 / 0x0080.

_GR_BITS = {0: 13, 1: 10}
_GR_TPGRON_CTX = {0: 0x0100, 1: 0x0080}


def new_gr_stats(template: int) -> bytearray:
    return bytearray(1 << _GR_BITS[template])


def _shifted(ref: np.ndarray, h: int, w: int, ox: int, oy: int) -> np.ndarray:
    """(h, w) uint8 view of ``ref[y + oy, x + ox]`` with 0 outside."""
    out = np.zeros((h, w), np.uint8)
    rh, rw = ref.shape
    ys0, ys1 = max(0, -oy), min(h, rh - oy)
    xs0, xs1 = max(0, -ox), min(w, rw - ox)
    if ys0 < ys1 and xs0 < xs1:
        out[ys0:ys1, xs0:xs1] = ref[ys0 + oy : ys1 + oy, xs0 + ox : xs1 + ox]
    return out


def decode_refinement(
    dec: _MQDecoder,
    cx: bytearray,
    w: int,
    h: int,
    template: int,
    at: list[tuple[int, int]],
    tpgron: bool,
    ref: np.ndarray,
    rdx: int = 0,
    rdy: int = 0,
) -> np.ndarray:
    """§6.3.5: decode an (h, w) refinement of ``ref``; the reference
    pixel for (x, y) is ``ref[y - rdy, x - rdx]`` (GRREFERENCEDX/DY).

    The reference contributions are non-causal constants, so the
    reference half of every context is vectorized up front; only the
    causal current-bitmap bits fold in per pixel (same structure as
    decode_generic)."""
    if template not in _GR_BITS:
        raise ValueError(f"bad refinement template {template}")
    if template == 0:
        if len(at) != 2:
            raise ValueError("refinement template 0 needs 2 AT pixels")
        a1, a2 = at
        if a1[1] > 0 or (a1[1] == 0 and a1[0] >= 0):
            raise ValueError("non-causal refinement AT1 pixel")
    else:
        if at:
            raise ValueError("refinement template 1 takes no AT pixels")
        a1 = a2 = None

    # reference context half (constant for the whole decode)
    def rsh(ox, oy):
        return _shifted(ref, h, w, ox - rdx, oy - rdy).astype(np.int32)

    if template == 0:
        ctx_ref = (
            (rsh(1, 1) << 4) | (rsh(0, 1) << 5) | (rsh(-1, 1) << 6)
            | (rsh(1, 0) << 7) | (rsh(0, 0) << 8) | (rsh(-1, 0) << 9)
            | (rsh(1, -1) << 10) | (rsh(0, -1) << 11)
            | (rsh(a2[0], a2[1]) << 12)
        )
        coding = [(1, -1, 1), (0, -1, 2)]  # (dx, dy, bit) with dy < 0
        row0 = [(-1, 0)]  # (dx,) -> bit 0
        if a1[1] == 0:
            row0_extra = [(a1[0], 3)]
        else:
            coding.append((a1[0], a1[1], 3))
            row0_extra = []
    else:
        ctx_ref = (
            (rsh(1, 1) << 4) | (rsh(0, 1) << 5)
            | (rsh(1, 0) << 6) | (rsh(0, 0) << 7) | (rsh(-1, 0) << 8)
            | (rsh(0, -1) << 9)
        )
        coding = [(1, -1, 1), (0, -1, 2), (-1, -1, 3)]
        row0 = [(-1, 0)]
        row0_extra = []

    if tpgron:
        # §6.3.5.6: a pixel is "typical" when the 3x3 reference
        # neighbourhood is uniform; outside-reference pixels read 0
        nsum = np.zeros((h, w), np.int32)
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                nsum += rsh(ox, oy)
        typ0 = nsum == 0
        typ1 = nsum == 9
    centre = rsh(0, 0)

    bitmap = np.zeros((h, w), np.uint8)
    ltp = 0
    tp_cx = _GR_TPGRON_CTX[template]
    decode_one = dec.decode
    for y in range(h):
        if tpgron:
            ltp ^= decode_one(cx, tp_cx)
        ctx_row = ctx_ref[y].copy()
        for dx, dy, bit in coding:
            yy = y + dy
            if yy < 0:
                continue
            src = bitmap[yy]
            if dx >= 0:
                ctx_row[: w - dx if dx else w] |= (
                    src[dx:].astype(np.int32) << bit
                )
            else:
                ctx_row[-dx:] |= src[:dx].astype(np.int32) << bit
        ca = ctx_row.tolist()
        row = bitmap[y]
        if ltp:
            t0r, t1r, cr = typ0[y], typ1[y], centre[y]
        for x in range(w):
            if ltp and (t0r[x] or t1r[x]):
                row[x] = cr[x]
                continue
            ctx = ca[x]
            xx = x - 1
            if xx >= 0 and row[xx]:
                ctx |= 1
            for dx, bit in row0_extra:
                xa = x + dx
                if xa >= 0 and row[xa]:
                    ctx |= 1 << bit
            row[x] = decode_one(cx, ctx)
    return bitmap


# ---------------------------------------------------------------------------
# Annex B: Huffman tables (r5)
# ---------------------------------------------------------------------------


class _HuffReader:
    """MSB-first bit reader over a segment (Huffman-coded regions read
    raw bits, unlike the MQ paths)."""

    __slots__ = ("data", "pos", "bit_pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit_pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JBIG2 Huffman data")
        b = (self.data[self.pos] >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        if self.bit_pos:
            self.bit_pos = 0
            self.pos += 1


class _HuffTable:
    """One Annex-B table: lines are (PREFLEN, RANGELEN, RANGELOW,
    kind) with kind in {"norm", "lower", "upper", "oob"}; codes are
    assigned canonically by prefix length in line order (B.3)."""

    __slots__ = ("codes", "oob_code")

    def __init__(self, lines):
        counts: dict[int, int] = {}
        for pl, _rl, _lo, _k in lines:
            if pl:
                counts[pl] = counts.get(pl, 0) + 1
        firstcode = {}
        code = 0
        for ln in range(1, max(counts, default=0) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            firstcode[ln] = code
        nxt = dict(firstcode)
        self.codes = {}  # (preflen, code) -> (rangelen, rangelow, kind)
        self.oob_code = None
        for pl, rl, lo, kind in lines:
            if pl == 0:
                continue
            c = nxt[pl]
            nxt[pl] += 1
            self.codes[(pl, c)] = (rl, lo, kind)

    def decode(self, r: _HuffReader):
        """Returns an int, or _OOB."""
        ln = 0
        code = 0
        codes = self.codes
        while True:
            code = (code << 1) | r.bit()
            ln += 1
            hit = codes.get((ln, code))
            if hit is not None:
                rl, lo, kind = hit
                if kind == "oob":
                    return _OOB
                off = r.bits(rl)
                if kind == "lower":
                    return lo - off
                return lo + off
            if ln > 32:
                raise ValueError("bad JBIG2 Huffman code")


def _std_lines(spec: str):
    """Compact table spec -> lines.  Entries 'p/r/low' are normal
    lines; 'Lp/low' lower range, 'Up/low' upper range, 'Op' OOB."""
    lines = []
    for ent in spec.split():
        if ent[0] == "L":
            p, lo = ent[1:].split("/")
            lines.append((int(p), 32, int(lo), "lower"))
        elif ent[0] == "U":
            p, lo = ent[1:].split("/")
            lines.append((int(p), 32, int(lo), "upper"))
        elif ent[0] == "O":
            lines.append((int(ent[1:]), 0, 0, "oob"))
        else:
            p, r, lo = ent.split("/")
            lines.append((int(p), int(r), int(lo), "norm"))
    return lines


# T.88 Annex B.5, standard tables.  Transcription is pinned
# structurally in tests/test_jbig2.py: every table's ranges must tile
# the value line contiguously into its lower/upper extensions, and the
# prefix code must be COMPLETE (Kraft sum exactly 1) — either check
# catches a mis-copied entry.  Tables B.7 and B.10 are deliberately
# ABSENT: no transcription available to this build passed those checks
# and no codec on this host can arbitrate, so selecting them is a
# typed error rather than a silent mis-decode (they are non-default
# selections real encoders rarely emit).
_STD_TABLE_SPECS = {
    1: "1/4/0 2/8/16 3/16/272 U3/65808",
    2: "1/0/0 2/0/1 3/0/2 4/3/3 5/6/11 U6/75 O6",
    3: "8/8/-256 1/0/0 2/0/1 3/0/2 4/3/3 5/6/11 L8/-257 U7/75 O6",
    4: "1/0/1 2/0/2 3/0/3 4/3/4 5/6/12 U5/76",
    5: "7/8/-255 1/0/1 2/0/2 3/0/3 4/3/4 5/6/12 L7/-256 U6/76",
    6: ("5/10/-2048 4/9/-1024 4/8/-512 4/7/-256 5/6/-128 5/5/-64"
        " 4/5/-32 2/7/0 3/7/128 3/8/256 4/9/512 4/10/1024"
        " L6/-2049 U6/2048"),
    8: ("8/3/-15 9/1/-7 8/1/-5 9/0/-3 7/0/-2 4/0/-1 2/1/0 5/0/2"
        " 6/0/3 3/4/4 6/1/20 4/4/22 4/5/38 5/6/70 5/7/134 6/7/262"
        " 7/8/390 6/10/646 L9/-16 U9/1670 O2"),
    9: ("8/4/-31 9/2/-15 8/2/-11 9/1/-7 7/1/-5 4/1/-3 3/1/-1 3/1/1"
        " 5/1/3 6/1/5 3/5/7 6/2/39 4/5/43 4/6/75 5/7/139 5/8/267"
        " 6/8/523 7/9/779 6/11/1291 L9/-32 U9/3339 O2"),
    11: ("1/0/1 2/1/2 4/0/4 4/1/5 5/1/7 5/2/9 6/2/13 7/2/17 7/3/21"
         " 7/4/29 7/5/45 7/6/77 U7/141"),
    12: ("1/0/1 2/0/2 3/1/3 5/0/5 5/1/6 6/1/8 7/0/10 7/1/11 7/2/13"
         " 7/3/17 7/4/25 8/5/41 U8/73"),
    13: ("1/0/1 3/0/2 4/0/3 5/0/4 4/1/5 3/3/7 6/1/15 6/2/17 6/3/21"
         " 6/4/29 6/5/45 7/6/77 U7/141"),
    14: "3/0/-2 3/0/-1 1/0/0 3/0/1 3/0/2",
    15: ("7/4/-24 6/2/-8 5/1/-4 4/0/-2 3/0/-1 1/0/0 3/0/1 4/0/2"
         " 5/1/3 6/2/5 7/4/9 L7/-25 U7/25"),
}

_STD_TABLE_CACHE: dict[int, _HuffTable] = {}


def std_table(n: int) -> _HuffTable:
    if n not in _STD_TABLE_SPECS:
        raise NotImplementedError(
            f"JBIG2 standard Huffman table B.{n} (unverified transcription)"
        )
    t = _STD_TABLE_CACHE.get(n)
    if t is None:
        t = _HuffTable(_std_lines(_STD_TABLE_SPECS[n]))
        _STD_TABLE_CACHE[n] = t
    return t


def parse_table_segment(data: bytes) -> _HuffTable:
    """§7.4.13 / B.2.4 custom table segment: HTPS/HTRS-bit fields over
    [HTLOW, HTHIGH) plus lower/upper range lines and optional OOB."""
    if len(data) < 9:
        raise ValueError("truncated JBIG2 table segment")
    flags = data[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    low, high = struct.unpack(">ii", data[1:9])
    if high <= low:
        raise ValueError("bad JBIG2 table range")
    r = _HuffReader(data, 9)
    lines = []
    cur = low
    while cur < high:
        pl = r.bits(htps)
        rl = r.bits(htrs)
        if rl > 32:
            raise ValueError("bad JBIG2 table range length")
        lines.append((pl, rl, cur, "norm"))
        cur += 1 << rl
    lines.append((r.bits(htps), 32, low - 1, "lower"))
    lines.append((r.bits(htps), 32, high, "upper"))
    if htoob:
        lines.append((r.bits(htps), 0, 0, "oob"))
    return _HuffTable(lines)


def _select_table(sel: int, mapping: dict, customs: list, what: str):
    """Resolve a 2-bit table-selection field: a standard table from
    ``mapping`` or (sel == 3) the next referred custom table."""
    if sel == 3:
        if not customs:
            raise ValueError(f"JBIG2 {what}: missing referred custom table")
        return customs.pop(0)
    if sel not in mapping:
        raise ValueError(f"JBIG2 {what}: bad table selection {sel}")
    return std_table(mapping[sel])


def _read_symbol_id_codes(r: _HuffReader, n_syms: int) -> _HuffTable:
    """§7.4.4.5: runcode-coded symbol-ID code lengths -> canonical
    prefix table whose decoded values are symbol ids."""
    run_lens = [r.bits(4) for _ in range(35)]
    run_tbl = _HuffTable(
        [(pl, 0, i, "norm") for i, pl in enumerate(run_lens)]
    )
    lens: list[int] = []
    while len(lens) < n_syms:
        code = run_tbl.decode(r)
        if code is _OOB:
            raise ValueError("bad symbol-ID runcode")
        if code < 32:
            lens.append(code)
        elif code == 32:
            if not lens:
                raise ValueError("RUNCODE32 with no previous length")
            lens.extend([lens[-1]] * (r.bits(2) + 3))
        elif code == 33:
            lens.extend([0] * (r.bits(3) + 3))
        else:
            lens.extend([0] * (r.bits(7) + 11))
    if len(lens) > n_syms:
        raise ValueError("symbol-ID code lengths overrun")
    tbl = _HuffTable([(pl, 0, i, "norm") for i, pl in enumerate(lens)])
    r.align()
    return tbl


# ---------------------------------------------------------------------------
# §6.5 symbol dictionary / §6.4 text region
# ---------------------------------------------------------------------------


def decode_symbol_dict(
    dec: _MQDecoder,
    template: int,
    at: list[tuple[int, int]],
    n_ex: int,
    n_new: int,
    input_symbols: list[np.ndarray],
    *,
    refagg: bool = False,
    rtemplate: int = 0,
    r_at: tuple = (),
    gb_stats: bytearray | None = None,
    gr_stats: bytearray | None = None,
) -> list[np.ndarray]:
    """Arithmetic symbol dictionary (6.5.5): height classes of
    delta-coded widths, each symbol a generic region — or, with
    SDREFAGG (6.5.8.2), a refinement of an earlier symbol (IAID +
    IARDX/IARDY when REFAGGNINST is 1, the form scanners emit) or a
    multi-instance aggregate text region (6.5.8.2.2, contexts
    retained per Table 17) — returns the exported symbol list (IAEX
    run-coded over input + new).

    ``gb_stats``/``gr_stats``: externally provided bitmap coding
    contexts (7.4.3.1.5 "bitmap coding context used" — initialised
    from a retaining dictionary's final contexts); mutated in place,
    so a caller honouring bit 9 ("retained") keeps the references."""
    iadh = bytearray(512)
    iadw = bytearray(512)
    iaex = bytearray(512)
    iaai = bytearray(512)
    iardx = bytearray(512)
    iardy = bytearray(512)
    gb = gb_stats if gb_stats is not None else new_gb_stats(template)
    if len(gb) != len(new_gb_stats(template)):
        raise ValueError("JBIG2 retained GB context template mismatch")
    gr = gr_stats if gr_stats is not None else (
        new_gr_stats(rtemplate) if refagg else None
    )
    if gr is not None and len(gr) != len(new_gr_stats(rtemplate)):
        raise ValueError("JBIG2 retained GR context template mismatch")
    # 6.5.8.2.3: SBSYMCODELEN over input + ALL new symbols (fixed for
    # the whole dictionary; zero bits when there is only one symbol)
    code_len = (len(input_symbols) + n_new - 1).bit_length()
    iaid = bytearray(1 << (code_len + 1))
    # Table 17: the single-instance path and every multi-instance
    # aggregate text region share ONE set of integer contexts
    sd_ctx: dict = {"iaid": iaid, "iardx": iardx, "iardy": iardy}
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < n_new:
        dh = _decode_int(dec, iadh)
        if dh is _OOB:
            raise ValueError("OOB delta height in symbol dictionary")
        hcheight += dh
        if hcheight <= 0:
            raise ValueError("non-positive symbol height")
        symwidth = 0
        while True:
            dw = _decode_int(dec, iadw)
            if dw is _OOB:
                break  # end of height class
            symwidth += dw
            if symwidth <= 0:
                raise ValueError("non-positive symbol width")
            if len(new_syms) >= n_new:
                raise ValueError("too many symbols in dictionary")
            if refagg:
                n_agg = _decode_int(dec, iaai)
                if n_agg is _OOB or n_agg < 1:
                    raise ValueError("bad aggregate instance count")
                if n_agg != 1:
                    # 6.5.8.2.2 multi-instance aggregation: the symbol
                    # is a TEXT REGION of n_agg instances over the
                    # symbols so far, with the dictionary's contexts,
                    # GR stats, and SDSYMCODELEN retained (Table 17)
                    new_syms.append(
                        decode_text_region(
                            dec, symwidth, hcheight, n_agg,
                            input_symbols + new_syms,
                            strips=1, ref_corner=1, transposed=False,
                            comb_op=0, default_pixel=0, ds_offset=0,
                            refine=True, rtemplate=rtemplate,
                            r_at=r_at, ctx=sd_ctx, gr_stats=gr,
                            code_len=code_len,
                        )
                    )
                    continue
                sid = _decode_iaid(dec, iaid, code_len)
                rdx = _decode_int(dec, iardx)
                rdy = _decode_int(dec, iardy)
                if rdx is _OOB or rdy is _OOB:
                    raise ValueError("OOB refinement offset")
                pool = input_symbols + new_syms
                if sid >= len(pool):
                    raise ValueError("refinement symbol id out of range")
                new_syms.append(
                    decode_refinement(
                        dec, gr, symwidth, hcheight, rtemplate,
                        list(r_at), False, pool[sid], rdx, rdy,
                    )
                )
                continue
            new_syms.append(
                decode_generic(dec, gb, symwidth, hcheight, template, at, False)
            )
    # export flags: alternating skip/export runs over input ++ new
    all_syms = list(input_symbols) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    cur = 0
    guard = 2 * len(all_syms) + 4  # zero-length runs must not spin
    while i < len(all_syms) and guard:
        guard -= 1
        run = _decode_int(dec, iaex)
        if run is _OOB or run < 0:
            raise ValueError("bad export run in symbol dictionary")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
    if len(exported) != n_ex:
        raise ValueError("exported symbol count mismatch")
    return exported


class _RawIdTable:
    """6.5.8.2.3 SDHUFF symbol codes: plain SBSYMCODELEN-bit indices
    (a degenerate complete prefix code), wearing the _HuffTable
    decode interface."""

    __slots__ = ("n",)

    def __init__(self, n: int):
        self.n = n

    def decode(self, r: "_HuffReader") -> int:
        return r.bits(self.n) if self.n else 0


def _huff_refagg_symbol(
    r: "_HuffReader", data: bytes, w: int, h: int,
    pool: list[np.ndarray], code_len: int, tbl_agg: _HuffTable,
    rtemplate: int, r_at: tuple,
) -> np.ndarray:
    """One SDHUFF+SDREFAGG dictionary symbol (6.5.8.2)."""
    n_agg = tbl_agg.decode(r)
    if n_agg is _OOB or n_agg < 1:
        raise ValueError("bad aggregate instance count")
    if n_agg > 1:
        # Table 17 standard selections: FS=B.6, DS=B.8, DT=B.11,
        # RDW/RDH/RDX/RDY=B.15, RSIZE=B.1; raw-bit symbol codes
        tables = {
            "fs": std_table(6), "ds": std_table(8), "dt": std_table(11),
            "rdw": std_table(15), "rdh": std_table(15),
            "rdx": std_table(15), "rdy": std_table(15),
            "rsize": std_table(1), "id": _RawIdTable(code_len),
        }
        return decode_text_region_huffman(
            r, w, h, n_agg, pool, tables,
            strips=1, ref_corner=1, transposed=False, comb_op=0,
            default_pixel=0, ds_offset=0,
            refine=True, rtemplate=rtemplate, r_at=tuple(r_at),
        )
    sid = r.bits(code_len)
    if sid >= len(pool):
        raise ValueError("refinement symbol id out of range")
    rdx = std_table(15).decode(r)
    rdy = std_table(15).decode(r)
    bmsize = std_table(1).decode(r)
    if any(v is _OOB for v in (rdx, rdy, bmsize)):
        raise ValueError("OOB refinement field")
    r.align()
    sub = data[r.pos : r.pos + bmsize]
    if len(sub) < bmsize:
        raise ValueError("truncated refinement data")
    sym = decode_refinement(
        _MQDecoder(sub), new_gr_stats(rtemplate), w, h,
        rtemplate, list(r_at), False, pool[sid], rdx, rdy,
    )
    r.pos += bmsize
    return sym


def decode_symbol_dict_huffman(
    data: bytes,
    off: int,
    tbl_dh: _HuffTable,
    tbl_dw: _HuffTable,
    tbl_bmsize: _HuffTable,
    n_ex: int,
    n_new: int,
    input_symbols: list[np.ndarray],
    *,
    refagg: bool = False,
    rtemplate: int = 0,
    r_at: tuple = (),
    tbl_agg: _HuffTable | None = None,
) -> list[np.ndarray]:
    """Huffman symbol dictionary (6.5.5 with SDHUFF=1): height classes
    of delta-coded widths whose symbols arrive as ONE collective
    bitmap per class (6.5.9) — BMSIZE=0 means uncompressed byte-padded
    rows, otherwise an MMR (T.6) codestream of BMSIZE bytes — split by
    the decoded widths.  With SDREFAGG each symbol instead decodes
    individually (6.5.8.2): REFAGGNINST=1 is a raw-SBSYMCODELEN-bit id
    + B.15 offsets + B.1 BMSIZE + a byte-aligned MQ refinement stream;
    REFAGGNINST>1 is a Huffman text region over the symbols so far
    with the Table-17 standard tables and raw-bit symbol codes.
    Export runs use Table B.1 (6.5.10)."""
    r = _HuffReader(data, off)
    ex_tbl = std_table(1)
    # 6.5.8.2.3 (SDHUFF=1): SBSYMCODELEN has a floor of 1 bit
    code_len = max(1, (len(input_symbols) + n_new - 1).bit_length())
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < n_new:
        dh = tbl_dh.decode(r)
        if dh is _OOB:
            raise ValueError("OOB delta height in symbol dictionary")
        hcheight += dh
        if hcheight <= 0:
            raise ValueError("non-positive symbol height")
        symwidth = 0
        widths: list[int] = []
        while True:
            dw = tbl_dw.decode(r)
            if dw is _OOB:
                break
            symwidth += dw
            if symwidth <= 0:
                raise ValueError("non-positive symbol width")
            if len(new_syms) + len(widths) >= n_new:
                raise ValueError("too many symbols in dictionary")
            if refagg:
                new_syms.append(
                    _huff_refagg_symbol(
                        r, data, symwidth, hcheight,
                        input_symbols + new_syms, code_len,
                        tbl_agg or ex_tbl, rtemplate, r_at,
                    )
                )
                continue
            widths.append(symwidth)
        if refagg:
            continue  # symbols decoded individually, no collective
        if not widths:
            continue
        totwidth = sum(widths)
        bmsize = tbl_bmsize.decode(r)
        if bmsize is _OOB or bmsize < 0:
            raise ValueError("bad collective bitmap size")
        r.align()
        from .imaging import check_pixel_budget

        check_pixel_budget(totwidth, hcheight)
        if bmsize == 0:
            stride = (totwidth + 7) // 8
            need = stride * hcheight
            raw = data[r.pos : r.pos + need]
            if len(raw) < need:
                raise ValueError("truncated collective bitmap")
            r.pos += need
            bits = np.unpackbits(
                np.frombuffer(raw, np.uint8).reshape(hcheight, stride),
                axis=1,
            )[:, :totwidth]
        else:
            body = data[r.pos : r.pos + bmsize]
            if len(body) < bmsize:
                raise ValueError("truncated collective bitmap")
            r.pos += bmsize
            bits = _decode_generic_mmr(body, totwidth, hcheight)
        x = 0
        for wdt in widths:
            new_syms.append(np.ascontiguousarray(bits[:, x : x + wdt]))
            x += wdt
    # export runs over inputs ++ new, Table B.1
    all_syms = list(input_symbols) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    cur = 0
    guard = 2 * len(all_syms) + 4
    while i < len(all_syms) and guard:
        guard -= 1
        run = ex_tbl.decode(r)
        if run is _OOB or run < 0:
            raise ValueError("bad export run in symbol dictionary")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
    if len(exported) != n_ex:
        raise ValueError("exported symbol count mismatch")
    return exported


def decode_text_region_huffman(
    r: _HuffReader,
    w: int,
    h: int,
    n_instances: int,
    symbols: list[np.ndarray],
    tables: dict,
    *,
    strips: int = 1,
    ref_corner: int = 1,
    transposed: bool = False,
    comb_op: int = 0,
    default_pixel: int = 0,
    ds_offset: int = 0,
    refine: bool = False,
    rtemplate: int = 0,
    r_at: tuple = (),
) -> np.ndarray:
    """Huffman text region (6.4.5 with SBHUFF=1): the same strip
    placement as the arithmetic path with table-coded DT/FS/DS, raw
    log2(SBSTRIPS) CURT bits, and the §7.4.4.5 runcode symbol-ID
    table (already consumed by the caller into ``tables['id']``).
    With SBREFINE (6.4.11, SBHUFF=1) a raw RI bit per instance gates
    table-coded RDW/RDH/RDX/RDY + BMSIZE, then a byte-aligned
    SELF-CONTAINED MQ refinement codestream of exactly BMSIZE bytes
    (contexts fresh per instance)."""
    tbl_fs, tbl_ds, tbl_dt = tables["fs"], tables["ds"], tables["dt"]
    tbl_id = tables["id"]
    bitmap = np.full((h, w), default_pixel, dtype=np.uint8)
    log_strips = strips.bit_length() - 1
    if 1 << log_strips != strips:
        raise ValueError("SBSTRIPS must be a power of two")

    stript = tbl_dt.decode(r)
    if stript is _OOB:
        raise ValueError("OOB STRIPT")
    stript *= -strips
    firsts = 0
    inst = 0
    while inst < n_instances:
        dt = tbl_dt.decode(r)
        if dt is _OOB:
            raise ValueError("OOB DT")
        stript += dt * strips
        dfs = tbl_fs.decode(r)
        if dfs is _OOB:
            raise ValueError("OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ds = tbl_ds.decode(r)
                if ds is _OOB:
                    break  # end of strip
                curs += ds + ds_offset
            first = False
            curt = r.bits(log_strips) if strips > 1 else 0
            tt = stript + curt
            sid = tbl_id.decode(r)
            if sid is _OOB or sid >= len(symbols):
                raise ValueError("symbol id out of range")
            sym = symbols[sid]
            if refine and r.bit():
                rdw = tables["rdw"].decode(r)
                rdh = tables["rdh"].decode(r)
                rdx = tables["rdx"].decode(r)
                rdy = tables["rdy"].decode(r)
                bmsize = tables["rsize"].decode(r)
                if any(v is _OOB for v in (rdw, rdh, rdx, rdy, bmsize)):
                    raise ValueError("OOB Huffman refinement field")
                nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                if nw <= 0 or nh <= 0 or bmsize < 0:
                    raise ValueError("bad Huffman refined instance")
                r.align()
                sub = r.data[r.pos : r.pos + bmsize]
                if len(sub) < bmsize:
                    raise ValueError("truncated Huffman refinement data")
                sym = decode_refinement(
                    _MQDecoder(sub), new_gr_stats(rtemplate), nw, nh,
                    rtemplate, list(r_at), False, sym,
                    (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                )
                r.pos += bmsize
            sh, sw = sym.shape
            if transposed:
                y0 = curs
                x0 = tt if ref_corner in (0, 1) else tt - sw + 1
                _compose_at(bitmap, sym, x0, y0, comb_op)
                curs += sh - 1
            else:
                x0 = curs
                y0 = tt if ref_corner in (1, 3) else tt - sh + 1
                _compose_at(bitmap, sym, x0, y0, comb_op)
                curs += sw - 1
            inst += 1
            if inst > n_instances:
                raise ValueError("too many symbol instances")
    return bitmap


def decode_text_region(
    dec: _MQDecoder,
    w: int,
    h: int,
    n_instances: int,
    symbols: list[np.ndarray],
    *,
    strips: int = 1,
    ref_corner: int = 1,
    transposed: bool = False,
    comb_op: int = 0,
    default_pixel: int = 0,
    ds_offset: int = 0,
    refine: bool = False,
    rtemplate: int = 0,
    r_at: tuple = (),
    ctx: dict | None = None,
    gr_stats: np.ndarray | None = None,
    code_len: int | None = None,
) -> np.ndarray:
    """Arithmetic text region (6.4.5): place symbol instances on
    strips.  With SBREFINE (6.4.11) an instance whose IARI bit is set
    is decoded as a refinement of its symbol (IARDW/IARDH size deltas,
    IARDX/IARDY offsets with the floor(delta/2) bias).  ``strips`` is
    SBSTRIPS (power of two), ``ref_corner``: 0=BL 1=TL 2=BR 3=TR.
    ``ctx``/``gr_stats``/``code_len`` serve the symbol-dictionary
    aggregate path (6.5.8.2): the dictionary's integer contexts, GR
    stats, and dictionary-wide SBSYMCODELEN are RETAINED across every
    aggregate text-region decode (Table 17)."""
    c = ctx if ctx is not None else {}

    def carr(name: str, size: int = 512) -> bytearray:
        if name not in c:
            c[name] = bytearray(size)
        return c[name]

    iadt = carr("iadt")
    iafs = carr("iafs")
    iads = carr("iads")
    iait = carr("iait")
    iari = carr("iari")
    iardw = carr("iardw")
    iardh = carr("iardh")
    iardx = carr("iardx")
    iardy = carr("iardy")
    if gr_stats is not None:
        gr = gr_stats
    else:
        gr = new_gr_stats(rtemplate) if refine else None
    # SBSYMCODELEN = ceil(log2(SBNUMSYMS)); one symbol -> zero bits
    # (IAID over zero bits always yields id 0)
    if code_len is None:
        code_len = (len(symbols) - 1).bit_length()
    iaid = carr("iaid", 1 << (code_len + 1))
    bitmap = np.full((h, w), default_pixel, dtype=np.uint8)
    log_strips = strips.bit_length() - 1
    if 1 << log_strips != strips:
        raise ValueError("SBSTRIPS must be a power of two")

    stript = _decode_int(dec, iadt)
    if stript is _OOB:
        raise ValueError("OOB STRIPT")
    stript *= -strips
    firsts = 0
    inst = 0
    while inst < n_instances:
        dt = _decode_int(dec, iadt)
        if dt is _OOB:
            raise ValueError("OOB DT")
        stript += dt * strips
        dfs = _decode_int(dec, iafs)
        if dfs is _OOB:
            raise ValueError("OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ds = _decode_int(dec, iads)
                if ds is _OOB:
                    break  # end of strip
                curs += ds + ds_offset
            first = False
            if strips == 1:
                curt = 0
            else:
                curt = _decode_int(dec, iait)
                if curt is _OOB:
                    raise ValueError("OOB CURT")
            tt = stript + curt
            sid = _decode_iaid(dec, iaid, code_len)
            if sid >= len(symbols):
                raise ValueError("symbol id out of range")
            sym = symbols[sid]
            if refine:
                ri = _decode_int(dec, iari)
                if ri is _OOB:
                    raise ValueError("OOB refinement flag")
                if ri:
                    rdw = _decode_int(dec, iardw)
                    rdh = _decode_int(dec, iardh)
                    rdx = _decode_int(dec, iardx)
                    rdy = _decode_int(dec, iardy)
                    if any(v is _OOB for v in (rdw, rdh, rdx, rdy)):
                        raise ValueError("OOB refinement delta")
                    nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                    if nw <= 0 or nh <= 0:
                        raise ValueError("non-positive refined instance")
                    # 6.4.11 step 3c x): the reference offset carries a
                    # floor(delta/2) bias (floor for negatives too)
                    sym = decode_refinement(
                        dec, gr, nw, nh, rtemplate, list(r_at), False,
                        sym, (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                    )
            sh, sw = sym.shape
            if transposed:
                # S is vertical; ref corner picks the x side
                y0 = curs
                x0 = tt if ref_corner in (0, 1) else tt - sw + 1
                _compose_at(bitmap, sym, x0, y0, comb_op)
                curs += sh - 1
            else:
                x0 = curs
                y0 = tt if ref_corner in (1, 3) else tt - sh + 1
                _compose_at(bitmap, sym, x0, y0, comb_op)
                curs += sw - 1
            inst += 1
            if inst > n_instances:
                raise ValueError("too many symbol instances")
    return bitmap


def _compose_at(page: np.ndarray, bm: np.ndarray, x0: int, y0: int, op: int):
    """Clipped composition (§6.4.5 step 3c xi / Table 12 ops)."""
    ph, pw = page.shape
    bh, bw = bm.shape
    sy, sx = max(0, -y0), max(0, -x0)
    ey = min(bh, ph - y0)
    ex = min(bw, pw - x0)
    if sy >= ey or sx >= ex:
        return
    dst = page[y0 + sy : y0 + ey, x0 + sx : x0 + ex]
    src = bm[sy:ey, sx:ex]
    if op == 0:
        dst |= src
    elif op == 1:
        dst &= src
    elif op == 2:
        dst ^= src
    elif op == 3:
        dst ^= src ^ 1
    elif op == 4:
        dst[:] = src
    else:
        raise ValueError(f"bad combination operator {op}")


# ---------------------------------------------------------------------------
# §7: segment layer (embedded organization) + page assembly
# ---------------------------------------------------------------------------


class _Segment:
    __slots__ = ("number", "type", "referred", "page", "data")

    def __init__(self, number, typ, referred, page, data):
        self.number = number
        self.type = typ
        self.referred = referred
        self.page = page
        self.data = data


def _parse_header(data: bytes, i: int):
    """One segment header (§7.2.2-7.2.6): returns (number, type,
    referred, page, data_length, next_index), or None at end of
    data."""
    n = len(data)
    if i + 11 > n:
        return None
    number, flags = struct.unpack(">IB", data[i : i + 5])
    i += 5
    typ = flags & 0x3F
    page_size = 4 if flags & 0x40 else 1
    rts = data[i]
    if (rts >> 5) == 7:
        count = struct.unpack(">I", data[i : i + 4])[0] & 0x1FFFFFFF
        i += 4 + (count + 8) // 8  # retain bits
    else:
        count = rts >> 5
        i += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    if count * ref_size > n - i:
        raise ValueError("truncated JBIG2 segment header")
    referred = []
    for _ in range(count):
        if ref_size == 1:
            referred.append(data[i])
        elif ref_size == 2:
            referred.append(struct.unpack(">H", data[i : i + 2])[0])
        else:
            referred.append(struct.unpack(">I", data[i : i + 4])[0])
        i += ref_size
    if page_size == 1:
        page = data[i]
    else:
        page = struct.unpack(">I", data[i : i + 4])[0]
    i += page_size
    (length,) = struct.unpack(">I", data[i : i + 4])
    i += 4
    return number, typ, referred, page, length, i


def _parse_segments(data: bytes):
    """Embedded-organization segment stream (§7.2)."""
    segs = []
    i = 0
    n = len(data)
    while True:
        hd = _parse_header(data, i)
        if hd is None:
            break
        number, typ, referred, page, length, i = hd
        if length == 0xFFFFFFFF:
            # §7.2.7: unknown data length, allowed only for immediate
            # generic regions.  The data is terminated by a 2-byte
            # sequence that cannot occur inside the coded stream
            # (0xFF 0xAC for MQ — byte stuffing forbids FF >8F — or
            # 0x00 0x00 for MMR), followed by the 4-byte real row
            # count that replaces the region's unknown height.
            if typ not in (38, 39):
                raise NotImplementedError(
                    "JBIG2 unknown-length non-generic segment"
                )
            if i + 18 > n:
                raise ValueError("truncated JBIG2 segment")
            gflags = data[i + 17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            start = i + 18
            if not mmr:
                start += 2 * (4 if template == 0 else 1)  # AT pixels
            term = b"\x00\x00" if mmr else b"\xff\xac"
            idx = data.find(term, start)
            if idx < 0 or idx + 6 > n:
                raise ValueError("unterminated unknown-length segment")
            (rows,) = struct.unpack(">I", data[idx + 2 : idx + 6])
            body = bytearray(data[i : idx])  # terminator excluded
            (gh,) = struct.unpack(">I", body[4:8])
            if gh != 0xFFFFFFFF and gh != rows:
                raise ValueError("unknown-length row count mismatch")
            struct.pack_into(">I", body, 4, rows)  # real height
            segs.append(_Segment(number, typ, referred, page, bytes(body)))
            i = idx + 6
            continue
        if i + length > n:
            raise ValueError("truncated JBIG2 segment")
        segs.append(_Segment(number, typ, referred, page, data[i : i + length]))
        i += length
    return segs


def _parse_segments_random(data: bytes):
    """D.2 random-access organization: every segment HEADER comes
    first — up to and including the end-of-file segment's (type 51) —
    then the data parts concatenated in the same order."""
    headers = []
    i = 0
    while True:
        hd = _parse_header(data, i)
        if hd is None:
            raise ValueError(
                "JBIG2 random-access file without end-of-file segment"
            )
        number, typ, referred, page, length, i = hd
        if length == 0xFFFFFFFF:
            # §7.2.7 needs a scan for the terminator, impossible before
            # the earlier segments' data extents are known
            raise NotImplementedError(
                "JBIG2 unknown-length segment in random-access file"
            )
        headers.append((number, typ, referred, page, length))
        if typ == 51:
            break
    segs = []
    for number, typ, referred, page, length in headers:
        if i + length > len(data):
            raise ValueError("truncated JBIG2 segment")
        segs.append(
            _Segment(number, typ, referred, page, data[i : i + length])
        )
        i += length
    return segs


def _region_info(data: bytes):
    w, h, x, y = struct.unpack(">IIII", data[:16])
    flags = data[16]
    return w, h, x, y, flags & 0x07


def _read_at(data: bytes, off: int, n: int):
    at = []
    for k in range(n):
        dx, dy = struct.unpack(">bb", data[off + 2 * k : off + 2 * k + 2])
        at.append((dx, dy))
    return at, off + 2 * n


def _decode_generic_segment(seg_data: bytes):
    """§7.4.6: returns (bitmap, x, y, external op)."""
    w, h, x, y, op = _region_info(seg_data)
    from .imaging import check_pixel_budget

    check_pixel_budget(w, h)
    flags = seg_data[17]
    mmr = flags & 1
    template = (flags >> 1) & 3
    tpgdon = (flags >> 3) & 1
    if (flags >> 4) & 1:
        raise NotImplementedError("JBIG2 EXTTEMPLATE")
    off = 18
    if mmr:
        return _decode_generic_mmr(seg_data[off:], w, h), x, y, op
    n_at = 4 if template == 0 else 1
    at, off = _read_at(seg_data, off, n_at)
    dec = _MQDecoder(seg_data[off:])
    cx = new_gb_stats(template)
    return decode_generic(dec, cx, w, h, template, at, bool(tpgdon)), x, y, op


def _decode_symbol_dict_segment(seg_data: bytes, input_symbols,
                                custom_tables=(), retained_in=None):
    """§7.4.3 header + 6.5.5 decode -> (exported symbols, retained
    contexts or None) (arithmetic, refinement/aggregate, or
    Huffman/collective-bitmap variants).

    Bitmap coding context retention (7.4.3.1.5-6): bit 8 ("used")
    initialises the GB/GR stats from ``retained_in`` — a (gb, gr)
    tuple copied from the most recently decoded referred-to dictionary
    that set bit 9 ("retained"); bit 9 returns this dictionary's final
    stats for later consumers."""
    (flags,) = struct.unpack(">H", seg_data[:2])
    ctx_used = bool(flags & 0x100)
    ctx_retain = bool(flags & 0x200)
    refagg = bool(flags & 2)
    if (ctx_used or ctx_retain) and flags & 1:
        # 7.4.3.1.1: bits 8-9 shall be 0 unless arithmetic coding is in
        # use (SDHUFF=0, or SDHUFF=1 with SDREFAGG=1 for GR only) — the
        # Huffman+refagg retention form has no known producer
        raise NotImplementedError("JBIG2 retained contexts with SDHUFF")
    if ctx_used and retained_in is None:
        raise ValueError(
            "JBIG2 bitmap-coding-context-used without a retaining "
            "referred-to dictionary"
        )
    if flags & 1:
        customs = list(custom_tables)
        rtemplate = (flags >> 12) & 1
        tbl_dh = _select_table(
            (flags >> 2) & 3, {0: 4, 1: 5}, customs, "SDHUFFDH"
        )
        tbl_dw = _select_table(
            (flags >> 4) & 3, {0: 2, 1: 3}, customs, "SDHUFFDW"
        )
        tbl_bm = (
            std_table(1) if not (flags >> 6) & 1
            else _select_table(3, {}, customs, "SDHUFFBMSIZE")
        )
        tbl_agg = (
            std_table(1) if not (flags >> 7) & 1
            else _select_table(3, {}, customs, "SDHUFFAGGINST")
        )
        off = 2
        r_at: list[tuple[int, int]] = []
        if refagg and rtemplate == 0:
            if len(seg_data) < off + 4:
                raise ValueError("truncated JBIG2 symbol dictionary")
            r_at, off = _read_at(seg_data, off, 2)
        n_ex, n_new = struct.unpack(">II", seg_data[off : off + 8])
        if n_new > 1_000_000 or n_ex > 1_000_000:
            raise ValueError("implausible JBIG2 symbol counts")
        return decode_symbol_dict_huffman(
            seg_data, off + 8, tbl_dh, tbl_dw, tbl_bm, n_ex, n_new,
            input_symbols, refagg=refagg, rtemplate=rtemplate,
            r_at=tuple(r_at), tbl_agg=tbl_agg,
        ), None
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    off = 2
    at, off = _read_at(seg_data, off, 4 if template == 0 else 1)
    r_at: list[tuple[int, int]] = []
    if refagg and rtemplate == 0:
        r_at, off = _read_at(seg_data, off, 2)
    n_ex, n_new = struct.unpack(">II", seg_data[off : off + 8])
    off += 8
    if n_new > 1_000_000 or n_ex > 1_000_000:
        raise ValueError("implausible JBIG2 symbol counts")
    dec = _MQDecoder(seg_data[off:])
    # "used" copies the donor's contexts (the donor's own stats must
    # survive for other consumers); otherwise fresh zero stats
    gb = gr = None
    if ctx_used:
        gb_in, gr_in = retained_in
        gb = bytearray(gb_in)
        if refagg:
            gr = (bytearray(gr_in) if gr_in is not None
                  else new_gr_stats(rtemplate))
    elif ctx_retain:
        gb = new_gb_stats(template)
        gr = new_gr_stats(rtemplate) if refagg else None
    syms = decode_symbol_dict(
        dec, template, at, n_ex, n_new, input_symbols,
        refagg=refagg, rtemplate=rtemplate, r_at=tuple(r_at),
        gb_stats=gb, gr_stats=gr,
    )
    return syms, ((gb, gr) if ctx_retain else None)


def _decode_text_segment(seg_data: bytes, symbols, custom_tables=()):
    """§7.4.4 header + 6.4.5 decode -> (bitmap, x, y, op); arithmetic,
    SBREFINE, and Huffman (SBHUFF) variants."""
    w, h, x, y, op = _region_info(seg_data)
    from .imaging import check_pixel_budget

    check_pixel_budget(w, h)
    (flags,) = struct.unpack(">H", seg_data[17:19])
    refine = bool((flags >> 1) & 1)
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    default_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32  # signed 5-bit
    rtemplate = (flags >> 15) & 1
    if flags & 1:
        (hflags,) = struct.unpack(">H", seg_data[19:21])
        if not refine and (hflags >> 6) & 0x1FF:
            # RDW/RDH/RDX/RDY/RSIZE selections only matter with
            # SBREFINE; nonzero here would desync custom-table order
            raise NotImplementedError(
                "JBIG2 Huffman refinement table selections without REFINE"
            )
        customs = list(custom_tables)
        tbl_fs = _select_table(hflags & 3, {0: 6, 1: 7}, customs, "SBHUFFFS")
        tbl_ds = _select_table(
            (hflags >> 2) & 3, {0: 8, 1: 9, 2: 10}, customs, "SBHUFFDS"
        )
        tbl_dt = _select_table(
            (hflags >> 4) & 3, {0: 11, 1: 12, 2: 13}, customs, "SBHUFFDT"
        )
        tables = {"fs": tbl_fs, "ds": tbl_ds, "dt": tbl_dt}
        if refine:
            # 7.4.4.1.2 bits 6-13: RDW/RDH/RDX/RDY (0=B.14, 1=B.15);
            # bit 14: RSIZE (0=B.1, else next custom table)
            for name, sh in (("rdw", 6), ("rdh", 8), ("rdx", 10),
                             ("rdy", 12)):
                tables[name] = _select_table(
                    (hflags >> sh) & 3, {0: 14, 1: 15}, customs,
                    f"SBHUFF{name.upper()}",
                )
            if (hflags >> 14) & 1:
                if not customs:
                    raise ValueError(
                        "JBIG2 SBHUFFRSIZE: missing referred custom table"
                    )
                tables["rsize"] = customs.pop(0)
            else:
                tables["rsize"] = std_table(1)
        off_h = 21
        r_at = []
        if refine and rtemplate == 0:
            if len(seg_data) < off_h + 4:
                raise ValueError("truncated JBIG2 text region header")
            r_at, off_h = _read_at(seg_data, off_h, 2)
        if len(seg_data) < off_h + 4:
            raise ValueError("truncated JBIG2 text region header")
        (n_instances,) = struct.unpack(">I", seg_data[off_h : off_h + 4])
        if not symbols:
            raise ValueError("JBIG2 text region with no symbols")
        r = _HuffReader(seg_data, off_h + 4)
        tables["id"] = _read_symbol_id_codes(r, len(symbols))
        bm = decode_text_region_huffman(
            r, w, h, n_instances, symbols, tables,
            strips=1 << log_strips, ref_corner=ref_corner,
            transposed=bool(transposed), comb_op=comb_op,
            default_pixel=default_pixel, ds_offset=ds_offset,
            refine=refine, rtemplate=rtemplate, r_at=tuple(r_at),
        )
        return bm, x, y, op
    off = 19
    r_at: list[tuple[int, int]] = []
    if refine and rtemplate == 0:
        r_at, off = _read_at(seg_data, off, 2)
    (n_instances,) = struct.unpack(">I", seg_data[off : off + 4])
    off += 4
    if not symbols:
        raise ValueError("JBIG2 text region with no symbols")
    dec = _MQDecoder(seg_data[off:])
    bm = decode_text_region(
        dec, w, h, n_instances, symbols,
        strips=1 << log_strips, ref_corner=ref_corner,
        transposed=bool(transposed), comb_op=comb_op,
        default_pixel=default_pixel, ds_offset=ds_offset,
        refine=refine, rtemplate=rtemplate, r_at=tuple(r_at),
    )
    return bm, x, y, op


def _decode_refinement_segment(
    seg_data: bytes, page: np.ndarray,
    ref_override: np.ndarray | None = None,
):
    """§7.4.7: refinement region — the reference is the referred-to
    INTERMEDIATE region's bitmap when one exists (``ref_override``,
    top-left-anchored, pad/crop to the region extent), otherwise the
    page content currently under the region's rectangle."""
    w, h, x, y, op = _region_info(seg_data)
    from .imaging import check_pixel_budget

    check_pixel_budget(w, h)
    flags = seg_data[17]
    template = flags & 1
    tpgron = (flags >> 1) & 1
    off = 18
    r_at: list[tuple[int, int]] = []
    if template == 0:
        if len(seg_data) < off + 4:
            raise ValueError("truncated JBIG2 refinement segment")
        r_at, off = _read_at(seg_data, off, 2)
    ref = np.zeros((h, w), np.uint8)
    if ref_override is not None:
        rh, rw = ref_override.shape
        ref[: min(h, rh), : min(w, rw)] = ref_override[
            : min(h, rh), : min(w, rw)
        ]
    else:
        ph, pw = page.shape
        ey, ex = min(h, ph - y), min(w, pw - x)
        sy, sx = max(0, -y), max(0, -x)
        if sy < ey and sx < ex:
            ref[sy:ey, sx:ex] = page[y + sy : y + ey, x + sx : x + ex]
    dec = _MQDecoder(seg_data[off:])
    cx = new_gr_stats(template)
    bm = decode_refinement(
        dec, cx, w, h, template, r_at, bool(tpgron), ref, 0, 0
    )
    return bm, x, y, op


def _decode_pattern_dict_segment(seg_data: bytes) -> list[np.ndarray]:
    """§7.4.4 + §6.7: pattern dictionary — all GRAYMAX+1 patterns are
    coded as ONE collective generic bitmap of width (GRAYMAX+1)*HDPW
    (MMR or arithmetic with the 6.7.5 AT pins), then split."""
    flags = seg_data[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = seg_data[1], seg_data[2]
    (graymax,) = struct.unpack(">I", seg_data[3:7])
    if hdpw < 1 or hdph < 1:
        raise ValueError("bad JBIG2 pattern size")
    from .imaging import check_pixel_budget

    check_pixel_budget((graymax + 1) * hdpw, hdph)
    cw = (graymax + 1) * hdpw
    if hdmmr:
        collective = _decode_generic_mmr(seg_data[7:], cw, hdph)
    else:
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
        at = at[: 4 if template == 0 else 1]
        dec = _MQDecoder(seg_data[7:])
        cx = new_gb_stats(template)
        collective = decode_generic(dec, cx, cw, hdph, template, at, False)
    return [
        collective[:, i * hdpw : (i + 1) * hdpw].copy()
        for i in range(graymax + 1)
    ]


def _decode_halftone_segment(seg_data: bytes, patterns: list[np.ndarray]):
    """§7.4.5 + §6.6: halftone region — a grayscale image (Annex C.5
    gray-coded bitplanes, MSB first, one shared arithmetic context)
    indexes the pattern dictionary; each cell's pattern renders at the
    sheared grid position x=(HGX+mg*HRY+ng*HRX)>>8,
    y=(HGY+mg*HRX-ng*HRY)>>8 (6.6.5.2) under HCOMBOP."""
    w, h, x, y, op = _region_info(seg_data)
    from .imaging import check_pixel_budget

    check_pixel_budget(w, h)
    if not patterns:
        raise ValueError("JBIG2 halftone region with no pattern dictionary")
    flags = seg_data[17]
    hmmr = flags & 1
    template = (flags >> 1) & 3
    enable_skip = (flags >> 3) & 1
    comb_op = (flags >> 4) & 7
    def_pixel = (flags >> 7) & 1
    if enable_skip and hmmr:
        raise ValueError("JBIG2 HENABLESKIP with HMMR")  # §7.4.5.1.1
    hgw, hgh, hgx, hgy, hrx, hry = struct.unpack(
        ">IIiiHH", seg_data[18:38]
    )
    check_pixel_budget(hgw, hgh)
    hpats = len(patterns)
    hdph, hdpw = patterns[0].shape
    skip = None
    if enable_skip:
        # §6.6.5.1: a grid cell whose rendered pattern falls entirely
        # outside the region is never coded in any bitplane
        mgs = np.arange(hgh)[:, None]
        ngs = np.arange(hgw)[None, :]
        xs_ = (hgx + mgs * hry + ngs * hrx) >> 8
        ys_ = (hgy + mgs * hrx - ngs * hry) >> 8
        skip = (
            (xs_ + hdpw <= 0) | (xs_ >= w) | (ys_ + hdph <= 0) | (ys_ >= h)
        ).astype(np.uint8)
    bits = (hpats - 1).bit_length()
    gi = np.zeros((hgh, hgw), np.int64)
    if bits:
        if hmmr:
            # C.5 with HMMR=1: all bitplanes share ONE MMR stream,
            # each plane EOFB-terminated, continuing mid-bit
            from .ccitt import decode_t6_planes

            prev = None
            for j, luma in zip(
                range(bits - 1, -1, -1),
                decode_t6_planes(seg_data[38:], hgw, hgh, bits),
            ):
                plane = (luma == 0).astype(np.uint8)
                cur = plane if prev is None else plane ^ prev
                gi |= cur.astype(np.int64) << j
                prev = cur
        else:
            at = [
                (3 if template <= 1 else 2, -1),
                (-3, -1), (2, -2), (-2, -2),
            ]
            at = at[: 4 if template == 0 else 1]
            dec = _MQDecoder(seg_data[38:])
            cx = new_gb_stats(template)
            prev = None
            # C.5.2: planes MSB-first; bit_j = plane_j XOR bit_{j+1}
            for j in range(bits - 1, -1, -1):
                plane = decode_generic(
                    dec, cx, hgw, hgh, template, at, False, skip=skip
                )
                cur = plane if prev is None else plane ^ prev
                gi |= cur.astype(np.int64) << j
                prev = cur
    np.minimum(gi, hpats - 1, out=gi)  # 6.6.5.2: clamp to GRAYMAX
    bm = np.full((h, w), def_pixel, dtype=np.uint8)
    for mg in range(hgh):
        row = gi[mg]
        for ng in range(hgw):
            px = (hgx + mg * hry + ng * hrx) >> 8
            py = (hgy + mg * hrx - ng * hry) >> 8
            _compose_at(bm, patterns[row[ng]], px, py, comb_op)
    return bm, x, y, op


_GENERIC_TYPES = (36, 38, 39)
_TEXT_TYPES = (4, 6, 7)


JBIG2_MAGIC = b"\x97JB2\r\n\x1a\n"  # standalone file header (D.4.1)


def _strip_file_header(data: bytes):
    """Accept standalone .jb2 files too: D.4 file header followed by
    the segment stream.  Returns (payload, random_access): sequential
    files are a plain segment stream; random-access files (D.2, flags
    bit 0 clear) carry all segment headers before all data parts."""
    if not data.startswith(JBIG2_MAGIC):
        return data, False
    if len(data) < 9:
        raise ValueError("truncated JBIG2 file header")
    flags = data[8]
    off = 9
    if not flags & 2:  # number-of-pages field present
        off += 4
    return data[off:], not (flags & 1)


def _segments_of(raw: bytes):
    """Parse a raw embedded stream or standalone file to segments."""
    payload, random_access = _strip_file_header(raw)
    if random_access:
        return _parse_segments_random(payload)
    return _parse_segments(payload)


def decode_jbig2_page(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode the embedded-organization segment streams to the page-1
    bitmap ((h, w) uint8, 1 = black)."""
    segs = _segments_of(globals_data) + _segments_of(data)
    sym_dicts: dict[int, list[np.ndarray]] = {}
    sd_retained: dict[int, tuple] = {}  # seg number -> (gb, gr) stats
    pat_dicts: dict[int, list[np.ndarray]] = {}
    huff_tables: dict[int, _HuffTable] = {}
    page_w = page_h = None
    page_default = 0
    regions = []  # ("bm", bitmap, x, y, op) | ("refine", seg)
    inter: dict[int, np.ndarray] = {}  # intermediate region bitmaps
    for seg in segs:
        if seg.type == 0:  # symbol dictionary
            inputs: list[np.ndarray] = []
            customs: list[_HuffTable] = []
            for r in seg.referred:
                inputs.extend(sym_dicts.get(r, []))
                if r in huff_tables:
                    customs.append(huff_tables[r])
            # 7.4.3.1.5: "used" takes the retained contexts of the most
            # recently decoded referred-to dictionary that set bit 9 —
            # segment numbers are decode-ordered, so the max wins
            donors = [r for r in seg.referred if r in sd_retained]
            retained_in = sd_retained[max(donors)] if donors else None
            syms, retained_out = _decode_symbol_dict_segment(
                seg.data, inputs, customs, retained_in
            )
            sym_dicts[seg.number] = syms
            if retained_out is not None:
                sd_retained[seg.number] = retained_out
        elif seg.type in _TEXT_TYPES:
            symbols: list[np.ndarray] = []
            customs = []
            for r in seg.referred:
                symbols.extend(sym_dicts.get(r, []))
                if r in huff_tables:
                    customs.append(huff_tables[r])
            decoded = _decode_text_segment(seg.data, symbols, customs)
            if seg.type == 4:  # intermediate: refinement input only
                inter[seg.number] = decoded[0]
            else:
                regions.append(("bm", *decoded))
        elif seg.type in _GENERIC_TYPES:
            decoded = _decode_generic_segment(seg.data)
            if seg.type == 36:  # intermediate
                inter[seg.number] = decoded[0]
            else:
                regions.append(("bm", *decoded))
        elif seg.type == 48:  # page information
            pw, ph = struct.unpack(">II", seg.data[:8])
            page_w = pw
            page_h = None if ph == 0xFFFFFFFF else ph
            page_default = (seg.data[16] >> 2) & 1
        elif seg.type in (49, 50, 51, 52, 62):
            continue  # end-of-page/stripe/file, profiles, extension
        elif seg.type == 53:  # custom Huffman table
            huff_tables[seg.number] = parse_table_segment(seg.data)
        elif seg.type == 16:  # pattern dictionary
            pat_dicts[seg.number] = _decode_pattern_dict_segment(seg.data)
        elif seg.type in (20, 22, 23):
            patterns: list[np.ndarray] = []
            for r in seg.referred:
                patterns.extend(pat_dicts.get(r, []))
            decoded = _decode_halftone_segment(seg.data, patterns)
            if seg.type == 20:  # intermediate
                inter[seg.number] = decoded[0]
            else:
                regions.append(("bm", *decoded))
        elif seg.type in (40, 42, 43):
            # refinement: the reference is a referred-to INTERMEDIATE
            # region's bitmap when one exists, else the page-so-far —
            # either way decode is DEFERRED to assembly time so the
            # page state (and any assembly-time-stored intermediates)
            # is current.  Type 40 stores its result instead of
            # composing.
            regions.append(("refine", seg))
        else:
            raise ValueError(f"unknown JBIG2 segment type {seg.type}")
    if not regions:
        raise ValueError("JBIG2 stream contains no region segments")

    def extent(entry):
        if entry[0] == "refine":
            sg = entry[1]
            if sg.type == 40:  # intermediate: never composes
                return 0, 0
            w_, h_, x_, y_, _ = _region_info(sg.data)
            return x_ + w_, y_ + h_
        bm, x_, y_, _op = entry[1:]
        return x_ + bm.shape[1], y_ + bm.shape[0]

    if page_w is None:
        page_w = max(extent(e)[0] for e in regions)
    if page_h is None:  # unknown-height page: size to the content
        page_h = max(extent(e)[1] for e in regions)
    from .imaging import check_pixel_budget

    check_pixel_budget(page_w, page_h)
    page = np.full((page_h, page_w), page_default, dtype=np.uint8)
    for entry in regions:
        if entry[0] == "refine":
            sg = entry[1]
            ref_bm = next(
                (inter[r] for r in sg.referred if r in inter), None
            )
            bm, x, y, op = _decode_refinement_segment(
                sg.data, page, ref_bm
            )
            if sg.type == 40:  # intermediate: store, don't compose
                inter[sg.number] = bm
                continue
        else:
            bm, x, y, op = entry[1:]
        _compose_at(page, bm, x, y, op)
    return page


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF JBIG2Decode contract: (h, w) uint8 LUMA (JBIG2 1=black ->
    luma 0), ready for the extract_pdf_image_arrays error-as-value
    plumbing and the OCR plug."""
    page = decode_jbig2_page(data, globals_data)
    return np.where(page, 0, 255).astype(np.uint8)
