"""JBIG2 (T.88) decoder tests.

No third-party JBIG2 codec exists in this container (no jbig2dec /
ghostscript / pdf.js), so the evidence tier matches what the CCITT
decoder shipped with in r3: an independent in-test ENCODER implements
the forward spec — the MQ coder (Annex E flowcharts: byte-out with
carry into the pending byte, 0xFF stuffing to 7-bit feeds, SETBITS
flush), arithmetic integer coding (Annex A ranges + OOB), generic
region templates with their own context-layout transcription, symbol
dictionaries and text regions — and every stream it produces must
decode to the exact source bitmap.  Bilevel coding is lossless, so
all round-trips are strict oracles; boundary values of the integer
coder and the template/TPGDON constants are pinned explicitly, and
the PDF JBIG2Decode plumbing (including /JBIG2Globals resolution)
runs end-to-end through extract_pdf_image_arrays and OCR.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from receipt_scanner_spark.extract import jbig2
from receipt_scanner_spark.extract.jbig2 import (
    _MQDecoder,
    _OOB,
    _decode_int,
    decode_generic,
    decode_jbig2_embedded,
    decode_jbig2_page,
    new_gb_stats,
)

# ---------------------------------------------------------------------------
# Independent MQ encoder (T.88 Annex E forward procedures)
# ---------------------------------------------------------------------------


class MQEncoder:
    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = None  # pending byte
        self.out = bytearray()

    def _byteout(self):
        if self.b == 0xFF:
            self.out.append(self.b)
            self.b = self.c >> 20
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c < 0x8000000:
            if self.b is not None:
                self.out.append(self.b)
            self.b = self.c >> 19
            self.c &= 0x7FFFF
            self.ct = 8
            return
        # carry into the pending byte; clear the carry bit first
        self.b += 1
        self.c &= 0x7FFFFFF
        if self.b == 0xFF:
            self.out.append(self.b)
            self.b = self.c >> 20
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            self.out.append(self.b)
            self.b = self.c >> 19
            self.c &= 0x7FFFF
            self.ct = 8

    def encode(self, cx: bytearray, i: int, d: int):
        sv = cx[i]
        idx = sv & 0x7F
        qe = jbig2._MQ_QE[idx]
        self.a -= qe
        if d == (sv >> 7):
            # CODEMPS
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[i] = (sv & 0x80) | jbig2._MQ_NMPS[idx]
        else:
            # CODELPS
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            cx[i] = ((sv ^ (jbig2._MQ_SW[idx] << 7)) & 0x80) | jbig2._MQ_NLPS[
                idx
            ]
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (E.3.8): most trailing 1-bits within [C, C+A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b is not None:
            self.out.append(self.b)
        return bytes(self.out)


def enc_int(enc: MQEncoder, cx: bytearray, v) -> None:
    """Forward Annex A integer coding; v may be jbig2._OOB."""
    prev = 1

    def bit(d):
        nonlocal prev
        enc.encode(cx, prev, d)
        prev = (prev << 1) | d if prev < 256 else ((((prev << 1) | d) & 511) | 256)

    if v is _OOB:
        s, mag = 1, 0
    else:
        s, mag = (1, -v) if v < 0 else (0, v)
    bit(s)
    if mag < 4:
        bit(0)
        n, off = 2, 0
    elif mag < 20:
        bit(1)
        bit(0)
        n, off = 4, 4
    elif mag < 84:
        bit(1)
        bit(1)
        bit(0)
        n, off = 6, 20
    elif mag < 340:
        bit(1)
        bit(1)
        bit(1)
        bit(0)
        n, off = 8, 84
    elif mag < 4436:
        bit(1)
        bit(1)
        bit(1)
        bit(1)
        bit(0)
        n, off = 12, 340
    else:
        bit(1)
        bit(1)
        bit(1)
        bit(1)
        bit(1)
        n, off = 32, 4436
    val = mag - off
    for k in range(n - 1, -1, -1):
        bit((val >> k) & 1)


def enc_iaid(enc: MQEncoder, cx: bytearray, code_len: int, v: int) -> None:
    prev = 1
    for k in range(code_len - 1, -1, -1):
        d = (v >> k) & 1
        enc.encode(cx, prev, d)
        prev = (prev << 1) | d


# independent transcription of the context layouts (spec figures;
# typos here and in the module would have to agree to slip through)
_ENC_TEMPLATES = {
    0: ([(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
         (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8), (-2, -1, 9),
         (1, -2, 12), (0, -2, 13), (-1, -2, 14)],
        {0: 4, 1: 10, 2: 11, 3: 15}, 0x9B25),
    1: ([(-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
         (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
         (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12)],
        {0: 3}, 0x0795),
    2: ([(-1, 0, 0), (-2, 0, 1),
         (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
         (1, -2, 7), (0, -2, 8), (-1, -2, 9)],
        {0: 2}, 0x00E5),
    3: ([(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
         (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8), (-3, -1, 9)],
        {0: 4}, 0x0195),
}

_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}


def _px(bm, x, y):
    h, w = bm.shape
    if 0 <= x < w and 0 <= y < h:
        return int(bm[y, x])
    return 0


def enc_generic(enc, cx, bm, template, at, tpgdon=False, skip=None):
    fixed, at_bits, tp_cx = _ENC_TEMPLATES[template]
    h, w = bm.shape
    ltp = 0
    for y in range(h):
        if tpgdon:
            same = y > 0 and bool(np.array_equal(bm[y], bm[y - 1]))
            sltp = int(same) ^ ltp
            enc.encode(cx, tp_cx, sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(w):
            if skip is not None and skip[y, x]:
                continue  # §6.2.5.7: skipped pixels are never coded
            ctx = 0
            for dx, dy, bit in fixed:
                ctx |= _px(bm, x + dx, y + dy) << bit
            for ai, bit in at_bits.items():
                dx, dy = at[ai]
                ctx |= _px(bm, x + dx, y + dy) << bit
            enc.encode(cx, ctx, int(bm[y, x]))


# ---------------------------------------------------------------------------
# Segment builders (embedded organization, §7)
# ---------------------------------------------------------------------------


def seg(number, typ, referred, page, data, page4=False):
    out = bytearray(struct.pack(">IB", number, typ | (0x40 if page4 else 0)))
    assert len(referred) <= 4
    out += bytes([len(referred) << 5])
    for r in referred:
        if number <= 256:
            out += bytes([r])
        elif number <= 65536:
            out += struct.pack(">H", r)
        else:
            out += struct.pack(">I", r)
    out += struct.pack(">I", page) if page4 else bytes([page])
    out += struct.pack(">I", len(data)) + data
    return bytes(out)


def page_info(w, h, default_pixel=0, number=1):
    data = struct.pack(">IIII", w, h, 0, 0) + bytes([default_pixel << 2]) + b"\x00\x00"
    return seg(number, 48, [], 1, data)


def region_info(w, h, x, y, op):
    return struct.pack(">IIII", w, h, x, y) + bytes([op])


def generic_region_seg(
    bm, *, number=2, x=0, y=0, op=0, template=0, at=None, tpgdon=False,
    mmr=False, typ=38,
):
    h, w = bm.shape
    flags = (1 if mmr else 0) | (template << 1) | (int(tpgdon) << 3)
    body = bytearray(region_info(w, h, x, y, op))
    body.append(flags)
    if mmr:
        from tests.test_ccitt import encode_g4

        body += encode_g4(bm.astype(bool))
    else:
        at = at if at is not None else _NOMINAL_AT[template]
        for dx, dy in at:
            body += struct.pack(">bb", dx, dy)
        enc = MQEncoder()
        cx = new_gb_stats(template)
        enc_generic(enc, cx, bm, template, at, tpgdon)
        body += enc.flush()
    return seg(number, typ, [], 1, bytes(body))


def symbol_dict_seg(symbols, *, number=2, template=0, input_refs=(),
                    export_inputs=False, n_inputs=0,
                    ctx_used=False, ctx_retain=False, gb=None):
    """Arithmetic symbol dictionary exporting ``symbols`` (new) plus
    optionally all input symbols.

    Context retention (7.4.3.1.5-6): ``ctx_retain`` sets bit 9 and the
    final GB stats come back as the third return value; ``ctx_used``
    sets bit 8 and the encoder CONTINUES from ``gb`` (a copy of the
    retaining dictionary's final stats) — the bitstream then only
    decodes under a decoder that warms its contexts the same way."""
    at = _NOMINAL_AT[template]
    flags = (template << 10) | (0x100 if ctx_used else 0) \
        | (0x200 if ctx_retain else 0)
    body = bytearray(struct.pack(">H", flags))
    for dx, dy in at:
        body += struct.pack(">bb", dx, dy)
    n_ex = len(symbols) + (n_inputs if export_inputs else 0)
    body += struct.pack(">II", n_ex, len(symbols))
    enc = MQEncoder()
    iadh = bytearray(512)
    iadw = bytearray(512)
    iaex = bytearray(512)
    if ctx_used:
        assert gb is not None, "ctx_used needs the donor's stats"
        gb = bytearray(gb)
    else:
        gb = new_gb_stats(template)
    # group by height (height classes must be ascending)
    by_h: dict[int, list[np.ndarray]] = {}
    for s in symbols:
        by_h.setdefault(s.shape[0], []).append(s)
    hprev = 0
    order = []  # symbol order as decoded
    for hh in sorted(by_h):
        enc_int(enc, iadh, hh - hprev)
        hprev = hh
        wprev = 0
        for s in by_h[hh]:
            enc_int(enc, iadw, s.shape[1] - wprev)
            wprev = s.shape[1]
            enc_generic(enc, gb, s, template, at, False)
            order.append(s)
        enc_int(enc, iadw, _OOB)
    # export runs over inputs ++ new
    if export_inputs or n_inputs == 0:
        enc_int(enc, iaex, 0)
        enc_int(enc, iaex, n_inputs + len(symbols))
    else:
        enc_int(enc, iaex, n_inputs)
        enc_int(enc, iaex, len(symbols))
    body += enc.flush()
    return seg(number, 0, list(input_refs), 1, bytes(body)), order, gb


def text_region_seg(
    w, h, placements, symbols, *, number=3, refs=(2,), x=0, y=0, op=0,
    strips=1, ref_corner=1, transposed=False, comb_op=0, default_pixel=0,
    ds_offset=0, typ=6,
):
    """placements: list of strips, each ``(t_strip, [(s_abs, curt,
    sym_id), ...])`` with ABSOLUTE S coordinates (the coordinate the
    decoder draws at); the builder derives the IADS deltas from the
    decoder's CURS advance (extent - 1 per instance).  ``symbols`` is
    the decode-order symbol list (for extents)."""
    log_strips = strips.bit_length() - 1
    flags = (
        (log_strips << 2) | (ref_corner << 4) | (int(transposed) << 6)
        | (comb_op << 7) | (default_pixel << 9)
        | ((ds_offset & 0x1F) << 10)
    )
    body = bytearray(region_info(w, h, x, y, op))
    body += struct.pack(">H", flags)
    n_inst = sum(len(p[1]) for p in placements)
    body += struct.pack(">I", n_inst)
    enc = MQEncoder()
    iadt = bytearray(512)
    iafs = bytearray(512)
    iads = bytearray(512)
    iait = bytearray(512)
    code_len = (len(symbols) - 1).bit_length()
    iaid = bytearray(1 << (code_len + 1))

    def extent(sid):
        s = symbols[sid]
        return s.shape[0] if transposed else s.shape[1]

    enc_int(enc, iadt, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    for t_strip, insts in placements:
        assert (t_strip - stript) % strips == 0
        enc_int(enc, iadt, (t_strip - stript) // strips)
        stript = t_strip
        prev_edge = None
        for si, (s_coord, curt, sid) in enumerate(insts):
            if si == 0:
                enc_int(enc, iafs, s_coord - firsts)
                firsts = s_coord
            else:
                enc_int(enc, iads, s_coord - prev_edge - ds_offset)
            prev_edge = s_coord + extent(sid) - 1
            if strips > 1:
                enc_int(enc, iait, curt)
            enc_iaid(enc, iaid, code_len, sid)
        enc_int(enc, iads, _OOB)
    body += enc.flush()
    return seg(number, typ, list(refs), 1, bytes(body))


def _glyph(ch: str) -> np.ndarray:
    from receipt_scanner_spark.extract.ocr import render_text

    return (render_text(ch) < 128).astype(np.uint8)


# ---------------------------------------------------------------------------
# §6.3 refinement encoder (r5) — independent mirror of the decoder's
# context layout: LSB = nearest causal neighbour, coding bits 0-3,
# reference bits 4-12 (template 0) / 4-9 (template 1)
# ---------------------------------------------------------------------------

_GR_ENC = {
    0: {
        "coding": [(-1, 0, 0), (1, -1, 1), (0, -1, 2)],  # + A1 -> bit 3
        "reference": [
            (1, 1, 4), (0, 1, 5), (-1, 1, 6), (1, 0, 7), (0, 0, 8),
            (-1, 0, 9), (1, -1, 10), (0, -1, 11),
        ],  # + A2 -> bit 12
    },
    1: {
        "coding": [(-1, 0, 0), (1, -1, 1), (0, -1, 2), (-1, -1, 3)],
        "reference": [
            (1, 1, 4), (0, 1, 5), (1, 0, 6), (0, 0, 7), (-1, 0, 8),
            (0, -1, 9),
        ],
    },
}

_GR_NOMINAL_AT = [(-1, -1), (-1, -1)]


def enc_refinement(
    enc, cx, bm, ref, template, at=None, rdx=0, rdy=0, tpgron=False,
):
    spec = _GR_ENC[template]
    at = at if at is not None else _GR_NOMINAL_AT
    h, w = bm.shape
    tp_cx = 0x0100 if template == 0 else 0x0080
    ltp = 0

    def typical(x, y):
        vals = [
            _px(ref, x - rdx + ox, y - rdy + oy)
            for oy in (-1, 0, 1) for ox in (-1, 0, 1)
        ]
        return all(v == 0 for v in vals) or all(v == 1 for v in vals)

    for y in range(h):
        if tpgron:
            # row is LTP-safe when every typical pixel equals the
            # reference centre (those pixels are then not coded)
            safe = all(
                not typical(x, y)
                or int(bm[y, x]) == _px(ref, x - rdx, y - rdy)
                for x in range(w)
            )
            sltp = int(safe) ^ ltp
            enc.encode(cx, tp_cx, sltp)
            ltp ^= sltp
        for x in range(w):
            if ltp and typical(x, y):
                continue
            ctx = 0
            for dx, dy, bit in spec["coding"]:
                ctx |= _px(bm, x + dx, y + dy) << bit
            for dx, dy, bit in spec["reference"]:
                ctx |= _px(ref, x - rdx + dx, y - rdy + dy) << bit
            if template == 0:
                a1, a2 = at
                ctx |= _px(bm, x + a1[0], y + a1[1]) << 3
                ctx |= _px(ref, x - rdx + a2[0], y - rdy + a2[1]) << 12
            enc.encode(cx, ctx, int(bm[y, x]))


def refinement_region_seg(
    bm, ref, *, number=3, x=0, y=0, op=4, template=0, at=None,
    tpgron=False, typ=42, refs=(),
):
    """Refinement region (§7.4.7): ``ref`` must be what the decoder
    will reference — the page content under the rectangle, or (with
    ``refs`` naming an intermediate segment) that segment's bitmap."""
    h, w = bm.shape
    at = at if at is not None else _GR_NOMINAL_AT
    flags = template | (int(tpgron) << 1)
    body = bytearray(region_info(w, h, x, y, op))
    body.append(flags)
    if template == 0:
        for dx, dy in at:
            body += struct.pack(">bb", dx, dy)
    enc = MQEncoder()
    cx = bytearray(1 << (13 if template == 0 else 10))
    enc_refinement(enc, cx, bm, ref, template, at=at, tpgron=tpgron)
    body += enc.flush()
    return seg(number, typ, list(refs), 1, bytes(body))


def refagg_symbol_dict_seg(
    specs, n_inputs, *, number=3, input_refs=(2,), template=0, rtemplate=0,
):
    """SDREFAGG=1 dictionary: every new symbol is a single-instance
    refinement.  ``specs``: [(bitmap, ref_bitmap, ref_id, rdx, rdy)]
    in ascending-height order; exports only the new symbols."""
    flags = (1 << 1) | (template << 10) | (rtemplate << 12)
    body = bytearray(struct.pack(">H", flags))
    for dx, dy in _NOMINAL_AT[template]:
        body += struct.pack(">bb", dx, dy)
    if rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            body += struct.pack(">bb", dx, dy)
    n_new = len(specs)
    body += struct.pack(">II", n_new, n_new)
    enc = MQEncoder()
    iadh = bytearray(512)
    iadw = bytearray(512)
    iaex = bytearray(512)
    iaai = bytearray(512)
    iardx = bytearray(512)
    iardy = bytearray(512)
    code_len = (n_inputs + n_new - 1).bit_length()
    iaid = bytearray(1 << (code_len + 1))
    gr = bytearray(1 << (13 if rtemplate == 0 else 10))
    by_h: dict[int, list] = {}
    for sp in specs:
        by_h.setdefault(sp[0].shape[0], []).append(sp)
    hprev = 0
    order = []
    for hh in sorted(by_h):
        enc_int(enc, iadh, hh - hprev)
        hprev = hh
        wprev = 0
        for bm, ref_bm, ref_id, rdx, rdy in by_h[hh]:
            enc_int(enc, iadw, bm.shape[1] - wprev)
            wprev = bm.shape[1]
            enc_int(enc, iaai, 1)
            enc_iaid(enc, iaid, code_len, ref_id)
            enc_int(enc, iardx, rdx)
            enc_int(enc, iardy, rdy)
            enc_refinement(enc, gr, bm, ref_bm, rtemplate, rdx=rdx, rdy=rdy)
            order.append(bm)
        enc_int(enc, iadw, _OOB)
    enc_int(enc, iaex, n_inputs)
    enc_int(enc, iaex, n_new)
    body += enc.flush()
    return seg(number, 0, list(input_refs), 1, bytes(body)), order


def agg_symbol_dict_seg(
    specs, input_bitmaps, *, number=3, input_refs=(2,), template=0,
    rtemplate=0,
):
    """SDREFAGG=1 dictionary whose new symbols are MULTI-instance
    aggregate text regions (6.5.8.2.2).  ``specs``: ascending-height
    list of ("agg", w, h, [(s, sid, refinement-or-None), ...]) — one
    strip at t=0 per aggregate; refinement = (target_bm, rdx_field,
    rdy_field).  Mirrors the decoder's Table-17 context retention:
    the dictionary's IAID/IARDX/IARDY, ONE set of text-region integer
    contexts, and ONE GR stats array across every aggregate.  Returns
    (segment, new_symbol_bitmaps) with the expected bitmaps composed
    exactly as the decoder places them (OR, top-left corner)."""
    flags = (1 << 1) | (template << 10) | (rtemplate << 12)
    body = bytearray(struct.pack(">H", flags))
    for dx, dy in _NOMINAL_AT[template]:
        body += struct.pack(">bb", dx, dy)
    if rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            body += struct.pack(">bb", dx, dy)
    n_new = len(specs)
    n_inputs = len(input_bitmaps)
    body += struct.pack(">II", n_new, n_new)
    enc = MQEncoder()
    iadh = bytearray(512)
    iadw = bytearray(512)
    iaex = bytearray(512)
    iaai = bytearray(512)
    iardx = bytearray(512)
    iardy = bytearray(512)
    iadt = bytearray(512)
    iafs = bytearray(512)
    iads = bytearray(512)
    iari = bytearray(512)
    iardw = bytearray(512)
    iardh = bytearray(512)
    code_len = (n_inputs + n_new - 1).bit_length()
    iaid = bytearray(1 << (code_len + 1))
    gr = bytearray(1 << (13 if rtemplate == 0 else 10))
    order: list[np.ndarray] = []
    hprev = 0
    wprev = 0
    for kind, w_, h_, insts in sorted(specs, key=lambda s: s[2]):
        assert kind == "agg"
        if h_ != hprev:
            if hprev:
                enc_int(enc, iadw, _OOB)  # close the height class
            enc_int(enc, iadh, h_ - hprev)
            hprev = h_
            wprev = 0
        enc_int(enc, iadw, w_ - wprev)
        wprev = w_
        enc_int(enc, iaai, len(insts))
        pool = list(input_bitmaps) + order
        bitmap = np.zeros((h_, w_), np.uint8)
        # text region body: STRIPT seed 0, one strip of delta 0
        enc_int(enc, iadt, 0)
        enc_int(enc, iadt, 0)
        prev_edge = None
        for s_coord, sid, refinement in insts:
            if prev_edge is None:
                enc_int(enc, iafs, s_coord)
            else:
                enc_int(enc, iads, s_coord - prev_edge)
            enc_iaid(enc, iaid, code_len, sid)
            sym = pool[sid]
            if refinement is None:
                enc_int(enc, iari, 0)
            else:
                tgt, rdxf, rdyf = refinement
                enc_int(enc, iari, 1)
                rdw = tgt.shape[1] - sym.shape[1]
                rdh = tgt.shape[0] - sym.shape[0]
                enc_int(enc, iardw, rdw)
                enc_int(enc, iardh, rdh)
                enc_int(enc, iardx, rdxf)
                enc_int(enc, iardy, rdyf)
                enc_refinement(
                    enc, gr, tgt, sym, rtemplate,
                    rdx=(rdw >> 1) + rdxf, rdy=(rdh >> 1) + rdyf,
                )
                sym = tgt
            sh, sw = sym.shape
            bitmap[0 : min(sh, h_), s_coord : s_coord + sw][
                :, : max(0, min(sw, w_ - s_coord))
            ] |= sym[: min(sh, h_), : max(0, min(sw, w_ - s_coord))]
            prev_edge = s_coord + sw - 1
        enc_int(enc, iads, _OOB)
        order.append(bitmap)
    enc_int(enc, iadw, _OOB)
    enc_int(enc, iaex, n_inputs)
    enc_int(enc, iaex, n_new)
    body += enc.flush()
    return seg(number, 0, list(input_refs), 1, bytes(body)), order


def refine_text_region_seg(
    w, h, placements, symbols, *, number=4, refs=(2,), x=0, y=0, op=0,
    strips=1, ref_corner=1, rtemplate=0, typ=6,
):
    """Text region with SBREFINE=1.  ``placements``: list of strips
    ``(t_strip, [(s_abs, curt, sid, refinement-or-None), ...])`` where
    refinement = (target_bm, rdx, rdy); refined instances advance CURS
    by the REFINED extent."""
    flags = (1 << 1) | ((strips.bit_length() - 1) << 2) | (ref_corner << 4)
    flags |= rtemplate << 15
    body = bytearray(region_info(w, h, x, y, op))
    body += struct.pack(">H", flags)
    if rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            body += struct.pack(">bb", dx, dy)
    n_inst = sum(len(p[1]) for p in placements)
    body += struct.pack(">I", n_inst)
    enc = MQEncoder()
    iadt = bytearray(512)
    iafs = bytearray(512)
    iads = bytearray(512)
    iait = bytearray(512)
    iari = bytearray(512)
    iardw = bytearray(512)
    iardh = bytearray(512)
    iardx = bytearray(512)
    iardy = bytearray(512)
    code_len = (len(symbols) - 1).bit_length()
    iaid = bytearray(1 << (code_len + 1))
    gr = bytearray(1 << (13 if rtemplate == 0 else 10))

    enc_int(enc, iadt, 0)
    stript = 0
    firsts = 0
    for t_strip, insts in placements:
        enc_int(enc, iadt, (t_strip - stript) // strips)
        stript = t_strip
        prev_edge = None
        for si, (s_coord, curt, sid, refinement) in enumerate(insts):
            if si == 0:
                enc_int(enc, iafs, s_coord - firsts)
                firsts = s_coord
            else:
                enc_int(enc, iads, s_coord - prev_edge)
            if strips > 1:
                enc_int(enc, iait, curt)
            enc_iaid(enc, iaid, code_len, sid)
            sym = symbols[sid]
            if refinement is None:
                enc_int(enc, iari, 0)
            else:
                target, rdx, rdy = refinement
                rdw = target.shape[1] - sym.shape[1]
                rdh = target.shape[0] - sym.shape[0]
                enc_int(enc, iari, 1)
                enc_int(enc, iardw, rdw)
                enc_int(enc, iardh, rdh)
                enc_int(enc, iardx, rdx)
                enc_int(enc, iardy, rdy)
                enc_refinement(
                    enc, gr, target, sym, rtemplate,
                    rdx=(rdw >> 1) + rdx, rdy=(rdh >> 1) + rdy,
                )
                sym = target
            prev_edge = s_coord + sym.shape[1] - 1
        enc_int(enc, iads, _OOB)
    body += enc.flush()
    return seg(number, typ, list(refs), 1, bytes(body))


# ---------------------------------------------------------------------------
# MQ coder + integer decoding
# ---------------------------------------------------------------------------


class TestMQCoder:
    def test_state_table_structure(self):
        assert len(jbig2._MQ_STATES) == 47
        for qe, nmps, nlps, sw in jbig2._MQ_STATES:
            assert 1 <= qe <= 0x5601
            assert 0 <= nmps < 47 and 0 <= nlps < 47
        # switch exactly at the three 0x5601 fast-attack states
        assert [i for i, s in enumerate(jbig2._MQ_STATES) if s[3]] == [0, 6, 14]
        # state 46 is the self-looping non-adaptive state
        assert jbig2._MQ_STATES[46][1] == jbig2._MQ_STATES[46][2] == 46

    @pytest.mark.parametrize("seed", range(6))
    def test_random_bit_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        n_cx = int(rng.integers(1, 20))
        bits = rng.integers(0, 2, int(rng.integers(1, 3000))).tolist()
        ctxs = rng.integers(0, n_cx, len(bits)).tolist()
        enc = MQEncoder()
        cxe = bytearray(n_cx)
        for c, b in zip(ctxs, bits):
            enc.encode(cxe, c, b)
        data = enc.flush()
        dec = _MQDecoder(data)
        cxd = bytearray(n_cx)
        got = [dec.decode(cxd, c) for c in ctxs]
        assert got == bits

    def test_skewed_bits_compress(self):
        # mostly-MPS streams must compress far below 1 bit/decision
        bits = [0] * 4000 + [1] * 3
        enc = MQEncoder()
        cx = bytearray(1)
        for b in bits:
            enc.encode(cx, 0, b)
        data = enc.flush()
        assert len(data) < 60
        dec = _MQDecoder(data)
        cx2 = bytearray(1)
        assert [dec.decode(cx2, 0) for _ in bits] == bits

    def test_stuffed_ff_path(self):
        # alternating bits on one context walk the state machine into
        # 0xFF-producing territory across many streams; assert at
        # least one stream contains 0xFF and still round-trips
        hit = False
        for seed in range(40):
            rng = np.random.default_rng(100 + seed)
            bits = rng.integers(0, 2, 600).tolist()
            enc = MQEncoder()
            cx = bytearray(4)
            ctxs = rng.integers(0, 4, 600).tolist()
            for c, b in zip(ctxs, bits):
                enc.encode(cx, c, b)
            data = enc.flush()
            dec = _MQDecoder(data)
            cx2 = bytearray(4)
            assert [dec.decode(cx2, c) for c in ctxs] == bits
            hit = hit or b"\xff" in data[:-2]
        assert hit


class TestIntegerDecoding:
    @pytest.mark.parametrize(
        "v",
        [0, 1, -1, 3, -3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
         -4436, 100000, 2**20, -(2**20)],
    )
    def test_boundary_values(self, v):
        enc = MQEncoder()
        cx = bytearray(512)
        enc_int(enc, cx, v)
        enc_int(enc, cx, v)
        dec = _MQDecoder(enc.flush())
        cx2 = bytearray(512)
        assert _decode_int(dec, cx2) == v
        assert _decode_int(dec, cx2) == v

    def test_oob_and_mixed_sequence(self):
        rng = np.random.default_rng(5)
        vals = []
        for _ in range(300):
            if rng.random() < 0.1:
                vals.append(_OOB)
            else:
                vals.append(int(rng.integers(-5000, 5000)))
        enc = MQEncoder()
        cx = bytearray(512)
        for v in vals:
            enc_int(enc, cx, v)
        dec = _MQDecoder(enc.flush())
        cx2 = bytearray(512)
        for v in vals:
            got = _decode_int(dec, cx2)
            assert (got is _OOB) if v is _OOB else (got == v)


# ---------------------------------------------------------------------------
# Generic region
# ---------------------------------------------------------------------------


def _textlike(h, w, seed):
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), dtype=np.uint8)
    for _ in range(max(2, h * w // 60)):
        y0, x0 = int(rng.integers(0, h)), int(rng.integers(0, w))
        bm[y0 : y0 + int(rng.integers(1, 4)),
           x0 : x0 + int(rng.integers(1, 9))] = 1
    return bm


class TestGenericRegion:
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_roundtrip_all_templates(self, template):
        bm = _textlike(40, 57, seed=template)
        at = _NOMINAL_AT[template]
        enc = MQEncoder()
        cx = new_gb_stats(template)
        enc_generic(enc, cx, bm, template, at)
        dec = _MQDecoder(enc.flush())
        cx2 = new_gb_stats(template)
        got = decode_generic(dec, cx2, 57, 40, template, at, False)
        assert np.array_equal(got, bm)

    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_tpgdon_roundtrip(self, template):
        bm = _textlike(30, 41, seed=10 + template)
        bm[10:18] = bm[9]  # identical-row stretch exercises LTP rows
        at = _NOMINAL_AT[template]
        enc = MQEncoder()
        cx = new_gb_stats(template)
        enc_generic(enc, cx, bm, template, at, tpgdon=True)
        dec = _MQDecoder(enc.flush())
        cx2 = new_gb_stats(template)
        got = decode_generic(dec, cx2, 41, 30, template, at, True)
        assert np.array_equal(got, bm)

    def test_non_nominal_at_pixels(self):
        bm = _textlike(25, 33, seed=20)
        at = [(-1, -1), (1, -2), (-5, 0), (0, -2)]  # incl. current-row AT
        enc = MQEncoder()
        cx = new_gb_stats(0)
        enc_generic(enc, cx, bm, 0, at)
        dec = _MQDecoder(enc.flush())
        got = decode_generic(dec, new_gb_stats(0), 33, 25, 0, at, False)
        assert np.array_equal(got, bm)

    @pytest.mark.parametrize("shape", [(1, 1), (1, 40), (40, 1), (3, 3)])
    def test_edge_sizes(self, shape):
        h, w = shape
        bm = _textlike(h, w, seed=h * 41 + w)
        at = _NOMINAL_AT[0]
        enc = MQEncoder()
        cx = new_gb_stats(0)
        enc_generic(enc, cx, bm, 0, at)
        dec = _MQDecoder(enc.flush())
        got = decode_generic(dec, new_gb_stats(0), w, h, 0, at, False)
        assert np.array_equal(got, bm)

    def test_non_causal_at_rejected(self):
        dec = _MQDecoder(b"\x00\x00")
        with pytest.raises(ValueError, match="non-causal"):
            decode_generic(dec, new_gb_stats(0), 4, 4, 0,
                           [(1, 0), (-3, -1), (2, -2), (-2, -2)], False)

    def test_tpgdon_context_constants(self):
        # spec 6.2.5.7 pseudo-pixel contexts
        assert jbig2._TEMPLATES[0]["tpgdon"] == 0x9B25
        assert jbig2._TEMPLATES[1]["tpgdon"] == 0x0795
        assert jbig2._TEMPLATES[2]["tpgdon"] == 0x00E5
        assert jbig2._TEMPLATES[3]["tpgdon"] == 0x0195


# ---------------------------------------------------------------------------
# Segment layer / page assembly
# ---------------------------------------------------------------------------


class TestEmbeddedStream:
    def test_single_generic_region_page(self):
        bm = _textlike(30, 50, seed=1)
        stream = page_info(50, 30) + generic_region_seg(bm)
        page = decode_jbig2_page(stream)
        assert np.array_equal(page, bm)
        luma = decode_jbig2_embedded(stream)
        assert np.array_equal(luma, np.where(bm, 0, 255).astype(np.uint8))

    def test_mmr_generic_region(self):
        bm = _textlike(22, 40, seed=2)
        stream = page_info(40, 22) + generic_region_seg(bm, mmr=True)
        assert np.array_equal(decode_jbig2_page(stream), bm)

    def test_region_placement_and_composition(self):
        a = np.ones((4, 6), dtype=np.uint8)
        b = np.ones((4, 6), dtype=np.uint8)
        stream = (
            page_info(20, 10)
            + generic_region_seg(a, number=2, x=2, y=1)
            + generic_region_seg(b, number=3, x=5, y=3, op=2)  # XOR overlap
        )
        page = decode_jbig2_page(stream)
        want = np.zeros((10, 20), dtype=np.uint8)
        want[1:5, 2:8] |= 1
        want[3:7, 5:11] ^= 1
        assert np.array_equal(page, want)

    def test_unknown_page_height_sizes_to_content(self):
        bm = _textlike(12, 17, seed=3)
        stream = (
            page_info(17, 0xFFFFFFFF) + generic_region_seg(bm, y=4)
        )
        page = decode_jbig2_page(stream)
        assert page.shape == (16, 17)
        assert np.array_equal(page[4:], bm)

    def test_default_pixel_one(self):
        bm = np.zeros((5, 5), dtype=np.uint8)
        stream = page_info(5, 5, default_pixel=1) + generic_region_seg(
            bm, op=4
        )  # REPLACE clears
        assert decode_jbig2_page(stream).sum() == 0

    def test_honest_boundaries(self):
        bm = np.zeros((4, 4), dtype=np.uint8)
        base = page_info(4, 4)
        # halftone decodes as of r5 (TestHalftone); a zero-size pattern
        # dictionary is malformed, not a boundary
        with pytest.raises(ValueError, match="pattern size"):
            decode_jbig2_page(base + seg(2, 16, [], 1, b"\x00" * 8))
        # a 20-byte type-40 body cuts off inside the AT fields —
        # malformed, not a boundary (intermediates decode as of r5)
        with pytest.raises(ValueError, match="truncated"):
            decode_jbig2_page(
                base + seg(2, 40, [], 1, b"\x00" * 20)
                + generic_region_seg(bm, number=3)
            )
        with pytest.raises(ValueError, match="truncated"):
            decode_jbig2_page((base + generic_region_seg(bm))[:-3])
        with pytest.raises(ValueError, match="no region"):
            decode_jbig2_page(base)

    @staticmethod
    def _unknown_length(seg_full: bytes, rows: int, term: bytes) -> bytes:
        """Rewrite a generic region segment as unknown-length (§7.2.7):
        length and height 0xFFFFFFFF, terminator + row count appended."""
        head, body = seg_full[:7], bytearray(seg_full[11:])
        struct.pack_into(">I", body, 4, 0xFFFFFFFF)  # unknown height
        return (
            head + struct.pack(">I", 0xFFFFFFFF) + bytes(body)
            + term + struct.pack(">I", rows)
        )

    def test_unknown_length_arithmetic_segment(self):
        bm = _textlike(14, 18, seed=12)
        useg = self._unknown_length(
            generic_region_seg(bm, number=2), 14, b"\xff\xac"
        )
        page = decode_jbig2_page(page_info(18, 14) + useg)
        assert np.array_equal(page, bm)

    def test_unknown_length_mmr_segment_and_following_segment(self):
        bm = _textlike(12, 20, seed=13)
        useg = self._unknown_length(
            generic_region_seg(bm, number=2, mmr=True), 12, b"\x00\x00"
        )
        # a SECOND region after the unknown-length one proves the
        # parser resynchronizes at the right byte
        dot = np.zeros((2, 2), np.uint8)
        dot[0, 0] = 1
        extra = generic_region_seg(dot, number=3, x=18, y=10)
        page = decode_jbig2_page(page_info(20, 12) + useg + extra)
        want = bm.copy()
        want[10, 18] |= 1
        assert np.array_equal(page, want)

    def test_unknown_length_non_generic_is_typed_error(self):
        hdr = struct.pack(">IB", 2, 0) + bytes([0]) + bytes([1])
        stream = page_info(4, 4) + hdr + struct.pack(">I", 0xFFFFFFFF)
        with pytest.raises(NotImplementedError, match="unknown-length"):
            decode_jbig2_page(stream)

    def test_unknown_length_unterminated_is_error(self):
        bm = _textlike(6, 6, seed=14)
        useg = self._unknown_length(
            generic_region_seg(bm, number=2), 6, b"\xff\xac"
        )
        with pytest.raises(ValueError, match="unterminated"):
            decode_jbig2_page(page_info(6, 6) + useg[:-7])

    def test_corruption_fuzz_never_crashes(self):
        bm = _textlike(16, 16, seed=4)
        base = page_info(16, 16) + generic_region_seg(bm)
        rng = np.random.default_rng(9)
        for _ in range(200):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
            try:
                decode_jbig2_page(bytes(buf))
            except (ValueError, NotImplementedError, IndexError, struct.error):
                pass


# ---------------------------------------------------------------------------
# Symbol dictionary + text region
# ---------------------------------------------------------------------------


class TestSymbolText:
    def _symbols(self, chars="AB7"):
        return [_glyph(c) for c in chars]

    def test_symbol_dict_roundtrip_via_text_region(self):
        glyphs = self._symbols("AB7")
        sd, order, _gb = symbol_dict_seg(glyphs, number=2)
        ids = {i: g for i, g in enumerate(order)}
        # place each decoded symbol side by side, TL corner
        insts = []
        s = 1
        for i in range(len(order)):
            insts.append((s, 0, i))
            s += order[i].shape[1] - 1 + 3
        tr = text_region_seg(60, 12, [(1, insts)], order, number=3)
        stream = page_info(60, 12) + sd + tr
        page = decode_jbig2_page(stream)
        want = np.zeros((12, 60), dtype=np.uint8)
        s = 1
        for i in range(len(order)):
            g = ids[i]
            want[1 : 1 + g.shape[0], s : s + g.shape[1]] |= g
            s += g.shape[1] - 1 + 3
        assert np.array_equal(page, want)

    def test_multiple_height_classes(self):
        glyphs = [
            np.ones((3, 4), dtype=np.uint8),
            np.tri(5, 5, dtype=np.uint8),
            np.ones((5, 2), dtype=np.uint8),
            np.eye(8, 6, dtype=np.uint8),
        ]
        sd, order, _gb = symbol_dict_seg(glyphs, number=2)
        assert sorted(s.shape[0] for s in order) == [3, 5, 5, 8]
        insts = []
        s = 0
        for i in range(len(order)):
            insts.append((s, 0, i))
            s += order[i].shape[1] - 1 + 2
        tr = text_region_seg(40, 12, [(0, insts)], order, number=3)
        page = decode_jbig2_page(page_info(40, 12) + sd + tr)
        want = np.zeros((12, 40), dtype=np.uint8)
        s = 0
        for g in order:
            want[: g.shape[0], s : s + g.shape[1]] |= g
            s += g.shape[1] - 1 + 2
        assert np.array_equal(page, want)

    @pytest.mark.parametrize("corner", [0, 1, 2, 3])
    def test_ref_corners(self, corner):
        g = np.tri(4, 4, dtype=np.uint8)
        sd, order, _gb = symbol_dict_seg([g], number=2)
        t = 5
        insts = [(3, 0, 0)]
        tr = text_region_seg(12, 12, [(t, insts)], order, number=3,
                             ref_corner=corner)
        page = decode_jbig2_page(page_info(12, 12) + sd + tr)
        y0 = t if corner in (1, 3) else t - 3
        want = np.zeros((12, 12), dtype=np.uint8)
        want[y0 : y0 + 4, 3:7] = g
        assert np.array_equal(page, want)

    def test_transposed(self):
        g = np.tri(3, 5, dtype=np.uint8)
        sd, order, _gb = symbol_dict_seg([g], number=2)
        # transposed: CURS is vertical; advance H-1 between instances
        insts = [(2, 0, 0), (2 + 3 - 1 + 2 + 1, 0, 0)]
        tr = text_region_seg(14, 14, [(4, insts)], order, number=3,
                             transposed=True, ref_corner=1)
        page = decode_jbig2_page(page_info(14, 14) + sd + tr)
        want = np.zeros((14, 14), dtype=np.uint8)
        want[2:5, 4:9] |= g
        want[7:10, 4:9] |= g
        assert np.array_equal(page, want)

    def test_strips_gt_one_and_ds_offset(self):
        g = np.ones((2, 3), dtype=np.uint8)
        sd, order, _gb = symbol_dict_seg([g], number=2)
        # SBSTRIPS=4: per-instance CURT within the strip
        insts = [(0, 1, 0), (6, 3, 0)]
        tr = text_region_seg(16, 10, [(0, insts)], order, number=3, strips=4,
                             ds_offset=2)
        page = decode_jbig2_page(page_info(16, 10) + sd + tr)
        want = np.zeros((10, 16), dtype=np.uint8)
        want[1:3, 0:3] |= g
        want[3:5, 6:9] |= g
        assert np.array_equal(page, want)

    def test_imported_symbols_across_dicts(self):
        g1 = [_glyph("A")]
        g2 = [_glyph("B")]
        sd1, o1, _gb = symbol_dict_seg(g1, number=2)
        sd2, o2, _gb = symbol_dict_seg(
            g2, number=3, input_refs=(2,), export_inputs=True,
            n_inputs=len(o1),
        )
        # dict 3 exports [A(imported), B(new)] in that order
        insts = [(0, 0, 0), (o1[0].shape[1] - 1 + 3, 0, 1)]
        tr = text_region_seg(30, 14, [(0, insts)], o1 + o2, number=4, refs=(3,))
        page = decode_jbig2_page(page_info(30, 14) + sd1 + sd2 + tr)
        want = np.zeros((14, 30), dtype=np.uint8)
        a, b = o1[0], o2[0]
        want[: a.shape[0], : a.shape[1]] |= a
        x1 = a.shape[1] - 1 + 3
        want[: b.shape[0], x1 : x1 + b.shape[1]] |= b
        assert np.array_equal(page, want)

    def test_huffman_boundaries_are_typed_errors(self):
        # SDHUFF + SDREFAGG decodes as of r5-continuation: an empty
        # (0-symbol) dictionary parses clean, leaving a page with no
        # region segments
        body = struct.pack(">H", 3) + b"\x00" * 16
        with pytest.raises(ValueError, match="no region"):
            decode_jbig2_page(page_info(4, 4) + seg(2, 0, [], 1, body))
        # SBHUFF + SBREFINE decodes as of r5-continuation; a header
        # too short for the GR AT + instance count is malformed data
        body = region_info(4, 4, 0, 0, 0) + struct.pack(">H", 3) + b"\x00" * 8
        with pytest.raises(ValueError, match="truncated"):
            decode_jbig2_page(page_info(4, 4) + seg(2, 6, [], 1, body))


# ---------------------------------------------------------------------------
# Annex B Huffman encoders (r5) — MSB-first writer + emitters over the
# decoder's own canonical code assignment
# ---------------------------------------------------------------------------


class MSBWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self):
        while self.nbits:
            self.put(0, 1)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def huff_emit(bw: MSBWriter, table, v):
    """Emit ``v`` (or jbig2._OOB) through a decoder-built _HuffTable —
    codes dict preserves line order, so selection is deterministic."""
    for (pl, code), (rl, lo, kind) in table.codes.items():
        if v is jbig2._OOB:
            if kind == "oob":
                bw.put(code, pl)
                return
            continue
        if kind == "norm" and lo <= v < lo + (1 << rl):
            bw.put(code, pl)
            bw.put(v - lo, rl)
            return
        if kind == "upper" and v >= lo:
            bw.put(code, pl)
            bw.put(v - lo, rl)
            return
        if kind == "lower" and v <= lo:
            bw.put(code, pl)
            bw.put(lo - v, rl)
            return
    raise AssertionError(f"value {v!r} not representable")


def huff_symbol_dict_seg(
    symbols, *, number=2, use_mmr=False, dh_sel=0, dw_sel=0,
):
    """SDHUFF=1 dictionary: per height class a collective bitmap
    (uncompressed byte-padded rows, or MMR when use_mmr) split by
    DW-coded widths; export runs via Table B.1."""
    flags = 1 | (dh_sel << 2) | (dw_sel << 4)
    body = bytearray(struct.pack(">H", flags))
    body += struct.pack(">II", len(symbols), len(symbols))
    tbl_dh = jbig2.std_table((4, 5)[dh_sel])
    tbl_dw = jbig2.std_table((2, 3)[dw_sel])
    tbl_b1 = jbig2.std_table(1)
    bw = MSBWriter()
    by_h: dict[int, list[np.ndarray]] = {}
    for s in symbols:
        by_h.setdefault(s.shape[0], []).append(s)
    hprev = 0
    order = []
    tail = bytearray()  # interleaved raw chunks break the bit writer,
    # so build the stream chunkwise: bits -> align -> bytes -> bits

    def flush_bits():
        nonlocal bw
        tail.extend(bw.flush())
        bw = MSBWriter()

    for hh in sorted(by_h):
        # B.2 (default DW) has no negative lines: keep widths
        # nondecreasing within a height class
        by_h[hh].sort(key=lambda s: s.shape[1])
        huff_emit(bw, tbl_dh, hh - hprev)
        hprev = hh
        wprev = 0
        for s in by_h[hh]:
            huff_emit(bw, tbl_dw, s.shape[1] - wprev)
            wprev = s.shape[1]
            order.append(s)
        huff_emit(bw, tbl_dw, jbig2._OOB)
        coll = np.concatenate([s for s in by_h[hh]], axis=1)
        if use_mmr:
            from tests.test_ccitt import encode_g4

            payload = encode_g4(coll.astype(bool))
            huff_emit(bw, tbl_b1, len(payload))
        else:
            payload = np.packbits(coll, axis=1).tobytes()
            huff_emit(bw, tbl_b1, 0)
        flush_bits()
        tail.extend(payload)
    huff_emit(bw, tbl_b1, 0)  # skip 0 inputs
    huff_emit(bw, tbl_b1, len(order))  # export all new
    flush_bits()
    body += tail
    return seg(number, 0, [], 1, bytes(body)), order


def huff_refagg_symbol_dict_seg(
    specs, input_bitmaps, *, number=3, input_refs=(2,), rtemplate=0,
):
    """SDHUFF=1 + SDREFAGG=1 dictionary (6.5.8.2): each new symbol is
    either ("ref", target, sid, rdx, rdy) — single-instance refinement
    (raw-code_len-bit id + B.15 offsets + B.1 BMSIZE + byte-aligned MQ
    stream) — or ("agg", w, h, [(s, sid, refinement-or-None), ...]) —
    a Huffman text region with the Table-17 standard tables and
    raw-bit symbol codes.  Specs must be ascending-height."""
    flags = 1 | (1 << 1) | (rtemplate << 12)
    body = bytearray(struct.pack(">H", flags))
    if rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            body += struct.pack(">bb", dx, dy)
    n_new = len(specs)
    n_inputs = len(input_bitmaps)
    body += struct.pack(">II", n_new, n_new)
    tbl_dh = jbig2.std_table(4)
    tbl_dw = jbig2.std_table(2)
    tbl_b1 = jbig2.std_table(1)
    tbl_b15 = jbig2.std_table(15)
    code_len = max(1, (n_inputs + n_new - 1).bit_length())
    bw = MSBWriter()
    tail = bytearray()

    def flush_bits():
        nonlocal bw
        tail.extend(bw.flush())
        bw = MSBWriter()

    def spec_dims(sp):
        if sp[0] == "ref":
            return sp[1].shape[1], sp[1].shape[0]
        return sp[1], sp[2]

    order: list[np.ndarray] = []
    hprev = 0
    wprev = 0
    for sp in sorted(specs, key=lambda s: spec_dims(s)[1]):
        w_, h_ = spec_dims(sp)
        if h_ != hprev:
            if hprev:
                huff_emit(bw, tbl_dw, jbig2._OOB)
            huff_emit(bw, tbl_dh, h_ - hprev)
            hprev = h_
            wprev = 0
        huff_emit(bw, tbl_dw, w_ - wprev)
        wprev = w_
        pool = list(input_bitmaps) + order
        if sp[0] == "ref":
            _k, target, sid, rdx, rdy = sp
            huff_emit(bw, tbl_b1, 1)  # REFAGGNINST
            bw.put(sid, code_len)
            huff_emit(bw, tbl_b15, rdx)
            huff_emit(bw, tbl_b15, rdy)
            enc = MQEncoder()
            cx = bytearray(1 << (13 if rtemplate == 0 else 10))
            enc_refinement(enc, cx, target, pool[sid], rtemplate,
                           rdx=rdx, rdy=rdy)
            datab = enc.flush()
            huff_emit(bw, tbl_b1, len(datab))
            bw.align()
            flush_bits()
            tail.extend(datab)
            order.append(target)
            continue
        _k, _w, _h, insts = sp
        huff_emit(bw, tbl_b1, len(insts))  # REFAGGNINST > 1
        bitmap = np.zeros((h_, w_), np.uint8)
        # Huffman text region with Table-17 std tables; DT tables have
        # no zero line -> seed STRIPT one strip below, then delta 1
        tbl_dt = jbig2.std_table(11)
        tbl_fs = jbig2.std_table(6)
        tbl_ds = jbig2.std_table(8)
        huff_emit(bw, tbl_dt, 1)
        huff_emit(bw, tbl_dt, 1)  # stript: -1 + 1 = 0
        prev_edge = None
        for s_coord, sid, refinement in insts:
            if prev_edge is None:
                huff_emit(bw, tbl_fs, s_coord)
            else:
                huff_emit(bw, tbl_ds, s_coord - prev_edge)
            bw.put(sid, code_len)
            sym = pool[sid]
            if refinement is None:
                bw.put(0, 1)
            else:
                tgt, rdxf, rdyf = refinement
                bw.put(1, 1)
                rdw = tgt.shape[1] - sym.shape[1]
                rdh = tgt.shape[0] - sym.shape[0]
                for v in (rdw, rdh, rdxf, rdyf):
                    huff_emit(bw, tbl_b15, v)
                enc = MQEncoder()
                cx = bytearray(1 << (13 if rtemplate == 0 else 10))
                enc_refinement(enc, cx, tgt, sym, rtemplate,
                               rdx=(rdw >> 1) + rdxf,
                               rdy=(rdh >> 1) + rdyf)
                datab = enc.flush()
                huff_emit(bw, tbl_b1, len(datab))
                bw.align()
                for byt in datab:
                    bw.put(byt, 8)
                sym = tgt
            sh, sw = sym.shape
            bitmap[: min(sh, h_), s_coord : s_coord + sw][
                :, : max(0, min(sw, w_ - s_coord))
            ] |= sym[: min(sh, h_), : max(0, min(sw, w_ - s_coord))]
            prev_edge = s_coord + sw - 1
        huff_emit(bw, tbl_ds, jbig2._OOB)
        order.append(bitmap)
    huff_emit(bw, tbl_dw, jbig2._OOB)
    huff_emit(bw, tbl_b1, n_inputs)  # skip inputs
    huff_emit(bw, tbl_b1, n_new)  # export the new symbols
    flush_bits()
    body += tail
    return seg(number, 0, list(input_refs), 1, bytes(body)), order


def huff_text_region_seg(
    w, h, placements, symbols, *, number=3, refs=(2,), x=0, y=0, op=0,
    strips=1, ref_corner=1, fs_sel=0, ds_sel=0, dt_sel=0,
    custom=None, refine=False, rtemplate=0,
):
    """SBHUFF=1 text region: runcode symbol-ID table (all-equal code
    lengths via 6-bit runcodes), then table-coded DT/FS/DS placement.
    ``custom``: optional {"fs"|"ds"|"dt": _HuffTable} overriding the
    standard selection (caller must also refer the table segment).
    With ``refine``, an instance may be (s, curt, sid, (target, rdxf,
    rdyf)): RI=1, B.15-coded deltas, B.1-coded BMSIZE, byte-aligned
    self-contained MQ refinement stream (6.4.11 with SBHUFF=1)."""
    custom = custom or {}
    log_strips = strips.bit_length() - 1
    flags = (1 | (int(refine) << 1) | (log_strips << 2)
             | (ref_corner << 4) | (rtemplate << 15))
    hflags = (
        (3 if "fs" in custom else fs_sel)
        | ((3 if "ds" in custom else ds_sel) << 2)
        | ((3 if "dt" in custom else dt_sel) << 4)
    )
    if refine:
        # RDW/RDH/RDX/RDY all B.15 (selection 1); RSIZE std B.1
        hflags |= (1 << 6) | (1 << 8) | (1 << 10) | (1 << 12)
    body = bytearray(region_info(w, h, x, y, op))
    body += struct.pack(">H", flags)
    body += struct.pack(">H", hflags)
    if refine and rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            body += struct.pack(">bb", dx, dy)
    n_inst = sum(len(p[1]) for p in placements)
    body += struct.pack(">I", n_inst)
    tbl_r = jbig2.std_table(15)
    tbl_sz = jbig2.std_table(1)
    tbl_fs = custom.get("fs") or jbig2.std_table((6, 7)[fs_sel])
    tbl_ds = custom.get("ds") or jbig2.std_table((8, 9, 10)[ds_sel])
    tbl_dt = custom.get("dt") or jbig2.std_table((11, 12, 13)[dt_sel])
    bw = MSBWriter()
    # symbol-ID code table: all runcodes 6 bits long -> canonical code
    # of runcode i is i; all symbols share length L -> code of symbol
    # i is i in L bits
    n_syms = len(symbols)
    L = max(1, (n_syms - 1).bit_length())
    for _ in range(35):
        bw.put(6, 4)
    for _i in range(n_syms):
        bw.put(L, 6)  # runcode L = explicit length L (L < 32)
    bw.align()

    def extent(sid):
        return symbols[sid].shape[1]

    # the standard DT tables (B.11-13) have no zero line: seed STRIPT
    # one strip below the region so the first delta is always >= 1
    huff_emit(bw, tbl_dt, 1)
    stript = -strips
    firsts = 0
    for t_strip, insts in placements:
        assert (t_strip - stript) % strips == 0
        huff_emit(bw, tbl_dt, (t_strip - stript) // strips)
        stript = t_strip
        prev_edge = None
        for si, inst in enumerate(insts):
            s_coord, curt, sid = inst[:3]
            refn = inst[3] if refine and len(inst) > 3 else None
            if si == 0:
                huff_emit(bw, tbl_fs, s_coord - firsts)
                firsts = s_coord
            else:
                huff_emit(bw, tbl_ds, s_coord - prev_edge)
            if strips > 1:
                bw.put(curt, log_strips)
            bw.put(sid, L)
            ext = extent(sid)
            if refine:
                bw.put(1 if refn else 0, 1)
                if refn:
                    tgt, rdxf, rdyf = refn
                    sym = symbols[sid]
                    rdw = tgt.shape[1] - sym.shape[1]
                    rdh = tgt.shape[0] - sym.shape[0]
                    for v in (rdw, rdh, rdxf, rdyf):
                        huff_emit(bw, tbl_r, v)
                    enc = MQEncoder()
                    cx = bytearray(1 << (13 if rtemplate == 0 else 10))
                    enc_refinement(
                        enc, cx, tgt, sym, rtemplate,
                        rdx=(rdw >> 1) + rdxf, rdy=(rdh >> 1) + rdyf,
                    )
                    datab = enc.flush()
                    huff_emit(bw, tbl_sz, len(datab))
                    bw.align()
                    for byt in datab:
                        bw.put(byt, 8)
                    ext = tgt.shape[1]
            prev_edge = s_coord + ext - 1
        huff_emit(bw, tbl_ds, jbig2._OOB)
    body += bw.flush()
    return seg(number, 6, list(refs), 1, bytes(body))


def table_segment(lines, *, number=5, htps=4, htrs=6):
    """Custom table segment (§7.4.13): ``lines`` is [(preflen,
    rangelen)] covering [low, high) contiguously, plus (lower_pl,
    upper_pl[, oob_pl]) appended by the caller via kwargs-free
    convention: pass (low, high, norm_lines, lower_pl, upper_pl,
    oob_pl-or-None)."""
    low, high, norm, lower_pl, upper_pl, oob_pl = lines
    flags = (1 if oob_pl is not None else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4)
    body = bytearray([flags])
    body += struct.pack(">ii", low, high)
    bw = MSBWriter()
    cur = low
    for pl, rl in norm:
        bw.put(pl, htps)
        bw.put(rl, htrs)
        cur += 1 << rl
    assert cur >= high, "norm lines must cover the range"
    bw.put(lower_pl, htps)
    bw.put(upper_pl, htps)
    if oob_pl is not None:
        bw.put(oob_pl, htps)
    body += bw.flush()
    return seg(number, 53, [], 1, bytes(body))


# ---------------------------------------------------------------------------
# §6.3 refinement (r5)
# ---------------------------------------------------------------------------


class TestRefinement:
    """Generic refinement region, SBREFINE text instances, SDREFAGG
    dictionaries, and immediate refinement segments — round-tripped
    against the independent in-test encoder above (same evidence tier
    as the r4 generic/symbol/text work; no JBIG2 codec on this host)."""

    @staticmethod
    def _flip(bm, n, seed):
        rng = np.random.default_rng(seed)
        out = bm.copy()
        h, w = out.shape
        for _ in range(n):
            out[int(rng.integers(0, h)), int(rng.integers(0, w))] ^= 1
        return out

    @pytest.mark.parametrize("template", [0, 1])
    def test_direct_roundtrip(self, template):
        ref = _textlike(20, 24, seed=1)
        bm = self._flip(ref, 14, seed=2)
        enc = MQEncoder()
        size = 1 << (13 if template == 0 else 10)
        cx = bytearray(size)
        enc_refinement(enc, cx, bm, ref, template)
        dec = jbig2._MQDecoder(enc.flush())
        at = _GR_NOMINAL_AT if template == 0 else []
        out = jbig2.decode_refinement(
            dec, bytearray(size), 24, 20, template, at, False, ref
        )
        assert np.array_equal(out, bm)

    @pytest.mark.parametrize("rdx,rdy", [(2, 0), (0, -1), (-3, 2)])
    def test_reference_offsets(self, rdx, rdy):
        ref = _textlike(16, 18, seed=3)
        # bm approximates ref shifted BY (rdx, rdy): reference pixel
        # for (x, y) is ref[y - rdy, x - rdx]
        bm = jbig2._shifted(ref, 16, 18, -rdx, -rdy)
        bm = self._flip(bm, 6, seed=4)
        enc = MQEncoder()
        cx = bytearray(1 << 13)
        enc_refinement(enc, cx, bm, ref, 0, rdx=rdx, rdy=rdy)
        dec = jbig2._MQDecoder(enc.flush())
        out = jbig2.decode_refinement(
            dec, bytearray(1 << 13), 18, 16, 0, _GR_NOMINAL_AT, False,
            ref, rdx, rdy,
        )
        assert np.array_equal(out, bm)

    def test_size_change(self):
        ref = _textlike(10, 12, seed=5)
        bm = np.zeros((13, 15), np.uint8)
        bm[:10, :12] = ref
        bm = self._flip(bm, 8, seed=6)
        enc = MQEncoder()
        cx = bytearray(1 << 13)
        enc_refinement(enc, cx, bm, ref, 0)
        dec = jbig2._MQDecoder(enc.flush())
        out = jbig2.decode_refinement(
            dec, bytearray(1 << 13), 15, 13, 0, _GR_NOMINAL_AT, False, ref
        )
        assert np.array_equal(out, bm)

    @pytest.mark.parametrize("template", [0, 1])
    def test_tpgron_roundtrip(self, template):
        # near-copy refinement: most rows are LTP-typical, a few
        # pixels differ inside non-uniform neighbourhoods
        ref = np.zeros((14, 30), np.uint8)
        ref[3:11, 4:26] = _textlike(8, 22, seed=7)
        bm = ref.copy()
        bm[5, 10] ^= 1  # centre of non-uniform area
        bm[6, 20] ^= 1
        enc = MQEncoder()
        size = 1 << (13 if template == 0 else 10)
        cx = bytearray(size)
        enc_refinement(enc, cx, bm, ref, template, tpgron=True)
        dec = jbig2._MQDecoder(enc.flush())
        at = _GR_NOMINAL_AT if template == 0 else []
        out = jbig2.decode_refinement(
            dec, bytearray(size), 30, 14, template, at, True, ref
        )
        assert np.array_equal(out, bm)

    def test_tpgron_pseudo_context_pins(self):
        # the typical-prediction decision decodes on the "reference
        # centre set" context: bit 8 (13-bit t0) / bit 7 (10-bit t1)
        assert jbig2._GR_TPGRON_CTX[0] == 0x0100
        assert jbig2._GR_TPGRON_CTX[1] == 0x0080
        assert len(jbig2.new_gr_stats(0)) == 1 << 13
        assert len(jbig2.new_gr_stats(1)) == 1 << 10

    def test_noncausal_refinement_at1_rejected(self):
        dec = jbig2._MQDecoder(b"\x00")
        with pytest.raises(ValueError, match="non-causal"):
            jbig2.decode_refinement(
                dec, bytearray(1 << 13), 4, 4, 0, [(1, 0), (-1, -1)],
                False, np.zeros((4, 4), np.uint8),
            )

    @pytest.mark.parametrize("tpgron", [False, True])
    def test_immediate_refinement_segment_stream(self, tpgron):
        base = _textlike(12, 20, seed=8)
        refined = self._flip(base, 10, seed=9)
        stream = (
            page_info(20, 12)
            + generic_region_seg(base, number=2)
            + refinement_region_seg(
                refined, base, number=3, op=4, tpgron=tpgron
            )
        )
        assert np.array_equal(decode_jbig2_page(stream), refined)

    def test_refinement_segment_partial_rect(self):
        # refine only a sub-rectangle of the page; the reference is
        # the page content under it and the rest must stay untouched
        base = _textlike(16, 24, seed=10)
        sub = base[4:12, 6:18]
        refined_sub = self._flip(sub, 6, seed=11)
        stream = (
            page_info(24, 16)
            + generic_region_seg(base, number=2)
            + refinement_region_seg(
                refined_sub, sub, number=3, x=6, y=4, op=4, template=1
            )
        )
        want = base.copy()
        want[4:12, 6:18] = refined_sub
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_text_region_refined_instances(self):
        syms = [_glyph("A"), _glyph("B")]
        sd, order, _gb = symbol_dict_seg(syms, number=2)
        # instance 2 refines B: one pixel flipped and grown by (1, 1)
        target = np.zeros(
            (order[1].shape[0] + 1, order[1].shape[1] + 1), np.uint8
        )
        target[:-1, :-1] = order[1]
        target = self._flip(target, 3, seed=12)
        insts = [
            (0, 0, 0, None),
            (order[0].shape[1] + 2, 0, 1, (target, 0, 0)),
            (order[0].shape[1] + 2 + target.shape[1] + 1, 0, 0, None),
        ]
        tr = refine_text_region_seg(40, 14, [(0, insts)], order, number=3)
        page = decode_jbig2_page(page_info(40, 14) + sd + tr)
        want = np.zeros((14, 40), np.uint8)
        a = order[0]
        want[: a.shape[0], : a.shape[1]] |= a
        x1 = a.shape[1] + 2
        want[: target.shape[0], x1 : x1 + target.shape[1]] |= target
        x2 = x1 + target.shape[1] + 1
        want[: a.shape[0], x2 : x2 + a.shape[1]] |= a
        assert np.array_equal(page, want)

    @pytest.mark.parametrize("rtemplate", [0, 1])
    def test_refagg_symbol_dict_chain(self, rtemplate):
        base = [_glyph("7")]
        sd1, o1, _gb = symbol_dict_seg(base, number=2)
        refined = self._flip(o1[0], 4, seed=13)
        sd2, o2 = refagg_symbol_dict_seg(
            [(refined, o1[0], 0, 0, 0)], n_inputs=len(o1), number=3,
            input_refs=(2,), rtemplate=rtemplate,
        )
        tr = text_region_seg(
            20, 12, [(0, [(0, 0, 0)])], o2, number=4, refs=(3,)
        )
        page = decode_jbig2_page(page_info(20, 12) + sd1 + sd2 + tr)
        want = np.zeros((12, 20), np.uint8)
        want[: refined.shape[0], : refined.shape[1]] |= refined
        assert np.array_equal(page, want)

    def test_refagg_grown_symbol_with_offset(self):
        base = [_glyph("O")]
        sd1, o1, _gb = symbol_dict_seg(base, number=2)
        bh, bw = o1[0].shape
        grown = np.zeros((bh + 2, bw + 2), np.uint8)
        grown[1 : 1 + bh, 1 : 1 + bw] = o1[0]  # reference shifted by +1
        sd2, o2 = refagg_symbol_dict_seg(
            [(grown, o1[0], 0, 1, 1)], n_inputs=1, number=3, input_refs=(2,)
        )
        tr = text_region_seg(
            20, 14, [(0, [(0, 0, 0)])], o2, number=4, refs=(3,)
        )
        page = decode_jbig2_page(page_info(20, 14) + sd1 + sd2 + tr)
        want = np.zeros((14, 20), np.uint8)
        want[: grown.shape[0], : grown.shape[1]] |= grown
        assert np.array_equal(page, want)

    def test_multi_instance_aggregate_symbol(self):
        # 6.5.8.2.2: a dictionary symbol built as a 2-instance text
        # region over an imported glyph — 'LL' composed side by side.
        # Until r5-continuation this was a typed error.
        g = _glyph("L")
        sd1, o1, _gb = symbol_dict_seg([g], number=2)
        gh, gw = g.shape
        w_, h_ = 2 * gw + 1, gh
        sd2, new_syms = agg_symbol_dict_seg(
            [("agg", w_, h_, [(0, 0, None), (gw + 1, 0, None)])],
            o1, number=3, input_refs=(2,),
        )
        tr = text_region_seg(
            w_ + 2, h_ + 2, [(1, [(1, 0, 0)])], new_syms,
            number=4, refs=(3,),
        )
        page = decode_jbig2_page(page_info(w_ + 2, h_ + 2) + sd1 + sd2 + tr)
        want = np.zeros((h_ + 2, w_ + 2), np.uint8)
        want[1 : 1 + h_, 1 : 1 + w_] |= new_syms[0]
        assert np.array_equal(page, want)
        assert new_syms[0][:, :gw].sum() == g.sum()  # really two glyphs
        assert new_syms[0][:, gw + 1 :].sum() == g.sum()

    def test_aggregate_with_refined_instance(self):
        # one instance of the aggregate is itself refined (IARI=1):
        # exercises the shared GR stats + floor(delta/2) bias inside
        # the 6.5.8.2.2 text region
        g = _glyph("T")
        gh, gw = g.shape
        grown = np.zeros((gh + 1, gw + 2), np.uint8)
        grown[1:, 1 : 1 + gw] = g
        grown[0, :] = 1  # new top bar
        sd1, o1, _gb = symbol_dict_seg([g], number=2)
        w_, h_ = gw + grown.shape[1] + 2, grown.shape[0]
        sd2, new_syms = agg_symbol_dict_seg(
            [("agg", w_, h_,
              [(0, 0, None), (gw + 2, 0, (grown, 0, 0))])],
            o1, number=3, input_refs=(2,),
        )
        tr = text_region_seg(w_, h_, [(0, [(0, 0, 0)])], new_syms,
                             number=4, refs=(3,))
        page = decode_jbig2_page(page_info(w_, h_) + sd1 + sd2 + tr)
        assert np.array_equal(page, new_syms[0])
        # the refined instance landed, not the original glyph
        assert new_syms[0][0, gw + 2 :].sum() == grown[0].sum()

    def test_multiple_aggregates_share_contexts(self):
        # two aggregate symbols in one dictionary: Table-17 context
        # retention across aggregates must match encoder and decoder
        a = _glyph("A")
        b = _glyph("B")
        ah, aw = a.shape
        sd1, o1, _gb = symbol_dict_seg([a, b], number=2)
        w1, w2 = 2 * aw + 1, 2 * aw + 3
        sd2, new_syms = agg_symbol_dict_seg(
            [
                ("agg", w1, ah, [(0, 0, None), (aw + 1, 1, None)]),
                ("agg", w2, ah, [(0, 1, None), (aw + 3, 0, None)]),
            ],
            o1, number=3, input_refs=(2,),
        )
        tr = text_region_seg(
            w1 + w2 + 1, ah,
            [(0, [(0, 0, 0), (w1 + 1, 0, 1)])], new_syms,
            number=4, refs=(3,),
        )
        page = decode_jbig2_page(page_info(w1 + w2 + 1, ah) + sd1 + sd2 + tr)
        want = np.zeros((ah, w1 + w2 + 1), np.uint8)
        want[:, :w1] |= new_syms[0]
        want[:, w1 + 1 :] |= new_syms[1]
        assert np.array_equal(page, want)

    def test_intermediate_generic_feeds_refinement(self):
        # 8.2: an intermediate generic region (type 36) composes
        # NOTHING; the immediate refinement (type 42) referring to it
        # uses its bitmap as the reference and places the result at
        # the refinement's own region rectangle
        inter_bm = _textlike(12, 16, seed=21)
        target = self._flip(inter_bm, 9, seed=22)
        stream = (
            page_info(20, 16)
            + generic_region_seg(inter_bm, number=2, typ=36)
            + refinement_region_seg(
                target, inter_bm, number=3, x=3, y=2, op=0, refs=(2,)
            )
        )
        page = decode_jbig2_page(stream)
        want = np.zeros((16, 20), np.uint8)
        want[2:14, 3:19] = target
        assert np.array_equal(page, want)

    def test_intermediate_text_feeds_refinement(self):
        g = _glyph("E")
        gh, gw = g.shape
        sd, order, _gb = symbol_dict_seg([g], number=2)
        inter_tr = text_region_seg(
            gw + 2, gh + 2, [(1, [(1, 0, 0)])], order, number=3,
            refs=(2,), typ=4,
        )
        inter_bm = np.zeros((gh + 2, gw + 2), np.uint8)
        inter_bm[1 : 1 + gh, 1 : 1 + gw] = g
        target = self._flip(inter_bm, 5, seed=23)
        stream = (
            page_info(gw + 2, gh + 2) + sd + inter_tr
            + refinement_region_seg(target, inter_bm, number=4,
                                    refs=(3,))
        )
        assert np.array_equal(decode_jbig2_page(stream), target)

    def test_intermediate_refinement_chain(self):
        # type 40 refines an intermediate generic and STORES; a final
        # type 42 refines the stored result and composes
        base_bm = _textlike(10, 14, seed=24)
        mid = self._flip(base_bm, 6, seed=25)
        final = self._flip(mid, 6, seed=26)
        stream = (
            page_info(14, 10)
            + generic_region_seg(base_bm, number=2, typ=36)
            + refinement_region_seg(mid, base_bm, number=3, typ=40,
                                    refs=(2,))
            + refinement_region_seg(final, mid, number=4, refs=(3,))
        )
        assert np.array_equal(decode_jbig2_page(stream), final)

    def test_retained_coding_contexts_roundtrip(self):
        # 7.4.3.1.5-6: dictionary A retains its GB contexts (bit 9);
        # dictionary B (bit 8, referring A) continues encoding from a
        # COPY of A's final stats.  The composed text region must
        # render exactly — only possible if the decoder warms B's
        # contexts the same way.
        g1 = [_glyph("A"), _glyph("B")]
        g2 = [_glyph("7")]
        sd1, o1, gb1 = symbol_dict_seg(g1, number=2, ctx_retain=True)
        sd2, o2, _ = symbol_dict_seg(
            g2, number=3, input_refs=(2,), n_inputs=len(o1),
            export_inputs=True, ctx_used=True, gb=gb1,
        )
        symbols = o1 + o2
        w = sum(s.shape[1] for s in symbols) + 4
        h = max(s.shape[0] for s in symbols)
        insts, x = [], 0
        for sid, s in enumerate(symbols):
            insts.append((x, 0, sid))
            x += s.shape[1] + 2
        tr = text_region_seg(w, h, [(0, insts)], symbols, number=4,
                             refs=(3,))
        page = decode_jbig2_page(page_info(w, h) + sd1 + sd2 + tr)
        expect = np.zeros((h, w), dtype=np.uint8)
        for (x0, _t, sid) in insts:
            s = symbols[sid]
            expect[: s.shape[0], x0 : x0 + s.shape[1]] |= s
        assert np.array_equal(page, expect)

    def test_retained_contexts_are_load_bearing(self):
        # clearing bit 8 in dictionary B's flags (decode with FRESH
        # contexts) must NOT reproduce the same symbols — proof the
        # warm-context path actually changes the arithmetic decode
        g1 = [_glyph("A"), _glyph("B")]
        g2 = [_glyph("7")]
        sd1, o1, gb1 = symbol_dict_seg(g1, number=2, ctx_retain=True)
        sd2, o2, _ = symbol_dict_seg(
            g2, number=3, input_refs=(2,), n_inputs=len(o1),
            export_inputs=True, ctx_used=True, gb=gb1,
        )
        from receipt_scanner_spark.extract.jbig2 import (
            _decode_symbol_dict_segment, new_gb_stats,
        )

        body = sd2[12:]  # strip the 12-byte segment header
        warm, _ = _decode_symbol_dict_segment(
            body, o1, (), (gb1, None)
        )
        assert np.array_equal(warm[-1], g2[0])
        cold_body = bytearray(body)
        cold_body[0] &= ~0x01  # clear bit 8 of the big-endian flags
        try:
            cold, _ = _decode_symbol_dict_segment(
                bytes(cold_body), o1, (), None
            )
            assert not all(
                a.shape == b.shape and np.array_equal(a, b)
                for a, b in zip(cold, warm)
            )
        except ValueError:
            pass  # desynced stream is an equally valid outcome

    def test_context_used_without_donor_is_error(self):
        body = struct.pack(">H", 0x100) + b"\x00" * 16
        with pytest.raises(ValueError, match="without a retaining"):
            decode_jbig2_page(page_info(4, 4) + seg(2, 0, [], 1, body))

    def test_retained_contexts_with_sdhuff_stay_typed_error(self):
        body = struct.pack(">H", 0x301) + b"\x00" * 16
        with pytest.raises(NotImplementedError, match="retained"):
            decode_jbig2_page(page_info(4, 4) + seg(2, 0, [], 1, body))


class TestHuffman:
    """Annex-B Huffman machinery + SDHUFF dictionaries and SBHUFF text
    regions (r5).  The standard-table transcriptions are pinned by two
    independent structural invariants — contiguous range tiling and
    Kraft completeness (sum 2^-len == 1, the spec tables are complete
    prefix codes) — either of which catches a mis-copied entry; the
    two tables that failed them (B.7, B.10) ship as typed errors, not
    guesses."""

    def test_standard_tables_structurally_sound(self):
        from fractions import Fraction

        specs = jbig2._STD_TABLE_SPECS
        assert sorted(specs) == [1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 13, 14, 15]
        for n, spec in specs.items():
            lines = jbig2._std_lines(spec)
            kraft = sum(Fraction(1, 2 ** pl) for pl, _, _, _ in lines if pl)
            assert kraft == 1, (n, kraft)
            norm = sorted(
                (lo, lo + (1 << rl))
                for pl, rl, lo, k in lines if k == "norm"
            )
            for i in range(len(norm) - 1):
                assert norm[i][1] == norm[i + 1][0], (n, norm[i])
            for pl, _rl, lo, k in lines:
                if k == "lower":
                    assert lo == norm[0][0] - 1, n
                if k == "upper":
                    assert lo == norm[-1][1], n

    def test_unverified_tables_are_typed_errors(self):
        for n in (7, 10):
            with pytest.raises(NotImplementedError, match="unverified"):
                jbig2.std_table(n)

    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 13, 14, 15])
    def test_emit_decode_roundtrip_all_tables(self, n):
        tbl = jbig2.std_table(n)
        values = set()
        for _pl, (rl, lo, kind) in ((k, v) for k, v in tbl.codes.items()):
            if kind == "norm":
                values.update({lo, lo + (1 << rl) - 1})
            elif kind == "upper":
                values.update({lo, lo + 1000})
            elif kind == "lower":
                values.update({lo, lo - 1000})
        has_oob = any(k[2] == "oob" for k in tbl.codes.values())
        seq = sorted(values) + ([jbig2._OOB] if has_oob else [])
        bw = MSBWriter()
        for v in seq:
            huff_emit(bw, tbl, v)
        r = jbig2._HuffReader(bw.flush())
        for v in seq:
            got = tbl.decode(r)
            assert (got is jbig2._OOB) if v is jbig2._OOB else (got == v), (n, v, got)

    def test_custom_table_segment_roundtrip(self):
        # [0, 12): 0-3 (len2 range 2), 4-11 (range 3), lower/upper/oob
        tseg = table_segment((0, 12, [(2, 2), (2, 3)], 3, 3, 3), number=5)
        segs = jbig2._parse_segments(tseg)
        tbl = jbig2.parse_table_segment(segs[0].data)
        bw = MSBWriter()
        for v in (0, 3, 4, 11, -7, 40, jbig2._OOB):
            huff_emit(bw, tbl, v)
        r = jbig2._HuffReader(bw.flush())
        for v in (0, 3, 4, 11, -7, 40):
            assert tbl.decode(r) == v
        assert tbl.decode(r) is jbig2._OOB

    def _expected(self, w, h, placements, order):
        want = np.zeros((h, w), np.uint8)
        for t_strip, insts in placements:
            for s, curt, sid in insts:
                g = order[sid]
                want[
                    t_strip + curt : t_strip + curt + g.shape[0],
                    s : s + g.shape[1],
                ] |= g
        return want

    @pytest.mark.parametrize("use_mmr", [False, True])
    def test_huffman_dict_and_text_region(self, use_mmr):
        glyphs = [_glyph("H"), _glyph("7")]
        sd, order = huff_symbol_dict_seg(glyphs, number=2, use_mmr=use_mmr)
        w0 = order[0].shape[1]
        placements = [(0, [(0, 0, 0), (w0 + 3, 0, 1)])]
        tr = huff_text_region_seg(30, 14, placements, order, number=3)
        page = decode_jbig2_page(page_info(30, 14) + sd + tr)
        assert np.array_equal(page, self._expected(30, 14, placements, order))

    def test_multiple_height_classes_and_selections(self):
        tall = np.ones((9, 3), np.uint8)
        small = np.ones((4, 6), np.uint8)
        small[1:3, 1:5] = 0
        sd, order = huff_symbol_dict_seg(
            [tall, small], number=2, dh_sel=1, dw_sel=1
        )
        assert order[0].shape[0] == 4  # height classes ascend: small first
        placements = [(0, [(0, 0, 0), (8, 0, 1)]), (10, [(2, 0, 0)])]
        tr = huff_text_region_seg(
            24, 16, placements, order, number=3, ds_sel=1, dt_sel=1
        )
        page = decode_jbig2_page(page_info(24, 16) + sd + tr)
        assert np.array_equal(page, self._expected(24, 16, placements, order))

    def test_strips_and_curt_bits(self):
        glyphs = [_glyph("X")]
        sd, order = huff_symbol_dict_seg(glyphs, number=2)
        placements = [(0, [(0, 1, 0), (10, 3, 0)])]
        tr = huff_text_region_seg(
            24, 14, placements, order, number=3, strips=4, dt_sel=2
        )
        page = decode_jbig2_page(page_info(24, 14) + sd + tr)
        assert np.array_equal(page, self._expected(24, 14, placements, order))

    def test_custom_dt_table_via_referred_segment(self):
        glyphs = [_glyph("Q")]
        sd, order = huff_symbol_dict_seg(glyphs, number=2)
        tseg = table_segment((0, 16, [(2, 2), (2, 2), (2, 3)], 3, 3, None),
                             number=5)
        segs = jbig2._parse_segments(tseg)
        tbl_dt = jbig2.parse_table_segment(segs[0].data)
        placements = [(2, [(1, 0, 0)])]
        tr = huff_text_region_seg(
            16, 16, placements, order, number=6, refs=(2, 5),
            custom={"dt": tbl_dt},
        )
        page = decode_jbig2_page(page_info(16, 16) + sd + tseg + tr)
        assert np.array_equal(page, self._expected(16, 16, placements, order))

    @pytest.mark.parametrize("rtemplate", [0, 1])
    def test_huffman_refinement_text_region(self, rtemplate):
        # 6.4.11 with SBHUFF=1: RI gates B.15-coded deltas + a byte-
        # aligned self-contained MQ refinement stream per instance
        g = _glyph("H")
        gh, gw = g.shape
        sd, order = huff_symbol_dict_seg([g], number=2)
        target = order[0].copy()
        rng = np.random.default_rng(71)
        for _ in range(6):
            target[int(rng.integers(0, gh)), int(rng.integers(0, gw))] ^= 1
        w_, h_ = 2 * gw + 4, gh + 1
        tr = huff_text_region_seg(
            w_, h_,
            [(0, [(0, 0, 0, (target, 0, 0)), (gw + 3, 0, 0)])],
            order, number=3, refine=True, rtemplate=rtemplate,
        )
        page = decode_jbig2_page(page_info(w_, h_) + sd + tr)
        want = np.zeros((h_, w_), np.uint8)
        want[:gh, :gw] |= target
        want[:gh, gw + 3 : 2 * gw + 3] |= order[0]
        assert np.array_equal(page, want)

    def test_huffman_refinement_grown_instance(self):
        # refined instance grows by (1, 2) with nonzero field offsets:
        # the floor(delta/2) bias must match the arithmetic path
        g = _glyph("A")
        gh, gw = g.shape
        sd, order = huff_symbol_dict_seg([g], number=2)
        grown = np.zeros((gh + 1, gw + 2), np.uint8)
        grown[1:, 1 : 1 + gw] = order[0]
        grown[0, ::2] = 1
        w_, h_ = gw + 4, gh + 2
        tr = huff_text_region_seg(
            w_, h_, [(0, [(1, 0, 0, (grown, 1, -1))])], order,
            number=3, refine=True,
        )
        page = decode_jbig2_page(page_info(w_, h_) + sd + tr)
        want = np.zeros((h_, w_), np.uint8)
        want[: gh + 1, 1 : 3 + gw] |= grown
        assert np.array_equal(page, want)

    @pytest.mark.parametrize("rtemplate", [0, 1])
    def test_huffman_refagg_dict_single_instance(self, rtemplate):
        # SDHUFF=1 + SDREFAGG=1, REFAGGNINST=1 (6.5.8.2.2): raw-bit id
        # + B.15 offsets + B.1 BMSIZE + byte-aligned MQ refinement
        g = _glyph("R")
        gh, gw = g.shape
        sd1, o1 = huff_symbol_dict_seg([g], number=2)
        target = o1[0].copy()
        rng = np.random.default_rng(81)
        for _ in range(5):
            target[int(rng.integers(0, gh)), int(rng.integers(0, gw))] ^= 1
        sd2, o2 = huff_refagg_symbol_dict_seg(
            [("ref", target, 0, 0, 0)], o1, number=3, input_refs=(2,),
            rtemplate=rtemplate,
        )
        tr = huff_text_region_seg(gw, gh, [(0, [(0, 0, 0)])], o2,
                                  number=4, refs=(3,))
        page = decode_jbig2_page(page_info(gw, gh) + sd1 + sd2 + tr)
        assert np.array_equal(page, target)

    def test_huffman_refagg_dict_multi_instance(self):
        # REFAGGNINST=2 (6.5.8.2.2 with SDHUFF): a Huffman text region
        # with Table-17 standard tables and raw-bit symbol codes,
        # including one refined instance inside the aggregate
        g = _glyph("G")
        gh, gw = g.shape
        sd1, o1 = huff_symbol_dict_seg([g], number=2)
        grown = np.zeros((gh, gw + 1), np.uint8)
        grown[:, :gw] = o1[0]
        grown[::2, gw] = 1
        w_, h_ = gw + 2 + grown.shape[1], gh
        sd2, o2 = huff_refagg_symbol_dict_seg(
            [("agg", w_, h_,
              [(0, 0, None), (gw + 2, 0, (grown, 0, 0))])],
            o1, number=3, input_refs=(2,),
        )
        tr = huff_text_region_seg(w_, h_, [(0, [(0, 0, 0)])], o2,
                                  number=4, refs=(3,))
        page = decode_jbig2_page(page_info(w_, h_) + sd1 + sd2 + tr)
        assert np.array_equal(page, o2[0])
        assert page[:, gw + 2 :].sum() == grown.sum()

    def test_huffman_refagg_chained_symbols(self):
        # the second new symbol refines the FIRST new symbol (pool =
        # inputs ++ new-so-far, raw codes over the dict-wide length)
        g = _glyph("C")
        gh, gw = g.shape
        sd1, o1 = huff_symbol_dict_seg([g], number=2)
        mid = o1[0].copy()
        mid[0, 0] ^= 1
        fin = mid.copy()
        fin[gh - 1, gw - 1] ^= 1
        sd2, o2 = huff_refagg_symbol_dict_seg(
            [("ref", mid, 0, 0, 0), ("ref", fin, 1, 0, 0)],
            o1, number=3, input_refs=(2,),
        )
        tr = huff_text_region_seg(gw, gh, [(0, [(0, 0, 1)])], o2,
                                  number=4, refs=(3,))
        page = decode_jbig2_page(page_info(gw, gh) + sd1 + sd2 + tr)
        assert np.array_equal(page, fin)

    def test_unverified_fs_selection_is_typed_error(self):
        glyphs = [_glyph("Z")]
        sd, order = huff_symbol_dict_seg(glyphs, number=2)
        # hand-built header: SBHUFF with SBHUFFFS=1 selects B.7
        body = bytearray(region_info(16, 12, 0, 0, 0))
        body += struct.pack(">H", 1)  # SBHUFF
        body += struct.pack(">H", 1)  # hflags: FS selection 1
        body += struct.pack(">I", 1)
        tr = seg(3, 6, [2], 1, bytes(body))
        with pytest.raises(NotImplementedError, match="unverified"):
            decode_jbig2_page(page_info(16, 12) + sd + tr)

    def test_runcode_compression_paths(self):
        # exercise RUNCODE32/33/34 through _read_symbol_id_codes: 40
        # symbols, lengths [6]*7 + [0]*31 + [6, 6]
        bw = MSBWriter()
        for _ in range(35):
            bw.put(6, 4)
        bw.put(6, 6)  # first explicit length 6
        bw.put(32, 6)
        bw.put(6 - 3, 2)  # repeat previous x6 -> 7 sixes
        bw.put(34, 6)
        bw.put(31 - 11, 7)  # 31 zeros
        bw.put(6, 6)
        bw.put(6, 6)
        r = jbig2._HuffReader(bw.flush())
        tbl = jbig2._read_symbol_id_codes(r, 40)
        # canonical over lens: symbols 0-6 get codes 0..6 (6 bits),
        # 38/39 get 7, 8
        assert tbl.decode(jbig2._HuffReader(bytes([0b000001 << 2]))) == 1
        got = {tbl.codes[k][1] for k in tbl.codes}
        assert got == {0, 1, 2, 3, 4, 5, 6, 38, 39}
        # RUNCODE33 path: 3 zeros then an explicit length
        bw = MSBWriter()
        for _ in range(35):
            bw.put(6, 4)
        bw.put(33, 6)
        bw.put(0, 3)  # 3 zeros
        bw.put(1, 6)  # length 1
        r = jbig2._HuffReader(bw.flush())
        tbl = jbig2._read_symbol_id_codes(r, 4)
        assert {tbl.codes[k][1] for k in tbl.codes} == {3}


# ---------------------------------------------------------------------------
# PDF plumbing + OCR end-to-end
# ---------------------------------------------------------------------------


def _pdf_with_jbig2(image_seg: bytes, globals_seg: bytes | None = None):
    objs = []
    extra = ""
    if globals_seg is not None:
        objs.append(
            f"5 0 obj\n<< /Length {len(globals_seg)} >>\nstream\n".encode()
            + globals_seg + b"\nendstream\nendobj\n"
        )
        extra = " /DecodeParms << /JBIG2Globals 5 0 R >>"
    img = (
        f"4 0 obj\n<< /Subtype /Image /Width 1 /Height 1 /BitsPerComponent 1"
        f" /Filter /JBIG2Decode{extra} /Length {len(image_seg)} >>\nstream\n"
    ).encode() + image_seg + b"\nendstream\nendobj\n"
    objs.append(img)
    return b"%PDF-1.5\n" + b"".join(objs) + b"%%EOF\n"


class TestPdfIntegration:
    def test_jbig2_xobject_decodes(self):
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays

        bm = _textlike(18, 30, seed=6)
        stream = page_info(30, 18) + generic_region_seg(bm)
        pdf = _pdf_with_jbig2(stream)
        pairs = extract_pdf_image_arrays(pdf)
        assert len(pairs) == 1
        px, err = pairs[0]
        assert err is None
        assert np.array_equal(px, np.where(bm, 0, 255).astype(np.uint8))

    def test_jbig2_globals_symbol_dict(self):
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays

        glyphs = [_glyph("A")]
        sd, order, _gb = symbol_dict_seg(glyphs, number=2)
        insts = [(1, 0, 0)]
        tr = text_region_seg(14, 14, [(1, insts)], order, number=3)
        pdf = _pdf_with_jbig2(page_info(14, 14) + tr, globals_seg=sd)
        pairs = extract_pdf_image_arrays(pdf)
        assert len(pairs) == 1
        px, err = pairs[0]
        assert err is None
        g = order[0]
        want = np.full((14, 14), 255, dtype=np.uint8)
        want[1 : 1 + g.shape[0], 1 : 1 + g.shape[1]] = np.where(
            g, 0, 255
        )
        assert np.array_equal(px, want)

    def test_streamless_globals_object_yields_none(self):
        # r5 ADVICE: if the /JBIG2Globals object has no stream, the
        # scan must NOT fall through to a later object's stream body
        from receipt_scanner_spark.extract.pdf import _object_stream_body

        other = b"decoy-not-globals"
        pdf = (
            b"%PDF-1.5\n"
            b"5 0 obj\n<< /Type /Metadata >>\nendobj\n"
            + f"6 0 obj\n<< /Length {len(other)} >>\nstream\n".encode()
            + other + b"\nendstream\nendobj\n%%EOF\n"
        )
        assert _object_stream_body(pdf, 5) is None
        assert _object_stream_body(pdf, 6) == other

    def test_jbig2_ocr_end_to_end(self):
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays
        from receipt_scanner_spark.parsers.registry import parse_text

        px = render_text("TOTAL $13.37", scale=2)
        bm = (px < 128).astype(np.uint8)
        stream = page_info(bm.shape[1], bm.shape[0]) + generic_region_seg(bm)
        pdf = _pdf_with_jbig2(stream)
        (decoded, err), = extract_pdf_image_arrays(pdf)
        assert err is None
        got = parse_text(ocr_pixels(decoded))
        assert got["amount"] == "13.37"


class TestStandaloneFile:
    def test_jb2_file_header_sequential(self):
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.sniff import sniff_format

        bm = _textlike(14, 21, seed=8)
        body = page_info(21, 14) + generic_region_seg(bm)
        # D.4: magic + flags (bit0=1 sequential) + 4-byte page count
        f = jbig2.JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1) + body
        assert sniff_format(f) == "image/jbig2"
        luma = decode_pixels(f)
        assert np.array_equal(luma, np.where(bm, 0, 255).astype(np.uint8))

    def test_jb2_random_access_organization(self):
        """r5: D.2 random-access — all segment headers first (through
        the end-of-file segment's), then all data parts in order."""
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.sniff import sniff_format

        bm = _textlike(14, 21, seed=8)
        parts = [
            page_info(21, 14),           # number 1, 0 refs
            generic_region_seg(bm),      # number 2, 0 refs
            seg(3, 51, [], 1, b""),      # end-of-file
        ]
        # header length for number<=256 / 1-byte page / 0 refs is 11
        pieces = [(p[:11], p[11:]) for p in parts]
        f = (
            jbig2.JBIG2_MAGIC + bytes([0x00]) + struct.pack(">I", 1)
            + b"".join(h for h, _ in pieces)
            + b"".join(d for _, d in pieces)
        )
        assert sniff_format(f) == "image/jbig2"
        luma = decode_pixels(f)
        assert np.array_equal(luma, np.where(bm, 0, 255).astype(np.uint8))
        # interleaving headers and data (sequential layout) under the
        # random-access flag must NOT decode to the same page silently
        seq_payload = b"".join(parts)
        f_bad = (
            jbig2.JBIG2_MAGIC + bytes([0x01]) + struct.pack(">I", 1)
            + seq_payload
        )
        assert np.array_equal(decode_pixels(f_bad), luma)

    def test_random_access_without_eof_segment_is_error(self):
        f = jbig2.JBIG2_MAGIC + bytes([0x00]) + struct.pack(">I", 1)
        with pytest.raises(ValueError, match="end-of-file"):
            decode_jbig2_page(f)


# ---------------------------------------------------------------------------
# Halftone regions (r5): pattern dictionary (§6.7) + halftone region
# (§6.6) — in-test encoder over the same MQ/generic machinery
# ---------------------------------------------------------------------------


def pattern_dict_seg(patterns, *, number=2, template=0, mmr=False):
    """§7.4.4: all patterns coded as ONE collective generic bitmap of
    width (GRAYMAX+1)*HDPW with the 6.7.5 AT pins."""
    hdph, hdpw = patterns[0].shape
    assert all(p.shape == (hdph, hdpw) for p in patterns)
    collective = np.concatenate(patterns, axis=1).astype(np.uint8)
    body = bytearray([(1 if mmr else 0) | (template << 1), hdpw, hdph])
    body += struct.pack(">I", len(patterns) - 1)
    if mmr:
        from tests.test_ccitt import encode_g4

        body += encode_g4(collective.astype(bool))
    else:
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
        at = at[: 4 if template == 0 else 1]
        enc = MQEncoder()
        cx = new_gb_stats(template)
        enc_generic(enc, cx, collective, template, at)
        body += enc.flush()
    return seg(number, 16, [], 1, bytes(body))


def halftone_region_seg(
    gray, n_patterns, pat_shape, *, number=3, referred=(2,), x=0, y=0,
    op=0, template=0, comb_op=0, def_pixel=0, hgx=0, hgy=0, hrx=None,
    hry=0, typ=22, enable_skip=False, flags_mmr=False,
):
    """§7.4.5: the gray image encodes as Annex C.5 gray-coded bitplanes
    (MSB first) through ONE shared arithmetic context.  Default grid:
    square pitch = pattern width (HRX = HDPW<<8, HRY = 0)."""
    hgh, hgw = gray.shape
    hdph, hdpw = pat_shape
    hrx = hrx if hrx is not None else hdpw << 8
    w = hgw * hdpw
    h = hgh * hdph
    bits = (n_patterns - 1).bit_length()
    gray = np.asarray(gray, np.int64).copy()
    skip = None
    if enable_skip:
        # same §6.6.5.1 predicate as the decoder: cells rendering
        # entirely outside the region are never coded
        mgs = np.arange(hgh)[:, None]
        ngs = np.arange(hgw)[None, :]
        xs_ = (hgx + mgs * hry + ngs * hrx) >> 8
        ys_ = (hgy + mgs * hrx - ngs * hry) >> 8
        skip = (
            (xs_ + hdpw <= 0) | (xs_ >= w) | (ys_ + hdph <= 0) | (ys_ >= h)
        ).astype(np.uint8)
        gray[skip.astype(bool)] = 0
    body = bytearray(region_info(w, h, x, y, op))
    body.append(
        (1 if flags_mmr else 0) | (template << 1)
        | (int(enable_skip) << 3) | (comb_op << 4) | (def_pixel << 7)
    )
    body += struct.pack(">IIiiHH", hgw, hgh, hgx, hgy, hrx, hry)
    vb = [(gray >> j) & 1 for j in range(max(bits, 1))]
    if flags_mmr:
        # C.5 HMMR=1: all planes in ONE T.6 bit stream, each plane
        # EOFB-terminated, next plane continuing mid-bit
        from tests.test_ccitt import _EOL, _g4_row, _pack, _transitions

        bstr = ""
        for j in range(bits - 1, -1, -1):
            plane = vb[j] if j == bits - 1 else vb[j] ^ vb[j + 1]
            img = plane.astype(bool)
            ref: list[int] = []
            for yy in range(hgh):
                curr = _transitions(img[yy])
                bstr += _g4_row(curr, ref, hgw)
                ref = curr
            bstr += _EOL + _EOL
        body += _pack(bstr)
    else:
        enc = MQEncoder()
        cx = new_gb_stats(template)
        at = [(3 if template <= 1 else 2, -1), (-3, -1), (2, -2), (-2, -2)]
        at = at[: 4 if template == 0 else 1]
        for j in range(bits - 1, -1, -1):
            plane = vb[j] if j == bits - 1 else vb[j] ^ vb[j + 1]
            enc_generic(
                enc, cx, plane.astype(np.uint8), template, at, skip=skip
            )
        body += enc.flush()
    return seg(number, typ, list(referred), 1, bytes(body))


def _dot_patterns(n, size=4, seed=3):
    """n square patterns of increasing ink density (a real halftone
    cell ramp), density-distinct so wrong indexing is visible."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(size * size)
    pats = []
    for i in range(n):
        ink = np.zeros(size * size, np.uint8)
        ink[order[: (i * size * size) // max(n - 1, 1)]] = 1
        pats.append(ink.reshape(size, size))
    return pats


def _render_halftone(gray, pats, w, h, def_pixel=0, comb_op=0):
    """Independent renderer: rectangular grid, pattern pitch."""
    hdph, hdpw = pats[0].shape
    bm = np.full((h, w), def_pixel, np.uint8)
    for mg in range(gray.shape[0]):
        for ng in range(gray.shape[1]):
            px, py = ng * hdpw, mg * hdph
            pat = pats[min(int(gray[mg, ng]), len(pats) - 1)]
            dst = bm[py : py + hdph, px : px + hdpw]
            if comb_op == 0:
                dst |= pat[: dst.shape[0], : dst.shape[1]]
            else:
                dst[:] = pat[: dst.shape[0], : dst.shape[1]]
    return bm


class TestHalftone:
    def test_round_trip_4_levels(self):
        rng = np.random.default_rng(60)
        pats = _dot_patterns(4)
        gray = rng.integers(0, 4, (5, 7)).astype(np.int64)
        stream = (
            page_info(7 * 4, 5 * 4)
            + pattern_dict_seg(pats)
            + halftone_region_seg(gray, 4, (4, 4))
        )
        want = _render_halftone(gray, pats, 28, 20)
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_gray_code_multiplane_5_levels(self):
        # 5 patterns -> 3 bitplanes; exercises the XOR chain (C.5.2)
        rng = np.random.default_rng(61)
        pats = _dot_patterns(5, size=3)
        gray = rng.integers(0, 5, (6, 6)).astype(np.int64)
        stream = (
            page_info(18, 18)
            + pattern_dict_seg(pats)
            + halftone_region_seg(gray, 5, (3, 3))
        )
        want = _render_halftone(gray, pats, 18, 18)
        assert np.array_equal(decode_jbig2_page(stream), want)

    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_templates(self, template):
        rng = np.random.default_rng(62 + template)
        pats = _dot_patterns(4)
        gray = rng.integers(0, 4, (4, 5)).astype(np.int64)
        stream = (
            page_info(20, 16)
            + pattern_dict_seg(pats, template=template)
            + halftone_region_seg(gray, 4, (4, 4), template=template)
        )
        want = _render_halftone(gray, pats, 20, 16)
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_mmr_pattern_dict(self):
        rng = np.random.default_rng(66)
        pats = _dot_patterns(4)
        gray = rng.integers(0, 4, (4, 4)).astype(np.int64)
        stream = (
            page_info(16, 16)
            + pattern_dict_seg(pats, mmr=True)
            + halftone_region_seg(gray, 4, (4, 4))
        )
        want = _render_halftone(gray, pats, 16, 16)
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_two_level_mmr_grayscale(self):
        # 2 patterns -> 1 bitplane: the MMR grayscale path that IS
        # supported (multi-plane MMR stays a typed error)
        from tests.test_ccitt import encode_g4

        rng = np.random.default_rng(67)
        pats = _dot_patterns(2)
        gray = rng.integers(0, 2, (4, 6)).astype(np.int64)
        body = bytearray(region_info(24, 16, 0, 0, 0))
        body.append(1)  # HMMR
        body += struct.pack(">IIiiHH", 6, 4, 0, 0, 4 << 8, 0)
        body += encode_g4(gray.astype(bool))
        stream = (
            page_info(24, 16)
            + pattern_dict_seg(pats)
            + seg(3, 22, [2], 1, bytes(body))
        )
        want = _render_halftone(gray, pats, 24, 16)
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_single_pattern_degenerate(self):
        pats = [np.ones((3, 3), np.uint8)]
        gray = np.zeros((2, 2), np.int64)
        stream = (
            page_info(6, 6)
            + pattern_dict_seg(pats)
            + halftone_region_seg(gray, 1, (3, 3))
        )
        assert np.array_equal(
            decode_jbig2_page(stream), np.ones((6, 6), np.uint8)
        )

    def test_composes_with_other_regions(self):
        # halftone + generic region on one page, both visible
        rng = np.random.default_rng(68)
        pats = _dot_patterns(4)
        gray = rng.integers(0, 4, (3, 3)).astype(np.int64)
        mark = np.ones((4, 4), np.uint8)
        stream = (
            page_info(24, 12)
            + pattern_dict_seg(pats)
            + halftone_region_seg(gray, 4, (4, 4))
            + generic_region_seg(mark, number=4, x=16, y=2)
        )
        want = np.zeros((12, 24), np.uint8)
        want[:12, :12] = _render_halftone(gray, pats, 12, 12)
        want[2:6, 16:20] |= 1
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_skip_bitmap_round_trip(self):
        """r5: HENABLESKIP — the grid is shifted one cell off the left
        edge, so column 0 renders fully outside and is never coded.
        Skip and no-skip streams must decode identically (the skipped
        cells are invisible either way) but differ in length (the
        skip stream codes fewer pixels)."""
        rng = np.random.default_rng(66)
        pats = _dot_patterns(4)
        gray = rng.integers(0, 4, (4, 6)).astype(np.int64)
        w, h = 6 * 4, 4 * 4
        base = page_info(w, h) + pattern_dict_seg(pats)
        s_skip = halftone_region_seg(
            gray, 4, (4, 4), hgx=-(4 << 8), enable_skip=True
        )
        s_plain = halftone_region_seg(gray, 4, (4, 4), hgx=-(4 << 8))
        got_skip = decode_jbig2_page(base + s_skip)
        got_plain = decode_jbig2_page(base + s_plain)
        want = np.zeros((h, w), np.uint8)
        want[:, : 5 * 4] = _render_halftone(gray[:, 1:], pats, 20, 16)
        assert np.array_equal(got_skip, want)
        assert np.array_equal(got_plain, want)
        assert len(s_skip) != len(s_plain)

    def test_mmr_grayscale_multi_plane(self):
        """r5: HMMR=1 — two gray-code bitplanes share one T.6 stream
        (per-plane EOFB, mid-bit continuation)."""
        rng = np.random.default_rng(67)
        pats = _dot_patterns(4)
        gray = rng.integers(0, 4, (5, 7)).astype(np.int64)
        stream = (
            page_info(28, 20)
            + pattern_dict_seg(pats)
            + halftone_region_seg(gray, 4, (4, 4), flags_mmr=True)
        )
        want = _render_halftone(gray, pats, 28, 20)
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_mmr_grayscale_single_plane(self):
        pats = _dot_patterns(2, size=3, seed=8)
        gray = (np.indices((4, 5)).sum(0) & 1).astype(np.int64)
        stream = (
            page_info(15, 12)
            + pattern_dict_seg(pats, mmr=True)
            + halftone_region_seg(gray, 2, (3, 3), flags_mmr=True)
        )
        want = _render_halftone(gray, pats, 15, 12)
        assert np.array_equal(decode_jbig2_page(stream), want)

    def test_typed_boundaries(self):
        pats = _dot_patterns(4)
        gray = np.zeros((2, 2), np.int64)
        base = page_info(8, 8) + pattern_dict_seg(pats)
        # an intermediate halftone (type 20) decodes but does not
        # compose — alone on a page it leaves no region segments
        with pytest.raises(ValueError, match="no region"):
            decode_jbig2_page(
                base + halftone_region_seg(gray, 4, (4, 4), typ=20)
            )
        # skip + MMR is forbidden by §7.4.5.1.1
        with pytest.raises(ValueError, match="HENABLESKIP"):
            decode_jbig2_page(
                base + halftone_region_seg(
                    gray, 4, (4, 4), flags_mmr=True, enable_skip=True
                )
            )
        # region with no referred pattern dictionary
        with pytest.raises(ValueError, match="pattern"):
            decode_jbig2_page(
                page_info(8, 8)
                + halftone_region_seg(gray, 4, (4, 4), referred=())
            )


class TestContinuationFuzz:
    """Corruption fuzz over the r5-continuation streams: aggregates,
    intermediate regions, Huffman refinement — typed errors only."""

    def _mutate_and_decode(self, base, rng, n=120):
        for _ in range(n):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = int(
                    rng.integers(0, 256))
            try:
                decode_jbig2_page(bytes(buf))
            except (ValueError, NotImplementedError, IndexError,
                    struct.error, KeyError):
                pass

    def test_aggregate_dict_fuzz(self):
        rng = np.random.default_rng(93)
        g = _glyph("A")
        gh, gw = g.shape
        sd1, o1, _gb = symbol_dict_seg([g], number=2)
        sd2, new_syms = agg_symbol_dict_seg(
            [("agg", 2 * gw + 1, gh, [(0, 0, None), (gw + 1, 0, None)])],
            o1, number=3, input_refs=(2,),
        )
        tr = text_region_seg(2 * gw + 1, gh, [(0, [(0, 0, 0)])],
                             new_syms, number=4, refs=(3,))
        self._mutate_and_decode(
            page_info(2 * gw + 1, gh) + sd1 + sd2 + tr, rng)

    def test_intermediate_chain_fuzz(self):
        rng = np.random.default_rng(94)
        bm = _textlike(10, 14, seed=95)
        tgt = bm.copy()
        tgt[0, 0] ^= 1
        base = (
            page_info(14, 10)
            + generic_region_seg(bm, number=2, typ=36)
            + refinement_region_seg(tgt, bm, number=3, refs=(2,))
        )
        self._mutate_and_decode(base, rng)

    def test_huffman_refagg_fuzz(self):
        rng = np.random.default_rng(96)
        g = _glyph("B")
        gh, gw = g.shape
        sd1, o1 = huff_symbol_dict_seg([g], number=2)
        sd2, o2 = huff_refagg_symbol_dict_seg(
            [("ref", o1[0], 0, 0, 0)], o1, number=3, input_refs=(2,))
        tr = huff_text_region_seg(
            gw, gh, [(0, [(0, 0, 0, (o1[0], 0, 0))])], o2,
            number=4, refs=(3,), refine=True,
        )
        self._mutate_and_decode(page_info(gw, gh) + sd1 + sd2 + tr, rng)
