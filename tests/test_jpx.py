"""JPEG 2000 (T.800) decoder tests.

No JPEG 2000 codec exists in this container, so the evidence tier
matches extract/ccitt.py and extract/jbig2.py: this file carries an
independent in-test ENCODER — forward 5/3 DWT and RCT, a full EBCOT
tier-1 encoder over the in-test MQ encoder (shared with
tests/test_jbig2.py where the coder has bidirectional round-trip
coverage), tag-tree and bit-stuffed packet-header writers, and the
marker layer — and every reversible-profile stream it produces must
decode to the exact source pixels (reversible = strict oracle).
Context tables and band geometry are pinned structurally; the PDF
JPXDecode plumbing runs end-to-end through extract_pdf_image_arrays
and OCR.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from receipt_scanner_spark.extract import jpx
from receipt_scanner_spark.extract.jpx import _ZC, decode_jpx, new_mq_contexts
from tests.test_jbig2 import MQEncoder

# ---------------------------------------------------------------------------
# forward transforms
# ---------------------------------------------------------------------------


def fwd_53_1d(x: np.ndarray, parity: int = 0):
    """Forward 5/3 along axis 0 (mirror of jpx._inv_53_1d).  ``parity``
    is the absolute parity of the interval origin: absolute-odd samples
    feed the H band, so an odd origin puts LOCAL index 0 in H."""
    n = x.shape[0]
    x = x.astype(np.int64)
    if n == 1:
        if parity == 0:
            return x, x[:0]
        return x[:0], x * 2  # single odd sample doubles (inverse halves)

    def at(idx):
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx > n - 1, 2 * (n - 1) - idx, idx)
        return x[idx]

    od = np.arange(1 - parity, n, 2)  # absolute-odd local indices
    ev = np.arange(parity, n, 2)  # absolute-even local indices
    hi = x[od] - ((at(od - 1) + at(od + 1)) >> 1)

    # neighbors in the HI array: reflection preserves absolute parity,
    # so every reflected even±1 position maps to an H-band slot
    def hival(pos):
        pos = np.where(pos < 0, -pos, pos)
        pos = np.where(pos > n - 1, 2 * (n - 1) - pos, pos)
        return hi[(pos - (1 - parity)) // 2]

    lo = x[ev] + ((hival(ev - 1) + hival(ev + 1) + 2) >> 2)
    return lo, hi


def fwd_53_2d(img: np.ndarray, px: int = 0, py: int = 0):
    """One analysis level: vertical split then horizontal (the exact
    mirror of jpx._inv_53_2d's horizontal-then-vertical synthesis);
    ``px``/``py`` are the parities of this level's rect origin."""
    lo_v, hi_v = fwd_53_1d(img, py)
    ll, hl = (a.T for a in fwd_53_1d(lo_v.T, px))
    lh, hh = (a.T for a in fwd_53_1d(hi_v.T, px))
    return ll, hl, lh, hh


# ---------------------------------------------------------------------------
# EBCOT tier-1 encoder (mirror of jpx.decode_codeblock)
# ---------------------------------------------------------------------------


class RawBitWriter:
    """Encoder mirror of jpx._RawBits: MSB-first raw bits with the
    0xFF stuffing rule (after emitting an 0xFF, the next byte carries
    only 7 data bits under a stuffed-0 MSB)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0
        self.limit = 8

    def put(self, bit):
        self.cur = (self.cur << 1) | bit
        self.nbits += 1
        if self.nbits == self.limit:
            self._emit()

    def _emit(self):
        b = self.cur & ((1 << self.limit) - 1)
        self.out.append(b)
        self.limit = 7 if b == 0xFF else 8
        self.cur = 0
        self.nbits = 0

    def flush(self):
        if self.nbits:
            self.cur <<= self.limit - self.nbits
            self.nbits = self.limit
            self._emit()
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)  # a segment must not end in 0xFF
        return bytes(self.out)


def _split_passes(style: int, n: int):
    """Per-segment pass counts for a block coded in one layer (the
    capacity sequence of jpx._seg_cap filled greedily)."""
    out, i = [], 0
    while n:
        k = min(n, jpx._seg_cap(style, i))
        out.append(k)
        n -= k
        i += 1
    return out


def encode_codeblock(vals: np.ndarray, mb: int, orient: str, style: int = 0):
    """Returns (codeword segments, n_passes, zbp) for one code block.
    ``style`` mirrors the SPcod block-style byte handled by
    jpx.decode_codeblock (bypass / reset / termall / causal /
    segsym)."""
    h, w = vals.shape
    mag_true = np.abs(vals).astype(np.int64)
    sgn_true = np.sign(vals).astype(np.int8)
    maxmag = int(mag_true.max())
    if maxmag == 0:
        return [], 0, mb  # nothing coded; zbp = all planes empty
    n_bp = maxmag.bit_length()
    if n_bp > mb:
        raise ValueError("magnitude exceeds band bitplanes")
    zbp = mb - n_bp
    n_passes = 3 * n_bp - 2
    bypass = bool(style & 0x01)
    reset = bool(style & 0x02)
    termall = bool(style & 0x04)
    causal = bool(style & 0x08)
    segsym = bool(style & 0x20)
    cx = new_mq_contexts()
    zc = _ZC[orient]
    sig = np.zeros((h + 2, w + 2), np.int8)
    sgn = np.zeros((h + 2, w + 2), np.int8)
    visited = np.zeros((h, w), np.int8)
    refined = np.zeros((h, w), np.int8)

    def neighbors(y, x):
        yy, xx = y + 1, x + 1
        hcount = int(sig[yy, xx - 1]) + int(sig[yy, xx + 1])
        if causal and (y & 3) == 3:
            vcount = int(sig[yy - 1, xx])
            dcount = int(sig[yy - 1, xx - 1]) + int(sig[yy - 1, xx + 1])
        else:
            vcount = int(sig[yy - 1, xx]) + int(sig[yy + 1, xx])
            dcount = (
                int(sig[yy - 1, xx - 1]) + int(sig[yy - 1, xx + 1])
                + int(sig[yy + 1, xx - 1]) + int(sig[yy + 1, xx + 1])
            )
        return hcount, vcount, dcount

    def encode_sign(y, x, enc):
        yy, xx = y + 1, x + 1
        hc = max(-1, min(1, int(sgn[yy, xx - 1]) + int(sgn[yy, xx + 1])))
        if causal and (y & 3) == 3:
            vc = max(-1, min(1, int(sgn[yy - 1, xx])))
        else:
            vc = max(
                -1, min(1, int(sgn[yy - 1, xx]) + int(sgn[yy + 1, xx]))
            )
        ctx, flip = jpx._SC[(hc, vc)]
        s = 1 if sgn_true[y, x] < 0 else 0
        enc.encode(cx, ctx, s ^ flip)
        sgn[yy, xx] = sgn_true[y, x]
        sig[yy, xx] = 1

    def sp_pass(bit, enc, raw):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    visited[y, x] = 0
                    if sig[y + 1, x + 1]:
                        continue
                    hc, vc, dc = neighbors(y, x)
                    if hc + vc + dc == 0:
                        continue
                    visited[y, x] = 1
                    b = 1 if mag_true[y, x] & bit else 0
                    if raw:
                        enc.put(b)
                        if b:
                            enc.put(1 if sgn_true[y, x] < 0 else 0)
                            sgn[y + 1, x + 1] = sgn_true[y, x]
                            sig[y + 1, x + 1] = 1
                    else:
                        enc.encode(cx, zc[(hc, vc, min(dc, 4))], b)
                        if b:
                            encode_sign(y, x, enc)

    def mr_pass(bit, enc, raw):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if not sig[y + 1, x + 1] or visited[y, x]:
                        continue
                    b = 1 if mag_true[y, x] & bit else 0
                    if raw:
                        enc.put(b)
                    else:
                        if not refined[y, x]:
                            hc, vc, dc = neighbors(y, x)
                            ctx = 15 if hc + vc + dc else 14
                            refined[y, x] = 1
                        else:
                            ctx = 16
                        enc.encode(cx, ctx, b)
                    visited[y, x] = 1

    def cl_pass(bit, enc):
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                ylim = min(y0 + 4, h)
                if (
                    ylim - y0 == 4
                    and not any(visited[y0 : y0 + 4, x])
                    and not any(sig[y0 + 1 : y0 + 5, x + 1])
                    and all(
                        neighbors(yy, x) == (0, 0, 0)
                        for yy in range(y0, y0 + 4)
                    )
                ):
                    firsts = [
                        yy for yy in range(y0, ylim)
                        if mag_true[yy, x] & bit
                    ]
                    if not firsts:
                        enc.encode(cx, 17, 0)
                        for yy in range(y0, ylim):
                            visited[yy, x] = 0
                        continue
                    enc.encode(cx, 17, 1)
                    pos = firsts[0] - y0
                    enc.encode(cx, 18, (pos >> 1) & 1)
                    enc.encode(cx, 18, pos & 1)
                    y = firsts[0]
                    encode_sign(y, x, enc)
                    y += 1
                while y < ylim:
                    if not sig[y + 1, x + 1] and not visited[y, x]:
                        hc, vc, dc = neighbors(y, x)
                        b = 1 if mag_true[y, x] & bit else 0
                        enc.encode(cx, zc[(hc, vc, min(dc, 4))], b)
                        if b:
                            encode_sign(y, x, enc)
                    visited[y, x] = 0
                    y += 1
                for yy in range(y0, ylim):
                    visited[yy, x] = 0

    segs = []
    enc = None
    for pi in range(n_passes):
        pt = 2 if pi == 0 else (pi - 1) % 3
        b_ord = 0 if pi == 0 else (pi + 2) // 3
        bit = 1 << (n_bp - 1 - b_ord)
        raw = bypass and pi >= 10 and pt != 2
        if enc is None:
            enc = RawBitWriter() if raw else MQEncoder()
        if pt == 0:
            sp_pass(bit, enc, raw)
        elif pt == 1:
            mr_pass(bit, enc, raw)
        else:
            cl_pass(bit, enc)
            if segsym:
                for b in (1, 0, 1, 0):
                    enc.encode(cx, 18, b)
        if reset:
            cx[:] = new_mq_contexts()
        if (
            pi == n_passes - 1
            or termall
            or (bypass and (pi == 9 or (pi > 9 and pt != 0)))
        ):
            segs.append(enc.flush())
            enc = None
    return segs, n_passes, zbp


# ---------------------------------------------------------------------------
# tag tree + packet header writers
# ---------------------------------------------------------------------------


class BitPacker:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _room(self):
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def put(self, b):
        self.acc = (self.acc << 1) | b
        self.nbits += 1
        if self.nbits == self._room():
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def put_bits(self, v, n):
        for k in range(n - 1, -1, -1):
            self.put((v >> k) & 1)

    def flush(self):
        if self.nbits:
            room = self._room()
            self.acc <<= room - self.nbits
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class TagTreeEnc:
    def __init__(self, w, h, leaves):
        self.levels = []
        while True:
            self.levels.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        self.levels.reverse()
        vals = np.array(leaves, np.int32)
        self.truth = [None] * len(self.levels)
        self.truth[-1] = vals
        for li in range(len(self.levels) - 2, -1, -1):
            ww, hh = self.levels[li]
            child = self.truth[li + 1]
            t = np.zeros((hh, ww), np.int32)
            for y in range(hh):
                for x in range(ww):
                    t[y, x] = child[
                        2 * y : 2 * y + 2, 2 * x : 2 * x + 2
                    ].min()
            self.truth[li] = t
        self.value = [np.zeros((hh, ww), np.int32) for ww, hh in self.levels]
        self.known = [np.zeros((hh, ww), np.int32) for ww, hh in self.levels]

    def encode(self, bp: BitPacker, x, y, threshold):
        low = 0
        n = len(self.levels)
        for li in range(n):
            shift = n - 1 - li
            xx, yy = x >> shift, y >> shift
            if self.value[li][yy, xx] < low:
                self.value[li][yy, xx] = low
            tv = int(self.truth[li][yy, xx])
            while (
                not self.known[li][yy, xx]
                and self.value[li][yy, xx] < threshold
            ):
                if self.value[li][yy, xx] == tv:
                    bp.put(1)
                    self.known[li][yy, xx] = 1
                else:
                    bp.put(0)
                    self.value[li][yy, xx] += 1
            if not self.known[li][yy, xx]:
                return
            low = tv


# ---------------------------------------------------------------------------
# codestream assembly (single tile, single layer, LRCP)
# ---------------------------------------------------------------------------


_BAND_OFFS = {"LL": (0, 0), "HL": (1, 0), "LH": (0, 1), "HH": (1, 1)}


def _cdiv(a, b):
    return -(-a // b)


def _tile_body(tplanes, rects, coding, guard,
               prog=0, sop=False, eph=False, samplings=None, rgn=0,
               ppt=False, poc=None):
    """Encode ONE tile: tile-local forward DWT per component (tile
    origins even by construction, so the plain even/odd split is the
    spec transform), code blocks over the B.7 grid anchored at the
    band-grid origin (partial first blocks for mid-cell tile origins),
    single-layer packets in the requested progression, optionally
    wrapped in SOP/EPH markers.  ``coding``: per-component dicts with
    ``nl`` (decomposition levels), ``cb`` (code-block side), ``prec``
    ([(ppx, ppy)] per resolution — B.6 custom precincts), ``style``
    (code-block style), ``band_list`` and ``exps`` — components may
    differ (COC overrides)."""
    ncomp = len(tplanes)
    if samplings is None:
        samplings = [(1, 1)] * ncomp

    def eff_cb(c, bi):
        cd = coding[c]
        lvl, orient = cd["band_list"][bi]
        r = 0 if orient == "LL" else cd["nl"] - lvl + 1
        ppx, ppy = cd["prec"][r]
        bsh = 0 if r == 0 else 1
        return (min(cd["cb"], 1 << max(ppx - bsh, 0)),
                min(cd["cb"], 1 << max(ppy - bsh, 0)))

    comp_bands = []
    for c, (p, rect) in enumerate(zip(tplanes, rects)):
        tcx0, tcy0 = rect[0], rect[1]
        levels = []
        cur = p
        for li in range(coding[c]["nl"]):
            # analysis level li transforms the plane at scale 2^li,
            # whose origin is ceil(tcx0 / 2^li) — its parity drives
            # the even/odd band split (odd with grid offsets)
            u0 = _cdiv(tcx0, 1 << li)
            v0 = _cdiv(tcy0, 1 << li)
            ll, hl, lh, hh = fwd_53_2d(cur, u0 & 1, v0 & 1)
            levels.append((hl, lh, hh))
            cur = ll
        bands = {"LL": cur}
        for li, (hl, lh, hh) in enumerate(levels):
            bands[(li + 1, "HL")] = hl
            bands[(li + 1, "LH")] = lh
            bands[(li + 1, "HH")] = hh
        comp_bands.append(bands)

    def band_rect(c, lvl, orient):
        tcx0, tcy0, tcx1, tcy1 = rects[c]
        xob, yob = _BAND_OFFS[orient]
        s, h2 = 1 << lvl, 1 << (lvl - 1)
        return (
            _cdiv(tcx0 - h2 * xob, s), _cdiv(tcy0 - h2 * yob, s),
            _cdiv(tcx1 - h2 * xob, s), _cdiv(tcy1 - h2 * yob, s),
        )

    # encode all code blocks
    encoded = {}  # (c, bi, bx, by) -> (data, passes, zbp)
    grids = {}  # (c, bi) -> (m0x, m0y, nbx, nby)
    for c in range(ncomp):
        for bi, (lvl, orient) in enumerate(coding[c]["band_list"]):
            arr = (
                comp_bands[c]["LL"] if orient == "LL"
                else comp_bands[c][(lvl, orient)]
            )
            bx0, by0, bx1, by1 = band_rect(c, lvl, orient)
            assert arr.shape == (by1 - by0, bx1 - bx0), (
                arr.shape, (by1 - by0, bx1 - bx0), lvl, orient
            )
            if rgn and c == 0:
                # maxshift ROI covering all of component 0: every
                # coefficient upshifts by SPrgn (the decoder's H.2
                # rule downshifts anything >= 2^SPrgn)
                arr = arr << rgn
            mb = guard + coding[c]["exps"][bi] - 1 + (rgn if c == 0 else 0)
            cbw, cbh = eff_cb(c, bi)
            if bx1 > bx0 and by1 > by0:
                m0x, m0y = bx0 // cbw, by0 // cbh
                nbx, nby = _cdiv(bx1, cbw) - m0x, _cdiv(by1, cbh) - m0y
            else:
                m0x = m0y = nbx = nby = 0
            grids[(c, bi)] = (m0x, m0y, nbx, nby)
            for by in range(nby):
                for bx in range(nbx):
                    gx, gy = m0x + bx, m0y + by
                    xa, xb = max(bx0, gx * cbw), min(bx1, (gx + 1) * cbw)
                    ya, yb = max(by0, gy * cbh), min(by1, (gy + 1) * cbh)
                    blkv = arr[ya - by0 : yb - by0, xa - bx0 : xb - bx0]
                    segs, np_, zbp = encode_codeblock(
                        blkv, mb, orient, style=coding[c]["style"]
                    )
                    encoded[(c, bi, bx, by)] = (segs, np_, zbp)

    # precinct cells + reference-grid emission anchors per (c, r)
    cells_all, anchors_all = {}, {}
    for c in range(ncomp):
        tcx0, tcy0, tcx1, tcy1 = rects[c]
        xr, yr = samplings[c]
        nl = coding[c]["nl"]
        for r in range(nl + 1):
            ppx, ppy = coding[c]["prec"][r]
            sh = 1 << (nl - r)
            trx0, try0 = _cdiv(tcx0, sh), _cdiv(tcy0, sh)
            trx1, try1 = _cdiv(tcx1, sh), _cdiv(tcy1, sh)
            if trx0 < trx1 and try0 < try1:
                ki0, kj0 = trx0 >> ppx, try0 >> ppy
                npw = _cdiv(trx1, 1 << ppx) - ki0
                nph = _cdiv(try1, 1 << ppy) - kj0
            else:
                ki0 = kj0 = npw = nph = 0
            cells = [
                (ki0 + i, kj0 + j) for j in range(nph) for i in range(npw)
            ]
            cells_all[(c, r)] = cells
            anchors_all[(c, r)] = [
                (max(tcx0 * xr, (kx << ppx) * sh * xr),
                 max(tcy0 * yr, (ky << ppy) * sh * yr))
                for kx, ky in cells
            ]

    # packets: single layer, per precinct.  LRCP/RLCP collapse to
    # r-outer c-inner precinct-raster; position orders sort by the
    # emission anchors (B.12.1.3-5).  Components lacking a resolution
    # contribute no packets there (B.12)
    max_nl = max(coding[c]["nl"] for c in range(ncomp))

    def entries_between(rs0, re1, cs0, ce1):
        return [
            (c, r, p, a[0], a[1])
            for r in range(rs0, min(re1, max_nl + 1))
            for c in range(cs0, min(ce1, ncomp))
            if r <= coding[c]["nl"]
            for p, a in enumerate(anchors_all[(c, r)])
        ]

    def sort_seg(ents, pk):
        if pk in (0, 1):  # single layer: LRCP == RLCP == r/c raster
            return ents
        if pk == 2:  # RPCL
            return sorted(ents, key=lambda e: (e[1], e[4], e[3], e[0]))
        if pk == 3:  # PCRL
            return sorted(ents, key=lambda e: (e[4], e[3], e[0], e[1]))
        return sorted(ents, key=lambda e: (e[0], e[4], e[3], e[1]))

    if poc:
        # A.6.6: emit each progression volume in its own order,
        # skipping packets already emitted (single layer here)
        order, seen = [], set()
        for rs0, cs0, _ly1, re1, ce1, pk in poc:
            for t in sort_seg(entries_between(rs0, re1, cs0, ce1), pk):
                if t[:3] not in seen:
                    seen.add(t[:3])
                    order.append(t)
    else:
        order = sort_seg(entries_between(0, max_nl + 1, 0, ncomp), prog)
    body = bytearray()
    hdr_ppt = bytearray()  # packet headers when ppt=True (A.7.5)
    nsop = 0
    for c, r, p, _ax, _ay in order:
        if True:
            bis = [0] if r == 0 else [1 + (r - 1) * 3 + k for k in range(3)]
            bp = BitPacker()
            bp.put(1)  # non-empty packet
            chunks = []
            for bi in bis:
                m0x, m0y, nbx, nby = grids[(c, bi)]
                if not nbx or not nby:
                    continue
                # this precinct's block sub-grid within the band
                lvl, orient = coding[c]["band_list"][bi]
                bx0, by0, bx1, by1 = band_rect(c, lvl, orient)
                ppx, ppy = coding[c]["prec"][r]
                bsh = 0 if r == 0 else 1
                pw, ph = 1 << max(ppx - bsh, 0), 1 << max(ppy - bsh, 0)
                kx, ky = cells_all[(c, r)][p]
                px0, py0 = max(bx0, kx * pw), max(by0, ky * ph)
                px1 = min(bx1, (kx + 1) * pw)
                py1 = min(by1, (ky + 1) * ph)
                if px0 >= px1 or py0 >= py1:
                    continue
                cbw, cbh = eff_cb(c, bi)
                gx0, gy0 = px0 // cbw, py0 // cbh
                pnbx = _cdiv(px1, cbw) - gx0
                pnby = _cdiv(py1, cbh) - gy0
                # block coords relative to the band grid
                ox, oy = gx0 - m0x, gy0 - m0y

                def enc_of(x, y):
                    return encoded[(c, bi, ox + x, oy + y)]

                inc_tree = TagTreeEnc(pnbx, pnby, np.zeros((pnby, pnbx)))
                zbp_tree = TagTreeEnc(
                    pnbx, pnby,
                    np.array(
                        [[enc_of(x, y)[2] for x in range(pnbx)]
                         for y in range(pnby)]
                    ),
                )
                for by in range(pnby):
                    for bx in range(pnbx):
                        segs, np_, zbp = enc_of(bx, by)
                        if np_ == 0:
                            # all-zero block: "not included" still needs
                            # the inclusion tag bits
                            inc_tree.truth[-1][by, bx] = 1
                            # rebuild parents
                            for li in range(len(inc_tree.levels) - 2, -1, -1):
                                ww, hh = inc_tree.levels[li]
                                ch_ = inc_tree.truth[li + 1]
                                for yy in range(hh):
                                    for xx in range(ww):
                                        inc_tree.truth[li][yy, xx] = ch_[
                                            2 * yy : 2 * yy + 2,
                                            2 * xx : 2 * xx + 2,
                                        ].min()
                for by in range(pnby):
                    for bx in range(pnbx):
                        segs, np_, zbp = enc_of(bx, by)
                        inc_tree.encode(bp, bx, by, 1)
                        if np_ == 0:
                            continue
                        t = 1
                        while not int(zbp_tree.truth[-1][by, bx]) < t:
                            zbp_tree.encode(bp, bx, by, t)
                            t += 1
                        zbp_tree.encode(bp, bx, by, t)
                        # pass count codeword
                        if np_ == 1:
                            bp.put(0)
                        elif np_ == 2:
                            bp.put_bits(0b10, 2)
                        elif np_ <= 5:
                            bp.put_bits(0b11, 2)
                            bp.put_bits(np_ - 3, 2)
                        elif np_ <= 36:
                            bp.put_bits(0b1111, 4)
                            bp.put_bits(np_ - 6, 5)
                        else:
                            bp.put_bits(0b1111, 4)
                            bp.put_bits(31, 5)
                            bp.put_bits(np_ - 37, 7)
                        # Lblock: grow until every segment length fits
                        # (B.10.7.2: one length per codeword segment,
                        # each with lb + floor(log2(seg passes)) bits)
                        ksplit = _split_passes(coding[c]["style"], np_)
                        assert len(ksplit) == len(segs), (ksplit, segs)
                        lb = 3
                        need = max(
                            len(s).bit_length() - (k.bit_length() - 1)
                            for s, k in zip(segs, ksplit)
                        )
                        while lb < need:
                            bp.put(1)
                            lb += 1
                        bp.put(0)
                        for s, k in zip(segs, ksplit):
                            bp.put_bits(len(s), lb + k.bit_length() - 1)
                            chunks.append(s)
            if sop:
                body += b"\xff\x91\x00\x04" + struct.pack(">H", nsop & 0xFFFF)
                nsop += 1
            # PPT (A.7.5): headers (and EPH) go to the packed stream,
            # the SOD body keeps only packet bodies (and SOP markers)
            hout = hdr_ppt if ppt else body
            hout += bp.flush()
            if eph:
                hout += b"\xff\x92"
            for d in chunks:
                body += d
    if ppt:
        return bytes(body), bytes(hdr_ppt)
    return bytes(body)


def _assemble_codestream(
    planes, samplings, w, h, n_levels, cb_exp, mct, guard, depth, tile,
    prog=0, sop=False, eph=False, prec=None, cb_style=0, offsets=None,
    rgn=0, coc=None, tile_ov=None, ppt=False, ppm=False, poc=None,
    tile_poc=None,
):
    """SIZ/COD/QCD + one SOT/SOD tile-part per tile of the ``tile``
    grid (whole image when None).  ``planes`` are level-shifted int64
    arrays, each at its component's sub-sampled IMAGE-AREA size;
    ``offsets`` = (XOsiz, YOsiz, XTOsiz, YTOsiz) places the w x h
    image area on the reference grid (B.3); ``rgn`` emits a maxshift
    RGN for component 0 (matching _tile_body's upshift).  ``coc``:
    {comp: {"nl"|"cb_exp"|"style"|"prec": ...}} per-component coding
    overrides (A.6.2) — emits a COC marker per entry plus a matching
    QCC, since an override changing the decomposition depth changes
    the component's band structure and exponent list."""
    ncomp = len(planes)
    gains = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}

    def make_coding(nl, cbe, style, prec_c):
        bl = [(nl, "LL")]
        for rr in range(1, nl + 1):
            lvl = nl - rr + 1
            bl += [(lvl, "HL"), (lvl, "LH"), (lvl, "HH")]
        return {
            "nl": nl, "cb": 1 << (cbe + 2), "cb_exp": cbe,
            "style": style,
            "prec": list(prec_c) if prec_c else [(15, 15)] * (nl + 1),
            "has_prec": bool(prec_c),
            "band_list": bl,
            "exps": [depth + gains[orient] for _lvl, orient in bl],
        }

    default_cd = make_coding(n_levels, cb_exp, cb_style, prec)
    coding = [default_cd] * ncomp
    for c, ov in (coc or {}).items():
        coding[c] = make_coding(
            ov.get("nl", n_levels), ov.get("cb_exp", cb_exp),
            ov.get("style", cb_style), ov.get("prec"),
        )

    xo, yo, xto, yto = offsets if offsets else (0, 0, 0, 0)
    xsiz, ysiz = xo + w, yo + h
    xt, yt = tile if tile else (xsiz - xto, ysiz - yto)
    ntx, nty = _cdiv(xsiz - xto, xt), _cdiv(ysiz - yto, yt)
    bodies = []  # (tile-part header marker bytes, SOD body)
    ppm_chunks = []  # per tile-part packed headers when ppm
    for ty in range(nty):
        for tx in range(ntx):
            tx0 = max(xto + tx * xt, xo)
            ty0 = max(yto + ty * yt, yo)
            tx1 = min(xto + (tx + 1) * xt, xsiz)
            ty1 = min(yto + (ty + 1) * yt, ysiz)
            rects, tplanes = [], []
            for c in range(ncomp):
                xr, yr = samplings[c]
                rc = (
                    _cdiv(tx0, xr), _cdiv(ty0, yr),
                    _cdiv(tx1, xr), _cdiv(ty1, yr),
                )
                rects.append(rc)
                cox, coy = _cdiv(xo, xr), _cdiv(yo, yr)
                tplanes.append(
                    planes[c][rc[1] - coy : rc[3] - coy,
                              rc[0] - cox : rc[2] - cox]
                )
            # per-tile override (A.4.2): this tile's first tile-part
            # header carries its own COD + QCD, displacing the main
            # header (and any main COCs) for every component of the
            # tile — mirrors the decoder's Table A.10/A.11 precedence
            ov = (tile_ov or {}).get(len(bodies))
            t_mct = ov.get("mct", mct) if ov else mct
            if t_mct and not mct and ncomp == 3:
                # per-tile MCT (A.4.2 + A.6.1): forward RCT on this
                # tile's planes only — the decoder inverts per tile
                r_, g_, b_ = tplanes
                tplanes = [(r_ + 2 * g_ + b_) >> 2, b_ - g_, r_ - g_]
            if ov:
                cd = make_coding(
                    ov.get("nl", n_levels), ov.get("cb_exp", cb_exp),
                    ov.get("style", cb_style), ov.get("prec"),
                )
                t_coding = [cd] * ncomp
                tscod = ((2 if sop else 0) | (4 if eph else 0)
                         | (1 if cd["has_prec"] else 0))
                tcod = bytes([tscod, prog]) + struct.pack(">H", 1) + bytes(
                    [1 if t_mct else 0, cd["nl"], cd["cb_exp"],
                     cd["cb_exp"], cd["style"], 1]
                )
                if cd["has_prec"]:
                    tcod += bytes((py << 4) | px for px, py in cd["prec"])
                hdr = b"\xff\x52" + struct.pack(">H", 2 + len(tcod)) + tcod
                tqcd = bytes([guard << 5]) + bytes(
                    (e << 3) & 0xFF for e in cd["exps"]
                )
                hdr += b"\xff\x5c" + struct.pack(">H", 2 + len(tqcd)) + tqcd
            else:
                t_coding, hdr = coding, b""
            t_poc = (tile_poc or {}).get(len(bodies))
            eff_poc = t_poc if t_poc is not None else poc
            if t_poc is not None:
                # tile-part POC supersedes the main-header POC (A.6.6)
                pdata = b"".join(
                    bytes([rs0, cs0]) + struct.pack(">H", ly1)
                    + bytes([re1, ce1, pk])
                    for rs0, cs0, ly1, re1, ce1, pk in t_poc
                )
                hdr = (hdr + b"\xff\x5f"
                       + struct.pack(">H", 2 + len(pdata)) + pdata)
            if ppt or ppm:
                # packed packet headers: PPT segment(s) join this
                # tile's first tile-part header — or, with ppm, the
                # per-tile-part (Nppm, headers) chunks collect for the
                # main-header PPM segment(s); an int forces a small
                # split size to exercise multi-Z reassembly
                tb, ph = _tile_body(
                    tplanes, rects, t_coding, guard,
                    prog=prog, sop=sop, eph=eph,
                    samplings=samplings, rgn=rgn, ppt=True,
                    poc=eff_poc,
                )
                if ppm:
                    ppm_chunks.append(ph)
                    bodies.append((hdr, tb))
                else:
                    split = (ppt if isinstance(ppt, int)
                             and not isinstance(ppt, bool)
                             else max(len(ph), 1))
                    zppt = 0
                    psegs = b""
                    for i in range(0, max(len(ph), 1), split):
                        chunk = ph[i : i + split]
                        psegs += (b"\xff\x61"
                                  + struct.pack(">H", 3 + len(chunk))
                                  + bytes([zppt]) + chunk)
                        zppt += 1
                    bodies.append((hdr + psegs, tb))
            else:
                bodies.append((hdr, _tile_body(
                    tplanes, rects, t_coding, guard,
                    prog=prog, sop=sop, eph=eph,
                    samplings=samplings, rgn=rgn, poc=eff_poc,
                )))

    out = bytearray(b"\xff\x4f")
    siz = struct.pack(
        ">HIIIIIIIIH", 0, xsiz, ysiz, xo, yo, xt, yt, xto, yto, ncomp
    ) + b"".join(
        struct.pack(">BBB", depth - 1, sx, sy) for sx, sy in samplings
    )
    out += b"\xff\x51" + struct.pack(">H", 2 + len(siz)) + siz
    if rgn:
        # RGN (A.6.3): Crgn=0, Srgn=0 (maxshift), SPrgn=rgn
        out += b"\xff\x5e" + struct.pack(">HBBB", 5, 0, 0, rgn)
    scod = (2 if sop else 0) | (4 if eph else 0) | (1 if prec else 0)
    cod = bytes([scod, prog]) + struct.pack(">H", 1) + bytes(
        [1 if mct else 0, n_levels, cb_exp, cb_exp, cb_style, 1]
    )
    if prec:
        assert len(prec) == n_levels + 1
        cod += bytes((py << 4) | px for px, py in prec)
    out += b"\xff\x52" + struct.pack(">H", 2 + len(cod)) + cod
    if poc:
        pdata = b"".join(
            bytes([rs0, cs0]) + struct.pack(">H", ly1)
            + bytes([re1, ce1, pk])
            for rs0, cs0, ly1, re1, ce1, pk in poc
        )
        out += b"\xff\x5f" + struct.pack(">H", 2 + len(pdata)) + pdata
    for c in sorted(coc or {}):
        cd = coding[c]
        scoc = 1 if cd["has_prec"] else 0
        body = bytes([c, scoc, cd["nl"], cd["cb_exp"], cd["cb_exp"],
                      cd["style"], 1])
        if cd["has_prec"]:
            assert len(cd["prec"]) == cd["nl"] + 1
            body += bytes((py << 4) | px for px, py in cd["prec"])
        out += b"\xff\x53" + struct.pack(">H", 2 + len(body)) + body
    if ppm:
        # A.7.4: (Nppm, packed headers) per tile-part, concatenated
        # then split across Zppm-ordered PPM segments
        data_ppm = b"".join(
            struct.pack(">I", len(ph)) + ph for ph in ppm_chunks
        )
        split = (ppm if isinstance(ppm, int) and not isinstance(ppm, bool)
                 else max(len(data_ppm), 1))
        z = 0
        for i in range(0, max(len(data_ppm), 1), split):
            chunk = data_ppm[i : i + split]
            out += (b"\xff\x60" + struct.pack(">H", 3 + len(chunk))
                    + bytes([z]) + chunk)
            z += 1
    qcd = bytes([guard << 5]) + bytes(
        (e << 3) & 0xFF for e in default_cd["exps"]
    )
    out += b"\xff\x5c" + struct.pack(">H", 2 + len(qcd)) + qcd
    for c in sorted(coc or {}):
        qb = bytes([c, guard << 5]) + bytes(
            (e << 3) & 0xFF for e in coding[c]["exps"]
        )
        out += b"\xff\x5d" + struct.pack(">H", 2 + len(qb)) + qb
    for tidx, (hdr, body) in enumerate(bodies):
        psot = 12 + len(hdr) + 2 + len(body)
        out += b"\xff\x90" + struct.pack(">HHIBB", 10, tidx, psot, 0, 1)
        out += hdr + b"\xff\x93" + body
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpx(
    img: np.ndarray, n_levels: int = 2, cb_exp: int = 4, mct: bool = False,
    guard: int = 2, depth: int = 8, tile: tuple | None = None,
    prog: int = 0, sop: bool = False, eph: bool = False,
    prec: list | None = None, cb_style: int = 0,
    offsets: tuple | None = None, rgn: int = 0, coc: dict | None = None,
    tile_ov: dict | None = None, ppt=False, ppm=False,
    poc: list | None = None, tile_poc: dict | None = None,
) -> bytes:
    """Reversible-profile encoder around the mirrored pieces above.
    ``img``: (h, w) or (h, w, 3) uint8 IMAGE-AREA content.  ``tile``:
    (xt, yt) tile grid pitch — any pitch, incl. ones that put tile
    resolution origins at odd coordinates.  ``offsets``: (XOsiz,
    YOsiz, XTOsiz, YTOsiz).  ``rgn``: maxshift ROI shift for comp 0."""
    h, w = img.shape[:2]
    ncomp = 3 if img.ndim == 3 else 1
    shift = 1 << (depth - 1)
    if ncomp == 3:
        r = img[..., 0].astype(np.int64) - shift
        g = img[..., 1].astype(np.int64) - shift
        b = img[..., 2].astype(np.int64) - shift
        if mct:
            y_ = (r + 2 * g + b) >> 2
            cb_ = b - g
            cr = r - g
            planes = [y_, cb_, cr]
        else:
            planes = [r, g, b]
    else:
        planes = [img.astype(np.int64) - shift]
        mct = False
    return _assemble_codestream(
        planes, [(1, 1)] * ncomp, w, h, n_levels, cb_exp, mct, guard,
        depth, tile, prog=prog, sop=sop, eph=eph, prec=prec,
        cb_style=cb_style, offsets=offsets, rgn=rgn, coc=coc,
        tile_ov=tile_ov, ppt=ppt, ppm=ppm, poc=poc, tile_poc=tile_poc,
    )


def encode_jpx_subsampled(
    y: np.ndarray, cbp: np.ndarray, crp: np.ndarray,
    sampling: tuple = (2, 2), n_levels: int = 2, cb_exp: int = 4,
    guard: int = 2, depth: int = 8, tile: tuple | None = None,
    coc: dict | None = None,
) -> bytes:
    """Direct luma + two chroma planes, chroma at their sub-sampled
    size ceil(full/sr) — the 4:2:0 shape real scanned archives use.
    Emits SIZ sampling factors; no codestream MCT (T.800 forbids MCT
    over mixed sampling)."""
    h, w = y.shape
    shift = 1 << (depth - 1)
    planes = [
        y.astype(np.int64) - shift,
        cbp.astype(np.int64) - shift,
        crp.astype(np.int64) - shift,
    ]
    return _assemble_codestream(
        planes, [(1, 1), sampling, sampling], w, h, n_levels, cb_exp,
        False, guard, depth, tile, coc=coc,
    )


def _luma(img):
    if img.ndim == 2:
        return img
    r, g, b = (img[..., k].astype(np.uint32) for k in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


class TestRoundTrip:
    """Reversible profile = bit-exact oracle."""

    def test_flat(self):
        px = np.full((16, 16), 128, np.uint8)
        assert np.array_equal(decode_jpx(encode_jpx(px, n_levels=1)), px)

    def test_gradient_and_noise(self):
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:40, 0:56]
        grad = np.clip(xx * 4 + yy * 2, 0, 255).astype(np.uint8)
        assert np.array_equal(decode_jpx(encode_jpx(grad)), grad)
        noise = rng.integers(0, 256, (33, 29)).astype(np.uint8)
        assert np.array_equal(decode_jpx(encode_jpx(noise)), noise)

    @pytest.mark.parametrize("n_levels", [1, 2, 3, 4])
    def test_decomposition_levels(self, n_levels):
        rng = np.random.default_rng(n_levels)
        px = rng.integers(0, 256, (70, 50)).astype(np.uint8)
        data = encode_jpx(px, n_levels=n_levels)
        assert np.array_equal(decode_jpx(data), px)

    @pytest.mark.parametrize("cb_exp", [2, 3, 4])
    def test_codeblock_sizes(self, cb_exp):
        rng = np.random.default_rng(cb_exp + 10)
        px = rng.integers(0, 256, (40, 40)).astype(np.uint8)
        assert np.array_equal(
            decode_jpx(encode_jpx(px, cb_exp=cb_exp)), px
        )

    @pytest.mark.parametrize("mct", [False, True])
    def test_color_with_and_without_rct(self, mct):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (24, 36, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpx(encode_jpx(img, mct=mct)), _luma(img)
        )

    def test_odd_and_tiny_dimensions(self):
        rng = np.random.default_rng(7)
        for shape in [(3, 5), (1, 17), (17, 1), (65, 31)]:
            px = rng.integers(0, 256, shape).astype(np.uint8)
            lv = 1 if min(shape) < 8 else 2
            assert np.array_equal(
                decode_jpx(encode_jpx(px, n_levels=lv)), px
            ), shape

    def test_random_sweep(self):
        rng = np.random.default_rng(9)
        for _ in range(6):
            h = int(rng.integers(2, 90))
            w = int(rng.integers(2, 90))
            px = rng.integers(0, 256, (h, w)).astype(np.uint8)
            lv = int(rng.integers(1, 3))
            assert np.array_equal(
                decode_jpx(encode_jpx(px, n_levels=lv)), px
            ), (h, w, lv)

    def test_jp2_container(self):
        px = np.full((8, 8), 40, np.uint8)
        stream = encode_jpx(px, n_levels=1)
        jp2 = (
            b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            + struct.pack(">I", 8 + len(stream)) + b"jp2c" + stream
        )
        assert np.array_equal(decode_jpx(jp2), px)
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.sniff import sniff_format

        assert sniff_format(jp2) == "image/jp2"
        assert sniff_format(stream) == "image/jp2"
        assert np.array_equal(decode_pixels(jp2), px)
        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        assert sniff_image_dims(stream) == ("jp2", 8, 8, None)
        assert sniff_image_dims(jp2) == ("jp2", 8, 8, None)

    def test_jp2_sniff_ignores_decoy_marker_in_metadata_box(self):
        # r5 ADVICE: a \xff\x51 byte pair inside an XML/UUID box before
        # the codestream must not be read as the SIZ segment
        px = np.full((8, 8), 40, np.uint8)
        stream = encode_jpx(px, n_levels=1)
        decoy = b"<x>\xff\x51" + struct.pack(">HHII", 41, 0, 9999, 7777) + b"</x>"
        xml_box = struct.pack(">I", 8 + len(decoy)) + b"xml " + decoy
        jp2 = (
            b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            + xml_box
            + struct.pack(">I", 8 + len(stream)) + b"jp2c" + stream
        )
        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        assert sniff_image_dims(jp2) == ("jp2", 8, 8, None)
        # a box file with a decoy but NO codestream is an error, not
        # bogus dimensions
        no_cs = b"\x00\x00\x00\x0cjP  \r\n\x87\n" + xml_box
        assert sniff_image_dims(no_cs) == (
            "jp2", None, None, "no SIZ segment",
        )


class TestTilesAndSubsampling:
    """r5: multi-tile images and chroma sub-sampling (VERDICT r4 #2).

    Reversible profile stays a bit-exact oracle.  In LRCP the packets
    of all components interleave inside each resolution, so an exact
    luma on a 4:2:0 stream also PROVES the chroma packets/code-blocks
    parse bit-correctly — any mis-consumed chroma bit desyncs every
    later luma packet."""

    def test_multi_tile_exact(self):
        rng = np.random.default_rng(21)
        px = rng.integers(0, 256, (96, 80)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(32, 32))
        assert data.count(b"\xff\x90") >= 6  # really multi-SOT
        assert np.array_equal(decode_jpx(data), px)

    def test_multi_tile_partial_edge_tiles(self):
        rng = np.random.default_rng(22)
        px = rng.integers(0, 256, (90, 70)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(32, 32))
        assert np.array_equal(decode_jpx(data), px)

    def test_multi_tile_partial_first_codeblock(self):
        # tile pitch 32 with 16-px code-blocks: interior tiles' band
        # origins (8 at level 2) fall mid-cell in the B.7 anchored
        # grid, so first code-blocks are partial
        rng = np.random.default_rng(23)
        px = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, cb_exp=2, tile=(32, 32))
        assert np.array_equal(decode_jpx(data), px)

    @pytest.mark.parametrize("mct", [False, True])
    def test_multi_tile_color(self, mct):
        rng = np.random.default_rng(24)
        img = rng.integers(0, 256, (40, 72, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, mct=mct, tile=(40, 40))
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_subsampled_420_luma_exact(self):
        rng = np.random.default_rng(25)
        y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        cb = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        cr = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        data = encode_jpx_subsampled(y, cb, cr)
        assert np.array_equal(decode_jpx(data), y)

    def test_subsampled_422_odd_dims(self):
        rng = np.random.default_rng(26)
        y = rng.integers(0, 256, (33, 49)).astype(np.uint8)
        cb = rng.integers(0, 256, (33, 25)).astype(np.uint8)  # ceil(49/2)
        cr = rng.integers(0, 256, (33, 25)).astype(np.uint8)
        data = encode_jpx_subsampled(y, cb, cr, sampling=(2, 1))
        assert np.array_equal(decode_jpx(data), y)

    def test_uniformly_subsampled_rgb(self):
        # all three components at (2, 2): geometry is sub-sampled but
        # the family is uniform, so the RGB->luma path runs over the
        # replication-upsampled planes
        rng = np.random.default_rng(27)
        half = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
        planes = [half[..., k].astype(np.int64) - 128 for k in range(3)]
        data = _assemble_codestream(
            planes, [(2, 2)] * 3, 48, 32, 2, 4, False, 2, 8, None
        )
        want = np.repeat(np.repeat(_luma(half), 2, axis=0), 2, axis=1)
        assert np.array_equal(decode_jpx(data), want)

    def test_subsampled_and_tiled(self):
        rng = np.random.default_rng(28)
        y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        cb = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        cr = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        data = encode_jpx_subsampled(y, cb, cr, tile=(32, 32))
        assert data.count(b"\xff\x90") >= 6
        assert np.array_equal(decode_jpx(data), y)

    def test_tile_parts_grouped_and_ordered(self):
        # split a tile into two tile-parts (TPsot 0 empty, TPsot 1 the
        # real body) and write them in SCRAMBLED file order: the
        # decoder must group by Isot and sort by TPsot
        px = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
        data = encode_jpx(px, n_levels=1)
        sot = data.find(b"\xff\x90")
        head, body = data[:sot], data[sot + 14 : -2]  # SOT(12)+SOD(2)
        part1 = (
            b"\xff\x90" + struct.pack(">HHIBB", 10, 0, 12 + 2 + len(body), 1, 2)
            + b"\xff\x93" + body
        )
        part0 = b"\xff\x90" + struct.pack(">HHIBB", 10, 0, 14, 0, 2) + b"\xff\x93"
        scrambled = head + part1 + part0 + b"\xff\xd9"
        assert np.array_equal(decode_jpx(scrambled), px)

    def test_missing_tile_raises(self):
        rng = np.random.default_rng(29)
        px = rng.integers(0, 256, (32, 64)).astype(np.uint8)
        data = bytearray(encode_jpx(px, n_levels=2, tile=(32, 32)))
        # patch the second SOT's Isot from 1 to 0: tile 1 now missing
        first = data.find(b"\xff\x90")
        second = data.find(b"\xff\x90", first + 2)
        assert data[second + 4 : second + 6] == b"\x00\x01"
        data[second + 4 : second + 6] = b"\x00\x00"
        with pytest.raises(ValueError, match="missing tiles"):
            decode_jpx(bytes(data))

    def test_odd_tile_origins_round_trip(self):
        # a 5-px tile grid puts tile 1's resolution origins at ODD
        # coordinates — the general-parity DWT (F.3.8's i0-parity role
        # swap) must still be bit-exact.  Until r5 this was a typed
        # error; the encoder now analyzes with the same parities.
        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, (11, 23)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(5, 5))
        assert np.array_equal(decode_jpx(data), px)

    def test_odd_tile_origins_color_mct(self):
        rng = np.random.default_rng(32)
        px = rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(7, 3), mct=True)
        assert np.array_equal(decode_jpx(data), _luma(px))

    def test_tile_part_cod_overrides(self):
        # tiles 1 and 2 carry their own COD + QCD (different depth /
        # code-block size) in their first tile-part header (A.4.2)
        rng = np.random.default_rng(33)
        px = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2, tile=(32, 32),
            tile_ov={1: {"nl": 1}, 2: {"nl": 3, "cb_exp": 3}},
        )
        assert data.count(b"\xff\x52") == 3  # main COD + 2 tile CODs
        assert np.array_equal(decode_jpx(data), px)

    def test_tile_cod_displaces_main_coc(self):
        # Table A.10: main COC gives comp 1 depth 1; tile 1's COD
        # resets ALL of tile 1's components to depth 2
        rng = np.random.default_rng(34)
        img = rng.integers(0, 256, (32, 64, 3)).astype(np.uint8)
        data = encode_jpx(
            img, n_levels=2, tile=(32, 32),
            coc={1: {"nl": 1}}, tile_ov={1: {"nl": 2}},
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_tile_override_precincts_and_style(self):
        rng = np.random.default_rng(35)
        px = rng.integers(0, 256, (40, 64)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2, tile=(32, 32),
            tile_ov={0: {"nl": 1, "prec": [(4, 4), (5, 5)],
                         "style": 0x01}},
        )
        assert np.array_equal(decode_jpx(data), px)

    def test_tile_override_is_load_bearing(self):
        # blanking the tile COD/QCD marker types (turning them into a
        # skipped COM) must not decode to the same image
        rng = np.random.default_rng(36)
        px = rng.integers(0, 256, (64, 32)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(32, 32),
                          tile_ov={1: {"nl": 1}})
        buf = bytearray(data)
        sot2 = buf.find(b"\xff\x90", buf.find(b"\xff\x90") + 2)
        for mk in (b"\xff\x52", b"\xff\x5c"):
            i = buf.find(mk, sot2)
            assert i > 0
            buf[i : i + 2] = b"\xff\x64"  # COM: informational, skipped
        try:
            assert not np.array_equal(decode_jpx(bytes(buf)), px)
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass

    def test_coding_marker_in_second_tile_part_rejected(self):
        # split one tile into two parts and plant a COD in part 1
        px = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
        data = encode_jpx(px, n_levels=1)
        sot = data.find(b"\xff\x90")
        head, body = data[:sot], data[sot + 14 : -2]
        cod = b"\xff\x52" + struct.pack(">H", 12) + bytes(
            [0, 0, 0, 1, 1, 1, 1, 0, 1, 0]
        )
        part0 = b"\xff\x90" + struct.pack(">HHIBB", 10, 0, 14, 0, 2) \
            + b"\xff\x93"
        part1 = (
            b"\xff\x90"
            + struct.pack(">HHIBB", 10, 0, 12 + len(cod) + 2 + len(body),
                          1, 2)
            + cod + b"\xff\x93" + body
        )
        with pytest.raises(ValueError, match="non-first tile-part"):
            decode_jpx(head + part0 + part1 + b"\xff\xd9")

    def test_tile_part_poc_overrides_main(self):
        # main-header POC in charge for tile 0; tile 1's own POC
        # supersedes it with a different volume split (Table A.10)
        rng = np.random.default_rng(101)
        px = rng.integers(0, 256, (64, 32)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2, tile=(32, 32),
            poc=[(0, 0, 1, 3, 1, 0)],
            tile_poc={1: [(1, 0, 1, 3, 1, 2), (0, 0, 1, 1, 1, 0)]},
        )
        assert np.array_equal(decode_jpx(data), px)

    def test_tile_part_poc_without_main_poc(self):
        rng = np.random.default_rng(102)
        px = rng.integers(0, 256, (32, 64)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2, tile=(32, 32),
            tile_poc={0: [(1, 0, 1, 3, 1, 3), (0, 0, 1, 1, 1, 1)]},
        )
        assert np.array_equal(decode_jpx(data), px)

    def test_poc_in_second_tile_part_rejected(self):
        px = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
        data = encode_jpx(px, n_levels=1)
        sot = data.find(b"\xff\x90")
        head, body = data[:sot], data[sot + 14 : -2]
        poc = b"\xff\x5f" + struct.pack(">H", 9) + bytes(
            [0, 0, 0, 1, 2, 1, 0]
        )
        part0 = b"\xff\x90" + struct.pack(">HHIBB", 10, 0, 14, 0, 2) \
            + b"\xff\x93"
        part1 = (
            b"\xff\x90"
            + struct.pack(">HHIBB", 10, 0, 12 + len(poc) + 2 + len(body),
                          1, 2)
            + poc + b"\xff\x93" + body
        )
        with pytest.raises(ValueError, match="non-first tile-part"):
            decode_jpx(head + part0 + part1 + b"\xff\xd9")

    @pytest.mark.parametrize("sop,eph", [(True, False), (False, True),
                                         (True, True)])
    def test_sop_eph_markers(self, sop, eph):
        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, sop=sop, eph=eph)
        if sop:
            assert b"\xff\x91" in data
        if eph:
            assert b"\xff\x92" in data
        assert np.array_equal(decode_jpx(data), px)

    def test_sop_eph_with_tiles_and_color(self):
        rng = np.random.default_rng(32)
        img = rng.integers(0, 256, (40, 64, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, mct=True, tile=(32, 32),
                          sop=True, eph=True)
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_missing_eph_is_error(self):
        px = np.full((16, 16), 7, np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1, eph=True))
        i = data.find(b"\xff\x92")
        data[i : i + 2] = b"\x00\x00"
        with pytest.raises(ValueError, match="EPH"):
            decode_jpx(bytes(data))

    @pytest.mark.parametrize("prog", [2, 3, 4])
    def test_progression_orders(self, prog):
        rng = np.random.default_rng(33 + prog)
        img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, mct=True, prog=prog)
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_cprl_differs_from_lrcp_bytes(self):
        # sanity: the orders really permute packets (different streams,
        # same pixels)
        rng = np.random.default_rng(38)
        img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
        a = encode_jpx(img, n_levels=1, prog=0)
        b = encode_jpx(img, n_levels=1, prog=4)
        assert a != b
        assert np.array_equal(decode_jpx(a), decode_jpx(b))

    def test_bad_progression_is_error(self):
        px = np.full((8, 8), 3, np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1))
        cod = data.find(b"\xff\x52")
        data[cod + 5] = 5  # SGcod progression byte
        with pytest.raises(ValueError, match="progression"):
            decode_jpx(bytes(data))

    def test_multimodal_dims_sniff_multi_tile(self):
        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        rng = np.random.default_rng(30)
        px = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(32, 32))
        assert sniff_image_dims(data) == ("jp2", 96, 64, None)


class TestGridOffsetsAndRoi:
    """B.3 grid offsets (XOsiz/YOsiz/XTOsiz/YTOsiz) and the maxshift
    region of interest (A.6.3 RGN + H.2) — both new in r5, both
    reversible-profile bit-exact."""

    def test_image_offsets_round_trip(self):
        rng = np.random.default_rng(41)
        px = rng.integers(0, 256, (14, 19)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, offsets=(3, 5, 0, 0))
        assert np.array_equal(decode_jpx(data), px)

    def test_offsets_with_tiling_partial_first_tile(self):
        # XTOsiz < XOsiz: the first tile row/column is clipped by the
        # image area, and interior resolution origins go odd
        rng = np.random.default_rng(42)
        px = rng.integers(0, 256, (16, 21)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, offsets=(5, 4, 2, 1),
                          tile=(8, 8))
        assert np.array_equal(decode_jpx(data), px)

    def test_offsets_color_mct(self):
        rng = np.random.default_rng(43)
        px = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
        data = encode_jpx(px, n_levels=1, mct=True, offsets=(1, 3, 1, 0))
        assert np.array_equal(decode_jpx(data), _luma(px))

    def test_sniff_reports_image_area_dims(self):
        from receipt_scanner_spark.extract.sniff import sniff_format
        px = np.full((6, 9), 50, np.uint8)
        data = encode_jpx(px, n_levels=1, offsets=(3, 2, 0, 0))
        assert sniff_format(data) == "image/jp2"

    def test_rgn_maxshift_round_trip(self):
        rng = np.random.default_rng(44)
        px = rng.integers(0, 256, (12, 17)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, rgn=14)
        assert b"\xff\x5e" in data  # the RGN marker is really there
        assert np.array_equal(decode_jpx(data), px)

    def test_rgn_color_component0_only(self):
        # RGN names component 0: its bands carry SPrgn extra bitplanes
        # and downshift at decode; components 1-2 are untouched
        rng = np.random.default_rng(45)
        px = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
        data = encode_jpx(px, n_levels=1, mct=True, rgn=14)
        assert np.array_equal(decode_jpx(data), _luma(px))

    def test_rgn_with_offsets_and_tiles(self):
        rng = np.random.default_rng(46)
        px = rng.integers(0, 256, (13, 11)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, rgn=14, offsets=(2, 1, 0, 0),
                          tile=(6, 7))
        assert np.array_equal(decode_jpx(data), px)

    def test_rgn_bad_style_raises(self):
        px = np.full((8, 8), 5, np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1, rgn=10))
        i = data.find(b"\xff\x5e")
        data[i + 5] = 1  # Srgn: only 0 (maxshift) exists in T.800
        with pytest.raises(ValueError, match="RGN style"):
            decode_jpx(bytes(data))

    def test_bad_tile_offsets_raise(self):
        px = np.full((8, 8), 5, np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1))
        siz_at = data.find(b"\xff\x51")
        # XTOsiz (siz_at+30) > XOsiz (0) violates B.3
        struct.pack_into(">I", data, siz_at + 30, 1)
        with pytest.raises(ValueError, match="tile offsets"):
            decode_jpx(bytes(data))

    def test_97_parity_1d_round_trip(self):
        from receipt_scanner_spark.extract.jpx import _inv_97_1d
        rng = np.random.default_rng(47)
        for n in (1, 2, 5, 8, 13):
            for parity in (0, 1):
                x = rng.normal(0.0, 50.0, (n, 3))
                lo, hi = fwd_97_1d(x, parity)
                got = _inv_97_1d(lo, hi, parity)
                np.testing.assert_allclose(got, x, atol=1e-9)


class TestCustomPrecincts:
    """r5: custom precinct partitions (B.6) — per-precinct packets and
    tag trees, effective code-block clipping (B.7), and the positional
    packet emission orders (B.12.1.3-5) over multiple precincts."""

    def test_precinct_round_trip_all_progressions(self):
        rng = np.random.default_rng(51)
        img = (np.cumsum(rng.integers(0, 9, (70, 90)), axis=1)
               % 256).astype(np.uint8)
        for prog in range(5):
            data = encode_jpx(
                img, n_levels=2, prec=[(6, 6), (6, 6), (6, 6)], prog=prog,
            )
            assert np.array_equal(decode_jpx(data), img), prog

    def test_mixed_precinct_sizes_per_resolution(self):
        rng = np.random.default_rng(52)
        img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, prec=[(5, 6), (6, 5), (7, 7)],
                          prog=1)
        assert np.array_equal(decode_jpx(data), img)

    def test_effective_codeblock_clips_to_precinct(self):
        # cb 2^6 but precinct 2^4: band-grid precinct is 2^3 -> the
        # effective code block must clip to 8 (B.7)
        rng = np.random.default_rng(53)
        img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        data = encode_jpx(img, n_levels=1, cb_exp=4, prec=[(4, 4), (4, 4)])
        assert np.array_equal(decode_jpx(data), img)

    def test_precincts_with_tiles_color_rpcl(self):
        rng = np.random.default_rng(54)
        rgb = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
        data = encode_jpx(rgb, n_levels=2, mct=True,
                          prec=[(5, 5), (5, 5), (6, 6)], tile=(32, 32),
                          prog=2)
        assert np.array_equal(decode_jpx(data), _luma(rgb))

    def test_precincts_with_sop_eph(self):
        rng = np.random.default_rng(55)
        img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, prec=[(5, 5)] * 3,
                          sop=True, eph=True)
        assert np.array_equal(decode_jpx(data), img)

    def test_precinct_stream_actually_differs(self):
        # sanity: the precinct path emits a different stream than the
        # default (more packets), decoding to the same pixels
        rng = np.random.default_rng(56)
        img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        a = encode_jpx(img, n_levels=1, cb_exp=2)
        b = encode_jpx(img, n_levels=1, cb_exp=2, prec=[(4, 4), (4, 4)])
        assert a != b
        assert np.array_equal(decode_jpx(a), decode_jpx(b))

    def test_truncated_precinct_bytes_is_error(self):
        img = np.full((16, 16), 9, np.uint8)
        data = bytearray(encode_jpx(img, n_levels=1, prec=[(5, 5), (5, 5)]))
        cod = data.find(b"\xff\x52")
        (ln,) = struct.unpack(">H", data[cod + 2 : cod + 4])
        # drop the last precinct byte from COD
        del data[cod + 2 + ln - 1]
        data[cod + 2 : cod + 4] = struct.pack(">H", ln - 1)
        with pytest.raises(ValueError, match="precinct"):
            decode_jpx(bytes(data))

    def test_zero_precinct_exponent_above_r0_is_error(self):
        img = np.full((16, 16), 9, np.uint8)
        data = bytearray(encode_jpx(img, n_levels=1, prec=[(5, 5), (5, 5)]))
        cod = data.find(b"\xff\x52")
        data[cod + 4 + 10 + 1] = 0x00  # r=1 precinct byte -> PPx=PPy=0
        with pytest.raises(ValueError, match="precinct"):
            decode_jpx(bytes(data))


class TestPerComponentCoding:
    """COC overrides (A.6.2): per-component decomposition depth,
    code-block geometry, style, and precinct partition diverge from
    the COD default (each COC pairs with a QCC because a different
    depth changes the band structure and exponent list).  Reversible
    profile keeps the bit-exact oracle; with LRCP the components
    interleave inside each resolution, so an exact result also proves
    the mixed-band-structure packet sequencing is right."""

    def test_coc_fewer_levels_on_chroma(self):
        # the real-world shape: chroma decomposed shallower than luma
        rng = np.random.default_rng(60)
        img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=3,
                          coc={1: {"nl": 1}, 2: {"nl": 2}})
        assert data.count(b"\xff\x53") == 2
        assert data.count(b"\xff\x5d") == 2
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_coc_more_levels_than_default(self):
        # components lacking a resolution contribute no packets there
        # (B.12): comp 0 has resolutions 2-3 alone
        rng = np.random.default_rng(61)
        img = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=1, coc={0: {"nl": 3}})
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_coc_codeblock_and_style(self):
        rng = np.random.default_rng(62)
        img = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
        data = encode_jpx(
            img, n_levels=2, cb_exp=4,
            coc={1: {"cb_exp": 2, "style": 0x01}},  # bypass on comp 1
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_coc_custom_precincts_one_component(self):
        rng = np.random.default_rng(63)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        data = encode_jpx(
            img, n_levels=2,
            coc={2: {"prec": [(3, 3), (4, 3), (4, 4)]}},
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    @pytest.mark.parametrize("prog", [2, 3, 4])
    def test_coc_positional_progressions(self, prog):
        # positional orders sort per-component emission anchors; with
        # mixed depths the resolution scale factors differ per comp
        rng = np.random.default_rng(64 + prog)
        img = rng.integers(0, 256, (36, 52, 3)).astype(np.uint8)
        data = encode_jpx(
            img, n_levels=2, prog=prog, sop=True, eph=True,
            coc={1: {"nl": 1}},
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_coc_subsampled_chroma_fewer_levels(self):
        rng = np.random.default_rng(70)
        y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        cbp = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        crp = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        data = encode_jpx_subsampled(
            y, cbp, crp, n_levels=3, coc={1: {"nl": 1}, 2: {"nl": 1}},
        )
        assert np.array_equal(decode_jpx(data), y)

    def test_coc_multi_tile(self):
        rng = np.random.default_rng(71)
        img = rng.integers(0, 256, (64, 48, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, tile=(32, 32),
                          coc={0: {"nl": 1}})
        assert data.count(b"\xff\x90") >= 4
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_coc_is_load_bearing(self):
        # splice the COC + QCC out of the main header: decoding the
        # component under the COD default must NOT reproduce the image
        rng = np.random.default_rng(72)
        img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, coc={1: {"nl": 1}})
        buf = bytearray(data)
        for mk in (b"\xff\x53", b"\xff\x5d"):
            i = buf.find(mk)
            assert i > 0
            (ln,) = struct.unpack(">H", buf[i + 2 : i + 4])
            del buf[i : i + 2 + ln]
        try:
            out = decode_jpx(bytes(buf))
            assert not np.array_equal(out, _luma(img))
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass  # desynced tier-2 is an equally valid outcome

    def test_coc_component_out_of_range(self):
        img = np.full((16, 16), 7, np.uint8)
        data = bytearray(encode_jpx(img, n_levels=1, coc={0: {"nl": 2}}))
        i = data.find(b"\xff\x53")
        data[i + 4] = 5  # Ccoc -> component 5 of a 1-component image
        with pytest.raises(ValueError, match="component out of range"):
            decode_jpx(bytes(data))


class TestPackedPacketHeaders:
    """PPT (A.7.5): packet headers relocate into tile-part-header PPT
    marker segments (concatenated in Zppt order); the SOD body then
    carries only packet bodies (plus SOP markers), and EPH markers
    live in the packed-header stream."""

    def test_ppt_round_trip_gray(self):
        rng = np.random.default_rng(80)
        px = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, ppt=True)
        assert b"\xff\x61" in data
        assert np.array_equal(decode_jpx(data), px)

    def test_ppt_multi_tile_color(self):
        rng = np.random.default_rng(81)
        img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, tile=(32, 32), ppt=True)
        assert data.count(b"\xff\x61") >= 4
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_ppt_multiple_zppt_segments(self):
        # tiny split size: every tile's headers span many PPT
        # segments; the decoder must reassemble them in Zppt order
        rng = np.random.default_rng(82)
        px = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, ppt=7)
        assert data.count(b"\xff\x61") > 2
        assert np.array_equal(decode_jpx(data), px)

    def test_ppt_with_sop_eph(self):
        # SOP stays in the body stream; EPH moves into the PPT data
        rng = np.random.default_rng(83)
        px = rng.integers(0, 256, (33, 41)).astype(np.uint8)
        data = encode_jpx(px, n_levels=1, sop=True, eph=True, ppt=True)
        i = data.find(b"\xff\x61")
        (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
        ppt_body = data[i + 5 : i + 2 + ln]
        assert b"\xff\x92" in ppt_body  # EPH packed with the headers
        assert np.array_equal(decode_jpx(data), px)

    def test_ppt_with_progressions_and_precincts(self):
        rng = np.random.default_rng(84)
        px = rng.integers(0, 256, (40, 64)).astype(np.uint8)
        for prog in (2, 3, 4):
            data = encode_jpx(
                px, n_levels=2, prog=prog,
                prec=[(3, 3), (4, 3), (4, 4)], ppt=True,
            )
            assert np.array_equal(decode_jpx(data), px)

    def test_ppt_with_tile_override(self):
        rng = np.random.default_rng(85)
        px = rng.integers(0, 256, (64, 32)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(32, 32), ppt=True,
                          tile_ov={1: {"nl": 1}})
        assert np.array_equal(decode_jpx(data), px)

    def test_ppt_is_load_bearing(self):
        # renaming the PPT segments to COM (skipped) leaves a body
        # with no inline headers: decoding must not succeed silently
        rng = np.random.default_rng(86)
        px = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1, ppt=True))
        i = 0
        while (i := data.find(b"\xff\x61", i)) >= 0:
            data[i : i + 2] = b"\xff\x64"
        try:
            assert not np.array_equal(decode_jpx(bytes(data)), px)
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass

    def test_empty_ppt_segment_rejected(self):
        px = np.full((8, 8), 3, np.uint8)
        data = encode_jpx(px, n_levels=1)
        sot = data.find(b"\xff\x90")
        sod = data.find(b"\xff\x93", sot)
        ppt = b"\xff\x61" + struct.pack(">H", 2)  # no Zppt byte
        body_len = len(data) - sod - 2 - 2
        psot = 12 + len(ppt) + 2 + body_len
        patched = (
            data[:sot]
            + b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
            + ppt + data[sod:]
        )
        with pytest.raises(ValueError, match="PPT"):
            decode_jpx(bytes(patched))

    def test_ppm_round_trip_gray(self):
        rng = np.random.default_rng(87)
        px = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, ppm=True)
        assert b"\xff\x60" in data
        assert np.array_equal(decode_jpx(data), px)

    def test_ppm_multi_tile_chunks_in_order(self):
        # one (Nppm, headers) chunk per tile-part, codestream order
        rng = np.random.default_rng(88)
        img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        data = encode_jpx(img, n_levels=2, tile=(32, 32), ppm=True)
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_ppm_multi_zppm_segments(self):
        # a tiny split lands chunk boundaries MID-Nppm-field — the
        # decoder must reassemble the byte stream before framing
        rng = np.random.default_rng(89)
        px = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        data = encode_jpx(px, n_levels=2, tile=(24, 24), ppm=5)
        assert data.count(b"\xff\x60") > 4
        assert np.array_equal(decode_jpx(data), px)

    def test_ppm_with_sop_eph_and_progression(self):
        rng = np.random.default_rng(90)
        px = rng.integers(0, 256, (33, 41)).astype(np.uint8)
        data = encode_jpx(px, n_levels=1, sop=True, eph=True, prog=2,
                          ppm=True)
        assert np.array_equal(decode_jpx(data), px)

    def test_ppm_truncated_stream_rejected(self):
        px = np.full((16, 16), 5, np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1, ppm=True))
        i = data.find(b"\xff\x60")
        (ln,) = struct.unpack(">H", bytes(data[i + 2 : i + 4]))
        # shrink the PPM segment to cut the stream mid-chunk
        del data[i + 2 + ln - 8 : i + 2 + ln]
        struct.pack_into(">H", data, i + 2, ln - 8)
        with pytest.raises(ValueError, match="PPM"):
            decode_jpx(bytes(data))

    def test_ppm_and_ppt_exclusive(self):
        # graft a PPT segment into a PPM codestream's tile-part header
        px = np.full((16, 16), 5, np.uint8)
        data = encode_jpx(px, n_levels=1, ppm=True)
        sot = data.find(b"\xff\x90")
        sod = data.find(b"\xff\x93", sot)
        ppt = b"\xff\x61" + struct.pack(">H", 3) + b"\x00"
        body_len = len(data) - sod - 2 - 2
        psot = 12 + len(ppt) + 2 + body_len
        patched = (
            data[:sot]
            + b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
            + ppt + data[sod:]
        )
        with pytest.raises(ValueError, match="PPM and PPT"):
            decode_jpx(bytes(patched))

class TestProgressionOrderChange:
    """POC (A.6.6): packets emit progression-volume by volume, each
    segment in its own progression over its resolution/component
    bounds, with already-emitted packets skipped (B.12).  The COD
    progression byte is superseded."""

    def test_poc_two_resolution_volumes(self):
        # low resolutions LRCP first, then the rest in RPCL — the
        # standard "thumbnail first" reorganization
        rng = np.random.default_rng(95)
        px = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2,
            poc=[(0, 0, 1, 1, 1, 0), (1, 0, 1, 3, 1, 2)],
        )
        assert b"\xff\x5f" in data
        assert np.array_equal(decode_jpx(data), px)

    def test_poc_component_volumes_color(self):
        # luma volume first (all resolutions), chroma volume after
        rng = np.random.default_rng(96)
        img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
        data = encode_jpx(
            img, n_levels=2,
            poc=[(0, 0, 1, 3, 1, 0), (0, 1, 1, 3, 3, 4)],
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_poc_overlapping_volumes_dedup(self):
        # second volume spans EVERYTHING incl. the first's packets —
        # the decoder must skip duplicates exactly like the encoder
        rng = np.random.default_rng(97)
        px = rng.integers(0, 256, (33, 47)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2,
            poc=[(1, 0, 1, 2, 1, 3), (0, 0, 1, 3, 1, 0)],
        )
        assert np.array_equal(decode_jpx(data), px)

    def test_poc_supersedes_cod_progression(self):
        # COD says CPRL; POC's single full volume says LRCP — if the
        # decoder followed COD the packet sequence would desync
        rng = np.random.default_rng(98)
        img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        data = encode_jpx(
            img, n_levels=1, prog=4,
            poc=[(0, 0, 1, 2, 3, 0)],
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_poc_with_tiles_precincts_ppt(self):
        rng = np.random.default_rng(99)
        px = rng.integers(0, 256, (40, 64)).astype(np.uint8)
        data = encode_jpx(
            px, n_levels=2, tile=(32, 32),
            prec=[(3, 3), (4, 3), (4, 4)], sop=True, eph=True,
            ppt=True, poc=[(0, 0, 1, 2, 1, 2), (0, 0, 1, 3, 1, 3)],
        )
        assert np.array_equal(decode_jpx(data), px)

    def test_poc_is_load_bearing(self):
        # renaming POC to COM leaves the COD progression in charge —
        # the reordered packets must not decode to the same image
        rng = np.random.default_rng(100)
        px = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        data = bytearray(encode_jpx(
            px, n_levels=2,
            poc=[(1, 0, 1, 3, 1, 2), (0, 0, 1, 1, 1, 0)],
        ))
        i = data.find(b"\xff\x5f")
        data[i : i + 2] = b"\xff\x64"
        try:
            assert not np.array_equal(decode_jpx(bytes(data)), px)
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass

    def test_poc_bad_bounds_rejected(self):
        px = np.full((8, 8), 3, np.uint8)
        data = encode_jpx(px, n_levels=1)
        cod_at = data.find(b"\xff\x52")
        # REpoc <= RSpoc
        poc = b"\xff\x5f" + struct.pack(">H", 9) + bytes(
            [1, 0, 0, 1, 1, 1, 0]
        )
        with pytest.raises(ValueError, match="POC bounds"):
            decode_jpx(data[:cod_at] + poc + data[cod_at:])

    def test_poc_bad_length_rejected(self):
        px = np.full((8, 8), 3, np.uint8)
        data = encode_jpx(px, n_levels=1)
        cod_at = data.find(b"\xff\x52")
        poc = b"\xff\x5f" + struct.pack(">H", 6) + bytes(4)
        with pytest.raises(ValueError, match="POC segment length"):
            decode_jpx(data[:cod_at] + poc + data[cod_at:])


class TestCodeBlockStyles:
    """SPcod code-block style flags (T.800 Table A.19): selective MQ
    bypass, per-pass context reset, termination on every pass,
    vertically causal contexts, predictable termination, segmentation
    symbols — including the multi-codeword-segment packet-header
    length signaling of B.10.7.2."""

    @pytest.mark.parametrize(
        "style", [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x05, 0x0D, 0x3F]
    )
    def test_style_round_trip_gray(self, style):
        rng = np.random.default_rng(style)
        img = rng.integers(0, 256, (41, 57)).astype(np.uint8)
        out = decode_jpx(encode_jpx(img, cb_style=style))
        assert np.array_equal(out, img)

    @pytest.mark.parametrize("style", [0x01, 0x04, 0x3F])
    def test_style_round_trip_color_mct(self, style):
        rng = np.random.default_rng(100 + style)
        img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        lum = _luma(img)
        out = decode_jpx(encode_jpx(img, mct=True, cb_style=style))
        assert np.abs(out.astype(int) - lum.astype(int)).max() <= 1

    def test_styles_with_tiles_precincts_progressions(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (40, 64)).astype(np.uint8)
        for prog in range(5):
            data = encode_jpx(
                img, n_levels=2, tile=(32, 24), prog=prog,
                prec=[(3, 3), (4, 3), (4, 4)], sop=True, eph=True,
                cb_style=0x3F,
            )
            assert np.array_equal(decode_jpx(data), img)

    def test_bypass_produces_multiple_segments(self):
        # magnitudes wide enough for >10 passes so raw coding engages
        rng = np.random.default_rng(3)
        vals = rng.integers(-200, 200, (32, 32))
        segs, np_, _zbp = encode_codeblock(vals, 10, "HL", style=0x01)
        assert np_ > 10 and len(segs) > 1
        segs_all, np2, _ = encode_codeblock(vals, 10, "HL", style=0x04)
        assert len(segs_all) == np2  # termall: one segment per pass
        # and both decode back to the plain-style coefficients
        plain, _, zbp = encode_codeblock(vals, 10, "HL")
        ref_m, ref_s, _ = jpx.decode_codeblock(
            plain[0], 32, 32, np_, zbp, 10, "HL"
        )
        for style, ss in ((0x01, segs), (0x04, segs_all)):
            m, s, _ = jpx.decode_codeblock(
                ss, 32, 32, np_, zbp, 10, "HL", style=style
            )
            assert np.array_equal(m, ref_m)
            assert np.array_equal(s * (m != 0), ref_s * (ref_m != 0))

    def test_causal_changes_the_stream(self):
        rng = np.random.default_rng(9)
        vals = rng.integers(-60, 60, (16, 16))
        plain, _, _ = encode_codeblock(vals, 9, "LL")
        causal, _, _ = encode_codeblock(vals, 9, "LL", style=0x08)
        assert plain[0] != causal[0]

    def test_seg_cap_schedule(self):
        # bypass: one 10-pass MQ segment, then raw pairs / MQ singles
        assert [jpx._seg_cap(0x01, i) for i in range(6)] == [
            10, 2, 1, 2, 1, 2
        ]
        assert all(jpx._seg_cap(0x04, i) == 1 for i in range(4))
        assert jpx._seg_cap(0x05, 0) == 1  # termall wins over bypass
        assert jpx._seg_cap(0x00, 0) > 10**6

    def test_raw_bit_round_trip_with_stuffing(self):
        rng = np.random.default_rng(17)
        # long all-ones runs force 0xFF bytes and the 7-bit stuffing
        bits = list(rng.integers(0, 2, 300)) + [1] * 40 + [0, 1, 1]
        wtr = RawBitWriter()
        for b in bits:
            wtr.put(int(b))
        data = wtr.flush()
        assert 0xFF in data  # the stuffing path actually ran
        rdr = jpx._RawBits(data)
        assert [rdr.bit() for _ in bits] == [int(b) for b in bits]

    def test_segmentation_symbol_catches_corruption(self):
        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        data = bytearray(encode_jpx(img, cb_style=0x20))
        assert np.array_equal(decode_jpx(bytes(data)), img)
        data[-40] ^= 0x55  # corrupt tier-1 bytes near the stream tail
        with pytest.raises(ValueError):
            decode_jpx(bytes(data))

    def test_unknown_style_bits_are_typed_error(self):
        img = np.full((8, 8), 7, np.uint8)
        data = bytearray(encode_jpx(img, n_levels=1))
        i = data.find(b"\xff\x52")
        data[i + 4 + 8] = 0x40  # reserved bit
        with pytest.raises(NotImplementedError, match="code-block style"):
            decode_jpx(bytes(data))


class TestStructuralPins:
    def test_zc_context_tables(self):
        # Table D.1 spot values
        zc = _ZC["LL"]
        assert zc[(2, 0, 0)] == 8 and zc[(0, 0, 0)] == 0
        assert zc[(1, 1, 0)] == 7 and zc[(1, 0, 1)] == 6
        assert zc[(0, 2, 0)] == 4 and zc[(0, 0, 2)] == 2
        # HL swaps H and V
        assert _ZC["HL"][(0, 2, 0)] == 8 and _ZC["HL"][(2, 0, 0)] == 4
        # HH keys off the diagonals
        hh = _ZC["HH"]
        assert hh[(0, 0, 3)] == 8 and hh[(1, 1, 0)] == 2
        assert hh[(0, 0, 1)] == 3 and hh[(1, 0, 2)] == 7

    def test_sc_contexts_symmetry(self):
        for (h, v), (ctx, flip) in jpx._SC.items():
            ctx2, flip2 = jpx._SC[(-h, -v)]
            assert ctx == ctx2 and flip2 == 1 - flip or (h, v) == (0, 0)

    def test_initial_states(self):
        cx = new_mq_contexts()
        assert cx[0] == 4 and cx[17] == 3 and cx[18] == 46
        assert all(cx[i] == 0 for i in range(1, 17) if i != 0)

    def test_honest_boundaries(self):
        px = np.full((8, 8), 9, np.uint8)
        data = bytearray(encode_jpx(px, n_levels=1))
        # flip the transform byte to 9/7: the no-quantization QCD
        # (style 0) is a 5/3-only form — with the 9/7 transform the
        # stream is malformed (derived and expounded both decode since
        # r5, so this is a data error, not a missing feature)
        i = data.find(b"\xff\x52")
        data[i + 4 + 9] = 0
        with pytest.raises(ValueError, match="quantization style"):
            decode_jpx(bytes(data))

    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        bases = [
            encode_jpx(px, n_levels=1),
            # r5 continuation: offsets + odd-origin tiles + maxshift ROI
            encode_jpx(px, n_levels=2, offsets=(3, 2, 1, 0),
                       tile=(7, 5), rgn=14),
            # session 3: COC overrides + tile-part header overrides
            encode_jpx(np.stack([px] * 3, -1), n_levels=2, tile=(8, 8),
                       coc={1: {"nl": 1}}, tile_ov={2: {"nl": 3}}),
            # session 3: packed packet headers (multi-Zppt)
            encode_jpx(px, n_levels=1, ppt=5, sop=True, eph=True),
            # session 3: POC volumes over main-header PPM
            encode_jpx(px, n_levels=2, ppm=9,
                       poc=[(0, 0, 1, 1, 1, 0), (1, 0, 1, 3, 1, 2)]),
        ]
        for base in bases:
            for _ in range(150):
                buf = bytearray(base)
                for _ in range(int(rng.integers(1, 5))):
                    buf[int(rng.integers(2, len(buf)))] = int(
                        rng.integers(0, 256))
                try:
                    decode_jpx(bytes(buf))
                except (ValueError, NotImplementedError, IndexError,
                        struct.error, KeyError):
                    pass


class TestPdfAndOcr:
    def _pdf(self, stream):
        return (
            b"%PDF-1.5\n"
            + (
                f"4 0 obj\n<< /Subtype /Image /Width 1 /Height 1"
                f" /BitsPerComponent 8 /Filter /JPXDecode"
                f" /Length {len(stream)} >>\nstream\n"
            ).encode()
            + stream + b"\nendstream\nendobj\n%%EOF\n"
        )

    def test_jpx_xobject_decodes(self):
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays

        rng = np.random.default_rng(13)
        px = rng.integers(0, 256, (20, 30)).astype(np.uint8)
        pairs = extract_pdf_image_arrays(self._pdf(encode_jpx(px)))
        assert len(pairs) == 1
        got, err = pairs[0]
        assert err is None and np.array_equal(got, px)

    def test_jpx_receipt_ocr_end_to_end(self):
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays
        from receipt_scanner_spark.parsers.registry import parse_text

        px = render_text("TOTAL $30.03\n06/07/2016", scale=2)
        pdf = self._pdf(encode_jpx(px))
        (got, err), = extract_pdf_image_arrays(pdf)
        assert err is None
        assert parse_text(ocr_pixels(got)) == {
            "amount": "30.03", "date": "2016-06-07",
        }


# ---------------------------------------------------------------------------
# irreversible (9/7) encoder mirror
# ---------------------------------------------------------------------------

_ALPHA = -1.586134342059924
_BETA = -0.052980118572961
_GAMMA = 0.882911075530934
_DELTA = 0.443506852043971
_K97 = 1.230174104914001


def fwd_97_1d(x: np.ndarray, parity: int = 0):
    n = x.shape[0]
    x = x.astype(np.float64).copy()
    if n == 1:
        return (x, x[:0]) if parity == 0 else (x[:0], x * 2.0)

    def at(idx):
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx > n - 1, 2 * (n - 1) - idx, idx)
        return x[idx]

    ev = np.arange(parity, n, 2)  # absolute-even local indices
    od = np.arange(1 - parity, n, 2)  # absolute-odd local indices
    x[od] += _ALPHA * (at(od - 1) + at(od + 1))
    x[ev] += _BETA * (at(ev - 1) + at(ev + 1))
    x[od] += _GAMMA * (at(od - 1) + at(od + 1))
    x[ev] += _DELTA * (at(ev - 1) + at(ev + 1))
    return x[ev] / _K97, x[od] * (_K97 / 2.0)


def fwd_97_2d(img):
    lo_v, hi_v = fwd_97_1d(img)
    ll, hl = (a.T for a in fwd_97_1d(lo_v.T))
    lh, hh = (a.T for a in fwd_97_1d(hi_v.T))
    return ll, hl, lh, hh


def encode_jpx_97(
    img: np.ndarray, n_levels: int = 2, cb_exp: int = 4, mct: bool = False,
    guard: int = 2, depth: int = 8, mu: int = 0,
    comp_mu: dict | None = None, derived: bool = False,
) -> bytes:
    """Irreversible-profile mirror of encode_jpx: 9/7 analysis, ICT,
    scalar-expounded quantization with eps = Rb (step ~= 1).
    ``comp_mu``: {component: (eps_delta, mu)} quantization overrides
    (eps lowered by delta -> 2^delta coarser step), emitted as QCC
    segments (A.6.5) — the r5 per-component-quantization path.
    ``derived``: scalar DERIVED quantization (Sqcd style 1) — one
    signalled (eps_0, mu) with eps_b = eps_0 - N_L + n_b per E-5."""
    h, w = img.shape[:2]
    ncomp = 3 if img.ndim == 3 else 1
    cb = 1 << (cb_exp + 2)
    shift = 1 << (depth - 1)
    if ncomp == 3:
        r = img[..., 0].astype(np.float64) - shift
        g = img[..., 1].astype(np.float64) - shift
        b = img[..., 2].astype(np.float64) - shift
        if mct:
            y_ = 0.299 * r + 0.587 * g + 0.114 * b
            cb_ = -0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b
            planes = [y_, cb_, cr]
        else:
            planes = [r, g, b]
    else:
        planes = [img.astype(np.float64) - shift]
        mct = False

    band_list = [(n_levels, "LL")]
    for rr in range(1, n_levels + 1):
        lvl = n_levels - rr + 1
        band_list += [(lvl, "HL"), (lvl, "LH"), (lvl, "HH")]
    gains = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
    comp_bands = []
    for p in planes:
        levels = []
        cur = p
        for _ in range(n_levels):
            ll, hl, lh, hh = fwd_97_2d(cur)
            levels.append((hl, lh, hh))
            cur = ll
        bands = {"LL": cur}
        for li, (hl, lh, hh) in enumerate(levels):
            bands[(li + 1, "HL")] = hl
            bands[(li + 1, "LH")] = lh
            bands[(li + 1, "HH")] = hh
        comp_bands.append(bands)

    assert not (derived and comp_mu), "derived + QCC not exercised"
    eps0 = depth + 3  # derived anchor: LL step 1/8, bands stay fine
    eps_mu = []
    encoded = {}
    for bi, (lvl, orient) in enumerate(band_list):
        if derived:
            eps_mu.append((eps0 - n_levels + lvl, mu))
        else:
            rb = depth + gains[orient]
            eps_mu.append((rb, mu))
    for c in range(ncomp):
        for bi, (lvl, orient) in enumerate(band_list):
            arr = (
                comp_bands[c]["LL"] if orient == "LL"
                else comp_bands[c][(lvl, orient)]
            )
            eps, mu_b = eps_mu[bi]
            if comp_mu and c in comp_mu:
                eps -= comp_mu[c][0]
                mu_b = comp_mu[c][1]
            step = (2.0 ** ((depth + gains[orient]) - eps)) * (
                1.0 + mu_b / 2048.0
            )
            q = np.trunc(arr / step).astype(np.int64)
            bh, bw = arr.shape
            mb = guard + eps - 1
            for by in range(max(1, -(-bh // cb)) if bh else 0):
                for bx in range(max(1, -(-bw // cb)) if bw else 0):
                    blkv = q[by * cb : by * cb + cb, bx * cb : bx * cb + cb]
                    segs, np_, zbp = encode_codeblock(blkv, mb, orient)
                    data = segs[0] if segs else b""
                    encoded[(c, bi, bx, by)] = (data, np_, zbp, bw, bh)

    # packets (same writer as the reversible encoder)
    body = bytearray()
    for r in range(n_levels + 1):
        for c in range(ncomp):
            bis = [0] if r == 0 else [1 + (r - 1) * 3 + k for k in range(3)]
            bp = BitPacker()
            bp.put(1)
            chunks = []
            for bi in bis:
                entries = {
                    k: v for k, v in encoded.items()
                    if k[0] == c and k[1] == bi
                }
                if not entries:
                    continue
                bw, bh = next(iter(entries.values()))[3:5]
                nbx = max(1, -(-bw // cb)) if bw else 0
                nby = max(1, -(-bh // cb)) if bh else 0
                if not nbx or not nby:
                    continue
                incs = np.array(
                    [[0 if encoded[(c, bi, x, y)][1] else 1
                      for x in range(nbx)] for y in range(nby)]
                )
                inc_tree = TagTreeEnc(nbx, nby, incs)
                zbp_tree = TagTreeEnc(
                    nbx, nby,
                    np.array(
                        [[encoded[(c, bi, x, y)][2] for x in range(nbx)]
                         for y in range(nby)]
                    ),
                )
                for by in range(nby):
                    for bx in range(nbx):
                        data, np_, zbp, _, _ = encoded[(c, bi, bx, by)]
                        inc_tree.encode(bp, bx, by, 1)
                        if np_ == 0:
                            continue
                        t = 1
                        while not int(zbp_tree.truth[-1][by, bx]) < t:
                            zbp_tree.encode(bp, bx, by, t)
                            t += 1
                        zbp_tree.encode(bp, bx, by, t)
                        if np_ == 1:
                            bp.put(0)
                        elif np_ == 2:
                            bp.put_bits(0b10, 2)
                        elif np_ <= 5:
                            bp.put_bits(0b11, 2)
                            bp.put_bits(np_ - 3, 2)
                        elif np_ <= 36:
                            bp.put_bits(0b1111, 4)
                            bp.put_bits(np_ - 6, 5)
                        else:
                            bp.put_bits(0b1111, 4)
                            bp.put_bits(31, 5)
                            bp.put_bits(np_ - 37, 7)
                        lb = 3
                        nbits_needed = len(data).bit_length()
                        fixed = np_.bit_length() - 1
                        while lb + fixed < nbits_needed:
                            bp.put(1)
                            lb += 1
                        bp.put(0)
                        bp.put_bits(len(data), lb + fixed)
                        chunks.append(data)
            body += bp.flush()
            for d in chunks:
                body += d

    out = bytearray(b"\xff\x4f")
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, ncomp
    ) + b"".join(struct.pack(">BBB", depth - 1, 1, 1) for _ in range(ncomp))
    out += b"\xff\x51" + struct.pack(">H", 2 + len(siz)) + siz
    cod = bytes([0, 0]) + struct.pack(">H", 1) + bytes(
        [1 if mct else 0, n_levels, cb_exp, cb_exp, 0, 0]
    )
    out += b"\xff\x52" + struct.pack(">H", 2 + len(cod)) + cod
    if derived:
        qcd = bytes([(guard << 5) | 1]) + struct.pack(
            ">H", (eps0 << 11) | mu
        )
    else:
        qcd = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", (e << 11) | m) for e, m in eps_mu
        )
    out += b"\xff\x5c" + struct.pack(">H", 2 + len(qcd)) + qcd
    for c_ov, (d_ov, mu_ov) in (comp_mu or {}).items():
        qcc = bytes([c_ov, (guard << 5) | 2]) + b"".join(
            struct.pack(">H", ((e - d_ov) << 11) | mu_ov) for e, _ in eps_mu
        )
        out += b"\xff\x5d" + struct.pack(">H", 2 + len(qcc)) + qcc
    psot = 12 + 2 + len(body)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + body
    out += b"\xff\xd9"
    return bytes(out)


class TestIrreversible97:
    """9/7 float path: lossy by design, so the oracle is a tight error
    bound against the source (step ~1 quantization + float lifting
    keeps the round trip within a couple of codes)."""

    def test_gray_round_trip_close(self):
        rng = np.random.default_rng(21)
        yy, xx = np.mgrid[0:40, 0:56]
        px = np.clip(
            128 + 70 * np.sin(yy / 6) + 50 * np.cos(xx / 9)
            + rng.normal(0, 15, (40, 56)),
            0, 255,
        ).astype(np.uint8)
        out = decode_jpx(encode_jpx_97(px))
        d = np.abs(out.astype(int) - px.astype(int))
        assert d.max() <= 6 and d.mean() < 1.0

    def test_color_ict_round_trip_close(self):
        rng = np.random.default_rng(22)
        img = np.clip(rng.normal(128, 50, (24, 36, 3)), 0, 255).astype(
            np.uint8
        )
        out = decode_jpx(encode_jpx_97(img, mct=True))
        want = _luma(img)
        d = np.abs(out.astype(int) - want.astype(int))
        assert d.max() <= 6 and d.mean() < 1.0

    def test_flat_is_exact(self):
        px = np.full((16, 16), 200, np.uint8)
        assert np.array_equal(decode_jpx(encode_jpx_97(px, n_levels=1)), px)

    def test_derived_quantization(self):
        # Sqcd style 1: ONE signalled (eps0, mu); every band derives
        # its exponent via E-5 — decode must track the per-band steps
        rng = np.random.default_rng(48)
        yy, xx = np.mgrid[0:24, 0:40]
        px = np.clip(
            128 + 60 * np.sin(yy / 5) + 40 * np.cos(xx / 7)
            + rng.normal(0, 10, (24, 40)),
            0, 255,
        ).astype(np.uint8)
        data = encode_jpx_97(px, derived=True)
        # structural pin: the QCD body is guard byte + ONE 16-bit pair
        i = data.find(b"\xff\x5c")
        assert struct.unpack(">H", data[i + 2 : i + 4])[0] == 2 + 3
        out = decode_jpx(data)
        d = np.abs(out.astype(int) - px.astype(int))
        assert d.max() <= 6 and d.mean() < 1.0

    def test_qcc_per_component_quantization(self):
        # r5: QCC overrides quantization for one component (A.6.5) —
        # G coded 8x coarser; decode honors the per-component step
        rng = np.random.default_rng(40)
        img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        data = encode_jpx_97(img, comp_mu={1: (3, 512)})
        assert b"\xff\x5d" in data
        out = decode_jpx(data).astype(np.float64)
        want = _luma(img).astype(np.float64)
        assert np.abs(out - want).mean() < 7.0  # measured ~5.0
        # discrimination: dropping the QCC (decoder falls back to the
        # QCD step, 8x too fine) must blow the error up
        patched = bytearray(data)
        i = patched.find(b"\xff\x5d")
        (ln,) = struct.unpack(">H", patched[i + 2 : i + 4])
        del patched[i : i + 2 + ln]
        wrong = decode_jpx(bytes(patched)).astype(np.float64)
        assert np.abs(wrong - want).mean() > 9.0  # measured ~11.5

    def test_reversible_qcc_duplicate_is_neutral(self):
        px = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
        data = encode_jpx(px, n_levels=2)
        qcd_at = data.find(b"\xff\x5c")
        (qlen,) = struct.unpack(">H", data[qcd_at + 2 : qcd_at + 4])
        qcc = bytes([0]) + data[qcd_at + 4 : qcd_at + 2 + qlen]
        patched = (
            data[: qcd_at + 2 + qlen]
            + b"\xff\x5d" + struct.pack(">H", 2 + len(qcc)) + qcc
            + data[qcd_at + 2 + qlen :]
        )
        assert np.array_equal(decode_jpx(patched), px)

    def test_redundant_coc_is_neutral(self):
        # a COC restating the COD parameters must not change the
        # decode (real overrides are covered by TestPerComponentCoding)
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        data = encode_jpx(px, n_levels=2)
        cod_at = data.find(b"\xff\x52")
        lvl, cbw, cbh, style, transform = data[cod_at + 9 : cod_at + 14]
        coc = bytes([0, 0, lvl, cbw, cbh, style, transform])
        cseg = b"\xff\x53" + struct.pack(">H", 2 + len(coc)) + coc
        qcd_at = data.find(b"\xff\x5c")
        patched = data[:qcd_at] + cseg + data[qcd_at:]
        assert np.array_equal(decode_jpx(patched), px)

    def test_coarse_quantizer_still_plausible(self):
        rng = np.random.default_rng(23)
        px = np.clip(rng.normal(128, 40, (32, 32)), 0, 255).astype(np.uint8)
        # mu=1024 -> step 1.5x
        out = decode_jpx(encode_jpx_97(px, mu=1024))
        d = np.abs(out.astype(int) - px.astype(int))
        assert d.mean() < 2.0


def _split_single_tile(cs: bytes):
    """Walk a single-tile codestream: {marker: full segment bytes} for
    the main-header segments + the SOD body (tile-part payload)."""
    assert cs[:2] == b"\xff\x4f"
    i = 2
    segs = {}
    while i < len(cs):
        m = cs[i : i + 2]
        if m == b"\xff\x93":
            return segs, cs[i + 2 : -2]  # body up to EOC
        ln = struct.unpack(">H", cs[i + 2 : i + 4])[0]
        segs[m] = cs[i : i + 2 + ln]
        i += 2 + ln
    raise AssertionError("no SOD")


class TestPerTileTransformAndMct:
    """Per-tile COD overrides may flip the wavelet (5/3 <-> 9/7) or
    the MCT (A.4.2) — r5 session 4 removes the old typed errors: the
    assembled plane dtype covers all tiles and the inverse MCT applies
    per tile (pointwise, so it commutes with assembly)."""

    def test_per_tile_mct_change_exact(self):
        # tile 0 codes RGB directly, tile 1 through the reversible RCT
        # — both exact, so the luma contract holds across the seam
        rng = np.random.default_rng(91)
        img = rng.integers(0, 256, (8, 16, 3), dtype=np.uint8)
        data = encode_jpx(
            img, n_levels=2, tile=(8, 8), tile_ov={1: {"mct": True}}
        )
        out = decode_jpx(data)
        assert np.array_equal(out, _luma(img))

    def test_per_tile_mct_with_coding_override(self):
        # the MCT flip composes with a depth override in the same tile
        rng = np.random.default_rng(92)
        img = rng.integers(0, 256, (8, 16, 3), dtype=np.uint8)
        data = encode_jpx(
            img, n_levels=2, tile=(8, 8),
            tile_ov={1: {"mct": True, "nl": 1}},
        )
        assert np.array_equal(decode_jpx(data), _luma(img))

    def test_per_tile_transform_change_matches_independent_decodes(self):
        # tile 0 reversible 5/3, tile 1 irreversible 9/7 — spliced
        # from two single-tile encodes (even 8-px tile origins keep
        # band parities and block anchoring identical, so each tile
        # must decode exactly as its standalone stream does)
        rng = np.random.default_rng(93)
        img = rng.integers(0, 256, (8, 16), dtype=np.uint8)
        left, right = img[:, :8].copy(), img[:, 8:].copy()
        s53 = encode_jpx(left, n_levels=2)
        s97 = encode_jpx_97(right, n_levels=2)
        seg53, body53 = _split_single_tile(s53)
        seg97, body97 = _split_single_tile(s97)
        siz = struct.pack(
            ">HIIIIIIIIH", 0, 16, 8, 0, 0, 8, 8, 0, 0, 1
        ) + struct.pack(">BBB", 7, 1, 1)
        out = bytearray(b"\xff\x4f")
        out += b"\xff\x51" + struct.pack(">H", 2 + len(siz)) + siz
        out += seg53[b"\xff\x52"] + seg53[b"\xff\x5c"]  # main: 5/3
        psot0 = 12 + 2 + len(body53)
        out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot0, 0, 1)
        out += b"\xff\x93" + body53
        hdr1 = seg97[b"\xff\x52"] + seg97[b"\xff\x5c"]  # tile 1: 9/7
        psot1 = 12 + len(hdr1) + 2 + len(body97)
        out += b"\xff\x90" + struct.pack(">HHIBB", 10, 1, psot1, 0, 1)
        out += hdr1 + b"\xff\x93" + body97
        out += b"\xff\xd9"
        got = decode_jpx(bytes(out))
        assert got.shape == (8, 16)
        assert np.array_equal(got[:, :8], left)  # reversible tile exact
        assert np.array_equal(got[:, 8:], decode_jpx(s97))
