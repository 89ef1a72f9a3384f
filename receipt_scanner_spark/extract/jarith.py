"""Arithmetic-coded JPEG decode (SOF9 sequential, SOF10 progressive;
SOF11 lossless as of r5) — ITU-T T.81 Annex D QM-coder + the Annex
F.2 / G.2 / H.1.2.2 statistical models, stdlib + numpy only (r4).

This closes the last practical JPEG gap: baseline, extended
sequential, progressive and lossless Huffman processes already decode
(extract/jpeg.py); files re-encoded with ``jpegtran -arithmetic`` or
written by arithmetic-capable encoders were the remaining typed
error.

Structure (all from the public spec, independent of any library):

- ``_Arith``: the binary arithmetic decoder of T.81 §D.2.  The
  state-estimation table below is T.81 Table D.3 (113 adaptive
  states: Qe, NMPS, NLPS, SWITCH) plus the conventional non-adaptive
  0.5-probability state used for sign/refinement decisions.  The
  register convention: the interval ``a`` starts at 0x10000 (the full
  16-bit code range), the code window ``c`` accumulates stream bytes
  at the low end, and ``ct`` tracks the scale shift so comparisons
  test ``c < (a - qe) << ct`` — renormalization shifts ``a`` and
  decrements ``ct``; a byte feed adds 8.  Estimation happens only on
  renormalizing decisions, with conditional MPS/LPS exchange when the
  MPS subinterval shrinks below Qe (D.2.2-D.2.5).
- Entropy bytes use the same 0xFF 0x00 byte stuffing as Huffman
  scans (verified against a third-party encoder), so the shared
  ``_split_entropy`` unstuffing applies; past the terminating marker
  the decoder reads zero bytes (D.2.7 marker convention).
- DC decisions (F.2.2.1): per-component conditioning context from the
  previous diff's classification against the DAC L/U bounds
  (zero / small± / large±, 5 contexts × 4 bins), magnitude-category
  chain at bin 20, magnitude bits one bin per category at +14.
- AC decisions (F.2.2.2): three bins per zigzag index k (end-of-block,
  zero/nonzero, magnitude), sign through the fixed bin, category
  chains at 189 (k <= Kx) / 217 (k > Kx), magnitude bits at +14.
- Progressive (G.2): DC-first scans shift by Al; DC refinement is one
  fixed-bin decision per block; AC-first mirrors sequential AC over
  [Ss, Se]; AC refinement codes correction bits for known-nonzero
  coefficients and ±1<<Al for newly-significant ones, with the
  end-of-block decision active only beyond the previous stages' last
  nonzero index.
- Statistics areas are per destination-table, zeroed at scan start
  and at every restart marker; restart also re-initializes the
  decoder registers and DC predictions (F.2.2.4).

Verification: tests/test_jpeg_arith.py round-trips an independent
in-test QM *encoder* (the D.1 flowcharts with carry propagation and
0xFF stacking), and — the hard evidence — runs a differential oracle
against the system libjpeg (which ships both arithmetic directions):
libjpeg-encoded files must decode here, coefficient-preserving
Huffman↔arithmetic transcodes must decode bit-identically to the
Huffman originals through the shared IDCT, and the state table is
compared entry-for-entry against the one exported by the library
(tools/diff_jpeg_arith_oracle.py batches the same checks).

Reference parity: the reference (lib/image_processor.js) delegates
JPEG entirely to graphicsmagick/sharp; this keeps the library swap
config-only while removing one more "exotica" exclusion.

Scale note: arithmetic decode is one Python-loop decision per coded
bit (a few× slower than the Huffman path's per-symbol loop) —
correct, bounded, and acceptable for the mapInPandas multimodal
batch shape; a 100 TB image corpus swaps in a codec library at the
same seam the other decoders document.
"""

from __future__ import annotations

import numpy as np

from .jpeg import ZIGZAG

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) for the 113 adaptive
# states; index 113 is the conventional fixed 0.5-probability state
# (self-looping, never switches) used for sign and refinement
# decisions.  Cross-checked entry-for-entry against the table a
# third-party codec exports (tests/test_jpeg_arith.py).
_STATES = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed: never adapts, never switches
)

_QE = tuple(s[0] for s in _STATES)
_NMPS = tuple(s[1] for s in _STATES)
_NLPS = tuple(s[2] for s in _STATES)
_SW = tuple(s[3] for s in _STATES)

FIXED_STATE = 113  # index of the non-adaptive 0.5-probability state


class _Arith:
    """T.81 §D.2 binary arithmetic decoder over one (already
    byte-unstuffed) entropy-coded segment.  Reads zero bytes past the
    segment end — the spec's convention once the terminating marker
    is reached."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct")

    def __init__(self, seg: bytes):
        self.data = seg
        self.n = len(seg)
        self.bp = 0
        b0 = self._byte()
        b1 = self._byte()
        self.c = (b0 << 8) | b1
        self.a = 0x10000
        self.ct = 0

    def _byte(self) -> int:
        bp = self.bp
        if bp < self.n:
            self.bp = bp + 1
            return self.data[bp]
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        """Decode one binary decision in context ``stats[i]`` (state
        byte = MPS<<7 | table index), updating the estimation state on
        renormalizing decisions (D.2.2-D.2.5)."""
        sv = stats[i]
        idx = sv & 0x7F
        qe = _QE[idx]
        a = self.a - qe
        c = self.c
        ct = self.ct
        if c < (a << ct):
            if a & 0x8000:  # MPS, no renormalization: no estimation
                self.a = a
                return sv >> 7
            # MPS region with renormalization -> conditional exchange
            if a < qe:
                d = (sv >> 7) ^ 1
                stats[i] = ((sv ^ (_SW[idx] << 7)) & 0x80) | _NLPS[idx]
            else:
                d = sv >> 7
                stats[i] = (sv & 0x80) | _NMPS[idx]
        else:
            c -= a << ct
            if a < qe:  # conditional exchange: the LPS region codes MPS
                d = sv >> 7
                stats[i] = (sv & 0x80) | _NMPS[idx]
            else:
                d = (sv >> 7) ^ 1
                stats[i] = ((sv ^ (_SW[idx] << 7)) & 0x80) | _NLPS[idx]
            a = qe
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._byte()
                ct += 8
            a <<= 1
        self.a = a
        self.c = c
        self.ct = ct
        return d


def _new_fixed() -> bytearray:
    return bytearray((FIXED_STATE,))


# ---------------------------------------------------------------------------
# Statistical models (T.81 F.2.2): DC and AC coefficient decoding.
# ---------------------------------------------------------------------------


def _decode_dc_diff(dec, dcs, lu, prev_ctx):
    """One DC difference (F.2.2.1).  Returns (diff, new context)."""
    low, up = lu
    st = prev_ctx
    if dec.decode(dcs, st) == 0:
        return 0, 0
    sign = dec.decode(dcs, st + 1)
    stx = st + 2 + sign
    m = dec.decode(dcs, stx)
    if m:
        stx = 20  # Table F.4: X1
        while dec.decode(dcs, stx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG DC magnitude overflow")
            stx += 1
    # conditioning classification against the DAC L/U bounds
    if m < ((1 << low) >> 1):
        ctx = 0
    elif m > ((1 << up) >> 1):
        ctx = 12 + (sign << 2)
    else:
        ctx = 4 + (sign << 2)
    v = m
    stx += 14  # magnitude bits: one bin per category
    mm = m >> 1
    while mm:
        if dec.decode(dcs, stx):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), ctx


def _decode_ac_coefs(dec, acs, fixed, kx, ss, se, emit):
    """AC coefficients over zigzag [ss, se] (F.2.2.2): calls
    ``emit(k, value)`` for each nonzero coefficient."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(acs, st):
            return  # end of block
        while dec.decode(acs, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("JPEG AC coefficient index out of range")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(acs, st)
        if m:
            if dec.decode(acs, st):
                m = 2
                st = 189 if k <= kx else 217  # Table F.5: X2 chains
                while dec.decode(acs, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic JPEG AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m >> 1
        while mm:
            if dec.decode(acs, st):
                v |= mm
            mm >>= 1
        v += 1
        emit(k, -v if sign else v)
        k += 1


def _decode_lossless_diff(dec, dcs, low, up, st, db_large):
    """One Annex-H prediction difference (H.1.2.2): the DC decision
    tree at the (Da, Db)-conditioned 4-bin group ``st``; the magnitude
    category chain is selected by whether Db classified large.
    Returns (diff, 5-way class of this diff: 0 zero/small-L, 1 +small,
    2 -small, 3 +large, 4 -large)."""
    if dec.decode(dcs, st) == 0:
        return 0, 0
    sign = dec.decode(dcs, st + 1)
    stx = st + 2 + sign
    m = dec.decode(dcs, stx)
    if m:
        stx = 129 if db_large else 100  # two X1..X15 chains
        while dec.decode(dcs, stx):
            m <<= 1
            if m == 0x8000:
                raise ValueError(
                    "arithmetic lossless JPEG magnitude overflow"
                )
            stx += 1
    if m < ((1 << low) >> 1):
        cls = 0
    elif m > ((1 << up) >> 1):
        cls = 3 + sign
    else:
        cls = 1 + sign
    v = m
    stx += 14  # magnitude bits: one bin per category
    mm = m >> 1
    while mm:
        if dec.decode(dcs, stx):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), cls


def decode_lossless(
    frame, scan, dc_cond, precision, pred_sel, pt, restart_interval,
    segs, adobe_transform,
):
    """Arithmetic lossless scan (SOF11, T.81 Annex H): the shared
    Annex-H prediction/reconstruction driver (jpeg._lossless_reconstruct)
    with the H.1.2.2 entropy layer — each difference is coded by the
    DC decision tree conditioned on the 5x5 classification of the
    differences already decoded at positions a (left) and b (above)
    against the DAC L/U bounds, with the magnitude-category chain
    chosen by Db's class.  Statistics layout per conditioning table:
    bins 0-99 = 4 x (5*Da_class + Db_class) zero/sign/first-magnitude
    groups, 100-128 / 129-157 = the Db-small / Db-large X1..X15 chains
    with magnitude bits at failing-X + 14 (the Table F.4 spacing the
    sequential DC model uses).  Boundary samples (row 0 / column 0 /
    after restart) condition on class 0; restarts zero the statistics
    and the class history (F.2.2.4).  No host codec supports this
    process (libjpeg-turbo has no lossless), so the evidence tier is
    the in-test encoder round-trip, like SOF3."""
    from .jpeg import _lossless_reconstruct

    _H, W, comps = frame
    ncomp = len(comps)
    tds = []
    conds = []
    for cid, _h, _v, _tq in comps:
        if cid not in scan:
            raise ValueError("scan component not in frame")
        td, _ta = scan[cid]
        tds.append(td)
        conds.append(dc_cond.get(td, (0, 1)))
    stats = {td: bytearray(158) for td in tds}
    state = {"dec": None}
    prev_cls = [np.zeros(W, np.uint8) for _ in range(ncomp)]
    cur_cls = [np.zeros(W, np.uint8) for _ in range(ncomp)]
    pos = {"x": -1, "y": 0}

    def start_segment(idx):
        state["dec"] = _Arith(segs[idx])
        for st_ in stats.values():
            st_[:] = bytes(158)
        for r_ in prev_cls:
            r_[:] = 0
        for r_ in cur_cls:
            r_[:] = 0

    def next_diff(ci):
        if ci == 0:
            pos["x"] += 1
            if pos["x"] == W:
                pos["x"] = 0
                pos["y"] += 1
                for c2 in range(ncomp):
                    prev_cls[c2][:] = cur_cls[c2]
                    cur_cls[c2][:] = 0
        x = pos["x"]
        ca = int(cur_cls[ci][x - 1]) if x else 0
        cb = int(prev_cls[ci][x])
        diff, cls = _decode_lossless_diff(
            state["dec"], stats[tds[ci]], conds[ci][0], conds[ci][1],
            4 * (ca * 5 + cb), cb >= 3,
        )
        cur_cls[ci][x] = cls
        return diff

    return _lossless_reconstruct(
        frame, precision, pred_sel, pt, restart_interval, len(segs),
        start_segment, next_diff, adobe_transform,
    )


def lossless_scan_into(
    frame, scan, dc_cond, precision, pred_sel, pt, restart_interval,
    segs, planes, pts, differential: bool = False,
) -> None:
    """Arithmetic lossless (SOF11), general form: component-SUBSET
    scans (multi-scan, T.81 B.2.3) and 4-channel frames, decoded into
    ``planes[cid]`` for jpeg._lossless_finish to assemble at EOI —
    the SOF11 twin of jpeg._lossless_scan_general.  Every scan is an
    independent QM stream: fresh statistics and class history per
    scan and per restart (F.2.2.4), conditioning exactly as
    decode_lossless (whose verified full-scan fast path is untouched).
    Subsampled arithmetic lossless stays a typed gap — no producer or
    oracle for the MCU walk exists anywhere.

    ``differential``: Annex-J differential-lossless (SOF15) scans —
    predictor select 0, each decoded value IS the mod-2^16 difference
    signal (the entropy conditioning classifies the coded values the
    same way either mode)."""
    from .jpeg import _lossless_predict

    H, W, comps = frame
    if any(h != 1 or v != 1 for _cid, h, v, _tq in comps):
        raise NotImplementedError("subsampled arithmetic-lossless JPEG")
    if differential:
        if pred_sel != 0:
            raise ValueError(
                "differential lossless scan with nonzero predictor"
            )
    elif not 1 <= pred_sel <= 7:
        raise ValueError(f"bad lossless predictor {pred_sel}")
    frame_ids = {cid for cid, _h, _v, _tq in comps}
    scomps = []
    for cid, (td, _ta) in scan.items():
        if cid not in frame_ids:
            raise ValueError("scan component not in frame")
        scomps.append((cid, td))
    if restart_interval == 0 and len(segs) > 1:
        raise ValueError("restart markers without DRI")
    stats: dict[int, bytearray] = {}
    conds = {}
    for _cid, td in scomps:
        stats.setdefault(td, bytearray(158))
        conds[td] = dc_cond.get(td, (0, 1))
    prev_cls = {cid: np.zeros(W, np.uint8) for cid, _td in scomps}
    cur_cls = {cid: np.zeros(W, np.uint8) for cid, _td in scomps}
    default = 1 << (precision - 1 - pt)
    for cid, _td in scomps:
        planes[cid] = np.zeros((H, W), np.int32)
        pts[cid] = pt
    state = {"dec": _Arith(segs[0]), "seg": 0}
    fresh = {cid: True for cid, _td in scomps}

    def next_segment():
        state["seg"] += 1
        if state["seg"] >= len(segs):
            raise ValueError("missing JPEG restart segment")
        state["dec"] = _Arith(segs[state["seg"]])
        for st_ in stats.values():
            st_[:] = bytes(158)
        for r_ in prev_cls.values():
            r_[:] = 0
        for r_ in cur_cls.values():
            r_[:] = 0
        for cid in fresh:
            fresh[cid] = True

    count = 0
    for y in range(H):
        for x in range(W):
            if restart_interval and count == restart_interval:
                next_segment()
                count = 0
            for cid, td in scomps:
                ca = int(cur_cls[cid][x - 1]) if x else 0
                cb = int(prev_cls[cid][x])
                diff, cls = _decode_lossless_diff(
                    state["dec"], stats[td], conds[td][0], conds[td][1],
                    4 * (ca * 5 + cb), cb >= 3,
                )
                cur_cls[cid][x] = cls
                pl = planes[cid]
                if differential:  # the value IS the difference signal
                    pl[y, x] = diff & 0xFFFF
                    continue
                px = _lossless_predict(
                    pl, y, x, pred_sel, default, fresh[cid]
                )
                fresh[cid] = False
                pl[y, x] = (px + diff) & 0xFFFF
            count += 1
        for cid, _td in scomps:
            prev_cls[cid][:] = cur_cls[cid]
            cur_cls[cid][:] = 0


# ---------------------------------------------------------------------------
# Sequential scan (SOF9)
# ---------------------------------------------------------------------------


def decode_sequential(
    frame, scan, qtables, dc_cond, ac_cond, restart_interval, segs,
    adobe_transform, precision: int = 8,
):
    """Arithmetic extended-sequential scan: same MCU geometry,
    coefficient stores, IDCT and plane assembly as the Huffman path
    (jpeg._decode_scan) with the entropy layer swapped."""
    from .jpeg import _assemble_planes, _compose, _seq_layout

    H, W, _ = frame
    comps, hmax, vmax, mcus_x, mcus_y = _seq_layout(frame)
    for cid, h, v, tq in comps:
        if tq not in qtables:
            raise ValueError(f"JPEG references missing quant table {tq}")
        if cid not in scan:
            raise ValueError("scan component not in frame")

    stores = [
        np.zeros((mcus_x * mcus_y * h * v, 64), dtype=np.float64)
        for _, h, v, _ in comps
    ]
    dc_stats = {td: bytearray(64) for td, _ in scan.values()}
    ac_stats = {ta: bytearray(256) for _, ta in scan.values()}
    fixed = _new_fixed()
    ncomp = len(comps)
    n_mcus = mcus_x * mcus_y
    mcu = 0
    for seg in segs:
        dec = _Arith(seg)
        for st in dc_stats.values():
            st[:] = bytes(64)  # restart/scan start zeroes statistics
        for st in ac_stats.values():
            st[:] = bytes(256)
        fixed[:] = _new_fixed()
        last_dc = [0] * ncomp
        dc_ctx = [0] * ncomp
        end = (
            min(mcu + restart_interval, n_mcus)
            if restart_interval
            else n_mcus
        )
        while mcu < end:
            for ci, (cid, h, v, tq) in enumerate(comps):
                td, ta = scan[cid]
                qt = qtables[tq]
                dcs = dc_stats[td]
                acs = ac_stats[ta]
                lu = dc_cond.get(td, (0, 1))
                kx = ac_cond.get(ta, 5)
                store = stores[ci]
                base = mcu * h * v
                for b in range(h * v):
                    out = store[base + b]
                    diff, dc_ctx[ci] = _decode_dc_diff(
                        dec, dcs, lu, dc_ctx[ci]
                    )
                    last_dc[ci] += diff
                    out[0] = last_dc[ci] * qt[0]

                    def emit(k, val, out=out, qt=qt):
                        out[ZIGZAG[k]] = val * qt[k]

                    _decode_ac_coefs(dec, acs, fixed, kx, 1, 63, emit)
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError("truncated JPEG entropy stream")

    planes = _assemble_planes(stores, comps, mcus_x, mcus_y, precision)
    return _compose(planes, comps, hmax, vmax, H, W, adobe_transform)


def sequential_scan_into(
    state, seg, dc_cond, ac_cond, restart_interval, segs
) -> None:
    """One full-band arithmetic scan of a multi-scan sequential frame
    (T.81 B.2.3 with the Annex-F entropy layer — the scan-script shape
    ``jpegtran -arithmetic`` emits), decoded into the progressive
    store; jpeg._finish_progressive assembles at EOI.  Statistics and
    the DC context zero at scan start and restarts (F.2.1.1)."""
    from .jpeg import _interleaved_units, _noninterleaved_units

    ns = seg[0]
    by_id = {cid: ci for ci, (cid, _, _, _) in enumerate(state.comps)}
    scan_comps = []
    for c in range(ns):
        cs = seg[1 + 2 * c]
        if cs not in by_id:
            raise ValueError("scan component not in frame")
        td_ta = seg[2 + 2 * c]
        scan_comps.append((by_id[cs], td_ta >> 4, td_ta & 0x0F))
    if ns > 1:
        units = _interleaved_units(state, scan_comps)
    else:
        units = _noninterleaved_units(state, scan_comps[0])
    dc_stats = {td: bytearray(64) for _, td, _ in scan_comps}
    ac_stats = {ta: bytearray(256) for _, _, ta in scan_comps}
    fixed = _new_fixed()
    n_units = len(units)
    nfc = len(state.comps)
    unit = 0
    for seg_bytes in segs:
        dec = _Arith(seg_bytes)
        for st in dc_stats.values():
            st[:] = bytes(64)
        for st in ac_stats.values():
            st[:] = bytes(256)
        fixed[:] = _new_fixed()
        last_dc = [0] * nfc
        dc_ctx = [0] * nfc
        end = (
            min(unit + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        while unit < end:
            for ci, td, ta, blk in units[unit]:
                lu = dc_cond.get(td, (0, 1))
                kx = ac_cond.get(ta, 5)
                diff, dc_ctx[ci] = _decode_dc_diff(
                    dec, dc_stats[td], lu, dc_ctx[ci]
                )
                last_dc[ci] += diff
                blk[0] = last_dc[ci]

                def emit(k, val, blk=blk):
                    blk[ZIGZAG[k]] = val

                _decode_ac_coefs(
                    dec, ac_stats[ta], fixed, kx, 1, 63, emit
                )
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError("truncated JPEG entropy stream")
    state.n_scans += 1


# ---------------------------------------------------------------------------
# Progressive scans (SOF10) — G.2, persisting into jpeg._ProgState
# ---------------------------------------------------------------------------


def progressive_scan(
    state, seg, dc_cond, ac_cond, restart_interval, segs
) -> None:
    """Decode one arithmetic progressive SOS into ``state`` (a
    jpeg._ProgState); scan ordering/unit geometry shared with the
    Huffman path."""
    from .jpeg import _interleaved_units, _noninterleaved_units

    ns = seg[0]
    scan_comps = []  # (comp index, td, ta)
    by_id = {cid: ci for ci, (cid, _, _, _) in enumerate(state.comps)}
    for c in range(ns):
        cs = seg[1 + 2 * c]
        if cs not in by_id:
            raise ValueError("scan component not in frame")
        td_ta = seg[2 + 2 * c]
        scan_comps.append((by_id[cs], td_ta >> 4, td_ta & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah_al = seg[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0x0F

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ns > 1:
            units = _interleaved_units(state, scan_comps)
        else:
            units = _noninterleaved_units(state, scan_comps[0])
    else:  # AC scan: always one component
        if ns != 1 or se > 63 or ss > se:
            raise ValueError("bad progressive AC scan header")
        units = _noninterleaved_units(state, scan_comps[0])

    dc_stats = {td: bytearray(64) for _, td, _ in scan_comps}
    ac_stats = {ta: bytearray(256) for _, _, ta in scan_comps}
    fixed = _new_fixed()
    n_units = len(units)
    ncomp = len(state.comps)
    unit = 0
    for seg_bytes in segs:
        dec = _Arith(seg_bytes)
        for st in dc_stats.values():
            st[:] = bytes(64)
        for st in ac_stats.values():
            st[:] = bytes(256)
        fixed[:] = _new_fixed()
        last_dc = [0] * ncomp
        dc_ctx = [0] * ncomp
        end = (
            min(unit + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        while unit < end:
            for ci, td, ta, blk in units[unit]:
                if ss == 0:
                    if ah == 0:
                        diff, dc_ctx[ci] = _decode_dc_diff(
                            dec, dc_stats[td], dc_cond.get(td, (0, 1)),
                            dc_ctx[ci],
                        )
                        last_dc[ci] += diff
                        blk[0] = last_dc[ci] << al
                    else:
                        if dec.decode(fixed, 0):  # G.2: one fixed decision
                            blk[0] |= 1 << al
                elif ah == 0:
                    _ac_first_block(
                        dec, ac_stats[ta], fixed, ac_cond.get(ta, 5),
                        blk, ss, se, al,
                    )
                else:
                    _ac_refine_block(
                        dec, ac_stats[ta], fixed, blk, ss, se, al
                    )
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError("truncated JPEG entropy stream")
    state.n_scans += 1


def _ac_first_block(dec, acs, fixed, kx, blk, ss, se, al):
    def emit(k, val, blk=blk, al=al):
        blk[ZIGZAG[k]] = val << al

    _decode_ac_coefs(dec, acs, fixed, kx, ss, se, emit)


def _ac_refine_block(dec, acs, fixed, blk, ss, se, al):
    """G.2 AC successive-approximation refinement: correction bits for
    known-nonzero coefficients, ±1<<Al for newly-significant ones; the
    end-of-block decision is only coded beyond the previous stages'
    last nonzero index (EOBx)."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and blk[ZIGZAG[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(acs, st):
                return
        while True:
            z = ZIGZAG[k]
            cur = blk[z]
            if cur:
                if dec.decode(acs, st + 2):
                    blk[z] = cur + (m1 if cur < 0 else p1)
                break
            if dec.decode(acs, st + 1):
                blk[z] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("JPEG AC coefficient index out of range")
        k += 1
