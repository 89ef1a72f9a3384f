"""JPEG 2000 (ITU-T T.800 / JPX) decode for the PDF ``JPXDecode``
filter — stdlib + numpy only (r4).

The last named codec gap: PDFs embed JPEG 2000 codestreams via
/JPXDecode, and scanners/DMS exports use the reversible (lossless)
profile for archival pages.  This implements the decoding path those
files take:

- **Codestream layer** (Annex A): SOC/SIZ/COD/QCD/COM/SOT/SOD/EOC
  markers, component sub-sampling fields validated, single-tile
  images (the PDF norm), default precincts (one per resolution).
- **Tier-2** (Annex B): packet decoding in LRCP progression with the
  bit-stuffed packet-header reader, inclusion and zero-bitplane TAG
  TREES (B.10.2), the coding-pass count codeword, and Lblock length
  signalling; multiple quality layers accumulate passes per block.
- **Tier-1** (Annex D): the EBCOT coefficient-bit decoder over the
  MQ coder (reused from extract/jbig2 — T.88 Annex E == T.800
  Annex C): significance propagation / magnitude refinement /
  cleanup passes in stripe-column scan order, zero-coding contexts
  per subband orientation (Table D.1), sign contexts with XOR flip
  (Table D.3), magnitude-refinement and run-length/UNIFORM contexts,
  spec initial states (ZC0=4, RL=3, UNI=46).
- **Reconstruction** (Annexes E/F/G): reversible 5/3 inverse wavelet
  (integer lifting with symmetric extension), the reversible
  component transform (RCT), DC level shift, and the partial-bitplane
  reconstruction rule for truncated blocks.  The irreversible 9/7
  path decodes too: float lifting synthesis, scalar-expounded
  dequantization with the deadzone mid-point reconstruction
  (E.1.1.2, r = 0.5), and the irreversible color transform — its
  in-test oracle is a tight error bound rather than bit equality,
  since the profile is lossy by design.

Verification: NO JPEG 2000 codec exists in this container (no
openjpeg/grok/kakadu/Pillow), so the evidence tier matches
extract/ccitt.py and extract/jbig2.py: an independent in-test
ENCODER (tests/test_jpx.py — forward DWT/RCT, full EBCOT tier-1
encoder over the in-test MQ encoder, tag-tree and packet-header
builders) round-trips bit-exactly for the reversible profile, the
context tables are pinned structurally, and the PDF JPXDecode
plumbing runs end-to-end.  The MQ coder itself is shared with
extract/jbig2.py where it has full round-trip coverage.

Since r5 the tier-2 layer is general: multi-tile images, chroma
sub-sampling, QCC per-component quantization, SOP/EPH markers, all
five progression orders, and custom precinct partitions (B.6 —
per-precinct packets and tag trees, effective code-block clipping
per B.7, positional emission orders per B.12.1.3-5; the default
maximal 2^15 precinct is the same partition with ppx = ppy = 15).
Also r5: reference-grid offsets (B.3 — XOsiz/YOsiz image anchors,
XTOsiz/YTOsiz tile anchors, odd resolution origins handled by the
general-parity F.3.8 lifting in both filters), the maxshift region
of interest (A.6.3 RGN + the H.2 downshift rule), and scalar
DERIVED quantization (E-5: one signalled pair, per-band exponents
eps_0 - N_L + n_b).

Also r5: real per-component coding overrides (A.6.2 COC — each
component may carry its own decomposition depth, code-block
geometry/style, transform, and precinct partition; band structure,
packet sequencing, and emission anchors all go per-component, and
components lacking a resolution contribute no packets there per
B.12).  Mixed reversible/irreversible components decode; the MCT
still requires a uniform transform on components 0-2 (J.2).

Tile-part header overrides decode too (A.4.2): COD/COC/QCD/QCC/RGN
in a tile's first tile-part re-resolve that tile's coding state with
Table A.10/A.11 precedence (tile COC > tile COD > main COC > main
COD, same for quantization); coding markers in non-first tile-parts
are rejected per the standard.

Packed packet headers decode too: PPT (A.7.5 — the tile's segments
reassemble in Zppt order across tile-parts) and PPM (A.7.4 — the
main-header stream carries one (Nppm, headers) chunk per tile-part
in codestream order; segment boundaries may fall mid-field).  In
both forms the packet headers and EPH markers come from the packed
stream while the SOD body carries only packet bodies (and SOP
markers); mixing PPM with PPT is rejected per the standard.

POC progression-order changes decode as well (A.6.6/B.12): packets
emit progression-volume by volume, each segment in its own
progression over its resolution/component bounds, skipping packets
an earlier volume already emitted; the COD progression byte is
superseded, and a first-tile-part POC supersedes the main-header
POC for its tile.  Tier-2 is COMPLETE: every packet-sequencing
mechanism in T.800 Annex A/B has a decode path.

Honest boundary (typed errors): per-tile transform/MCT changes (the
assembled image carries one dtype per component).

Scale note: tier-1 is one MQ decision per coefficient-bit in Python
(same bound as the JBIG2/CCITT paths); the wavelet and color
transforms are vectorized numpy.  Same honest 100 TB statement as
the other decoders: swap a codec library at this exact seam.
"""

from __future__ import annotations

import struct

import numpy as np

from .jbig2 import _MQDecoder

# EBCOT contexts: 0-8 zero coding, 9-13 sign, 14-16 refinement,
# 17 run-length, 18 uniform (T.800 Table D.7 initial states)
N_CTX = 19


def new_mq_contexts() -> bytearray:
    cx = bytearray(N_CTX)
    cx[0] = 4  # ZC all-quiet context
    cx[17] = 3  # run-length
    cx[18] = 46  # uniform
    return cx


# zero-coding context tables (Table D.1), indexed [h][v][d] clipped
def _build_zc(orient: str):
    tbl = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                hh, vv = (v, h) if orient == "HL" else (h, v)
                if orient == "HH":
                    dd = min(d, 3)
                    hv = min(hh + vv, 2)
                    if dd >= 3:
                        c = 8
                    elif dd == 2:
                        c = 7 if hv >= 1 else 6
                    elif dd == 1:
                        c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                    else:
                        c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                else:
                    if hh == 2:
                        c = 8
                    elif hh == 1:
                        c = 7 if vv >= 1 else (6 if d >= 1 else 5)
                    elif vv == 2:
                        c = 4
                    elif vv == 1:
                        c = 3
                    else:
                        c = 2 if d >= 2 else (1 if d == 1 else 0)
                tbl[(h, v, d)] = c
    return tbl


_ZC = {"LL": _build_zc("LL"), "LH": _build_zc("LL"),
       "HL": _build_zc("HL"), "HH": _build_zc("HH")}

# sign-coding contexts (Table D.3): (hc, vc) in [-1..1] ->
# (context, xor bit)
_SC = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _TagTree:
    """B.10.2 tag tree over a w x h leaf grid.  Each node carries a
    running lower bound (``value``) and a ``known`` flag set once the
    bound is the exact value; a query for "leaf < threshold" consumes
    exactly the bits the encoder emitted for that threshold."""

    def __init__(self, w: int, h: int):
        self.levels = []
        while True:
            self.levels.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        self.levels.reverse()  # root first
        self.value = [np.zeros((hh, ww), np.int32) for ww, hh in self.levels]
        self.known = [np.zeros((hh, ww), np.int32) for ww, hh in self.levels]

    def decode(self, br, x: int, y: int, threshold: int) -> bool:
        """Is leaf value < threshold?  Reads bits as needed."""
        low = 0
        n = len(self.levels)
        for li in range(n):
            shift = n - 1 - li
            xx, yy = x >> shift, y >> shift
            if self.value[li][yy, xx] < low:
                self.value[li][yy, xx] = low
            while (
                not self.known[li][yy, xx]
                and self.value[li][yy, xx] < threshold
            ):
                if br.bit():
                    self.known[li][yy, xx] = 1
                else:
                    self.value[li][yy, xx] += 1
            if not self.known[li][yy, xx]:
                return False  # bound reached threshold: leaf >= threshold
            low = int(self.value[li][yy, xx])
        return low < threshold

    def leaf_value(self, x: int, y: int) -> int:
        return int(self.value[-1][y, x])


class _PacketBits:
    """Packet-header bit reader with 0xFF bit-stuffing (B.10.1)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.byte = 0
        self.left = 0
        self.last_was_one = False

    def bit(self) -> int:
        if self.left == 0:
            if self.byte == 0xFF:
                self.left = 7  # stuffed bit after 0xFF
            else:
                self.left = 8
            if self.pos >= len(self.data):
                raise ValueError("truncated JPX packet header")
            self.byte = self.data[self.pos]
            self.pos += 1
        self.left -= 1
        b = (self.byte >> self.left) & 1
        self.last_was_one = bool(b)
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: skip to byte boundary (consuming the
        stuff bit if the last full byte was 0xFF)."""
        self.left = 0
        if self.byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPX packet header")
            self.pos += 1  # the stuffing byte itself
        return self.pos


# ---------------------------------------------------------------------------
# tier-1: EBCOT code-block decode (Annex D)
# ---------------------------------------------------------------------------


class _RawBits:
    """D.8 raw (selective-bypass) codeword-segment reader: MSB-first
    bits with the 0xFF stuffing rule — the byte after an 0xFF carries
    only 7 data bits (its MSB is a stuffed 0).  Exhausted segments
    feed 0xFF padding like the MQ reader; the pass loop bounds total
    reads, so no cap is needed here."""

    __slots__ = ("data", "pos", "cur", "nbits", "prev_ff")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            if self.prev_ff:
                self.cur = b & 0x7F
                self.nbits = 7
            else:
                self.cur = b
                self.nbits = 8
            self.prev_ff = b == 0xFF
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1


def _seg_cap(style: int, idx: int) -> int:
    """Codeword-segment pass capacities implied by the block style's
    termination points (D.4 / B.10.7.2), as a capacity sequence (the
    same model OpenJPEG uses): TERMALL gives every pass its own
    segment; BYPASS gives one 10-pass MQ segment (the first four
    bitplanes), then alternating raw SP+MR pairs and single MQ
    cleanups; plain streams are one unbounded segment."""
    if style & 0x04:
        return 1
    if style & 0x01:
        if idx == 0:
            return 10
        return 2 if idx & 1 else 1
    return 1 << 30


def decode_codeblock(
    data, w: int, h: int, n_passes: int, zbp: int, mb: int,
    orient: str, style: int = 0,
):
    """Decode one code block's coefficient magnitudes/signs.

    Returns (magnitude int32 array, sign int8 array, n_decoded_bitplanes).
    ``mb`` is the maximum bitplane count for the band; coding starts
    at bitplane mb-1-zbp with a cleanup pass.  ``data`` is the block's
    codeword bytes — a LIST of codeword segments when the style has
    termination points (bypass / terminate-all), else one byte string.
    ``style`` is the SPcod code-block style byte (Table A.19): 0x01
    selective MQ bypass, 0x02 context reset on pass boundaries, 0x04
    termination on every pass, 0x08 vertically causal contexts, 0x10
    predictable termination (a decoder no-op), 0x20 segmentation
    symbols (checked, mismatch is a hard error)."""
    if n_passes <= 0:
        return np.zeros((h, w), np.int32), np.zeros((h, w), np.int8), 0
    if isinstance(data, (bytes, bytearray)):
        segments = [bytes(data)]
    else:
        segments = [bytes(s) for s in data]
    bypass = bool(style & 0x01)
    reset = bool(style & 0x02)
    termall = bool(style & 0x04)
    causal = bool(style & 0x08)
    segsym = bool(style & 0x20)
    n_bp = (n_passes + 2) // 3
    cx = new_mq_contexts()
    zc = _ZC[orient]
    mag = np.zeros((h, w), np.int64)
    sig = np.zeros((h + 2, w + 2), np.int8)  # padded significance
    sgn = np.zeros((h + 2, w + 2), np.int8)  # padded signs (+1/-1)
    visited = np.zeros((h, w), np.int8)
    refined = np.zeros((h, w), np.int8)  # had a refinement already

    def neighbors(y, x):
        yy, xx = y + 1, x + 1
        hcount = int(sig[yy, xx - 1]) + int(sig[yy, xx + 1])
        if causal and (y & 3) == 3:
            # vertically causal (D.7): from the last row of a stripe
            # the stripe below reads as insignificant
            vcount = int(sig[yy - 1, xx])
            dcount = int(sig[yy - 1, xx - 1]) + int(sig[yy - 1, xx + 1])
        else:
            vcount = int(sig[yy - 1, xx]) + int(sig[yy + 1, xx])
            dcount = (
                int(sig[yy - 1, xx - 1]) + int(sig[yy - 1, xx + 1])
                + int(sig[yy + 1, xx - 1]) + int(sig[yy + 1, xx + 1])
            )
        return hcount, vcount, dcount

    def decode_sign(y, x, dec):
        yy, xx = y + 1, x + 1
        hc = int(sgn[yy, xx - 1]) + int(sgn[yy, xx + 1])
        if causal and (y & 3) == 3:
            vc = int(sgn[yy - 1, xx])
        else:
            vc = int(sgn[yy - 1, xx]) + int(sgn[yy + 1, xx])
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        ctx, flip = _SC[(hc, vc)]
        s = dec.decode(cx, ctx) ^ flip
        sgn[yy, xx] = -1 if s else 1
        sig[yy, xx] = 1

    def sp_pass(bit, dec, raw):
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
                    if raw:
                        if dec.bit():
                            # raw sign: one bit, 1 = negative, no
                            # context and no XOR flip (D.8.1)
                            sgn[y + 1, x + 1] = -1 if dec.bit() else 1
                            sig[y + 1, x + 1] = 1
                            mag[y, x] = bit
                    elif dec.decode(cx, zc[(hc, vc, min(dc, 4))]):
                        decode_sign(y, x, dec)
                        mag[y, x] = bit

    def mr_pass(bit, dec, raw):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if not sig[y + 1, x + 1] or visited[y, x]:
                        continue
                    if raw:
                        if dec.bit():
                            mag[y, x] |= bit
                    else:
                        if not refined[y, x]:
                            hc, vc, dc = neighbors(y, x)
                            ctx = 15 if hc + vc + dc else 14
                            refined[y, x] = 1
                        else:
                            ctx = 16
                        if dec.decode(cx, ctx):
                            mag[y, x] |= bit
                    visited[y, x] = 1

    def cl_pass(bit, dec):
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                ylim = min(y0 + 4, h)
                # run-length mode: full stripe column, all quiet
                if (
                    ylim - y0 == 4
                    and not any(visited[y0 : y0 + 4, x])
                    and not any(sig[y0 + 1 : y0 + 5, x + 1])
                    and all(
                        neighbors(yy, x) == (0, 0, 0)
                        for yy in range(y0, y0 + 4)
                    )
                ):
                    if not dec.decode(cx, 17):  # run-length: all four zero
                        for yy in range(y0, ylim):
                            visited[yy, x] = 0
                        continue
                    pos = (dec.decode(cx, 18) << 1) | dec.decode(cx, 18)
                    y = y0 + pos
                    decode_sign(y, x, dec)
                    mag[y, x] = bit
                    y += 1
                while y < ylim:
                    if not sig[y + 1, x + 1] and not visited[y, x]:
                        hc, vc, dc = neighbors(y, x)
                        if dec.decode(cx, zc[(hc, vc, min(dc, 4))]):
                            decode_sign(y, x, dec)
                            mag[y, x] = bit
                    visited[y, x] = 0
                    y += 1
                for yy in range(y0, ylim):
                    visited[yy, x] = 0

    seg_iter = iter(segments)
    dec = None
    need_new = True
    for pi in range(n_passes):
        pt = 2 if pi == 0 else (pi - 1) % 3  # 0=SP 1=MR 2=CL
        b_ord = 0 if pi == 0 else (pi + 2) // 3
        bit = 1 << (n_bp - 1 - b_ord)  # relative bitplane weight
        raw = bypass and pi >= 10 and pt != 2
        if need_new:
            try:
                segd = next(seg_iter)
            except StopIteration:
                raise ValueError("JPX missing codeword segment") from None
            dec = _RawBits(segd) if raw else _MQDecoder(segd)
            need_new = False
        if pt == 0:
            sp_pass(bit, dec, raw)
        elif pt == 1:
            mr_pass(bit, dec, raw)
        else:
            cl_pass(bit, dec)
            if segsym:
                v = 0
                for _ in range(4):
                    v = (v << 1) | dec.decode(cx, 18)
                if v != 0xA:
                    raise ValueError("JPX segmentation symbol mismatch")
        if reset:
            cx[:] = new_mq_contexts()
        # segment terminations (mirrors _seg_cap): TERMALL after every
        # pass; BYPASS after the 10th pass and thereafter after each
        # MR (raw-pair end) and CL (MQ segment end)
        if termall or (bypass and (pi == 9 or (pi > 9 and pt != 0))):
            need_new = True
    # scale to absolute bitplanes: coding started at mb-1-zbp
    shift = (mb - zbp) - n_bp
    if shift < 0:
        raise ValueError("JPX bitplane accounting underflow")
    mags = (mag << shift).astype(np.int64)
    signs = sgn[1 : h + 1, 1 : w + 1]
    return mags, signs, n_bp


# ---------------------------------------------------------------------------
# inverse 5/3 wavelet (Annex F, reversible)
# ---------------------------------------------------------------------------


def _inv_53_1d(lo: np.ndarray, hi: np.ndarray, parity: int = 0) -> np.ndarray:
    """One inverse 5/3 lifting step along axis 0 (T.800 F.3.8, general
    interval).  ``lo`` holds the samples at EVEN absolute positions of
    the interval, ``hi`` the odd ones; ``parity`` is the absolute
    parity of the interval's first sample (F.3.8's i0 & 1) — an odd
    origin puts the first local sample in the H band and flips the
    roles of the two lifting steps."""
    n = lo.shape[0] + hi.shape[0]
    tail = lo.shape[1:] if lo.shape[0] else hi.shape[1:]
    x = np.zeros((n,) + tail, np.int64)
    if parity == 0:
        x[0::2] = lo
        x[1::2] = hi
    else:
        x[0::2] = hi
        x[1::2] = lo
    if n == 1:
        # single-sample interval (F.3.8): even passes through, odd
        # halves (the forward transform doubled it, so this is exact)
        return x if parity == 0 else (x >> 1)

    def at(idx):
        # whole-sample symmetric extension about the interval ends
        # (F.3.7) — reflection preserves absolute parity
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx > n - 1, 2 * (n - 1) - idx, idx)
        return x[idx]

    ev = np.arange(parity, n, 2)  # absolute-even local indices
    od = np.arange(1 - parity, n, 2)  # absolute-odd local indices
    # even update: x[2n] -= floor((x[2n-1] + x[2n+1] + 2) / 4)
    x[ev] = x[ev] - ((at(ev - 1) + at(ev + 1) + 2) >> 2)
    # odd predict: x[2n+1] += floor((x[2n] + x[2n+2]) / 2)
    x[od] = x[od] + ((at(od - 1) + at(od + 1)) >> 1)
    return x


def _inv_53_2d(ll, hl, lh, hh, px: int = 0, py: int = 0):
    """One 2D synthesis level from the four subbands; ``px``/``py`` are
    the horizontal/vertical parities of the target resolution rect's
    origin (both 0 for origin-0 tiles)."""
    lo = _merge_cols(ll, hl, px)
    hi = _merge_cols(lh, hh, px)
    return _merge_rows(lo, hi, py)


def _merge_cols(lo, hi, parity: int = 0):
    tmp = _inv_53_1d(lo.T.astype(np.int64), hi.T.astype(np.int64), parity)
    return tmp.T


def _merge_rows(lo, hi, parity: int = 0):
    return _inv_53_1d(lo.astype(np.int64), hi.astype(np.int64), parity)


# ---------------------------------------------------------------------------
# codestream parse + tier-2 packet decode (Annexes A/B)
# ---------------------------------------------------------------------------


def _pass_count(br: _PacketBits) -> int:
    """B.10.6 coding-pass count codeword."""
    if not br.bit():
        return 1
    if not br.bit():
        return 2
    v = br.bits(2)
    if v < 3:
        return 3 + v
    v = br.bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.bits(7)


def _ceil_div(a: int, b: int) -> int:
    """Ceiling division (negative-safe for the band-offset numerators)."""
    return -(-a // b)


_BAND_OFFS = {"LL": (0, 0), "HL": (1, 0), "LH": (0, 1), "HH": (1, 1)}


def _band_coords(tcx0, tcy0, tcx1, tcy1, lvl, orient):
    """T.800 eq. B-15: subband rectangle (on the band's own coordinate
    grid) for the tile-component rect [tcx0,tcx1)x[tcy0,tcy1) at
    decomposition level ``lvl``.  For origin-0 rects this reduces to the
    familiar ceil/floor halving recursion."""
    xob, yob = _BAND_OFFS[orient]
    s, h2 = 1 << lvl, 1 << (lvl - 1)
    return (
        _ceil_div(tcx0 - h2 * xob, s),
        _ceil_div(tcy0 - h2 * yob, s),
        _ceil_div(tcx1 - h2 * xob, s),
        _ceil_div(tcy1 - h2 * yob, s),
    )


class _Prec:
    """One precinct of one band: the contiguous code-block sub-grid it
    covers (absolute grid-cell indices) and ITS OWN inclusion /
    zero-bitplane tag trees (B.10.2 — trees are per band-precinct)."""

    __slots__ = ("gx0", "gy0", "nbx", "nby", "inc_tree", "zbp_tree")

    def __init__(self, gx0, gy0, nbx, nby):
        self.gx0, self.gy0 = gx0, gy0
        self.nbx, self.nby = nbx, nby
        self.inc_tree = _TagTree(nbx, nby)
        self.zbp_tree = _TagTree(nbx, nby)


class _Band:
    __slots__ = ("orient", "x0", "y0", "w", "h", "coeff", "coeff_f",
                 "blocks", "nbx", "nby", "m0x", "m0y", "mb",
                 "cbw", "cbh", "precincts")

    def __init__(self, orient, x0, y0, x1, y1, cb_w, cb_h, mb):
        self.orient = orient
        self.x0, self.y0 = x0, y0
        self.w, self.h = max(0, x1 - x0), max(0, y1 - y0)
        self.mb = mb
        self.cbw, self.cbh = cb_w, cb_h
        self.coeff = np.zeros((self.h, self.w), np.int64)
        self.coeff_f = np.zeros((self.h, self.w), np.float64)
        if self.w and self.h:
            # code-block grid anchored at the band-grid origin (B.7):
            # a tile whose band rect starts mid-cell gets a partial
            # first code-block.
            self.m0x = x0 // cb_w
            self.m0y = y0 // cb_h
            self.nbx = _ceil_div(x1, cb_w) - self.m0x
            self.nby = _ceil_div(y1, cb_h) - self.m0y
        else:
            self.nbx = self.nby = self.m0x = self.m0y = 0
        self.blocks = {}
        self.precincts = []

    def add_precincts(self, cells, pw, ph):
        """Partition the band into precincts (B.6): precinct grid of
        ``pw x ph`` anchored at the band origin; ``cells`` lists the
        absolute cell indices of the resolution's precincts in raster
        order.  A precinct whose intersection with the band rect is
        empty contributes no code-blocks (None placeholder)."""
        x1, y1 = self.x0 + self.w, self.y0 + self.h
        for kx, ky in cells:
            px0 = max(self.x0, kx * pw)
            py0 = max(self.y0, ky * ph)
            px1 = min(x1, (kx + 1) * pw)
            py1 = min(y1, (ky + 1) * ph)
            if px0 >= px1 or py0 >= py1:
                self.precincts.append(None)
                continue
            gx0, gy0 = px0 // self.cbw, py0 // self.cbh
            self.precincts.append(_Prec(
                gx0, gy0,
                _ceil_div(px1, self.cbw) - gx0,
                _ceil_div(py1, self.cbh) - gy0,
            ))

    def block_rect(self, bx, by):
        """Local (x0, y0, w, h) of grid cell (bx, by) inside coeff."""
        gx, gy = self.m0x + bx, self.m0y + by
        x0 = max(self.x0, gx * self.cbw)
        y0 = max(self.y0, gy * self.cbh)
        x1 = min(self.x0 + self.w, (gx + 1) * self.cbw)
        y1 = min(self.y0 + self.h, (gy + 1) * self.cbh)
        return x0 - self.x0, y0 - self.y0, x1 - x0, y1 - y0


def decode_jpx(data: bytes) -> np.ndarray:
    """JPEG 2000 codestream -> (h, w) uint8 luma (decode_pixels
    contract).  Accepts a raw codestream (SOC...) or a JP2 container
    (the 'jp2c' box is located first)."""
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
        # JP2 container: find the contiguous codestream box
        i = 0
        n = len(data)
        stream = None
        while i + 8 <= n:
            (ln,) = struct.unpack(">I", data[i : i + 4])
            tag = data[i + 4 : i + 8]
            if ln == 0:
                ln = n - i
            if tag == b"jp2c":
                stream = data[i + 8 : i + ln]
                break
            if ln < 8:
                raise ValueError("bad JP2 box length")
            i += ln
        if stream is None:
            raise ValueError("JP2 container has no codestream box")
        data = stream
    if data[:2] != b"\xff\x4f":
        raise ValueError("not a JPEG 2000 codestream (no SOC)")

    pos = 2
    n = len(data)
    siz = cod = qcd = None
    rgn_segs: list[bytes] = []
    qccs: list = []
    cocs: list = []
    poc_seg: bytes | None = None
    tile_parts: dict = {}  # isot -> [(tpsot, body)]
    tile_hdrs: dict = {}  # isot -> [(marker, seg)] first-part overrides
    tile_ppts: dict = {}  # isot -> [(zppt, seq, data)] packed headers
    ppms: list = []  # [(zppm, seq, data)] main-header packed headers
    tp_order: list = []  # isot per tile-part, in codestream order
    while pos + 4 <= n:
        marker = data[pos : pos + 2]
        if marker == b"\xff\xd9":  # EOC
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == b"\xff\x51":
            siz = seg
        elif marker == b"\xff\x52":
            cod = seg
        elif marker == b"\xff\x5c":
            qcd = seg
        elif marker == b"\xff\x5d":  # QCC: per-component quantization
            qccs.append(seg)
        elif marker == b"\xff\x53":  # COC: per-component coding
            cocs.append(seg)
        elif marker == b"\xff\x90":  # SOT
            isot, psot = struct.unpack(">HI", seg[0:6])
            tpsot = seg[6] if len(seg) > 6 else 0
            tile_end = pos + psot if psot else n
            # find SOD within this tile-part
            sod = data.find(b"\xff\x93", pos)
            if sod < 0:
                raise ValueError("JPX tile-part without SOD")
            # tile-part header markers between SOT and SOD (A.4.2):
            # COD/COC/QCD/QCC/RGN/POC override the main header FOR
            # THIS TILE and are only legal in its first tile-part;
            # PPT packed headers may appear in any tile-part;
            # informational PLT/COM are safe to skip
            hp = pos + 2 + ln
            while hp + 4 <= sod:
                hm = data[hp : hp + 2]
                (hln,) = struct.unpack(">H", data[hp + 2 : hp + 4])
                if hln < 2:
                    raise ValueError("bad JPX tile-part header segment")
                if hm in (b"\xff\x52", b"\xff\x53", b"\xff\x5c",
                          b"\xff\x5d", b"\xff\x5e", b"\xff\x5f"):
                    if tpsot != 0:
                        raise ValueError(
                            "JPX coding marker in a non-first tile-part"
                        )
                    tile_hdrs.setdefault(isot, []).append(
                        (hm, data[hp + 4 : hp + 2 + hln])
                    )
                elif hm == b"\xff\x61":
                    # PPT (A.7.5): packed packet headers for this
                    # tile — legal in ANY of its tile-parts; Zppt
                    # orders the concatenation
                    seg_p = data[hp + 4 : hp + 2 + hln]
                    if not seg_p:
                        raise ValueError("empty JPX PPT segment")
                    lst = tile_ppts.setdefault(isot, [])
                    lst.append((seg_p[0], len(lst), seg_p[1:]))
                hp += 2 + hln
            tile_parts.setdefault(isot, []).append(
                (tpsot, data[sod + 2 : tile_end])
            )
            tp_order.append(isot)
            pos = tile_end
            continue
        elif marker == b"\xff\x5e":
            rgn_segs.append(seg)
        elif marker == b"\xff\x5f":
            # POC (A.6.6): progression order change — parsed after
            # SIZ (entry width depends on the component count); the
            # last main-header POC wins
            poc_seg = seg
        elif marker == b"\xff\x60":
            # PPM (A.7.4): main-header packed packet headers — the
            # concatenated stream is (Nppm, headers) per TILE-PART in
            # codestream order; Zppm orders the segments
            if len(seg) < 1:
                raise ValueError("empty JPX PPM segment")
            ppms.append((seg[0], len(ppms), seg[1:]))
        elif marker == b"\xff\x61":
            raise ValueError("JPX PPT outside a tile-part header")
        pos += 2 + ln
    if siz is None or cod is None or qcd is None:
        raise ValueError("JPX missing SIZ/COD/QCD")
    if not tile_parts:
        raise ValueError("JPX with no tile-parts")
    if ppms:
        # A.7.4: the concatenated PPM stream (Zppm order) carries one
        # (Nppm, packed headers) chunk per TILE-PART in codestream
        # order; distribute into the same per-tile store PPT uses.
        # PPM and PPT are mutually exclusive per the standard.
        if tile_ppts:
            raise ValueError("JPX PPM and PPT in the same codestream")
        stream = b"".join(d for _z, _s, d in sorted(ppms))
        sp = 0
        for isot in tp_order:
            if sp + 4 > len(stream):
                raise ValueError("JPX PPM stream truncated")
            (nppm,) = struct.unpack(">I", stream[sp : sp + 4])
            sp += 4
            chunk = stream[sp : sp + nppm]
            if len(chunk) < nppm:
                raise ValueError("JPX PPM stream truncated")
            sp += nppm
            lst = tile_ppts.setdefault(isot, [])
            lst.append((len(lst), len(lst), chunk))

    xsiz, ysiz, xo, yo, xt, yt, xto, yto, ncomp = struct.unpack(
        ">IIIIIIIIH", siz[2:36]
    )
    # grid offsets (B.3): image area [XOsiz,Xsiz)x[YOsiz,Ysiz); tiles
    # anchor at (XTOsiz, YTOsiz) with XTOsiz <= XOsiz and the first
    # tile overlapping the image area
    if xo >= xsiz or yo >= ysiz:
        raise ValueError("JPX image offsets outside the grid")
    if xt == 0 or yt == 0:
        raise ValueError("bad JPX tile size")
    if xto > xo or yto > yo or xto + xt <= xo or yto + yt <= yo:
        raise ValueError("bad JPX tile offsets")
    from .imaging import check_pixel_budget

    check_pixel_budget(xsiz, ysiz)
    # RGN (A.6.3): only the maxshift style (Srgn = 0) exists in T.800;
    # the decoder rule is H.2 — any coefficient >= 2^SPrgn is ROI and
    # shifts down by SPrgn, and the component's bands carry SPrgn
    # extra magnitude bitplanes
    def apply_rgn(dst, seg_r):
        if ncomp < 257:
            crgn, srgn, sprgn = seg_r[0], seg_r[1], seg_r[2]
        else:
            crgn = struct.unpack(">H", seg_r[:2])[0]
            srgn, sprgn = seg_r[2], seg_r[3]
        if srgn != 0:
            raise ValueError(f"bad JPX RGN style {srgn}")
        dst[crgn] = sprgn

    rgn_shift: dict[int, int] = {}
    for seg in rgn_segs:
        apply_rgn(rgn_shift, seg)
    comps = []  # (bit depth, xr, yr); sign bit of Ssiz unused here
    for c in range(ncomp):
        ssiz, xr, yr = struct.unpack(">BBB", siz[36 + 3 * c : 39 + 3 * c])
        if xr < 1 or yr < 1:
            raise ValueError("bad JPX sub-sampling factor")
        comps.append(((ssiz & 0x7F) + 1, xr, yr))

    # POC (A.6.6): (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc) per
    # progression volume; packets emit segment by segment, each in its
    # own progression, skipping packets already emitted.  CEpoc = 0
    # means the maximum component count.
    def parse_poc(seg_p):
        esz = 7 if ncomp < 257 else 9
        if not seg_p or len(seg_p) % esz:
            raise ValueError("bad JPX POC segment length")
        out_p = []
        for i in range(0, len(seg_p), esz):
            e_p = seg_p[i : i + esz]
            if ncomp < 257:
                rs0, cs0 = e_p[0], e_p[1]
                ly1 = (e_p[2] << 8) | e_p[3]
                re1, ce1, pk = e_p[4], e_p[5], e_p[6]
                if ce1 == 0:
                    ce1 = 256
            else:
                rs0 = e_p[0]
                cs0 = (e_p[1] << 8) | e_p[2]
                ly1 = (e_p[3] << 8) | e_p[4]
                re1 = e_p[5]
                ce1 = (e_p[6] << 8) | e_p[7]
                pk = e_p[8]
                if ce1 == 0:
                    ce1 = 16384
            if pk > 4:
                raise ValueError(f"bad JPX POC progression {pk}")
            if re1 <= rs0 or ce1 <= cs0 or ly1 == 0:
                raise ValueError("bad JPX POC bounds")
            out_p.append((rs0, cs0, ly1, re1, min(ce1, ncomp), pk))
        return out_p

    pocs: list[tuple] = parse_poc(poc_seg) if poc_seg is not None else []

    def parse_coding(spbytes, has_prec):
        """SPcod/SPcoc -> per-component coding dict (A.6.1/A.6.2):
        decomposition levels, code-block geometry/style, transform,
        and the precinct-size list (default: maximal 2^15 precincts —
        the SAME general partition with ppx = ppy = 15)."""
        if len(spbytes) < 5:
            raise ValueError("JPX coding parameters truncated")
        nl = spbytes[0]
        cbw = 1 << (spbytes[1] + 2)
        cbh = 1 << (spbytes[2] + 2)
        style = spbytes[3]
        xform = spbytes[4]
        if style & ~0x3F:
            raise NotImplementedError(f"JPX code-block style 0x{style:02x}")
        if xform not in (0, 1):
            raise ValueError("bad JPX transform type")
        if has_prec:
            pbytes = spbytes[5 : 5 + nl + 1]
            if len(pbytes) != nl + 1:
                raise ValueError("JPX precinct sizes truncated")
            prec = [(b & 0x0F, b >> 4) for b in pbytes]
            if any(
                (px == 0 or py == 0) and r > 0
                for r, (px, py) in enumerate(prec)
            ) or any(px > 15 or py > 15 for px, py in prec):
                raise ValueError("bad JPX precinct exponent")
        else:
            prec = [(15, 15)] * (nl + 1)
        return {
            "n_levels": nl, "cb_w": cbw, "cb_h": cbh, "style": style,
            "reversible": xform == 1, "prec": prec,
        }

    def apply_coc(comp_coding, cseg):
        """A.6.2: per-component coding override onto the coding list."""
        if ncomp < 257:
            cc_i, scoc, rest = cseg[0], cseg[1], cseg[2:]
        else:
            cc_i = (cseg[0] << 8) | cseg[1]
            scoc, rest = cseg[2], cseg[3:]
        if cc_i >= ncomp:
            raise ValueError("JPX COC component out of range")
        comp_coding[cc_i] = parse_coding(rest, scoc & 0x01)

    def parse_quant(seg_q, reversible):
        """Sqcd/Sqcc + fields -> (guard, exps, mus, derived)."""
        s = seg_q[0]
        g = s >> 5
        qs = s & 0x1F
        derived = False
        if reversible:
            if qs != 0:
                raise NotImplementedError("JPX quantization mismatch (5/3)")
            e = [b >> 3 for b in seg_q[1:]]
            m = [0] * len(e)
        elif qs == 1:
            # scalar derived (E.1.1, eq. E-5): ONE signalled pair; band
            # b at decomposition level n_b uses eps_0 - N_L + n_b
            if len(seg_q) < 3:
                raise ValueError("JPX derived quantization truncated")
            v = (seg_q[1] << 8) | seg_q[2]
            e, m, derived = [v >> 11], [v & 0x7FF], True
        elif qs == 2:
            body = seg_q[1:]
            e, m = [], []
            for k in range(0, len(body) - 1, 2):
                v = (body[k] << 8) | body[k + 1]
                e.append(v >> 11)
                m.append(v & 0x7FF)
        else:
            raise ValueError(f"bad JPX quantization style {qs}")
        if not e:
            raise ValueError("empty JPX quantization segment")
        return g, e, m, derived

    def apply_qcc(comp_quant, comp_coding, q):
        """A.6.5: per-component quantization override."""
        if ncomp < 257:
            cq, rest = q[0], q[1:]
        else:
            cq, rest = (q[0] << 8) | q[1], q[2:]
        if cq >= ncomp:
            raise ValueError("JPX QCC component out of range")
        comp_quant[cq] = parse_quant(rest, comp_coding[cq]["reversible"])

    # bands per component: [(level, orient)] in resolution order
    def make_band_list(nl):
        bl = [(nl, "LL")]
        for r in range(1, nl + 1):
            bl += [(nl - r + 1, "HL"), (nl - r + 1, "LH"),
                   (nl - r + 1, "HH")]
        return bl

    def build_state(cod_seg, cocs_eff, qcd_seg, qccs_eff):
        """Effective COD/COC/QCD/QCC marker segments -> resolved
        tier-2 state.  The caller applies A.4.2 precedence by choosing
        which segments are effective and their order (Tables A.10 and
        A.11: tile COC > tile COD > main COC > main COD; tile QCC >
        tile QCD > main QCC > main QCD)."""
        scod = cod_seg[0]
        prog = cod_seg[1]
        if prog > 4:
            raise ValueError(f"bad JPX progression order {prog}")
        comp_coding = [parse_coding(cod_seg[5:], scod & 0x01)] * ncomp
        for cseg in cocs_eff:
            apply_coc(comp_coding, cseg)
        comp_quant = [
            parse_quant(qcd_seg, comp_coding[c]["reversible"])
            for c in range(ncomp)
        ]
        for q in qccs_eff:
            apply_qcc(comp_quant, comp_coding, q)
        return {
            "use_sop": bool(scod & 0x02),
            "use_eph": bool(scod & 0x04),
            "prog": prog,
            "layers": struct.unpack(">H", cod_seg[2:4])[0],
            "mct": cod_seg[4],
            "comp_coding": comp_coding,
            "comp_quant": comp_quant,
            "band_lists": [
                make_band_list(comp_coding[c]["n_levels"])
                for c in range(ncomp)
            ],
            "max_levels": max(
                comp_coding[c]["n_levels"] for c in range(ncomp)
            ),
        }

    main_st = build_state(cod, cocs, qcd, qccs)

    def decode_tile(tdata: bytes, rects, st, rgn_shift, ppt=None,
                    pocs=()):
        """Tier-2 + tier-1 + inverse DWT for ONE tile.  ``rects`` holds
        the per-component tile rect [(tcx0, tcy0, tcx1, tcy1)] on each
        component's own (sub-sampled) grid; ``st`` is the tile's
        resolved coding state (main header, or the tile-part override
        state); ``ppt``: concatenated PPT data — packet HEADERS (and
        EPH markers) come from this stream while the SOD body carries
        only packet bodies (and SOP markers); returns one array per
        component of exactly that rect's shape."""
        comp_coding = st["comp_coding"]
        comp_quant = st["comp_quant"]
        band_lists = st["band_lists"]
        max_levels = st["max_levels"]
        prog, layers = st["prog"], st["layers"]
        use_sop, use_eph = st["use_sop"], st["use_eph"]

        def band_exp(c, bi):
            _g, e, _m, derived = comp_quant[c]
            if derived:
                # E-5: eps_b = eps_0 - N_L + n_b (band's decomp level)
                return (e[0] - comp_coding[c]["n_levels"]
                        + band_lists[c][bi][0])
            return e[bi] if bi < len(e) else e[-1]

        def band_mu(c, bi):
            _g, _e, m, derived = comp_quant[c]
            if derived:
                return m[0]
            return m[bi] if bi < len(m) else m[-1]

        comp_bands = []
        prec_anchors = []  # [c][r] -> [(x_em, y_em)] per precinct
        for c in range(ncomp):
            cc = comp_coding[c]
            n_levels = cc["n_levels"]
            prec_sizes = cc["prec"]
            cb_w, cb_h, cb_style = cc["cb_w"], cc["cb_h"], cc["style"]
            tcx0, tcy0, tcx1, tcy1 = rects[c]
            _, xr, yr = comps[c]
            bands = []
            anchors = []
            res_cells = []  # per r: precinct cell list (raster)
            for r in range(n_levels + 1):
                ppx, ppy = prec_sizes[r]
                sh = 1 << (n_levels - r)
                trx0, try0 = _ceil_div(tcx0, sh), _ceil_div(tcy0, sh)
                trx1, try1 = _ceil_div(tcx1, sh), _ceil_div(tcy1, sh)
                # precinct partition of the resolution rect (B.6),
                # anchored at the resolution-grid origin
                if trx0 < trx1 and try0 < try1:
                    ki0, kj0 = trx0 >> ppx, try0 >> ppy
                    npw = _ceil_div(trx1, 1 << ppx) - ki0
                    nph = _ceil_div(try1, 1 << ppy) - kj0
                else:
                    ki0 = kj0 = npw = nph = 0
                cells = [
                    (ki0 + i, kj0 + j)
                    for j in range(nph)
                    for i in range(npw)
                ]
                res_cells.append(cells)
                # emission anchor per precinct on the reference grid
                # (B.12.1.3-5): the precinct's first sample position,
                # clipped to the tile origin for a mid-cell start
                anchors.append([
                    (
                        max(tcx0 * xr, (kx << ppx) * sh * xr),
                        max(tcy0 * yr, (ky << ppy) * sh * yr),
                    )
                    for kx, ky in cells
                ])
            for bi, (lvl, orient) in enumerate(band_lists[c]):
                r = 0 if orient == "LL" else n_levels - lvl + 1
                ppx, ppy = prec_sizes[r]
                # effective code-block size (B.7): clipped to the
                # precinct projected onto the band grid
                bshift = 0 if r == 0 else 1
                ecw = min(cb_w, 1 << max(ppx - bshift, 0))
                ech = min(cb_h, 1 << max(ppy - bshift, 0))
                bx0, by0, bx1, by1 = _band_coords(
                    tcx0, tcy0, tcx1, tcy1, lvl, orient
                )
                # RGN maxshift adds SPrgn magnitude bitplanes to every
                # band of the component (H.2)
                mb = (comp_quant[c][0] + band_exp(c, bi) - 1
                      + rgn_shift.get(c, 0))
                band = _Band(orient, bx0, by0, bx1, by1, ecw, ech, mb)
                band.add_precincts(
                    res_cells[r],
                    1 << max(ppx - bshift, 0),
                    1 << max(ppy - bshift, 0),
                )
                bands.append(band)
            comp_bands.append(bands)
            prec_anchors.append(anchors)

        # tier-2: packet loop over (layer, resolution, component,
        # precinct).  LRCP/RLCP iterate precincts in raster order;
        # the position-based orders (RPCL/PCRL/CPRL) iterate precinct
        # emission anchors on the reference grid (B.12.1.3-5).
        # a component with fewer decomposition levels contributes no
        # packets at the resolutions it lacks (B.12)
        def order_of(prog_k, ls, rs, cs):
            """Packet order for one progression over the given layer/
            resolution/component ranges (B.12.1.1-5)."""
            if prog_k == 0:
                return [
                    (l, r, c, p)
                    for l in ls for r in rs for c in cs
                    if r < len(prec_anchors[c])
                    for p in range(len(prec_anchors[c][r]))
                ]
            if prog_k == 1:
                return [
                    (l, r, c, p)
                    for r in rs for l in ls for c in cs
                    if r < len(prec_anchors[c])
                    for p in range(len(prec_anchors[c][r]))
                ]
            entries = [
                (c, r, p, xy[0], xy[1])
                for c in cs for r in rs
                if r < len(prec_anchors[c])
                for p, xy in enumerate(prec_anchors[c][r])
            ]
            if prog_k == 2:  # RPCL
                entries.sort(key=lambda e: (e[1], e[4], e[3], e[0]))
            elif prog_k == 3:  # PCRL
                entries.sort(key=lambda e: (e[4], e[3], e[0], e[1]))
            else:  # 4 = CPRL
                entries.sort(key=lambda e: (e[0], e[4], e[3], e[1]))
            return [
                (l, r, c, p) for c, r, p, _x, _y in entries for l in ls
            ]

        if pocs:
            # A.6.6/B.12: progression volumes in order, each in its
            # own progression; a packet already emitted by an earlier
            # volume is skipped
            packet_order = []
            seen_pk: set = set()
            for rs0, cs0, ly1, re1, ce1, pk in pocs:
                for t in order_of(
                    pk,
                    range(min(ly1, layers)),
                    range(rs0, min(re1, max_levels + 1)),
                    range(cs0, min(ce1, ncomp)),
                ):
                    if t not in seen_pk:
                        seen_pk.add(t)
                        packet_order.append(t)
        else:
            packet_order = order_of(
                prog, range(layers), range(max_levels + 1), range(ncomp)
            )
        pos = 0
        hpos = 0  # header-stream position (PPT); mirrors pos inline
        hdata = tdata if ppt is None else ppt
        lblocks = {}
        included_layers = {}
        seg_state = {}  # key -> [segments started, passes in open seg]
        for layer, r, c, p in packet_order:
            if use_sop and tdata[pos : pos + 2] == b"\xff\x91":
                pos += 6  # SOP marker segment (A.8.1): may precede any packet
            bands = comp_bands[c]
            bis = [0] if r == 0 else [1 + (r - 1) * 3 + k for k in range(3)]
            if ppt is None:
                hpos = pos
            br = _PacketBits(hdata, hpos)
            if not br.bit():  # empty packet
                hpos = br.align()
                if use_eph:
                    if hdata[hpos : hpos + 2] != b"\xff\x92":
                        raise ValueError("JPX missing EPH marker")
                    hpos += 2
                if ppt is None:
                    pos = hpos
                continue
            todo = []
            for bi in bis:
                band = bands[bi]
                prec = band.precincts[p] if band.precincts else None
                if prec is None:
                    continue
                for py in range(prec.nby):
                    for px in range(prec.nbx):
                        # block coords relative to the band's grid
                        bx = prec.gx0 + px - band.m0x
                        by = prec.gy0 + py - band.m0y
                        key = (c, bi, bx, by)
                        first_layer = key not in included_layers
                        if first_layer:
                            inc = prec.inc_tree.decode(
                                br, px, py, layer + 1
                            )
                        else:
                            inc = bool(br.bit())
                        if not inc:
                            continue
                        if first_layer:
                            t = 1
                            while not prec.zbp_tree.decode(br, px, py, t):
                                t += 1
                            zbp = t - 1
                            included_layers[key] = zbp
                            lblocks[key] = 3
                        np_ = _pass_count(br)
                        lb = lblocks[key]
                        while br.bit():
                            lb += 1
                        lblocks[key] = lb
                        # one length per codeword segment the new
                        # passes touch (B.10.7.2); the plain style is
                        # one unbounded segment -> exactly one length
                        st = seg_state.setdefault(key, [0, 0])
                        cb_style = comp_coding[c]["style"]
                        parts = []
                        rem = np_
                        while rem:
                            if (
                                st[0] == 0
                                or st[1] >= _seg_cap(cb_style, st[0] - 1)
                            ):
                                st[0] += 1
                                st[1] = 0
                            cap = _seg_cap(cb_style, st[0] - 1)
                            k = min(rem, cap - st[1])
                            nbits = lb + (k.bit_length() - 1)
                            parts.append((st[0] - 1, br.bits(nbits)))
                            st[1] += k
                            rem -= k
                        todo.append((bi, bx, by, np_, parts))
            hpos = br.align()
            if use_eph:
                if hdata[hpos : hpos + 2] != b"\xff\x92":
                    raise ValueError("JPX missing EPH marker")
                hpos += 2
            if ppt is None:
                pos = hpos
            for bi, bx, by, np_, parts in todo:
                key = (c, bi, bx, by)
                band = bands[bi]
                blk = band.blocks.setdefault(
                    key, {"segs": [], "passes": 0}
                )
                for si, ln in parts:
                    while len(blk["segs"]) <= si:
                        blk["segs"].append(bytearray())
                    blk["segs"][si] += tdata[pos : pos + ln]
                    pos += ln
                blk["passes"] += np_

        # tier-1 per code block, then assemble bands
        for c in range(ncomp):
            reversible = comp_coding[c]["reversible"]
            for bi, (lvl, orient) in enumerate(band_lists[c]):
                band = comp_bands[c][bi]
                for (kc, bbi, bx, by), blk in list(band.blocks.items()):
                    if (kc, bbi) != (c, bi):
                        continue
                    x0, y0, w, h = band.block_rect(bx, by)
                    zbp = included_layers[(c, bi, bx, by)]
                    mags, signs, _nbp = decode_codeblock(
                        [bytes(s) for s in blk["segs"]], w, h,
                        blk["passes"], zbp, band.mb, orient,
                        style=comp_coding[c]["style"],
                    )
                    s_roi = rgn_shift.get(c, 0)
                    if s_roi:
                        # H.2: magnitudes at or above 2^SPrgn are ROI
                        # coefficients the encoder upshifted — undo
                        mags = np.where(
                            mags >= (1 << s_roi), mags >> s_roi, mags
                        )
                    if not reversible:
                        gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[orient]
                        rb = comps[c][0] + gain
                        step = (2.0 ** (rb - band_exp(c, bi))) * (
                            1.0 + band_mu(c, bi) / 2048.0
                        )
                        # deadzone reconstruction (E.1.1.2): nonzero
                        # magnitudes sit mid-interval (r = 0.5)
                        rec = np.where(mags > 0, mags + 0.5, 0.0) * signs
                        band.coeff_f[y0 : y0 + h, x0 : x0 + w] = rec * step
                    else:
                        band.coeff[y0 : y0 + h, x0 : x0 + w] = mags * signs

        # inverse DWT per component (symmetric extension at TILE
        # boundaries — each tile-component transforms independently);
        # each synthesis level targets the resolution rect whose origin
        # parity (B.5: trx0 = ceil(tcx0 / 2^(n_levels-r))) drives the
        # even/odd interleave — odd origins occur with grid offsets
        planes = []
        for c in range(ncomp):
            reversible = comp_coding[c]["reversible"]
            n_levels = comp_coding[c]["n_levels"]
            tcx0, tcy0 = rects[c][0], rects[c][1]
            bands = comp_bands[c]
            attr = "coeff" if reversible else "coeff_f"
            cur = getattr(bands[0], attr)
            merge = _inv_53_2d if reversible else _inv_97_2d
            for r in range(1, n_levels + 1):
                sh = 1 << (n_levels - r)
                u0, v0 = _ceil_div(tcx0, sh), _ceil_div(tcy0, sh)
                hl = getattr(bands[1 + (r - 1) * 3 + 0], attr)
                lh = getattr(bands[1 + (r - 1) * 3 + 1], attr)
                hh = getattr(bands[1 + (r - 1) * 3 + 2], attr)
                cur = merge(cur, hl, lh, hh, u0 & 1, v0 & 1)
            planes.append(cur)
        return planes

    # tile grid (B.3): tiles anchor at (XTOsiz, YTOsiz) and clip to
    # the image area [XOsiz,Xsiz)x[YOsiz,Ysiz); stitch every tile into
    # per-component planes on each component's own sub-sampled grid
    # (allocated from 0 — the offset margin stays zero and is cropped)
    ntx, nty = _ceil_div(xsiz - xto, xt), _ceil_div(ysiz - yto, yt)
    n_tiles = ntx * nty
    missing = [t for t in range(n_tiles) if t not in tile_parts]
    if missing:
        raise ValueError(f"JPX missing tiles {missing[:4]} of {n_tiles}")

    def tile_state(t):
        """Resolve tile t's coding state: first-tile-part COD/COC/QCD/
        QCC/RGN/POC markers override the main header for that tile
        alone (A.4.2).  The tile transform and MCT must match the
        image (the assembled planes carry one dtype per component).
        Returns (state, rgn_shift, pocs) for the tile."""
        hdrs = tile_hdrs.get(t)
        if not hdrs:
            return main_st, rgn_shift, pocs
        t_cod = next((s for m, s in hdrs if m == b"\xff\x52"), None)
        t_qcd = next((s for m, s in hdrs if m == b"\xff\x5c"), None)
        t_cocs = [s for m, s in hdrs if m == b"\xff\x53"]
        t_qccs = [s for m, s in hdrs if m == b"\xff\x5d"]
        t_rgns = [s for m, s in hdrs if m == b"\xff\x5e"]
        # Table A.10/A.11 precedence: a tile COD/QCD displaces the
        # main-header COCs/QCCs; without one they remain in effect
        # under the tile's own overrides
        cocs_eff = t_cocs if t_cod is not None else list(cocs) + t_cocs
        qccs_eff = t_qccs if t_qcd is not None else list(qccs) + t_qccs
        st = build_state(
            cod if t_cod is None else t_cod, cocs_eff,
            qcd if t_qcd is None else t_qcd, qccs_eff,
        )
        rs = dict(rgn_shift)
        for seg_r in t_rgns:
            apply_rgn(rs, seg_r)
        t_poc = next((s for m, s in hdrs if m == b"\xff\x5f"), None)
        # a tile-part POC supersedes the main-header POC for the tile
        pocs_t = parse_poc(t_poc) if t_poc is not None else pocs
        return st, rs, pocs_t

    # resolve every tile's coding up front: per-tile COD/COC may flip
    # a component's wavelet (5/3 <-> 9/7) or the MCT, so the assembled
    # plane dtype must cover ALL tiles (reversible int64 values embed
    # exactly in float64 — depths are <= 16 bits + guard), and the
    # inverse MCT applies per tile (it is a tile coding property,
    # A.6.1/J.2 — the pointwise transform commutes with assembly)
    tile_resolved = {
        t: tile_state(t) for t in range(nty * ntx)
    }
    comp_float = [
        any(
            not st["comp_coding"][c]["reversible"]
            for st, _rs, _pc in tile_resolved.values()
        )
        for c in range(ncomp)
    ]
    any_mct = any(st["mct"] for st, _rs, _pc in tile_resolved.values())
    mixed_sampling = len({(xr, yr) for _, xr, yr in comps}) > 1
    planes_full = [
        np.zeros(
            (_ceil_div(ysiz, yr), _ceil_div(xsiz, xr)),
            np.float64 if comp_float[c] else np.int64,
        )
        for c, (_, xr, yr) in enumerate(comps)
    ]
    for ty in range(nty):
        for tx in range(ntx):
            parts = sorted(tile_parts[ty * ntx + tx])
            tdata = b"".join(body for _, body in parts)
            tx0 = max(xto + tx * xt, xo)
            ty0 = max(yto + ty * yt, yo)
            tx1 = min(xto + (tx + 1) * xt, xsiz)
            ty1 = min(yto + (ty + 1) * yt, ysiz)
            rects = [
                (
                    _ceil_div(tx0, xr), _ceil_div(ty0, yr),
                    _ceil_div(tx1, xr), _ceil_div(ty1, yr),
                )
                for _, xr, yr in comps
            ]
            tno = ty * ntx + tx
            st_t, rgn_t, pocs_t = tile_resolved[tno]
            ppt = None
            if tno in tile_ppts:
                # concatenate in Zppt order (stable on appearance)
                ppt = b"".join(
                    d for _z, _s, d in sorted(tile_ppts[tno])
                )
            tplanes = decode_tile(tdata, rects, st_t, rgn_t, ppt,
                                  pocs_t)
            if st_t["mct"] and ncomp >= 3:
                if mixed_sampling:
                    # T.800 requires identical sub-sampling on
                    # components 0-2 for the MCT
                    raise ValueError(
                        "JPX MCT over mixed component sub-sampling"
                    )
                rev3 = {
                    st_t["comp_coding"][c]["reversible"]
                    for c in range(3)
                }
                if len(rev3) > 1:
                    # J.2/A.6.1: RCT pairs with 5/3 and ICT with 9/7
                    # on all three components — a mix is malformed
                    raise ValueError(
                        "JPX MCT over mixed component transforms"
                    )
                y_, cb, cr = tplanes[0], tplanes[1], tplanes[2]
                if rev3.pop():
                    g = y_ - ((cb + cr) >> 2)  # inverse RCT (G.2)
                    r_ = cr + g
                    b_ = cb + g
                else:
                    r_ = y_ + 1.402 * cr  # inverse ICT (G.3)
                    g = y_ - 0.344136 * cb - 0.714136 * cr
                    b_ = y_ + 1.772 * cb
                tplanes = [r_, g, b_] + list(tplanes[3:])
            for c in range(ncomp):
                tcx0, tcy0, tcx1, tcy1 = rects[c]
                planes_full[c][tcy0:tcy1, tcx0:tcx1] = tplanes[c]

    # upsample sub-sampled components back to the reference grid
    # (sample replication), cropping the ceil overshoot AND the grid
    # offset margin — the image is [XOsiz,Xsiz)x[YOsiz,Ysiz)
    planes = []
    for c in range(ncomp):
        _, xr, yr = comps[c]
        p = planes_full[c]
        if xr > 1:
            p = np.repeat(p, xr, axis=1)
        if yr > 1:
            p = np.repeat(p, yr, axis=0)
        planes.append(p[yo:ysiz, xo:xsiz])

    depth = comps[0][0]
    # irreversible components arrive float; round each independently
    planes = [
        p if p.dtype == np.int64 else np.rint(p).astype(np.int64)
        for p in planes
    ]
    shift = 1 << (depth - 1)
    outp = [np.clip(p + shift, 0, (1 << depth) - 1) for p in planes]
    if depth > 8:
        outp = [p >> (depth - 8) for p in outp]
    elif depth < 8:
        outp = [p << (8 - depth) for p in outp]
    if ncomp >= 3:
        if mixed_sampling and not any_mct:
            # chroma sub-sampling without a codestream MCT: the
            # components are a luma/chroma family (nobody sub-samples
            # RGB) — component 0 IS the luma this decoder returns
            return outp[0].astype(np.uint8)
        r_, g, b_ = (p.astype(np.uint32) for p in outp[:3])
        return ((299 * r_ + 587 * g + 114 * b_) // 1000).astype(np.uint8)
    return outp[0].astype(np.uint8)


# ---------------------------------------------------------------------------
# irreversible 9/7 path (Annexes E/F/G, float)
# ---------------------------------------------------------------------------

_ALPHA = -1.586134342059924
_BETA = -0.052980118572961
_GAMMA = 0.882911075530934
_DELTA = 0.443506852043971
_K97 = 1.230174104914001


def _inv_97_1d(lo: np.ndarray, hi: np.ndarray, parity: int = 0) -> np.ndarray:
    """Inverse 9/7 lifting along axis 0 (mirror of the analysis used
    by the in-test encoder: lo scaled by 1/K, hi by K/2).  ``parity``
    is the absolute parity of the interval origin — same convention as
    the 5/3 path (F.4.6 uses the identical even/odd role assignment)."""
    n = lo.shape[0] + hi.shape[0]
    if n == 1:
        return lo.astype(np.float64) if len(lo) else hi.astype(np.float64) / 2.0
    tail = lo.shape[1:] if lo.shape[0] else hi.shape[1:]
    x = np.zeros((n,) + tail, np.float64)
    if parity == 0:
        x[0::2] = lo * _K97
        x[1::2] = hi * (2.0 / _K97)
    else:
        x[0::2] = hi * (2.0 / _K97)
        x[1::2] = lo * _K97

    def at(idx):
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx > n - 1, 2 * (n - 1) - idx, idx)
        return x[idx]

    ev = np.arange(parity, n, 2)  # absolute-even local indices
    od = np.arange(1 - parity, n, 2)  # absolute-odd local indices
    x[ev] -= _DELTA * (at(ev - 1) + at(ev + 1))
    x[od] -= _GAMMA * (at(od - 1) + at(od + 1))
    x[ev] -= _BETA * (at(ev - 1) + at(ev + 1))
    x[od] -= _ALPHA * (at(od - 1) + at(od + 1))
    return x


def _inv_97_2d(ll, hl, lh, hh, px: int = 0, py: int = 0):
    lo = _inv_97_1d(ll.T.astype(np.float64), hl.T.astype(np.float64), px).T
    hi = _inv_97_1d(lh.T.astype(np.float64), hh.T.astype(np.float64), px).T
    return _inv_97_1d(lo, hi, py)
