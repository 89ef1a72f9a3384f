"""Arithmetic-coded JPEG (SOF9/SOF10) decoder tests.

Evidence layers, strongest first:

1. **Third-party differential** (skipped where cc/libjpeg are absent):
   the system libjpeg ships BOTH arithmetic directions, so a small
   gcc-compiled helper (tools/jarith_helper.c) gives a true oracle —
   libjpeg-encoded arithmetic files must decode here; OUR
   arithmetic files must decode under libjpeg back to the same
   coefficients; coefficient-preserving Huffman↔arithmetic transcodes
   (jpeg_read/write_coefficients) must decode BIT-IDENTICALLY through
   the shared IDCT; and the T.81 Table D.3 transcription is compared
   entry-for-entry against the table the library exports
   (``jpeg_aritab``).
2. **Independent in-test QM encoder** (this file, no external deps):
   the T.81 D.1 encode flowcharts — carry propagation, 0xFF byte
   stacking, trailing-zero suppression, per-restart flush — driving
   the same statistical models forward.  Every arithmetic file it
   produces must decode to exactly the pixels of the equivalent
   Huffman file built by tests.test_jpeg's encoder from the SAME
   quantized coefficients (bit-exact regardless of IDCT rounding).

The sequential models cover non-default DAC conditioning (L/U, Kx)
and DAC-less defaults; progressive decode is pinned by the libjpeg
differential (jpeg_simple_progression emits DC/AC first + refinement
scans, exercising every G.2 branch).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from receipt_scanner_spark.extract import jarith
from receipt_scanner_spark.extract.jpeg import ZIGZAG, decode_jpeg
from tests.test_jpeg import _block_coefs, _pad_to, encode_jpeg

_LIBJPEG = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
_HELPER_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "jarith_helper.c",
)


def _build_helper(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None or not os.path.isfile(_HELPER_SRC):
        return None
    exe = str(tmp_path_factory.mktemp("jarith") / "jarith")
    try:
        subprocess.run(
            [cc, "-O2", "-o", exe, _HELPER_SRC, "-ljpeg"],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.SubprocessError, OSError):
        return None
    return exe


@pytest.fixture(scope="session")
def jarith_helper(tmp_path_factory):
    exe = _build_helper(tmp_path_factory)
    if exe is None:
        pytest.skip("no C compiler / libjpeg dev files on this host")
    return exe


def _run(exe, args, payload):
    return subprocess.run(
        [exe, *args], input=payload, capture_output=True, check=True,
        timeout=120,
    ).stdout


def _pgm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    magic = b"P5" if px.ndim == 2 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def _unpgm(data: bytes) -> np.ndarray:
    head, px = data.split(b"255\n", 1)
    dims = head.split()[1:3]
    w, h = int(dims[0]), int(dims[1])
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# Independent QM encoder (T.81 §D.1) — test-local on purpose
# ---------------------------------------------------------------------------


class _QMEncoder:
    """Forward QM-coder: interval subdivision with conditional
    MPS/LPS exchange, renormalization with byte output at bit 19,
    carry propagation through the pending byte and stacked 0xFF
    bytes, 0xFF 0x00 byte stuffing, and the D.1.8/D.1.9 flush
    (sharpest in-interval value, trailing zeros dropped)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = None  # pending byte (deferred for carry)
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # deferred zero bytes (dropped if trailing)
        self.out = bytearray()

    def _emit(self, b):
        self.out.append(b)

    def _emit_zeros(self):
        if self.zc:
            self.out.extend(b"\x00" * self.zc)
            self.zc = 0

    def _byte_out(self, temp):
        if temp > 0xFF:  # carry ripples into pending bytes
            if self.buffer is not None:
                self._emit_zeros()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc  # carried-through 0xFFs become zeros
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # defer: a later carry may turn it to 0x00
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer is not None:
                self._emit_zeros()
                self._emit(self.buffer)
            if self.sc:
                self._emit_zeros()
                for _ in range(self.sc):
                    self._emit(0xFF)
                    self._emit(0x00)
                self.sc = 0
            self.buffer = temp

    def encode(self, stats, i, bit):
        sv = stats[i]
        idx = sv & 0x7F
        qe = jarith._QE[idx]
        a = self.a - qe
        if bit != (sv >> 7):
            if a >= qe:
                self.c += a
                a = qe
            # else conditional exchange: LPS keeps the larger interval
            stats[i] = ((sv ^ (jarith._SW[idx] << 7)) & 0x80) | jarith._NLPS[
                idx
            ]
        else:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the upper part
                self.c += a
                a = qe
            stats[i] = (sv & 0x80) | jarith._NMPS[idx]
        c, ct = self.c, self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self._byte_out(c >> 19)
                c &= 0x7FFFF
                ct = 8
            if a >= 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct

    def flush(self) -> bytes:
        # choose the in-interval value with the most trailing zeros
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:  # final carry
            if self.buffer is not None:
                self._emit_zeros()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer is not None:
                self._emit_zeros()
                self._emit(self.buffer)
            if self.sc:
                self._emit_zeros()
                for _ in range(self.sc):
                    self._emit(0xFF)
                    self._emit(0x00)
                self.sc = 0
        if self.c & 0x7FFF800:  # final bytes only if not all zero
            self._emit_zeros()
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        return bytes(self.out)


def _enc_dc_diff(enc, dcs, lu, ctx, diff):
    """Forward model of jarith._decode_dc_diff; returns next context."""
    low, up = lu
    if diff == 0:
        enc.encode(dcs, ctx, 0)
        return 0
    enc.encode(dcs, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dcs, ctx + 1, sign)
    sz = abs(diff) - 1
    stx = ctx + 2 + sign
    if sz == 0:
        enc.encode(dcs, stx, 0)
        m = 0
    else:
        enc.encode(dcs, stx, 1)
        m = 1
        stx = 20
        while sz >= (m << 1):
            enc.encode(dcs, stx, 1)
            m <<= 1
            stx += 1
        enc.encode(dcs, stx, 0)
    if m < ((1 << low) >> 1):
        nxt = 0
    elif m > ((1 << up) >> 1):
        nxt = 12 + (sign << 2)
    else:
        nxt = 4 + (sign << 2)
    stx += 14
    mm = m >> 1
    while mm:
        enc.encode(dcs, stx, 1 if sz & mm else 0)
        mm >>= 1
    return nxt


def _enc_ac_coefs(enc, acs, fixed, kx, zz, ss=1, se=63):
    """Forward model of jarith._decode_ac_coefs over zigzag list zz."""
    k = ss
    while k <= se:
        kn = next((j for j in range(k, se + 1) if zz[j]), None)
        st = 3 * (k - 1)
        if kn is None:
            enc.encode(acs, st, 1)  # end of block
            return
        enc.encode(acs, st, 0)
        while k < kn:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        enc.encode(acs, st + 1, 1)
        v = zz[k]
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        st += 2
        sz = abs(v) - 1
        if sz == 0:
            enc.encode(acs, st, 0)
            m = 0
        elif sz == 1:
            enc.encode(acs, st, 1)
            enc.encode(acs, st, 0)
            m = 1
        else:
            enc.encode(acs, st, 1)
            enc.encode(acs, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while sz >= (m << 1):
                enc.encode(acs, st, 1)
                m <<= 1
                st += 1
            enc.encode(acs, st, 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.encode(acs, st, 1 if sz & mm else 0)
            mm >>= 1
        k += 1


def encode_jpeg_arith(
    planes,
    comp_ids=(1,),
    sampling=((1, 1),),
    q: int = 1,
    restart: int = 0,
    dc_lu=(0, 1),
    kx: int = 5,
    emit_dac: bool = True,
    precision: int = 8,
) -> bytes:
    """Arithmetic twin of tests.test_jpeg.encode_jpeg: identical
    quantized coefficients (shared _block_coefs), SOF9 + optional DAC
    instead of SOF0 + DHT.  ``precision=12`` emits Pq=1 16-bit quant
    tables and shifts the level by 2048 (the entropy layer is
    depth-blind)."""
    h, w = planes[0].shape
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax)) if len(planes) > 1 else -(-w // 8)
    mcus_y = -(-h // (8 * vmax)) if len(planes) > 1 else -(-h // 8)
    out = bytearray(b"\xff\xd8")
    if precision == 12:
        out += b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + b"\x10"
        out += struct.pack(">64H", *([q] * 64))
    else:
        out += (b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"
                + bytes([q] * 64))
    sof_body = (bytes([precision]) + h.to_bytes(2, "big")
                + w.to_bytes(2, "big"))
    sof_body += bytes([len(planes)])
    for cid, (sh, sv) in zip(comp_ids, sampling):
        sof_body += bytes([cid, sh << 4 | sv, 0])
    out += b"\xff\xc9" + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
    if emit_dac:
        dac = bytes([0x00, (dc_lu[1] << 4) | dc_lu[0], 0x10, kx])
        out += b"\xff\xcc" + (2 + len(dac)).to_bytes(2, "big") + dac
    if restart:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart.to_bytes(2, "big")
    sos_body = bytes([len(planes)])
    for cid in comp_ids:
        sos_body += bytes([cid, 0x00])
    sos_body += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos_body)).to_bytes(2, "big") + sos_body

    if len(planes) == 1:
        padded = [_pad_to(planes[0], mcus_y * 8, mcus_x * 8)]
        sampling = ((1, 1),)
    else:
        padded = [
            _pad_to(pl, mcus_y * sv * 8, mcus_x * sh * 8)
            for pl, (sh, sv) in zip(planes, sampling)
        ]
    if precision == 12:
        # _fdct subtracts 128; the 12-bit level shift is 2048
        padded = [p.astype(np.float64) - 1920.0 for p in padded]

    def fresh_stats():
        return (
            bytearray(64),
            bytearray(256),
            bytearray((jarith.FIXED_STATE,)),
        )

    enc = _QMEncoder()
    dcs, acs, fixed = fresh_stats()
    preds = [0] * len(planes)
    ctxs = [0] * len(planes)
    mcu = 0
    rstn = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rstn % 8])
                rstn += 1
                enc = _QMEncoder()
                dcs, acs, fixed = fresh_stats()
                preds = [0] * len(planes)
                ctxs = [0] * len(planes)
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        zz = _block_coefs(blk, q)
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        ctxs[ci] = _enc_dc_diff(
                            enc, dcs, dc_lu, ctxs[ci], diff
                        )
                        _enc_ac_coefs(enc, acs, fixed, kx, zz)
            mcu += 1
    out += enc.flush() + b"\xff\xd9"
    return bytes(out)


def _enc_lossless_diff(enc, dcs, lu, st, db_large, diff):
    """Forward model of jarith._decode_lossless_diff; returns the
    5-way class of this diff."""
    low, up = lu
    if diff == 0:
        enc.encode(dcs, st, 0)
        return 0
    enc.encode(dcs, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dcs, st + 1, sign)
    sz = abs(diff) - 1
    stx = st + 2 + sign
    if sz == 0:
        enc.encode(dcs, stx, 0)
        m = 0
    else:
        enc.encode(dcs, stx, 1)
        m = 1
        stx = 129 if db_large else 100
        while sz >= (m << 1):
            enc.encode(dcs, stx, 1)
            m <<= 1
            stx += 1
        enc.encode(dcs, stx, 0)
    if m < ((1 << low) >> 1):
        cls = 0
    elif m > ((1 << up) >> 1):
        cls = 3 + sign
    else:
        cls = 1 + sign
    stx += 14
    mm = m >> 1
    while mm:
        enc.encode(dcs, stx, 1 if sz & mm else 0)
        mm >>= 1
    return cls


def encode_jpeg_arith_lossless(
    planes,
    pred_sel: int = 1,
    pt: int = 0,
    precision: int = 8,
    restart: int = 0,
    dc_lu=(0, 1),
    emit_dac: bool = True,
) -> bytes:
    """SOF11 twin of tests.test_jpeg_lossless.encode_lossless: the
    same Annex-H predictions and edge rules with the H.1.2.2
    arithmetic entropy layer mirrored from jarith (25-way (Da, Db)
    conditioning, Db-selected magnitude chains, class history zeroed
    at restarts).  All components share conditioning table 0."""
    h, w = planes[0].shape
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xcb" + (2 + len(sof)).to_bytes(2, "big") + sof
    if emit_dac:
        dac = bytes([0x00, (dc_lu[1] << 4) | dc_lu[0]])
        out += b"\xff\xcc" + (2 + len(dac)).to_bytes(2, "big") + dac
    if restart:
        out += b"\xff\xdd\x00\x04" + restart.to_bytes(2, "big")
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([pred_sel, 0, pt])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    default = 1 << (precision - 1 - pt)
    arrs = [np.asarray(p, dtype=np.int64) for p in planes]
    enc = _QMEncoder()
    stats = bytearray(158)
    prev_cls = [np.zeros(w, np.uint8) for _ in range(ncomp)]
    cur_cls = [np.zeros(w, np.uint8) for _ in range(ncomp)]
    samples_in_seg = 0
    row_start = True
    rstn = 0
    for y in range(h):
        for x in range(w):
            if restart and samples_in_seg == restart:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rstn % 8])
                rstn += 1
                enc = _QMEncoder()
                stats = bytearray(158)
                for r_ in prev_cls:
                    r_[:] = 0
                for r_ in cur_cls:
                    r_[:] = 0
                samples_in_seg = 0
                row_start = True
            for ci in range(ncomp):
                p = arrs[ci]
                if row_start or (y == 0 and x == 0):
                    px = default
                elif y == 0:
                    px = int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    a = int(p[y, x - 1])
                    b = int(p[y - 1, x])
                    c = int(p[y - 1, x - 1])
                    if pred_sel == 1:
                        px = a
                    elif pred_sel == 2:
                        px = b
                    elif pred_sel == 3:
                        px = c
                    elif pred_sel == 4:
                        px = a + b - c
                    elif pred_sel == 5:
                        px = a + ((b - c) >> 1)
                    elif pred_sel == 6:
                        px = b + ((a - c) >> 1)
                    else:
                        px = (a + b) >> 1
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                ca = int(cur_cls[ci][x - 1]) if x else 0
                cb = int(prev_cls[ci][x])
                cur_cls[ci][x] = _enc_lossless_diff(
                    enc, stats, dc_lu, 4 * (ca * 5 + cb), cb >= 3, diff
                )
            row_start = False
            samples_in_seg += 1
        for ci in range(ncomp):
            prev_cls[ci][:] = cur_cls[ci]
            cur_cls[ci][:] = 0
    out += enc.flush() + b"\xff\xd9"
    return bytes(out)


def _gray(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(
        128 + 60 * np.sin(yy / 5.0) + 50 * np.cos(xx / 7.0)
        + rng.normal(0, 20, (h, w)),
        0,
        255,
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# In-test encoder round trips (no external tooling)
# ---------------------------------------------------------------------------


class TestArithVsHuffmanTwins:
    """The arithmetic and Huffman in-test encoders consume identical
    quantized coefficients, so the two decodes must be bit-identical
    — an exactness oracle independent of IDCT rounding."""

    def _twin(self, planes, **kw):
        hkw = {k: kw[k] for k in ("comp_ids", "sampling", "q", "restart") if k in kw}
        huff = encode_jpeg(planes, **hkw)
        arith = encode_jpeg_arith(planes, **kw)
        a, b = decode_jpeg(huff), decode_jpeg(arith)
        assert np.array_equal(a, b)
        return b

    def test_flat_gray_is_exact(self):
        px = np.full((16, 24), 77, dtype=np.uint8)
        out = self._twin([px])
        assert np.array_equal(out, px)

    def test_textured_gray(self):
        self._twin([_gray(40, 33, seed=1)])

    def test_fine_quantizer_roundtrip_within_one(self):
        px = _gray(24, 24, seed=2)
        out = self._twin([px], q=1)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 1

    def test_restart_intervals_reset_statistics(self):
        self._twin([_gray(48, 32, seed=3)], restart=2)
        self._twin([_gray(48, 32, seed=3)], restart=1)

    def test_coarse_quantizer(self):
        self._twin([_gray(32, 32, seed=4)], q=24)

    def test_ycbcr_420(self):
        rng = np.random.default_rng(5)
        y = _gray(32, 32, seed=5)
        cb = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        cr = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        self._twin(
            [y, cb, cr],
            comp_ids=(1, 2, 3),
            sampling=((2, 2), (1, 1), (1, 1)),
            q=4,
        )

    def test_ycbcr_422_with_restart(self):
        rng = np.random.default_rng(6)
        y = _gray(24, 40, seed=6)
        cb = rng.integers(0, 256, (24, 20)).astype(np.uint8)
        cr = rng.integers(0, 256, (24, 20)).astype(np.uint8)
        self._twin(
            [y, cb, cr],
            comp_ids=(1, 2, 3),
            sampling=((2, 1), (1, 1), (1, 1)),
            q=4,
            restart=3,
        )

    def test_nondefault_conditioning(self):
        # L=1/U=3 widens the "small diff" band; Kx=20 moves the AC
        # low-frequency chain boundary
        self._twin([_gray(40, 40, seed=7)], q=2, dc_lu=(1, 3), kx=20)

    def test_extreme_conditioning_bounds(self):
        self._twin([_gray(24, 24, seed=8)], q=2, dc_lu=(0, 0), kx=1)
        self._twin([_gray(24, 24, seed=8)], q=2, dc_lu=(4, 8), kx=63)

    def test_missing_dac_uses_spec_defaults(self):
        px = _gray(24, 24, seed=9)
        huff = encode_jpeg([px])
        arith = encode_jpeg_arith([px], emit_dac=False)
        assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))

    def test_stuffed_ff_bytes_appear_and_decode(self):
        # seed chosen so the entropy stream actually exercises the
        # 0xFF 0x00 stuffing path (asserted, not assumed)
        for seed in range(20):
            px = _gray(48, 48, seed=100 + seed)
            arith = encode_jpeg_arith([px], q=1)
            sos = arith.index(b"\xff\xda")
            if b"\xff\x00" in arith[sos:]:
                huff = encode_jpeg([px], q=1)
                assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))
                return
        pytest.fail("no seed produced a stuffed 0xFF byte")

    def test_large_magnitude_coefficients(self):
        # alternating extremes maximize DC diffs and AC magnitudes,
        # walking the full category chain + magnitude-bit bins
        px = np.zeros((32, 32), dtype=np.uint8)
        px[::2] = 255
        px[:, ::2] ^= 255
        self._twin([px], q=1)

    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.default_rng(11)
        base = encode_jpeg_arith([_gray(16, 16, seed=11)])
        for _ in range(300):
            buf = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(2, len(buf))] = rng.integers(0, 256)
            try:
                decode_jpeg(bytes(buf))
            except (ValueError, NotImplementedError):
                pass

    def test_truncated_header_raises(self):
        base = encode_jpeg_arith([_gray(16, 16, seed=12)])
        with pytest.raises(ValueError):
            decode_jpeg(base[:20])


# ---------------------------------------------------------------------------
# Third-party differential (system libjpeg via compiled helper)
# ---------------------------------------------------------------------------


class TestLibjpegDifferential:
    def test_state_table_matches_library_export(self):
        if not os.path.isfile(_LIBJPEG):
            pytest.skip("no system libjpeg")
        lib = ctypes.CDLL(_LIBJPEG)
        # classic IJG INT32 is `long` (8 bytes on LP64); packing is
        # (Qe<<16) | (NMPS<<8) | (SWITCH<<7) | NLPS
        tab = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
        for i, v in enumerate(tab):
            expect = (
                (v >> 16) & 0xFFFF,
                (v >> 8) & 0xFF,
                v & 0x7F,
                (v >> 7) & 1,
            )
            assert jarith._STATES[i] == expect, f"state {i}"

    def test_libjpeg_arith_encode_my_decode(self, jarith_helper):
        for seed, (h, w) in enumerate([(16, 16), (33, 29), (64, 48)]):
            px = _gray(h, w, seed=20 + seed)
            jp = _run(jarith_helper, ["enc", "85", "0", "0", "1"], _pgm(px))
            assert jp[3] == 0xE0 and b"\xff\xc9" in jp[:200]
            ref = _unpgm(_run(jarith_helper, ["dec"], jp))
            mine = decode_jpeg(jp)
            d = np.abs(mine.astype(int) - ref.astype(int))
            # residual is IDCT rounding (float-exact vs islow), never
            # entropy corruption
            assert d.max() <= 2 and d.mean() < 0.05

    def test_transcode_twins_decode_bit_identically(self, jarith_helper):
        px = _gray(56, 41, seed=30)
        for prog in (0, 1):
            for rst in (0, 2):
                huff = _run(
                    jarith_helper,
                    ["enc", "80", str(prog), str(rst), "0"],
                    _pgm(px),
                )
                arith = _run(
                    jarith_helper, ["trans", "1", str(prog), str(rst)], huff
                )
                marker = b"\xff\xca" if prog else b"\xff\xc9"
                assert marker in arith[:400]
                assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))

    def test_color_transcode_twins(self, jarith_helper):
        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, (35, 29, 3)).astype(np.uint8)
        for prog in (0, 1):
            huff = _run(jarith_helper, ["enc", "80", str(prog), "0", "0"], _pgm(px))
            arith = _run(jarith_helper, ["trans", "1", str(prog), "0"], huff)
            assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))

    def test_my_encoder_decodes_under_libjpeg(self, jarith_helper):
        """Reverse interop: libjpeg must read OUR arithmetic stream.
        Transcoding it to Huffman preserves coefficients, so decoding
        the transcode with our decoder must equal decoding the
        original — exact, independent of libjpeg's IDCT."""
        px = _gray(40, 33, seed=32)
        arith = encode_jpeg_arith([px], q=4)
        huff = _run(jarith_helper, ["trans", "0", "0", "0"], arith)
        assert np.array_equal(decode_jpeg(arith), decode_jpeg(huff))

    def test_real_photo_arithmetic_transcode(self, jarith_helper):
        src = "/opt/spark/data/mllib/images/origin/multi-channel/chr30.4.184.jpg"
        if not os.path.isfile(src):
            pytest.skip("mllib fixture not present")
        huff = open(src, "rb").read()
        for prog in (0, 1):
            arith = _run(jarith_helper, ["trans", "1", str(prog), "0"], huff)
            assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))


class TestEnginePlumbing:
    def test_decode_pixels_dispatches_sof9(self):
        from receipt_scanner_spark.extract.imaging import decode_pixels

        px = _gray(24, 24, seed=40)
        arith = encode_jpeg_arith([px], q=1)
        out = decode_pixels(arith)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 1

    def test_sniff_image_dims_reads_sof9(self):
        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        arith = encode_jpeg_arith([_gray(24, 40, seed=42)])
        kind, w, h, err = sniff_image_dims(arith)
        assert (kind, w, h, err) == ("jpeg", 40, 24, None)

    def test_sof15_without_dhp_is_typed_error(self):
        # arithmetic DIFFERENTIAL lossless decodes inside a DHP-led
        # hierarchy as of r5 session 4 (tests/test_jpeg_hier.py); a
        # bare SOF15 with no DHP stays a typed error
        data = bytearray(encode_jpeg_arith([_gray(8, 8, seed=41)]))
        data[data.index(b"\xff\xc9") + 1] = 0xCF
        with pytest.raises(NotImplementedError, match="differential"):
            decode_jpeg(bytes(data))


class TestArithLossless:
    """SOF11 (T.81 Annex H + the H.1.2.2 arithmetic model, r5).
    Lossless means every round trip is a strict oracle.  No host codec
    implements this process (libjpeg-turbo 2.x has no lossless at
    all), so the evidence tier matches SOF3: an independent in-test
    encoder over the same QM coder the libjpeg differential pins."""

    @pytest.mark.parametrize("predictor", list(range(1, 8)))
    def test_gray8_all_predictors(self, predictor):
        rng = np.random.default_rng(predictor)
        plane = rng.integers(0, 256, (11, 17), dtype=np.int32)
        out = decode_jpeg(
            encode_jpeg_arith_lossless([plane], pred_sel=predictor)
        )
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_smooth_image_small_diffs(self):
        yy, xx = np.mgrid[0:24, 0:31]
        plane = ((xx * 3 + yy * 2) % 256).astype(np.int32)
        out = decode_jpeg(encode_jpeg_arith_lossless([plane], pred_sel=4))
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_restart_intervals(self):
        rng = np.random.default_rng(7)
        plane = rng.integers(0, 256, (9, 13), dtype=np.int32)
        out = decode_jpeg(
            encode_jpeg_arith_lossless([plane], pred_sel=2, restart=20)
        )
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_rgb_luma(self):
        from receipt_scanner_spark.extract.imaging import _luma

        rng = np.random.default_rng(8)
        planes = [
            rng.integers(0, 256, (10, 14), dtype=np.int32)
            for _ in range(3)
        ]
        out = decode_jpeg(encode_jpeg_arith_lossless(planes, pred_sel=1))
        want = _luma(np.stack([p.astype(np.uint8) for p in planes], axis=2))
        np.testing.assert_array_equal(out, want)

    def test_point_transform(self):
        rng = np.random.default_rng(9)
        plane = rng.integers(0, 256, (8, 8), dtype=np.int32)
        stored = plane >> 2
        out = decode_jpeg(
            encode_jpeg_arith_lossless([stored], pred_sel=2, pt=2)
        )
        np.testing.assert_array_equal(out, (stored << 2).astype(np.uint8))

    def test_precision_12_high_byte_contract(self):
        rng = np.random.default_rng(10)
        plane = rng.integers(0, 1 << 12, (7, 9), dtype=np.int32)
        out = decode_jpeg(
            encode_jpeg_arith_lossless([plane], pred_sel=1, precision=12)
        )
        np.testing.assert_array_equal(out, (plane >> 4).astype(np.uint8))

    def test_nondefault_conditioning(self):
        rng = np.random.default_rng(11)
        plane = rng.integers(0, 256, (12, 12), dtype=np.int32)
        out = decode_jpeg(
            encode_jpeg_arith_lossless([plane], pred_sel=7, dc_lu=(2, 5))
        )
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_missing_dac_uses_spec_defaults(self):
        rng = np.random.default_rng(12)
        plane = rng.integers(0, 256, (6, 10), dtype=np.int32)
        out = decode_jpeg(
            encode_jpeg_arith_lossless([plane], emit_dac=False)
        )
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_huffman_arith_lossless_twins(self):
        # the two entropy layers over the SAME prediction model must
        # reproduce the same pixels exactly
        from tests.test_jpeg_lossless import encode_lossless

        rng = np.random.default_rng(13)
        plane = rng.integers(0, 256, (15, 11), dtype=np.int32)
        for pred in (1, 4, 7):
            a = decode_jpeg(encode_lossless([plane], predictor=pred))
            b = decode_jpeg(
                encode_jpeg_arith_lossless([plane], pred_sel=pred)
            )
            np.testing.assert_array_equal(a, b)

    def test_extreme_diff_wraparound(self):
        # alternating 0/255 maximizes |diff|; 16-bit wrap must hold
        plane = np.zeros((6, 8), np.int32)
        plane[::2] = 255
        plane[:, ::2] ^= 255
        out = decode_jpeg(encode_jpeg_arith_lossless([plane], pred_sel=1))
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.default_rng(14)
        plane = rng.integers(0, 256, (10, 10), dtype=np.int32)
        base = encode_jpeg_arith_lossless([plane])
        for _ in range(120):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(2, len(buf)))] = int(
                    rng.integers(0, 256)
                )
            try:
                decode_jpeg(bytes(buf))
            except (ValueError, NotImplementedError, KeyError):
                pass


class TestMultiScanAndCmyk:
    """Multi-scan sequential and 4-channel Adobe JPEG decode (r4) —
    not arithmetic-specific, but pinned through the same libjpeg
    helper: scan scripts and CMYK/YCCK encodes come from the library,
    and coefficient-preserving transcodes must decode bit-identically."""

    def test_multiscan_gray_and_color(self, jarith_helper):
        rng = np.random.default_rng(50)
        for shape, chans in [((40, 33), 1), ((35, 29), 3)]:
            px = rng.integers(0, 256, shape + ((chans,) if chans > 1 else ())
                              ).astype(np.uint8)
            for rst in (0, 2):
                single = _run(jarith_helper, ["enc", "80", "0", str(rst), "0"],
                              _pgm(px))
                mscan = _run(jarith_helper, ["trans", "0", "2", str(rst)],
                             single)
                assert mscan.count(b"\xff\xda") == chans
                assert np.array_equal(decode_jpeg(single), decode_jpeg(mscan))

    def _raw4(self, cmyk):
        h, w = cmyk.shape[:2]
        return f"RAW4 {w} {h}\n".encode() + cmyk.tobytes()

    def _want_luma(self, refraw, h, w):
        refc = np.frombuffer(refraw.split(b"\n", 1)[1], dtype=np.uint8)
        refc = refc.reshape(h, w, 4).astype(np.float64)
        return np.clip(
            np.round(
                (0.299 * refc[..., 0] + 0.587 * refc[..., 1]
                 + 0.114 * refc[..., 2]) * (refc[..., 3] / 255.0)
            ), 0, 255,
        ).astype(np.uint8)

    @pytest.mark.parametrize("transform", [0, 2])
    @pytest.mark.parametrize("prog", [0, 1])
    def test_cmyk_ycck_vs_libjpeg(self, jarith_helper, transform, prog):
        h, w = 33, 27
        yy = np.mgrid[0:h, 0:w][0]
        cmyk = np.stack(
            [np.clip(128 + 80 * np.sin(yy / 4 + i), 0, 255) for i in range(4)],
            axis=2,
        ).astype(np.uint8)
        jp = _run(jarith_helper, ["enc4", "85", str(transform), str(prog)],
                  self._raw4(cmyk))
        ref = _run(jarith_helper, ["dec4"], jp)
        want = self._want_luma(ref, h, w)
        mine = decode_jpeg(jp)
        d = np.abs(mine.astype(int) - want.astype(int))
        # transform 0 is exact (no color conversion on either side);
        # YCCK differs only by fixed-point-vs-float rounding
        assert d.max() <= 1 and d.mean() < 0.1

    def test_cmyk_multiscan_and_arithmetic_twins(self, jarith_helper):
        h, w = 24, 31
        rng = np.random.default_rng(51)
        cmyk = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        single = _run(jarith_helper, ["enc4", "85", "0", "0"], self._raw4(cmyk))
        mscan = _run(jarith_helper, ["trans", "0", "2", "0"], single)
        assert mscan.count(b"\xff\xda") == 4
        assert np.array_equal(decode_jpeg(single), decode_jpeg(mscan))
        arith = _run(jarith_helper, ["trans", "1", "0", "0"], single)
        assert np.array_equal(decode_jpeg(single), decode_jpeg(arith))

    def test_multiscan_arithmetic_gray_and_color(self, jarith_helper):
        """r5: multi-scan sequential ARITHMETIC (the scan-script shape
        `jpegtran -arithmetic` emits) — coefficient-preserving libjpeg
        transcodes must decode bit-identically to the single-scan
        Huffman source, with and without restarts."""
        rng = np.random.default_rng(52)
        for shape, chans in [((40, 33), 1), ((35, 29), 3)]:
            px = rng.integers(0, 256, shape + ((chans,) if chans > 1 else ())
                              ).astype(np.uint8)
            for rst in (0, 2):
                single = _run(jarith_helper, ["enc", "80", "0", str(rst), "0"],
                              _pgm(px))
                ms = _run(jarith_helper, ["trans", "1", "2", str(rst)], single)
                assert ms.count(b"\xff\xda") == chans
                assert b"\xff\xc9" in ms  # SOF9
                assert np.array_equal(decode_jpeg(single), decode_jpeg(ms))

    def test_multiscan_arithmetic_cmyk(self, jarith_helper):
        h, w = 24, 31
        rng = np.random.default_rng(53)
        cmyk = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        single = _run(jarith_helper, ["enc4", "85", "0", "0"], self._raw4(cmyk))
        ms = _run(jarith_helper, ["trans", "1", "2", "0"], single)
        assert ms.count(b"\xff\xda") == 4 and b"\xff\xc9" in ms
        assert np.array_equal(decode_jpeg(single), decode_jpeg(ms))

    def test_lossless_4ch_huffman_relabel_is_corruption(self):
        # 4-channel lossless decodes in BOTH entropy layers as of r5
        # session 4 (TestArithLosslessGeneral) — a HUFFMAN stream
        # merely relabeled as SOF11 is data corruption, and the
        # QM-coder is bit-pattern-tolerant, so the contract is
        # garbage-or-typed-error, never a crash
        from tests.test_jpeg_lossless import encode_lossless

        planes = [np.full((4, 4), 9, dtype=np.int32)] * 4
        out = decode_jpeg(encode_lossless(planes))
        assert out.shape == (4, 4)
        arith = bytearray(encode_lossless(planes))
        sof = arith.find(b"\xff\xc3")
        arith[sof + 1] = 0xCB  # SOF3 -> SOF11
        try:
            out = decode_jpeg(bytes(arith))
            assert out.shape == (4, 4)
        except (ValueError, NotImplementedError):
            pass


def encode_jpeg_arith_lossless_general(
    planes,
    pred_sel: int = 1,
    pt: int = 0,
    precision: int = 8,
    restart: int = 0,
    dc_lu=(0, 1),
    adobe=None,
    multi_scan: bool = True,
) -> bytes:
    """SOF11 general-form twin of encode_lossless_general: one
    non-interleaved scan per component (``multi_scan``) or one
    interleaved full scan (the 4-channel case), every scan an
    independent QM stream with fresh statistics and class history,
    both reset again at each restart (F.2.2.4).  All components share
    conditioning table 0 and are 1x1-sampled."""
    h, w = planes[0].shape
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    if adobe is not None:
        body = (b"Adobe" + bytes([0, 100]) + b"\x00\x00\x00\x00"
                + bytes([adobe]))
        out += b"\xff\xee" + (2 + len(body)).to_bytes(2, "big") + body
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xcb" + (2 + len(sof)).to_bytes(2, "big") + sof
    dac = bytes([0x00, (dc_lu[1] << 4) | dc_lu[0]])
    out += b"\xff\xcc" + (2 + len(dac)).to_bytes(2, "big") + dac
    if restart:
        out += b"\xff\xdd\x00\x04" + restart.to_bytes(2, "big")
    default = 1 << (precision - 1 - pt)
    predict = {
        1: lambda a, b, c: a,
        2: lambda a, b, c: b,
        3: lambda a, b, c: c,
        4: lambda a, b, c: a + b - c,
        5: lambda a, b, c: a + ((b - c) >> 1),
        6: lambda a, b, c: b + ((a - c) >> 1),
        7: lambda a, b, c: (a + b) >> 1,
    }[pred_sel]

    groups = (
        [[ci] for ci in range(ncomp)] if multi_scan
        else [list(range(ncomp))]
    )
    for group in groups:
        sos = bytes([len(group)])
        for ci in group:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([pred_sel, 0, pt])
        out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
        enc = _QMEncoder()
        stats = bytearray(158)
        prev_cls = {ci: np.zeros(w, np.uint8) for ci in group}
        cur_cls = {ci: np.zeros(w, np.uint8) for ci in group}
        fresh = {ci: True for ci in group}
        arrs = {ci: np.asarray(planes[ci], dtype=np.int64) for ci in group}
        count = 0
        rstn = 0
        for y in range(h):
            for x in range(w):
                if restart and count == restart:
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + rstn % 8])
                    rstn += 1
                    enc = _QMEncoder()
                    stats = bytearray(158)
                    for r_ in prev_cls.values():
                        r_[:] = 0
                    for r_ in cur_cls.values():
                        r_[:] = 0
                    for ci in fresh:
                        fresh[ci] = True
                    count = 0
                for ci in group:
                    p = arrs[ci]
                    if fresh[ci] or (y == 0 and x == 0):
                        px = default
                    elif y == 0:
                        px = int(p[0, x - 1])
                    elif x == 0:
                        px = int(p[y - 1, 0])
                    else:
                        px = predict(
                            int(p[y, x - 1]), int(p[y - 1, x]),
                            int(p[y - 1, x - 1]),
                        )
                    fresh[ci] = False
                    diff = (int(p[y, x]) - px) & 0xFFFF
                    if diff >= 32768:
                        diff -= 65536
                    ca = int(cur_cls[ci][x - 1]) if x else 0
                    cb = int(prev_cls[ci][x])
                    cur_cls[ci][x] = _enc_lossless_diff(
                        enc, stats, dc_lu, 4 * (ca * 5 + cb), cb >= 3,
                        diff,
                    )
                count += 1
            for ci in group:
                prev_cls[ci][:] = cur_cls[ci]
                cur_cls[ci][:] = 0
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


class TestArithLosslessGeneral:
    """SOF11 general form (r5 session 4): component-subset multi-scan
    and 4-channel frames through jarith.lossless_scan_into +
    jpeg._lossless_finish.  Where a Huffman twin exists the two
    entropy layers must reproduce identical pixels — the same
    twin-oracle pattern the sequential arithmetic path uses."""

    def test_multiscan_rgb_matches_huffman_twin(self):
        from tests.test_jpeg_lossless import encode_lossless_general

        rng = np.random.default_rng(21)
        planes = [
            rng.integers(0, 256, (9, 13), dtype=np.int32)
            for _ in range(3)
        ]
        a = decode_jpeg(encode_jpeg_arith_lossless_general(
            planes, pred_sel=4, multi_scan=True))
        b = decode_jpeg(encode_lossless_general(
            planes, [(1, 1)] * 3, 9, 13, predictor=4, multi_scan=True))
        np.testing.assert_array_equal(a, b)

    def test_multiscan_gray_roundtrip(self):
        rng = np.random.default_rng(22)
        plane = rng.integers(0, 256, (12, 7), dtype=np.int32)
        out = decode_jpeg(encode_jpeg_arith_lossless_general(
            [plane], pred_sel=1, multi_scan=True))
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_multiscan_with_restarts(self):
        rng = np.random.default_rng(23)
        planes = [
            rng.integers(0, 256, (10, 11), dtype=np.int32)
            for _ in range(3)
        ]
        out = decode_jpeg(encode_jpeg_arith_lossless_general(
            planes, pred_sel=7, multi_scan=True, restart=17))
        want = decode_jpeg(encode_jpeg_arith_lossless_general(
            planes, pred_sel=7, multi_scan=True))
        np.testing.assert_array_equal(out, want)

    def test_four_channel_adobe_matches_huffman_twin(self):
        from tests.test_jpeg_lossless import encode_lossless_general

        rng = np.random.default_rng(24)
        planes = [
            rng.integers(0, 256, (8, 9), dtype=np.int32)
            for _ in range(4)
        ]
        a = decode_jpeg(encode_jpeg_arith_lossless_general(
            planes, pred_sel=1, multi_scan=False))
        b = decode_jpeg(encode_lossless_general(
            planes, [(1, 1)] * 4, 8, 9, predictor=1))
        np.testing.assert_array_equal(a, b)

    def test_four_channel_ycck_matches_huffman_twin(self):
        from tests.test_jpeg_lossless import encode_lossless_general

        rng = np.random.default_rng(25)
        planes = [
            rng.integers(0, 256, (8, 8), dtype=np.int32)
            for _ in range(4)
        ]
        a = decode_jpeg(encode_jpeg_arith_lossless_general(
            planes, pred_sel=2, multi_scan=False, adobe=2))
        b = decode_jpeg(encode_lossless_general(
            planes, [(1, 1)] * 4, 8, 8, predictor=2, adobe=2))
        np.testing.assert_array_equal(a, b)

    def test_four_channel_multiscan(self):
        from tests.test_jpeg_lossless import encode_lossless_general

        rng = np.random.default_rng(26)
        planes = [
            rng.integers(0, 256, (6, 10), dtype=np.int32)
            for _ in range(4)
        ]
        a = decode_jpeg(encode_jpeg_arith_lossless_general(
            planes, pred_sel=5, multi_scan=True))
        b = decode_jpeg(encode_lossless_general(
            planes, [(1, 1)] * 4, 6, 10, predictor=5, multi_scan=True))
        np.testing.assert_array_equal(a, b)

    def test_12bit_multiscan(self):
        rng = np.random.default_rng(27)
        plane = rng.integers(0, 1 << 12, (7, 7), dtype=np.int32)
        out = decode_jpeg(encode_jpeg_arith_lossless_general(
            [plane], pred_sel=1, precision=12, multi_scan=True))
        np.testing.assert_array_equal(out, (plane >> 4).astype(np.uint8))

    def test_subsampled_arith_lossless_stays_typed_error(self):
        rng = np.random.default_rng(28)
        planes = [
            rng.integers(0, 256, (8, 8), dtype=np.int32)
            for _ in range(3)
        ]
        data = bytearray(encode_jpeg_arith_lossless_general(
            planes, multi_scan=True))
        sof = data.find(b"\xff\xcb")
        # component 1's h<<4|v byte sits at SOF body offset 6+1
        data[sof + 4 + 6 + 1] = 0x21
        with pytest.raises(NotImplementedError, match="subsampled"):
            decode_jpeg(bytes(data))

    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.default_rng(29)
        planes = [
            rng.integers(0, 256, (8, 9), dtype=np.int32)
            for _ in range(3)
        ]
        base = encode_jpeg_arith_lossless_general(
            planes, pred_sel=4, multi_scan=True)
        for _ in range(150):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(2, len(buf)))] = int(
                    rng.integers(0, 256))
            try:
                decode_jpeg(bytes(buf))
            except (ValueError, NotImplementedError):
                pass


def _enc_ac_refine(enc, acs, fixed, blk, zz_true, ss, se, al):
    """Forward model of jarith._ac_refine_block, position-for-position:
    the EOB decision beyond EOBx, correction bits for known-nonzero
    coefficients, fixed-state signs for newly-significant ones.  ``blk``
    is the decoder-visible natural-order state, updated exactly as the
    decoder updates it."""
    from tests.test_jpeg import _tz_shift

    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and blk[ZIGZAG[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            rem = any(
                blk[ZIGZAG[j]] == 0 and _tz_shift(zz_true[j], al) != 0
                for j in range(k, se + 1)
            )
            enc.encode(acs, st, 0 if rem else 1)
            if not rem:
                return
        while True:
            z = ZIGZAG[k]
            cur = blk[z]
            tv = zz_true[k]
            if cur:
                corr = (abs(tv) >> al) & 1
                enc.encode(acs, st + 2, corr)
                if corr:
                    blk[z] = cur + (m1 if cur < 0 else p1)
                break
            newly = _tz_shift(tv, al) != 0
            enc.encode(acs, st + 1, 1 if newly else 0)
            if newly:
                neg = tv < 0
                enc.encode(fixed, 0, 1 if neg else 0)
                blk[z] = m1 if neg else p1
                break
            st += 3
            k += 1
            assert k <= se, "refinement ran past Se"
        k += 1


def encode_jpeg_arith_progressive(
    planes,
    comp_ids=None,
    q: int = 1,
    dc_lu=(0, 1),
    kx: int = 5,
    precision: int = 8,
    sof: int = 0xCA,
    emit_frame: bool = True,
) -> bytes:
    """SOF10 twin of tests.test_jpeg.encode_jpeg_progressive: G.1.2
    spectral selection + successive approximation over the arithmetic
    models — the sequential DC/AC models for first scans (DC point
    transform = arithmetic shift; AC values toward-zero-shifted), one
    FIXED-state decision per DC refinement bit, and the G.2 AC
    refinement walk (_enc_ac_refine).  Every scan is an independent QM
    stream with fresh statistics; all components 1x1 at equal size.
    ``emit_frame=False`` returns only the frame+scan segments (no
    SOI/DQT/DAC/EOI) for embedding in hierarchical sequences."""
    from tests.test_jpeg import _block_coefs, _tz_shift

    comp_ids = comp_ids or tuple(range(1, len(planes) + 1))
    h, w = planes[0].shape
    ncomp = len(planes)
    bx_n, by_n = -(-w // 8), -(-h // 8)
    out = bytearray()
    if emit_frame:
        out += b"\xff\xd8"
        if precision == 12:
            out += (b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big")
                    + b"\x10" + struct.pack(">64H", *([q] * 64)))
        else:
            out += (b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"
                    + bytes([q] * 64))
    sof_body = (bytes([precision]) + h.to_bytes(2, "big")
                + w.to_bytes(2, "big") + bytes([ncomp]))
    for cid in comp_ids:
        sof_body += bytes([cid, 0x11, 0])
    out += bytes([0xFF, sof])
    out += (2 + len(sof_body)).to_bytes(2, "big") + sof_body
    if emit_frame:
        dac = bytes([0x00, (dc_lu[1] << 4) | dc_lu[0], 0x10, kx])
        out += b"\xff\xcc" + (2 + len(dac)).to_bytes(2, "big") + dac

    padded = [_pad_to(p, by_n * 8, bx_n * 8) for p in planes]
    if precision == 12:
        padded = [p.astype(np.float64) - 1920.0 for p in padded]
    coefs = []  # [ci][block raster] -> zigzag list of quantized coefs
    blks = []  # decoder-visible state, natural order
    for p in padded:
        czz = []
        for by in range(by_n):
            for bx in range(bx_n):
                czz.append(
                    _block_coefs(p[by * 8 : by * 8 + 8,
                                   bx * 8 : bx * 8 + 8], q)
                )
        coefs.append(czz)
        blks.append([[0] * 64 for _ in range(by_n * bx_n)])

    def sos(cids_s, ss, se, ah, al):
        body = bytes([len(cids_s)])
        for cid in cids_s:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + (2 + len(body)).to_bytes(2, "big") + body

    nb = by_n * bx_n

    def dc_scan(ah, al):
        nonlocal out
        out += sos(comp_ids, 0, 0, ah, al)
        enc = _QMEncoder()
        if ah == 0:
            dcs = bytearray(64)
            last = [0] * ncomp
            ctxs = [0] * ncomp
            for b in range(nb):
                for ci in range(ncomp):
                    dcv = coefs[ci][b][0] >> al
                    ctxs[ci] = _enc_dc_diff(
                        enc, dcs, dc_lu, ctxs[ci], dcv - last[ci]
                    )
                    last[ci] = dcv
                    blks[ci][b][0] = dcv << al
        else:
            fixed = bytearray((jarith.FIXED_STATE,))
            for b in range(nb):
                for ci in range(ncomp):
                    bit = (coefs[ci][b][0] >> al) & 1
                    enc.encode(fixed, 0, bit)
                    if bit:
                        blks[ci][b][0] |= 1 << al
        out += enc.flush()

    def ac_scan(ci, ss, se, ah, al):
        nonlocal out
        out += sos([comp_ids[ci]], ss, se, ah, al)
        enc = _QMEncoder()
        acs = bytearray(256)
        fixed = bytearray((jarith.FIXED_STATE,))
        for b in range(nb):
            zz_t = coefs[ci][b]
            blk = blks[ci][b]
            if ah == 0:
                zz_s = [_tz_shift(v, al) for v in zz_t]
                _enc_ac_coefs(enc, acs, fixed, kx, zz_s, ss, se)
                for k in range(ss, se + 1):
                    if zz_s[k]:
                        blk[ZIGZAG[k]] = zz_s[k] << al
            else:
                _enc_ac_refine(enc, acs, fixed, blk, zz_t, ss, se, al)
        out += enc.flush()

    dc_scan(0, 1)
    for ci in range(ncomp):
        ac_scan(ci, 1, 5, 0, 2)
        ac_scan(ci, 6, 63, 0, 2)
    dc_scan(1, 0)
    for ci in range(ncomp):
        ac_scan(ci, 1, 63, 2, 1)
    for ci in range(ncomp):
        ac_scan(ci, 1, 63, 1, 0)
    if emit_frame:
        out += b"\xff\xd9"
    return bytes(out)


class TestArithProgressive:
    """SOF10 in-test encoder (r5 session 4): the decoder was already
    libjpeg-differentialed via transcodes of libjpeg-ENCODED streams;
    this encoder closes the reverse direction (libjpeg reads OUR
    progressive arithmetic stream) and unlocks the 12-bit gate."""

    def test_matches_sequential_arith_exactly(self):
        px = _gray(24, 17, seed=50)
        prog = decode_jpeg(encode_jpeg_arith_progressive([px], q=2))
        seq = decode_jpeg(encode_jpeg_arith([px], q=2))
        np.testing.assert_array_equal(prog, seq)

    def test_matches_huffman_progressive_exactly(self):
        from tests.test_jpeg import encode_jpeg_progressive

        px = _gray(32, 25, seed=51)
        a = decode_jpeg(encode_jpeg_arith_progressive([px], q=1))
        b = decode_jpeg(encode_jpeg_progressive([px], q=1))
        np.testing.assert_array_equal(a, b)

    def test_color_three_component(self):
        rng = np.random.default_rng(52)
        planes = [
            np.clip(rng.normal(128, 40, (16, 16)), 0, 255).astype(np.uint8)
            for _ in range(3)
        ]
        prog = decode_jpeg(encode_jpeg_arith_progressive(planes, q=2))
        seq = decode_jpeg(
            encode_jpeg_arith(planes, comp_ids=(1, 2, 3),
                              sampling=((1, 1),) * 3, q=2)
        )
        np.testing.assert_array_equal(prog, seq)

    def test_libjpeg_transcodes_my_progressive_stream(self, jarith_helper):
        # libjpeg DECODES our progressive arithmetic entropy layer and
        # re-emits Huffman with the coefficients preserved — the
        # transcode must decode exactly as the original (third-party
        # validation of the encoder's bitstream, and with it of the
        # refinement-walk conventions the 12-bit path reuses)
        px = _gray(40, 33, seed=53)
        arith = encode_jpeg_arith_progressive([px], q=4)
        huff = _run(jarith_helper, ["trans", "0", "0", "0"], arith)
        np.testing.assert_array_equal(decode_jpeg(arith), decode_jpeg(huff))

    def test_12bit_arith_progressive_decodes(self):
        # the r4/r5 gate falls: evidence = this encoder, validated
        # under libjpeg at 8 bits (the entropy layer is depth-blind)
        rng = np.random.default_rng(54)
        plane = rng.integers(0, 1 << 12, (16, 16), dtype=np.int32)
        prog = decode_jpeg(
            encode_jpeg_arith_progressive([plane], q=8, precision=12)
        )
        seq = decode_jpeg(
            encode_jpeg_arith([plane], q=8, precision=12)
        )
        np.testing.assert_array_equal(prog, seq)
