"""Lossless JPEG (SOF3, T.81 Annex H) decoder tests.

An independent in-test ENCODER implements the Annex-H coding model
(predictors 1-7, edge rules, point transform, restart intervals,
16-bit wrap) and the decoder must reproduce the source samples
EXACTLY — lossless means bit-exact, so every round-trip is a strict
oracle.  Gray 8-bit, 12-bit (high-byte output contract), RGB, and the
OCR end-to-end path are covered.
"""

from __future__ import annotations

import numpy as np
import pytest

from receipt_scanner_spark.extract.jpeg import decode_jpeg
from tests.test_jpeg import _BitWriter, _canon, _cat, _dht

# 17 possible diff categories (0-16); fixed-width 5-bit codes keep the
# encoder trivially canonical
_LDC_COUNTS = [0, 0, 0, 0, 17] + [0] * 11
_LDC_SYMS = list(range(17))
_LDC_CODES = _canon(_LDC_COUNTS, _LDC_SYMS)


def encode_lossless(
    planes: list[np.ndarray],
    predictor: int = 1,
    precision: int = 8,
    pt: int = 0,
    restart: int = 0,
) -> bytes:
    """planes: per-component (h, w) int arrays (same size, 1x1)."""
    h, w = planes[0].shape
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += _dht(0, 0, _LDC_COUNTS, _LDC_SYMS)
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + (2 + len(sof)).to_bytes(2, "big") + sof
    if restart:
        out += b"\xff\xdd\x00\x04" + restart.to_bytes(2, "big")
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    default = 1 << (precision - 1 - pt)
    bw = _BitWriter()
    sample_i = 0
    rst = 0
    fresh = True
    for y in range(h):
        for x in range(w):
            if restart and sample_i == restart:
                bw.flush()
                out += bytes(bw.buf) + b"\xff" + bytes([0xD0 + (rst & 7)])
                bw = _BitWriter()
                rst += 1
                sample_i = 0
                fresh = True
            for p in planes:
                if fresh:
                    px = default
                elif y == 0:
                    px = int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    a, b, c = (
                        int(p[y, x - 1]),
                        int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                    px = {
                        1: a, 2: b, 3: c, 4: a + b - c,
                        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1),
                        7: (a + b) >> 1,
                    }[predictor]
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # signed wrap
                if diff == -32768 or diff == 32768:
                    ln, code = _LDC_CODES[16]
                    bw.put(code, ln)
                else:
                    s = _cat(diff)
                    ln, code = _LDC_CODES[s]
                    bw.put(code, ln)
                    if s:
                        v = diff if diff >= 0 else diff + (1 << s) - 1
                        bw.put(v, s)
            fresh = False
            sample_i += 1
    bw.flush()
    out += bytes(bw.buf) + b"\xff\xd9"
    return bytes(out)


def _rand_plane(rng, h, w, precision=8):
    return rng.integers(0, 1 << precision, (h, w), dtype=np.int32)


def _cdiv(a, b):
    return -(-a // b)


def _emit_diff(bw, diff):
    if diff == -32768 or diff == 32768:
        ln, code = _LDC_CODES[16]
        bw.put(code, ln)
        return
    s = _cat(diff)
    ln, code = _LDC_CODES[s]
    bw.put(code, ln)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.put(v, s)


def _predict(plane, y, x, predictor, default, fresh):
    if fresh or (y == 0 and x == 0):
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a, b, c = (int(plane[y, x - 1]), int(plane[y - 1, x]),
               int(plane[y - 1, x - 1]))
    return {
        1: a, 2: b, 3: c, 4: a + b - c,
        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1), 7: (a + b) >> 1,
    }[predictor]


def encode_lossless_general(
    planes, samplings, H, W, predictor=1, precision=8, pt=0,
    multi_scan=False, adobe=None, restart=0,
):
    """General SOF3 encoder (mirror of jpeg._lossless_scan_general):
    ``planes[i]`` at component resolution ceil(dim*si/smax);
    interleaved single scan over h x v-sample MCUs, or one
    non-interleaved scan per component (``multi_scan``).  ``adobe``
    emits an APP14 transform byte (4-channel CMYK/YCCK semantics)."""
    ncomp = len(planes)
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    out = bytearray(b"\xff\xd8")
    if adobe is not None:
        body = (b"Adobe" + bytes([0, 100]) + b"\x00\x00\x00\x00"
                + bytes([adobe]))
        out += b"\xff\xee" + (2 + len(body)).to_bytes(2, "big") + body
    out += _dht(0, 0, _LDC_COUNTS, _LDC_SYMS)
    sof = bytes([precision]) + H.to_bytes(2, "big") + W.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci, (sh, sv) in enumerate(samplings):
        sof += bytes([ci + 1, sh << 4 | sv, 0])
    out += b"\xff\xc3" + (2 + len(sof)).to_bytes(2, "big") + sof
    if restart:
        out += b"\xff\xdd\x00\x04" + restart.to_bytes(2, "big")
    default = 1 << (precision - 1 - pt)

    def diff_of(plane, y, x, fresh):
        px = _predict(plane, y, x, predictor, default, fresh)
        d = (int(plane[y, x]) - px) & 0xFFFF
        return d - 0x10000 if d >= 0x8000 else d

    if multi_scan:
        for ci, (plane, (sh, sv)) in enumerate(zip(planes, samplings)):
            sos = bytes([1, ci + 1, 0x00, predictor, 0, pt])
            out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
            ph, pw = _cdiv(H * sv, vmax), _cdiv(W * sh, hmax)
            assert plane.shape == (ph, pw)
            bw = _BitWriter()
            fresh = True
            n_i = rst = 0  # non-interleaved: the restart counts samples
            for y in range(ph):
                for x in range(pw):
                    if restart and n_i == restart:
                        bw.flush()
                        out += bytes(bw.buf)
                        out += b"\xff" + bytes([0xD0 + (rst & 7)])
                        bw = _BitWriter()
                        rst += 1
                        n_i = 0
                        fresh = True
                    _emit_diff(bw, diff_of(plane, y, x, fresh))
                    fresh = False
                    n_i += 1
            bw.flush()
            out += bytes(bw.buf)
        out += b"\xff\xd9"
        return bytes(out)

    # interleaved: pad each plane to the MCU grid (edge replicate)
    mx_n, my_n = _cdiv(W, hmax), _cdiv(H, vmax)
    padded = []
    for plane, (sh, sv) in zip(planes, samplings):
        ph, pw = _cdiv(H * sv, vmax), _cdiv(W * sh, hmax)
        assert plane.shape == (ph, pw)
        gh, gw = my_n * sv, mx_n * sh
        p = np.pad(plane, ((0, gh - ph), (0, gw - pw)), mode="edge")
        padded.append(p)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    bw = _BitWriter()
    fresh = [True] * ncomp
    mcu_i = rst = 0  # interleaved: the restart counts h x v-sample MCUs
    for my in range(my_n):
        for mx in range(mx_n):
            if restart and mcu_i == restart:
                bw.flush()
                out += bytes(bw.buf) + b"\xff" + bytes([0xD0 + (rst & 7)])
                bw = _BitWriter()
                rst += 1
                mcu_i = 0
                fresh = [True] * ncomp
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samplings)):
                for dy in range(sv):
                    for dx in range(sh):
                        _emit_diff(
                            bw,
                            diff_of(p, my * sv + dy, mx * sh + dx,
                                    fresh[ci]),
                        )
                        fresh[ci] = False
            mcu_i += 1
    bw.flush()
    out += bytes(bw.buf) + b"\xff\xd9"
    return bytes(out)


def _expected_luma_3(planes, samplings, H, W):
    """Replicate-upsampled BT.601 luma of component-resolution planes
    (the decoder's composition contract)."""
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    ups = []
    for p, (sh, sv) in zip(planes, samplings):
        q = p.astype(np.uint8)
        if sh != hmax:
            q = np.repeat(q, hmax // sh, axis=1)
        if sv != vmax:
            q = np.repeat(q, vmax // sv, axis=0)
        ups.append(q[:H, :W].astype(np.uint32))
    r, g, b = ups
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


class TestLosslessRoundTrip:
    @pytest.mark.parametrize("predictor", list(range(1, 8)))
    def test_gray8_all_predictors(self, predictor):
        rng = np.random.default_rng(predictor)
        plane = _rand_plane(rng, 11, 17)
        out = decode_jpeg(encode_lossless([plane], predictor=predictor))
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_smooth_image_small_diffs(self):
        rng = np.random.default_rng(50)
        base = np.cumsum(rng.integers(-2, 3, (20, 30)), axis=1) + 128
        plane = np.clip(base, 0, 255).astype(np.int32)
        out = decode_jpeg(encode_lossless([plane], predictor=4))
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_12bit_high_byte(self):
        rng = np.random.default_rng(12)
        plane = _rand_plane(rng, 7, 9, precision=12)
        out = decode_jpeg(
            encode_lossless([plane], predictor=1, precision=12)
        )
        np.testing.assert_array_equal(out, (plane >> 4).astype(np.uint8))

    def test_point_transform(self):
        rng = np.random.default_rng(13)
        # Pt=2: stored samples are value >> 2; output scales back << 2
        full = _rand_plane(rng, 6, 8)
        stored = full >> 2
        out = decode_jpeg(
            encode_lossless([stored], predictor=2, pt=2)
        )
        np.testing.assert_array_equal(out, (stored << 2).astype(np.uint8))

    def test_rgb_luma(self):
        rng = np.random.default_rng(14)
        planes = [_rand_plane(rng, 5, 6) for _ in range(3)]
        out = decode_jpeg(encode_lossless(planes, predictor=1))
        r, g, b = (p.astype(np.uint32) for p in planes)
        expect = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        np.testing.assert_array_equal(out, expect)

    def test_restart_intervals(self):
        rng = np.random.default_rng(15)
        plane = _rand_plane(rng, 9, 13)
        out = decode_jpeg(
            encode_lossless([plane], predictor=4, restart=20)
        )
        np.testing.assert_array_equal(out, plane.astype(np.uint8))

    def test_truncated_raises(self):
        rng = np.random.default_rng(16)
        enc = encode_lossless([_rand_plane(rng, 8, 8)])
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) * 2 // 3])

    def test_bad_predictor_raises(self):
        rng = np.random.default_rng(17)
        enc = encode_lossless([_rand_plane(rng, 4, 4)], predictor=1)
        bad = enc.replace(b"\xff\xda", b"\xff\xda", 1)
        # splice predictor 0 into SOS (Ss byte is 3rd from segment end)
        i = bad.rindex(b"\xff\xda")
        seg_len = (bad[i + 2] << 8) | bad[i + 3]
        ss_at = i + 2 + seg_len - 3
        bad = bad[:ss_at] + b"\x00" + bad[ss_at + 1 :]
        with pytest.raises(ValueError):
            decode_jpeg(bad)


class TestEndToEnd:
    def test_scanner_lossless_receipt_ocr(self):
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.parsers.registry import parse_text

        scan = render_text("TOTAL $99.01", scale=2).astype(np.int32)
        jpg = encode_lossless([scan], predictor=7)
        px = decode_pixels(jpg)
        np.testing.assert_array_equal(px, scan.astype(np.uint8))
        assert parse_text(ocr_pixels(px))["amount"] == "99.01"


class TestLosslessGeneral:
    """Subsampled, multi-scan, and 4-channel lossless (the general
    Annex-H path added in the r5 continuation) — all bit-exact."""

    @pytest.mark.parametrize("sampling", [(2, 1), (2, 2)])
    def test_subsampled_interleaved(self, sampling):
        rng = np.random.default_rng(31)
        H, W = 13, 21  # odd dims exercise the MCU padding path
        sh, sv = sampling
        y = _rand_plane(rng, H, W)
        cb = _rand_plane(rng, -(-H * 1 // sv), -(-W * 1 // sh))
        cr = _rand_plane(rng, -(-H * 1 // sv), -(-W * 1 // sh))
        samplings = [(sh, sv), (1, 1), (1, 1)]
        data = encode_lossless_general([y, cb, cr], samplings, H, W,
                                       predictor=4)
        got = decode_jpeg(data)
        np.testing.assert_array_equal(
            got, _expected_luma_3([y, cb, cr], samplings, H, W)
        )

    def test_multi_scan_equals_interleaved(self):
        rng = np.random.default_rng(32)
        H, W = 9, 14
        planes = [_rand_plane(rng, H, W) for _ in range(3)]
        samplings = [(1, 1)] * 3
        multi = encode_lossless_general(planes, samplings, H, W,
                                        predictor=5, multi_scan=True)
        inter = encode_lossless(planes, predictor=5)
        np.testing.assert_array_equal(decode_jpeg(multi),
                                      decode_jpeg(inter))

    def test_multi_scan_subsampled(self):
        rng = np.random.default_rng(33)
        H, W = 11, 10
        samplings = [(2, 2), (1, 1), (1, 1)]
        y = _rand_plane(rng, H, W)
        cb = _rand_plane(rng, -(-H // 2), -(-W // 2))
        cr = _rand_plane(rng, -(-H // 2), -(-W // 2))
        data = encode_lossless_general([y, cb, cr], samplings, H, W,
                                       predictor=7, multi_scan=True)
        np.testing.assert_array_equal(
            decode_jpeg(data),
            _expected_luma_3([y, cb, cr], samplings, H, W),
        )

    def test_4channel_cmyk(self):
        rng = np.random.default_rng(34)
        H, W = 8, 12
        planes = [_rand_plane(rng, H, W) for _ in range(4)]
        data = encode_lossless_general(planes, [(1, 1)] * 4, H, W,
                                       predictor=1, adobe=0)
        p0, p1, p2, k = (p.astype(np.float64) for p in planes)
        luma = (0.299 * p0 + 0.587 * p1 + 0.114 * p2) * (k / 255.0)
        want = np.clip(np.round(luma), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(decode_jpeg(data), want)

    def test_4channel_ycck(self):
        rng = np.random.default_rng(35)
        H, W = 8, 8
        planes = [_rand_plane(rng, H, W) for _ in range(4)]
        data = encode_lossless_general(planes, [(1, 1)] * 4, H, W,
                                       predictor=2, adobe=2)
        p0, p1, p2, k = (p.astype(np.float64) for p in planes)
        cb, cr = p1 - 128.0, p2 - 128.0
        r = 255.0 - np.clip(p0 + 1.402 * cr, 0, 255)
        g = 255.0 - np.clip(p0 - 0.344136 * cb - 0.714136 * cr, 0, 255)
        b = 255.0 - np.clip(p0 + 1.772 * cb, 0, 255)
        luma = (0.299 * r + 0.587 * g + 0.114 * b) * (k / 255.0)
        want = np.clip(np.round(luma), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(decode_jpeg(data), want)

    def test_12bit_subsampled(self):
        rng = np.random.default_rng(36)
        H, W = 10, 16
        samplings = [(2, 1), (1, 1), (1, 1)]
        y = _rand_plane(rng, H, W, precision=12)
        cb = _rand_plane(rng, H, W // 2, precision=12)
        cr = _rand_plane(rng, H, W // 2, precision=12)
        data = encode_lossless_general([y, cb, cr], samplings, H, W,
                                       predictor=6, precision=12)
        got = decode_jpeg(data)
        # 12-bit planes land as their high bytes before composition
        hb = [(p >> 4).astype(np.int32) for p in (y, cb, cr)]
        np.testing.assert_array_equal(
            got, _expected_luma_3(hb, samplings, H, W)
        )

    def test_missing_component_scan_raises(self):
        rng = np.random.default_rng(37)
        H, W = 6, 6
        planes = [_rand_plane(rng, H, W) for _ in range(3)]
        data = bytearray(encode_lossless_general(
            planes, [(1, 1)] * 3, H, W, multi_scan=True))
        # chop the last scan: find the final SOS and truncate there
        last_sos = data.rfind(b"\xff\xda")
        data = data[:last_sos] + b"\xff\xd9"
        with pytest.raises(ValueError, match="missing a component"):
            decode_jpeg(bytes(data))

    def test_restart_with_subsampling_round_trips(self):
        # H.2.2: the restart re-initializes prediction exactly as at
        # scan start, the interval counting h x v-sample MCUs — the
        # same reset convention as the long-verified 1x1 interleaved
        # path, now exercised over 4:2:0 MCUs
        rng = np.random.default_rng(38)
        H, W = 16, 16
        samplings = [(2, 2), (1, 1), (1, 1)]
        y = _rand_plane(rng, H, W)
        cb = _rand_plane(rng, 8, 8)
        cr = _rand_plane(rng, 8, 8)
        for interval in (1, 3, 8):
            data = encode_lossless_general(
                [y, cb, cr], samplings, H, W, restart=interval)
            out = decode_jpeg(data)
            np.testing.assert_array_equal(
                out, _expected_luma_3(
                    [y, cb, cr], samplings, H, W))

    def test_restart_in_multi_scan_subsampled(self):
        # non-interleaved scans count samples per restart interval;
        # each component scan restarts independently
        rng = np.random.default_rng(39)
        H, W = 10, 14
        samplings = [(2, 1), (1, 1), (1, 1)]
        planes = [
            _rand_plane(rng, H, W),
            _rand_plane(rng, H, 7),
            _rand_plane(rng, H, 7),
        ]
        data = encode_lossless_general(
            planes, samplings, H, W, multi_scan=True, restart=11)
        out = decode_jpeg(data)
        np.testing.assert_array_equal(
            out, _expected_luma_3(planes, samplings, H, W))

    def test_missing_restart_segment_is_value_error(self):
        # a DRI promising restarts that never arrive is data corruption
        rng = np.random.default_rng(40)
        H, W = 8, 8
        samplings = [(2, 2), (1, 1), (1, 1)]
        y = _rand_plane(rng, H, W)
        cb = _rand_plane(rng, 4, 4)
        cr = _rand_plane(rng, 4, 4)
        data = bytearray(encode_lossless_general(
            [y, cb, cr], samplings, H, W))
        sos = data.find(b"\xff\xda")
        data = (data[:sos] + b"\xff\xdd\x00\x04\x00\x02" + data[sos:])
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))


class TestLosslessGeneralFuzz:
    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.default_rng(92)
        H, W = 10, 12
        samplings = [(2, 2), (1, 1), (1, 1)]
        y = _rand_plane(rng, H, W)
        cb = _rand_plane(rng, 5, 6)
        cr = _rand_plane(rng, 5, 6)
        bases = [
            encode_lossless_general([y, cb, cr], samplings, H, W),
            encode_lossless_general([y, cb, cr], samplings, H, W,
                                    multi_scan=True),
        ]
        for base in bases:
            for _ in range(150):
                buf = bytearray(base)
                for _ in range(int(rng.integers(1, 6))):
                    buf[int(rng.integers(2, len(buf)))] = int(
                        rng.integers(0, 256))
                try:
                    decode_jpeg(bytes(buf))
                except (ValueError, NotImplementedError):
                    pass
