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
