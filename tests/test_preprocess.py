"""Scan-preprocessing tests (extract/preprocess.py).

Ground truth is synthetic and independent: thresholds verified on
constructed histograms, the skew estimator against known rotations
applied by the (separately verified) rotator, and the full chain
end-to-end — rotated / unevenly-lit / noisy / inverted renders of
receipt text must come out of preprocess_scan readable by the real
OCR engine, glyph-exact."""

from __future__ import annotations

import numpy as np
import pytest

from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
from receipt_scanner_spark.extract.preprocess import (
    adaptive_threshold,
    deskew,
    estimate_skew,
    gaussian_blur,
    otsu_threshold,
    preprocess_scan,
    rotate_nn,
)


def _padded(text: str, scale: int = 3, pad: int = 30) -> np.ndarray:
    img = render_text(text, scale=scale)
    out = np.full(
        (img.shape[0] + 2 * pad, img.shape[1] + 2 * pad), 255, np.uint8
    )
    out[pad : pad + img.shape[0], pad : pad + img.shape[1]] = img
    return out


class TestStages:
    def test_otsu_bimodal(self):
        px = np.concatenate(
            [np.full(600, 40, np.uint8), np.full(400, 200, np.uint8)]
        ).reshape(20, 50)
        t = otsu_threshold(px)
        assert 40 <= t < 200  # separates the modes

    def test_otsu_uniform_image_no_crash(self):
        assert isinstance(otsu_threshold(np.full((5, 5), 77, np.uint8)), int)

    def test_gaussian_blur_preserves_mean_and_smooths(self):
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, (40, 50), dtype=np.uint8)
        out = gaussian_blur(px, sigma=1.5)
        assert out.shape == px.shape and out.dtype == np.uint8
        assert abs(float(out.mean()) - float(px.mean())) < 2.0
        # neighbor differences shrink under smoothing
        assert np.abs(np.diff(out.astype(int), axis=1)).mean() < np.abs(
            np.diff(px.astype(int), axis=1)
        ).mean()

    def test_adaptive_threshold_beats_global_under_gradient(self):
        # multiplicative shading with NON-black ink: the brightest ink
        # (105, lit side) is brighter than the darkest background
        # (89, shaded side), so NO global threshold can separate them;
        # the local-mean threshold recovers the mask
        img = _padded("TOTAL $5.00", scale=2, pad=10).astype(np.float64)
        ink = img < 128
        img[ink] = 105  # gray ink, not black
        h, w = img.shape
        shade = np.linspace(1.0, 0.35, w)[None, :]
        lit = np.clip(img * shade, 0, 255).astype(np.uint8)
        assert lit[ink].max() > lit[~ink].min()  # global impossible
        t = otsu_threshold(lit)
        global_bin = np.where(lit > t, np.uint8(255), np.uint8(0))
        local_bin = adaptive_threshold(lit, block=25, c=8)
        adaptive_err = (local_bin[ink] != 0).mean() + (
            local_bin[~ink] != 255
        ).mean()
        global_err = (global_bin[ink] != 0).mean() + (
            global_bin[~ink] != 255
        ).mean()
        assert adaptive_err < 0.05
        assert adaptive_err < global_err

    def test_rotate_nn_identity_and_inverse(self):
        px = _padded("ABC", scale=2, pad=20)
        assert np.array_equal(rotate_nn(px, 0.0), px)
        back = rotate_nn(rotate_nn(px, 3.0), -3.0)
        # NN resampling loses a few edge pixels, not the structure
        assert (back != px).mean() < 0.02

    @pytest.mark.parametrize("theta", [-3.0, -1.5, 0.0, 1.5, 3.0])
    def test_skew_estimate_within_step(self, theta):
        px = _padded("TOTAL $42.00 DUE NOW")
        est = estimate_skew(rotate_nn(px, theta))
        assert abs(est - theta) <= 0.3  # step is 0.25 deg

    def test_skew_empty_image_zero(self):
        assert estimate_skew(np.full((50, 50), 255, np.uint8)) == 0.0


class TestEndToEnd:
    @pytest.mark.parametrize("theta", [1.0, 2.0, 3.0, -2.5])
    def test_rotated_scan_reads_exactly(self, theta):
        px = _padded("TOTAL $42.00 DUE NOW")
        out = ocr_pixels(deskew(rotate_nn(px, theta)))
        assert out == "TOTAL $42.00 DUE NOW"

    def test_full_chain_gradient_noise_rotation(self):
        rng = np.random.default_rng(7)
        px = _padded("TOTAL $13.57").astype(np.float64)
        h, w = px.shape
        px = np.clip(px - np.linspace(0, 110, w)[None, :], 0, 255)
        px += rng.normal(0, 6, px.shape)  # sensor noise
        px = np.clip(px, 0, 255).astype(np.uint8)
        px = rotate_nn(px, 2.0, fill=150)
        clean = preprocess_scan(px, block=25, c=12)
        from receipt_scanner_spark.parsers.registry import parse_text

        text = ocr_pixels(clean)
        assert parse_text(text)["amount"] == "13.57"

    def test_despeckle_removes_salt_keeps_strokes(self):
        from receipt_scanner_spark.extract.preprocess import despeckle

        rng = np.random.default_rng(3)
        px = _padded("TOTAL $1.00")
        ink_before = px == 0
        salted = px.copy()
        salt = rng.random(px.shape) < 0.01
        salted[salt & ~ink_before] = 0
        out = despeckle(salted)
        # glyph strokes survive (scale-3 strokes have 2+ neighbors)
        assert ((out == 0) & ink_before).sum() >= 0.95 * ink_before.sum()
        # isolated salt is gone
        assert ((out == 0) & salt & ~ink_before).mean() < 0.001

    def test_inverted_scan_normalizes(self):
        px = 255 - _padded("TOTAL $9.99")
        clean = preprocess_scan(px)
        assert ocr_pixels(clean) == "TOTAL $9.99"

    def test_pdf_ocr_with_preprocessing_plug(self):
        # the config-only swap point: a CCITT-scanned PDF of a skewed
        # page, OCR'd through preprocess_scan + ocr_pixels
        from receipt_scanner_spark.extract.pdf import process_pdf
        from receipt_scanner_spark.parsers.registry import parse_text
        from tests.test_ccitt import encode_g4

        scan = rotate_nn(_padded("TOTAL $64.20"), 2.0)
        g4 = encode_g4(scan < 128)
        h, w = scan.shape
        s = (
            b"<< /Subtype /Image /Width %d /Height %d /BitsPerComponent 1 "
            b"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
            b"/DecodeParms << /K -1 /Columns %d /Rows %d >> /Length %d >>\n"
            b"stream\n" % (w, h, w, h, len(g4))
        ) + g4 + b"\nendstream"
        pdf = b"%PDF-1.4\n" + s + b"\n%%EOF"
        res = process_pdf(
            pdf, ocr_arrays=lambda a: ocr_pixels(preprocess_scan(a))
        )
        assert res.error is None
        assert parse_text(res.text)["amount"] == "64.20"
