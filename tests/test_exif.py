"""EXIF orientation tests (extract/imaging.exif_orientation /
apply_orientation) — phone photos arrive rotated with a tag that
conforming OCR pipelines (tesseract, PIL exif_transpose) honor."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from receipt_scanner_spark.extract.imaging import (
    apply_orientation,
    exif_orientation,
)


def make_exif_jpeg(orientation: int, endian: str = "<",
                   body: bytes = b"") -> bytes:
    """Minimal JPEG prefix: SOI + APP1(Exif TIFF with tag 274)."""
    e = endian
    bom = b"II*\x00" if e == "<" else b"MM\x00*"
    tiff = (
        bom + struct.pack(e + "I", 8)
        + struct.pack(e + "H", 1)
        + struct.pack(e + "HHI", 274, 3, 1)
        + struct.pack(e + "HH", orientation, 0)
        + struct.pack(e + "I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xff\xd8" + app1 + body


class TestParse:
    @pytest.mark.parametrize("endian", ["<", ">"])
    @pytest.mark.parametrize("o", [1, 3, 6, 8])
    def test_reads_tag_both_endians(self, endian, o):
        assert exif_orientation(make_exif_jpeg(o, endian)) == o

    def test_no_exif_none(self):
        assert exif_orientation(b"\xff\xd8\xff\xdb\x00\x04\x00\x00") is None

    def test_not_jpeg_none(self):
        assert exif_orientation(b"\x89PNG\r\n\x1a\n") is None

    def test_out_of_range_none(self):
        assert exif_orientation(make_exif_jpeg(9)) is None

    def test_app1_after_other_markers(self):
        com = b"\xff\xfe\x00\x04xx"
        d = make_exif_jpeg(6)
        with_com = d[:2] + com + d[2:]
        assert exif_orientation(with_com) == 6

    def test_truncated_no_crash(self):
        d = make_exif_jpeg(6)
        for cut in range(2, len(d)):
            exif_orientation(d[:cut])  # must never raise


class TestApply:
    # forward transforms: how a camera STORES an upright scene for
    # each tag value (the inverse of display), derived independently
    FORWARD = {
        1: lambda a: a,
        2: lambda a: a[:, ::-1],
        3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1, :],
        5: lambda a: a.T,
        6: lambda a: np.rot90(a, 1),   # stored = upright rotated CCW
        7: lambda a: np.rot90(a.T, 2),
        8: lambda a: np.rot90(a, -1),
    }

    @pytest.mark.parametrize("o", list(range(1, 9)))
    def test_apply_restores_upright(self, o):
        rng = np.random.default_rng(o)
        upright = rng.integers(0, 256, (5, 9), dtype=np.uint8)
        stored = self.FORWARD[o](upright)
        np.testing.assert_array_equal(
            apply_orientation(stored, o), upright
        )

    def test_none_passthrough(self):
        a = np.arange(6, dtype=np.uint8).reshape(2, 3)
        assert apply_orientation(a, None) is a


class TestEndToEnd:
    def test_rotated_phone_jpeg_ocr(self):
        from tests.test_jpeg import encode_jpeg

        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.functions.udfs import extract_row

        img = render_text("TOTAL $31.41", scale=2)
        stored = np.rot90(img, 1)  # orientation 6
        jpg = encode_jpeg([stored])
        tagged = make_exif_jpeg(6, body=jpg[2:])
        fmt, text, err = extract_row(tagged, None, ocr_arrays=ocr_pixels)
        assert (fmt, text, err) == ("image/jpeg", "TOTAL $31.41", None)
        # without the tag the rotated glyphs are unreadable — the tag
        # is load-bearing
        _f, text2, _e = extract_row(jpg, None, ocr_arrays=ocr_pixels)
        assert text2 != "TOTAL $31.41"
