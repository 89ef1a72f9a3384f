"""Lossy WebP (VP8 key frame) decoder tests.

The system libwebp ships the VP8 encoder AND decoder, and
``WebPDecodeYUV`` exposes the raw reconstructed planes — so every
test here is an EXACT third-party differential: lossy decode is
deterministic, and our Y/U/V planes must equal libwebp's
bit-for-bit.  The battery spans quality levels (segmentation,
quantizers, coefficient-probability updates all vary), flat /
gradient / noise / mixed content (16x16 modes, B_PRED sub-modes,
skip paths, loop-filter strengths), odd dimensions (MB cropping),
tiny frames, alpha (ALPH chunk: raw + headerless-VP8L compression
with all filter methods), and the real third-party python.webp
fixture (VP8X + VP8L-compressed ALPH + VP8).
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np
import pytest

from receipt_scanner_spark.extract.vp8 import decode_vp8
from receipt_scanner_spark.extract.webp import decode_webp

_LOSSY_FIXTURE = (
    "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/python.webp"
)


@pytest.fixture(scope="session")
def lossy_lib():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        pytest.skip("no system libwebp")
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _enc(lib, rgba, q=75.0):
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(
        np.ascontiguousarray(rgba).ctypes.data, w, h, w * 4,
        ctypes.c_float(q), ctypes.byref(out),
    )
    assert n
    data = ctypes.string_at(out.value, n)
    lib.WebPFree(out)
    return data


def _libyuv(lib, data):
    w, h = ctypes.c_int(), ctypes.c_int()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    yp = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert yp
    W, H = w.value, h.value
    Y = np.ctypeslib.as_array(yp, shape=(H, stride.value))[:, :W].copy()
    cw, ch = (W + 1) // 2, (H + 1) // 2
    U = np.ctypeslib.as_array(up, shape=(ch, uv_stride.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(vp, shape=(ch, uv_stride.value))[:, :cw].copy()
    return Y, U, V


def _payload(data):
    i = 12
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        if tag == b"VP8 ":
            return data[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _assert_exact(lib, rgba, q):
    data = _enc(lib, rgba, q)
    Y, U, V = _libyuv(lib, data)
    y, u, v = decode_vp8(_payload(data))
    assert np.array_equal(y, Y)
    assert np.array_equal(u, U)
    assert np.array_equal(v, V)
    return data


class TestYuvExact:
    def test_flat_single_mb(self, lossy_lib):
        px = np.full((16, 16, 4), 128, np.uint8)
        px[..., 3] = 255
        _assert_exact(lossy_lib, px, 75.0)

    def test_gradient_whole_mb_modes(self, lossy_lib):
        h, w = 48, 64
        yy, xx = np.mgrid[0:h, 0:w]
        grad = np.stack([
            np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255),
            np.full((h, w), 100), np.full((h, w), 255),
        ], axis=2).astype(np.uint8)
        _assert_exact(lossy_lib, grad, 75.0)

    @pytest.mark.parametrize("q", [10.0, 40.0, 75.0, 95.0])
    def test_photo_quality_sweep(self, lossy_lib, q):
        rng = np.random.default_rng(int(q))
        h, w = 48, 64
        yy, xx = np.mgrid[0:h, 0:w]
        photo = np.stack([
            np.clip(128 + 60 * np.sin(yy / 5) + rng.normal(0, 25, (h, w)), 0, 255),
            np.clip(128 + 50 * np.cos(xx / 7) + rng.normal(0, 25, (h, w)), 0, 255),
            np.clip(100 + rng.normal(0, 40, (h, w)), 0, 255),
            np.full((h, w), 255.0),
        ], axis=2).astype(np.uint8)
        _assert_exact(lossy_lib, photo, q)

    def test_odd_dimensions_and_tiny(self, lossy_lib):
        rng = np.random.default_rng(3)
        for shape in [(37, 53), (1, 1), (5, 3), (17, 16), (16, 33)]:
            im = rng.integers(0, 256, shape + (4,)).astype(np.uint8)
            im[..., 3] = 255
            _assert_exact(lossy_lib, np.ascontiguousarray(im), 60.0)

    def test_random_sweep(self, lossy_lib):
        rng = np.random.default_rng(7)
        for i in range(8):
            h = int(rng.integers(1, 130))
            w = int(rng.integers(1, 130))
            if i % 2:
                im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            else:
                im = np.full((h, w, 4), 200, np.uint8)
                im[: h // 2, : w // 2] = rng.integers(
                    0, 256, (h // 2, w // 2, 4)
                )
            im[..., 3] = 255
            _assert_exact(
                lossy_lib, np.ascontiguousarray(im),
                float(rng.integers(5, 100)),
            )

    def test_real_third_party_fixture(self, lossy_lib):
        if not os.path.isfile(_LOSSY_FIXTURE):
            pytest.skip("python.webp fixture not present")
        data = open(_LOSSY_FIXTURE, "rb").read()
        Y, U, V = _libyuv(lossy_lib, data)
        y, u, v = decode_vp8(_payload(data))
        assert np.array_equal(y, Y)
        assert np.array_equal(u, U)
        assert np.array_equal(v, V)


class TestAlphaAndLuma:
    def test_lossy_alpha_composites_exactly(self, lossy_lib):
        rng = np.random.default_rng(2)
        h, w = 40, 56
        im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        im[..., 3] = np.linspace(10, 250, w).astype(np.uint8)[None, :]
        data = _enc(lossy_lib, np.ascontiguousarray(im), 80.0)
        assert b"ALPH" in data
        Y, _, _ = _libyuv(lossy_lib, data)
        wd, hd = ctypes.c_int(), ctypes.c_int()
        p = lossy_lib.WebPDecodeRGBA(
            data, len(data), ctypes.byref(wd), ctypes.byref(hd)
        )
        a = np.ctypeslib.as_array(p, shape=(h, w, 4))[..., 3].astype(np.uint32)
        want = ((Y.astype(np.uint32) * a + 255 * (255 - a)) // 255).astype(
            np.uint8
        )
        assert np.array_equal(decode_webp(data), want)

    def test_fixture_with_vp8l_alpha_chunk(self, lossy_lib):
        if not os.path.isfile(_LOSSY_FIXTURE):
            pytest.skip("python.webp fixture not present")
        data = open(_LOSSY_FIXTURE, "rb").read()
        Y, _, _ = _libyuv(lossy_lib, data)
        wd, hd = ctypes.c_int(), ctypes.c_int()
        p = lossy_lib.WebPDecodeRGBA(
            data, len(data), ctypes.byref(wd), ctypes.byref(hd)
        )
        a = np.ctypeslib.as_array(p, shape=Y.shape + (4,))[..., 3].astype(
            np.uint32
        )
        want = ((Y.astype(np.uint32) * a + 255 * (255 - a)) // 255).astype(
            np.uint8
        )
        assert np.array_equal(decode_webp(data), want)

    def test_decode_pixels_dispatch(self, lossy_lib):
        from receipt_scanner_spark.extract.imaging import decode_pixels

        rng = np.random.default_rng(5)
        im = rng.integers(0, 256, (24, 32, 4)).astype(np.uint8)
        im[..., 3] = 255
        data = _enc(lossy_lib, np.ascontiguousarray(im), 70.0)
        Y, _, _ = _libyuv(lossy_lib, data)
        assert np.array_equal(decode_pixels(data), Y)


class TestBoundaries:
    def test_inter_frame_is_typed_error(self):
        # frame tag with frame_type bit set (inter frame)
        data = bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a" + b"\x00" * 8
        with pytest.raises(NotImplementedError, match="inter frame"):
            decode_vp8(data)

    def test_bad_start_code(self):
        data = bytes([0x00, 0x00, 0x00]) + b"\xff\x01\x2a" + b"\x00" * 8
        with pytest.raises(ValueError, match="start code"):
            decode_vp8(data)

    def test_corruption_fuzz_never_crashes(self, lossy_lib):
        rng = np.random.default_rng(9)
        im = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
        im[..., 3] = 255
        base = _enc(lossy_lib, np.ascontiguousarray(im), 60.0)
        for _ in range(120):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(12, len(buf)))] = int(rng.integers(0, 256))
            try:
                decode_webp(bytes(buf))
            except (ValueError, NotImplementedError, IndexError):
                pass


class TestOcrEndToEnd:
    def test_lossy_webp_receipt(self, lossy_lib):
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.parsers.registry import parse_text

        px = render_text("TOTAL $21.09\n04/05/2016", scale=3)
        rgba = np.ascontiguousarray(
            np.stack([px, px, px, np.full_like(px, 255)], axis=2)
        )
        data = _enc(lossy_lib, rgba, 95.0)
        got = parse_text(ocr_pixels(decode_pixels(data)))
        assert got == {"amount": "21.09", "date": "2016-04-05"}
