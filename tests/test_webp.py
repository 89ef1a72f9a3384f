"""WebP lossless (VP8L) decoder tests.

The system libwebp ships BOTH directions, so every test is a true
third-party differential driven via ctypes (no compile step needed):
libwebp losslessly encodes a content battery chosen to force every
bitstream feature — predictor / color-transform / subtract-green
transforms, palettes at all three bundling widths, LZ77 with the
two-dimensional distance map, color cache, meta prefix groups,
simple and normal prefix codes — and this decoder must reproduce
libwebp's own decode EXACTLY (lossless = strict oracle).  Hand-built
minimal streams pin the header and simple-code bit layout without
any third-party involvement; the lossy (VP8) branch stays an honest
typed error pinned against the real third-party python.webp fixture.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np
import pytest

from receipt_scanner_spark.extract.webp import (
    _find_vp8l_chunk,
    decode_vp8l,
    decode_webp,
)

_LIB = "libwebp.so.7"
_LOSSY_FIXTURE = (
    "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/python.webp"
)


@pytest.fixture(scope="session")
def webp_lib():
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        pytest.skip("no system libwebp")
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _enc(lib, rgba: np.ndarray) -> bytes:
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(rgba).ctypes.data, w, h, w * 4,
        ctypes.byref(out),
    )
    assert n
    data = ctypes.string_at(out.value, n)
    lib.WebPFree(out)
    return data


def _libdec(lib, data: bytes, h: int, w: int) -> np.ndarray:
    wd, hd = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(wd), ctypes.byref(hd))
    assert p and (wd.value, hd.value) == (w, h)
    return np.ctypeslib.as_array(p, shape=(h, w, 4)).copy()


def _roundtrip(lib, rgba: np.ndarray):
    data = _enc(lib, rgba)
    ref = _libdec(lib, data, *rgba.shape[:2])
    got = decode_vp8l(_find_vp8l_chunk(data))
    assert np.array_equal(got, ref)
    return data


class TestVsLibwebp:
    def test_flat(self, webp_lib):
        px = np.full((20, 30, 4), 200, np.uint8)
        _roundtrip(webp_lib, px)

    def test_photo_predictors_and_color_transform(self, webp_lib):
        rng = np.random.default_rng(1)
        h, w = 60, 80
        yy, xx = np.mgrid[0:h, 0:w]
        photo = np.stack([
            np.clip(128 + 60 * np.sin(yy / 7) + 40 * np.cos(xx / 9)
                    + rng.normal(0, 10, (h, w)), 0, 255),
            np.clip(100 + 70 * np.cos(yy / 5) + rng.normal(0, 10, (h, w)),
                    0, 255),
            np.clip(90 + 50 * np.sin((xx + yy) / 8)
                    + rng.normal(0, 10, (h, w)), 0, 255),
            np.full((h, w), 255.0),
        ], axis=2).astype(np.uint8)
        _roundtrip(webp_lib, photo)

    @pytest.mark.parametrize("n_colors", [2, 4, 13, 200])
    def test_palettes_all_bundling_widths(self, webp_lib, n_colors):
        rng = np.random.default_rng(n_colors)
        colors = rng.integers(0, 256, (n_colors, 4)).astype(np.uint8)
        idx = rng.integers(0, n_colors, (37, 43))
        _roundtrip(webp_lib, np.ascontiguousarray(colors[idx]))

    def test_lz77_tiled(self, webp_lib):
        rng = np.random.default_rng(2)
        tile = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
        _roundtrip(webp_lib, np.ascontiguousarray(np.tile(tile, (10, 12, 1))))

    def test_alpha_channel(self, webp_lib):
        rng = np.random.default_rng(3)
        h, w = 40, 50
        im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        im[..., 3] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        _roundtrip(webp_lib, im)

    def test_meta_prefix_groups_and_select_ties(self, webp_lib):
        # large mixed image: meta groups + predictor mode 11 tie
        # breaking (the bug class the differential caught in r4)
        rng = np.random.default_rng(0)
        h, w = 220, 300
        yy, xx = np.mgrid[0:h, 0:w]
        big = np.stack([
            np.clip(128 + 60 * np.sin(yy / 11)
                    + rng.normal(0, 25, (h, w)), 0, 255),
            np.clip(xx % 255 + rng.normal(0, 5, (h, w)), 0, 255),
            np.clip((xx // 30 * 40 + yy // 30 * 20) % 256, 0, 255),
            np.full((h, w), 255.0),
        ], axis=2).astype(np.uint8)
        big[:60, :100] = 255
        _roundtrip(webp_lib, big)

    def test_random_sweep(self, webp_lib):
        rng = np.random.default_rng(7)
        for i in range(12):
            h = int(rng.integers(1, 90))
            w = int(rng.integers(1, 90))
            kind = i % 4
            if kind == 0:
                im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            elif kind == 1:
                nc = int(rng.integers(2, 30))
                cols = rng.integers(0, 256, (nc, 4)).astype(np.uint8)
                im = cols[rng.integers(0, nc, (h, w))]
            elif kind == 2:
                im = np.full((h, w, 4), 99, np.uint8)
                im[: h // 2] = rng.integers(0, 256, (h // 2, w, 4))
            else:
                t = rng.integers(0, 256, (max(1, h // 4), max(1, w // 4), 4))
                im = np.tile(t.astype(np.uint8), (6, 6, 1))[:h, :w]
            _roundtrip(webp_lib, np.ascontiguousarray(im))

    def test_luma_contract_and_alpha_compositing(self, webp_lib):
        px = np.zeros((10, 10, 4), np.uint8)
        px[..., 0] = 255  # pure red, alpha 0 -> white page
        data = _enc(webp_lib, px)
        luma = decode_webp(data)
        assert np.all(luma == 255)
        px[..., 3] = 255
        data = _enc(webp_lib, px)
        assert np.all(decode_webp(data) == 76)  # BT.601 red


class TestHandBuiltStreams:
    """Bit-level pinning without libwebp: minimal VP8L streams built
    by hand against the spec's header/simple-code layout."""

    def _container(self, payload: bytes) -> bytes:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    def test_one_pixel_simple_codes(self):
        # header: sig, w-1=0 (14b), h-1=0 (14b), alpha=0, version=0
        # then: no transforms (0), no cache (0), no meta (0),
        # 5 simple prefix codes each with one 8-bit symbol
        bits = []

        def put(v, n):
            for k in range(n):
                bits.append((v >> k) & 1)

        put(0, 14)  # w-1
        put(0, 14)  # h-1
        put(0, 1)  # alpha hint
        put(0, 3)  # version
        put(0, 1)  # no transform
        put(0, 1)  # no cache
        put(0, 1)  # no meta
        for sym in (42, 17, 99, 255, 0):  # g, r, b, a, dist codes
            put(1, 1)  # simple
            put(0, 1)  # one symbol
            put(1, 1)  # 8-bit symbol
            put(sym, 8)
        # all codes single-symbol: zero data bits decode the pixel
        payload = bytearray(b"\x2f")
        acc = 0
        for i, b in enumerate(bits):
            if i and i % 8 == 0:
                payload.append(acc)
                acc = 0
            acc |= b << (i % 8)
        payload.append(acc)
        rgba = decode_vp8l(self._container(bytes(payload))[12 + 8 :])
        assert rgba.shape == (1, 1, 4)
        r, g, b, a = rgba[0, 0]
        assert (r, g, b, a) == (17, 42, 99, 255)

    def test_container_and_vp8x_wrapping(self):
        # reuse the 1x1 stream, wrapped in a VP8X extended container
        bits_payload = None
        # build via the simple test's logic
        t = TestHandBuiltStreams()
        # rebuild payload inline
        bits = []

        def put(v, n):
            for k in range(n):
                bits.append((v >> k) & 1)

        put(0, 14)
        put(0, 14)
        put(0, 1)
        put(0, 3)
        put(0, 1)
        put(0, 1)
        put(0, 1)
        for sym in (1, 2, 3, 255, 0):
            put(1, 1)
            put(0, 1)
            put(1, 1)
            put(sym, 8)
        payload = bytearray(b"\x2f")
        acc = 0
        for i, b in enumerate(bits):
            if i and i % 8 == 0:
                payload.append(acc)
                acc = 0
            acc |= b << (i % 8)
        payload.append(acc)
        payload = bytes(payload)
        vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            vp8l += b"\x00"
        body = b"WEBP" + vp8x + vp8l
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        out = decode_webp(data)
        assert out.shape == (1, 1)

    def test_lossy_vp8_decodes_via_vp8_module(self):
        # lossy decode became REAL later in r4 (extract/vp8.py,
        # tests/test_vp8.py); the VP8L-only entry point still refuses
        from receipt_scanner_spark.extract.webp import _find_vp8l_chunk

        data = (
            b"RIFF" + struct.pack("<I", 16) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        )
        with pytest.raises(NotImplementedError, match="lossy WebP"):
            _find_vp8l_chunk(data)
        if os.path.isfile(_LOSSY_FIXTURE):
            out = decode_webp(open(_LOSSY_FIXTURE, "rb").read())
            assert out.shape == (16, 16)

    def test_decode_pixels_dispatch(self, webp_lib):
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.sniff import sniff_format

        px = np.full((6, 8, 4), 128, np.uint8)
        px[..., 3] = 255
        data = _enc(webp_lib, px)
        assert sniff_format(data) == "image/webp"
        assert np.all(decode_pixels(data) == 128)

    def test_corruption_fuzz_never_crashes(self, webp_lib):
        rng = np.random.default_rng(9)
        base = _enc(webp_lib, rng.integers(0, 256, (16, 16, 4)).astype(np.uint8))
        for _ in range(250):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
            try:
                decode_webp(bytes(buf))
            except (ValueError, NotImplementedError, IndexError):
                pass


class TestOcrEndToEnd:
    def test_webp_receipt_through_ocr(self, webp_lib):
        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.parsers.registry import parse_text

        px = render_text("TOTAL $5.25\n01/30/2016", scale=2)
        rgba = np.stack([px, px, px, np.full_like(px, 255)], axis=2)
        data = _enc(webp_lib, np.ascontiguousarray(rgba))
        got = parse_text(ocr_pixels(decode_pixels(data)))
        assert got == {"amount": "5.25", "date": "2016-01-30"}


class TestAnimatedWebp:
    """ANIM/ANMF demux + composition (container spec).  Fixtures are
    hand-assembled containers whose FRAME payloads come from libwebp
    (lossless -> exact); the expected canvases are composed
    independently here with plain numpy."""

    def _anmf(self, x, y, frame_webp, dur=40, dispose_bg=False,
              no_blend=False):
        ch = _find_vp8l_chunk(frame_webp)
        inner = b"VP8L" + struct.pack("<I", len(ch)) + ch
        if len(ch) & 1:
            inner += b"\x00"
        fh, fw = None, None
        from receipt_scanner_spark.extract.webp import decode_vp8l

        fh, fw = decode_vp8l(ch).shape[:2]
        def u24(v):
            return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])
        body = (
            u24(x // 2) + u24(y // 2) + u24(fw - 1) + u24(fh - 1)
            + u24(dur) + bytes([(2 if no_blend else 0) | (1 if dispose_bg else 0)])
            + inner
        )
        return b"ANMF" + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def _container(self, cw, chh, anmfs, bg=(255, 255, 255, 255)):
        def u24(v):
            return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])
        vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02, 0, 0, 0]) \
            + u24(cw - 1) + u24(chh - 1)
        anim = b"ANIM" + struct.pack("<I", 6) + bytes(
            [bg[2], bg[1], bg[0], bg[3]]
        ) + b"\x00\x00"
        body = b"WEBP" + vp8x + anim + b"".join(anmfs)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_compose_blend_and_dispose(self, webp_lib):
        from receipt_scanner_spark.extract.webp import demux_webp_frames

        rng = np.random.default_rng(11)
        f1 = np.full((16, 16, 4), 0, np.uint8)
        f1[..., 0] = 200  # gray via BT601 of (200,0,0) = 59
        f1[..., 3] = 255
        f2 = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
        f2[..., 3] = 128  # semi-transparent -> blends
        f3 = np.full((8, 8, 4), 255, np.uint8)
        data = self._container(
            16, 16,
            [
                self._anmf(0, 0, _enc(webp_lib, f1)),
                self._anmf(4, 4, _enc(webp_lib, f2), dispose_bg=True),
                self._anmf(8, 8, _enc(webp_lib, f3), no_blend=True),
            ],
        )
        frames = demux_webp_frames(data)
        assert len(frames) == 3
        assert frames[0][1] == 40  # duration
        # frame 1: full-canvas opaque
        l1 = (299 * 200) // 1000
        assert np.all(frames[0][0] == l1)
        # frame 2: blend of f2 over frame1 at (4,4)
        r = f2[..., 0].astype(np.uint32)
        g = f2[..., 1].astype(np.uint32)
        b = f2[..., 2].astype(np.uint32)
        fl = (299 * r + 587 * g + 114 * b) // 1000
        out_a = 128 + (255 * (255 - 128)) // 255
        blend = (fl * 128 * 255 + l1 * 255 * (255 - 128)) // (out_a * 255)
        want2 = np.full((16, 16), l1, np.uint32)
        want2[4:12, 4:12] = blend
        assert np.array_equal(frames[1][0], want2.astype(np.uint8))
        # frame 3: dispose-bg cleared the f2 rect to the white bg,
        # then f3 replaces (8,8)..(16,16); all white there anyway
        want3 = np.full((16, 16), l1, np.uint32)
        want3[4:12, 4:12] = 255
        want3[8:16, 8:16] = 255
        assert np.array_equal(frames[2][0], want3.astype(np.uint8))

    def test_sample_frames_spark_fanout(self, webp_lib, spark):
        import pyspark.sql.functions as F

        from receipt_scanner_spark.extract.imaging import decode_pixels
        from receipt_scanner_spark.operators.multimodal import sample_frames

        frames_rgba = []
        for k in range(6):
            f = np.full((10, 12, 4), 40 * k, np.uint8)
            f[..., 3] = 255
            frames_rgba.append(f)
        data = self._container(
            12, 10,
            [self._anmf(0, 0, _enc(webp_lib, f), no_blend=True)
             for f in frames_rgba],
        )
        df = spark.createDataFrame([(7, bytearray(data))],
                                   "media_id long, media binary")
        out = sample_frames(df, n_frames=3).orderBy("frame_idx").collect()
        assert [r.frame_idx for r in out] == [0, 2, 4]
        for r in out:
            luma = decode_pixels(bytes(r.frame))
            k = r.frame_idx
            want = (299 * 40 * k + 587 * 40 * k + 114 * 40 * k) // 1000
            assert np.all(luma == min(want, 255))

    def test_plain_webp_single_frame(self, webp_lib):
        from receipt_scanner_spark.extract.webp import demux_webp_frames

        px = np.full((6, 8, 4), 90, np.uint8)
        px[..., 3] = 255
        frames = demux_webp_frames(_enc(webp_lib, px))
        assert len(frames) == 1 and frames[0][1] == 0
