"""Differential oracle for the VP8L (lossless WebP) decoder
(receipt_scanner_spark/extract/webp.py) against the SYSTEM libwebp,
driven via ctypes (no installs, no compile step).

libwebp encodes a randomized content battery — photos (predictor +
color-transform + subtract-green), palettes at every bundling width,
tiled/repetitive content (LZ77 with 2D distances), alpha gradients,
large mixed images (meta prefix groups, predictor-mode-11 ties),
flat fills (simple codes) — and our decode must equal libwebp's own
decode EXACTLY (lossless = strict oracle).

Run: python tools/diff_webp_oracle.py [n_images]
Prints one summary line; exits nonzero on any divergence.
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from receipt_scanner_spark.extract.webp import (  # noqa: E402
    _find_vp8l_chunk,
    decode_vp8l,
)


def main() -> int:
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        print("SKIP: no system libwebp")
        return 0
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

    def enc(rgba):
        h, w = rgba.shape[:2]
        out = ctypes.c_void_p()
        n = lib.WebPEncodeLosslessRGBA(
            np.ascontiguousarray(rgba).ctypes.data, w, h, w * 4,
            ctypes.byref(out),
        )
        data = ctypes.string_at(out.value, n)
        lib.WebPFree(out)
        return data

    def libdec(data, h, w):
        wd, hd = ctypes.c_int(), ctypes.c_int()
        p = lib.WebPDecodeRGBA(
            data, len(data), ctypes.byref(wd), ctypes.byref(hd)
        )
        return np.ctypeslib.as_array(p, shape=(h, w, 4)).copy()

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    rng = np.random.default_rng(20260818)
    fails = 0
    for i in range(n_images):
        h = int(rng.integers(1, 260))
        w = int(rng.integers(1, 260))
        kind = i % 6
        if kind == 0:  # noise (+alpha)
            im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        elif kind == 1:  # palette
            nc = int(rng.integers(2, 80))
            cols = rng.integers(0, 256, (nc, 4)).astype(np.uint8)
            im = cols[rng.integers(0, nc, (h, w))]
        elif kind == 2:  # smooth photo
            yy, xx = np.mgrid[0:h, 0:w]
            im = np.stack([
                np.clip(128 + 90 * np.sin(yy / (1 + rng.random() * 12)), 0, 255),
                np.clip(128 + 90 * np.cos(xx / (1 + rng.random() * 12)), 0, 255),
                np.clip((xx + yy) % 256, 0, 255),
                np.full((h, w), 255.0),
            ], axis=2).astype(np.uint8)
        elif kind == 3:  # tiled
            t = rng.integers(0, 256, (max(1, h // 5), max(1, w // 5), 4))
            im = np.tile(t.astype(np.uint8), (6, 6, 1))[:h, :w]
        elif kind == 4:  # mixed flat + texture (meta groups)
            im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            im[: h // 2, : w // 2] = 200
        else:  # gradients with noise (predictor-heavy)
            yy, xx = np.mgrid[0:h, 0:w]
            base = np.clip(
                128 + 60 * np.sin(yy / 9) + rng.normal(0, 20, (h, w)), 0, 255
            )
            im = np.stack(
                [base, np.roll(base, 3, 1), np.roll(base, 5, 0),
                 np.full((h, w), 255.0)], axis=2,
            ).astype(np.uint8)
        im = np.ascontiguousarray(im)
        h, w = im.shape[:2]  # tiling may produce fewer rows than asked
        data = enc(im)
        ref = libdec(data, h, w)
        try:
            got = decode_vp8l(_find_vp8l_chunk(data))
            if not np.array_equal(got, ref):
                fails += 1
                print(f"FAIL {i} kind={kind} {h}x{w}")
        except Exception as exc:  # noqa: BLE001
            fails += 1
            print(f"RAISED {i} kind={kind} {h}x{w}: {type(exc).__name__} {exc}")
    print(f"webp-vp8l differential: {fails}/{n_images} divergences")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
