"""Differential oracle for the lossy WebP (VP8 key frame) decoder
(receipt_scanner_spark/extract/vp8.py) against the SYSTEM libwebp
via ctypes.

Lossy decode is deterministic, so the oracle is EXACT: libwebp
encodes a randomized battery (content classes x quality levels x
dimensions, with and without alpha), and our reconstructed Y/U/V
planes must equal ``WebPDecodeYUV``'s bit-for-bit; alpha composites
are checked against ``WebPDecodeRGBA``'s alpha channel.

Run: python tools/diff_vp8_oracle.py [n_images]
Prints one summary line; exits nonzero on any divergence.
"""

from __future__ import annotations

import ctypes
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from receipt_scanner_spark.extract.vp8 import decode_vp8  # noqa: E402
from receipt_scanner_spark.extract.webp import decode_webp  # noqa: E402


def main() -> int:
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        print("SKIP: no system libwebp")
        return 0
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

    def enc(rgba, q):
        h, w = rgba.shape[:2]
        out = ctypes.c_void_p()
        n = lib.WebPEncodeRGBA(
            np.ascontiguousarray(rgba).ctypes.data, w, h, w * 4,
            ctypes.c_float(q), ctypes.byref(out),
        )
        data = ctypes.string_at(out.value, n)
        lib.WebPFree(out)
        return data

    def libyuv(data):
        w, h = ctypes.c_int(), ctypes.c_int()
        stride, uv_stride = ctypes.c_int(), ctypes.c_int()
        up = ctypes.POINTER(ctypes.c_uint8)()
        vp = ctypes.POINTER(ctypes.c_uint8)()
        yp = lib.WebPDecodeYUV(
            data, len(data), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(up), ctypes.byref(vp),
            ctypes.byref(stride), ctypes.byref(uv_stride),
        )
        W, H = w.value, h.value
        Y = np.ctypeslib.as_array(yp, shape=(H, stride.value))[:, :W].copy()
        cw, ch = (W + 1) // 2, (H + 1) // 2
        U = np.ctypeslib.as_array(up, shape=(ch, uv_stride.value))[:, :cw].copy()
        V = np.ctypeslib.as_array(vp, shape=(ch, uv_stride.value))[:, :cw].copy()
        return Y, U, V

    def payload(data):
        i = 12
        while i + 8 <= len(data):
            tag = data[i : i + 4]
            (size,) = struct.unpack("<I", data[i + 4 : i + 8])
            if tag == b"VP8 ":
                return data[i + 8 : i + 8 + size]
            i += 8 + size + (size & 1)
        raise AssertionError("no VP8 chunk")

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rng = np.random.default_rng(20260818)
    fails = 0
    for i in range(n_images):
        h = int(rng.integers(1, 220))
        w = int(rng.integers(1, 220))
        q = float(rng.integers(3, 100))
        kind = i % 5
        yy, xx = np.mgrid[0:h, 0:w]
        if kind == 0:
            im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        elif kind == 1:
            im = np.stack([
                np.clip(128 + 90 * np.sin(yy / (1 + rng.random() * 9)), 0, 255),
                np.clip(128 + 90 * np.cos(xx / (1 + rng.random() * 9)), 0, 255),
                np.clip((xx * 3 + yy * 2) % 256, 0, 255),
                np.full((h, w), 255.0),
            ], axis=2).astype(np.uint8)
        elif kind == 2:
            im = np.full((h, w, 4), 200, np.uint8)
            im[: h // 2, : w // 2] = rng.integers(0, 256, (h // 2, w // 2, 4))
        elif kind == 3:
            im = np.clip(rng.normal(128, 60, (h, w, 4)), 0, 255).astype(np.uint8)
        else:  # with alpha gradient (ALPH chunk)
            im = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            im[..., 3] = np.linspace(5, 250, w).astype(np.uint8)[None, :]
        if kind != 4:
            im[..., 3] = 255
        im = np.ascontiguousarray(im)
        data = enc(im, q)
        Y, U, V = libyuv(data)
        try:
            y, u, v = decode_vp8(payload(data))
            ok = (
                np.array_equal(y, Y) and np.array_equal(u, U)
                and np.array_equal(v, V)
            )
            if ok and kind == 4 and b"ALPH" in data:
                wd, hd = ctypes.c_int(), ctypes.c_int()
                p = lib.WebPDecodeRGBA(
                    data, len(data), ctypes.byref(wd), ctypes.byref(hd)
                )
                a = np.ctypeslib.as_array(p, shape=(h, w, 4))[..., 3].astype(
                    np.uint32
                )
                want = (
                    (Y.astype(np.uint32) * a + 255 * (255 - a)) // 255
                ).astype(np.uint8)
                ok = np.array_equal(decode_webp(data), want)
            if not ok:
                fails += 1
                print(f"FAIL {i} kind={kind} {h}x{w} q={q}")
        except Exception as exc:  # noqa: BLE001
            fails += 1
            print(f"RAISED {i} kind={kind} {h}x{w} q={q}: "
                  f"{type(exc).__name__} {exc}")
    print(f"vp8 differential: {fails}/{n_images} divergences")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
