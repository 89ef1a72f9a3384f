"""Differential oracle for the TIFF container + CCITT/LZW/PackBits/
Deflate decoders (extract/tiff.py, extract/ccitt.py) against the
SYSTEM libtiff (ctypes, no dev headers or installs needed).

Until r4 these decoders were pinned by independent in-test encoders
and spec-structure tests; libtiff turns that into a true third-party
differential, both directions:

1. libtiff WRITES files (every compression the decoder claims:
   none / CCITT-RLE / G3-1D / G3-2D / G4 / LZW ± horizontal
   predictor / Deflate ± predictor / PackBits; strip heights 1..h;
   tiles; multi-page; both fax photometrics) -> extract/tiff.py must
   decode every one to the exact source pixels (all codecs lossless).
2. OUR in-test encoders write (G4 / G3-mixed / LZW / PackBits strips
   via tests.test_tiff.write_tiff) -> libtiff must read them back to
   the same pixels (reverse interop).

Run: python tools/diff_tiff_oracle.py [n_rounds]
Prints one summary line; exits nonzero on any divergence.
"""

from __future__ import annotations

import ctypes
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from receipt_scanner_spark.extract.tiff import (  # noqa: E402
    decode_tiff,
    decode_tiff_pages,
)

_LIB = "libtiff.so.6"

# public TIFF 6.0 tag / value constants
W, H, BPS, COMP, PHOT, STRIPROWS = 256, 257, 258, 259, 262, 278
T4OPTIONS, PREDICTOR, TILE_W, TILE_H = 292, 317, 322, 323
FILLORDER, SPP, PLANARCONFIG = 266, 277, 284
# libtiff JPEG codec pseudo-tags (tif_jpeg.c — not file tags)
JPEGQUALITY, JPEGCOLORMODE, JPEGTABLESMODE = 65537, 65538, 65539


class LibTiff:
    def __init__(self):
        lib = ctypes.CDLL(_LIB)
        lib.TIFFOpen.restype = ctypes.c_void_p
        lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.TIFFWriteScanline.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
        ]
        lib.TIFFReadScanline.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
        ]
        lib.TIFFWriteTile.restype = ctypes.c_long
        lib.TIFFWriteTile.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
        ]
        lib.TIFFWriteDirectory.argtypes = [ctypes.c_void_p]
        lib.TIFFReadDirectory.argtypes = [ctypes.c_void_p]
        lib.TIFFClose.argtypes = [ctypes.c_void_p]
        lib.TIFFIsTiled.argtypes = [ctypes.c_void_p]
        lib.TIFFTileSize.restype = ctypes.c_long
        lib.TIFFTileSize.argtypes = [ctypes.c_void_p]
        lib.TIFFReadTile.restype = ctypes.c_long
        lib.TIFFReadTile.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
        ]
        lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
        lib.TIFFReadRGBAImageOriented.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
        ]
        lib.TIFFSetErrorHandler(None)  # quiet; failures detected by diff
        lib.TIFFSetWarningHandler(None)
        self.lib = lib

    def set(self, tif, tag, val):
        if not self.lib.TIFFSetField(
            ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_int(val)
        ):
            raise RuntimeError(f"TIFFSetField({tag}, {val}) failed")

    def write(
        self, px: np.ndarray, comp: int, *, phot=None, bps=8, rows=None,
        predictor=None, t4opts=None, tile=None, pages=1,
        fillorder=None, planar=None, quality=None, tablesmode=None,
    ) -> bytes:
        """Write px via libtiff: (h, w) uint8 (or bool for bps=1,
        uint16 for bps=16), or (h, w, spp) for multi-sample images
        (contiguous, or plane-interleaved with ``planar=2``)."""
        h, w = px.shape[:2]
        spp = px.shape[2] if px.ndim == 3 else 1
        fd, path = tempfile.mkstemp(suffix=".tif")
        os.close(fd)
        try:
            tif = self.lib.TIFFOpen(path.encode(), b"w")
            assert tif, "TIFFOpen(w) failed"
            for page in range(pages):
                self.set(tif, W, w)
                self.set(tif, H, h)
                self.set(tif, BPS, bps)
                self.set(tif, SPP, spp)
                self.set(tif, COMP, comp)
                self.set(
                    tif, PHOT,
                    phot if phot is not None
                    else (2 if spp >= 3 else (0 if bps == 1 else 1)),
                )
                if quality is not None:  # after COMP: codec pseudo-tag
                    self.set(tif, JPEGQUALITY, quality)
                if tablesmode is not None:
                    self.set(tif, JPEGTABLESMODE, tablesmode)
                if t4opts is not None:
                    self.set(tif, T4OPTIONS, t4opts)
                if predictor is not None:
                    self.set(tif, PREDICTOR, predictor)
                if fillorder is not None:
                    self.set(tif, FILLORDER, fillorder)
                if planar is not None:
                    self.set(tif, PLANARCONFIG, planar)
                shifted = np.roll(px, page, axis=0)  # distinct page content
                if planar == 2 and spp > 1:
                    if tile:
                        tw, th = tile
                        self.set(tif, TILE_W, tw)
                        self.set(tif, TILE_H, th)
                        for s in range(spp):
                            for y0 in range(0, h, th):
                                for x0 in range(0, w, tw):
                                    blk = np.zeros((th, tw), dtype=px.dtype)
                                    sub = shifted[y0 : y0 + th,
                                                  x0 : x0 + tw, s]
                                    blk[: sub.shape[0],
                                        : sub.shape[1]] = sub
                                    r = self.lib.TIFFWriteTile(
                                        tif, blk.tobytes(), x0, y0, 0, s
                                    )
                                    assert r > 0, "TIFFWriteTile failed"
                    else:
                        self.set(tif, STRIPROWS, rows if rows else h)
                        for s in range(spp):
                            for y in range(h):
                                buf = np.ascontiguousarray(
                                    shifted[y, :, s]
                                ).tobytes()
                                if self.lib.TIFFWriteScanline(
                                    tif, buf, y, s
                                ) < 0:
                                    raise RuntimeError(
                                        "TIFFWriteScanline failed"
                                    )
                    if pages > 1:
                        assert self.lib.TIFFWriteDirectory(tif)
                    continue
                if tile:
                    tw, th = tile
                    self.set(tif, TILE_W, tw)
                    self.set(tif, TILE_H, th)
                    for y0 in range(0, h, th):
                        for x0 in range(0, w, tw):
                            blk = np.zeros((th, tw), dtype=px.dtype)
                            sub = shifted[y0 : y0 + th, x0 : x0 + tw]
                            blk[: sub.shape[0], : sub.shape[1]] = sub
                            buf = (
                                np.packbits(blk, axis=1).tobytes()
                                if bps == 1
                                else blk.tobytes()
                            )
                            r = self.lib.TIFFWriteTile(
                                tif, buf, x0, y0, 0, 0
                            )
                            assert r > 0, "TIFFWriteTile failed"
                else:
                    self.set(tif, STRIPROWS, rows if rows else h)
                    for y in range(h):
                        row = shifted[y : y + 1]
                        buf = (
                            np.packbits(row, axis=1).tobytes()
                            if bps == 1
                            else row.tobytes()
                        )
                        if self.lib.TIFFWriteScanline(tif, buf, y, 0) < 0:
                            raise RuntimeError("TIFFWriteScanline failed")
                if pages > 1:
                    assert self.lib.TIFFWriteDirectory(tif)
            self.lib.TIFFClose(tif)
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)

    def read(self, data: bytes) -> list[np.ndarray]:
        """Read every page back as (h, w) uint8 luma (photometric 0
        inverted), mirroring decode_tiff's output contract."""
        fd, path = tempfile.mkstemp(suffix=".tif")
        os.close(fd)
        try:
            with open(path, "wb") as f:
                f.write(data)
            tif = self.lib.TIFFOpen(path.encode(), b"r")
            assert tif, "TIFFOpen(r) failed"
            pages = []
            while True:
                wv = ctypes.c_uint32(0)
                hv = ctypes.c_uint32(0)
                bv = ctypes.c_uint16(0)
                pv = ctypes.c_uint16(0)
                self.lib.TIFFGetField(
                    ctypes.c_void_p(tif), ctypes.c_uint32(W), ctypes.byref(wv)
                )
                self.lib.TIFFGetField(
                    ctypes.c_void_p(tif), ctypes.c_uint32(H), ctypes.byref(hv)
                )
                self.lib.TIFFGetFieldDefaulted(
                    ctypes.c_void_p(tif), ctypes.c_uint32(BPS), ctypes.byref(bv)
                )
                self.lib.TIFFGetFieldDefaulted(
                    ctypes.c_void_p(tif), ctypes.c_uint32(PHOT), ctypes.byref(pv)
                )
                sv = ctypes.c_uint16(0)
                self.lib.TIFFGetFieldDefaulted(
                    ctypes.c_void_p(tif), ctypes.c_uint32(SPP), ctypes.byref(sv)
                )
                w, h, bps, phot = wv.value, hv.value, bv.value, pv.value
                spp = max(1, sv.value)
                if self.lib.TIFFIsTiled(ctypes.c_void_p(tif)):
                    # tiled pages need TIFFReadTile (scanlines refuse);
                    # 8-bit only — that's all the tiled readback cases use
                    assert bps == 8 and spp == 1
                    twv = ctypes.c_uint32(0)
                    thv = ctypes.c_uint32(0)
                    self.lib.TIFFGetField(
                        ctypes.c_void_p(tif), ctypes.c_uint32(TILE_W),
                        ctypes.byref(twv))
                    self.lib.TIFFGetField(
                        ctypes.c_void_p(tif), ctypes.c_uint32(TILE_H),
                        ctypes.byref(thv))
                    tw, th = twv.value, thv.value
                    tsize = self.lib.TIFFTileSize(tif)
                    tbuf = ctypes.create_string_buffer(tsize + 8)
                    page = np.zeros((h, w), dtype=np.uint8)
                    for y0 in range(0, h, th):
                        for x0 in range(0, w, tw):
                            if self.lib.TIFFReadTile(
                                tif, tbuf, x0, y0, 0, 0
                            ) < 0:
                                raise RuntimeError("TIFFReadTile failed")
                            arr = np.frombuffer(
                                tbuf.raw[: tw * th], dtype=np.uint8
                            ).reshape(th, tw)
                            ph = min(th, h - y0)
                            pw = min(tw, w - x0)
                            page[y0 : y0 + ph, x0 : x0 + pw] = arr[:ph, :pw]
                    if phot == 0:
                        page = (255 - page).astype(np.uint8)
                    pages.append(page)
                    if not self.lib.TIFFReadDirectory(tif):
                        break
                    continue
                rowbytes = (w * bps * spp + 7) // 8
                buf = ctypes.create_string_buffer(rowbytes + 8)
                rows = []
                for y in range(h):
                    if self.lib.TIFFReadScanline(tif, buf, y, 0) < 0:
                        raise RuntimeError("TIFFReadScanline failed")
                    raw = np.frombuffer(buf.raw[:rowbytes], dtype=np.uint8)
                    if bps == 1:
                        bits = np.unpackbits(raw)[:w]
                        row = np.where(bits, 0, 255) if phot == 0 else bits * 255
                    elif phot == 5 and spp >= 4:
                        # separated readback → naive ink composite then
                        # BT.601 (the decoder's _cmyk_luma contract)
                        c, m_, ye, k = (
                            raw[i : w * spp : spp].astype(np.uint32)
                            for i in range(4)
                        )
                        r = (255 - c) * (255 - k) // 255
                        g = (255 - m_) * (255 - k) // 255
                        b = (255 - ye) * (255 - k) // 255
                        row = (299 * r + 587 * g + 114 * b) // 1000
                    elif spp >= 3:  # RGB readback → decoder's luma contract
                        r, g, b = (raw[i : w * spp : spp].astype(np.uint32)
                                   for i in range(3))
                        row = (299 * r + 587 * g + 114 * b) // 1000
                    else:
                        row = 255 - raw[:w] if phot == 0 else raw[:w]
                    rows.append(row.astype(np.uint8))
                pages.append(np.stack(rows))
                if not self.lib.TIFFReadDirectory(tif):
                    break
            self.lib.TIFFClose(tif)
            return pages
        finally:
            os.unlink(path)

    def read_rgba(self, data: bytes):
        """First page via TIFFReadRGBAImageOriented (top-left) →
        (h, w, 4) uint8 — libtiff's own YCbCr→RGB conversion, used to
        pin our photometric-6 unit-layout parsing."""
        fd, path = tempfile.mkstemp(suffix=".tif")
        os.close(fd)
        try:
            with open(path, "wb") as f:
                f.write(data)
            tif = self.lib.TIFFOpen(path.encode(), b"r")
            assert tif, "TIFFOpen(r) failed"
            wv = ctypes.c_uint32(0)
            hv = ctypes.c_uint32(0)
            self.lib.TIFFGetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(W), ctypes.byref(wv)
            )
            self.lib.TIFFGetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(H), ctypes.byref(hv)
            )
            w, h = wv.value, hv.value
            buf = (ctypes.c_uint32 * (w * h))()
            ok = self.lib.TIFFReadRGBAImageOriented(
                ctypes.c_void_p(tif), w, h, buf, 1, 0
            )  # 1 = ORIENTATION_TOPLEFT
            self.lib.TIFFClose(tif)
            if not ok:
                return None
            return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
        finally:
            os.unlink(path)


def ycbcr_libtiff_trim(h, w, hs, vs):
    """Region libtiff's RGBA path renders faithfully for a chunky
    YCbCr image.  Its 4:x leftover code mis-renders the doubly-partial
    corner unit AND the final row group's trailing full unit when any
    partial unit exists — trim the last unit row/column in that case.
    The 1x/2x paths are exact everywhere (verified empirically)."""
    if hs <= 2 and vs <= 2:
        return h, w
    partial = bool(h % vs or w % hs)
    hh = h - h % vs - (vs if partial else 0)
    ww = w - w % hs - (hs if partial else 0)
    return hh, ww


def expected_luma(px: np.ndarray, bps: int, phot: int) -> np.ndarray:
    if bps == 1:
        return np.where(px.astype(bool), 0, 255).astype(np.uint8) \
            if phot == 0 else (px.astype(np.uint8) * 255)
    if bps == 16:
        px = (px.astype(np.uint16) >> 8).astype(np.uint8)
    if px.ndim == 3:  # RGB: integer BT.601 luma (decoder contract)
        r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
        return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    return (255 - px).astype(np.uint8) if phot == 0 else px.astype(np.uint8)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    lt = LibTiff()
    rng = np.random.default_rng(20260818)
    checks = fails = 0

    def check(name, got, want):
        nonlocal checks, fails
        checks += 1
        if got is None or got.shape != want.shape or not np.array_equal(got, want):
            fails += 1
            print(f"FAIL {name}: got "
                  f"{None if got is None else got.shape} want {want.shape}")

    def check_close(name, got, want, tol):
        nonlocal checks, fails
        checks += 1
        if (got is None or got.shape != want.shape
                or int(np.abs(got.astype(np.int16)
                              - want.astype(np.int16)).max()) > tol):
            d = (None if got is None or got.shape != want.shape else
                 int(np.abs(got.astype(np.int16)
                            - want.astype(np.int16)).max()))
            fails += 1
            print(f"FAIL {name}: maxdiff {d} > {tol}")

    for r in range(rounds):
        h = int(rng.integers(5, 90))
        w = int(rng.integers(5, 90))
        gray = rng.integers(0, 256, (h, w)).astype(np.uint8)
        # text-like bilevel content (runs, not pure noise) exercises
        # real CCITT code paths
        bil = (rng.random((h, w)) < 0.15)
        for _ in range(4):
            y0, x0 = rng.integers(0, h), rng.integers(0, w)
            bil[y0:, x0 : x0 + int(rng.integers(1, 20))] ^= True
        bil = bil.astype(np.uint8)
        gray16 = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rgb16 = rng.integers(0, 65536, (h, w, 3)).astype(np.uint16)
        rows = int(rng.choice([1, 3, h]))

        # direction 1: libtiff writes -> our decoder reads
        for name, px, comp, kw in [
            ("none", gray, 1, dict(rows=rows)),
            ("lzw", gray, 5, dict(rows=rows)),
            ("lzw+pred", gray, 5, dict(rows=rows, predictor=2)),
            ("deflate", gray, 8, dict(rows=rows)),
            ("deflate+pred", gray, 8, dict(rows=rows, predictor=2)),
            ("packbits", gray, 32773, dict(rows=rows)),
            ("ccitt-rle", bil, 2, dict(bps=1, rows=rows)),
            ("g3-1d", bil, 3, dict(bps=1, rows=rows)),
            ("g3-2d", bil, 3, dict(bps=1, rows=rows, t4opts=1)),
            ("g4", bil, 4, dict(bps=1, rows=rows)),
            ("g4-minisblack", bil, 4, dict(bps=1, rows=rows, phot=1)),
            ("lzw-tiled", gray, 5, dict(tile=(16, 16))),
            ("g4-tiled", bil, 4, dict(bps=1, tile=(32, 16))),
            # r5: FillOrder 2 — raw strip bytes bit-reversed for EVERY
            # codec (the libtiff TIFFFillStrip semantic)
            ("none-1bit-fo2", bil, 1, dict(bps=1, rows=rows, fillorder=2)),
            ("g4-fo2", bil, 4, dict(bps=1, rows=rows, fillorder=2)),
            ("g3-2d-fo2", bil, 3,
             dict(bps=1, rows=rows, t4opts=1, fillorder=2)),
            ("lzw-fo2", gray, 5, dict(rows=rows, fillorder=2)),
            ("deflate-fo2", gray, 8, dict(rows=rows, fillorder=2)),
            ("packbits-fo2", gray, 32773, dict(rows=rows, fillorder=2)),
            # r5: 16-bit samples (high-byte luma), predictor at 16-bit
            ("none-16bit", gray16, 1, dict(bps=16, rows=rows)),
            ("lzw-16bit+pred", gray16, 5,
             dict(bps=16, rows=rows, predictor=2)),
            ("deflate-16bit-phot0", gray16, 8,
             dict(bps=16, rows=rows, phot=0)),
            # r5: contiguous + planar-2 RGB
            ("rgb-contig", rgb, 1, dict(rows=rows)),
            ("rgb-planar2", rgb, 1, dict(rows=rows, planar=2)),
            ("rgb-planar2-lzw+pred", rgb, 5,
             dict(rows=rows, planar=2, predictor=2)),
            ("rgb-planar2-fo2", rgb, 32773,
             dict(rows=rows, planar=2, fillorder=2)),
            ("rgb16-planar2", rgb16, 1, dict(bps=16, rows=rows, planar=2)),
            # r5 continuation: plane-major TILE sets
            ("rgb-planar2-tiled", rgb, 1, dict(planar=2, tile=(16, 16))),
            ("rgb-planar2-tiled-lzw+pred", rgb, 5,
             dict(planar=2, tile=(16, 16), predictor=2)),
        ]:
            data = lt.write(px, comp, **kw)
            bps = kw.get("bps", 8)
            phot = kw.get("phot", 0 if bps == 1 else 1)
            try:
                got = decode_tiff(data)
            except (ValueError, NotImplementedError) as exc:
                got = None
                print(f"  ({name}: {exc})")
            check(f"libtiff->ours {name} {h}x{w}", got, expected_luma(px, bps, phot))

        # r5 continuation: CMYK (photometric 5) — lossless codecs, so
        # our decode must equal the naive-composite luma of the source
        # ink values exactly
        from receipt_scanner_spark.extract.tiff import _cmyk_luma

        cmyk = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        for name, comp_, kw in [
            ("cmyk-none", 1, dict(rows=rows, phot=5)),
            ("cmyk-lzw+pred", 5, dict(rows=rows, phot=5, predictor=2)),
            ("cmyk-planar2", 1, dict(rows=rows, phot=5, planar=2)),
        ]:
            data = lt.write(cmyk, comp_, **kw)
            try:
                got = decode_tiff(data)
            except (ValueError, NotImplementedError) as exc:
                got = None
                print(f"  ({name}: {exc})")
            check(f"libtiff->ours {name} {h}x{w}", got, _cmyk_luma(cmyk))

        # session 3: chunky YCbCr (photometric 6).  OUR unit-layout
        # writer with libtiff's own RGBA reader as the third-party pin:
        # neutral chroma (Cb=Cr=128) makes libtiff's YCbCr->RGB emit
        # R=G=B=Y exactly, so the readback pins the Y positions in the
        # unit layout BIT-EXACTLY; a colored-chroma case bounds the
        # luma residual (fixed-point conversion, chroma kept clip-free)
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
        )
        from tests.test_tiff import write_ycbcr_tiff

        for hs, vs in ((1, 1), (2, 1), (2, 2), (4, 2), (4, 4), (1, 2)):
            uph, upw = -(-h // vs), -(-w // hs)
            neutral = np.full((uph, upw), 128, np.uint8)
            rps = max(vs, rows - rows % vs)
            comp_y = int(rng.choice([1, 8, 32773]))
            data = write_ycbcr_tiff(gray, neutral, neutral, hs, vs,
                                    rps=rps, compression=comp_y)
            try:
                got = decode_tiff(data)
            except (ValueError, NotImplementedError) as exc:
                got = None
                print(f"  (ycbcr-{hs}{vs}: {exc})")
            check(f"ours ycbcr-{hs}x{vs}-c{comp_y} {h}x{w}", got, gray)
            rgba = lt.read_rgba(data)
            hh, ww = ycbcr_libtiff_trim(h, w, hs, vs)
            check(f"libtiff-rgba ycbcr-{hs}x{vs} {h}x{w}",
                  None if rgba is None else rgba[:hh, :ww, 0],
                  gray[:hh, :ww])
        cbp = rng.integers(118, 138, (-(-h // 2), -(-w // 2))).astype(
            np.uint8
        )
        crp = rng.integers(118, 138, cbp.shape).astype(np.uint8)
        data = write_ycbcr_tiff(gray, cbp, crp, 2, 2)
        rgba = lt.read_rgba(data)
        lum = None
        if rgba is not None:
            r_, g_, b_ = (rgba[:, :, i].astype(np.uint32) for i in range(3))
            lum = ((299 * r_ + 587 * g_ + 114 * b_) // 1000).astype(np.uint8)
        check_close(f"libtiff-luma ycbcr-colored {h}x{w}",
                    lum, decode_tiff(data), 8)

        # r5 continuation: JPEG-in-TIFF (compression 7).  Lossy, so the
        # differential compares OUR decode of the file against
        # LIBTIFF'S OWN decode of the same file — both consume the same
        # T.81 streams; the residual is IDCT rounding (libjpeg islow vs
        # our float matmul), bounded tight.  The default tablesmode
        # exercises the shared-JPEGTables (tag 347) merge; tablesmode=0
        # the self-contained-strip path.
        for name, px, kw, tol in [
            ("jpeg-gray-tables347", gray, dict(rows=16, quality=90), 2),
            ("jpeg-gray-own-tables", gray,
             dict(rows=16, quality=75, tablesmode=0), 2),
            ("jpeg-gray-tiled", gray, dict(tile=(16, 16), quality=90), 2),
            ("jpeg-rgb", rgb, dict(rows=16, quality=90, phot=2), 3),
            # r5 continuation: separated (photometric 5) JPEG strips —
            # natural ink convention (libtiff compresses JCS_UNKNOWN,
            # no Adobe APP14); the multiplicative composite can double
            # the per-channel IDCT residual, hence the wider tolerance
            ("jpeg-cmyk", cmyk, dict(rows=16, quality=90, phot=5), 6),
            ("jpeg-cmyk-own-tables", cmyk,
             dict(rows=16, quality=75, tablesmode=0, phot=5), 8),
        ]:
            data = lt.write(px, 7, **kw)
            try:
                got = decode_tiff(data)
            except (ValueError, NotImplementedError) as exc:
                got = None
                print(f"  ({name}: {exc})")
            check_close(f"libtiff->ours {name} {h}x{w}", got,
                        lt.read(data)[0], tol)

        # multi-page both ways
        data = lt.write(gray, 5, rows=rows, pages=3)
        pages = decode_tiff_pages(data)
        checks += 1
        if len(pages) != 3 or not all(
            np.array_equal(p, np.roll(gray, i, axis=0))
            for i, p in enumerate(pages)
        ):
            fails += 1
            print(f"FAIL multipage {h}x{w}")

        # direction 2: our encoders write -> libtiff reads
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
        )
        from tests.test_ccitt import encode_g4
        from tests.test_pdf_filters import lzw_encode_pdf
        from tests.test_tiff import _packbits_encode, write_tiff

        ours = [
            ("g4", write_tiff(
                [encode_g4(bil.astype(bool))], w, h, compression=4,
                photometric=0, bps=1,
            ), bil, 1, 0),
            ("lzw", write_tiff([lzw_encode_pdf(gray.tobytes())], w, h,
                               compression=5), gray, 8, 1),
            # PackBits runs must not cross row boundaries for interop
            # (libtiff decodes per row; TIFF 6.0 compresses rows
            # independently) — our decoder accepts both, so the
            # in-test whole-strip encoder stays as the tolerance pin
            # and the interop direction encodes per row
            ("packbits", write_tiff(
                [b"".join(_packbits_encode(gray[y].tobytes())
                          for y in range(h))],
                w, h, compression=32773), gray, 8, 1),
        ]
        for name, data, px, bps, phot in ours:
            got = lt.read(data)[0]
            check(f"ours->libtiff {name} {h}x{w}", got,
                  expected_luma(px, bps, phot))

        # our comp-7 container interop: take the self-contained T.81
        # strips libtiff itself produced, re-wrap them in OUR container
        # — libtiff must decode both files identically.  (The in-test
        # JPEG encoder's streams can't feed libjpeg here: its
        # deliberately-unusual DC table carries category 16 for 12-bit
        # frames, which libjpeg rejects in an 8-bit baseline frame.)
        from receipt_scanner_spark.extract.tiff import _read_ifd

        src = lt.write(gray, 7, rows=16, quality=85, tablesmode=0)
        t_ = _read_ifd(src, "<")
        strips7 = [src[o : o + c] for o, c in zip(t_[273], t_[279])]
        ours_jpeg = write_tiff(strips7, w, h, compression=7,
                               rows_per_strip=16)
        check(f"ours->libtiff jpeg {h}x{w}", lt.read(ours_jpeg)[0],
              lt.read(src)[0])

    print(f"tiff differential: {fails}/{checks} divergences")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
