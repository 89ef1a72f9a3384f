"""TIFF container decoder tests (extract/tiff.py).

Evidence structure mirrors the other decoders: an independent in-test
TIFF WRITER assembles real IFD structures (both byte orders, strip
splitting, every supported compression) and the decoder must round-trip
them; the sample codecs themselves are already pinned by their own
suites (test_ccitt for G3/G4, test_pdf_filters for LZW incl. width
boundaries), so these tests focus on the CONTAINER: tag parsing,
strip geometry, photometric handling, predictor, palette, and the
dispatch/sniff/OCR integrations.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from receipt_scanner_spark.extract.imaging import decode_pixels
from receipt_scanner_spark.extract.sniff import sniff_format
from receipt_scanner_spark.extract.tiff import _packbits_decode, decode_tiff
from tests.test_ccitt import encode_g4, encode_mh
from tests.test_pdf_filters import lzw_encode_pdf

# ---------------------------------------------------------------------------
# independent in-test TIFF writer
# ---------------------------------------------------------------------------


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i)]) + data[i : i + 1]
            i = j
        else:
            k = min(i + 128, len(data))
            out += bytes([k - i - 1]) + data[i:k]
            i = k
    return bytes(out)


def write_tiff(
    strips: list[bytes],
    w: int,
    h: int,
    *,
    endian: str = "<",
    compression: int = 1,
    photometric: int = 1,
    bps: int = 8,
    spp: int = 1,
    rows_per_strip: int | None = None,
    predictor: int | None = None,
    colormap: list[int] | None = None,
    extra_tags: list[tuple[int, int, int, int]] | None = None,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Assemble a single-IFD TIFF around pre-encoded strips — or
    TILES when ``tile=(tw, th)`` (tags 322-325 instead of 273/279)."""
    e = endian
    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    # layout: header(8) | IFD | tag overflow values | strip data
    tags: list[tuple[int, int, int, object]] = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, spp, [bps] * spp),
        (259, 3, 1, compression),
        (262, 3, 1, photometric),
        (277, 3, 1, spp),
    ]
    if tile is None:
        tags.append((278, 4, 1, rows_per_strip or h))
        tags.append((279, 4, len(strips), [len(s) for s in strips]))
    else:
        tags.append((322, 4, 1, tile[0]))
        tags.append((323, 4, 1, tile[1]))
        tags.append((325, 4, len(strips), [len(s) for s in strips]))
    if predictor:
        tags.append((317, 3, 1, predictor))
    if colormap:
        tags.append((320, 3, len(colormap), colormap))
    # strip/tile offsets resolved after layout
    tags.append((273 if tile is None else 324, 4, len(strips), None))
    if extra_tags:
        tags.extend(extra_tags)
    tags.sort(key=lambda t: t[0])

    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    overflow_at = 8 + ifd_size
    overflow = bytearray()

    def encode_vals(typ, cnt, vals):
        if typ in (1, 7):  # BYTE / UNDEFINED: raw byte payload
            return bytes(vals)
        if typ == 5:  # RATIONAL: (num, den) pairs
            return b"".join(
                struct.pack(e + "II", num, den) for num, den in vals
            )
        code = {3: "H", 4: "I"}[typ]
        if not isinstance(vals, list):
            vals = [vals]
        return struct.pack(e + "%d%s" % (cnt, code), *vals)

    # first pass: compute overflow sizes to find strip data start
    sizes = []
    for tag, typ, cnt, vals in tags:
        total = {1: 1, 3: 2, 4: 4, 5: 8, 7: 1}[typ] * cnt
        sizes.append(total if total > 4 else 0)
    data_at = overflow_at + sum(sizes)
    offsets = []
    pos = data_at
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    entries = bytearray()
    for (tag, typ, cnt, vals), ovsize in zip(tags, sizes):
        if tag in (273, 324):
            vals = offsets
        raw = encode_vals(typ, cnt, vals)
        if ovsize:
            entries += struct.pack(
                e + "HHII", tag, typ, cnt, overflow_at + len(overflow)
            )
            overflow += raw
        else:
            entries += struct.pack(e + "HHI", tag, typ, cnt) + raw.ljust(
                4, b"\x00"
            )
    ifd = struct.pack(e + "H", n) + bytes(entries) + struct.pack(e + "I", 0)
    return header + ifd + bytes(overflow) + b"".join(strips)


def _gray_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w), dtype=np.uint8
    )


def _split_strips(raster_bytes: bytes, row_bytes: int, h: int, rps: int):
    return [
        raster_bytes[y * row_bytes : min(y + rps, h) * row_bytes]
        for y in range(0, h, rps)
    ]


def encode_ycbcr_units(y, cb, cr, hs, vs, rps):
    """Chunky YCbCr unit-layout raster (§ "YCbCr Images") split into
    per-strip byte blobs: each hs x vs data unit is hs*vs Y samples
    row-major followed by one Cb and one Cr; edge units padded."""
    h, w = y.shape
    uph, upw = -(-h // vs), -(-w // hs)
    yp = np.zeros((uph * vs, upw * hs), np.uint8)
    yp[:h, :w] = y
    strips = []
    for r0 in range(0, h, rps):
        u0 = r0 // vs
        u1 = min(uph, -(-min(h, r0 + rps) // vs))
        buf = bytearray()
        for uy in range(u0, u1):
            for ux in range(upw):
                buf += yp[uy * vs : (uy + 1) * vs,
                          ux * hs : (ux + 1) * hs].tobytes()
                buf += bytes([int(cb[uy, ux]), int(cr[uy, ux])])
        strips.append(bytes(buf))
    return strips


def write_ycbcr_tiff(
    y, cb, cr, hs=2, vs=2, rps=None, compression=1, rbw=None,
    sub_tag=True,
):
    """Chunky photometric-6 TIFF around encode_ycbcr_units.  ``rbw``:
    six (num, den)-free integral ReferenceBlackWhite values emitted as
    RATIONALs; ``sub_tag=False`` omits tag 530 (default (2, 2))."""
    h, w = y.shape
    rps = rps or h
    strips = encode_ycbcr_units(y, cb, cr, hs, vs, rps)
    if compression == 8:
        strips = [zlib.compress(s) for s in strips]
    elif compression == 32773:
        strips = [_packbits_encode(s) for s in strips]
    else:
        assert compression == 1
    extra = [(531, 3, 1, 1)]
    if sub_tag:
        extra.append((530, 3, 2, [hs, vs]))
    if rbw:
        extra.append((532, 5, 6, [(int(v), 1) for v in rbw]))
    return write_tiff(
        strips, w, h, compression=compression, photometric=6, spp=3,
        rows_per_strip=rps, extra_tags=extra,
    )


def write_ycbcr_planar_tiff(y, cb, cr, hs=2, vs=2):
    """Planar-configuration-2 photometric-6 TIFF: one strip per plane
    (Y full-res, chroma at their subsampled dims)."""
    h, w = y.shape
    strips = [y.tobytes(), cb.tobytes(), cr.tobytes()]
    return write_tiff(
        strips, w, h, compression=1, photometric=6, spp=3,
        rows_per_strip=h,
        extra_tags=[(284, 3, 1, 2), (530, 3, 2, [hs, vs]),
                    (531, 3, 1, 1)],
    )


def write_tiff_multi(pages: list[tuple[bytes, int, int, int]],
                     endian: str = "<") -> bytes:
    """Multi-IFD TIFF: ``pages`` is (strip, w, h, compression) per
    page, single-strip bilevel (photometric 0) — the fax-machine
    layout.  IFDs chain via their next-IFD pointers."""
    e = endian
    out = bytearray(struct.pack(e + "2sHI", b"II" if e == "<" else b"MM",
                                42, 8))
    n_tags = 8
    ifd_size = 2 + 12 * n_tags + 4
    for i, (strip, w, h, comp) in enumerate(pages):
        ifd_off = len(out)
        strip_off = ifd_off + ifd_size
        next_off = strip_off + len(strip) if i + 1 < len(pages) else 0
        ent = struct.pack(e + "H", n_tags)
        for tag, typ, val in [
            (256, 4, w), (257, 4, h), (258, 3, 1), (259, 3, comp),
            (262, 3, 0), (273, 4, strip_off), (278, 4, h),
            (279, 4, len(strip)),
        ]:
            raw = struct.pack(e + ("I" if typ == 4 else "H"), val)
            ent += struct.pack(e + "HHI", tag, typ, 1) + raw.ljust(4, b"\x00")
        ent += struct.pack(e + "I", next_off)
        out += ent + strip
    return bytes(out)


# ---------------------------------------------------------------------------
# container round-trips
# ---------------------------------------------------------------------------


class TestGray:
    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_uncompressed_both_orders(self, endian):
        img = _gray_img(13, 17)
        t = write_tiff([img.tobytes()], 17, 13, endian=endian)
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_multi_strip(self):
        img = _gray_img(23, 9, 1)
        strips = _split_strips(img.tobytes(), 9, 23, 5)
        t = write_tiff(strips, 9, 23, rows_per_strip=5)
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_photometric_zero_inverts(self):
        img = _gray_img(4, 4, 2)
        t = write_tiff([img.tobytes()], 4, 4, photometric=0)
        np.testing.assert_array_equal(decode_tiff(t), 255 - img)

    def test_deflate(self):
        img = _gray_img(16, 16, 3)
        t = write_tiff(
            [zlib.compress(img.tobytes())], 16, 16, compression=8
        )
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_packbits_with_noop(self):
        img = np.tile(np.arange(8, dtype=np.uint8) * 32, (6, 1))
        enc = _packbits_encode(img.tobytes())
        # inject the 128 no-op between packets: must be skipped, not
        # EOD (the PDF RunLength filter treats 128 as EOD — distinct
        # specs).  First packet is a literal: length byte c → c+2 total.
        cut = enc[0] + 2
        enc = enc[:cut] + b"\x80" + enc[cut:]
        t = write_tiff([enc], 8, 6, compression=32773)
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_lzw_gray(self):
        img = _gray_img(20, 30, 4) % 16  # low entropy
        t = write_tiff(
            [lzw_encode_pdf(img.tobytes())], 30, 20, compression=5
        )
        np.testing.assert_array_equal(decode_tiff(t), img)


class TestColor:
    def test_rgb_luma(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
        t = write_tiff([px.tobytes()], 11, 7, photometric=2, spp=3)
        r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
        expect = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_rgb_lzw_predictor2(self):
        rng = np.random.default_rng(6)
        # smooth gradient so predictor 2 actually helps / differs
        base = np.cumsum(rng.integers(0, 3, (9, 13, 3)), axis=1) % 256
        px = base.astype(np.uint8)
        diff = px.astype(np.int16)
        diff[:, 1:, :] = (diff[:, 1:, :] - diff[:, :-1, :]) % 256
        enc = lzw_encode_pdf(diff.astype(np.uint8).tobytes())
        t = write_tiff(
            [enc], 13, 9, photometric=2, spp=3, compression=5, predictor=2
        )
        r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
        expect = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_palette(self):
        rng = np.random.default_rng(7)
        idx = rng.integers(0, 4, (5, 6), dtype=np.uint8)
        # 256-entry 16-bit colormap, entries 0..3 meaningful
        reds = [0] * 256
        greens = [0] * 256
        blues = [0] * 256
        for i, (r, g, b) in enumerate(
            [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
        ):
            reds[i], greens[i], blues[i] = r * 257, g * 257, b * 257
        t = write_tiff(
            [idx.tobytes()],
            6,
            5,
            photometric=3,
            colormap=reds + greens + blues,
        )
        lut8 = np.array(
            [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)],
            dtype=np.uint32,
        )
        rgb = lut8[idx]
        expect = (
            (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2])
            // 1000
        ).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)


class TestBilevel:
    def _pack_rows(self, ink: np.ndarray) -> bytes:
        # photometric 0: white=0 → bit 1 means black ink
        return np.packbits(ink, axis=1).tobytes()

    def test_uncompressed_1bit(self):
        rng = np.random.default_rng(8)
        ink = rng.random((10, 20)) < 0.3
        t = write_tiff(
            [self._pack_rows(ink)], 20, 10, photometric=0, bps=1
        )
        expect = np.where(ink, np.uint8(0), np.uint8(255))
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_g4_multi_strip(self):
        rng = np.random.default_rng(9)
        ink = rng.random((22, 31)) < 0.2
        strips = [
            encode_g4(ink[y : y + 8]) for y in range(0, 22, 8)
        ]
        t = write_tiff(
            strips, 31, 22, photometric=0, bps=1, compression=4,
            rows_per_strip=8,
        )
        expect = np.where(ink, np.uint8(0), np.uint8(255))
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_g3_2d_t4options(self):
        from tests.test_ccitt import encode_g3_mixed

        rng = np.random.default_rng(13)
        ink = rng.random((12, 29)) < 0.25
        t = write_tiff(
            [encode_g3_mixed(ink, k=3, rtc=False)],
            29, 12, photometric=0, bps=1, compression=3,
            extra_tags=[(292, 4, 1, 1)],  # T4Options bit0: 2-D lines
        )
        expect = np.where(ink, np.uint8(0), np.uint8(255))
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_g3_1d(self):
        rng = np.random.default_rng(10)
        ink = rng.random((9, 40)) < 0.25
        t = write_tiff(
            [encode_mh(ink)], 40, 9, photometric=0, bps=1, compression=3
        )
        expect = np.where(ink, np.uint8(0), np.uint8(255))
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_ccitt_rle_byte_aligned(self):
        rng = np.random.default_rng(11)
        ink = rng.random((7, 33)) < 0.25
        t = write_tiff(
            [encode_mh(ink, byte_align=True)],
            33, 7, photometric=0, bps=1, compression=2,
        )
        expect = np.where(ink, np.uint8(0), np.uint8(255))
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_photometric_one_bilevel(self):
        ink = np.zeros((3, 9), dtype=bool)
        ink[1, 2:6] = True
        t = write_tiff(
            [self._pack_rows(ink)], 9, 3, photometric=1, bps=1
        )
        # photometric 1 (BlackIsZero): bit 1 = white
        expect = np.where(ink, np.uint8(255), np.uint8(0))
        np.testing.assert_array_equal(decode_tiff(t), expect)


# ---------------------------------------------------------------------------
# errors / guards
# ---------------------------------------------------------------------------


class TestTiled:
    @staticmethod
    def _tiles_of(img: np.ndarray, tw: int, th: int, pad_val: int = 0):
        h, w = img.shape[:2]
        tiles = []
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                shape = (th, tw) + img.shape[2:]
                t = np.full(shape, pad_val, dtype=img.dtype)
                src = img[y0 : y0 + th, x0 : x0 + tw]
                t[: src.shape[0], : src.shape[1]] = src
                tiles.append(t)
        return tiles

    def test_gray8_uncompressed_with_edge_crop(self):
        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (21, 29), dtype=np.uint8)
        tiles = [t.tobytes() for t in self._tiles_of(img, 16, 16)]
        t = write_tiff(tiles, 29, 21, tile=(16, 16))
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_g4_fax_tiles(self):
        from tests.test_ccitt import encode_g4

        rng = np.random.default_rng(32)
        ink = rng.random((20, 40)) < 0.2
        tiles = [
            encode_g4(t) for t in self._tiles_of(ink, 16, 16, pad_val=0)
        ]
        t = write_tiff(
            tiles, 40, 20, photometric=0, bps=1, compression=4,
            tile=(16, 16),
        )
        expect = np.where(ink, np.uint8(0), np.uint8(255))
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_lzw_predictor_tiles(self):
        from tests.test_pdf_filters import lzw_encode_pdf

        rng = np.random.default_rng(33)
        img = (np.cumsum(rng.integers(0, 3, (18, 22)), axis=1) % 256).astype(
            np.uint8
        )
        tiles = []
        for tl in self._tiles_of(img, 16, 16):
            diff = tl.astype(np.int16)
            diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) % 256
            tiles.append(lzw_encode_pdf(diff.astype(np.uint8).tobytes()))
        t = write_tiff(
            tiles, 22, 18, compression=5, predictor=2, tile=(16, 16)
        )
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_tile_count_mismatch_raises(self):
        img = _gray_img(20, 20)
        tiles = [t.tobytes() for t in self._tiles_of(img, 16, 16)]
        t = write_tiff(tiles[:-1], 20, 20, tile=(16, 16))
        with pytest.raises(ValueError):
            decode_tiff(t)


def _revbits(data: bytes) -> bytes:
    # independent bit reversal (table built from the binary-string
    # rendering, unlike the decoder's numpy LUT)
    return bytes(int(f"{b:08b}"[::-1], 2) for b in data)


class TestExtendedLayouts:
    """r5: FillOrder 2 (LSB-first storage — fax hardware default),
    planar configuration 2 (plane-major strip sets) and 16-bit samples.
    The libtiff differential (tools/diff_tiff_oracle.py + the in-suite
    sweep below) pins all three against the third-party writer; these
    round-trips pin them against the independent in-test writer."""

    FO2 = [(266, 3, 1, 2)]
    PLANAR2 = [(284, 3, 1, 2)]

    def test_fillorder2_uncompressed_bilevel(self):
        rng = np.random.default_rng(41)
        ink = rng.random((9, 21)) < 0.3
        raster = np.packbits(ink, axis=1).tobytes()
        t = write_tiff(
            [_revbits(raster)], 21, 9, bps=1, photometric=0,
            extra_tags=self.FO2,
        )
        expect = np.where(ink, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_fillorder2_g4(self):
        rng = np.random.default_rng(42)
        ink = rng.random((15, 33)) < 0.2
        ink[4:, 10:14] ^= True
        t = write_tiff(
            [_revbits(encode_g4(ink))], 33, 15, compression=4,
            photometric=0, bps=1, extra_tags=self.FO2,
        )
        expect = np.where(ink, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_fillorder2_lzw_gray(self):
        img = _gray_img(11, 17, seed=43)
        t = write_tiff(
            [_revbits(lzw_encode_pdf(img.tobytes()))], 17, 11,
            compression=5, extra_tags=self.FO2,
        )
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_planar2_rgb_uncompressed(self):
        rng = np.random.default_rng(44)
        px = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
        strips = [np.ascontiguousarray(px[:, :, i]).tobytes()
                  for i in range(3)]
        t = write_tiff(
            strips, 11, 7, photometric=2, spp=3, extra_tags=self.PLANAR2,
        )
        r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
        expect = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_planar2_rgb_lzw_predictor_multistrip(self):
        rng = np.random.default_rng(45)
        px = (np.cumsum(rng.integers(0, 3, (9, 13, 3)), axis=1) % 256
              ).astype(np.uint8)
        strips = []
        for i in range(3):  # plane-major, 4-row strips inside each plane
            plane = px[:, :, i]
            diff = plane.astype(np.int16)
            diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) % 256
            plane_bytes = diff.astype(np.uint8).tobytes()
            strips += [
                lzw_encode_pdf(s)
                for s in _split_strips(plane_bytes, 13, 9, 4)
            ]
        t = write_tiff(
            strips, 13, 9, photometric=2, spp=3, compression=5,
            predictor=2, rows_per_strip=4, extra_tags=self.PLANAR2,
        )
        r, g, b = (px[:, :, i].astype(np.uint32) for i in range(3))
        expect = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)

    def test_planar2_strip_count_mismatch_raises(self):
        px = _gray_img(4, 4)
        # spp=3 planar but only 2 strips: not divisible by spp
        t = write_tiff(
            [px.tobytes(), px.tobytes()], 4, 4, photometric=2, spp=3,
            extra_tags=self.PLANAR2,
        )
        with pytest.raises(ValueError):
            decode_tiff(t)

    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_16bit_gray_both_orders_multistrip(self, endian):
        rng = np.random.default_rng(46)
        px = rng.integers(0, 65536, (9, 13)).astype(np.uint16)
        raw = px.astype(endian + "u2").tobytes()
        t = write_tiff(
            _split_strips(raw, 26, 9, 4), 13, 9, endian=endian, bps=16,
            rows_per_strip=4,
        )
        np.testing.assert_array_equal(
            decode_tiff(t), (px >> 8).astype(np.uint8)
        )

    def test_16bit_photometric_zero_inverts(self):
        rng = np.random.default_rng(47)
        px = rng.integers(0, 65536, (5, 7)).astype(np.uint16)
        t = write_tiff(
            [px.astype("<u2").tobytes()], 7, 5, photometric=0, bps=16,
        )
        np.testing.assert_array_equal(
            decode_tiff(t), (255 - (px >> 8)).astype(np.uint8)
        )

    def test_16bit_rgb_predictor_deflate(self):
        rng = np.random.default_rng(48)
        px = (np.cumsum(rng.integers(0, 600, (6, 8, 3)), axis=1)
              % 65536).astype(np.uint16)
        diff = px.astype(np.int32)
        diff[:, 1:, :] = (diff[:, 1:, :] - diff[:, :-1, :]) % 65536
        raw = diff.astype("<u2").tobytes()
        t = write_tiff(
            [zlib.compress(raw)], 8, 6, photometric=2, spp=3, bps=16,
            compression=8, predictor=2,
        )
        p8 = (px >> 8).astype(np.uint32)
        expect = (
            (299 * p8[:, :, 0] + 587 * p8[:, :, 1] + 114 * p8[:, :, 2])
            // 1000
        ).astype(np.uint8)
        np.testing.assert_array_equal(decode_tiff(t), expect)


class TestErrors:
    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_tiff(b"II+\x00" + b"\x00" * 20)

    def test_tile_tag_without_geometry_rejected(self):
        # TileWidth with no TileLength/offsets is malformed (tiled
        # decode itself lives in TestTiled)
        img = _gray_img(4, 4)
        t = write_tiff(
            [img.tobytes()], 4, 4, extra_tags=[(322, 4, 1, 4)]
        )
        with pytest.raises(ValueError):
            decode_tiff(t)

    def test_16bit_palette_rejected(self):
        # palette lookup needs 8-bit indices; 16-bit palette is malformed
        t = write_tiff(
            [b"\x00" * 32], 4, 4, bps=16, photometric=3,
            colormap=[0] * 768,
        )
        with pytest.raises(ValueError):
            decode_tiff(t)

    def test_predictor_on_bilevel_rejected(self):
        t = write_tiff(
            [b"\x00" * 4], 4, 4, bps=1, photometric=0, predictor=2
        )
        with pytest.raises(NotImplementedError):
            decode_tiff(t)

    def test_invalid_fillorder_planar_values(self):
        img = _gray_img(4, 4)
        t = write_tiff([img.tobytes()], 4, 4, extra_tags=[(266, 3, 1, 3)])
        with pytest.raises(ValueError):
            decode_tiff(t)
        t = write_tiff([img.tobytes()], 4, 4, extra_tags=[(284, 3, 1, 0)])
        with pytest.raises(ValueError):
            decode_tiff(t)

    def test_strip_short_raises(self):
        img = _gray_img(4, 4)
        t = write_tiff([img.tobytes()[:-3]], 4, 4)
        with pytest.raises(ValueError):
            decode_tiff(t)

    def test_bomb_guard(self):
        t = write_tiff([b""], 1 << 16, 1 << 16)
        with pytest.raises(ValueError, match="bomb"):
            decode_tiff(t)

    def test_fuzz_no_hangs(self):
        rng = np.random.default_rng(12)
        img = _gray_img(6, 6)
        base = write_tiff([img.tobytes()], 6, 6)
        for _ in range(300):
            buf = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            try:
                decode_tiff(bytes(buf))
            except (ValueError, NotImplementedError, OverflowError):
                pass  # error-as-value contract: typed errors only


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


class TestIntegration:
    def test_sniff_both_orders(self):
        assert sniff_format(b"II*\x00" + b"\x00" * 8) == "image/tiff"
        assert sniff_format(b"MM\x00*" + b"\x00" * 8) == "image/tiff"

    def test_decode_pixels_dispatch(self):
        img = _gray_img(5, 5)
        t = write_tiff([img.tobytes()], 5, 5, endian=">")
        np.testing.assert_array_equal(decode_pixels(t), img)

    def test_scanned_receipt_tiff_to_parsed_amount(self):
        # the full scanned-document path: rendered receipt text → G4
        # fax TIFF → decode_pixels → real OCR → amount parser
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.parsers.registry import parse_text

        scan = render_text("TOTAL $123.45")
        h, w = scan.shape
        t = write_tiff(
            [encode_g4(scan < 128)], w, h,
            photometric=0, bps=1, compression=4,
        )
        px = decode_pixels(t)
        np.testing.assert_array_equal(px, scan)
        assert parse_text(ocr_pixels(px))["amount"] == "123.45"

    def test_extract_row_dispatch(self):
        # sniff → image/tiff → decode_pixels → OCR, via the same
        # extract_row entry the Spark pipeline UDF wraps
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.functions.udfs import extract_row

        scan = render_text("TOTAL $55.10")
        h, w = scan.shape
        t = write_tiff(
            [encode_g4(scan < 128)], w, h,
            photometric=0, bps=1, compression=4,
        )
        fmt, text, err = extract_row(t, None, ocr_arrays=ocr_pixels)
        assert (fmt, text, err) == ("image/tiff", "TOTAL $55.10", None)

    def test_multimodal_sniff_dims(self):
        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        img = _gray_img(5, 8)
        for endian in ("<", ">"):
            t = write_tiff([img.tobytes()], 8, 5, endian=endian)
            assert sniff_image_dims(t) == ("tiff", 8, 5, None)

    def test_multipage_fax_ocr_all_pages(self):
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.extract.tiff import decode_tiff_pages
        from receipt_scanner_spark.functions.udfs import extract_row
        from tests.test_ccitt import encode_g4

        texts = ["PAGE ONE $1.00", "PAGE TWO $2.00", "TOTAL $3.00"]
        pages = []
        for t in texts:
            scan = render_text(t)
            h, w = scan.shape
            pages.append((encode_g4(scan < 128), w, h, 4))
        tif = write_tiff_multi(pages)
        arrs = decode_tiff_pages(tif)
        assert [ocr_pixels(a) for a in arrs] == texts
        # the pipeline entry OCRs every page, '\n\n\n'-joined
        fmt, text, err = extract_row(tif, None, ocr_arrays=ocr_pixels)
        assert fmt == "image/tiff" and err is None
        assert text == "\n\n\n".join(texts)
        from receipt_scanner_spark.parsers.registry import parse_text

        assert parse_text(text)["amount"] == "3.00"  # total anchor wins

    def test_multipage_partial_corruption_survives(self):
        from receipt_scanner_spark.extract.ocr import render_text
        from receipt_scanner_spark.extract.tiff import decode_tiff_pages
        from tests.test_ccitt import encode_g4

        scan = render_text("OK $5")
        h, w = scan.shape
        good = (encode_g4(scan < 128), w, h, 4)
        bad = (b"\x00\x01garbage", w, h, 4)
        tif = write_tiff_multi([good, bad, good])
        pages = decode_tiff_pages(tif)
        assert len(pages) == 2  # bad page skipped, chain continues

    def test_decode_tiff_still_first_page(self):
        img = _gray_img(4, 6)
        # single-page compatibility through the refactor
        t = write_tiff([img.tobytes()], 6, 4)
        np.testing.assert_array_equal(decode_tiff(t), img)

    def test_webp_sniff_dims(self):
        import os

        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        # hand-built VP8L header: 20x10 canvas
        bits = (20 - 1) | ((10 - 1) << 14)
        vp8l = (
            b"RIFF\x00\x00\x00\x00WEBPVP8L\x00\x00\x00\x00\x2f"
            + bits.to_bytes(4, "little")
        )
        assert sniff_image_dims(vp8l) == ("webp", 20, 10, None)
        # real third-party lossy WebP when present on the host
        p = (
            "/mnt/sandboxing/model_tools_env/v1/python/install/"
            "lib/python3.11/test/imghdrdata/python.webp"
        )
        if os.path.exists(p):
            assert sniff_image_dims(open(p, "rb").read()) == (
                "webp", 16, 16, None,
            )

    def test_avif_heic_sniff_dims(self):
        from receipt_scanner_spark.operators.multimodal import (
            sniff_image_dims,
        )

        def box(tag, body):
            return (8 + len(body)).to_bytes(4, "big") + tag + body

        ispe = box(
            b"ispe",
            (0).to_bytes(4, "big")
            + (640).to_bytes(4, "big")
            + (480).to_bytes(4, "big"),
        )
        meta = box(b"meta", (0).to_bytes(4, "big") + box(b"iprp", box(b"ipco", ispe)))
        for brand, kind in ((b"avif", "avif"), (b"heic", "heic")):
            ftyp = box(b"ftyp", brand + (0).to_bytes(4, "big") + brand + b"mif1")
            assert sniff_image_dims(ftyp + meta) == (kind, 640, 480, None)
        # ftyp without ispe: kind known, dims honest-None
        ftyp = box(b"ftyp", b"avif" + (0).to_bytes(4, "big") + b"avifmif1")
        assert sniff_image_dims(ftyp) == ("avif", None, None, "no ispe box")

    def test_packbits_vs_runlength_128_semantics(self):
        # regression pin: PDF RunLength 128=EOD vs PackBits 128=noop
        from receipt_scanner_spark.extract.pdf import _runlength_decode

        body = b"\x01ab" + b"\x80" + b"\x01cd"
        assert _runlength_decode(body) == b"ab"
        assert _packbits_decode(body, 4) == b"abcd"


class TestLibtiffDifferential:
    """Third-party differential (r4): the system libtiff, driven via
    ctypes (tools/diff_tiff_oracle.py), writes every compression this
    decoder claims and reads back what our in-test encoders produce.
    A bounded sweep runs in-suite; the tool runs the full one."""

    @pytest.fixture(scope="class")
    def lt(self):
        try:
            from tools.diff_tiff_oracle import LibTiff

            return LibTiff()
        except OSError:
            pytest.skip("no system libtiff")

    def _content(self, seed=7):
        rng = np.random.default_rng(seed)
        gray = rng.integers(0, 256, (37, 23)).astype(np.uint8)
        bil = (rng.random((37, 23)) < 0.15)
        bil[5:, 8:12] ^= True
        bil[20:, 3:17] ^= True
        return gray, bil.astype(np.uint8)

    def test_libtiff_writes_we_decode(self, lt):
        from tools.diff_tiff_oracle import expected_luma

        gray, bil = self._content()
        rng = np.random.default_rng(9)
        gray16 = rng.integers(0, 65536, gray.shape).astype(np.uint16)
        rgb = rng.integers(0, 256, (*gray.shape, 3)).astype(np.uint8)
        cases = [
            (gray, 5, dict(rows=3)),
            (gray, 5, dict(rows=3, predictor=2)),
            (gray, 8, dict(rows=37, predictor=2)),
            (gray, 32773, dict(rows=1)),
            (bil, 2, dict(bps=1, rows=5)),
            (bil, 3, dict(bps=1, rows=5)),
            (bil, 3, dict(bps=1, rows=5, t4opts=1)),
            (bil, 4, dict(bps=1, rows=37)),
            (bil, 4, dict(bps=1, rows=37, phot=1)),
            (gray, 5, dict(tile=(16, 16))),
            (bil, 4, dict(bps=1, tile=(16, 16))),
            # r5: FillOrder 2, planar 2, 16-bit
            (bil, 4, dict(bps=1, rows=5, fillorder=2)),
            (gray, 5, dict(rows=3, fillorder=2)),
            (gray16, 8, dict(bps=16, rows=4, predictor=2)),
            (rgb, 1, dict(rows=6, planar=2)),
            (rgb, 5, dict(rows=6, planar=2, predictor=2)),
            # r5 continuation: plane-major tile sets
            (rgb, 1, dict(planar=2, tile=(16, 16))),
            (rgb, 5, dict(planar=2, tile=(16, 16), predictor=2)),
        ]
        for px, comp, kw in cases:
            data = lt.write(px, comp, **kw)
            bps = kw.get("bps", 8)
            phot = kw.get("phot", 0 if bps == 1 else 1)
            got = decode_tiff(data)
            assert np.array_equal(got, expected_luma(px, bps, phot)), (
                comp, kw,
            )

    def test_libtiff_multipage_we_decode_all(self, lt):
        from receipt_scanner_spark.extract.tiff import decode_tiff_pages

        gray, _ = self._content()
        data = lt.write(gray, 5, rows=4, pages=3)
        pages = decode_tiff_pages(data)
        assert len(pages) == 3
        for i, p in enumerate(pages):
            assert np.array_equal(p, np.roll(gray, i, axis=0))

    def test_our_encoders_read_back_under_libtiff(self, lt):
        from tools.diff_tiff_oracle import expected_luma

        gray, bil = self._content()
        h, w = gray.shape
        data = write_tiff(
            [encode_g4(bil.astype(bool))], w, h,
            compression=4, photometric=0, bps=1,
        )
        assert np.array_equal(lt.read(data)[0], expected_luma(bil, 1, 0))
        data = write_tiff([lzw_encode_pdf(gray.tobytes())], w, h,
                          compression=5)
        assert np.array_equal(lt.read(data)[0], gray)


# ---------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7 new-style / 6 old-style) and CMYK
# ---------------------------------------------------------------------------


def _split_jpeg_tables(j: bytes) -> tuple[bytes, bytes]:
    """Split a full T.81 interchange stream into (JPEGTables stream,
    abbreviated image stream): DQT/DHT segments move to the tables
    stream, everything else stays — exactly the TechNote-2 layout
    libtiff emits with its default JPEGTABLESMODE."""
    i = 2
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    while i + 4 <= len(j):
        assert j[i] == 0xFF
        m = j[i + 1]
        if m == 0xDA:  # SOS + entropy-coded tail + EOI stay intact
            rest += j[i:]
            break
        ln = int.from_bytes(j[i + 2 : i + 4], "big")
        seg = j[i : i + 2 + ln]
        if m in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        i += 2 + ln
    return bytes(tables + b"\xff\xd9"), bytes(rest)


def _old_style_tiff(jpeg: bytes, w: int, h: int) -> bytes:
    """Old-style (compression 6) TIFF with JPEGInterchangeFormat
    pointing at a complete stream appended after the IFD — the EXIF
    thumbnail layout.  Two passes: the first measures the fixed
    container length so the second can point past it."""
    extra = [(514, 4, 1, len(jpeg))]
    base = write_tiff([b"\x00"], w, h, compression=6,
                      extra_tags=extra + [(513, 4, 1, 0)])
    return write_tiff([b"\x00"], w, h, compression=6,
                      extra_tags=extra + [(513, 4, 1, len(base))]) + jpeg


class TestJpegInTiff:
    def _gray(self, h, w, seed=7):
        rng = np.random.default_rng(seed)
        base = np.linspace(30, 220, w, dtype=np.uint8)
        return (base[None, :] + rng.integers(0, 24, (h, w))).astype(
            np.uint8
        )

    def test_new_style_shared_tables_single_strip(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(24, 31)
        full = encode_jpeg([img.astype(np.float64) - 128.0], q=2)
        tables, rest = _split_jpeg_tables(full)
        assert b"\xff\xdb" not in rest[:rest.find(b"\xff\xda")]
        t = write_tiff(
            [rest], 31, 24, compression=7,
            extra_tags=[(347, 7, len(tables), list(tables))],
        )
        np.testing.assert_array_equal(decode_tiff(t), decode_jpeg(full))

    def test_new_style_multi_strip(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(26, 17, seed=9)  # 26 = 8+8+8+2: ragged tail
        strips, expect = [], []
        tables = None
        for y in range(0, 26, 8):
            band = img[y : y + 8]
            full = encode_jpeg([band.astype(np.float64) - 128.0], q=2)
            tb, rest = _split_jpeg_tables(full)
            tables = tables or tb  # identical across bands (same q)
            strips.append(rest)
            expect.append(decode_jpeg(full))
        t = write_tiff(
            strips, 17, 26, compression=7, rows_per_strip=8,
            extra_tags=[(347, 7, len(tables), list(tables))],
        )
        np.testing.assert_array_equal(
            decode_tiff(t), np.concatenate(expect, axis=0)
        )

    def test_strips_carry_own_tables_no_347(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(16, 16, seed=3)
        full = encode_jpeg([img.astype(np.float64) - 128.0], q=2)
        t = write_tiff([full], 16, 16, compression=7)
        np.testing.assert_array_equal(decode_tiff(t), decode_jpeg(full))

    def test_strip_tables_override_shared(self):
        # a strip's own DQT/DHT come after the shared JPEGTables and
        # must WIN (T.81 last-definition semantics) — pin by pairing a
        # deliberately wrong shared quant table with a self-contained
        # strip: the decode must match the strip's own tables.
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(8, 8, seed=4)
        full = encode_jpeg([img.astype(np.float64) - 128.0], q=2)
        wrong = encode_jpeg([img.astype(np.float64) - 128.0], q=16)
        wrong_tables, _ = _split_jpeg_tables(wrong)
        t = write_tiff(
            [full], 8, 8, compression=7,
            extra_tags=[(347, 7, len(wrong_tables), list(wrong_tables))],
        )
        np.testing.assert_array_equal(decode_tiff(t), decode_jpeg(full))

    def test_jpeg_tiles(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(16, 32, seed=5)
        tiles, expect = [], []
        tables = None
        for x in (0, 16):
            tile = img[:, x : x + 16]
            full = encode_jpeg([tile.astype(np.float64) - 128.0], q=2)
            tb, rest = _split_jpeg_tables(full)
            tables = tables or tb
            tiles.append(rest)
            expect.append(decode_jpeg(full))
        t = write_tiff(
            tiles, 32, 16, compression=7, tile=(16, 16),
            extra_tags=[(347, 7, len(tables), list(tables))],
        )
        np.testing.assert_array_equal(
            decode_tiff(t), np.concatenate(expect, axis=1)
        )

    def test_photometric_zero_inverts(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(8, 8, seed=6)
        full = encode_jpeg([img.astype(np.float64) - 128.0], q=2)
        t = write_tiff([full], 8, 8, compression=7, photometric=0)
        np.testing.assert_array_equal(decode_tiff(t),
                                      255 - decode_jpeg(full))

    def test_ycbcr_color_strip(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        rng = np.random.default_rng(11)
        y = self._gray(16, 16, seed=11).astype(np.float64) - 128.0
        cb = rng.integers(-20, 20, (16, 16)).astype(np.float64)
        cr = rng.integers(-20, 20, (16, 16)).astype(np.float64)
        full = encode_jpeg([y, cb, cr], comp_ids=(1, 2, 3),
                           sampling=((1, 1), (1, 1), (1, 1)), q=2)
        t = write_tiff([full], 16, 16, compression=7, photometric=6,
                       spp=3)
        np.testing.assert_array_equal(decode_tiff(t), decode_jpeg(full))

    def test_old_style_interchange_stream(self):
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        img = self._gray(14, 19, seed=8)
        full = encode_jpeg([img.astype(np.float64) - 128.0], q=2)
        t = _old_style_tiff(full, 19, 14)
        # IFD dims crop the MCU-padded stream (19x14 inside 24x16)
        np.testing.assert_array_equal(
            decode_tiff(t), decode_jpeg(full)[:14, :19]
        )

    def test_old_style_without_pointer_raises(self):
        img = self._gray(8, 8)
        t = write_tiff([img.tobytes()], 8, 8, compression=6)
        with pytest.raises(NotImplementedError, match="old-style"):
            decode_tiff(t)

    def test_jpeg_separated_cmyk_exact_constant_blocks(self):
        # photometric 5 + compression 7: the strip stream carries
        # NATURAL-convention CMYK (0 = no ink), unlike standalone Adobe
        # CMYK JPEGs.  8x8-aligned constant ink blocks survive the DCT
        # round trip exactly (DC-only blocks, q=1), so the decode must
        # equal the naive composite bit-for-bit.
        from receipt_scanner_spark.extract.tiff import _cmyk_luma
        from tests.test_jpeg import encode_jpeg

        inks = [(0, 0, 0, 0), (255, 255, 255, 255), (200, 40, 0, 30),
                (0, 0, 0, 128)]
        cmyk = np.zeros((8, 32, 4), dtype=np.uint8)
        for b, ink in enumerate(inks):
            cmyk[:, b * 8 : (b + 1) * 8] = ink
        planes = [cmyk[:, :, i].astype(np.float64) for i in range(4)]
        full = encode_jpeg(planes, comp_ids=(1, 2, 3, 4),
                           sampling=((1, 1),) * 4, q=1)
        tables, rest = _split_jpeg_tables(full)
        t = write_tiff(
            [rest], 32, 8, compression=7, photometric=5, spp=4,
            extra_tags=[(347, 7, len(tables), list(tables))],
        )
        np.testing.assert_array_equal(decode_tiff(t), _cmyk_luma(cmyk))

    def test_jpeg_separated_vs_standalone_adobe_inversion(self):
        # the same 4-channel stream decodes differently inside a
        # photometric-5 TIFF (natural ink) vs standalone (Adobe
        # inverted): all-zero samples are paper white in the TIFF
        # convention (0 = no ink) but solid ink under Adobe's
        # (255 = no ink)
        from receipt_scanner_spark.extract.jpeg import decode_jpeg
        from tests.test_jpeg import encode_jpeg

        planes = [np.zeros((8, 8), dtype=np.float64) for _ in range(4)]
        full = encode_jpeg(planes, comp_ids=(1, 2, 3, 4),
                           sampling=((1, 1),) * 4, q=1)
        t = write_tiff([full], 8, 8, compression=7, photometric=5,
                       spp=4)
        assert int(decode_tiff(t).min()) == 255
        assert int(decode_jpeg(full).max()) == 0

    def test_corrupt_strip_missing_soi_raises(self):
        t = write_tiff([b"\x00\x01\x02\x03"], 8, 8, compression=7)
        with pytest.raises(ValueError, match="SOI"):
            decode_tiff(t)


class TestCmyk:
    def _expected(self, ink: np.ndarray) -> np.ndarray:
        ink = ink.astype(np.uint32)
        r = ((255 - ink[..., 0]) * (255 - ink[..., 3])) // 255
        g = ((255 - ink[..., 1]) * (255 - ink[..., 3])) // 255
        b = ((255 - ink[..., 2]) * (255 - ink[..., 3])) // 255
        return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)

    def test_cmyk_uncompressed(self):
        rng = np.random.default_rng(21)
        ink = rng.integers(0, 256, (9, 7, 4), dtype=np.uint8)
        t = write_tiff([ink.tobytes()], 7, 9, photometric=5, spp=4)
        np.testing.assert_array_equal(decode_tiff(t), self._expected(ink))

    def test_cmyk_paper_white_and_full_black(self):
        ink = np.zeros((2, 2, 4), dtype=np.uint8)  # no ink = white
        ink[1, 1] = (0, 0, 0, 255)  # full key = black
        t = write_tiff([ink.tobytes()], 2, 2, photometric=5, spp=4)
        got = decode_tiff(t)
        assert got[0, 0] == 255 and got[1, 1] == 0

    def test_cmyk_planar2_multistrip(self):
        rng = np.random.default_rng(22)
        ink = rng.integers(0, 256, (10, 6, 4), dtype=np.uint8)
        strips = []
        for p in range(4):
            plane = ink[:, :, p].tobytes()
            strips += [plane[:30], plane[30:]]  # 5-row strips
        t = write_tiff(
            strips, 6, 10, photometric=5, spp=4, rows_per_strip=5,
            extra_tags=[(284, 3, 1, 2)],
        )
        np.testing.assert_array_equal(decode_tiff(t), self._expected(ink))

    def test_cmyk_lzw_predictor(self):
        rng = np.random.default_rng(23)
        ink = rng.integers(0, 256, (5, 8, 4), dtype=np.uint8)
        diff = ink.astype(np.int16)
        diff[:, 1:] = (ink[:, 1:].astype(np.int16)
                       - ink[:, :-1].astype(np.int16)) % 256
        t = write_tiff(
            [lzw_encode_pdf(diff.astype(np.uint8).tobytes())], 8, 5,
            photometric=5, spp=4, compression=5, predictor=2,
        )
        np.testing.assert_array_equal(decode_tiff(t), self._expected(ink))

    def test_cmyk_under_three_samples_raises(self):
        t = write_tiff([b"\x00" * 12], 2, 2, photometric=5, spp=2)
        with pytest.raises(ValueError, match="separated"):
            decode_tiff(t)


class TestGrayAlpha:
    def test_spp2_gray_alpha_luma_ignores_alpha(self):
        rng = np.random.default_rng(71)
        ga = rng.integers(0, 256, (6, 9, 2), dtype=np.uint8)
        t = write_tiff([ga.tobytes()], 9, 6, spp=2,
                       extra_tags=[(338, 3, 1, 2)])  # ExtraSamples
        np.testing.assert_array_equal(decode_tiff(t), ga[:, :, 0])

    def test_spp2_photometric_zero_inverts(self):
        ga = np.zeros((3, 3, 2), dtype=np.uint8)
        ga[..., 0] = 100
        t = write_tiff([ga.tobytes()], 3, 3, spp=2, photometric=0,
                       extra_tags=[(338, 3, 1, 2)])
        np.testing.assert_array_equal(decode_tiff(t),
                                      np.full((3, 3), 155, np.uint8))


class TestJpegTiffFuzz:
    def test_corruption_fuzz_never_crashes(self):
        # error-as-value: corrupt JPEG-in-TIFF and CMYK containers must
        # raise typed errors, never crash or hang
        from tests.test_jpeg import encode_jpeg
        rng = np.random.default_rng(91)
        img = _gray_img(16, 16, 90)
        full = encode_jpeg([img.astype(np.float64) - 128.0], q=2)
        tables, rest = _split_jpeg_tables(full)
        bases = [
            write_tiff([rest], 16, 16, compression=7,
                       extra_tags=[(347, 7, len(tables), list(tables))]),
            _old_style_tiff(full, 16, 16),
            write_tiff(
                [rng.integers(0, 256, 16 * 16 * 4, dtype=np.uint8)
                 .tobytes()], 16, 16, photometric=5, spp=4,
            ),
            # session 3: chunky YCbCr units (subsampling tag, RBW)
            write_ycbcr_tiff(
                _gray_img(15, 18, 92),
                np.full((8, 9), 100, np.uint8),
                np.full((8, 9), 150, np.uint8),
                2, 2, rps=8, rbw=[16, 235, 128, 240, 128, 240],
            ),
        ]
        for base in bases:
            for _ in range(120):
                buf = bytearray(base)
                for _ in range(rng.integers(1, 6)):
                    buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
                try:
                    decode_tiff(bytes(buf))
                except (ValueError, NotImplementedError, OverflowError):
                    pass


class TestYCbCr:
    """Chunky photometric-6 YCbCr (§ "YCbCr Images"): strips are
    hs x vs data units (Y samples row-major + Cb + Cr); the decoder
    extracts the Y positions as the luma output and applies the
    ReferenceBlackWhite Y expansion.  Neutral-chroma libtiff RGBA
    readback pins the unit layout BIT-EXACTLY (Cb=Cr=128 makes
    libtiff's own YCbCr->RGB emit R=G=B=Y)."""

    def _content(self, seed=31, h=21, w=34):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w)).astype(np.uint8), rng

    @pytest.mark.parametrize(
        "hs,vs", [(1, 1), (2, 1), (2, 2), (4, 2), (4, 4), (1, 2)]
    )
    def test_luma_exact_all_subsamplings(self, hs, vs):
        y, rng = self._content()
        cs = (-(-y.shape[0] // vs), -(-y.shape[1] // hs))
        cb = rng.integers(0, 256, cs).astype(np.uint8)
        cr = rng.integers(0, 256, cs).astype(np.uint8)
        data = write_ycbcr_tiff(y, cb, cr, hs, vs)
        assert np.array_equal(decode_tiff(data), y)

    @pytest.mark.parametrize("comp", [1, 8, 32773])
    def test_multi_strip_compressed(self, comp):
        y, rng = self._content(seed=32)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        cb = rng.integers(0, 256, cs).astype(np.uint8)
        cr = rng.integers(0, 256, cs).astype(np.uint8)
        data = write_ycbcr_tiff(y, cb, cr, 2, 2, rps=8, compression=comp)
        assert np.array_equal(decode_tiff(data), y)

    def test_default_subsampling_is_2x2(self):
        y, rng = self._content(seed=33)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        cb = np.full(cs, 90, np.uint8)
        cr = np.full(cs, 200, np.uint8)
        data = write_ycbcr_tiff(y, cb, cr, 2, 2, sub_tag=False)
        assert b"\x12\x02" not in data[:8]  # sanity: no 530 tag emitted
        assert np.array_equal(decode_tiff(data), y)

    def test_reference_black_white_scaling(self):
        # 16/235 video headroom: Y expands to full range
        y, rng = self._content(seed=34)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        n = np.full(cs, 128, np.uint8)
        data = write_ycbcr_tiff(y, n, n, 2, 2,
                                rbw=[16, 235, 128, 240, 128, 240])
        want = np.clip(
            np.rint((y.astype(np.float64) - 16.0) * (255.0 / 219.0)),
            0, 255,
        ).astype(np.uint8)
        assert np.array_equal(decode_tiff(data), want)

    def test_planar_y_plane_is_luma(self):
        y, rng = self._content(seed=35)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        cb = rng.integers(0, 256, cs).astype(np.uint8)
        cr = rng.integers(0, 256, cs).astype(np.uint8)
        data = write_ycbcr_planar_tiff(y, cb, cr, 2, 2)
        assert np.array_equal(decode_tiff(data), y)

    def test_bad_subsampling_rejected(self):
        y, rng = self._content(seed=36)
        cs = (-(-y.shape[0] // 3), -(-y.shape[1] // 3))
        cb = np.full(cs, 128, np.uint8)
        with pytest.raises(ValueError, match="YCbCrSubSampling"):
            decode_tiff(write_ycbcr_tiff(y, cb, cb, 3, 3))

    def test_rps_not_multiple_of_vs_rejected(self):
        y, rng = self._content(seed=37)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        n = np.full(cs, 128, np.uint8)
        # rps=8 valid stream, then patch RowsPerStrip to 7
        data = bytearray(write_ycbcr_tiff(y, n, n, 2, 2, rps=8))
        i = data.find(struct.pack("<HH", 278, 4))
        assert i > 0
        struct.pack_into("<I", data, i + 8, 7)
        with pytest.raises(ValueError, match="RowsPerStrip"):
            decode_tiff(bytes(data))

    def test_predictor_rejected(self):
        y, rng = self._content(seed=38)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        n = np.full(cs, 128, np.uint8)
        strips = encode_ycbcr_units(y, n, n, 2, 2, y.shape[0])
        data = write_tiff(
            strips, y.shape[1], y.shape[0], compression=1, photometric=6,
            spp=3, predictor=2,
            extra_tags=[(530, 3, 2, [2, 2])],
        )
        with pytest.raises(ValueError, match="Predictor"):
            decode_tiff(data)

    @pytest.fixture(scope="class")
    def lt(self):
        try:
            from tools.diff_tiff_oracle import LibTiff

            return LibTiff()
        except OSError:
            pytest.skip("no system libtiff")

    @pytest.mark.parametrize(
        "hs,vs", [(1, 1), (2, 1), (2, 2), (1, 2), (4, 2), (4, 4)]
    )
    def test_libtiff_readback_neutral_chroma_bit_exact(self, lt, hs, vs):
        # libtiff's 4:x RGBA leftover path mis-renders partial-unit
        # edge regions (the spec pads edge units to full size, and
        # every 1x/2x geometry agrees with us on partial edges too) —
        # ycbcr_libtiff_trim excludes exactly that quirk region
        from tools.diff_tiff_oracle import ycbcr_libtiff_trim

        y, rng = self._content(seed=39)
        h, w = y.shape
        cs = (-(-h // vs), -(-w // hs))
        n = np.full(cs, 128, np.uint8)
        data = write_ycbcr_tiff(y, n, n, hs, vs)
        rgba = lt.read_rgba(data)
        assert rgba is not None
        hh, ww = ycbcr_libtiff_trim(h, w, hs, vs)
        assert hh >= 16 and ww >= 24  # the pin still covers the bulk
        assert (rgba[:hh, :ww, 0] == rgba[:hh, :ww, 1]).all()
        assert (rgba[:hh, :ww, 1] == rgba[:hh, :ww, 2]).all()
        assert np.array_equal(rgba[:hh, :ww, 0], decode_tiff(data)[:hh, :ww])

    def test_libtiff_readback_colored_chroma_close(self, lt):
        y, rng = self._content(seed=40)
        cs = (-(-y.shape[0] // 2), -(-y.shape[1] // 2))
        cb = rng.integers(118, 138, cs).astype(np.uint8)
        cr = rng.integers(118, 138, cs).astype(np.uint8)
        data = write_ycbcr_tiff(y, cb, cr, 2, 2)
        rgba = lt.read_rgba(data)
        assert rgba is not None
        r, g, b = (rgba[:, :, i].astype(np.int64) for i in range(3))
        lum = (299 * r + 587 * g + 114 * b) // 1000
        # libtiff converts via fixed-point lookup tables; the
        # per-channel quantization compounds to a few counts in
        # the recombined luma (clip-free chroma keeps it tight)
        d = np.abs(lum - decode_tiff(data).astype(np.int64))
        assert d.max() <= 8
