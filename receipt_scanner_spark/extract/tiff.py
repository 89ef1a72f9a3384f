"""TIFF container decode — pure stdlib+numpy, the canonical container
for scanned documents (fax archives, scanner output, `scanimage`
defaults).  The reference's image path accepts TIFF through
graphicsmagick (lib/image_processor/preprocessor/gm.js identify/convert
accept any gm-supported format); here the decode is in-process like the
other codecs (extract/imaging.py rationale).

Container only — the sample codecs are REUSED, not re-implemented:

* Compression 2 (CCITT RLE), 3 (T.4/G3) and 4 (T.6/G4) decode via
  extract/ccitt.decode_ccitt;
* Compression 5 (LZW) is the same MSB-first early-change variant as
  PDF's LZWDecode (extract/pdf._lzw_decode_pdf — TIFF is where that
  codec came from);
* Compression 8/32946 (Deflate) via zlib with the shared bomb guard;
* Compression 32773 (PackBits) is TIFF's run-length coding (n=128 is a
  no-op, not EOD — deliberately distinct from PDF RunLengthDecode);
* Compression 7 (new-style JPEG, TIFF TechNote 2): every strip/tile is
  an abbreviated T.81 interchange stream; the shared JPEGTables tag
  (347) is an abbreviated table-specification stream spliced in front
  of each strip's markers (extract/jpeg does the actual decode);
* Compression 6 (old-style JPEG, TIFF 6.0 §22 — deprecated): only the
  coherent form seen in the wild is supported, a complete interchange
  stream via JPEGInterchangeFormat/-Length (513/514 — EXIF thumbnails
  and early scanner output); the strip-table variant (tags 512,
  517-521) is a typed error;
* Compression 1 is uncompressed.

Output contract matches the other decoders: ``(h, w) uint8`` BT.601
luma, decompression-bomb-guarded by imaging.MAX_PIXELS.  Scope
(error-as-value upstream): strip-based and tiled baseline TIFF —
bilevel, 8/16-bit gray, 8/16-bit RGB(A), palette, CMYK (photometric
5, naive composite); both byte orders;
Predictor 2 (8- and 16-bit); multi-strip; FillOrder 2 (raw strip
bytes bit-reversed — the libtiff TIFFFillStrip semantic, pinned by
the differential for every codec); planar configuration 2
(plane-major strip sets).  16-bit samples downconvert to 8-bit luma
(high byte).  YCbCr (photometric 6): chunky strips parse the
hs x vs data-unit layout and the Y positions ARE the luma (with the
ReferenceBlackWhite expansion); planar YCbCr reads plane 0 directly.
The neutral-chroma libtiff RGBA readback pins the unit layout
bit-exactly (Cb=Cr=128 makes libtiff's own conversion emit R=G=B=Y).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .ccitt import decode_ccitt
from .imaging import _luma, check_pixel_budget

# IFD entry types → (struct code, size).  Values we read are integral.
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_FILL_ORDER = 266
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_T4_OPTIONS = 292
_TAG_T6_OPTIONS = 293
_TAG_PREDICTOR = 317
_TAG_COLOR_MAP = 320
_TAG_TILE_WIDTH = 322
_TAG_JPEG_TABLES = 347
_TAG_JPEG_IF = 513  # JPEGInterchangeFormat (old-style compression 6)
_TAG_JPEG_IF_LEN = 514
_TAG_YCBCR_SUB = 530  # (h, v) chroma subsampling; default (2, 2)
_TAG_REF_BLACK_WHITE = 532  # 6 RATIONALs; Y pair scales to full range


def _read_ifd(data: bytes, e: str) -> dict[int, list[int]]:
    """First IFD → {tag: [integral values]} (RATIONALs truncate to the
    numerator — only used for informational tags we ignore anyway)."""
    (off,) = struct.unpack(e + "I", data[4:8])
    return _read_ifd_at(data, e, off)[0]


def _read_ifd_at(
    data: bytes, e: str, off: int
) -> tuple[dict[int, list[int]], int]:
    """IFD at ``off`` → ({tag: values}, next-IFD offset or 0)."""
    if off + 2 > len(data):
        raise ValueError("TIFF IFD offset out of range")
    (n,) = struct.unpack(e + "H", data[off : off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        ent = data[off + 2 + 12 * i : off + 14 + 12 * i]
        if len(ent) < 12:
            raise ValueError("truncated TIFF IFD")
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * cnt
        if total <= 4:
            raw = ent[8 : 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", ent[8:12])
            raw = data[voff : voff + total]
            if len(raw) < total:
                raise ValueError("TIFF tag value out of range")
        if typ in (3, 8):
            vals = list(struct.unpack(e + "%dH" % cnt, raw))
        elif typ in (4, 9):
            vals = list(struct.unpack(e + "%dI" % cnt, raw))
        elif typ in (1, 2, 6, 7):
            vals = list(raw)
        else:  # RATIONAL: rounded integral value (num/den)
            vals = []
            for j in range(0, total, 8):
                num, den = struct.unpack(e + "II", raw[j : j + 8])
                vals.append(num if den in (0, 1) else round(num / den))
        tags[tag] = vals
    next_at = off + 2 + 12 * n
    if next_at + 4 <= len(data):
        (next_off,) = struct.unpack(e + "I", data[next_at : next_at + 4])
    else:
        next_off = 0
    return tags, next_off


def _packbits_decode(body: bytes, expect: int) -> bytes:
    """TIFF PackBits (spec §9): n in 0..127 copies n+1 literals,
    n in 129..255 repeats the next byte 257-n times, n=128 is a no-op.
    Decodes until ``expect`` bytes are produced."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n and len(out) < expect:
        c = body[i]
        if c == 128:
            i += 1
        elif c < 128:
            chunk = body[i + 1 : i + 2 + c]
            if len(chunk) != c + 1:
                raise ValueError("truncated PackBits literal")
            out += chunk
            i += 2 + c
        else:
            if i + 1 >= n:
                raise ValueError("truncated PackBits repeat")
            out += body[i + 1 : i + 2] * (257 - c)
            i += 2
    if len(out) < expect:
        raise ValueError("PackBits strip short")
    return bytes(out[:expect])


def _first(tags: dict, tag: int, default: int) -> int:
    v = tags.get(tag)
    return v[0] if v else default


def _merge_jpeg_tables(tables: bytes, strip: bytes) -> bytes:
    """Splice a JPEGTables (tag 347) abbreviated table-specification
    stream in front of a strip's abbreviated image stream (TIFF
    TechNote 2).  The strip's own DQT/DHT segments, if any, come after
    the shared ones and therefore override them — T.81's last-
    definition-wins table semantics make the simple concatenation
    correct."""
    if len(strip) < 2 or strip[:2] != b"\xff\xd8":
        raise ValueError("JPEG strip missing SOI")
    if not tables:
        return strip
    if len(tables) < 4 or tables[:2] != b"\xff\xd8":
        raise ValueError("JPEGTables missing SOI")
    body = tables[2:]
    if body.endswith(b"\xff\xd9"):
        body = body[:-2]
    return b"\xff\xd8" + body + strip[2:]


def _scale_reference_y(y: np.ndarray, tags: dict) -> np.ndarray:
    """YCbCr luma scaling (§ "ReferenceBlackWhite"): the Y samples map
    [black, white] onto the full display range.  libtiff's default for
    photometric 6 is full-range (0, 255) — identity; headroom formats
    (e.g. 16/235 video siting) expand.  Only the Y pair matters for a
    luma output."""
    rbw = tags.get(_TAG_REF_BLACK_WHITE)
    if not rbw or len(rbw) < 2:
        return y
    yb, yw = float(rbw[0]), float(rbw[1])
    if not 0 <= yb < yw:
        raise ValueError("bad YCbCr ReferenceBlackWhite")
    if (yb, yw) == (0.0, 255.0):
        return y
    scaled = (y.astype(np.float64) - yb) * (255.0 / (yw - yb))
    return np.clip(np.rint(scaled), 0, 255).astype(np.uint8)


def _cmyk_luma(ink: np.ndarray) -> np.ndarray:
    """(h, w, 4) uint8 SEPARATED samples (photometric 5: value = ink
    coverage, 0 = none — NOT the inverted Adobe-JPEG convention) →
    BT.601 luma via the naive composite R=(255-C)(255-K)/255."""
    ink = ink.astype(np.uint32)
    r = ((255 - ink[..., 0]) * (255 - ink[..., 3])) // 255
    g = ((255 - ink[..., 1]) * (255 - ink[..., 3])) // 255
    b = ((255 - ink[..., 2]) * (255 - ink[..., 3])) // 255
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


# FillOrder 2 (§ "FillOrder"): the stored bytes are LSB-first.  libtiff
# applies a raw-level per-byte bit reversal before EVERY codec's decode
# (TIFFFillStrip; verified empirically against the system libtiff for
# none/CCITT/LZW/Deflate/PackBits) — so the reversal happens on the
# compressed strip body, not on decoded pixels.
_REV_BITS = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)


def _reverse_bits(body: bytes) -> bytes:
    return _REV_BITS[np.frombuffer(body, dtype=np.uint8)].tobytes()


def _tiff_endian(data: bytes) -> str:
    if len(data) < 8:
        raise ValueError("not a TIFF: too short")
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte order mark")
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF: bad magic")
    return e


def decode_tiff(data: bytes) -> np.ndarray:
    """(h, w) uint8 luma from the first IFD of a baseline strip TIFF
    (the ``decode_pixels`` single-image contract)."""
    e = _tiff_endian(data)
    return _decode_ifd(data, e, _read_ifd(data, e))


def decode_tiff_pages(data: bytes, max_pages: int = 64) -> list[np.ndarray]:
    """Every page of a multi-IFD TIFF (fax machines and scanners emit
    multi-page documents as chained IFDs).  Pages that fail to decode
    are skipped (error-as-value: the document survives with fewer
    pages); the IFD chain is cycle-guarded and capped."""
    e = _tiff_endian(data)
    (off,) = struct.unpack(e + "I", data[4:8])
    pages: list[np.ndarray] = []
    seen: set[int] = set()
    while off and off not in seen and len(pages) < max_pages:
        seen.add(off)
        try:
            tags, next_off = _read_ifd_at(data, e, off)
        except ValueError:
            break  # malformed chain: keep the pages we have
        try:
            pages.append(_decode_ifd(data, e, tags))
        except (ValueError, NotImplementedError):
            pass
        off = next_off
    return pages


_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325


def _decode_ifd(
    data: bytes, e: str, tags: dict[int, list[int]]
) -> np.ndarray:
    fill = _first(tags, _TAG_FILL_ORDER, 1)
    if fill not in (1, 2):
        raise ValueError(f"invalid FillOrder {fill}")

    def body_of(o: int, c: int) -> bytes:
        b = data[o : o + c]
        if len(b) < c:
            raise ValueError("TIFF strip out of range")
        return _reverse_bits(b) if fill == 2 else b

    w = _first(tags, _TAG_WIDTH, 0)
    h = _first(tags, _TAG_HEIGHT, 0)
    if w <= 0 or h <= 0:
        raise ValueError("TIFF missing image dimensions")
    check_pixel_budget(w, h)

    spp = _first(tags, _TAG_SPP, 1)
    planar = _first(tags, _TAG_PLANAR, 1)
    if planar not in (1, 2):
        raise ValueError(f"invalid PlanarConfiguration {planar}")

    tile_w = _first(tags, _TAG_TILE_WIDTH, 0)
    if planar == 2 and spp > 1:
        # planar configuration 2 (§ "Planar Configuration"): components
        # live in separate plane-major strip OR tile sets (all strips/
        # tiles of sample 0, then sample 1, ...; pinned by the libtiff
        # differential).  Each plane decodes as a one-sample image via
        # a synthetic IFD — one implementation of every codec/
        # predictor branch, strip and tile layouts alike.
        okey = _TAG_TILE_OFFSETS if tile_w else _TAG_STRIP_OFFSETS
        ckey = _TAG_TILE_COUNTS if tile_w else _TAG_STRIP_COUNTS
        offsets = tags.get(okey) or []
        counts = tags.get(ckey) or []
        if not offsets or len(counts) != len(offsets) or len(
            offsets
        ) % spp:
            raise ValueError("planar TIFF strip offsets/counts mismatch")
        per = len(offsets) // spp
        bps_list = tags.get(_TAG_BPS, [1])
        if _first(tags, _TAG_PHOTOMETRIC, 1) == 6:
            # planar YCbCr: plane 0 (Y) is a full-resolution gray
            # plane and IS the luma — decode it alone; the subsampled
            # chroma planes are never needed for a luma output
            sub = dict(tags)
            sub[_TAG_SPP] = [1]
            sub[_TAG_PLANAR] = [1]
            sub[_TAG_BPS] = [bps_list[0]]
            sub[_TAG_PHOTOMETRIC] = [1]
            sub.pop(_TAG_YCBCR_SUB, None)
            sub[okey] = offsets[:per]
            sub[ckey] = counts[:per]
            return _scale_reference_y(_decode_ifd(data, e, sub), tags)
        planes = []
        for p in range(spp):
            sub = dict(tags)
            sub[_TAG_SPP] = [1]
            sub[_TAG_PLANAR] = [1]
            sub[_TAG_BPS] = [bps_list[min(p, len(bps_list) - 1)]]
            # raw plane values: neutralize photometric (recombined below)
            sub[_TAG_PHOTOMETRIC] = [1]
            sub[okey] = offsets[p * per : (p + 1) * per]
            sub[ckey] = counts[p * per : (p + 1) * per]
            planes.append(_decode_ifd(data, e, sub))
        photo = _first(tags, _TAG_PHOTOMETRIC, 1)
        if photo == 5:
            if spp < 4:
                raise ValueError("separated TIFF needs >= 4 samples")
            return _cmyk_luma(np.stack(planes[:4], axis=2))
        if spp >= 3:
            return _luma(np.stack(planes[:3], axis=2))
        return (255 - planes[0]) if photo == 0 else planes[0]

    if tile_w:
        # tiled layout (§15): every tile is a full tile_w x tile_h
        # sub-image (edge tiles padded) with the same codec semantics
        # as a one-strip image — decode each via a synthetic IFD and
        # paste, which keeps ONE implementation of every codec branch
        tile_h = _first(tags, _TAG_TILE_LENGTH, 0)
        toffs = tags.get(_TAG_TILE_OFFSETS)
        tcnts = tags.get(_TAG_TILE_COUNTS)
        if tile_h <= 0:
            raise ValueError("tiled TIFF missing TileLength")
        tiles_x = (w + tile_w - 1) // tile_w
        tiles_y = (h + tile_h - 1) // tile_h
        n_tiles = tiles_x * tiles_y
        if not toffs or not tcnts or len(toffs) != n_tiles or len(
            tcnts
        ) != n_tiles:
            raise ValueError("TIFF tile offsets/counts mismatch")
        check_pixel_budget(tile_w * tiles_x, tile_h * tiles_y)
        out = np.zeros((h, w), dtype=np.uint8)
        base = {
            k: v
            for k, v in tags.items()
            if k
            not in (
                _TAG_TILE_WIDTH, _TAG_TILE_LENGTH,
                _TAG_TILE_OFFSETS, _TAG_TILE_COUNTS,
            )
        }
        base[_TAG_WIDTH] = [tile_w]
        base[_TAG_HEIGHT] = [tile_h]
        base[_TAG_ROWS_PER_STRIP] = [tile_h]
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                i = ty * tiles_x + tx
                sub = dict(base)
                sub[_TAG_STRIP_OFFSETS] = [toffs[i]]
                sub[_TAG_STRIP_COUNTS] = [tcnts[i]]
                tile = _decode_ifd(data, e, sub)
                y0, x0 = ty * tile_h, tx * tile_w
                ph = min(tile_h, h - y0)
                pw = min(tile_w, w - x0)
                out[y0 : y0 + ph, x0 : x0 + pw] = tile[:ph, :pw]
        return out
    bps_list = tags.get(_TAG_BPS, [1])
    if len(set(bps_list)) != 1:
        raise NotImplementedError("heterogeneous BitsPerSample")
    bps = bps_list[0]
    comp = _first(tags, _TAG_COMPRESSION, 1)
    photo = _first(tags, _TAG_PHOTOMETRIC, 1)
    pred = _first(tags, _TAG_PREDICTOR, 1)
    rows_per_strip = _first(tags, _TAG_ROWS_PER_STRIP, h) or h

    if comp == 6:
        # old-style JPEG: a complete interchange stream pointed at by
        # JPEGInterchangeFormat/-Length — no strips needed (EXIF
        # thumbnail IFDs carry ONLY 513/514).  The broken strip-table
        # variant (512, 517-521) stays a typed error.
        jif = tags.get(_TAG_JPEG_IF)
        if not jif:
            raise NotImplementedError(
                "old-style JPEG TIFF without JPEGInterchangeFormat")
        o = jif[0]
        ln = _first(tags, _TAG_JPEG_IF_LEN, len(data) - o)
        stream = data[o : o + ln]
        if len(stream) < ln:
            raise ValueError("JPEGInterchangeFormat out of range")
        from .jpeg import decode_jpeg

        px = decode_jpeg(stream)
        if px.shape[0] < h or px.shape[1] < w:
            raise ValueError("JPEG interchange stream smaller than IFD")
        px = px[:h, :w]
        return (255 - px) if photo == 0 else px

    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets:
        raise ValueError("TIFF missing strip offsets")
    if not counts or len(counts) != len(offsets):
        raise ValueError("TIFF strip offsets/counts mismatch")

    n_strips = len(offsets)
    expected_strips = (h + rows_per_strip - 1) // rows_per_strip
    if n_strips != expected_strips:
        raise ValueError("TIFF strip count inconsistent with RowsPerStrip")

    # ---- new-style JPEG: strips are abbreviated T.81 streams ---------
    if comp == 7:
        tables = bytes(tags.get(_TAG_JPEG_TABLES) or b"")
        from .jpeg import decode_jpeg

        bands = []
        for s, (o, c) in enumerate(zip(offsets, counts)):
            # raw bytes even under FillOrder 2: libtiff's JPEG codec
            # sets TIFF_NOBITREV — the entropy stream is never
            # bit-reversed (a reversal would corrupt the markers)
            body = data[o : o + c]
            if len(body) < c:
                raise ValueError("TIFF strip out of range")
            strip_rows = min(rows_per_strip, h - s * rows_per_strip)
            # photometric 5: the strip stream carries 4-channel CMYK in
            # the TIFF ink convention (0 = no ink; libtiff compresses
            # JCS_UNKNOWN — samples as stored, no Adobe APP14), unlike
            # standalone Adobe CMYK JPEGs which invert
            band = decode_jpeg(
                _merge_jpeg_tables(tables, body),
                cmyk_natural=(photo == 5),
            )
            if band.shape[0] < strip_rows or band.shape[1] < w:
                raise ValueError("JPEG strip smaller than its extent")
            bands.append(band[:strip_rows, :w])
        out = np.concatenate(bands, axis=0)
        return (255 - out) if photo == 0 else out

    # ---- fax codecs: strips are independent CCITT codestreams --------
    if comp in (2, 3, 4):
        if bps != 1 or spp != 1:
            raise ValueError("CCITT TIFF must be bilevel")
        # T4Options bit 0: strip carries mixed 1-D/2-D lines (K > 0)
        t4_2d = comp == 3 and (_first(tags, _TAG_T4_OPTIONS, 0) & 1)
        bands = []
        for s, (o, c) in enumerate(zip(offsets, counts)):
            body = body_of(o, c)
            strip_rows = min(rows_per_strip, h - s * rows_per_strip)
            bands.append(
                decode_ccitt(
                    body,
                    columns=w,
                    rows=strip_rows,
                    k=-1 if comp == 4 else (1 if t4_2d else 0),
                    byte_align=(comp == 2),  # RLE: rows byte-aligned
                )
            )
        out = np.concatenate(bands, axis=0)
        # TIFF fax photometric is normally 0 (WhiteIsZero) — the decoder
        # already emits luma (255 white); photometric 1 inverts.
        return (255 - out) if photo == 1 else out

    # ---- byte-oriented codecs ----------------------------------------
    if bps not in (1, 8, 16):
        raise NotImplementedError(f"{bps}-bit samples not supported")
    if bps == 1 and spp != 1:
        raise ValueError("1-bit TIFF must have one sample per pixel")
    ycbcr = photo == 6
    if ycbcr:
        # chunky YCbCr (§ "YCbCr Images"): strips are sequences of
        # hs x vs data units — hs*vs Y samples row-major, then one Cb
        # and one Cr.  A luma output needs only the Y positions; the
        # unit geometry still governs the byte layout (edge units are
        # padded to full size).
        if bps != 8 or spp != 3:
            raise NotImplementedError("YCbCr TIFF needs 8-bit 3-sample")
        if pred == 2:
            raise ValueError("Predictor 2 undefined for YCbCr units")
        sub = tags.get(_TAG_YCBCR_SUB) or [2, 2]
        hs = sub[0]
        vs = sub[1] if len(sub) > 1 else sub[0]
        if hs not in (1, 2, 4) or vs not in (1, 2, 4):
            raise ValueError("bad YCbCrSubSampling")
        if n_strips > 1 and rows_per_strip % vs:
            raise ValueError(
                "YCbCr RowsPerStrip not a multiple of the subsampling"
            )
        upw = (w + hs - 1) // hs
        unit_bytes = hs * vs + 2
        row_bytes = upw * unit_bytes  # bytes per UNIT row
        max_strip = row_bytes * ((rows_per_strip + vs - 1) // vs)
    else:
        hs = vs = 1
        row_bytes = (w * spp * bps + 7) // 8
        max_strip = row_bytes * rows_per_strip

    rows_out = []
    for s, (o, c) in enumerate(zip(offsets, counts)):
        body = body_of(o, c)
        strip_rows = min(rows_per_strip, h - s * rows_per_strip)
        if ycbcr:
            strip_rows = (strip_rows + vs - 1) // vs  # unit rows
        expect = row_bytes * strip_rows
        if comp == 1:
            raw = body
        elif comp == 5:
            from .pdf import _lzw_decode_pdf

            raw = _lzw_decode_pdf(body)
        elif comp in (8, 32946):
            d = zlib.decompressobj()
            raw = d.decompress(body, max_strip + 1)
            if len(raw) > max_strip:
                raise ValueError("TIFF deflate strip over budget")
        elif comp == 32773:
            raw = _packbits_decode(body, expect)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        if len(raw) < expect:
            raise ValueError("TIFF strip data short")
        rows_out.append(
            np.frombuffer(raw[:expect], np.uint8).reshape(
                strip_rows, row_bytes
            )
        )
    raster = np.concatenate(rows_out, axis=0)

    if ycbcr:
        # units -> the Y grid: unit (uy, ux) holds Y rows uy*vs..+vs
        # and columns ux*hs..+hs at bytes [vsi*hs + hsi]; edge padding
        # crops with the final [:h, :w]
        units = raster.reshape(-1, upw, unit_bytes)
        ys = units[:, :, : hs * vs].reshape(-1, upw, vs, hs)
        ypix = ys.transpose(0, 2, 1, 3).reshape(-1, upw * hs)[:h, :w]
        return _scale_reference_y(np.ascontiguousarray(ypix), tags)

    if bps == 1:
        if pred == 2:
            raise NotImplementedError("Predictor 2 needs 8/16-bit samples")
        bits = np.unpackbits(raster, axis=1)[:, :w]
        # photometric 0: 0 = white; photometric 1: 0 = black
        return (
            np.where(bits.astype(bool), np.uint8(0), np.uint8(255))
            if photo == 0
            else (bits * 255).astype(np.uint8)
        )

    # sample space: 16-bit honors the container byte order and
    # downconverts to the high byte AFTER the predictor (horizontal
    # differencing §14 operates on full-precision samples, per row)
    if bps == 16:
        sam = np.frombuffer(raster.tobytes(), dtype=e + "u2").reshape(
            h, w, spp
        )
        if pred == 2:
            sam = (
                np.cumsum(sam, axis=1, dtype=np.int64) % 65536
            ).astype(np.uint16)
        px = (sam >> 8).astype(np.uint8)
    else:
        px = raster.reshape(h, w, spp)
        if pred == 2:
            px = (
                np.cumsum(px, axis=1, dtype=np.int64) % 256
            ).astype(np.uint8)
    if photo == 3:  # palette: ColorMap is 3 planes of 16-bit values
        if bps != 8:
            raise ValueError("palette TIFF needs 8-bit indices")
        cmap = tags.get(_TAG_COLOR_MAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF missing 256-entry ColorMap")
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, 256) // 257).astype(
            np.uint8
        )
        idx = px[:, :, 0]
        return _luma(np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2))
    if photo == 5:
        if spp < 4:
            raise ValueError("separated TIFF needs >= 4 samples")
        return _cmyk_luma(px[:, :, :4])
    if spp in (1, 2):  # 2 = gray + alpha: luma ignores the alpha
        gray = px[:, :, 0]
        return (255 - gray) if photo == 0 else gray
    return _luma(px[:, :, :3])
