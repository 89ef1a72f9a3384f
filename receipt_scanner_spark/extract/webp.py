"""WebP lossless (VP8L) decode — stdlib + numpy only (r4).

Web-scraped corpora carry lossless WebP heavily (screenshots, UI
assets, palette graphics re-encoded by CDNs); until r4 WebP was
sniff-only (dimensions).  This implements the public "WebP Lossless
Bitstream Specification" end to end:

- RIFF container: plain VP8L files and VP8X extended files; lossy
  VP8 key frames dispatch to extract/vp8.py (REAL as of later in r4
  — RFC 6386 decode, bit-exact against libwebp's YUV output) with
  the ALPH alpha chunk decoded here (raw or headerless-VP8L
  compression, all four prediction filters).
- LSB-first bit reader; 14-bit header dims; version 0 enforced.
- Canonical prefix codes, both forms: simple (1-2 symbols) and
  normal (code-length codes in the spec's 19-symbol order, repeat
  codes 16/17/18 with the previous-nonzero default of 8, and the
  max_symbol short-circuit).
- The spatially-coded image: optional color cache (hash
  0x1e35a7bd * argb >> (32 - bits), every emitted pixel inserted),
  optional meta-prefix entropy image selecting one of N groups of
  five codes (green+length+cache / red / blue / alpha / distance),
  LZ77 backward references with the 24 length prefix codes and the
  120-entry two-dimensional distance map, and color-cache hits.
- All four transforms, inverted in reverse bitstream order:
  predictor (14 modes, top-right of the last column = first pixel of
  the current row, Select / ClampAddSubtract edge rules), color
  transform (signed 3.5 fixed-point green_to_red / green_to_blue /
  red_to_blue deltas), subtract-green, and color indexing with
  sub-byte pixel bundling (1/2/4-bit indices packed in green).
- Sub-images (entropy image, transform images, palettes) decode
  through the same image-stream routine without meta-codes.

Output follows the ``decode_pixels`` contract: (h, w) uint8 luma
with alpha composited over white (same convention as the PNG/GIF
decoders).

Verification: the system libwebp ships BOTH directions, so
tests/test_webp.py drives a true third-party differential via ctypes
— libwebp losslessly encodes a content battery chosen to force every
path (photo-like with predictors + color transform + subtract-green,
palettes of every bundling width, flat/simple codes, repetitive LZ77
content, large images that trigger meta-prefix groups), and this
decoder must reproduce the EXACT source pixels (lossless = strict
oracle); hand-built minimal streams pin the header/simple-code
semantics bit-for-bit, and tools/diff_webp_oracle.py batches the
sweep.

Reference parity: the reference delegates image decode to
graphicsmagick/sharp (lib/image_processor.js); this keeps the
library swap config-only while covering the web's second lossless
format natively.

Scale note: entropy decode is a sequential per-pixel Python loop
(tree-walk prefix decode) and the inverse transforms are vectorized
numpy per row where the spec allows; same per-pixel bound and same
"swap a codec library at this seam for 100 TB" statement as the
other decoders.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code order (spec §5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 120-entry distance map (spec §4.2.2): (dx, dy) neighbor offsets
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _Bits:
    """LSB-first bit reader (the VP8L convention)."""

    __slots__ = ("data", "n", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data) * 8
        self.pos = 0

    def read(self, nbits: int) -> int:
        pos = self.pos
        if pos + nbits > self.n:
            raise ValueError("truncated VP8L stream")
        v = 0
        data = self.data
        for k in range(nbits):
            p = pos + k
            v |= ((data[p >> 3] >> (p & 7)) & 1) << k
        self.pos = pos + nbits
        return v

    def bit(self) -> int:
        pos = self.pos
        if pos >= self.n:
            raise ValueError("truncated VP8L stream")
        self.pos = pos + 1
        return (self.data[pos >> 3] >> (pos & 7)) & 1


class _Prefix:
    """Canonical prefix decoder: bit-by-bit walk of a flat tree built
    from code lengths (DEFLATE-style canonical assignment)."""

    __slots__ = ("tree", "single")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.tree = None
            return
        self.single = None
        # canonical codes: shorter first, then symbol order
        max_len = max(l for l, _ in nz)
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        # flat tree: list of [left, right]; leaves negative-encoded
        tree = [[-1, -1]]
        for length in range(1, max_len + 1):
            for l, sym in nz:
                if l != length:
                    continue
                c = next_code[length]
                next_code[length] += 1
                node = 0
                for k in range(length - 1, -1, -1):
                    b = (c >> k) & 1
                    nxt = tree[node][b]
                    if k == 0:
                        tree[node][b] = -sym - 2
                    elif nxt == -1:
                        tree.append([-1, -1])
                        tree[node][b] = len(tree) - 1
                        node = len(tree) - 1
                    elif nxt <= -2:
                        raise ValueError("over-subscribed VP8L prefix code")
                    else:
                        node = nxt
        self.tree = tree

    def decode(self, br: _Bits) -> int:
        if self.tree is None:
            return self.single
        node = 0
        tree = self.tree
        while True:
            node = tree[node][br.bit()]
            if node <= -2:
                return -node - 2
            if node == -1:
                raise ValueError("invalid VP8L prefix code")


def _read_code_lengths(br: _Bits, alphabet_size: int) -> list[int]:
    """Normal prefix-code form (spec §5.2.2)."""
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lengths)
    if br.bit():  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8  # default for repeat-previous with no prior nonzero
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("VP8L code-length repeat overflow")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("VP8L code-length repeat overflow")
    return lengths


def _read_prefix(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.bit()
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            s1 = br.read(8)
            if s0 >= alphabet_size or s1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            if s0 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[s0] = 1
        return _Prefix(lengths)
    return _Prefix(_read_code_lengths(br, alphabet_size))


def _prefix_value(br: _Bits, code: int) -> int:
    """LZ77 length/distance prefix expansion (spec §4.2.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_distance(plane: int, xsize: int) -> int:
    if plane > 120:
        return plane - 120
    dx, dy = _DIST_MAP[plane - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _decode_image_stream(br: _Bits, w: int, h: int, top_level: bool):
    """Decode one entropy-coded ARGB image of w x h (spec §5); returns
    (argb uint32 flat array, palette-reduced width if top_level)."""
    from .imaging import check_pixel_budget

    check_pixel_budget(w, h)
    transforms = []
    cur_w = w
    if top_level:
        while br.bit():
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("repeated VP8L transform")
            if ttype == 0 or ttype == 1:  # predictor / color transform
                size_bits = br.read(3) + 2
                bw = -(-cur_w // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_image_stream(br, n_colors, 1, False)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (n_colors, width_bits, cur_w), pal))
                if width_bits:
                    cur_w = -(-cur_w // (1 << width_bits))

    # color cache
    cache_bits = 0
    if br.bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix groups
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.bit():
        meta_bits = br.read(3) + 2
        mw = -(-cur_w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _decode_image_stream(br, mw, mh, False)
        n_groups = int(max((int(p) >> 8) & 0xFFFF for p in meta)) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix(br, green_size),
            _read_prefix(br, 256),  # red
            _read_prefix(br, 256),  # blue
            _read_prefix(br, 256),  # alpha
            _read_prefix(br, 40),  # distance
        ))

    n_px = cur_w * h
    out = np.zeros(n_px, dtype=np.uint32)
    pos = 0
    x = 0
    group = groups[0]
    mw = -(-cur_w // (1 << meta_bits)) if meta is not None else 0
    last_meta_row = -1
    while pos < n_px:
        if meta is not None:
            y = pos // cur_w
            gidx = int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])
            group = groups[(gidx >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(br)
        if s < 256:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
            x += 1
            if x == cur_w:
                x = 0
        elif s < 280:
            length = _prefix_value(br, s - 256)
            plane = _prefix_value(br, d_code.decode(br))
            dist = _plane_to_distance(plane, cur_w)
            if dist > pos:
                raise ValueError("VP8L back-reference before start")
            if pos + length > n_px:
                raise ValueError("VP8L back-reference overruns image")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
                x += 1
                if x == cur_w:
                    x = 0
        else:
            if cache is None:
                raise ValueError("VP8L cache hit without color cache")
            px = cache[s - 280]
            out[pos] = px
            pos += 1
            x += 1
            if x == cur_w:
                x = 0

    if not top_level:
        return out
    return _apply_inverse_transforms(out, cur_w, w, h, transforms)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _apply_inverse_transforms(out, cur_w, w, h, transforms):
    argb = out
    width = cur_w
    for ttype, params, sub in reversed(transforms):
        if ttype == 3:
            argb, width = _inv_color_indexing(argb, width, h, params, sub)
        elif ttype == 2:
            argb = _inv_subtract_green(argb)
        elif ttype == 1:
            argb = _inv_color_transform(argb, width, h, params, sub)
        else:
            argb = _inv_predictor(argb, width, h, params, sub)
    if width != w:
        raise ValueError("VP8L width mismatch after inverse transforms")
    return argb.reshape(h, w)


def _inv_subtract_green(argb):
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) + g) & 0xFF
    b = (argb + g) & 0xFF
    return (argb & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(argb, width, h, params, pal):
    n_colors, width_bits, orig_w = params
    # palette entries are stored delta-coded per channel (spec §4.2.4)
    chans = np.zeros((len(pal), 4), dtype=np.uint32)
    for k, shift in enumerate((24, 16, 8, 0)):
        chans[:, k] = np.cumsum((pal >> shift) & 0xFF, dtype=np.uint64) & 0xFF
    palette = (
        (chans[:, 0] << 24) | (chans[:, 1] << 16)
        | (chans[:, 2] << 8) | chans[:, 3]
    ).astype(np.uint32)
    idx = (argb >> 8) & 0xFF
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits  # bits per pixel: 4, 2 or 1
        cols = idx.reshape(h, width)
        pieces = [
            (cols >> (bits * k)) & ((1 << bits) - 1) for k in range(per)
        ]
        full = np.stack(pieces, axis=2).reshape(h, width * per)[:, :orig_w]
        idx = full.reshape(-1)
    safe = np.where(idx < n_colors, idx, 0)
    px = palette[safe]
    px = np.where(idx < n_colors, px, np.uint32(0))
    return px.astype(np.uint32), (orig_w if width_bits else width)


def _inv_color_transform(argb, width, h, params, sub):
    size_bits = params
    bw = -(-width // (1 << size_bits))
    img = argb.reshape(h, width)
    sub = sub.reshape(-(-h // (1 << size_bits)), bw)
    out = img.copy()
    # per-block signed multipliers; process rows vectorized per block row
    for y in range(h):
        trow = sub[y >> size_bits]
        cte = trow[(np.arange(width) >> size_bits)]
        g2r = ((cte & 0xFF).astype(np.int32) ^ 0x80) - 0x80
        g2b = (((cte >> 8) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
        r2b = (((cte >> 16) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
        row = out[y]
        g = ((row >> 8) & 0xFF).astype(np.int32)
        red = ((row >> 16) & 0xFF).astype(np.int32)
        red = (red + ((g2r * _s8(g)) >> 5)) & 0xFF
        blue = (row & 0xFF).astype(np.int32)
        blue = (blue + ((g2b * _s8(g)) >> 5)) & 0xFF
        blue = (blue + ((r2b * _s8(red)) >> 5)) & 0xFF
        out[y] = (row & 0xFF00FF00) | (red.astype(np.uint32) << 16) | blue.astype(np.uint32)
    return out.reshape(-1)


def _s8(v):
    """uint8 vector -> signed int8 semantics (spec ColorTransformDelta
    multiplies two signed 8-bit values)."""
    return ((v & 0xFF) ^ 0x80) - 0x80


def _avg2(a, b):
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _inv_predictor(argb, width, h, params, sub):
    size_bits = params
    bw = -(-width // (1 << size_bits))
    img = argb.reshape(h, width).astype(np.uint32)
    modes = ((sub.reshape(-1, bw) >> 8) & 0xFF).astype(np.int32)
    for y in range(h):
        mrow = modes[y >> size_bits]
        row = img[y]
        for x in range(width):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(row[x - 1])  # left
            elif x == 0:
                pred = int(img[y - 1][0])  # top
            else:
                mode = int(mrow[x >> size_bits])
                left = int(row[x - 1])
                top = int(img[y - 1][x])
                tl = int(img[y - 1][x - 1])
                tr = int(img[y - 1][x + 1]) if x + 1 < width else int(row[0])
                pred = _predict(mode, left, top, tl, tr)
            row[x] = _add_px(int(row[x]), pred)
    return img.reshape(-1)


def _add_px(a, b):
    """Per-channel modulo-256 addition of two packed ARGB values."""
    return (
        (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
    )


def _predict(mode, left, top, tl, tr):
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2_i(_avg2_i(left, tr), top)
    if mode == 6:
        return _avg2_i(left, tl)
    if mode == 7:
        return _avg2_i(left, top)
    if mode == 8:
        return _avg2_i(tl, top)
    if mode == 9:
        return _avg2_i(top, tr)
    if mode == 10:
        return _avg2_i(_avg2_i(left, tl), _avg2_i(top, tr))
    if mode == 11:
        return _select(left, top, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, top, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2_i(left, top), tl)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _avg2_i(a, b):
    return int(_avg2(np.uint32(a), np.uint32(b)))


def _ch(v, shift):
    return (v >> shift) & 0xFF


def _select(left, top, tl):
    # Manhattan distance of the L+T-TL gradient to each candidate;
    # ties select TOP (|L-TL| - |T-TL| summed <= 0 -> top)
    diff = 0
    for shift in (24, 16, 8, 0):
        diff += abs(_ch(left, shift) - _ch(tl, shift)) - abs(
            _ch(top, shift) - _ch(tl, shift)
        )
    return top if diff <= 0 else left


def _clamp_add_sub_full(left, top, tl):
    out = 0
    for shift in (24, 16, 8, 0):
        v = _ch(left, shift) + _ch(top, shift) - _ch(tl, shift)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_sub_half(avg, tl):
    out = 0
    for shift in (24, 16, 8, 0):
        a = _ch(avg, shift)
        d = a - _ch(tl, shift)
        # C-style truncating division: -3/2 = -1 (a >> would floor)
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, v)) << shift
    return out


# ---------------------------------------------------------------------------
# container + luma output
# ---------------------------------------------------------------------------


def _chunks(data: bytes):
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    i = 12
    n = len(data)
    out = {}
    while i + 8 <= n:
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        out.setdefault(tag, data[i + 8 : i + 8 + size])
        i += 8 + size + (size & 1)
    return out


def _find_vp8l_chunk(data: bytes) -> bytes:
    ch = _chunks(data)
    if b"VP8L" in ch:
        return ch[b"VP8L"]
    if b"VP8 " in ch:
        raise NotImplementedError("lossy WebP (VP8) not supported here")
    raise ValueError("WebP file has no image chunk")


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Container-spec alpha filters: 1=horizontal, 2=vertical,
    3=gradient (first row always unfilters horizontally)."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = plane.astype(np.int32)
    # first row: horizontal with seed 0
    for x in range(1, w):
        out[0, x] = (out[0, x] + out[0, x - 1]) & 0xFF
    for y in range(1, h):
        if method == 1:  # horizontal, seeded by prev row's first pixel
            out[y, 0] = (out[y, 0] + out[y - 1, 0]) & 0xFF
            for x in range(1, w):
                out[y, x] = (out[y, x] + out[y, x - 1]) & 0xFF
        elif method == 2:  # vertical
            out[y] = (out[y] + out[y - 1]) & 0xFF
        else:  # gradient: clip(left + top - top_left)
            left = int(out[y - 1, 0])
            tl = left
            for x in range(w):
                top = int(out[y - 1, x])
                g = left + top - tl
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (int(plane[y, x]) + g) & 0xFF
                out[y, x] = left
                tl = top
    return out.astype(np.uint8)


def _decode_alpha(alph: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane (container spec §
    'Alpha').  Compression 0 = raw, 1 = headerless VP8L stream with
    alpha in the green channel."""
    if not alph:
        raise ValueError("empty ALPH chunk")
    flags = alph[0]
    compression = flags & 3
    filter_method = (flags >> 2) & 3
    body = alph[1:]
    if compression == 0:
        if len(body) < w * h:
            raise ValueError("truncated raw alpha plane")
        plane = np.frombuffer(body[: w * h], np.uint8).reshape(h, w)
    elif compression == 1:
        br = _Bits(body)
        argb = _decode_image_stream(br, w, h, True)
        plane = ((argb >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    else:
        raise ValueError("unknown alpha compression method")
    return _unfilter_alpha(plane, filter_method)


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L codestream -> (h, w, 4) uint8 RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_image_stream(br, w, h, True)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    out[..., 3] = (argb >> 24) & 0xFF
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w) uint8 luma, alpha composited over white
    (the decode_pixels contract).  Lossless (VP8L) converts RGBA to
    BT.601 luma; lossy (VP8, r4: extract/vp8.py) outputs the codec's
    own reconstructed Y plane — the luma channel by definition — with
    an ALPH chunk composited when present."""
    ch = _chunks(data)
    if b"ANMF" in ch:  # animated: the still-image view is frame 1
        return demux_webp_frames(data, max_frames=1)[0][0]
    if b"VP8L" in ch:
        rgba = decode_vp8l(ch[b"VP8L"])
        r = rgba[..., 0].astype(np.uint32)
        g = rgba[..., 1].astype(np.uint32)
        b = rgba[..., 2].astype(np.uint32)
        a = rgba[..., 3].astype(np.uint32)
        luma = (299 * r + 587 * g + 114 * b) // 1000
        return ((luma * a + 255 * (255 - a)) // 255).astype(np.uint8)
    if b"VP8 " in ch:
        from .vp8 import decode_vp8

        y, _u, _v = decode_vp8(ch[b"VP8 "])
        if b"ALPH" in ch:
            h, w = y.shape
            a = _decode_alpha(ch[b"ALPH"], w, h).astype(np.uint32)
            return (
                (y.astype(np.uint32) * a + 255 * (255 - a)) // 255
            ).astype(np.uint8)
        return y
    raise ValueError("WebP file has no image chunk")


# ---------------------------------------------------------------------------
# animated WebP (container spec: VP8X + ANIM/ANMF)
# ---------------------------------------------------------------------------


def _frame_luma_alpha(chunks: dict) -> tuple[np.ndarray, np.ndarray]:
    """(luma, alpha) planes of one frame's chunk set."""
    if b"VP8L" in chunks:
        rgba = decode_vp8l(chunks[b"VP8L"])
        r = rgba[..., 0].astype(np.uint32)
        g = rgba[..., 1].astype(np.uint32)
        b = rgba[..., 2].astype(np.uint32)
        luma = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        return luma, rgba[..., 3]
    if b"VP8 " in chunks:
        from .vp8 import decode_vp8

        y, _u, _v = decode_vp8(chunks[b"VP8 "])
        if b"ALPH" in chunks:
            h, w = y.shape
            return y, _decode_alpha(chunks[b"ALPH"], w, h)
        return y, np.full(y.shape, 255, np.uint8)
    raise ValueError("animation frame has no image chunk")


def _sub_chunks(data: bytes) -> dict:
    out = {}
    i = 0
    n = len(data)
    while i + 8 <= n:
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        out.setdefault(tag, data[i + 8 : i + 8 + size])
        i += 8 + size + (size & 1)
    return out


def _u24(b: bytes) -> int:
    return b[0] | (b[1] << 8) | (b[2] << 16)


def demux_webp_frames(data: bytes, max_frames: int = 256):
    """Animated WebP -> list of (composed_luma, duration_ms) frames
    (container spec 'Animation'): per-frame sub-rectangle placement,
    alpha blending vs replace, and none / restore-background
    disposal, composed in (luma, alpha) space with the final canvas
    flattened over white.  Non-animated files return their single
    frame with duration 0."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    if data[12:16] != b"VP8X":
        return [(decode_webp(data), 0)]
    (vsize,) = struct.unpack("<I", data[16:20])
    vp8x = data[20 : 20 + vsize]
    if not vp8x[0] & 0x02:  # animation flag
        return [(decode_webp(data), 0)]
    cw = _u24(vp8x[4:7]) + 1
    ch = _u24(vp8x[7:10]) + 1
    from .imaging import check_pixel_budget

    check_pixel_budget(cw, ch)
    chunks_iter = []
    i = 20 + vsize + (vsize & 1)
    n = len(data)
    bg_luma, bg_alpha = 255, 0
    while i + 8 <= n:
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + size]
        if tag == b"ANIM" and len(body) >= 6:
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg_luma = (299 * r_ + 587 * g_ + 114 * b_) // 1000
            bg_alpha = a_
        elif tag == b"ANMF":
            chunks_iter.append(body)
        i += 8 + size + (size & 1)
    if not chunks_iter:
        raise ValueError("animated WebP with no ANMF frames")
    canvas_l = np.full((ch, cw), bg_luma, np.uint32)
    canvas_a = np.full((ch, cw), bg_alpha, np.uint32)
    frames = []
    for body in chunks_iter[:max_frames]:
        if len(body) < 16:
            raise ValueError("truncated ANMF chunk")
        fx = _u24(body[0:3]) * 2
        fy = _u24(body[3:6]) * 2
        fw = _u24(body[6:9]) + 1
        fh = _u24(body[9:12]) + 1
        dur = _u24(body[12:15])
        flags = body[15]
        dispose_bg = flags & 1
        no_blend = flags & 2
        sub = _sub_chunks(body[16:])
        luma, alpha = _frame_luma_alpha(sub)
        if luma.shape != (fh, fw):
            raise ValueError("ANMF frame dimensions mismatch")
        y1, x1 = min(fy + fh, ch), min(fx + fw, cw)
        fl = luma[: y1 - fy, : x1 - fx].astype(np.uint32)
        fa = alpha[: y1 - fy, : x1 - fx].astype(np.uint32)
        dst_l = canvas_l[fy:y1, fx:x1]
        dst_a = canvas_a[fy:y1, fx:x1]
        if no_blend:
            dst_l[:] = fl
            dst_a[:] = fa
        else:
            # source-over in straight-alpha space
            out_a = fa + (dst_a * (255 - fa)) // 255
            num = fl * fa * 255 + dst_l * dst_a * (255 - fa)
            safe = np.maximum(out_a, 1)
            dst_l[:] = num // (safe * 255)
            dst_a[:] = out_a
        flat = (canvas_l * canvas_a + 255 * (255 - canvas_a)) // 255
        frames.append((flat.astype(np.uint8), dur))
        if dispose_bg:
            canvas_l[fy:y1, fx:x1] = bg_luma
            canvas_a[fy:y1, fx:x1] = bg_alpha
    return frames
