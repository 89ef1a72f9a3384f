"""CCITT Group 3 / Group 4 fax decode — pure stdlib+numpy, the
canonical 1-bit scanned-document codec inside PDF ``/CCITTFaxDecode``
image streams (ITU-T T.4 one-dimensional MH, T.6 two-dimensional MMR).

Reference parity: the reference shells out to ``pdfimages`` which
decodes these via poppler (lib/pdf_processor.js:86-97); here the decode
is in-process so scanned-receipt PDFs produce real pixel arrays for the
OCR stage with no child processes (the same design rationale as
extract/jpeg.py for DCTDecode).

Output contract matches the other decoders: ``(h, w) uint8`` luma,
0 = black, 255 = white.  ``BlackIs1`` only changes the packed-bit
representation of the decoded data (PDF 32000-1 §7.4.6), which a pixel
array does not have — both settings yield the same luma array, so the
parameter is accepted and documented as a no-op here.

Scope: all three PDF K regimes decode — K < 0 (pure T.6/G4, the
overwhelmingly common PDF case), K = 0 (T.4 1-D MH, optional EOLs,
EncodedByteAlign), and K > 0 (mixed-mode G3: per-line EOL + tag bit
selecting a 1-D or 2-D coded line).  T.4 uncompressed mode (a rare
optional extension) is a typed error.

The run-length code tables are transcribed from the public ITU-T T.4
spec (tables 2/3/4); tests assert each color's table is a complete
prefix code (Kraft sum, collision-free) and round-trip against an
independent in-test encoder, plus hand-computed spec vectors.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# ITU-T T.4 run-length codes.  Written as bit strings (MSB first); the
# decoder folds them into {(nbits, value): run} lookup dicts.
# ---------------------------------------------------------------------------

WHITE_CODES = {
    # terminating (runs 0-63), T.4 table 2
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4,
    "1100": 5, "1110": 6, "1111": 7, "10011": 8, "10100": 9,
    "00111": 10, "01000": 11, "001000": 12, "000011": 13, "110100": 14,
    "110101": 15, "101010": 16, "101011": 17, "0100111": 18,
    "0001100": 19, "0001000": 20, "0010111": 21, "0000011": 22,
    "0000100": 23, "0101000": 24, "0101011": 25, "0010011": 26,
    "0100100": 27, "0011000": 28, "00000010": 29, "00000011": 30,
    "00011010": 31, "00011011": 32, "00010010": 33, "00010011": 34,
    "00010100": 35, "00010101": 36, "00010110": 37, "00010111": 38,
    "00101000": 39, "00101001": 40, "00101010": 41, "00101011": 42,
    "00101100": 43, "00101101": 44, "00000100": 45, "00000101": 46,
    "00001010": 47, "00001011": 48, "01010010": 49, "01010011": 50,
    "01010100": 51, "01010101": 52, "00100100": 53, "00100101": 54,
    "01011000": 55, "01011001": 56, "01011010": 57, "01011011": 58,
    "01001010": 59, "01001011": 60, "00110010": 61, "00110011": 62,
    "00110100": 63,
    # make-up (64-1728), T.4 table 3
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704, "011001101": 768,
    "011010010": 832, "011010011": 896, "011010100": 960,
    "011010101": 1024, "011010110": 1088, "011010111": 1152,
    "011011000": 1216, "011011001": 1280, "011011010": 1344,
    "011011011": 1408, "010011000": 1472, "010011001": 1536,
    "010011010": 1600, "011000": 1664, "010011011": 1728,
}

BLACK_CODES = {
    # terminating (runs 0-63), T.4 table 2
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4, "0011": 5,
    "0010": 6, "00011": 7, "000101": 8, "000100": 9, "0000100": 10,
    "0000101": 11, "0000111": 12, "00000100": 13, "00000111": 14,
    "000011000": 15, "0000010111": 16, "0000011000": 17,
    "0000001000": 18, "00001100111": 19, "00001101000": 20,
    "00001101100": 21, "00000110111": 22, "00000101000": 23,
    "00000010111": 24, "00000011000": 25, "000011001010": 26,
    "000011001011": 27, "000011001100": 28, "000011001101": 29,
    "000001101000": 30, "000001101001": 31, "000001101010": 32,
    "000001101011": 33, "000011010010": 34, "000011010011": 35,
    "000011010100": 36, "000011010101": 37, "000011010110": 38,
    "000011010111": 39, "000001101100": 40, "000001101101": 41,
    "000011011010": 42, "000011011011": 43, "000001010100": 44,
    "000001010101": 45, "000001010110": 46, "000001010111": 47,
    "000001100100": 48, "000001100101": 49, "000001010010": 50,
    "000001010011": 51, "000000100100": 52, "000000110111": 53,
    "000000111000": 54, "000000100111": 55, "000000101000": 56,
    "000001011000": 57, "000001011001": 58, "000000101011": 59,
    "000000101100": 60, "000001011010": 61, "000001100110": 62,
    "000001100111": 63,
    # make-up (64-1728), T.4 table 3
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

# extended make-up (1792-2560), common to both colors — T.4 table 4
EXT_CODES = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}

# T.4 §4.2.1.3 / T.6 §2.2.4 two-dimensional mode codes
MODE_CODES = {
    "0001": "P", "001": "H", "1": "V0",
    "011": "VR1", "000011": "VR2", "0000011": "VR3",
    "010": "VL1", "000010": "VL2", "0000010": "VL3",
}

_EOL = "000000000001"


def _fold(codes: dict) -> dict:
    return {(len(k), int(k, 2)): v for k, v in codes.items()}

_WHITE_LUT = _fold({**WHITE_CODES, **EXT_CODES})
_BLACK_LUT = _fold({**BLACK_CODES, **EXT_CODES})
_MODE_LUT = _fold(MODE_CODES)
_MAX_CODE_BITS = 14


class _Bits:
    """MSB-first bit reader over the codestream."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        """Next k bits (zero-padded past the end) without consuming."""
        v = 0
        p = self.pos
        for i in range(k):
            if p + i < self.n:
                byte = self.data[(p + i) >> 3]
                v = (v << 1) | ((byte >> (7 - ((p + i) & 7))) & 1)
            else:
                v <<= 1
        return v

    def exhausted(self) -> bool:
        return self.pos >= self.n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_code(self, lut: dict, what: str):
        """Consume one prefix code from ``lut``; ValueError on none."""
        acc = 0
        for nbits in range(1, _MAX_CODE_BITS + 1):
            if self.pos + nbits > self.n + 7:
                raise ValueError(f"truncated CCITT stream in {what}")
            bitpos = self.pos + nbits - 1
            if bitpos < self.n:
                byte = self.data[bitpos >> 3]
                bit = (byte >> (7 - (bitpos & 7))) & 1
            else:
                bit = 0  # zero padding past the end
            acc = (acc << 1) | bit
            hit = lut.get((nbits, acc))
            if hit is not None:
                self.pos += nbits
                return hit
        raise ValueError(f"invalid CCITT {what} code")

    def try_eol(self) -> bool:
        """Consume fill zeros + EOL if present at the cursor (T.4 §4.1.2
        allows 0-fill before each EOL).  Returns True when consumed."""
        p = self.pos
        zeros = 0
        # T.4 §4.1.2 permits ARBITRARY-length fill before an EOL — do
        # not cap the zero scan (a cap made a long fill's next 0 bit
        # read as the terminating 1, corrupting row alignment; ADVICE
        # r3).  The scan is bounded by stream length, and the cursor
        # only moves when a real terminating 1 was found, so a zero
        # flood costs one linear scan, never a mis-consume.
        while p + zeros < self.n:
            bitpos = p + zeros
            if (self.data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1:
                break
            zeros += 1
        if zeros >= 11 and p + zeros < self.n:
            self.pos = p + zeros + 1  # consume the terminating 1 too
            return True
        return False

    def read_bit(self) -> int:
        """Consume one bit (the G3 2-D per-line tag bit)."""
        if self.pos >= self.n:
            raise ValueError("truncated CCITT stream in tag bit")
        bit = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit


def _read_run(bits: _Bits, white: bool) -> int:
    """One full run: make-up codes accumulate until a terminating code
    (<64) arrives — runs over 2560 chain multiple make-ups (T.4 §4.2)."""
    total = 0
    for _ in range(64):  # bound: no legitimate run needs 64 makeups
        run = bits.read_code(_WHITE_LUT if white else _BLACK_LUT, "run")
        total += run
        if run < 64 or run % 64:  # terminating code
            return total
    raise ValueError("CCITT make-up chain too long")


def _decode_1d_line(bits: _Bits, columns: int) -> list[int]:
    """One MH line → transition positions (alternating, white first)."""
    transitions: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(bits, white)
        pos += run
        if pos > columns:
            raise ValueError("CCITT 1-D run overruns the line")
        transitions.append(pos)
        white = not white
    return transitions


def _b1_index(ref: list[int], a0: int, color_white: bool) -> int:
    """Index into ``ref`` of b1: first changing element > a0 whose new
    color is opposite to the current (a0) color.  ``ref`` positions
    alternate to-black (even index) / to-white (odd index)."""
    # binary search would be O(log n); lines have few transitions, scan.
    start_parity = 0 if color_white else 1
    i = start_parity
    while i < len(ref) and ref[i] <= a0:
        i += 2
    return i


def _decode_2d_line(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    """One T.6 MMR line against reference transitions ``ref``."""
    transitions: list[int] = []
    a0 = -1  # imaginary changing element before the first pixel
    white = True
    while True:
        mode = bits.read_code(_MODE_LUT, "mode")
        i1 = _b1_index(ref, a0, white)
        b1 = ref[i1] if i1 < len(ref) else columns
        if mode == "P":
            b2 = ref[i1 + 1] if i1 + 1 < len(ref) else columns
            a0 = b2  # color unchanged, no transition
        elif mode == "H":
            start = a0 if a0 > 0 else 0
            run1 = _read_run(bits, white)
            run2 = _read_run(bits, not white)
            a1 = start + run1
            a2 = a1 + run2
            if a2 > columns or a1 > columns:
                raise ValueError("CCITT horizontal runs overrun the line")
            transitions.append(a1)
            transitions.append(a2)
            a0 = a2
        else:  # vertical
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + delta
            if a1 < 0 or a1 > columns or a1 <= a0:
                raise ValueError("CCITT vertical mode out of range")
            transitions.append(a1)
            white = not white
            a0 = a1
        if a0 >= columns:
            return transitions


def _canonical(tr: list[int]) -> list[int]:
    """Drop cancelling transition pairs (zero-length runs encode as two
    transitions at the same position) so reference-line parity stays
    alternating for the next row's b1 search."""
    out: list[int] = []
    for t in tr:
        if out and out[-1] == t:
            out.pop()
        else:
            out.append(t)
    return out


def _render(lines: list[list[int]], columns: int) -> np.ndarray:
    """Transition lists → (h, w) uint8 luma (255 white / 0 black) via
    one vectorized cumulative color flip per image."""
    h = len(lines)
    flips = np.zeros((h, columns + 1), dtype=np.uint8)
    for y, tr in enumerate(lines):
        for t in tr:
            if t < columns:
                flips[y, t] ^= 1
    ink = np.cumsum(flips[:, :columns], axis=1, dtype=np.uint8) & 1
    return np.where(ink.astype(bool), np.uint8(0), np.uint8(255))


def decode_t6_planes(
    data: bytes, columns: int, rows: int, nplanes: int
) -> list[np.ndarray]:
    """Decode ``nplanes`` consecutive equal-size T.6 bitmaps from ONE
    bit stream: each plane is ``rows`` 2-D lines against a fresh
    imaginary-white reference line, terminated by its EOFB, with the
    next plane continuing at the next BIT (not byte-aligned) — the
    JBIG2 Annex C.5 multi-plane MMR grayscale layout (the pdf.js /
    jbig2dec reading of §6.6.5.1).  The EOFB is consumed when present
    but tolerated absent (no T.4/T.6 code is all-zero, so the probe is
    unambiguous).  Returns (h, w) uint8 luma arrays, 255 = white."""
    if columns <= 0 or rows <= 0 or nplanes <= 0:
        raise ValueError("bad T.6 plane geometry")
    from .imaging import check_pixel_budget

    check_pixel_budget(columns, rows * nplanes)
    bits = _Bits(data)
    out = []
    for _ in range(nplanes):
        ref: list[int] = []
        lines: list[list[int]] = []
        while len(lines) < rows:
            tr = _canonical(_decode_2d_line(bits, ref, columns))
            lines.append(tr)
            ref = tr
        if bits.try_eol():  # per-plane EOFB = two EOL codes
            bits.try_eol()
        out.append(_render(lines, columns))
    return out


def decode_ccitt(
    data: bytes,
    columns: int,
    rows: int = 0,
    k: int = 0,
    byte_align: bool = False,
    black_is_1: bool = False,
) -> np.ndarray:
    """Decode a PDF ``/CCITTFaxDecode`` codestream to (h, w) uint8 luma.

    ``k`` follows the PDF parameter: < 0 pure two-dimensional (T.6/G4),
    0 pure one-dimensional (T.4 MH), > 0 mixed G3 2-D (per-line EOL +
    tag bit; the decoder accepts any mix, K only bounds it).  ``rows``
    of 0 means decode until EOFB / data end.  ``byte_align`` starts each
    coded line on a byte boundary (/EncodedByteAlign).  ``black_is_1``
    is a packed-bit-representation flag with no effect on a pixel-array
    output (see module docstring).
    """
    del black_is_1  # luma output is representation-independent
    if columns <= 0:
        raise ValueError("CCITT Columns must be positive")
    from .imaging import check_pixel_budget

    if rows:
        check_pixel_budget(columns, rows)
    bits = _Bits(data)
    max_rows = rows if rows else (bits.n + 2)  # hard safety bound
    lines: list[list[int]] = []
    # imaginary all-white reference line above the image (T.6 §2.2.1)
    ref: list[int] = []
    while len(lines) < max_rows:
        if rows == 0 and bits.exhausted():
            break
        if byte_align:
            bits.align()
        if k > 0:
            # mixed-mode G3 (T.4 §4.2.1): every line is fill+EOL, then
            # one tag bit — 1 selects a 1-D MH line, 0 a 2-D line coded
            # against the previous line.  RTC is consecutive EOLs.
            if bits.try_eol():
                if bits.exhausted() or bits.try_eol():
                    break  # RTC / trailing padding
                one_d = bits.read_bit() == 1
            elif not lines:
                one_d = True  # tolerate an omitted leading EOL
            else:
                break  # no further EOL: end of data
            tr = _canonical(
                _decode_1d_line(bits, columns)
                if one_d
                else _decode_2d_line(bits, ref, columns)
            )
            lines.append(tr)
            ref = tr
            continue
        if bits.try_eol():
            # EOL (optional in PDF streams); a second EOL right after is
            # EOFB/RTC — end of data
            if bits.try_eol():
                break
            if bits.exhausted():
                break
        elif rows == 0:
            # without an explicit row count, trailing zero-pad bits must
            # not fabricate rows: stop when only zero bits remain
            rest = bits.n - bits.pos
            if rest < 8 and bits.peek(rest) == 0:
                break
        if k < 0:
            tr = _canonical(_decode_2d_line(bits, ref, columns))
        else:
            tr = _canonical(_decode_1d_line(bits, columns))
        lines.append(tr)
        ref = tr
        if not rows:
            check_pixel_budget(columns, len(lines))
    if rows and len(lines) < rows:
        raise ValueError(
            f"CCITT stream ended after {len(lines)} of {rows} rows"
        )
    if not lines:
        raise ValueError("empty CCITT stream")
    return _render(lines, columns)
