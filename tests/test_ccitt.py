"""CCITT G3/G4 fax decoder tests.

Evidence structure (no fax-capable third party exists in this
container — no poppler/libtiff/PIL/ghostscript):

* the run-length tables are asserted to be structurally sound
  (collision-free prefix codes with the exact spec population:
  64 terminating + 27 make-up per color + 13 shared extended);
* an independent in-test encoder implements the T.4 MH and T.6 MMR
  CODING algorithms from the spec (run splitting, pass/vertical/
  horizontal mode election) and must round-trip bit-exactly through
  the decoder over randomized bitmaps and every parameter variant;
* hand-computed spec vectors pin absolute bit layouts end-to-end;
* the PDF layer test feeds a G4-encoded rendering of receipt text
  through process_pdf + the real OCR engine — codestream to parsed
  total with no shortcut.
"""

from __future__ import annotations

import numpy as np
import pytest

from receipt_scanner_spark.extract.ccitt import (
    BLACK_CODES,
    EXT_CODES,
    MODE_CODES,
    WHITE_CODES,
    decode_ccitt,
)

# ---------------------------------------------------------------------------
# independent in-test encoder
# ---------------------------------------------------------------------------

_W_INV = {v: k for k, v in WHITE_CODES.items()}
_B_INV = {v: k for k, v in BLACK_CODES.items()}
_EXT_INV = {v: k for k, v in EXT_CODES.items()}
_V_BITS = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
_EOL = "000000000001"


def _enc_run(run: int, white: bool) -> str:
    inv = _W_INV if white else _B_INV
    bits = ""
    while run > 2560 + 63:
        bits += _EXT_INV[2560]
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        bits += inv[m] if m <= 1728 else _EXT_INV[m]
        run -= m
    return bits + inv[run]


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the pixel color changes (white-start)."""
    ink = row.astype(np.int8)
    prev = np.concatenate(([0], ink[:-1]))
    return list(np.nonzero(ink != prev)[0])


def _mh_row(row: np.ndarray) -> str:
    cols = len(row)
    tr = _transitions(row) + [cols]
    bits = ""
    pos = 0
    white = True
    for t in tr:
        bits += _enc_run(t - pos, white)
        pos = t
        white = not white
        if pos >= cols:
            break
    return bits


def _g4_row(curr: list[int], ref: list[int], cols: int) -> str:
    bits = ""
    a0 = -1
    white = True
    while a0 < cols:
        i = 0 if white else 1
        while i < len(ref) and ref[i] <= a0:
            i += 2
        b1 = ref[i] if i < len(ref) else cols
        b2 = ref[i + 1] if i + 1 < len(ref) else cols
        j = 0
        while j < len(curr) and curr[j] <= a0:
            j += 1
        a1 = curr[j] if j < len(curr) else cols
        if b2 < a1:
            bits += "0001"  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bits += _V_BITS[a1 - b1]
            a0 = a1
            white = not white
        else:
            a2 = curr[j + 1] if j + 1 < len(curr) else cols
            start = a0 if a0 > 0 else 0
            bits += "001" + _enc_run(a1 - start, white) + _enc_run(
                a2 - a1, not white
            )
            a0 = a2
    return bits


def _pack(bits: str) -> bytes:
    pad = (-len(bits)) % 8
    bits += "0" * pad
    return bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )


def encode_g4(img: np.ndarray, eofb: bool = False,
              byte_align: bool = False) -> bytes:
    """img: (h, w) bool ink (True = black) → T.6 codestream."""
    bits = ""
    ref: list[int] = []
    for y in range(img.shape[0]):
        if byte_align and len(bits) % 8:
            bits += "0" * ((-len(bits)) % 8)
        curr = _transitions(img[y])
        bits += _g4_row(curr, ref, img.shape[1])
        ref = curr
    if eofb:
        bits += _EOL + _EOL
    return _pack(bits)


def encode_g3_mixed(img: np.ndarray, k: int = 4,
                    byte_align: bool = False, rtc: bool = True) -> bytes:
    """T.4 mixed 2-D (K>0): every line is EOL + tag bit; every k-th
    line is coded 1-D (tag 1), the rest 2-D against the previous line
    (tag 0).  ``rtc`` appends the end-of-page EOL pair."""
    bits = ""
    ref: list[int] = []
    for y in range(img.shape[0]):
        if byte_align and len(bits) % 8:
            bits += "0" * ((-len(bits)) % 8)
        bits += _EOL
        curr = _transitions(img[y])
        if y % k == 0:
            bits += "1" + _mh_row(img[y])
        else:
            bits += "0" + _g4_row(curr, ref, img.shape[1])
        ref = curr
    if rtc:
        bits += _EOL + _EOL
    return _pack(bits)


def encode_mh(img: np.ndarray, eols: bool = False,
              byte_align: bool = False) -> bytes:
    bits = ""
    for y in range(img.shape[0]):
        if byte_align and len(bits) % 8:
            bits += "0" * ((-len(bits)) % 8)
        if eols:
            bits += _EOL
        bits += _mh_row(img[y])
    return _pack(bits)


def _luma(img: np.ndarray) -> np.ndarray:
    """bool ink → the decoder's output contract (0 black, 255 white)."""
    return np.where(img, np.uint8(0), np.uint8(255))


def _random_doc(rng, h, w) -> np.ndarray:
    """Text-ish bitmap: sparse random rectangles + salt noise."""
    img = np.zeros((h, w), dtype=bool)
    for _ in range(rng.integers(2, 8)):
        y0 = int(rng.integers(0, h))
        x0 = int(rng.integers(0, w))
        img[y0 : y0 + int(rng.integers(1, h // 2 + 1)),
            x0 : x0 + int(rng.integers(1, w // 2 + 1))] = True
    noise = rng.random((h, w)) < 0.02
    return img ^ noise


# ---------------------------------------------------------------------------
# table structure
# ---------------------------------------------------------------------------

class TestTables:
    @pytest.mark.parametrize("codes,n_term,n_makeup", [
        (WHITE_CODES, 64, 27), (BLACK_CODES, 64, 27),
    ])
    def test_population_and_prefix_free(self, codes, n_term, n_makeup):
        full = {**codes, **EXT_CODES}
        runs = sorted(full.values())
        assert runs == (
            list(range(64)) + [64 * i for i in range(1, 41)]
        ), "every run 0-63 and every make-up multiple of 64 up to 2560"
        assert len(codes) == n_term + n_makeup
        keys = sorted(full, key=len)
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                assert not b.startswith(a), f"{a} prefixes {b}"
            # EOL must not collide with any run code either
            assert not a.startswith(_EOL) and not _EOL.startswith(a)

    def test_mode_codes_prefix_free(self):
        keys = sorted(MODE_CODES, key=len)
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                assert not b.startswith(a)

    def test_spec_vectors(self):
        # absolute encodings from the published T.4 tables
        assert WHITE_CODES["0111"] == 2 and WHITE_CODES["00110101"] == 0
        assert BLACK_CODES["11"] == 2 and BLACK_CODES["0000110111"] == 0
        assert WHITE_CODES["010011011"] == 1728
        assert BLACK_CODES["0000001100101"] == 1728
        assert EXT_CODES["000000011111"] == 2560


# ---------------------------------------------------------------------------
# hand-computed stream vectors (absolute bit layout end-to-end)
# ---------------------------------------------------------------------------

class TestVectors:
    def test_mh_all_white_1728_line(self):
        # one standard-width all-white line: make-up 1728 + term 0
        bits = "010011011" + "00110101"
        out = decode_ccitt(_pack(bits), columns=1728, rows=1, k=0)
        assert out.shape == (1, 1728) and (out == 255).all()

    def test_mh_black_3_white_5(self):
        # white 0, black 3, white 5: 00110101 + 10 + 1100
        out = decode_ccitt(
            _pack("00110101" + "10" + "1100"), columns=8, rows=1, k=0
        )
        np.testing.assert_array_equal(
            out[0], [0, 0, 0, 255, 255, 255, 255, 255]
        )

    def test_g4_first_line_horizontal(self):
        # 8 cols all black vs imaginary white ref: H + white0 + black8
        bits = "001" + "00110101" + "000101"
        out = decode_ccitt(_pack(bits), columns=8, rows=1, k=-1)
        assert (out == 0).all()

    def test_g4_vertical_chain(self):
        # row1: black run [2,5) via H(white2, black3) then V0 closing
        # the line at column 8 (b1 = columns on the imaginary white
        # ref); row2 identical via V0,V0,V0 tracking ref transitions
        # at 2, 5, 8
        bits = "001" + "0111" + "10" + "1" + "111"
        out = decode_ccitt(_pack(bits), columns=8, rows=2, k=-1)
        expect = np.full((2, 8), 255, np.uint8)
        expect[:, 2:5] = 0
        np.testing.assert_array_equal(out, expect)

    def test_g4_pass_mode(self):
        # ref row has ink [2,4); current row all white: the coder must
        # pass over the ref transitions then V0 on columns
        row1 = np.zeros(8, dtype=bool)
        row1[2:4] = True
        img = np.stack([row1, np.zeros(8, dtype=bool)])
        enc = encode_g4(img)
        # encoder must actually elect pass mode on row 2
        assert _g4_row([], [2, 4], 8).startswith("0001")
        out = decode_ccitt(enc, columns=8, rows=2, k=-1)
        np.testing.assert_array_equal(out, _luma(img))


# ---------------------------------------------------------------------------
# round-trip
# ---------------------------------------------------------------------------

class TestRoundTrip:
    @pytest.mark.parametrize("seed", range(6))
    def test_g4_random(self, seed):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 90))
        img = _random_doc(rng, h, w)
        out = decode_ccitt(encode_g4(img), columns=w, rows=h, k=-1)
        np.testing.assert_array_equal(out, _luma(img))

    @pytest.mark.parametrize("seed", range(6))
    def test_mh_random(self, seed):
        rng = np.random.default_rng(100 + seed)
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 90))
        img = _random_doc(rng, h, w)
        out = decode_ccitt(encode_mh(img), columns=w, rows=h, k=0)
        np.testing.assert_array_equal(out, _luma(img))

    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_g3_mixed_random(self, k):
        rng = np.random.default_rng(200 + k)
        h, w = int(rng.integers(2, 40)), int(rng.integers(2, 90))
        img = _random_doc(rng, h, w)
        out = decode_ccitt(
            encode_g3_mixed(img, k=k), columns=w, rows=h, k=k
        )
        np.testing.assert_array_equal(out, _luma(img))

    def test_g3_mixed_rows_inferred_from_rtc(self):
        rng = np.random.default_rng(210)
        img = _random_doc(rng, 19, 47)
        out = decode_ccitt(
            encode_g3_mixed(img, k=2, rtc=True), columns=47, rows=0, k=2
        )
        np.testing.assert_array_equal(out, _luma(img))

    def test_g3_mixed_byte_aligned(self):
        rng = np.random.default_rng(211)
        img = _random_doc(rng, 11, 37)
        out = decode_ccitt(
            encode_g3_mixed(img, k=4, byte_align=True),
            columns=37, rows=11, k=4, byte_align=True,
        )
        np.testing.assert_array_equal(out, _luma(img))

    def test_g4_rows_inferred_from_eofb(self):
        rng = np.random.default_rng(7)
        img = _random_doc(rng, 23, 61)
        out = decode_ccitt(
            encode_g4(img, eofb=True), columns=61, rows=0, k=-1
        )
        np.testing.assert_array_equal(out, _luma(img))

    def test_mh_with_eols_and_rows_inferred(self):
        rng = np.random.default_rng(8)
        img = _random_doc(rng, 17, 43)
        out = decode_ccitt(
            encode_mh(img, eols=True), columns=43, rows=0, k=0
        )
        np.testing.assert_array_equal(out, _luma(img))

    @pytest.mark.parametrize("k", [-1, 0])
    def test_byte_align(self, k):
        rng = np.random.default_rng(9)
        img = _random_doc(rng, 11, 29)
        enc = (encode_g4 if k < 0 else encode_mh)(img, byte_align=True)
        out = decode_ccitt(enc, columns=29, rows=11, k=k, byte_align=True)
        np.testing.assert_array_equal(out, _luma(img))

    def test_black_is_1_is_a_noop_for_luma(self):
        img = np.zeros((3, 9), dtype=bool)
        img[1, 3:7] = True
        enc = encode_g4(img)
        a = decode_ccitt(enc, columns=9, rows=3, k=-1, black_is_1=False)
        b = decode_ccitt(enc, columns=9, rows=3, k=-1, black_is_1=True)
        np.testing.assert_array_equal(a, b)

    def test_long_runs_chain_makeups(self):
        # one row, 6000 columns: white 2700, black 3300 — exercises the
        # extended make-up chain in both directions
        img = np.zeros((1, 6000), dtype=bool)
        img[0, 2700:] = True
        for k in (-1, 0):
            enc = (encode_g4 if k < 0 else encode_mh)(img)
            out = decode_ccitt(enc, columns=6000, rows=1, k=k)
            np.testing.assert_array_equal(out, _luma(img))

    def test_wide_receipt_sized_page(self):
        # 1728-wide (standard fax width) page with text-like bands
        rng = np.random.default_rng(10)
        img = _random_doc(rng, 64, 1728)
        out = decode_ccitt(encode_g4(img), columns=1728, rows=64, k=-1)
        np.testing.assert_array_equal(out, _luma(img))


# ---------------------------------------------------------------------------
# boundaries / hostile input
# ---------------------------------------------------------------------------

class TestBoundaries:
    def test_k_positive_truncated_raises(self):
        # a lone zero byte has no EOL and no first-line 1-D data
        with pytest.raises(ValueError):
            decode_ccitt(b"\x00", columns=8, rows=1, k=1)

    def test_bad_columns(self):
        with pytest.raises(ValueError):
            decode_ccitt(b"\x00", columns=0, rows=1, k=-1)

    def test_truncated_stream(self):
        img = np.zeros((4, 40), dtype=bool)
        img[:, 7:23] = True
        enc = encode_g4(img)
        with pytest.raises(ValueError):
            decode_ccitt(enc[: len(enc) // 2], columns=40, rows=4, k=-1)

    def test_empty_stream(self):
        with pytest.raises(ValueError):
            decode_ccitt(b"", columns=8, rows=0, k=-1)

    def test_bomb_guard_without_rows(self):
        # all-V0 stream (every byte 0xFF) fabricates one row per bit —
        # the pixel budget must stop it, not memory
        with pytest.raises(ValueError, match="bomb"):
            decode_ccitt(b"\xff" * 40_000, columns=100_000, rows=0, k=-1)

    def test_long_fill_before_eol(self):
        # T.4 §4.1.2: fill (zero bits) before an EOL may be ARBITRARILY
        # long.  r3 capped the scan at 75 bits, so a >64-bit fill made
        # the decoder consume a fill 0 as the EOL's terminating 1 and
        # corrupt row alignment (ADVICE r3) — pin the unbounded scan
        # with 100 fill bits before every EOL in a mixed-G3 stream.
        rng = np.random.default_rng(5)
        img = _random_doc(rng, 8, 48)
        bits = ""
        ref: list[int] = []
        for y in range(img.shape[0]):
            bits += "0" * 100 + _EOL  # heavy fill, then EOL
            curr = _transitions(img[y])
            if y % 4 == 0:
                bits += "1" + _mh_row(img[y])
            else:
                bits += "0" + _g4_row(curr, ref, img.shape[1])
            ref = curr
        bits += "0" * 100 + _EOL + "0" * 100 + _EOL  # RTC with fill too
        out = decode_ccitt(_pack(bits), columns=48, rows=8, k=4)
        assert np.array_equal(out, _luma(img))

    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.default_rng(11)
        img = _random_doc(rng, 16, 48)
        srcs = [encode_g4(img, eofb=True), encode_mh(img, eols=True)]
        for trial in range(400):
            data = bytearray(srcs[trial % 2])
            for _ in range(rng.integers(1, 4)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                out = decode_ccitt(
                    bytes(data), columns=48, rows=0, k=-1 if trial % 2 == 0 else 0
                )
                assert out.dtype == np.uint8 and out.ndim == 2
            except (ValueError, NotImplementedError):
                pass


# ---------------------------------------------------------------------------
# PDF integration: G4 codestream inside /CCITTFaxDecode, through the
# real OCR engine to a parsed total
# ---------------------------------------------------------------------------

def _ccitt_pdf(codestream: bytes, w: int, h: int, k: int = -1) -> bytes:
    parms = (
        b"<< /K " + str(k).encode() + b" /Columns " + str(w).encode()
        + b" /Rows " + str(h).encode() + b" >>"
    )
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Type /XObject /Subtype /Image /Width "
        + str(w).encode() + b" /Height " + str(h).encode()
        + b" /BitsPerComponent 1 /ColorSpace /DeviceGray"
        + b" /Filter /CCITTFaxDecode /DecodeParms " + parms
        + b" /Length " + str(len(codestream)).encode()
        + b" >>\nstream\n" + codestream + b"\nendstream\nendobj\n"
    )


class TestPdfIntegration:
    def test_image_array_extraction(self):
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays

        rng = np.random.default_rng(12)
        img = _random_doc(rng, 20, 50)
        pdf = _ccitt_pdf(encode_g4(img), 50, 20)
        pairs = extract_pdf_image_arrays(pdf)
        assert len(pairs) == 1
        px, err = pairs[0]
        assert err is None
        np.testing.assert_array_equal(px, _luma(img))

    def test_scanned_receipt_to_parsed_total(self):
        """G4-encoded receipt scan → process_pdf → real OCR → parser."""
        from receipt_scanner_spark.extract.ocr import ocr_pixels, render_text
        from receipt_scanner_spark.extract.pdf import process_pdf
        from receipt_scanner_spark.parsers.registry import parse_text

        page = render_text("ACME STORE\nTOTAL $12.34", scale=2)
        ink = page < 128
        pdf = _ccitt_pdf(encode_g4(ink), ink.shape[1], ink.shape[0])
        res = process_pdf(pdf, ocr_arrays=ocr_pixels)
        assert res.error is None
        assert "TOTAL $12.34" in res.text
        parsed = parse_text(res.text)
        assert parsed["amount"] == "12.34"

    def test_corrupt_codestream_is_error_value(self):
        from receipt_scanner_spark.extract.pdf import extract_pdf_image_arrays

        pdf = _ccitt_pdf(b"\x00\x01\x02\x03", 50, 20)
        pairs = extract_pdf_image_arrays(pdf)
        assert len(pairs) == 1
        px, err = pairs[0]
        assert px is None and err.startswith("CCITTFaxDecode:")
