"""PDF text-layer extraction — pure stdlib, byte-stream in, text out.

Reimplements the *semantics* of the reference PDF branch
(/root/reference/lib/pdf_processor.js:11-97) without its child
processes (pdftotext / pdfimages):

* pages joined with a single space  (pdf_processor.js:31)
* all-whitespace joined text gates the OCR fallback (pdf_processor.js:32-38)
* zero embedded images on that path → error 'No images found in PDF'
  (pdf_processor.js:61); OCR'd page texts joined with '\\n\\n\\n'
  (pdf_processor.js:76)
* errors are values (the job never fails on a bad document — D3).

Scope (honest limitations, documented): content streams are read in
file order (no page-tree walk), literal/hex string operands of
Tj/TJ/'/" are decoded, FlateDecode via zlib; encrypted or exotic PDFs
yield empty text and flow into the error path.  That covers the
deterministic synthetic corpus and simple real-world text-layer PDFs;
at web scale the OCR stage stays a pluggable stub (SURVEY.md §2.3 I11).

Designed for row-at-a-time use inside Arrow-batched pandas UDFs: bytes
stay in memory end-to-end (no temp files, unlike the reference's
tmp-spill at lib/processor.js:98-107).
"""

from __future__ import annotations

import re
import zlib
from typing import Callable, NamedTuple

# cap per-stream inflation (bomb guard; see extract_pdf_text)
_MAX_STREAM_DECOMPRESSED = 16 * 1024 * 1024

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")
_BLANK_RE = re.compile(r"^\s*$")

NO_IMAGES_ERROR = "No images found in PDF"
OCR_UNAVAILABLE_ERROR = "OCR not configured"


class PdfText(NamedTuple):
    pages: list[str]
    n_images: int


class PdfResult(NamedTuple):
    text: str | None
    error: str | None


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string body (between parens)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash escape
            nxt = raw[i + 1]
            i += 2
            if nxt in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[nxt])
            elif nxt in b"()\\":
                out.append(nxt)
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                oct_digits = [nxt]
                while i < n and len(oct_digits) < 3 and 0x30 <= raw[i] <= 0x37:
                    oct_digits.append(raw[i])
                    i += 1
                out.append(int(bytes(oct_digits), 8) & 0xFF)
            elif nxt in b"\r\n":  # line continuation
                if nxt == 0x0D and i < n and raw[i] == 0x0A:
                    i += 1
            else:
                out.append(nxt)
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)"  # literal string
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>"  # hex string
    rb"|(?P<op>BT|ET|TJ|Tj|T\*|Td|TD|Tm|')"
    rb"|(?P<quote>\")"
)


def _extract_stream_text(data: bytes) -> str:
    """Pull text shown by Tj/TJ/'/\" operators, newline on Td/TD/T*/Tm row moves."""
    parts: list[str] = []
    pending: list[str] = []
    in_text = False
    for m in _TOKEN_RE.finditer(data):
        if m.group("op") is not None or m.group("quote") is not None:
            op = m.group("op") or m.group("quote")
            if op == b"BT":
                in_text = True
            elif op == b"ET":
                in_text = False
            elif op in (b"Tj", b"TJ", b"'", b'"') and in_text and pending:
                parts.append("".join(pending))
                pending.clear()
                if op in (b"'", b'"'):
                    parts.append("\n")
            elif op in (b"T*", b"Td", b"TD", b"Tm") and in_text:
                if parts and not parts[-1].endswith("\n"):
                    parts.append("\n")
            continue
        if not in_text:
            pending.clear()
            continue
        if m.group("lit") is not None:
            pending.append(_decode_pdf_string(m.group("lit")))
        elif m.group("hex") is not None:
            h = re.sub(rb"\s+", b"", m.group("hex"))
            if len(h) % 2:
                h += b"0"
            pending.append(bytes.fromhex(h.decode("ascii")).decode("latin-1"))
    if pending:
        parts.append("".join(pending))
    return "".join(parts).strip("\n")


def _iter_streams(pdf_bytes: bytes):
    """Yield ``(header_dict_bytes, raw_body)`` for every stream in file
    order.  Honors /Length when explicit; otherwise strips at most ONE
    EOL before 'endstream' (PDF spec) — never rstrips blindly, stream
    bytes may legitimately end in 0x0A."""
    pos = 0
    while True:
        m = _STREAM_RE.search(pdf_bytes, pos)
        if not m:
            return
        start = m.end()
        end = pdf_bytes.find(b"endstream", start)
        if end == -1:
            return
        pos = end + len(b"endstream")
        lm = re.search(rb"/Length\s+(\d+)", m.group(1))
        if lm:
            body = pdf_bytes[start : start + int(lm.group(1))]
        else:
            body = pdf_bytes[start:end]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n") or body.endswith(b"\r"):
                body = body[:-1]
        yield m.group(1), body


def _inflate_guarded(body: bytes) -> bytes | None:
    """FlateDecode with the bomb + truncation guards; None → skip.

    * decompression-bomb guard: a ~100 KB crafted stream can expand to
      gigabytes and OOM an executor task at web scale; real text-layer
      content streams are far below the 16 MB cap.
    * Over-cap (unconsumed_tail set) OR truncated/corrupt (stream didn't
      reach its zlib EOF marker — decompressobj returns partial bytes
      without raising, unlike zlib.decompress) are both skipped; partial
      garbage must never enter the extraction output.
    """
    try:
        d = zlib.decompressobj()
        out = d.decompress(body, _MAX_STREAM_DECOMPRESSED)
        if d.unconsumed_tail or not d.eof:
            return None
        return out
    except zlib.error:
        return None


def extract_pdf_text(pdf_bytes: bytes) -> PdfText:
    """Scan all streams; every text-bearing content stream is one 'page'
    (file order).  Counts embedded /Image XObjects for the OCR gate."""
    pages: list[str] = []
    n_images = len(_IMAGE_RE.findall(pdf_bytes))
    for header, body in _iter_streams(pdf_bytes):
        if b"/FlateDecode" in header:
            inflated = _inflate_guarded(body)
            if inflated is None:
                continue
            body = inflated
        if b"/Image" in header:
            continue
        if b"BT" not in body:
            continue
        text = _extract_stream_text(body)
        if text or b"BT" in body:
            pages.append(text)
    return PdfText(pages=pages, n_images=n_images)


def extract_pdf_images(pdf_bytes: bytes) -> list[bytes]:
    """Materialize embedded ``/Subtype /Image`` XObject stream bytes in
    file order — the ``pdfimages`` analog (lib/pdf_processor.js:86-97),
    feeding the per-image OCR fan-out.  FlateDecode streams are inflated
    to raw pixel bytes (same bomb/truncation guards as the text path);
    DCTDecode (JPEG) and other codec filters pass through as their codec
    bytes.  Corrupt/over-cap streams are skipped (error-as-value: the
    document survives with fewer images)."""
    images: list[bytes] = []
    for header, body in _iter_streams(pdf_bytes):
        if not _IMAGE_RE.search(header):
            continue
        if b"/FlateDecode" in header:
            inflated = _inflate_guarded(body)
            if inflated is None:
                continue
            body = inflated
        images.append(body)
    return images


_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_CS_RE = re.compile(rb"/ColorSpace\s*/(Device(?:RGB|Gray))")


def extract_pdf_image_arrays(pdf_bytes: bytes) -> list[tuple]:
    """Decode embedded /Image XObjects to REAL (h, w) uint8 luma arrays
    where the sample format allows it (r3): FlateDecode raster streams
    with /BitsPerComponent 8 and /DeviceRGB or /DeviceGray reshape
    directly from their inflated samples; DCTDecode bodies are JPEG
    codestreams decoded for real by extract/jpeg.py (baseline
    sequential; non-baseline variants are error-as-value).  Returns one
    ``(pixels, error)`` pair per image in file order, exactly one of
    the two non-None — the same error-as-value idiom as the text path.
    This is what an OCR engine plugged into ``process_pdf`` would
    consume after its own decode; with these arrays the plug can skip
    that step for raster PDFs entirely."""
    import numpy as np

    out: list[tuple] = []
    for header, body in _iter_streams(pdf_bytes):
        if not _IMAGE_RE.search(header):
            continue
        if b"/DCTDecode" in header:
            # body is a JPEG codestream — real baseline decode (r3)
            from .jpeg import decode_jpeg

            try:
                out.append((decode_jpeg(body), None))
            except (ValueError, NotImplementedError) as e:
                out.append((None, f"DCTDecode: {e}"))
            continue
        if b"/FlateDecode" in header:
            inflated = _inflate_guarded(body)
            if inflated is None:
                out.append((None, "corrupt FlateDecode image stream"))
                continue
            body = inflated
        w_m, h_m, bpc_m, cs_m = (
            _WIDTH_RE.search(header), _HEIGHT_RE.search(header),
            _BPC_RE.search(header), _CS_RE.search(header),
        )
        if not (w_m and h_m):
            out.append((None, "image missing /Width or /Height"))
            continue
        w, h = int(w_m.group(1)), int(h_m.group(1))
        bpc = int(bpc_m.group(1)) if bpc_m else 8
        cs = cs_m.group(1).decode() if cs_m else "DeviceGray"
        if bpc != 8:
            out.append((None, f"{bpc}-bit samples not supported"))
            continue
        nch = 3 if cs == "DeviceRGB" else 1
        if w <= 0 or h <= 0 or len(body) < w * h * nch:
            out.append((None, "image samples truncated"))
            continue
        px = np.frombuffer(body[: w * h * nch], dtype=np.uint8).reshape(h, w, nch)
        if nch == 3:
            r = px[:, :, 0].astype(np.uint32)
            g = px[:, :, 1].astype(np.uint32)
            b = px[:, :, 2].astype(np.uint32)
            luma = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        else:
            luma = px[:, :, 0]
        out.append((luma, None))
    return out


def process_pdf(
    pdf_bytes: bytes,
    ocr: Callable[[bytes], str] | None = None,
    ocr_arrays: Callable | None = None,
) -> PdfResult:
    """Full PDF branch with the reference's blank-text/OCR-fallback gates.

    ``ocr`` (pluggable, off by default at web scale) maps ONE decoded
    embedded image's bytes to its text — the ImageProcessor-per-image
    analog.  On a blank text layer the embedded /Image XObject streams
    are materialized in file order (extract_pdf_images, the pdfimages
    analog) and fanned out to ``ocr`` one by one; results join with
    '\\n\\n\\n' in image order (lib/pdf_processor.js:53-84).  Any image
    OCR failure fails the document (error-as-value), matching the
    reference's first-error callback (pdf_processor.js:69-72).

    ``ocr_arrays`` (takes priority when both are given) maps ONE real
    decoded (h, w) uint8 luma array to its text — the contract for
    engines that want pixels, not stream bytes (e.g. the built-in
    extract/ocr.ocr_pixels recognizer).  Images are decoded by
    extract_pdf_image_arrays; a per-image decode error fails the
    document with that error (same first-error semantics).
    """
    if not pdf_bytes.startswith(b"%PDF-"):
        return PdfResult(None, "Unsupported format: application/octet-stream")
    try:
        extracted = extract_pdf_text(pdf_bytes)
    except Exception as exc:  # never fail the row
        return PdfResult(None, f"PDF parse error: {type(exc).__name__}")
    text = " ".join(extracted.pages)
    if not _BLANK_RE.match(text):
        return PdfResult(text, None)
    # Blank text layer → OCR fallback (pdf_processor.js:32-38,53-84).
    if ocr_arrays is not None:
        try:
            pairs = extract_pdf_image_arrays(pdf_bytes)
        except Exception as exc:
            return PdfResult(None, f"PDF parse error: {type(exc).__name__}")
        if not pairs:
            return PdfResult(None, NO_IMAGES_ERROR)
        ocr_pages = []
        for px, img_err in pairs:
            if img_err is not None:
                # first-error callback semantics (pdf_processor.js:69-72)
                return PdfResult(None, f"OCR error: {img_err}")
            try:
                ocr_pages.append(ocr_arrays(px))
            except Exception as exc:
                return PdfResult(None, f"OCR error: {type(exc).__name__}")
        return PdfResult("\n\n\n".join(ocr_pages), None)
    try:
        images = extract_pdf_images(pdf_bytes)
    except Exception as exc:
        return PdfResult(None, f"PDF parse error: {type(exc).__name__}")
    if not images:
        # pdfimages produced nothing → the reference's exact error value
        # (pdf_processor.js:61); also covers all-corrupt image streams.
        return PdfResult(None, NO_IMAGES_ERROR)
    if ocr is None:
        return PdfResult(None, OCR_UNAVAILABLE_ERROR)
    try:
        ocr_pages = [ocr(img) for img in images]
    except Exception as exc:
        return PdfResult(None, f"OCR error: {type(exc).__name__}")
    return PdfResult("\n\n\n".join(ocr_pages), None)
