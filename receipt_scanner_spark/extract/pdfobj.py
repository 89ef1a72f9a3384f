"""PDF object model: xref, indirect objects, object streams, page tree.

Upgrades text extraction from file-order stream scanning to TRUE page
order — the ordering `pdftotext` (the reference's text path,
lib/pdf_processor.js:24-38) produces.  ``page_content_streams`` walks
trailer → /Root → /Pages → /Kids and returns each page's decoded
content stream(s) in tree order; ``extract_pdf_text`` uses it when the
file carries an xref, falling back to the legacy scan on ANY parse
failure (error-as-value: a malformed page tree must never lose the
text a plain scan would find).

Supports the three cross-reference generations: classic ``xref``
tables (with /Prev chains and incremental updates — first-seen entry
wins), PDF 1.5 cross-reference streams (/Type /XRef, /W field widths,
/Index subsections, Flate+predictor via the shared filter chain), and
compressed objects in object streams (/Type /ObjStm).  Encrypted PDFs
(/Encrypt in the trailer) are rejected → legacy scan → error path.

Everything is bounded: object count, page count, recursion depth, and
the shared 16 MB stream cap, so hostile files degrade to typed errors
rather than hangs (same adversarial posture as extract/html_fast.py).
"""

from __future__ import annotations

import re
from typing import NamedTuple

_MAX_OBJECTS = 100_000
_MAX_PAGES = 50_000
_MAX_DEPTH = 50

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref(NamedTuple):
    num: int
    gen: int


class Name(str):
    """A /Name — distinct from a text string in dict values."""


class _Lexer:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.n = len(data)

    def skip_ws(self) -> None:
        d, n = self.data, self.n
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                j = d.find(b"\n", self.pos)
                j2 = d.find(b"\r", self.pos)
                if j == -1 or (0 <= j2 < j):
                    j = j2
                self.pos = n if j == -1 else j + 1
            else:
                return

    def peek(self) -> int:
        return self.data[self.pos] if self.pos < self.n else -1

    def starts(self, tok: bytes) -> bool:
        return self.data.startswith(tok, self.pos)


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KEYWORD_RE = re.compile(rb"[A-Za-z]+")


def _parse_name(lx: _Lexer) -> Name:
    d, n = lx.data, lx.n
    lx.pos += 1  # the '/'
    start = lx.pos
    out = bytearray()
    while lx.pos < n:
        c = d[lx.pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and lx.pos + 2 < n:  # #xx hex escape
            try:
                out += bytes([int(d[lx.pos + 1 : lx.pos + 3], 16)])
                lx.pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        lx.pos += 1
    del start
    return Name(out.decode("latin-1"))


def _parse_literal_string(lx: _Lexer) -> bytes:
    d, n = lx.data, lx.n
    lx.pos += 1  # the '('
    out = bytearray()
    depth = 1
    while lx.pos < n:
        c = d[lx.pos]
        if c == 0x5C and lx.pos + 1 < n:  # backslash
            nxt = d[lx.pos + 1]
            lx.pos += 2
            if nxt in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[nxt])
            elif 0x30 <= nxt <= 0x37:
                oct_digits = bytes([nxt])
                while (
                    len(oct_digits) < 3
                    and lx.pos < n
                    and 0x30 <= d[lx.pos] <= 0x37
                ):
                    oct_digits += bytes([d[lx.pos]])
                    lx.pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif nxt in b"\r\n":  # line continuation
                if nxt == 0x0D and lx.pos < n and d[lx.pos] == 0x0A:
                    lx.pos += 1
            else:
                out.append(nxt)
        elif c == 0x28:
            depth += 1
            out.append(c)
            lx.pos += 1
        elif c == 0x29:
            depth -= 1
            lx.pos += 1
            if depth == 0:
                return bytes(out)
            out.append(c)
        else:
            out.append(c)
            lx.pos += 1
    raise ValueError("unterminated PDF string")


def _parse_hex_string(lx: _Lexer) -> bytes:
    end = lx.data.find(b">", lx.pos + 1)
    if end == -1:
        raise ValueError("unterminated hex string")
    h = re.sub(rb"[^0-9A-Fa-f]", b"", lx.data[lx.pos + 1 : end])
    lx.pos = end + 1
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def parse_value(lx: _Lexer, depth: int = 0):
    """One PDF object value at the cursor (after skip_ws)."""
    if depth > _MAX_DEPTH:
        raise ValueError("PDF value nesting too deep")
    lx.skip_ws()
    c = lx.peek()
    if c == -1:
        raise ValueError("unexpected end of PDF data")
    if lx.starts(b"<<"):
        lx.pos += 2
        d: dict = {}
        while True:
            lx.skip_ws()
            if lx.starts(b">>"):
                lx.pos += 2
                return d
            if lx.peek() != 0x2F:
                raise ValueError("PDF dict key is not a name")
            key = _parse_name(lx)
            d[str(key)] = parse_value(lx, depth + 1)
    if c == 0x5B:  # [
        lx.pos += 1
        arr = []
        while True:
            lx.skip_ws()
            if lx.peek() == 0x5D:
                lx.pos += 1
                return arr
            arr.append(parse_value(lx, depth + 1))
            if len(arr) > 1_000_000:
                raise ValueError("PDF array too long")
    if c == 0x2F:
        return _parse_name(lx)
    if c == 0x28:
        return _parse_literal_string(lx)
    if c == 0x3C:  # '<' but not '<<'
        return _parse_hex_string(lx)
    m = _NUM_RE.match(lx.data, lx.pos)
    if m and m.start() == lx.pos:
        tok = m.group()
        # lookahead for "N G R" indirect reference
        if b"." not in tok:
            after = _Lexer(lx.data, m.end())
            after.skip_ws()
            m2 = _NUM_RE.match(after.data, after.pos)
            if m2 and b"." not in m2.group():
                after2 = _Lexer(lx.data, m2.end())
                after2.skip_ws()
                if (
                    after2.peek() == 0x52  # 'R'
                    and not _KEYWORD_RE.match(lx.data, after2.pos + 1)
                ):
                    lx.pos = after2.pos + 1
                    return Ref(int(tok), int(m2.group()))
        lx.pos = m.end()
        return float(tok) if b"." in tok else int(tok)
    kw = _KEYWORD_RE.match(lx.data, lx.pos)
    if kw:
        word = kw.group()
        lx.pos = kw.end()
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        raise ValueError(f"unexpected PDF keyword {word!r}")
    raise ValueError(f"unparseable PDF value at byte {lx.pos}")


def _synth_header(d: dict, doc: "PdfDocument | None" = None) -> bytes:
    """Serialize /Filter + decode parameters from a parsed stream dict
    into the byte-header shape ``decode_stream`` consumes (keeps ONE
    filter-chain implementation — extract/pdf.py's)."""
    parts = []
    filt = d.get("Filter")
    if doc is not None:
        filt = doc.resolve(filt)
    if filt is not None:
        names = filt if isinstance(filt, list) else [filt]
        parts.append(
            b"/Filter ["
            + b" ".join(b"/" + str(nm).encode("latin-1") for nm in names)
            + b"]"
        )
    parms = d.get("DecodeParms", d.get("DP"))
    if doc is not None:
        parms = doc.resolve(parms)
    plist = parms if isinstance(parms, list) else [parms]
    for p in plist:
        if doc is not None:
            p = doc.resolve(p)
        if not isinstance(p, dict):
            continue
        for k, v in p.items():
            if isinstance(v, bool):
                parts.append(
                    b"/%s %s" % (k.encode("latin-1"), b"true" if v else b"false")
                )
            elif isinstance(v, int):
                parts.append(b"/%s %d" % (k.encode("latin-1"), v))
    return b"<< " + b" ".join(parts) + b" >>"


class PdfDocument:
    """Random-access reader over xref + indirect objects."""

    def __init__(self, data: bytes):
        self.data = data
        self.entries: dict[int, tuple] = {}  # num -> (1,off) | (2,stm,idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._decryptor = None
        self._load_xref()
        if "Encrypt" in self.trailer:
            # RC4 Standard handler with an EMPTY user password (the
            # owner-password-only protection conforming readers open
            # silently).  Anything else → ValueError → legacy-scan
            # fallback / error path.  The Encrypt dict's own strings
            # are never encrypted (§7.6.2), so resolving it first is
            # sound.
            from .pdfcrypt import build_decryptor

            enc = self.resolve(self.trailer.get("Encrypt"))
            ids = self.trailer.get("ID")
            id0 = ids[0] if isinstance(ids, list) and ids else b""
            if not isinstance(enc, dict) or not isinstance(id0, bytes):
                raise ValueError("malformed PDF encryption")
            try:
                self._decryptor = build_decryptor(enc, id0)
            except NotImplementedError as e:
                raise ValueError(f"unsupported PDF encryption: {e}")

    # -- xref ----------------------------------------------------------

    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("no startxref")
        offset = int(m.group(1))
        seen = set()
        while offset and offset not in seen and len(seen) < 64:
            seen.add(offset)
            offset = self._load_xref_section(offset)

    def _load_xref_section(self, offset: int) -> int:
        """Parse one xref (table or stream) at ``offset``; returns the
        /Prev offset or 0."""
        if offset < 0 or offset >= len(self.data):
            raise ValueError("xref offset out of range")
        lx = _Lexer(self.data, offset)
        lx.skip_ws()
        if lx.starts(b"xref"):
            return self._load_xref_table(lx)
        # else: cross-reference stream object (never encrypted)
        num, d, stream = self._parse_indirect_at(
            offset, resolve_length=False, decrypt=False
        )
        if not isinstance(d, dict) or stream is None:
            raise ValueError("bad xref stream object")
        from .pdf import decode_stream

        body, codec = decode_stream(_synth_header(d), stream)
        if body is None or codec is not None:
            raise ValueError("undecodable xref stream")
        w = d.get("W")
        if not (isinstance(w, list) and len(w) == 3):
            raise ValueError("xref stream missing /W")
        a, b, c = (int(x) for x in w)
        size = int(d.get("Size", 0))
        index = d.get("Index", [0, size])
        rec = a + b + c
        if rec <= 0 or len(index) % 2:
            raise ValueError("bad xref stream geometry")
        pos = 0
        for i in range(0, len(index), 2):
            start, count = int(index[i]), int(index[i + 1])
            if count < 0 or count > _MAX_OBJECTS:
                raise ValueError("xref stream subsection too large")
            for j in range(count):
                row = body[pos : pos + rec]
                pos += rec
                if len(row) < rec:
                    raise ValueError("xref stream data short")
                typ = int.from_bytes(row[:a], "big") if a else 1
                f2 = int.from_bytes(row[a : a + b], "big")
                f3 = int.from_bytes(row[a + b :], "big") if c else 0
                objn = start + j
                if objn in self.entries:
                    continue  # first (newest) xref wins
                if typ == 1:
                    self.entries[objn] = (1, f2)
                elif typ == 2:
                    self.entries[objn] = (2, f2, f3)
        for k, v in d.items():
            self.trailer.setdefault(k, v)
        return int(d.get("Prev", 0) or 0)

    def _load_xref_table(self, lx: _Lexer) -> int:
        lx.pos += 4  # 'xref'
        while True:
            lx.skip_ws()
            if lx.starts(b"trailer"):
                lx.pos += 7
                t = parse_value(lx)
                if not isinstance(t, dict):
                    raise ValueError("bad trailer dict")
                for k, v in t.items():
                    self.trailer.setdefault(k, v)
                # hybrid-reference files (PDF 32000-1 §7.5.8.4): the
                # classic trailer points at an xref STREAM holding the
                # entries hidden from table-only readers; load it before
                # /Prev (first-seen still wins, so order is: this table,
                # its /XRefStm section, then the /Prev chain)
                xstm = int(t.get("XRefStm", 0) or 0)
                if xstm:
                    try:
                        self._load_xref_section(xstm)
                    except ValueError:
                        pass  # broken hybrid pointer: keep table entries
                return int(t.get("Prev", 0) or 0)
            m = re.match(rb"(\d+)\s+(\d+)", lx.data[lx.pos : lx.pos + 40])
            if not m:
                raise ValueError("bad xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            lx.pos += m.end()
            if count > _MAX_OBJECTS:
                raise ValueError("xref subsection too large")
            for j in range(count):
                lx.skip_ws()
                row = self.data[lx.pos : lx.pos + 18]
                m2 = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", row)
                if not m2:
                    raise ValueError("bad xref entry")
                lx.pos += m2.end()
                objn = start + j
                if m2.group(3) == b"n" and objn not in self.entries:
                    self.entries[objn] = (1, int(m2.group(1)))

    # -- objects -------------------------------------------------------

    def _parse_indirect_at(
        self, offset: int, resolve_length: bool = True, decrypt: bool = True
    ):
        lx = _Lexer(self.data, offset)
        lx.skip_ws()
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", self.data[lx.pos : lx.pos + 40])
        if not m:
            raise ValueError("no 'N G obj' at xref offset")
        num = int(m.group(1))
        gen = int(m.group(2))
        lx.pos += m.end()
        val = parse_value(lx)
        lx.skip_ws()
        stream = None
        if lx.starts(b"stream"):
            if not isinstance(val, dict):
                raise ValueError("stream without dict")
            p = lx.pos + 6
            if self.data.startswith(b"\r\n", p):
                p += 2
            elif self.data.startswith(b"\n", p) or self.data.startswith(b"\r", p):
                p += 1
            length = val.get("Length")
            if isinstance(length, Ref) and resolve_length:
                length = self.resolve(length)
            if isinstance(length, int) and 0 <= length <= len(self.data) - p:
                stream = self.data[p : p + length]
            else:
                end = self.data.find(b"endstream", p)
                if end == -1:
                    raise ValueError("unterminated stream")
                stream = self.data[p:end].rstrip(b"\r\n")
            if decrypt and self._decryptor is not None:
                # XRef streams are never encrypted (§7.5.8.2); they're
                # parsed with decrypt=False during _load_xref.  String
                # values stay undecrypted (documented: text rides in
                # streams, not dict strings, on every path we extract).
                stream = self._decryptor.decrypt(stream, num, gen)
        return num, val, stream

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if len(self._cache) > _MAX_OBJECTS:
            raise ValueError("too many PDF objects")
        entry = self.entries.get(num)
        if entry is None:
            self._cache[num] = None
            return None
        if entry[0] == 1:
            got_num, val, stream = self._parse_indirect_at(entry[1])
            if got_num != num:
                raise ValueError("xref offset points at wrong object")
            obj = (val, stream) if stream is not None else val
        else:
            _, stm_num, idx = entry
            obj = self._objstm_object(stm_num, idx)
        self._cache[num] = obj
        return obj

    def _objstm_object(self, stm_num: int, idx):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            got = self.get(stm_num)
            if not (isinstance(got, tuple) and isinstance(got[0], dict)):
                raise ValueError("object stream is not a stream")
            d, raw = got
            if str(d.get("Type")) != "ObjStm":
                raise ValueError("type-2 entry into a non-ObjStm")
            from .pdf import decode_stream

            body, codec = decode_stream(_synth_header(d, self), raw)
            if body is None or codec is not None:
                raise ValueError("undecodable object stream")
            n = int(self.resolve(d.get("N", 0)) or 0)
            first = int(self.resolve(d.get("First", 0)) or 0)
            if n <= 0 or n > _MAX_OBJECTS:
                raise ValueError("bad ObjStm /N")
            head = body[:first].split()
            if len(head) < 2 * n:
                raise ValueError("short ObjStm header")
            objs = []
            for i in range(n):
                off = int(head[2 * i + 1])
                lx = _Lexer(body, first + off)
                objs.append(parse_value(lx))
            self._objstm_cache[stm_num] = objs
        if idx is None or not (0 <= idx < len(objs)):
            raise ValueError("ObjStm index out of range")
        return objs[idx]

    def resolve(self, v, _depth: int = 0):
        while isinstance(v, Ref):
            if _depth > _MAX_DEPTH:
                raise ValueError("reference chain too deep")
            got = self.get(v.num)
            v = got[0] if isinstance(got, tuple) else got
            _depth += 1
        return v

    # -- page tree -----------------------------------------------------

    def page_nodes(self) -> list[dict]:
        """Leaf /Page dicts in tree order.  /Resources is inheritable
        (PDF 32000-1 table 30): a leaf missing it gets the nearest
        ancestor's, stored under the same key."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("no document catalog")
        pages: list[dict] = []
        visited: set[int] = set()

        def walk(node_ref, depth, inherited_res):
            if depth > _MAX_DEPTH or len(pages) > _MAX_PAGES:
                raise ValueError("page tree too large")
            if isinstance(node_ref, Ref):
                if node_ref.num in visited:
                    return  # cycle guard
                visited.add(node_ref.num)
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            res = node.get("Resources", inherited_res)
            typ = str(node.get("Type", ""))
            if typ == "Page":
                if "Resources" not in node and res is not None:
                    node = {**node, "Resources": res}
                pages.append(node)
                return
            kids = self.resolve(node.get("Kids"))
            if isinstance(kids, list):
                for kid in kids:
                    walk(kid, depth + 1, res)

        walk(root.get("Pages"), 0, None)
        return pages

    def content_stream(self, page: dict) -> bytes:
        """A page's decoded content, /Contents arrays joined with \\n."""
        from .pdf import decode_stream

        contents = page.get("Contents")
        if isinstance(contents, Ref):
            # /Contents may be an indirect reference TO AN ARRAY of
            # stream refs (PDF 32000-1 §7.7.3.3) — resolve to see which;
            # resolve() on a stream ref yields its dict, not a list, so
            # single-stream pages keep the direct-ref path below.
            target = self.resolve(contents)
            if isinstance(target, list):
                contents = target
        refs = contents if isinstance(contents, list) else [contents]
        bodies = []
        for r in refs:
            got = self.get(r.num) if isinstance(r, Ref) else None
            if not (isinstance(got, tuple) and isinstance(got[0], dict)):
                continue
            d, raw = got
            body, codec = decode_stream(_synth_header(d, self), raw)
            if body is not None and codec is None:
                bodies.append(body)
        return b"\n".join(bodies)

    def form_segments(
        self, resources, content: bytes, depth: int = 0
    ) -> list[tuple[bytes, dict]]:
        """Decoded (body, fonts) for every /Form XObject the content
        actually draws (``/Name Do``) — some generators emit ALL page
        text through Forms, which pdftotext renders.  Recurses into
        nested forms (bounded), each segment carrying its OWN resource
        fonts (falling back to the parent's)."""
        if depth >= 3:
            return []
        from .pdf import decode_stream

        res = self.resolve(resources)
        if not isinstance(res, dict):
            return []
        xobjs = self.resolve(res.get("XObject"))
        if not isinstance(xobjs, dict):
            return []
        segs: list[tuple[bytes, dict]] = []
        for name, ref in xobjs.items():
            if not re.search(
                rb"/" + re.escape(name.encode("latin-1")) + rb"\s+Do\b",
                content,
            ):
                continue
            got = self.get(ref.num) if isinstance(ref, Ref) else None
            if not (isinstance(got, tuple) and isinstance(got[0], dict)):
                continue
            d, raw = got
            if str(self.resolve(d.get("Subtype", ""))) != "Form":
                continue
            body, codec = decode_stream(_synth_header(d, self), raw)
            if body is None or codec is not None:
                continue
            form_res = d.get("Resources", resources)
            fonts = page_fonts(self, {"Resources": form_res})
            segs.append((body, fonts))
            segs.extend(self.form_segments(form_res, body, depth + 1))
        return segs


# ---------------------------------------------------------------------------
# Font text decoding: /ToUnicode CMaps, /Encoding, /Differences.
# Real-world generators (wkhtmltopdf, Chrome print-to-PDF, ReportLab)
# embed subset fonts whose string bytes are GLYPH CODES, not latin-1;
# pdftotext recovers text through exactly these structures.
# ---------------------------------------------------------------------------

_HEX_TOK = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_BFRANGE_ROW = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])"
)

# glyph-name → char: the AGL subset receipts actually use (letters,
# digits, punctuation, currency)
_GLYPH_CHARS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "underscore": "_",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "euro": "€", "Euro": "€", "sterling": "£",
    "yen": "¥", "cent": "¢", "bullet": "•",
    "endash": "–", "emdash": "—", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”",
    **{d: str(i) for i, d in enumerate(
        ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine"])},
    **{c: c for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"},
}


def _glyph_to_char(name: str) -> str:
    if name in _GLYPH_CHARS:
        return _GLYPH_CHARS[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            pass
    return ""


class FontDecoder:
    """Maps one font's string bytes to text.

    Priority (what pdftotext does): /ToUnicode CMap when present, else
    the simple /Encoding base (WinAnsi / MacRoman / latin-1) patched by
    /Differences.  CMap code width comes from the bf* source tokens
    (1 or 2 bytes; Type0/Identity-H fonts are 2)."""

    __slots__ = ("cmap", "width", "base", "diffs")

    def __init__(self, cmap=None, width=1, base="latin-1", diffs=None):
        self.cmap = cmap
        self.width = width
        self.base = base
        self.diffs = diffs or {}

    def decode(self, raw: bytes) -> str:
        if self.cmap is not None:
            w = self.width
            out = []
            for i in range(0, len(raw) - (len(raw) % w or 0), w):
                code = int.from_bytes(raw[i : i + w], "big")
                got = self.cmap.get(code)
                out.append(got if got is not None else "")
            return "".join(out)
        if self.diffs:
            return "".join(
                self.diffs.get(b) or bytes([b]).decode(self.base, "replace")
                for b in raw
            )
        return raw.decode(self.base, "replace")


def parse_tounicode(body: bytes) -> tuple[dict[int, str], int]:
    """CMap stream → ({code: text}, code byte width)."""
    cmap: dict[int, str] = {}
    width = 1

    def dst_text(hexs: bytes) -> str:
        b = bytes.fromhex(hexs.decode("ascii"))
        return b.decode("utf-16-be", "ignore")

    for section in _BFCHAR_RE.findall(body):
        toks = _HEX_TOK.findall(section)
        for i in range(0, len(toks) - 1, 2):
            src, dst = toks[i], toks[i + 1]
            width = max(width, len(src) // 2)
            cmap[int(src, 16)] = dst_text(dst)
    for section in _BFRANGE_RE.findall(body):
        for lo_h, hi_h, dst in _BFRANGE_ROW.findall(section):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            width = max(width, len(lo_h) // 2)
            if hi - lo > 65535:
                continue  # hostile range
            if dst.startswith(b"["):
                dsts = _HEX_TOK.findall(dst)
                for off, d in enumerate(dsts[: hi - lo + 1]):
                    cmap[lo + off] = dst_text(d)
            else:
                base = dst_text(dst[1:-1])
                if not base:
                    continue
                base_cp = ord(base[-1])
                prefix = base[:-1]
                for off in range(hi - lo + 1):
                    cmap[lo + off] = prefix + chr(base_cp + off)
    return cmap, width


_BASE_ENCODINGS = {
    "WinAnsiEncoding": "cp1252",
    "MacRomanEncoding": "mac_roman",
    "StandardEncoding": "latin-1",
}


def font_decoder(doc: "PdfDocument", font: dict) -> FontDecoder:
    """Build a FontDecoder for a parsed /Font dict."""
    tu = font.get("ToUnicode")
    if tu is not None:
        got = doc.get(tu.num) if isinstance(tu, Ref) else None
        if isinstance(got, tuple) and isinstance(got[0], dict):
            from .pdf import decode_stream

            body, codec = decode_stream(_synth_header(got[0], doc), got[1])
            if body is not None and codec is None:
                cmap, width = parse_tounicode(body)
                if cmap:
                    return FontDecoder(cmap=cmap, width=width)
    enc = doc.resolve(font.get("Encoding"))
    base = "latin-1"
    diffs: dict[int, str] = {}
    if isinstance(enc, str):  # a Name
        base = _BASE_ENCODINGS.get(str(enc), "latin-1")
    elif isinstance(enc, dict):
        base = _BASE_ENCODINGS.get(str(enc.get("BaseEncoding", "")), "latin-1")
        darr = doc.resolve(enc.get("Differences"))
        if isinstance(darr, list):
            code = 0
            for item in darr:
                if isinstance(item, int):
                    code = item
                elif isinstance(item, str):
                    diffs[code] = _glyph_to_char(str(item))
                    code += 1
    return FontDecoder(base=base, diffs=diffs)


def page_fonts(doc: "PdfDocument", page: dict) -> dict[str, FontDecoder]:
    """{resource name: FontDecoder} for a page's /Resources /Font."""
    try:
        res = doc.resolve(page.get("Resources"))
        if not isinstance(res, dict):
            return {}
        fonts = doc.resolve(res.get("Font"))
        if not isinstance(fonts, dict):
            return {}
        out = {}
        for name, fref in fonts.items():
            f = doc.resolve(fref)
            if isinstance(f, tuple):
                f = f[0]
            if isinstance(f, dict):
                out[name] = font_decoder(doc, f)
        return out
    except Exception:
        return {}


def page_text_payloads(
    data: bytes,
) -> list[list[tuple[bytes, dict[str, FontDecoder]]]] | None:
    """Per page in TREE order: a list of (decoded body, font decoders)
    SEGMENTS — the page's own content first, then any Form XObjects it
    draws, each with its resource fonts.  None when the file has no
    parseable xref/page tree (caller falls back to the file-order
    scan)."""
    if b"startxref" not in data[-2048:]:
        return None
    try:
        doc = PdfDocument(data)
        nodes = doc.page_nodes()
        if not nodes:
            return None
        out = []
        for p in nodes:
            content = doc.content_stream(p)
            segs = [(content, page_fonts(doc, p))]
            try:
                segs.extend(doc.form_segments(p.get("Resources"), content))
            except Exception:
                pass  # form decode failure must not lose the page
            out.append(segs)
        return out
    except Exception:
        return None


def page_content_streams(data: bytes) -> list[bytes] | None:
    """Decoded per-page content streams in PAGE-TREE order (the first
    segment of each ``page_text_payloads`` row; Forms excluded)."""
    got = page_text_payloads(data)
    return None if got is None else [segs[0][0] for segs in got]
