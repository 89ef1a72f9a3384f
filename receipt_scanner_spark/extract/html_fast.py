"""Fast regex-tokenizer implementation of the boilerplate stripper.

Same block semantics as extract/html.py (the HTMLParser reference
implementation), ~4-6× faster — html.parser spends most of its time in
per-character bookkeeping (goahead/updatepos) that a compiled tag
regex skips.  The two implementations are differentially tested on the
full synthetic corpus plus adversarial cases
(tests/test_extract.py::TestFastStripperParity); html.py stays as the
executable specification.

Parity scope: byte-identical to the spec on ALL content the pipeline
routes to the stripper (format in {html, text} after magic-byte sniff)
— pinned by TestFastStripperParity and the tag-soup property test.  On
NON-HTML binary (e.g. raw PDF streams decoded with replacement chars)
the two tokenizers may segment unbalanced-quote garbage differently
(html.parser's check_for_whole_start_tag tolerance); such bytes sniff
as pdf/image and never reach the stripper (functions/udfs.extract_row
routing), so this is outside the contract and left undefined — pinned
as a KNOWN scope boundary in tests/test_extract.py.

Tokenizer notes:
* tags match with quoted-attribute awareness (a literal ``>`` inside a
  quoted attribute value does not end the tag);
* ``script``/``style`` content is raw text (skipped to the matching
  close tag, as html.parser's CDATA_CONTENT_ELEMENTS);
* comments / doctype / processing instructions are skipped;
* entities are decoded once per text run with html.unescape (equal to
  per-entity decoding because unescape is local).
"""

from __future__ import annotations

import re
from html import unescape

from .html import (
    _BLOCK_TAGS,
    _CHROME_TAGS,
    _DROP_SUBTREE,
    _WS,
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
)

# Real tags only.  Comments / CDATA / doctype / PI are handled with
# explicit find() calls in the scan loop: a regex alternation made each
# unterminated '<!--' scan to EOF (O(n) per occurrence → O(n²) on
# adversarial pages like '<!--'*50k, measured 59 s); the loop's
# exhausted-terminator memos make every such shape linear.
_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:._-]*)"  # 1: closing slash, 2: tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"  # 3: attrs (quote-aware)
    r"(/?)>",  # 4: self-closing slash
    re.DOTALL,
)

_RAW_TEXT_CLOSE = {
    "script": re.compile(r"</script[^a-zA-Z]", re.IGNORECASE),
    "style": re.compile(r"</style[^a-zA-Z]", re.IGNORECASE),
}

_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")


class _Block:
    __slots__ = ("parts", "link_chars", "chrome_seen")

    def __init__(self, chrome_seen: bool):
        self.parts: list[str] = []
        self.link_chars = 0
        self.chrome_seen = chrome_seen


def extract_main_text_fast(html_bytes: bytes | str) -> str:
    if isinstance(html_bytes, (bytes, bytearray)):
        text = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        text = html_bytes

    blocks: list[_Block] = []
    current: _Block | None = None
    drop_depth = 0
    link_depth = 0
    chrome_depth = 0

    def emit(data: str) -> None:
        nonlocal current
        if drop_depth or not data:
            return
        if current is None:
            current = _Block(chrome_depth > 0)
            blocks.append(current)
        if _HAS_ENTITY.search(data):
            data = unescape(data)
        current.parts.append(data)
        if link_depth > 0:
            # == len(_WS.sub(" ", data).strip()): str.split and re \s
            # agree on the whitespace set for every Unicode codepoint
            # (verified exhaustively; split avoids building the string)
            words = data.split()
            if words:
                current.link_chars += sum(map(len, words)) + len(words) - 1
        if chrome_depth > 0:
            current.chrome_seen = True

    pos = 0
    n = len(text)
    find = text.find
    tag_match = _TAG.match
    # Exhausted-terminator memos: these searches only fail by reaching
    # EOF, so one failure means every later search fails too — each
    # adversarial flood ('<!--'*K, '<div x'*K with no '>', ...) pays for
    # exactly ONE full scan instead of one per occurrence.
    no_comment_close = no_cdata_close = no_gt = False
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            emit(text[pos:])
            break
        if lt > pos:
            emit(text[pos:lt])
        c = text[lt + 1 : lt + 2]
        if c == "!" or c == "?":
            if c == "!":
                if not no_comment_close and text.startswith("<!--", lt):
                    e = find("-->", lt + 4)
                    if e != -1:
                        pos = e + 3
                        continue
                    no_comment_close = True
                    # unterminated: same fallthrough as the regex
                    # alternation (bogus-declaration scan to '>')
                elif not no_cdata_close and text.startswith("<![CDATA[", lt):
                    e = find("]]>", lt + 9)
                    if e != -1:
                        pos = e + 3
                        continue
                    no_cdata_close = True
            # doctype / bogus declaration / PI: consume to the first '>'
            if not no_gt:
                gt = find(">", lt + 2)
                if gt != -1:
                    pos = gt + 1
                    continue
                no_gt = True
            # stray '<' treated as text (html.parser emits it as data)
            emit("<")
            pos = lt + 1
            continue
        m = None if no_gt else tag_match(text, lt)
        if m is None:
            if not no_gt and find(">", lt + 1) == -1:
                no_gt = True  # tags need '>': stop re-scanning to EOF
            emit("<")
            pos = lt + 1
            continue
        pos = m.end()
        name = m.group(2).lower()
        closing = m.group(1) == "/"
        # group(4) is unreliable (greedy attrs can absorb the slash):
        # html.parser itself keys on the raw tag ending with '/>'
        self_closing = not closing and text.startswith("/>", pos - 2)

        if not closing:
            if self_closing:
                # handle_startendtag semantics: block flush only — no
                # depth changes for a/chrome/drop tags
                if name in _BLOCK_TAGS:
                    current = None
                continue
            raw = _RAW_TEXT_CLOSE.get(name)
            if raw is not None:
                # skip raw-text content to the matching close tag
                mm = raw.search(text, pos)
                if mm is None:
                    break
                gt = text.find(">", mm.start())
                pos = n if gt == -1 else gt + 1
                continue
            if name in _DROP_SUBTREE:
                drop_depth += 1
                continue
            if name == "a":
                link_depth += 1
            if name in _CHROME_TAGS:
                chrome_depth += 1
            if name in _BLOCK_TAGS:
                current = None
        else:
            if name in _DROP_SUBTREE:
                drop_depth = max(0, drop_depth - 1)
                continue
            if name == "a":
                link_depth = max(0, link_depth - 1)
            if name in _CHROME_TAGS:
                chrome_depth = max(0, chrome_depth - 1)
            if name in _BLOCK_TAGS:
                current = None

    kept: list[str] = []
    for b in blocks:
        # identical to _WS.sub(" ", joined).strip() — see emit() note
        t = " ".join("".join(b.parts).split())
        if len(t) < MIN_BLOCK_CHARS:
            continue
        if b.chrome_seen:
            continue
        if b.link_chars / len(t) > MAX_LINK_DENSITY:
            continue
        kept.append(t)
    return "\n".join(kept)
