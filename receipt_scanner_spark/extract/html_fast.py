"""Fast implementation of the boilerplate stripper.

Byte-identical to extract/html.py (the HTMLParser-based executable
specification) by mirroring CPython html.parser's tokenization rules
(goahead with end=True, convert_charrefs=True) directly, without the
per-character bookkeeping that makes html.parser slow:

* start tags: the tolerant grammar (locatestarttagend_tolerant +
  check_for_whole_start_tag semantics) — tag names are almost
  unrestricted, quotes only quote inside attribute VALUES, and a
  start tag whose attr soup doesn't parse cleanly is emitted as RAW
  data (parse_starttag's handle_data branch);
* end tags: endtagfind, then the tolerant name fallback (junk between
  name and '>' ignored), '</>' swallowed, else bogus comment;
* comments close at ``--\\s*>`` (not just '-->'); marked sections
  (``<![``) use the keyword table with ``]\\s*]\\s*>`` / ``]\\s*>``
  closers; doctype and bogus declarations consume to the first '>';
* incomplete constructs at end of input are emitted as data up to the
  first '>' (inclusive), else to the next '<', else one char — and a
  lone trailing '<' is dropped (goahead's break);
* a trailing text run whose last 34 chars contain '&' with no
  whitespace/';' after it makes goahead's dangling-charref guard break
  the loop — but the end=True epilogue then flushes the same tail, so
  it is EMITTED either way (one emit here, see the inline comment);
* script/style content is CDATA: only ``</\\s*elem\\s*>`` ends it; a
  missing closer drops the rest of the document.

Known, deliberate divergences from the spec (both pinned by tests):

* inputs where the raw html.parser RAISES (``<![`` with an unknown or
  garbage keyword hits markupbase's AssertionError): this parser never
  raises — it stops scanning and keeps the remainder as data, which
  exactly mirrors what the spec WRAPPER does (segment_blocks catches
  the exception and keeps prior state), so segment-level output is
  identical and the divergence is only vs the raw parser;
* the start-tag work budget: re-scanning tolerant attr soup is
  quadratic in CPython itself (each '<tag' with no closing '>' re-scans
  to EOF).  After the cumulative scan exceeds 64x the document length —
  unreachable for real pages — remaining start-tag attempts take the
  incomplete-construct path directly.  Outputs differ from the spec
  only on inputs where the spec itself is O(n²).

Everything else — blocks, link density, chrome, whitespace collapse —
is the same block model as the spec (imported thresholds below).
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

# --- CPython html.parser tokenization regexes (html/parser.py) ---------------

_LOCATE_START = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
        )
        (?:\s*,)*                    # possibly followed by a comma
      )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
_TAGFIND_TOL = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND_TOL = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_COMMENT_CLOSE = re.compile(r"--\s*>")
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
_ENDTAG_FIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_AMP_TAIL = re.compile(r"[\s;]")

_MARKED_KEYWORDS = {"temp", "cdata", "ignore", "include", "rcdata"}
_MS_KEYWORDS = {"if", "else", "endif"}
_CDATA_ELEMS = ("script", "style")
_CDATA_CLOSERS = {
    e: re.compile(r"</\s*%s\s*>" % e, re.IGNORECASE) for e in _CDATA_ELEMS
}
_LETTERS_EQ = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=")

_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")

# Clean-tag fast paths.  Each is a strict SUBSET of the tolerant
# grammar chosen so the faithful path provably produces the same
# (endpos, tag, start/startend/end decision): simple name, simply-
# quoted or conservative bare values, no stray '/' or '='.  Anything
# else falls through to the faithful tolerant machinery.
_SIMPLE_OPEN = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[-a-zA-Z0-9_./:;,#%+]+))?)*)"
    r"\s*(/?)>"
)
_SIMPLE_CLOSE = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)\s*>")

# Document-level clean scan: ONE combined token regex — groups 1-3 are
# exactly _SIMPLE_OPEN's, group 4 exactly _SIMPLE_CLOSE's, plus a
# doctype branch (consumes to the first '>', as parse_html_declaration
# does).  See the fast-path block in extract_main_text_fast for the
# strict-subset equivalence argument.
_CLEAN_ANY = re.compile(
    r"<(?:([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[-a-zA-Z0-9_./:;,#%+]+))?)*)"
    r"\s*(/?)>"
    r"|/([a-zA-Z][a-zA-Z0-9]*)\s*>"
    r"|![dD][oO][cC][tT][yY][pP][eE][^>]*>)"
)

# start-tag scan budget multiplier (see module docstring)
_SCAN_BUDGET_FACTOR = 64


class _Block:
    __slots__ = ("parts", "link_chars", "chrome_seen")

    def __init__(self, chrome_seen: bool):
        self.parts: list[str] = []
        self.link_chars = 0
        self.chrome_seen = chrome_seen


def extract_main_text_fast(
    html_bytes: bytes | str,
    *,
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
    drop_chrome: bool = True,
) -> str:
    """Tokenize + segment + select.  The keyword thresholds parameterize
    ONLY the block-selection stage (extract/profiles.py preprocessing
    profiles); the defaults reproduce the spec selection exactly — the
    byte-identity contract vs extract/html.py holds at the defaults."""
    if isinstance(html_bytes, (bytes, bytearray)):
        text = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        text = html_bytes

    blocks: list[_Block] = []
    current: _Block | None = None
    drop_depth = 0
    link_depth = 0
    chrome_depth = 0

    def emit(data: str, decode: bool = True) -> None:
        # decode=False mirrors handle_data calls that bypass goahead's
        # unescape (bogus start tags, cdata content)
        nonlocal current
        if drop_depth or not data:
            return
        if current is None:
            current = _Block(chrome_depth > 0)
            blocks.append(current)
        if decode and _HAS_ENTITY.search(data):
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

    def handle_starttag(tag: str) -> None:
        nonlocal current, drop_depth, link_depth, chrome_depth
        if tag in _DROP_SUBTREE:
            drop_depth += 1
            return
        if tag == "a":
            link_depth += 1
        if tag in _CHROME_TAGS:
            chrome_depth += 1
        if tag in _BLOCK_TAGS:
            current = None

    def handle_endtag(tag: str) -> None:
        nonlocal current, drop_depth, link_depth, chrome_depth
        if tag in _DROP_SUBTREE:
            drop_depth = max(0, drop_depth - 1)
            return
        if tag == "a":
            link_depth = max(0, link_depth - 1)
        if tag in _CHROME_TAGS:
            chrome_depth = max(0, chrome_depth - 1)
        if tag in _BLOCK_TAGS:
            current = None

    # ---- document-level clean-scan fast path --------------------------------
    # One combined C-level search per token instead of per-'<' Python
    # dispatch.  STRICT-SUBSET equivalence: the start/end branches are
    # the exact _SIMPLE_OPEN/_SIMPLE_CLOSE grammars (so a token match
    # here produces the same (endpos, tag, decision) the faithful loop
    # would), the doctype branch consumes to the same first '>', and
    # cdata jumps use the same closer regexes.  ANY '<' not consumed by
    # a clean token (bogus tags, comments, PIs, marked sections,
    # incomplete constructs, missing-'>' doctypes) lands in a gap or the
    # tail, is detected by the '<'-in-gap check, and BAILS: state is
    # reset and the document re-parses through the faithful loop below.
    # Clean documents (the overwhelming web-scale common case) never
    # touch the per-'<' machinery; irregular ones pay one extra partial
    # scan.
    n = len(text)
    pos = 0
    clean_ok = True
    # hot-loop locals (attribute lookups cost in a 100-token/doc loop);
    # the inlined emit/handler bodies below are LINE-FOR-LINE the same
    # logic as emit()/handle_starttag()/handle_endtag() above — the
    # functions remain the readable spec for the faithful loop.
    scan = _CLEAN_ANY.search
    find_lt = text.find
    has_entity = _HAS_ENTITY.search
    drop_tags, block_tags = _DROP_SUBTREE, _BLOCK_TAGS
    chrome_tags, cdata_elems = _CHROME_TAGS, _CDATA_ELEMS
    while True:
        m = scan(text, pos)
        if m is None:
            tail = text[pos:]
            if "<" in tail:
                clean_ok = False
            else:
                emit(tail)
                pos = n
            break
        s = m.start()
        if find_lt("<", pos, s) != -1:
            clean_ok = False
            break
        if s > pos and not drop_depth:
            data = text[pos:s]
            if current is None:
                current = _Block(chrome_depth > 0)
                blocks.append(current)
            if has_entity(data):
                data = unescape(data)
            current.parts.append(data)
            if link_depth:
                words = data.split()
                if words:
                    current.link_chars += sum(map(len, words)) + len(words) - 1
            if chrome_depth:
                current.chrome_seen = True
        g = m.group
        tag = g(1)
        if tag is not None:
            tag = tag.lower()
            if g(3):
                if tag in block_tags:
                    current = None
            else:
                if tag in drop_tags:
                    drop_depth += 1
                else:
                    if tag == "a":
                        link_depth += 1
                    if tag in chrome_tags:
                        chrome_depth += 1
                    if tag in block_tags:
                        current = None
                if tag in cdata_elems:
                    cm = _CDATA_CLOSERS[tag].search(text, m.end())
                    if cm is None:
                        # rest never leaves cdata: flushed RAW at close
                        emit(text[m.end():], decode=False)
                        pos = n
                        break
                    if cm.start() > m.end():
                        emit(text[m.end() : cm.start()], decode=False)
                    handle_endtag(tag)
                    pos = cm.end()
                    continue
            pos = m.end()
        else:
            close = g(4)
            if close is not None:
                tag = close.lower()
                if tag in drop_tags:
                    if drop_depth:
                        drop_depth -= 1
                else:
                    if tag == "a" and link_depth:
                        link_depth -= 1
                    if tag in chrome_tags and chrome_depth:
                        chrome_depth -= 1
                    if tag in block_tags:
                        current = None
            # else: doctype branch — consumed, nothing emitted
            pos = m.end()
    if clean_ok:
        pos = n  # faithful loop below no-ops
    else:
        blocks.clear()
        current = None
        drop_depth = link_depth = chrome_depth = 0
        pos = 0

    find = text.find
    startswith = text.startswith
    cdata_elem: str | None = None
    scan_budget = _SCAN_BUDGET_FACTOR * n + 4096
    # exhausted-terminator memos: these searches only fail by reaching
    # EOF, so one failure covers every later (smaller) window
    no_comment_close = no_marked_close = no_ms_close = no_gt = False

    # Where goahead breaks with input left, its end=True epilogue
    # flushes the remainder as one handle_data call — unescaped outside
    # cdata, raw inside.  Each break below performs that flush inline.
    while pos < n:
        if cdata_elem is not None:
            # goahead's cdata mode: only the real end tag is interesting
            mm = _CDATA_CLOSERS[cdata_elem].search(text, pos)
            if mm is None:
                # rest never leaves cdata: flushed RAW at close
                emit(text[pos:], decode=False)
                break
            if mm.start() > pos:
                emit(text[pos : mm.start()], decode=False)
            handle_endtag(cdata_elem)
            cdata_elem = None
            pos = mm.end()
            continue

        lt = find("<", pos)
        if lt == -1:
            # goahead's dangling-charref guard ('&' in the last 34 chars
            # with no [\s;] after it) breaks the loop — but the end=True
            # flush then emits the same tail anyway, so it is one emit
            # either way
            emit(text[pos:])
            break
        if lt > pos:
            emit(text[pos:lt])

        c = text[lt + 1 : lt + 2]
        k = -1  # -1 = incomplete construct (resolved below)
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            # ---- parse_starttag -------------------------------------
            sm = _SIMPLE_OPEN.match(text, lt)
            if sm is not None:
                tag = sm.group(1).lower()
                if sm.group(3):
                    # startendtag: block flush only
                    if tag in _BLOCK_TAGS:
                        current = None
                else:
                    handle_starttag(tag)
                    if tag in _CDATA_ELEMS:
                        cdata_elem = tag
                pos = sm.end()
                continue
            if scan_budget <= 0:
                pass  # budget exceeded: incomplete path (docstring)
            else:
                m = _LOCATE_START.match(text, lt)
                j = m.end()
                scan_budget -= j - lt
                nxt = text[j : j + 1]
                endpos = -1
                if nxt == ">":
                    endpos = j + 1
                elif nxt == "/":
                    if startswith("/>", j):
                        endpos = j + 2
                    # else: incomplete (check_for_whole_start_tag)
                elif nxt == "" or nxt in _LETTERS_EQ:
                    pass  # incomplete
                else:
                    endpos = j if j > lt else lt + 1
                if endpos >= 0:
                    tm = _TAGFIND_TOL.match(text, lt + 1)
                    ak = tm.end()
                    while ak < endpos:
                        am = _ATTRFIND_TOL.match(text, ak)
                        if am is None:
                            break
                        ak = am.end()
                    end_str = text[ak:endpos].strip()
                    if end_str not in (">", "/>"):
                        # bogus start tag: RAW data (parse_starttag
                        # calls handle_data directly, no unescape)
                        emit(text[lt:endpos], decode=False)
                    else:
                        tag = tm.group(1).lower()
                        if end_str == "/>":
                            # handle_startendtag: block flush only
                            if tag in _BLOCK_TAGS:
                                current = None
                        else:
                            handle_starttag(tag)
                            if tag in _CDATA_ELEMS:
                                cdata_elem = tag
                    k = endpos
        elif c == "/":
            # ---- parse_endtag ---------------------------------------
            sm = _SIMPLE_CLOSE.match(text, lt)
            if sm is not None:
                handle_endtag(sm.group(1).lower())
                pos = sm.end()
                continue
            if not no_gt:
                g = find(">", lt + 1)
                if g == -1:
                    no_gt = True
                else:
                    em = _ENDTAG_FIND.match(text, lt)
                    if em is not None:
                        handle_endtag(em.group(1).lower())
                        k = em.end()
                    else:
                        nm = _TAGFIND_TOL.match(text, lt + 2)
                        if nm is None:
                            if startswith("</>", lt):
                                k = lt + 3
                            else:
                                # parse_bogus_comment from '</'
                                g2 = find(">", lt + 2)
                                k = g2 + 1 if g2 != -1 else -1
                        else:
                            handle_endtag(nm.group(1).lower())
                            # junk between name and '>' is ignored
                            k = find(">", nm.end()) + 1
        elif startswith("<!--", lt):
            # ---- parse_comment: closes at --\s*> --------------------
            if not no_comment_close:
                mm = _COMMENT_CLOSE.search(text, lt + 4)
                if mm is None:
                    no_comment_close = True
                else:
                    k = mm.end()
        elif c == "?":
            # ---- parse_pi: consume to the first '>' -----------------
            if not no_gt:
                g = find(">", lt + 2)
                if g == -1:
                    no_gt = True
                else:
                    k = g + 1
        elif c == "!":
            # ---- parse_html_declaration -----------------------------
            if startswith("<![", lt):
                if lt + 3 == n:
                    pass  # _scan_name at end of buffer: incomplete
                else:
                    dm = _DECLNAME.match(text, lt + 3)
                    if dm is None:
                        # markupbase._scan_name RAISES ("expected name
                        # token"); the spec catches it in segment_blocks
                        # and keeps the blocks parsed so far — mirror by
                        # stopping the scan with no end-of-input flush
                        break
                    if lt + 3 + len(dm.group()) == n:
                        pass  # name runs to end of buffer: incomplete
                    else:
                        name = dm.group().strip().lower()
                        if name in _MARKED_KEYWORDS:
                            if not no_marked_close:
                                mm = _MARKED_CLOSE.search(text, lt + 3)
                                if mm is None:
                                    no_marked_close = True
                                else:
                                    k = mm.end()
                        elif name in _MS_KEYWORDS:
                            if not no_ms_close:
                                mm = _MS_MARKED_CLOSE.search(text, lt + 3)
                                if mm is None:
                                    no_ms_close = True
                                else:
                                    k = mm.end()
                        else:
                            # parse_marked_section's unknown-keyword
                            # AssertionError: same stop-and-keep rule
                            break
            elif text[lt : lt + 9].lower() == "<!doctype":
                if not no_gt:
                    g = find(">", lt + 9)
                    if g == -1:
                        no_gt = True
                    else:
                        k = g + 1
            else:
                # bogus comment/declaration: to the first '>'
                if not no_gt:
                    g = find(">", lt + 2)
                    if g == -1:
                        no_gt = True
                    else:
                        k = g + 1
        elif lt + 1 < n:
            emit("<", decode=False)
            pos = lt + 1
            continue
        else:
            # lone '<' at EOF: goahead breaks; the end=True flush then
            # emits it as (trivially unescaped) data
            emit("<")
            break

        if k < 0:
            # incomplete construct with end=True: emit as data up to
            # the first '>' (inclusive), else the next '<', else 1 char
            if not no_gt:
                g = find(">", lt + 1)
            else:
                g = -1
            if g != -1:
                k = g + 1
            else:
                l2 = find("<", lt + 1)
                k = l2 if l2 != -1 else lt + 1
            emit(text[lt:k])
        pos = k

    kept: list[str] = []
    for b in blocks:
        # identical to _WS.sub(" ", joined).strip() — see emit() note
        t = " ".join("".join(b.parts).split())
        if len(t) < min_block_chars:
            continue
        if drop_chrome and b.chrome_seen:
            continue
        if b.link_chars / len(t) > max_link_density:
            continue
        kept.append(t)
    return "\n".join(kept)
