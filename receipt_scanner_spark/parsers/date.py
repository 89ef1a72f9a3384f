"""Date parser — pure Python, no Spark.

Semantics re-derived from the reference
(/root/reference/lib/text_parser/date_parser.js:1-149,
 lib/text_parser/date/earliest.js, lib/text_parser/date/first.js) and
pinned by tests/test_date_parser.py (a re-encoding of
test/lib/text_parser/date_parser_spec.js).

The reference delegates scanning to chrono-node configured with exactly
six parsers and NO default refiners, plus a certainty filter (year,
month, day all explicit; day != 0).  We own an equivalent ordered regex
grammar built test-first against the spec file: every form it emits has
an explicit year+month+day, so the certainty filter is structural.

Pinned behaviors:

* ``prepare_text`` repair rewrites run in source order
  (date_parser.js:36-91): unicode hyphens AND forward slashes → ``-``
  first, then the junk-separated numeric form re-inserts ``/``.
* two-digit years: > 50 → 1900s, else 2000s (chrono 1.x imputation;
  spec: ``12-30-16`` → 2016-12-30).
* slash dates prefer month-first (US); month > 12 swaps with day when
  the day slot holds a valid month (``30-12-16`` → 2016-12-30).
* out-of-range day/month rolls over like a JS ``Date`` constructor
  (month 0 → December of prior year) rather than raising.
* results are ordered by (index in text, parser order) — chrono sorts
  by index (stable), which `first` extraction depends on.
* date value is the calendar date directly (no timezone dependency);
  the reference's ``toISOString().slice(0,10)`` on a local-noon Date is
  day-stable for |TZ| < 12h, so this is equivalent.

Deliberate divergence (documented): our boundary assertions are
non-consuming lookarounds where chrono consumes the leading/trailing
non-word char.  Acceptance is identical; in rare adjacent-date texts we
can find strictly more dates than chrono (never fewer).

Known sub-nuance inside that divergence (no oracle available —
chrono-node is not installable): the GRAMMAR regexes below use Python
``\\s``/``\\w``, which differ from a JS engine's at the margins (BOM is
JS-\\s only; U+001C-1F/U+0085 are Python-\\s only; Python ``\\w`` is
Unicode-aware where JS's is ASCII).  The REPAIR stage above does use
the exact ECMA-262 class (parsers/jsws.py) because it has a node
differential oracle (tools/diff_date_repair_oracle.py) — the grammar
stays pinned by the spec goldens + tests/test_date_properties.py
instead, and only non-ASCII-exotic-whitespace adjacency is affected.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import NamedTuple


class DateMatch(NamedTuple):
    index: int  # position of the match in the (prepared) text
    text: str  # matched substring
    date: _dt.date


# --- month-name machinery ---------------------------------------------------

# EN + ES month alternation, as in date_parser.js:29-33.
_MONTHS_EN = (
    r"Jan(?:uary|\.)?|Feb(?:ruary|\.)?|Mar(?:ch|\.)?|Apr(?:il|\.)?|May|"
    r"Jun(?:e|\.)?|Jul(?:y|\.)?|Aug(?:ust|\.)?|Sep(?:tember|\.)?|"
    r"Oct(?:ober|\.)?|Nov(?:ember|\.)?|Dec(?:ember|\.)?"
)
_MONTHS_ES = (
    r"Ene(?:ro|\.)?|Feb(?:rero|\.)?|Mar(?:zo|\.)?|Abr(?:il|\.)?|"
    r"May(?:o|\.)?|Jun(?:io|\.)?|Jul(?:io|\.)?|Ago(?:sto|\.)?|"
    r"Sep(?:tiembre|\.)?|Oct(?:ubre|\.)?|Nov(?:iembre|\.)?|Dic(?:iembre|\.)?"
)
MONTH_NAME_REGEXP = _MONTHS_EN + "|" + _MONTHS_ES

_MONTH_NUM = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
    # ES
    "ene": 1, "abr": 4, "ago": 8, "dic": 12, "set": 9,
}


def _month_num(name: str) -> int:
    return _MONTH_NUM[name[:3].lower()]


def js_date(year: int, month: int, day: int) -> _dt.date:
    """``new Date(year, month-1, day)`` semantics: out-of-range month or
    day rolls over instead of raising."""
    y = year + (month - 1) // 12
    m = (month - 1) % 12 + 1
    return _dt.date(y, m, 1) + _dt.timedelta(days=day - 1)


def _impute_year(y: int) -> int:
    # chrono 1.x two-digit-year rule.
    if y < 100:
        return y + 1900 if y > 50 else y + 2000
    return y


# --- repair rewrites (prepare_text) ------------------------------------------

# JS \s, spelled out: ECMA-262 WhiteSpace + LineTerminator.  It differs
# from Python's \s in BOTH directions — JS includes U+FEFF (BOM), which
# Python does not, and Python includes U+001C-001F and U+0085, which JS
# does not.  The reference's (^|\s) / (?=$|\s) repair anchors therefore
# fire across a BOM where Python \s would not (found by
# tools/diff_date_repair_oracle.py: 1506/25036 texts diverged before
# this class; 0 after).  The class itself is shared: parsers/jsws.py.
from .jsws import JS_WS as _JS_WS  # noqa: E402

# (a) incorrectly scanned hyphens: unicode dashes AND forward slash → '-'
#     (the '/' inside the JS char class at date_parser.js:38 is literal).
_RE_HYPHENS = re.compile("[–—‒﹘/]")

# (b) dd?mm?yyyy with 1-2 junk separator chars → dd/mm/yyyy.
#     [^a-z0-9] under JS 'i' excludes both cases → [^a-zA-Z0-9].
_RE_NUMERIC_JUNK = re.compile(
    rf"(^|[{_JS_WS}])"
    r"(?:([0-3]{0,1}[0-9])[^a-zA-Z0-9]{1,2})"
    r"(?:([0-3]{0,1}[0-9])[^a-zA-Z0-9]{1,2})"
    r"([1-9][0-9]{3})"
    rf"(?=\Z|[{_JS_WS}])"
)

# (c) MMMdd yyyy → MMM dd yyyy
_RE_MONTH_FIRST_JUNK = re.compile(
    rf"(^|[{_JS_WS}])"
    r"(?:(" + MONTH_NAME_REGEXP + r")[^a-zA-Z0-9]{0,2})"
    r"(?:([0-3]{0,1}[0-9])[^a-zA-Z0-9]{1,2})"
    r"([1-9][0-9]{3})"
    rf"(?=\Z|[{_JS_WS}])",
    re.IGNORECASE,
)

# (d) ddMMM yyyy → dd MMM yyyy
_RE_DAY_FIRST_JUNK = re.compile(
    rf"(^|[{_JS_WS}])"
    r"(?:([0-3]{0,1}[0-9])[^a-zA-Z0-9]{1,2})"
    r"(?:(" + MONTH_NAME_REGEXP + r")[^a-zA-Z0-9]{1,2})"
    r"([1-9][0-9]{3})"
    rf"(?=\Z|[{_JS_WS}])",
    re.IGNORECASE,
)

# (e) Thh;ii;ss → Thh:ii:ss (T matched case-insensitively, emitted as 'T').
_RE_TIME_JUNK = re.compile(
    r"[Tt]([0-1][0-9]|2[0-4])"
    r"[^a-zA-Z0-9]"
    r"([0-5][0-9])"
    r"[^a-zA-Z0-9]"
    r"([0-5][0-9])"
    rf"(?=\Z|[{_JS_WS}])"
)


# Three-letter stems that every branch of the month alternations starts
# with (case-insensitive).  A text containing NO stem cannot match any
# month-name pattern, so the expensive alternation scans are skipped —
# a pure optimization: substring presence is necessary for a match, and
# repairs (a)/(b)/(e) never add or remove letters.
_STEMS_EN = ("jan", "feb", "mar", "apr", "may", "jun",
             "jul", "aug", "sep", "oct", "nov", "dec")
_STEMS_ES_ONLY = ("ene", "abr", "ago", "dic")


def _has_stem(low: str, stems: tuple[str, ...]) -> bool:
    return any(s in low for s in stems)


def prepare_text(text: str) -> str:
    """OCR-noise repair chain, in reference source order (date_parser.js:36-91)."""
    text = _RE_HYPHENS.sub("-", text)
    text = _RE_NUMERIC_JUNK.sub(r"\1\2/\3/\4", text)
    low = text.lower()
    if _has_stem(low, _STEMS_EN) or _has_stem(low, _STEMS_ES_ONLY):
        text = _RE_MONTH_FIRST_JUNK.sub(r"\1\2 \3 \4", text)
        text = _RE_DAY_FIRST_JUNK.sub(r"\1\2 \3 \4", text)
    text = _RE_TIME_JUNK.sub(r"T\1:\2:\3", text)
    return text


# --- the six-parser grammar ---------------------------------------------------

# 1. EN ISO: yyyy-MM-dd with optional Thh:mm:ss(.ms)(Z|±hh:mm)
_P_ISO = re.compile(
    r"(?<!\w)"
    r"([0-9]{4})-([0-9]{1,2})-([0-9]{1,2})"
    r"(?:[Tt]([0-9]{1,2}):([0-9]{1,2})"
    r"(?::([0-9]{1,2})(?:\.(\d{1,4}))?)?"
    r"(?:Z|([+-]\d{2}):?(\d{2})?)?"
    r")?"
    r"(?!\w)",
    re.IGNORECASE,
)

# 2. EN slash: (m)m/(d)d/yy(yy) with separators / - . ; month-first with swap.
#    Year REQUIRED here (yearless forms are uncertain → filtered anyway).
_P_SLASH = re.compile(
    r"(?<!\w)"
    r"([0-9]{1,2})[/.\-]([0-9]{1,2})[/.\-]([0-9]{4}|[0-9]{2})"
    r"(?!\w)"
)

# 3. EN slash starting with year: yyyy/(m)m/(d)d (slash or dot; the hyphen
#    form is the ISO parser's).
_P_SLASH_YEAR_FIRST = re.compile(
    r"(?<!\w)"
    r"([0-9]{4})[/.]([0-9]{1,2})[/.]([0-9]{1,2})"
    r"(?!\w)"
)

# 4. EN month-name middle-endian: Mar 30 2016 / March 5, 2016 / Mar-05-2016.
#    Year required (else uncertain); year separator must be non-empty so
#    'May 2016' does not parse as May 20, year 16.
_P_MIDDLE = re.compile(
    r"(?<!\w)"
    r"(" + _MONTHS_EN + r")"
    r"(?:-|/|\s*,?\s*)"
    r"([0-9]{1,2})(?:st|nd|rd|th)?"
    r"(?:-|/|\s*,\s*|\s+)"
    r"([0-9]{4}|[0-9]{1,2})"
    r"(?!\w)",
    re.IGNORECASE,
)

# 5. EN month-name little-endian: 30 June 2016 / 30-June-2016 / 5th of May 2016.
_P_LITTLE = re.compile(
    r"(?<!\w)"
    r"([0-9]{1,2})(?:st|nd|rd|th)?"
    r"(?:-|/|\s*(?:of)?\s*)"
    r"(" + _MONTHS_EN + r")"
    r"(?:-|/|\s*,\s*|\s+)"
    r"([0-9]{4}|[0-9]{1,2})"
    r"(?!\w)",
    re.IGNORECASE,
)

# 6. ES month-name little-endian: 15 Dic 2016 / 15 de Diciembre de 2016.
_P_ES_LITTLE = re.compile(
    r"(?<!\w)"
    r"([0-9]{1,2})(?:º|ª|°)?"
    r"(?:\s*(?:de|,|-)\s*|\s+|-|/)"
    r"(" + _MONTHS_ES + r")"
    r"(?:\s*(?:del|de|,|-)\s*|\s+|-|/)"
    r"([0-9]{4}|[0-9]{2})"
    r"(?!\w)",
    re.IGNORECASE,
)


def _extract_iso(m: re.Match) -> tuple[int, int, int] | None:
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if mo < 1 or mo > 12 or d < 1 or d > 31:
        return None
    return (y, mo, d)


def _extract_slash(m: re.Match) -> tuple[int, int, int] | None:
    month, day = int(m.group(1)), int(m.group(2))
    if month > 12:
        # chrono swap: the day slot must hold a valid month and the month
        # slot a valid day-of-month.
        if 1 <= day <= 12 and 13 <= month <= 31:
            month, day = day, month
        else:
            return None
    if day < 1 or day > 31:
        return None
    return (_impute_year(int(m.group(3))), month, day)


def _extract_slash_year_first(m: re.Match) -> tuple[int, int, int] | None:
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if mo < 1 or mo > 12 or d < 1 or d > 31:
        return None
    return (y, mo, d)


def _extract_middle(m: re.Match) -> tuple[int, int, int] | None:
    mo = _month_num(m.group(1))
    d = int(m.group(2))
    if d < 1 or d > 31:
        return None
    return (_impute_year(int(m.group(3))), mo, d)


def _extract_little(m: re.Match) -> tuple[int, int, int] | None:
    d = int(m.group(1))
    mo = _month_num(m.group(2))
    if d < 1 or d > 31:
        return None
    return (_impute_year(int(m.group(3))), mo, d)


_PARSERS = (
    (_P_ISO, _extract_iso),
    (_P_SLASH, _extract_slash),
    (_P_SLASH_YEAR_FIRST, _extract_slash_year_first),
    (_P_MIDDLE, _extract_middle),
    (_P_LITTLE, _extract_little),
    (_P_ES_LITTLE, _extract_little),
)


def all_dates(text: str) -> list[DateMatch]:
    """Scan with all six parsers; results sorted by (index, parser order),
    mirroring chrono's index sort (stable across parsers).

    Month-name parsers (orders 3-5) are skipped when the text lacks
    every month stem — pattern-necessary substrings, see _STEMS_* —
    which drops three alternation scans on all-numeric texts."""
    low = text.lower()
    en = _has_stem(low, _STEMS_EN)
    es = en or _has_stem(low, _STEMS_ES_ONLY)
    found: list[tuple[int, int, DateMatch]] = []
    for order, (pat, extract) in enumerate(_PARSERS):
        if order in (3, 4) and not en:
            continue
        if order == 5 and not es:
            continue
        for m in pat.finditer(text):
            ymd = extract(m)
            if ymd is None:
                continue
            y, mo, d = ymd
            if d == 0:  # certainYearRefiner day-0 guard (date_parser.js:113)
                continue
            found.append(
                (m.start(), order, DateMatch(m.start(), m.group(0), js_date(y, mo, d)))
            )
    found.sort(key=lambda t: (t[0], t[1]))
    return [dm for _, _, dm in found]


def extract_earliest(values: list[DateMatch]) -> _dt.date | None:
    """Min over match dates, first-wins on ties (earliest.js:1-14)."""
    min_found: _dt.date | None = None
    for v in values:
        if min_found is None or v.date < min_found:
            min_found = v.date
    return min_found


def extract_first(values: list[DateMatch]) -> _dt.date | None:
    """First match in text order (first.js:1-8)."""
    return values[0].date if values else None


EXTRACTORS = {"earliest": extract_earliest, "first": extract_first}


def parse_date(text: str, config: dict | None = None) -> dict:
    """Full date pipeline (date_parser.js:1-23): repair → scan → extract →
    ISO-format.  ``match`` is 'YYYY-MM-DD' or None; ``actual_match`` the
    date object."""
    config = config or {}
    extractor = config.get("parser", "earliest")
    if isinstance(extractor, str):
        extractor = EXTRACTORS[extractor]
    text = prepare_text(text)
    matches = all_dates(text)
    actual = extractor(matches)
    return {
        "matches": matches,
        "match": actual.isoformat() if actual else None,
        "actual_match": actual,
    }
