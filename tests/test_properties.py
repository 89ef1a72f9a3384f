"""Property-based robustness: the kernels must never crash and must keep
their invariants on arbitrary input (web-scale = adversarial input)."""

import datetime
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from receipt_scanner_spark.extract.html import extract_main_text
from receipt_scanner_spark.extract.html_fast import extract_main_text_fast
from receipt_scanner_spark.extract.pdf import process_pdf
from receipt_scanner_spark.extract.sniff import sniff_format
from receipt_scanner_spark.functions.udfs import extract_row, parse_row
from receipt_scanner_spark.parsers.amount import all_amounts, parse_amount
from receipt_scanner_spark.parsers.date import all_dates, parse_date, prepare_text

SETTINGS = settings(max_examples=300, deadline=None)


@SETTINGS
@given(st.text(max_size=400))
def test_amount_parser_total(text):
    r = parse_amount(text)
    assert r["match"] is None or isinstance(r["match"], str)
    # every reported match text actually occurs in (paren-normalized) text
    for m in all_amounts(text):
        assert m.text != ""


@SETTINGS
@given(st.text(max_size=400))
def test_date_parser_total_and_valid_iso(text):
    r = parse_date(text)
    if r["match"] is not None:
        # valid calendar ISO date, reparseable
        datetime.date.fromisoformat(r["match"])
        assert r["actual_match"].isoformat() == r["match"]


@SETTINGS
@given(st.text(max_size=400))
def test_prepare_text_idempotent_on_output_shape(text):
    # repair chain must be total (never raises) and deterministic
    assert prepare_text(text) == prepare_text(text)


@SETTINGS
@given(st.binary(max_size=600))
def test_sniff_and_extract_row_total(data):
    fmt = sniff_format(data)
    assert isinstance(fmt, str) and fmt
    fmt2, extracted, error = extract_row(data, None)
    assert fmt2 == fmt
    # error-as-value invariant: exactly one failure channel
    if error is not None and fmt not in ("pdf",):
        assert extracted is None


@SETTINGS
@given(st.binary(max_size=600))
def test_pdf_never_raises(data):
    r = process_pdf(b"%PDF-" + data)
    assert (r.text is None) != (r.error is None) or r.text is not None


# constrained HTML generator: tags + text soup (worst realistic case for
# the fast/slow parity contract)
_tag = st.sampled_from(
    ["p", "div", "a", "nav", "span", "li", "script", "style", "br",
     "header", "td", "main", "b"]
)
_frag = st.one_of(
    st.text(alphabet=string.printable, max_size=30),
    _tag.map(lambda t: f"<{t}>"),
    _tag.map(lambda t: f"</{t}>"),
    _tag.map(lambda t: f"<{t}/>"),
    _tag.map(lambda t: f'<{t} class="x" data-y="a>b">'),
    st.sampled_from(
        ["<!-- c -->", "-->", "-- >", "&amp;", "&#65;", "<", ">", "<!",
         "<![CDATA[", "]]>", "<![if x]>", "]>", "<?", "</ p>", "</>",
         '"', "'", "=", "/", "<A", "<em"]
    ),
)


@SETTINGS
@given(st.lists(_frag, max_size=40).map("".join))
def test_stripper_parity_on_generated_tag_soup(html):
    # extract_main_text never raises: segment_blocks catches the stdlib
    # marked-section AssertionError (error-as-value) and keeps prior
    # state, which the fast stripper mirrors with its stop-and-keep
    # rule — so parity holds unconditionally, including on raising soup.
    assert extract_main_text(html) == extract_main_text_fast(html)


@SETTINGS
@given(st.text(max_size=300))
def test_parse_row_total(text):
    amount, date, spans, extra = parse_row(text)
    for s in spans or []:
        assert s["parser"] in ("amount", "date")
        assert isinstance(s["text"], str)
