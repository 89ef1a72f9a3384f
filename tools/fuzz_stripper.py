"""Heavy differential fuzz of the fast stripper against the
html.parser spec (extract/html.py).  Not part of the test suite (the
suite runs a bounded hypothesis pass); run manually after touching
extract/html_fast.py:

    python tools/fuzz_stripper.py [n_examples=4000]

Exits non-zero on the first mismatch.  extract_main_text never raises
(segment_blocks is error-as-value), so parity is asserted on every
generated input; the try/except below is only a belt-and-braces guard
against a future spec change.
"""

import sys

sys.path.insert(0, ".")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from receipt_scanner_spark.extract.html import extract_main_text
from receipt_scanner_spark.extract.html_fast import extract_main_text_fast

FRAGMENTS = [
    "<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>", "<br/>",
    "<script>", "</script>", "<style>", "</style>", "<!--", "-->", "<!",
    "<![CDATA[", "]]>", "<![if x]>", "]>", "<?", ">", "<", "&amp;", "&",
    '"', "'", "=", "/", "<nav>", "</nav>", "<A", "<!doctype html>",
    "</ div>", "</>", "-- >", "<em", ";", " ", "\t", "\n", "total 5.00",
    "<p class=x>", '<a href="y>z">', "<br / >", "<b id='q'>",
]
_frag = st.one_of(st.text(max_size=12), st.sampled_from(FRAGMENTS))


def main() -> None:
    n_examples = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    checked = 0

    @settings(max_examples=n_examples, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(_frag, max_size=60).map("".join))
    def check(html):
        nonlocal checked
        try:
            spec = extract_main_text(html)
        except Exception:  # unreachable today: segment_blocks catches all
            extract_main_text_fast(html)  # must not raise either way
            return
        checked += 1
        fast = extract_main_text_fast(html)
        assert fast == spec, f"MISMATCH on {html!r}\nspec={spec!r}\nfast={fast!r}"

    check()
    print(f"{checked} generated documents, all parity")


if __name__ == "__main__":
    main()
