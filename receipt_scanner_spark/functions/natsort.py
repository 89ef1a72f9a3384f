"""Natural sort key for batch-output ordering — the reference CLI's
``naturalSort`` (cli.js:162-197, the stackoverflow/2802804 comparator)
re-expressed as a JVM-side Spark sort expression.

The reference tokenizes the lowercased string with
``(\\.\\d+)|(\\d+(\\.\\d+)?)|([^\\d.]+)|(\\.(\\D+|$))`` and compares
token-by-token, numerically where both tokens parse as numbers, else as
strings.  ``natural_key`` builds the same token array and maps numeric
tokens to a fixed-width zero-padded decimal form so Spark's array<string>
ordering reproduces the comparator: ``file2 < file10``,
``a.5 > a.10`` (fraction tokens compare as floats), digit-vs-letter
token order preserved (padded numbers start with '0' < letters; '.' and
chars below '0' still sort first, as in the JS string fallback).

Known, documented divergences from the JS comparator (both are
"comparator returns 0" cases where JS keeps insertion order):

* numerically-equal but textually-different tokens ("2" vs "002", "5"
  vs "5.0") compare equal in JS; here "5" < "5.0" (key prefix), while
  "2" == "002" (identical keys after zero-stripping) — only the
  trailing-zero / int-vs-float shapes order instead of tying;
* integer parts beyond ~15 digits exceed JS float precision, so the JS
  comparator ties numbers that differ only in low digits ("1e20" vs
  "1e20+1"); here they order exactly (the key is length-of-digits then
  digits, valid to 99-digit integers — no pad-width truncation);
* whitespace-only tokens: JS coerces them to 0 (``' ' - '0' === 0``),
  so against a NUMERIC token they compare numerically-as-zero (and tie
  with an actual 0 token, stopping the comparison), while against a
  non-numeric token they string-compare.  That comparator is NOT a
  total order (`' ' == '0'` numerically, yet `' ' < '-' < '0'` as
  strings — intransitive), so no sort key can reproduce it exactly; we
  keep the plain string key for whitespace tokens, which matches JS
  against every non-numeric token and against numbers ≥ 1 (``' '``
  sorts before the zero-padded num_key as it does before digits in
  JS), and diverges only in the ``' '`` vs ``0`` tie (JS ties and
  stops; we order ws first) — the same tie class as the first bullet.
  (An earlier draft mapped ws tokens to the zero num_key instead; that
  reproduced the tie but INVERTED ``'1 2'`` vs ``'1-2'`` — caught by a
  node check before release and reverted.)

Everything runs in JVM expressions (regexp_extract_all + transform) —
no Python in the sort; fine for an output-ordering key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = r"(\.\d+)|(\d+(\.\d+)?)|([^\d.]+)|(\.(\D+|$))"
_NUM_RE = r"^(\.\d+|\d+(\.\d+)?)$"


def natural_key(col: str | Column) -> Column:
    """array<string> sort key: ``df.orderBy(natural_key("url"))``."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(F.lower(c), F.lit(_TOKEN_RE), 0)

    def key_of(t: Column) -> Column:
        int_part = F.regexp_extract(t, r"^(\d*)", 1)
        frac = F.regexp_extract(t, r"\.(\d+)$", 1)
        # normalize: strip leading zeros ('002' == '2', as in the JS
        # numeric compare), then order by (digit-count, digits) — exact
        # for any magnitude (F.lpad would TRUNCATE past the pad width,
        # inverting the order of 21+-digit numbers)
        norm = F.regexp_replace(int_part, r"^0+", "")
        norm = F.when(norm == "", F.lit("0")).otherwise(norm)
        num_key = F.concat(
            F.lpad(F.length(norm).cast("string"), 2, "0"),
            norm,
            F.lit("."),
            frac,
        )
        return F.when(t.rlike(_NUM_RE), num_key).otherwise(t)

    return F.transform(toks, key_of)
