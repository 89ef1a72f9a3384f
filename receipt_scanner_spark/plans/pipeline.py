"""The extraction pipeline — declarative DataFrame plan.

One logical chain (SURVEY.md §3.1 mapping):

    scan pages → [salted repartition on url-host] → fused
    extract+parse pandas UDF → (url, warc_ts, lang, format,
    extracted_text, amount, date, spans, error)

Scale properties the plan guarantees:

* **Column pruning at the scan**: only (url, warc_ts, html, text,
  lang) are read; Catalyst prunes the rest (check ``ReadSchema`` in
  ``explain``).
* **No shuffle unless asked**: extraction is embarrassingly parallel —
  map-only.  ``salt_partitions`` adds ONE explicit round-robin-by-key
  shuffle to defeat crawl skew (a handful of mega-hosts dominating
  input splits, north rule).  Keyed by ``xxhash64(url) % salt`` so all
  work spreads evenly while rows of one host land in at most ``salt``
  partitions (locality for downstream per-host aggregation).
* **Error as value** (cli.js:114-117 D3): a bad document NEVER fails
  the job; ``error`` column carries the reason.
* **Metrics via observe** (S7/S8 analog of the reference ticker +
  ``--summary``): per-run counts with zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import build_process_udf, process_udf

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

OBSERVATION_NAME = "extraction_metrics"


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table (parquet dir or file).  On a real deployment
    this is ``spark.read.table('warehouse.pages')`` over Iceberg — the
    plan downstream is identical."""
    return spark.read.parquet(path)


def host_of(url_col: str = "url"):
    """URL host expression (JVM-side, codegen'd — no UDF)."""
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def extract_pages(
    pages: DataFrame,
    *,
    salt_partitions: int | None = None,
    salt: int = 16,
    parsers: list | None = None,
    ocr=None,
    ocr_arrays=None,
    observe: bool = True,
    profile: str | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extraction results.

    ``salt_partitions``: if set, repartition to that many partitions on
    ``(host, xxhash64(url) % salt)`` before the UDF — the explicit
    skew-defeating shuffle.  Leave None for map-only execution (input
    splits already balanced).

    ``profile``: named stripper preprocessing profile (I12-I14 surface,
    extract/profiles.py); None == 'default' == the byte-identity path.
    """
    udf = (
        process_udf
        if parsers is None and ocr is None and ocr_arrays is None
        and profile in (None, "default")
        else build_process_udf(parsers, ocr, profile=profile, ocr_arrays=ocr_arrays)
    )

    df = pages.select(*PAGES_COLUMNS)
    if salt_partitions:
        df = df.repartition(
            salt_partitions,
            F.concat_ws(
                "#", host_of(), (F.pmod(F.xxhash64("url"), F.lit(salt))).cast("string")
            ),
        )

    result = df.select(
        "url",
        "warc_ts",
        "lang",
        udf(F.col("html"), F.col("text")).alias("_r"),
    ).select("url", "warc_ts", "lang", "_r.*")

    if observe:
        result = result.observe(
            OBSERVATION_NAME,
            F.count(F.lit(1)).alias("total"),
            F.count("amount").alias("amount"),
            F.count("date").alias("date"),
            F.count("error").alias("errors"),
        )
    return result


def summary(results: DataFrame) -> DataFrame:
    """The reference's ``--summary`` statistics (cli.js:200-225): total
    docs, docs with a parsed amount, docs with a parsed date — errors
    excluded from total, as in cli.js:205-217."""
    ok = results.filter(F.col("error").isNull())
    return ok.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("amount").alias("amount"),
        F.count("date").alias("date"),
    )


def success_by_host(results: DataFrame) -> DataFrame:
    """Per-partition extraction-success metrics (north rule) keyed by
    url host — the aggregation the salted repartition co-locates."""
    return (
        results.withColumn("host", host_of())
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count("amount").alias("amount"),
            F.count("date").alias("date"),
            F.count("error").alias("errors"),
        )
    )


def golden_regressions(results: DataFrame, goldens: DataFrame) -> DataFrame:
    """Benchmark scorer (D4, benchmark/image_preprocessors.js:44-57): rows
    whose extraction differs from the golden — exact-match semantics via
    null-safe comparison, returned as a DataFrame for at-scale regression
    counting (anti-join idiom: result ≠ golden)."""
    r, g = results.alias("r"), goldens.alias("g")
    joined = r.join(g, F.col("r.url") == F.col("g.url"), "full_outer")
    mismatch = ~(
        F.col("r.extracted_text").eqNullSafe(F.col("g.extracted_text"))
        & F.col("r.amount").eqNullSafe(F.col("g.amount"))
        & F.col("r.date").eqNullSafe(F.col("g.date"))
        & F.col("r.error").eqNullSafe(F.col("g.error"))
    )
    return joined.filter(mismatch).select(
        F.coalesce(F.col("r.url"), F.col("g.url")).alias("url"),
        F.col("r.amount").alias("got_amount"),
        F.col("g.amount").alias("want_amount"),
        F.col("r.date").alias("got_date"),
        F.col("g.date").alias("want_date"),
        F.col("r.error").alias("got_error"),
        F.col("g.error").alias("want_error"),
    )


def success_rate_gate(results: DataFrame, goldens: DataFrame,
                      min_rate: float = 0.85) -> dict:
    """Benchmark gate (D5, image_preprocessors.js:138,143): success rate =
    exact matches / total; returns the report dict and raises if the
    rate is below ``min_rate`` (the reference's CI semantics)."""
    total = goldens.count()
    failures = golden_regressions(results, goldens).count()
    # full-outer semantics: results without a golden count as failures,
    # so an empty goldens table must not grade green against non-empty
    # results (rate 1.0 only when there were no mismatches at all).
    if total == 0:
        rate = 1.0 if failures == 0 else 0.0
    else:
        rate = max(0.0, (total - failures) / total)
    report = {
        "total": total,
        "failures": failures,
        "success_rate": round(rate, 4),
        "grade": "green" if rate > 0.95 else ("yellow" if rate > 0.85 else "red"),
    }
    if rate < min_rate:
        raise AssertionError(f"success rate {rate:.4f} below gate {min_rate}: {report}")
    return report


def benchmark_profiles(
    pages: DataFrame,
    goldens: DataFrame,
    profiles: list[str] | None = None,
    gate_profile: str = "default",
    min_rate: float = 0.85,
) -> dict[str, dict]:
    """The reference's preprocessor benchmark
    (benchmark/image_preprocessors.js:118-153) over stripper profiles:
    run the SAME corpus through every named preprocessing profile, score
    each against the goldens (exact-match, D4), grade with the 0.85 /
    0.95 coloring (D5), and ENFORCE the gate only for ``gate_profile``
    (the reference CI gates opencv only, .travis.yml:22).

    Returns {profile: report}.  Reports for non-gated profiles are
    informational — alternative recipes may legitimately score worse on
    goldens produced by the default recipe, exactly as the reference's
    non-CI preprocessors do."""
    from ..extract.profiles import PROFILES

    names = profiles if profiles is not None else list(PROFILES)
    out: dict[str, dict] = {}
    total = goldens.count()  # loop-invariant: one action, not one per profile
    for name in names:
        results = extract_pages(pages, observe=False, profile=name)
        failures = golden_regressions(results, goldens).count()
        rate = (
            (1.0 if failures == 0 else 0.0)
            if total == 0
            else max(0.0, (total - failures) / total)
        )
        out[name] = {
            "total": total,
            "failures": failures,
            "success_rate": round(rate, 4),
            "grade": "green" if rate > 0.95 else ("yellow" if rate > 0.85 else "red"),
        }
    if gate_profile in out and out[gate_profile]["success_rate"] < min_rate:
        raise AssertionError(
            f"gated profile {gate_profile!r} below {min_rate}: {out[gate_profile]}"
        )
    return out
