"""End-to-end Spark pipeline: corpus parquet → extract_pages → goldens.

This is the north-rule gate at the Spark level: byte-identical
extracted_text per url, run through the real DataFrame plan with
Arrow-batched UDFs — not the pure-Python shortcut.
"""

import pytest
from pyspark.sql import functions as F

from receipt_scanner_spark.plans.pipeline import (
    extract_pages,
    read_pages,
    success_by_host,
    summary,
)
from receipt_scanner_spark.sources.pages import write_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_rows=600, seed=42)
    return str(d)


@pytest.fixture(scope="module")
def results(spark, corpus_dir):
    pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
    df = extract_pages(pages).cache()
    df.count()  # materialize once
    return df


class TestPipelineGoldens:
    def test_byte_identical_extraction_per_url(self, spark, corpus_dir, results):
        goldens = spark.read.parquet(f"{corpus_dir}/goldens.parquet")
        joined = results.alias("r").join(goldens.alias("g"), "url", "full_outer")
        mismatch = joined.filter(
            ~(
                F.col("r.extracted_text").eqNullSafe(F.col("g.extracted_text"))
                & F.col("r.amount").eqNullSafe(F.col("g.amount"))
                & F.col("r.date").eqNullSafe(F.col("g.date"))
                & F.col("r.error").eqNullSafe(F.col("g.error"))
            )
        )
        bad = mismatch.select(
            "url", "r.extracted_text", "g.extracted_text", "r.amount", "g.amount"
        ).take(5)
        assert not bad, bad
        assert results.count() == 600

    def test_spans_populated(self, results):
        row = (
            results.filter(F.col("amount").isNotNull())
            .select("spans")
            .first()
        )
        assert row.spans and any(s.parser == "amount" for s in row.spans)
        amount_span = [s for s in row.spans if s.parser == "amount"][0]
        assert amount_span.end > amount_span.start >= 0

    def test_salted_repartition_spreads_skew(self, spark, corpus_dir):
        pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
        df = extract_pages(pages, salt_partitions=8, observe=False)
        sizes = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        counts = [r["count"] for r in sizes]
        # top host holds ~30% of rows; salting must spread below that.
        assert max(counts) / sum(counts) < 0.3, counts

    def test_summary_counts(self, results):
        s = summary(results).first()
        assert s.total > 500  # errors excluded
        assert 0 < s.amount <= s.total
        assert 0 < s.date <= s.total

    def test_success_by_host(self, results):
        rows = success_by_host(results).collect()
        assert sum(r.total for r in rows) == 600
        assert all(r.host.endswith(".example") for r in rows)

    def test_observe_metrics(self, spark, corpus_dir):
        from receipt_scanner_spark.plans.pipeline import OBSERVATION_NAME

        pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
        df = extract_pages(pages)
        from pyspark.sql import Observation  # noqa: F401  (API presence)

        df.collect()
        # observe() metrics are exposed via listener on classic Spark; the
        # cheap contract check here: the plan carries the observation node.
        assert OBSERVATION_NAME in df._jdf.queryExecution().analyzed().toString()


class TestPlanShape:
    def test_column_pruning_reaches_scan(self, spark, corpus_dir):
        pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
        # A downstream consumer selecting 2 columns must not drag html bytes
        # through the scan of the *input* side projections it doesn't need.
        df = extract_pages(pages, observe=False).select("url", "amount")
        plan = df._jdf.queryExecution().executedPlan().toString()
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema, plan
        # html+text are required by the UDF; warc_ts/lang must be pruned.
        assert "warc_ts" not in read_schema[0]

    def test_no_shuffle_in_default_plan(self, spark, corpus_dir):
        pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
        df = extract_pages(pages, observe=False)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_exactly_one_python_stage_fused(self, spark, corpus_dir):
        pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
        df = extract_pages(pages, observe=False)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1, plan


class TestGoldenScorer:
    def test_gate_passes_and_counts_planted_regression(self, spark, corpus_dir, results):
        from receipt_scanner_spark.plans.pipeline import (
            golden_regressions,
            success_rate_gate,
        )

        goldens = spark.read.parquet(f"{corpus_dir}/goldens.parquet")
        # clean run: zero regressions, green grade
        report = success_rate_gate(results, goldens)
        assert report == {"total": 600, "failures": 0, "success_rate": 1.0,
                          "grade": "green"}
        # plant a corrupted golden -> exactly that url is reported
        bad = goldens.withColumn(
            "amount",
            F.when(F.col("url").endswith("0000001"), F.lit("999.99"))
            .otherwise(F.col("amount")),
        )
        regs = golden_regressions(results, bad).collect()
        assert len(regs) == 1 and regs[0].want_amount == "999.99"
        with pytest.raises(AssertionError, match="below gate"):
            success_rate_gate(results, bad, min_rate=1.0)


class TestLineSegmentation:
    """OCR-text line segmentation: pure function + opt-in Spark stage
    (off by default — byte-identity contract)."""

    def test_segment_lines_filters(self):
        from receipt_scanner_spark.functions.text import segment_lines

        text = "Total 5.00\n\n  ---- \nx\nMerchant GmbH\n!!!"
        assert segment_lines(text) == ["Total 5.00", "----", "x", "Merchant GmbH", "!!!"]
        assert segment_lines(text, min_chars=2) == ["Total 5.00", "----", "Merchant GmbH", "!!!"]
        assert segment_lines(text, min_chars=2, min_alpha_ratio=0.3) == [
            "Total 5.00", "Merchant GmbH"
        ]

    def test_line_filter_through_spark(self, spark):
        from pyspark.sql import functions as F

        from receipt_scanner_spark.functions.text import segment_lines
        from receipt_scanner_spark.functions.udfs import build_process_udf

        udf = build_process_udf(
            line_filter=lambda t: "\n".join(segment_lines(t, 2, 0.2))
        )
        df = spark.createDataFrame(
            [("u1", None, "Total 6,000.00\n####\nDate 2016-08-13", "en")],
            "url string, html binary, text string, lang string",
        ).select("url", udf(F.col("html"), F.col("text")).alias("r")).select("url", "r.*")
        row = df.first()
        assert row["extracted_text"] == "Total 6,000.00\nDate 2016-08-13"
        assert row["amount"] == "6,000.00" and row["date"] == "2016-08-13"

    def test_default_pipeline_unchanged_without_filter(self, spark):
        from pyspark.sql import functions as F

        from receipt_scanner_spark.functions.udfs import build_process_udf, process_udf

        raw = "Total 6,000.00\n####\nDate 2016-08-13"
        df = spark.createDataFrame(
            [("u1", None, raw, "en")],
            "url string, html binary, text string, lang string",
        )
        r1 = df.select(process_udf(F.col("html"), F.col("text")).alias("r")).first()["r"]
        assert r1["extracted_text"] == raw  # pass-through, byte-identical
