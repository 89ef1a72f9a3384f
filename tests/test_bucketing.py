"""Bucketed co-located joins: the write-once-shuffle-never evidence.

Asserts on the EXECUTED plan that joining two tables bucketed on the
same key with the same bucket count runs with ZERO shuffle exchanges,
while the identical join over plain parquet shuffles both sides."""

import pytest
from pyspark.sql import functions as F

from receipt_scanner_spark.plans.bucketed import (
    count_shuffle_exchanges,
    write_bucketed,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8,
                   path=str(d / "orders"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8, path=str(d / "lineitem"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _join(spark, left, right):
    return (
        left.join(right, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_zero_shuffles(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bj = _join(spark, spark.table("b_orders"), spark.table("b_lineitem"))
        assert count_shuffle_exchanges(bj) == 1  # ONLY the 25-group agg
        # the join itself reads both sides pre-partitioned: no exchange
        # below the SortMergeJoin
        plan = bj._jdf.queryExecution().executedPlan().toString()
        join_at = plan.find("SortMergeJoin")
        assert join_at != -1
        assert "Exchange" not in plan[join_at:]

        # identical join over plain parquet: both sides shuffle
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        pj = _join(spark, orders, lineitem)
        assert count_shuffle_exchanges(pj) >= 3  # 2 join sides + agg
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_results_match_plain(spark, bucketed_tables):
    bj = _join(spark, spark.table("b_orders"), spark.table("b_lineitem"))
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    pj = _join(spark, orders, lineitem)
    assert sorted(map(tuple, bj.collect())) == sorted(map(tuple, pj.collect()))


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    """An equality filter on the bucket key scans 1/n of the buckets
    (SelectedBucketsCount in the scan node).  autoBucketedScan must be
    off for a filter-only query — the planner otherwise disables the
    bucketed scan because nothing downstream needs the partitioning."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        key = spark.table("b_orders").select("o_orderkey").first()[0]
        q = spark.table("b_orders").filter(F.col("o_orderkey") == key)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:800]
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
