"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant recurring cost of a fact-fact join (lineitem ⋈
orders, pages ⋈ previous-crawl pages) is the shuffle of both sides on
the join key, paid on EVERY run.  Bucketing pays it ONCE at write time:
``bucketBy(n, key)`` hash-partitions files by key and records the
layout in the catalog, so any later equi-join or aggregation on that
key reads both sides already co-partitioned — Catalyst drops the
Exchange entirely (verified by plan assertion in
tests/test_bucketing.py).

Rules of thumb encoded here:

* bucket count is fixed at write time; pick it for the TARGET scale
  (buckets ≈ total size / healthy-partition-size; at 100 TB think
  thousands) — too few buckets caps join parallelism forever;
* both sides must be bucketed on the same key with the same count for
  the exchange-free join (Spark can one-side-shuffle otherwise);
* ``sortBy`` within buckets additionally removes the in-partition sort
  of a sort-merge join;
* bucket pruning: an equality filter on the bucket key scans 1/n of
  the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally in-bucket-sorted)
    catalog table.  ``path`` makes it an external table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the EXECUTED plan
    (broadcast exchanges excluded — those are the cheap kind)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
