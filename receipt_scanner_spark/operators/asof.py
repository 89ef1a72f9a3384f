"""As-of (nearest-prior) join — an operator Spark lacks natively.

Implemented as the union-tag + window carry-forward composition:
tag right rows 0 and left rows 1, union on (key, ts, tag), then one
window per key ordered by (ts, tag) carries the last non-null right
payload forward (``F.last(ignorenulls=True)``).  Each left row then
holds the right row with the largest ``right_ts <= left_ts``.

Why this shape at 100 TB:

* ONE hash shuffle on the join key for the union — no range-condition
  nested-loop join, no per-row binary search, no interval explosion;
* the window runs inside the same exchange (sort within partitions);
* skewed keys get the same salting treatment as any keyed shuffle.

Tie semantics: ``right_ts == left_ts`` matches (inclusive), because
right rows (tag 0) sort before left rows (tag 1) at equal ts.  The
right side is deduplicated to one row per (key, ts) first — picked by
the highest ``dedupe_order_col`` — so the carry-forward is
deterministic (native ASOF engines leave duplicate-timestamp winners
unspecified; we pin them).

Oracle: DuckDB's native ``ASOF LEFT JOIN`` over the same deduplicated
right side (plans/queries.py::asof_purchase_prior_click).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    dedupe_order_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``right_ts <= left_ts`` within the same ``by`` group (backward
    as-of).  Left rows with no prior right row keep nulls."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (by,)
    ]

    if dedupe_order_col is not None:
        w_dedupe = Window.partitionBy(by, right_ts).orderBy(
            F.desc(dedupe_order_col)
        )
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedupe))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # NULL-timestamp rows can never be "prior" to anything: a native ASOF
    # (right_ts <= left_ts) never matches NULL.  Without this filter a
    # NULL-ts right row sorts first (nulls-first asc) with a non-null
    # payload struct and would be carried forward to every left row.
    right = right.filter(F.col(right_ts).isNotNull())

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        payload.alias("_rp"),
        F.lit(0).alias("_tag"),
    )
    payload_type = r.schema["_rp"].dataType
    l = left.select(
        "*",
        F.col(by).alias("_by"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(None).cast(payload_type).alias("_rp"),
        F.lit(1).alias("_tag"),
    )
    # carry the left row's own columns through the union: right rows get
    # nulls for them, left rows keep their values
    l_cols = list(left.columns)
    r_full = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        "_by", "_ts", "_rp", "_tag",
    )
    unioned = r_full.unionByName(l)

    w = (
        Window.partitionBy("_by")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_tag") == 1).select(
        *l_cols,
        *[
            F.col("_match").getField(c).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    return out
