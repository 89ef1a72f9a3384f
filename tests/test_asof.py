"""asof_join edge semantics: inclusive ties, no-match nulls,
duplicate-timestamp dedupe, per-key isolation."""

import datetime as dt

from receipt_scanner_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 2, _ts(5)), (4, 3, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 1, _ts(10), 1.0),   # tie with left event 1 -> inclusive match
            (101, 1, _ts(15), 2.0),   # latest prior for event 2
            (102, 2, _ts(6), 3.0),    # AFTER left event 3 -> no match
            (103, 9, _ts(1), 4.0),    # other key: never visible to user 3
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, by="user_id",
            right_cols=["event_id", "ts", "value"],
            dedupe_order_col="event_id", prefix="m_",
        ).collect()
    }
    assert out[1]["m_event_id"] == 100      # inclusive (ts equal)
    assert out[2]["m_event_id"] == 101      # most recent prior wins
    assert out[3]["m_event_id"] is None     # right row is after left ts
    assert out[4]["m_event_id"] is None     # key isolation


def test_asof_duplicate_right_timestamps_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(200, 1, _ts(10), 1.0), (201, 1, _ts(10), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = asof_join(
        left, right, by="user_id",
        right_cols=["event_id", "value"],
        dedupe_order_col="event_id", prefix="m_",
    ).first()
    # dedupe keeps the highest event_id per (key, ts)
    assert row["m_event_id"] == 201 and row["m_value"] == 2.0


def test_asof_null_right_timestamp_never_matches(spark):
    """A right row with NULL ts must never be carried forward: a native
    ASOF (right_ts <= left_ts) never matches NULL.  Without the filter,
    NULL sorts first (nulls-first asc) with a non-null payload struct
    and wins last(ignorenulls=True) for every left row (ADVICE r01)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(300, 1, None, 7.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = asof_join(
        left, right, by="user_id",
        right_cols=["event_id", "ts", "value"], prefix="m_",
    ).first()
    assert row["m_event_id"] is None and row["m_value"] is None

    # and a NULL-ts LEFT row keeps its row with a null match (left join)
    left2 = spark.createDataFrame(
        [(2, 1, None)], "event_id long, user_id long, ts timestamp"
    )
    right2 = spark.createDataFrame(
        [(301, 1, _ts(5), 8.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row2 = asof_join(
        left2, right2, by="user_id",
        right_cols=["event_id", "value"], prefix="m_",
    ).first()
    assert row2["event_id"] == 2 and row2["m_event_id"] is None
