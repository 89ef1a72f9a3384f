"""Replicates the driver's correctness gate: run each queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (columns sorted by name,
rows sorted, values normalized) — mismatches here mean mismatches in
CORRECTNESS_r{N}.json."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt == "object":
            df[c] = df[c].astype(str)
        elif "float" in dt:
            df[c] = df[c].astype("float64").map(
                lambda v: None if v is None or (isinstance(v, float) and math.isnan(v))
                else round(float(v), 9)
            )
        elif "datetime" in dt:
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif "int" in dt:
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


def _retired():
    from receipt_scanner_spark.plans.queries import RETIRED_ORACLE_QUERIES

    return RETIRED_ORACLE_QUERIES


# Retired driver entries (50-entry driver record cap) keep the exact
# same oracle-parity contract here, just outside the driver battery.
RETIRED_NAMES = sorted(_retired().keys())


def test_driver_dict_within_record_cap():
    """The driver records at most 50 queries() entries (r2: 56 sent,
    first 50 recorded) — pin the cap so every entry stays visible."""
    qs = entry_mod.queries()
    assert len(qs) <= 50
    assert set(entry_mod.oracle_sql()) <= set(qs)


@pytest.mark.parametrize("name", ORACLE_NAMES + RETIRED_NAMES)
def test_query_matches_oracle(spark, duck, name):
    if name in _retired():
        q, sql = _retired()[name]
    else:
        q = entry_mod.queries()[name]
        sql = entry_mod.oracle_sql()[name]

    spark_df = q(spark, SF_DIR).toPandas()
    duck_df = duck.execute(sql).df()

    assert list(sorted(spark_df.columns)) == list(sorted(duck_df.columns)), (
        spark_df.columns, duck_df.columns,
    )
    assert len(spark_df) == len(duck_df), (len(spark_df), len(duck_df))

    a, b = normalize(spark_df), normalize(duck_df)
    if not a.equals(b):
        diff_mask = ~(a.eq(b) | (a.isna() & b.isna()))
        bad_rows = diff_mask.any(axis=1)
        raise AssertionError(
            f"value mismatch in {name}:\nspark:\n{a[bad_rows].head(5)}\n"
            f"duckdb:\n{b[bad_rows].head(5)}"
        )


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    for name in set(qs) - set(ORACLE_NAMES):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0
        assert df.schema  # stable schema


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 300
    assert {"url", "format", "amount", "date", "error"} <= set(df.columns)
