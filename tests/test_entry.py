"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + column
names + order-insensitive value comparison)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def _row_key(t):
    # None-safe total order (nullable columns, e.g. sitemap lastmod):
    # NULLs first within a column, mixed types keyed by type name
    return tuple((v is not None, type(v).__name__, v) for v in t)


def df_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(normalize_cell(r[c]) for c in cols) for r in df.collect()),
        key=_row_key,
    ), cols


def duck_rows(con, sql):
    res = con.sql(sql)
    cols = res.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(normalize_cell(row[i]) for i in order) for row in res.fetchall()),
        key=_row_key,
    )
    return rows, sorted(cols)


ORACLED = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = E.queries()[name]
    got_rows, got_cols = df_rows(q(spark, SF_DIR))
    want_rows, want_cols = duck_rows(duck, E.oracle_sql()[name])
    assert got_cols == want_cols, f"{name}: column names differ"
    assert len(got_rows) == len(want_rows), f"{name}: row counts differ"
    mism = [i for i, (g, w) in enumerate(zip(got_rows, want_rows)) if g != w]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"got={got_rows[mism[0]]} want={want_rows[mism[0]]}"
    )


ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"domain", "url", "status", "protocol"} <= set(df.columns)
