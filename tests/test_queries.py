"""Oracle-parity harness: mirrors the grading driver's compare.

For every registry entry with an oracle: run the Spark query and the
DuckDB SQL on the same parquet tables, then compare row count, column
names, and order-insensitive values (floats rounded).
"""

import math

import duckdb
import pytest

from westa_ocr_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    if val is None:
        return "<null>"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{round(val, 6):.6f}"
    if isinstance(val, bool):
        return str(bool(val)).lower()
    return str(val)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_canon(row[i]) for i in order))
    out.sort()
    return sorted(cols), out


ORACLED = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql]
ROWS_ONLY = [(n, fn) for n, (fn, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name,fn,sql", ORACLED, ids=[n for n, *_ in ORACLED])
def test_oracle_parity(spark, ducks, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ducks.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_cols, s_rows = _canon_rows(spark_cols, spark_rows)
    d_cols, d_rows = _canon_rows(duck_cols, duck_rows)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_queries_run(spark, name, fn):
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns
