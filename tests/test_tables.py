"""Direct unit tests for the keyed-table sink (sources/tables.py)."""

import pytest

from westa_ocr_spark.sources.tables import ParquetTable, keyed_table


@pytest.fixture()
def tbl(tmp_path):
    return ParquetTable(str(tmp_path / "t"))


def _rows(spark, tbl):
    return {
        (r["k"], r["p"]): r["v"] for r in tbl.read(spark).collect()
    }


def test_first_write_creates_table(spark, tbl):
    df = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], ["k", "p", "v"])
    assert not tbl.exists()
    tbl.merge_upsert(spark, df, keys=["k", "p"])
    assert tbl.exists()
    assert _rows(spark, tbl) == {(1, 1): "a", (2, 1): "b"}


def test_upsert_new_rows_win(spark, tbl):
    df1 = spark.createDataFrame([(1, 1, "old"), (2, 1, "keep")],
                                ["k", "p", "v"])
    tbl.merge_upsert(spark, df1, keys=["k", "p"])
    df2 = spark.createDataFrame([(1, 1, "new"), (3, 1, "add")],
                                ["k", "p", "v"])
    tbl.merge_upsert(spark, df2, keys=["k", "p"])
    assert _rows(spark, tbl) == {
        (1, 1): "new", (2, 1): "keep", (3, 1): "add"
    }


def test_upsert_dedupes_incoming_batch(spark, tbl):
    # J5: duplicate keys inside one batch collapse to a single row
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "x"), (2, 1, "y")], ["k", "p", "v"]
    )
    tbl.merge_upsert(spark, df, keys=["k", "p"])
    assert len(_rows(spark, tbl)) == 2


def test_keyed_table_picks_parquet_without_iceberg(spark, tmp_path):
    t = keyed_table(spark, str(tmp_path / "x"))
    assert isinstance(t, ParquetTable)
