"""WARC source: roundtrip, gzip members, Spark ingest, error capture."""

import pytest

from westa_ocr_spark.sources.warc import (
    parse_warc,
    read_warc_pages,
    write_warc,
)

RECORDS = [
    {"url": "https://a.example/x", "date": "2025-01-01T00:00:00Z",
     "html": b"<html><body><p>alpha doc</p></body></html>"},
    {"url": "https://b.example/y", "date": "2025-01-02T12:30:00Z",
     "html": b"<html><body><p>beta doc</p></body></html>"},
]


@pytest.mark.parametrize("gz", [True, False], ids=["gzip", "plain"])
def test_roundtrip(gz):
    data = write_warc(RECORDS, gzip_members=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
    recs = parse_warc(data)
    assert [r["url"] for r in recs] == [r["url"] for r in RECORDS]
    assert [r["payload"] for r in recs] == [r["html"] for r in RECORDS]
    assert all(r["type"] == "response" for r in recs)


def test_writer_deterministic():
    assert write_warc(RECORDS) == write_warc(RECORDS)


def test_truncated_raises():
    data = write_warc(RECORDS, gzip_members=False)
    # cut inside the second record's header section
    second = data.index(b"WARC/1.0", 1)
    with pytest.raises(ValueError):
        parse_warc(data[: second + 20])
    # and inside a declared Content-Length block
    body_at = data.index(b"alpha doc")
    with pytest.raises(ValueError):
        parse_warc(data[: body_at - 2])


def test_spark_ingest_and_extract(spark, tmp_path):
    """binaryFile scan -> parse -> rows feed the extraction operator
    unchanged (the WARC->Iceberg materialization path)."""
    from pyspark.sql import functions as F

    from westa_ocr_spark.operators.extract import extract_pages

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "seg-0.warc.gz").write_bytes(write_warc(RECORDS))
    (wdir / "seg-1.warc.gz").write_bytes(
        write_warc(
            [{"url": "https://c.example/z",
              "date": "2025-02-03T08:00:00Z",
              "html": b"<html><body><p>gamma doc</p></body></html>"}]
        )
    )
    (wdir / "seg-bad.warc.gz").write_bytes(b"\x1f\x8bgarbage not gzip")

    pages = read_warc_pages(spark, str(wdir))
    rows = {r["url"]: r for r in pages.collect()}
    ok = [u for u in rows if u is not None]
    assert sorted(ok) == [
        "https://a.example/x", "https://b.example/y",
        "https://c.example/z",
    ]
    # corrupt segment -> one visible ERROR row naming the file
    err = rows[None]
    assert err["status"] == "ERROR" and "seg-bad" in err["warc_file"]
    assert rows["https://a.example/x"]["warc_ts"].year == 2025

    extracted = extract_pages(
        pages.filter(F.col("status") == "OK")
    ).collect()
    texts = {r["url"]: r["text"] for r in extracted}
    assert texts["https://c.example/z"] == "gamma doc"
    assert all(r["status"] == "DONE" for r in extracted)


def test_warc_python_datasource_matches_binaryfile_path(spark, tmp_path):
    """spark.read.format('warc') (the Spark 4 Python DataSource) must
    produce exactly the rows the binaryFile+mapInPandas composition
    produces: one partition per file, response records only, ERROR
    row per corrupt file."""
    from westa_ocr_spark.sources.warc import read_warc_pages
    from westa_ocr_spark.sources.warc_datasource import register

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "seg-0.warc.gz").write_bytes(write_warc(RECORDS))
    (wdir / "seg-bad.warc.gz").write_bytes(b"\x1f\x8bgarbage not gzip")

    register(spark)
    via_ds = spark.read.format("warc").load(str(wdir))
    assert via_ds.rdd.getNumPartitions() == 2  # one per file
    expected = read_warc_pages(spark, str(wdir)).drop("warc_file")
    got = via_ds.drop("warc_file")
    assert got.schema == expected.schema
    key = lambda r: (str(r["url"]), str(r["status"]))  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(
        map(key, expected.collect())
    )
    gv = {r["url"]: r for r in via_ds.collect()}
    assert gv["https://a.example/x"]["html"] is not None
    assert gv[None]["status"] == "ERROR"


def test_warc_datasource_filter_pushdown_prunes_files(spark, tmp_path):
    """An equality filter on warc_file must reach pushFilters and
    prune PARTITIONS (only the named segment is read), not just rows
    post-scan."""
    from pyspark.sql import functions as F

    from westa_ocr_spark.sources.warc_datasource import register

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "seg-0.warc.gz").write_bytes(write_warc(RECORDS))
    (wdir / "seg-1.warc.gz").write_bytes(
        write_warc(
            [{"url": "https://c.example/z",
              "date": "2025-02-03T08:00:00Z",
              "html": b"<html><body><p>gamma doc</p></body></html>"}]
        )
    )
    register(spark)
    target = str(wdir / "seg-1.warc.gz")
    df = (
        spark.read.format("warc").load(str(wdir))
        .filter(F.col("warc_file") == target)
    )
    # partition pruning is visible in the task count and the rows
    assert df.rdd.getNumPartitions() == 1
    rows = df.collect()
    assert [r["url"] for r in rows] == ["https://c.example/z"]
