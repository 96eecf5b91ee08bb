"""Spark extraction operator vs. the pure kernel: byte-identity per url.

The kernel defines the bytes; Spark must not change them
(SURVEY.md §7.2 step 2, BASELINE.json: "byte-identical extracted text
per url").
"""

import pyarrow.parquet as pq
import pytest

from westa_ocr_spark.operators.extract import extract_pages, extract_rows


@pytest.fixture(scope="module")
def extracted(spark, pages_parquet):
    df = extract_pages(spark.read.parquet(pages_parquet))
    rows = {(r["url"], r["page_index"]): r.asDict(recursive=True)
            for r in df.collect()}
    return rows


@pytest.fixture(scope="module")
def expected(pages_parquet):
    table = pq.read_table(pages_parquet)
    rows = {}
    for rec in table.to_pylist():
        for out in extract_rows(rec["url"], rec["html"]):
            rows[(out["url"], out["page_index"])] = out
    return rows


def test_row_keys_match(extracted, expected):
    assert set(extracted) == set(expected)
    assert len(extracted) > 200  # pdf fan-out adds rows


def test_text_byte_identical(extracted, expected):
    for key, exp in expected.items():
        got = extracted[key]
        if exp["text"] is None:
            assert got["text"] is None
        else:
            assert got["text"].encode("utf-8") == exp["text"].encode(
                "utf-8"
            ), f"text mismatch for {key}"


def test_spans_identical(extracted, expected):
    for key, exp in expected.items():
        assert extracted[key]["spans"] == exp["spans"], key


def test_status_and_errors(extracted, expected):
    n_err = 0
    for key, exp in expected.items():
        got = extracted[key]
        assert got["status"] == exp["status"]
        assert (got["error"] is None) == (exp["error"] is None)
        n_err += got["status"] == "ERROR"
    assert n_err == 2  # i in {93, 193} of 200


def test_pdf_pages_one_based_and_contiguous(extracted):
    by_url = {}
    for (url, idx), row in extracted.items():
        if row["kind"] == "pdf":
            by_url.setdefault(url, []).append(idx)
    assert by_url, "no pdf docs in corpus slice"
    for url, idxs in by_url.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))


def test_column_pruned_scan(spark, pages_parquet):
    # the plan must read only url+html from parquet, not all 5 columns
    plan = extract_pages(
        spark.read.parquet(pages_parquet)
    )._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "url" in read_schema and "html" in read_schema
    assert "warc_ts" not in read_schema and "lang" not in read_schema


def test_payload_cap_errors_deterministically():
    from westa_ocr_spark.operators import extract as ex

    huge = b"<p>" + b"x" * 100 + b"</p>"
    # shrink the cap for the test instead of building a 64MB payload
    original = ex.MAX_PAYLOAD_BYTES
    try:
        ex.MAX_PAYLOAD_BYTES = 50
        rows = ex.extract_rows("u", huge)
        assert rows[0]["status"] == "ERROR"
        assert "exceeds cap" in rows[0]["error"]
        assert rows[0]["input_bytes"] == len(huge)
    finally:
        ex.MAX_PAYLOAD_BYTES = original
    ok = ex.extract_rows("u", huge)
    assert ok[0]["status"] == "DONE"


def test_null_payload_survives_skew_split_as_error_row(spark):
    """ADVICE r1: octet_length(NULL) is NULL, so a null-html doc used
    to fail BOTH skew_split legs and vanish. It must instead flow to
    the small leg and surface as a per-row ERROR."""
    from pyspark.sql import types as T

    from westa_ocr_spark.operators.extract import extract_pages
    from westa_ocr_spark.operators.partitioning import skew_split

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("html", T.BinaryType(), True),
    ])
    df = spark.createDataFrame(
        [("https://x/ok", b"<html><body><p>hello world</p></body></html>"),
         ("https://x/null", None)],
        schema,
    )
    out = extract_pages(skew_split(df)).collect()
    by_url = {r["url"]: r for r in out}
    assert set(by_url) == {"https://x/ok", "https://x/null"}
    nul = by_url["https://x/null"]
    assert nul["status"] == "ERROR"
    assert nul["error"] == "extract: null payload"
    assert nul["input_bytes"] == 0


def test_span_invariants_over_corpus():
    """Span contract over 300 corpus docs: per block, 0 <= start <=
    end; blocks ordered, non-overlapping; end offsets within the
    utf-8 byte length of the text; slicing the text bytes by each
    span reproduces a decodable utf-8 segment."""
    from westa_ocr_spark.corpus import generate_rows
    from westa_ocr_spark.operators.extract import extract_rows

    checked = 0
    for row in generate_rows(300):
        for out in extract_rows(row["url"], row["html"]):
            if out["status"] != "DONE" or not out["spans"]:
                continue
            data = out["text"].encode("utf-8")
            prev_end = -1
            for sp in out["spans"]:
                assert 0 <= sp["start"] <= sp["end"] <= len(data), sp
                assert sp["start"] > prev_end, (sp, prev_end)
                prev_end = sp["end"]
                data[sp["start"]:sp["end"]].decode("utf-8")  # no error
                checked += 1
    assert checked > 500  # the corpus really exercised spans


def test_media_payloads_named_in_error():
    """Round 5: image/audio/video bytes in the html column ERROR with
    the media kind named, not a cryptic charset decode message."""
    from westa_ocr_spark.operators.extract import extract_rows

    cases = [
        (b"\x89PNG\r\n\x1a\n" + b"x" * 20, "image/png"),
        (b"\xff\xd8\xff\xe0" + b"j" * 10, "image/jpeg"),
        (b"GIF89a" + b"g" * 10, "image/gif"),
        (b"RIFF....WAVEdata", "audio-video/riff"),
        (b"\x00\x00\x00\x18ftypmp42....", "video/mp4"),
    ]
    for blob, kind in cases:
        row = extract_rows("u", blob)[0]
        assert row["status"] == "ERROR"
        assert kind in row["error"], (kind, row["error"])
