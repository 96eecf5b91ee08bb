"""D1 parity: split_pdf produces standalone 1-page PDFs, 1-based."""

import pytest

from westa_ocr_spark.kernel.pdf_mini import (
    extract_pdf_pages,
    split_pdf,
    write_pdf,
)


def test_split_pdf_roundtrip():
    pages = ["first page\nsecond line", "second page", "third"]
    parts = split_pdf(write_pdf(pages))
    assert len(parts) == 3
    for part, expected in zip(parts, pages):
        assert part.startswith(b"%PDF-")
        assert extract_pdf_pages(part) == [expected]


def test_split_pdf_rejects_non_pdf():
    with pytest.raises(ValueError):
        split_pdf(b"<html>not a pdf</html>")


def test_split_pdf_operator(spark, pages_parquet):
    from pyspark.sql import functions as F

    from westa_ocr_spark.operators.split_pdf import split_pdf_payloads

    pdfs = spark.read.parquet(pages_parquet).filter(
        F.hex(F.substring("html", 1, 5)) == "255044462D"  # '%PDF-'
    )
    out = split_pdf_payloads(pdfs).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert by_url
    for url, rows in by_url.items():
        idxs = sorted(r["page_index"] for r in rows)
        if rows[0]["status"] == "DONE":
            assert idxs == list(range(1, len(idxs) + 1))  # 1-based
            for r in rows:
                assert r["mime_type"] == "application/pdf"
                assert r["data"].startswith(b"%PDF-")
                assert len(extract_pdf_pages(bytes(r["data"]))) == 1
    # the corpus' truncated-PDF malformed rows flow to ERROR rows
    errs = [r for r in out if r["status"] == "ERROR"]
    assert all(r["error"].startswith("split: ") for r in errs)