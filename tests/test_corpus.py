"""Determinism + composition tests for the synthetic corpus generator."""

from westa_ocr_spark.corpus import (
    OVERSIZED_BYTES,
    generate_rows,
    kind_for,
    make_row,
)
from westa_ocr_spark.kernel.html_extract import extract_html
from westa_ocr_spark.kernel.pdf_mini import extract_pdf_pages


def test_rows_fully_deterministic():
    a = [make_row(i) for i in range(50)]
    b = [make_row(i) for i in range(50)]
    assert a == b


def test_urls_unique():
    urls = [r["url"] for r in generate_rows(500)]
    assert len(set(urls)) == len(urls)


def test_kind_mix():
    kinds = [kind_for(i) for i in range(1000)]
    assert kinds.count("malformed") == 10
    assert kinds.count("oversized") == 10
    assert 30 <= kinds.count("pdf") <= 60
    assert kinds.count("html") > 800


def test_oversized_actually_oversized():
    row = make_row(71)  # i%100==71 -> oversized
    assert kind_for(71) == "oversized"
    assert len(row["html"]) >= OVERSIZED_BYTES


def test_html_rows_extract_nonempty():
    for i in (0, 1, 2, 3, 4, 5):
        assert kind_for(i) == "html"
        text, spans = extract_html(make_row(i)["html"])
        assert text
        assert spans[0]["block_id"] == 1


def test_pdf_rows_parse():
    assert kind_for(7) == "pdf"
    pages = extract_pdf_pages(make_row(7)["html"])
    assert 1 <= len(pages) <= 3
    assert all(p for p in pages)


def test_malformed_rows_fail_extraction():
    import pytest

    row = make_row(93)
    with pytest.raises((ValueError, UnicodeDecodeError)):
        if row["html"].startswith(b"%PDF-"):
            extract_pdf_pages(row["html"])
        else:
            extract_html(row["html"])
