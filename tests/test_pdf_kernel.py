"""Round-trip and contract tests for the minimal PDF kernel."""

import pytest

from westa_ocr_spark.kernel.pdf_mini import extract_pdf_pages, write_pdf


def test_roundtrip_single_page():
    pdf = write_pdf(["hello world"])
    assert pdf.startswith(b"%PDF-")
    assert extract_pdf_pages(pdf) == ["hello world"]


def test_roundtrip_multi_page_order():
    pages = ["page one\nline two", "page two", "page three (final)"]
    assert extract_pdf_pages(write_pdf(pages)) == pages


def test_one_based_index_contract():
    # caller assigns 1-based page_index by position
    # (reference: /root/reference/app/pdf_utils.py:29)
    pages = extract_pdf_pages(write_pdf(["a", "b", "c"]))
    indexed = list(enumerate(pages, start=1))
    assert indexed == [(1, "a"), (2, "b"), (3, "c")]


def test_escapes_roundtrip():
    tricky = "parens () and \\ backslash (nested (deep))"
    assert extract_pdf_pages(write_pdf([tricky])) == [tricky]


def test_non_latin1_roundtrip():
    tricky = "café あいう 注文"
    assert extract_pdf_pages(write_pdf([tricky])) == [tricky]


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        extract_pdf_pages(b"<html>nope</html>")


def test_truncated_pdf_raises():
    pdf = write_pdf(["hello"])
    with pytest.raises(ValueError):
        extract_pdf_pages(pdf[: len(pdf) // 2])


def test_deterministic_bytes():
    assert write_pdf(["same"]) == write_pdf(["same"])
