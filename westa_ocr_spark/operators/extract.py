"""The extraction operator: Arrow-batched mapInPandas over page bytes.

Spark-first re-expression of the reference's per-page extraction stage
(fetch->split->extract, ``/root/reference/app/worker.py:170-408`` and
``/root/reference/app/gemini.py:46-136``), with:

* PDF page fan-out inside the batch (1 input row -> N output rows,
  1-based ``page_index`` — the reference's split contract,
  ``/root/reference/app/pdf_utils.py:23-36``);
* HTML main-content extraction via the deterministic kernel;
* per-row error capture — a malformed payload yields a
  ``status='ERROR'`` row, never a task failure (reference behavior:
  ``/root/reference/app/worker.py:798-823``);
* content-type dispatch by magic bytes (the reference gates on
  ``splitMode`` — ``/root/reference/app/worker.py:219-220`` — we
  dispatch per row and support both).

Data crosses the Python boundary once, as Arrow record batches; there
is no per-row Python at the driver and no RDD usage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from westa_ocr_spark.kernel.html_extract import extract_html
from westa_ocr_spark.kernel.pdf_mini import extract_pdf_pages

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("block_id", T.IntegerType(), False),
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
            T.StructField("tag", T.StringType(), False),
        ]
    )
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_index", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("spans", SPAN_TYPE, True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("input_bytes", T.LongType(), False),
        T.StructField("n_blocks", T.IntegerType(), False),
    ]
)


def _pdf_line_spans(page_text: str) -> list[dict]:
    """Per-line spans for PDF pages (block = line, tag='line')."""
    spans: list[dict] = []
    offset = 0
    for block_id, line in enumerate(page_text.split("\n"), start=1):
        nbytes = len(line.encode("utf-8"))
        spans.append(
            {"block_id": block_id, "start": offset, "end": offset + nbytes,
             "tag": "line"}
        )
        offset += nbytes + 1
    return spans


# Hard per-document payload cap: Arrow's maxRecordsPerBatch bounds
# ROWS, not BYTES, so one pathological multi-GB page could OOM a
# Python worker at crawl scale. Oversized payloads take the
# deterministic per-row ERROR path instead.
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024


_MEDIA_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio-video/riff"),
    (b"ID3", "audio/mp3"),
    (b"OggS", "audio/ogg"),
    (b"\x1aE\xdf\xa3", "video/webm"),
)


def _media_magic(data: bytes) -> str | None:
    for magic, kind in _MEDIA_MAGIC:
        if data.startswith(magic):
            return kind
    if data[4:8] == b"ftyp":
        return "video/mp4"
    return None


def extract_rows(url: str, data: bytes,
                 charset: str | None = None) -> list[dict]:
    """Pure per-document extraction: 1 doc -> N page rows.

    Shared by the Spark operator and the fixture generator so the
    byte-identity contract has a single definition. ``charset`` is
    the transport-layer decode hint (round 5: the WARC source's HTTP
    Content-Type charset) — WHATWG precedence: BOM > this hint >
    <meta charset> > strict UTF-8.
    """
    if data is None:
        # Null payloads must surface as ERROR rows, not vanish:
        # skew_split routes them here via coalesce(octet_length, 0).
        return [
            {
                "url": url,
                "page_index": 1,
                "text": None,
                "spans": None,
                "status": "ERROR",
                "error": "extract: null payload",
                "kind": "error",
                "input_bytes": 0,
                "n_blocks": 0,
            }
        ]
    input_bytes = len(data)
    if input_bytes > MAX_PAYLOAD_BYTES:
        return [
            {
                "url": url,
                "page_index": 1,
                "text": None,
                "spans": None,
                "status": "ERROR",
                "error": (
                    f"extract: payload {input_bytes} bytes exceeds cap "
                    f"{MAX_PAYLOAD_BYTES}"
                ),
                "kind": "error",
                "input_bytes": input_bytes,
                "n_blocks": 0,
            }
        ]
    media = _media_magic(data)
    if media is not None:
        # a known non-document payload (image/audio/video bytes in the
        # html column): name the kind instead of surfacing a cryptic
        # charset decode error (round 5 error-taxonomy polish)
        return [
            {
                "url": url,
                "page_index": 1,
                "text": None,
                "spans": None,
                "status": "ERROR",
                "error": f"extract: unsupported media kind {media}",
                "kind": "error",
                "input_bytes": input_bytes,
                "n_blocks": 0,
            }
        ]
    try:
        if data.startswith(b"%PDF-"):
            pages = extract_pdf_pages(data)
            return [
                {
                    "url": url,
                    "page_index": idx,
                    "text": page,
                    "spans": _pdf_line_spans(page),
                    "status": "DONE",
                    "error": None,
                    "kind": "pdf",
                    "input_bytes": input_bytes,
                    "n_blocks": page.count("\n") + 1,
                }
                for idx, page in enumerate(pages, start=1)
            ]
        text, spans = extract_html(data, charset_hint=charset)
        return [
            {
                "url": url,
                "page_index": 1,
                "text": text,
                "spans": spans,
                "status": "DONE",
                "error": None,
                "kind": "html",
                "input_bytes": input_bytes,
                "n_blocks": len(spans),
            }
        ]
    except Exception as exc:  # noqa: BLE001 - T7: per-row error capture
        # ANY per-document failure becomes an ERROR row, never a task
        # failure — the reference catches Exception around the whole
        # page stage (/root/reference/app/worker.py:798-823); round 4
        # widened this from (ValueError, UnicodeDecodeError) after
        # finding stdlib html.parser can raise AssertionError on
        # crafted marked sections, which would have killed the task.
        # error-prefix concat contract: "{prefix}: {exc}"
        # (/root/reference/app/worker.py:821)
        return [
            {
                "url": url,
                "page_index": 1,
                "text": None,
                "spans": None,
                "status": "ERROR",
                "error": f"extract: {exc}",
                "kind": "error",
                "input_bytes": input_bytes,
                "n_blocks": 0,
            }
        ]


_COLS = [f.name for f in EXTRACTED_SCHEMA.fields]


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for batch in batches:
        out: list[dict] = []
        charsets = (
            batch["charset"]
            if "charset" in batch.columns
            else [None] * len(batch)
        )
        for url, data, cs in zip(batch["url"], batch["html"], charsets):
            out.extend(
                extract_rows(url, data, cs if isinstance(cs, str) else None)
            )
        # dict-of-lists: pandas skips per-row dict inference this way
        yield pd.DataFrame({c: [r[c] for r in out] for c in _COLS})


def extract_pages(pages: DataFrame) -> DataFrame:
    """Run extraction over a pages DataFrame (needs url + html cols).

    Column-prunes to (url, html) — plus the optional transport
    ``charset`` hint column when the source provides one (the WARC
    reader does) — before the Python boundary, so the scan reads only
    those columns.
    """
    cols = ["url", "html"] + (
        ["charset"] if "charset" in pages.columns else []
    )
    return pages.select(*cols).mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA
    )
