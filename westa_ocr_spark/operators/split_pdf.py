"""PDF page-split operator: 1 document row -> N standalone page payloads.

Direct Spark re-expression of the reference's ``split_pdf`` stage
(``/root/reference/app/pdf_utils.py:23-36``, fan-out at
``/root/reference/app/worker.py:284-286``): each PDF byte stream
becomes N rows ``(url, page_index [1-based], data [one-page PDF],
mime_type ['application/pdf'])``. Non-PDF or broken payloads become a
``status='ERROR'`` row (``/root/reference/app/worker.py:798-823``).

The main extraction pipeline skips this materialized intermediate
(it extracts text per page directly), but the operator exists for
pipelines that need the reference's exact page-payload contract —
e.g. routing individual pages to downstream binary consumers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from westa_ocr_spark.kernel.pdf_mini import split_pdf

PAGE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_index", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def split_pdf_payloads(pages: DataFrame, url_col: str = "url",
                       data_col: str = "html") -> DataFrame:
    """Arrow-batched page split over (url, pdf-bytes) rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for url, data in zip(pdf[url_col], pdf[data_col]):
                try:
                    for idx, page in enumerate(
                        split_pdf(bytes(data)), start=1
                    ):
                        out.append(
                            {
                                "url": url,
                                "page_index": idx,
                                "data": page,
                                "mime_type": "application/pdf",
                                "status": "DONE",
                                "error": None,
                            }
                        )
                except (ValueError, TypeError) as exc:
                    out.append(
                        {
                            "url": url,
                            "page_index": 1,
                            "data": None,
                            "mime_type": "application/pdf",
                            "status": "ERROR",
                            "error": f"split: {exc}",
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in PAGE_PAYLOAD_SCHEMA.fields]
            )

    return pages.select(url_col, data_col).mapInPandas(
        batches, schema=PAGE_PAYLOAD_SCHEMA
    )
