"""Pure-Python extraction kernels (no Spark imports).

These functions define the byte-exact extraction contract; the Spark
operators in ``westa_ocr_spark.operators`` merely batch them over Arrow
record batches. Keeping them dependency-free (stdlib only) freezes the
normalization rules against library version drift (SURVEY.md §7.3).
"""

from westa_ocr_spark.kernel.html_extract import extract_html  # noqa: F401
from westa_ocr_spark.kernel.pdf_mini import (  # noqa: F401
    extract_pdf_pages,
    write_pdf,
)
