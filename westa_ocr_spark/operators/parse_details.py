"""Structured parse stage: raw multi-page text -> detail rows.

Pure-SQL re-expression of the reference's downstream parser
``parseMultiPageDataFromLLM``
(``/root/reference/docs/google_apps_script_reference.md:347-407``):

* X1  split on ``--- PAGE N ---`` delimiter lines, drop blank blocks;
* X2  non-order-page sentinel detection (substring containment);
* X3  header field extraction ``【得意先】`` / ``【受注日】`` /
      ``【得意先注文番号】`` with trim;
* X4  detail block extraction after ``【注文明細】`` (DOTALL);
* F4/F5 blank-line drop + >=15-column predicate;
* X5  CSV split + per-cell trim + positional field mapping.

No UDFs: everything is built-in string/array functions, fully
codegen'd, and therefore expressible 1:1 as the DuckDB oracle SQL in
the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_DELIM = r"--- PAGE [0-9]+ ---"
NON_ORDER_SENTINEL = "このページは注文書ではありません。"
MIN_DETAIL_COLUMNS = 15

# The 15 named detail fields, in CSV position order — romanized from the
# reference's parseMultiPageDataFromLLM mapping
# (/root/reference/docs/google_apps_script_reference.md:373-396):
# 受注伝票番号, 納入場所, 得意先, 得意先注文番号, 受注日, 出荷予定日,
# 顧客納期, 得意先品目コード, 自社品目コード, 受注商品名称, 受注数,
# 単位, 受注単価, 納品書記事, 受注記事.
DETAIL_FIELDS = [
    "order_slip_no",
    "delivery_place",
    "customer",
    "customer_order_no",
    "order_date",
    "ship_date",
    "customer_due_date",
    "customer_item_code",
    "item_code",
    "product_name",
    "quantity",
    "unit",
    "unit_price",
    "delivery_note",
    "order_note",
]


def split_pages(raw: F.Column) -> F.Column:
    """X1: page blocks with blanks dropped (renumbered after filter)."""
    return F.filter(
        F.split(raw, PAGE_DELIM), lambda x: F.length(F.trim(x)) > 0
    )


def parse_detail_rows(df: DataFrame, id_col: str, raw_col: str) -> DataFrame:
    """Explode raw protocol text into per-detail rows.

    Output: (id, page_no [1-based after blank-drop], tokusaki,
    juchu_date, chumon_bango, is_non_order, row_no, n_fields,
    plus the 15 named detail fields of ``DETAIL_FIELDS``).

    Documented divergences from the reference parser (by design):

    * non-order-sentinel pages are still header/detail-parsed and only
      FLAGGED via ``is_non_order`` — consumers that want the
      reference's skip behavior filter ``~is_non_order`` (keeping the
      flag preserves lineage for audit);
    * header-only pages (``【得意先】`` present but zero >=15-column
      detail rows) emit no rows HERE — :func:`parse_pages` is the
      page-grain output that retains them (the reference's
      ``pageResult`` shape), registered as registry ``parse_pages``.
    """
    pages = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(split_pages(F.col(raw_col))).alias("page_pos", "page"),
    ).select(
        "id",
        (F.col("page_pos") + 1).alias("page_no"),
        F.col("page"),
    )

    headers = pages.select(
        "id",
        "page_no",
        F.col("page").contains(NON_ORDER_SENTINEL).alias("is_non_order"),
        F.trim(F.regexp_extract("page", "【得意先】([^\n【]*)", 1)).alias(
            "tokusaki"
        ),
        F.trim(F.regexp_extract("page", "【受注日】([^\n【]*)", 1)).alias(
            "juchu_date"
        ),
        F.trim(
            F.regexp_extract("page", "【得意先注文番号】([^\n【]*)", 1)
        ).alias("chumon_bango"),
        F.regexp_extract("page", "(?s)【注文明細】(.*)", 1).alias("detail"),
    )

    rows = headers.select(
        "id",
        "page_no",
        "is_non_order",
        "tokusaki",
        "juchu_date",
        "chumon_bango",
        F.posexplode(
            F.filter(
                F.split("detail", "\n"),
                lambda x: F.length(F.trim(x)) > 0,
            )
        ).alias("row_pos", "line"),
    ).select(
        "*",
        F.transform(F.split("line", ","), F.trim).alias("cells"),
    )

    return (
        rows.filter(F.size("cells") >= MIN_DETAIL_COLUMNS)
        .select(
            "id",
            "page_no",
            "is_non_order",
            "tokusaki",
            "juchu_date",
            "chumon_bango",
            (F.col("row_pos") + 1).alias("row_no"),
            F.size("cells").alias("n_fields"),
            *[
                F.element_at("cells", i + 1).alias(name)
                for i, name in enumerate(DETAIL_FIELDS)
            ],
        )
        .drop("line", "cells", "row_pos")
    )


def parse_pages(df: DataFrame, id_col: str, raw_col: str) -> DataFrame:
    """Page-grain parse matching the reference's ``pageResult`` shape.

    One row per non-blank page — INCLUDING header-only pages (zero
    >=15-column detail rows), which :func:`parse_detail_rows` drops by
    design; the reference retains them as page entries with an empty
    detail array (``/root/reference/docs/google_apps_script_reference.md:
    347-407``). Output: (id, page_no, is_non_order, tokusaki,
    juchu_date, chumon_bango, n_details).
    """
    pages = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(split_pages(F.col(raw_col))).alias("page_pos", "page"),
    ).select(
        "id",
        (F.col("page_pos") + 1).alias("page_no"),
        F.col("page"),
    )
    detail = F.regexp_extract("page", "(?s)【注文明細】(.*)", 1)
    detail_lines = F.filter(
        F.split(detail, "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_details = F.size(
        F.filter(
            detail_lines,
            lambda ln: F.size(F.split(ln, ",")) >= MIN_DETAIL_COLUMNS,
        )
    )
    return pages.select(
        "id",
        "page_no",
        F.col("page").contains(NON_ORDER_SENTINEL).alias("is_non_order"),
        F.trim(F.regexp_extract("page", "【得意先】([^\n【]*)", 1)).alias(
            "tokusaki"
        ),
        F.trim(F.regexp_extract("page", "【受注日】([^\n【]*)", 1)).alias(
            "juchu_date"
        ),
        F.trim(
            F.regexp_extract("page", "【得意先注文番号】([^\n【]*)", 1)
        ).alias("chumon_bango"),
        n_details.cast("int").alias("n_details"),
    )
