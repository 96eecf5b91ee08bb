"""Physical-plan audits: the plans we designed are the plans we get.

These assert the scale-critical properties directly on
``executedPlan`` so a regression (lost pushdown, surprise shuffle,
join strategy flip) fails CI, not a 100 TB run.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extract_pipeline_is_narrow(spark, pages_parquet):
    """scan -> extract has no Exchange for the small leg (the only
    exchange allowed is the tiny oversized-leg round robin)."""
    from westa_ocr_spark.operators.extract import extract_pages
    from westa_ocr_spark.operators.partitioning import skew_split

    work = skew_split(
        spark.read.parquet(pages_parquet).select("url", "html")
    )
    plan = _plan(extract_pages(work))
    # exactly one exchange: the oversized-leg round robin
    assert plan.count("Exchange") <= 1
    assert "RoundRobinPartitioning" in plan or "Exchange" not in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark):
    sf = "/root/testdata/sf0.001"
    df = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,500)" in plan


def test_broadcast_join_is_broadcast(spark):
    from westa_ocr_spark.registry import QUERIES

    df = QUERIES["join_broadcast"][0](spark, "/root/testdata/sf0.001")
    assert "BroadcastHashJoin" in _plan(df)


def test_anti_join_strategy(spark):
    from westa_ocr_spark.registry import QUERIES

    plan = _plan(
        QUERIES["resume_anti_join"][0](spark, "/root/testdata/sf0.001")
    )
    assert "LeftAnti" in plan


def test_minhash_partial_aggregation(spark):
    """The min-per-seed aggregation must have a partial (map-side)
    phase so the shuffle carries one row per doc, not per shingle."""
    from westa_ocr_spark.registry import QUERIES

    plan = _plan(
        QUERIES["minhash_signatures"][0](spark, "/root/testdata/sf0.001")
    )
    assert "partial_min" in plan


def test_extraction_wholestage_codegen_around_scan(spark, pages_parquet):
    """JVM-side stages run under whole-stage codegen (textfns and
    registry expressions), keeping the Python boundary to the one
    mapInPandas extraction step."""
    from westa_ocr_spark.functions import textfns

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(
        docs.select(textfns.fingerprint(F.col("text")).alias("fp"))
    )
    assert "*(1)" in plan  # the codegen'd-stage marker
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan