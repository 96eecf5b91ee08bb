"""End-to-end extraction job (SURVEY.md §3.1 lifecycle, Spark-first).

    read pages -> [resume anti-join] -> skew split (oversized leg)
      -> mapInPandas(extract)        -> staged write (single pass)
      -> key-dedupe check / promote / merge into keyed sink
      -> per-partition lineage       -> groupBy(url) manifest

Reference lifecycle: ``/root/reference/app/worker.py:170-505``.

Shuffle budget — the hot path is **zero-shuffle**: scan -> extract ->
write is a narrow pipeline over the input splits (only the ~1%
oversized leg takes a tiny round-robin exchange, and the resume
anti-join only exists on restart runs). The J5 idempotency dedupe
happens at the *sink*, over the extracted keys (url, page_index):
deduplicating after extraction trades a sliver of wasted CPU on
duplicate inputs for never shuffling raw payload bytes — at 100 TB
the payload shuffle is the single most expensive thing a plan can do,
and extracted text is ~5-10x smaller than the html it came from.

The extract stage executes once: its output is staged to parquet and
the lineage, the key-dedupe check, the sink promote/merge, and the
manifest all derive from the staged files. On a fresh sink with no
duplicate keys the staging directory simply *is* the sink (written in
place, no rewrite); re-runs and dup-bearing batches pay the
parquet-fallback merge (Iceberg MERGE INTO makes that a metadata
commit on a real deployment — see sources/tables.py).
"""

from __future__ import annotations

import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from westa_ocr_spark.operators.extract import extract_pages
from westa_ocr_spark.operators.manifest import build_manifest
from westa_ocr_spark.operators.partitioning import (
    OVERSIZED_THRESHOLD,
    skew_split,
)
from westa_ocr_spark.operators.resume import resume_filter
from westa_ocr_spark.sources.tables import ParquetTable

# Hive-partition count for the extracted sink: url_bucket =
# pmod(xxhash64(url), SINK_BUCKETS). Buys partition-PRUNED
# incremental manifest reads and bucket-scoped merges (only touched
# buckets rewrite). The sink write fans each extract task into one
# file PER bucket, so file count = tasks x buckets — measured locally
# (50k docs, 32 cores): 32 buckets 7.9s, 16 buckets 5.3s, 8 buckets
# 4.6s end-to-end. 16 balances prune granularity against small-file
# overhead at this scale; a 100-TB deployment raises it (or uses
# Iceberg bucket(N, url) transforms, where compaction absorbs the
# file-count cost) to keep each bucket executor-memory sized.
SINK_BUCKETS = 16

# Compaction cadence: each incremental run adds up to one file per
# (extract task x touched bucket), so files-per-bucket grows linearly
# with run count. When the fullest bucket exceeds this bound, the
# pipeline tail runs ParquetTable.compact (one shuffle, one file per
# bucket) — the amortized cost is one rewrite every ~bound/tasks runs,
# the same policy as Iceberg's rewrite_data_files maintenance action.
COMPACT_FILES_PER_BUCKET = 64


def _max_files_per_bucket(path: str) -> int:
    """Fullest partition directory's parquet-file count (0 if none)."""
    import os

    worst = 0
    if not os.path.isdir(path):
        return 0
    for name in os.listdir(path):
        d = os.path.join(path, name)
        if "=" in name and os.path.isdir(d):
            n = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
            worst = max(worst, n)
    return worst


@dataclass
class ExtractionResult:
    docs_in: int            # committed docs (manifest rows, all-time)
    docs_processed: int     # docs extracted by THIS run
    rows_written: int       # committed page rows (all-time)
    docs_done: int
    docs_error: int
    out_dir: str
    resumed_skipped: int = 0
    stages: dict = field(default_factory=dict)
    # measured rewrite amplification of this run's incremental merge
    # (None on fresh runs / resume-skips) — the O(delta) evidence
    merge_stats: dict | None = None
    compacted: bool = False  # True when the tail ran sink compaction


def cancel_extraction(spark: SparkSession, job_group: str) -> None:
    """Cancel a running extraction launched with ``job_group``.

    The batch analogue of the reference's job cancellation (T6,
    ``/root/reference/app/worker.py`` cancel path): every Spark action
    of the tagged run is interrupted; the staging/sink state it leaves
    behind is exactly what checkpointed resume recovers from, so a
    cancelled run re-runs safely.
    """
    spark.sparkContext.cancelJobGroup(job_group)


def committed_for_run(
    spark: SparkSession, extracted_tbl: ParquetTable, staged: DataFrame
) -> DataFrame:
    """Partition-pruned view of the committed sink for one run.

    Filters the sink scan to the run's ``url_bucket`` values BEFORE
    the url semi-join, so the parquet read carries PartitionFilters
    (plan-asserted in tests/test_plans.py) instead of scanning every
    bucket of an arbitrarily large table.
    """
    buckets = [
        r[0] for r in staged.select("url_bucket").distinct().collect()
    ]
    return extracted_tbl.read(spark).filter(
        F.col("url_bucket").isin(buckets)
    )


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame | str,
    out_dir: str,
    *,
    num_partitions: int | None = None,
    resume: bool = True,
    run_id: str = "run",
    oversized_threshold: int = OVERSIZED_THRESHOLD,
    job_group: str | None = None,
    sink_buckets: int = SINK_BUCKETS,
    compact_files_per_bucket: int = COMPACT_FILES_PER_BUCKET,
) -> ExtractionResult:
    """Run the full extraction lifecycle; returns counters.

    ``pages`` is a DataFrame or a parquet path of the input table
    (url, warc_ts, html, text, lang). Pass ``job_group`` to make the
    run cancellable via :func:`cancel_extraction` (interrupt-on-cancel
    is set so running tasks stop, not just queued ones).
    """
    stages: dict[str, float] = {}
    merge_stats: dict | None = None
    compacted = False
    _t0 = time.time()

    if job_group is not None:
        spark.sparkContext.setJobGroup(
            job_group, f"extraction {run_id}", interruptOnCancel=True
        )

    def _mark(name: str) -> None:
        nonlocal _t0
        stages[name] = round(time.time() - _t0, 3)
        _t0 = time.time()

    if isinstance(pages, str):
        pages = spark.read.parquet(pages)

    extracted_tbl = ParquetTable(
        f"{out_dir}/extracted", partition_by="url_bucket"
    )
    manifest_tbl = ParquetTable(f"{out_dir}/manifest")
    lineage_tbl = ParquetTable(f"{out_dir}/lineage")

    # sweep leftovers of cancelled/crashed runs: every temp dir is
    # re-derived from scratch by the run that needs it, so stale ones
    # are pure garbage (committed state lives only in the three
    # tables above, which have their own crash recovery)
    import os

    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith(("_staging_", "_manifest_opt_",
                                "_dedup_")):
                shutil.rmtree(os.path.join(out_dir, name),
                              ignore_errors=True)

    # prune to the two columns extraction needs; the parquet scan then
    # reads only url+html (ReadSchema pruning).
    work = pages.select("url", "html")

    resumed_skipped = 0
    if resume and extracted_tbl.exists():
        # the done-keys side is the MANIFEST (one tiny row per
        # committed url) rather than the per-page sink: the anti-join
        # probe shrinks by the pages-per-doc factor and never touches
        # the wide table. A crash between sink merge and manifest
        # upsert can only UNDER-report done urls — those docs
        # re-extract and the idempotent keyed sink absorbs them
        # (at-least-once, the T4/T5 contract).
        if manifest_tbl.exists():
            done = manifest_tbl.read(spark)
            resumed_skipped = done.count()
        else:
            done = extracted_tbl.read(spark)
            resumed_skipped = done.select("url").distinct().count()
        work = resume_filter(work, done, key="url")
        _mark("resume_plan")
    work = skew_split(work, oversized_threshold=oversized_threshold,
                      big_partitions=num_partitions)

    extracted = extract_pages(work).withColumn(
        "url_bucket",
        F.pmod(F.xxhash64("url"), F.lit(sink_buckets)).cast("int"),
    )

    # single execution: stage to parquet (in place on a fresh sink —
    # hive-partitioned by url_bucket so later incremental runs get
    # pruned reads and bucket-scoped merges; the narrow extract write
    # stays shuffle-free, each task fans its rows into bucket dirs).
    first_run = not extracted_tbl.exists()
    staging_path = (
        extracted_tbl.path if first_run
        else f"{out_dir}/_staging_{run_id}"
    )
    writer = extracted.write.mode("overwrite")
    if first_run:
        writer = writer.partitionBy("url_bucket")
    writer.parquet(staging_path)
    _mark("extract_and_stage")

    # The bucket-partitioned staging dir holds tasks x buckets SMALL
    # files. The session's input-split size is tuned for the big scan
    # (small splits = extract parallelism); re-reading ~1000 tiny
    # staged files under the same setting fans the tail jobs
    # (key-stats, lineage, manifest) into hundreds of near-empty
    # tasks whose scheduling dominates. Pack them: bump split size /
    # drop per-file open cost for the tail, restore on exit.
    conf_saved = {
        "spark.sql.files.maxPartitionBytes":
            spark.conf.get("spark.sql.files.maxPartitionBytes"),
        "spark.sql.files.openCostInBytes":
            spark.conf.get("spark.sql.files.openCostInBytes"),
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 20))
    try:
        staged = spark.read.parquet(staging_path)

        # per-partition lineage from the staged part files (one file per
        # extract partition) — the gemini_logs analogue
        # (/root/reference/app/repository.py:84-97), metrics only. The
        # lineage job is independent of everything downstream, so it runs
        # on its OWN thread while the key-stats/manifest jobs proceed —
        # Spark schedules concurrent jobs from one session fine, and at
        # bench scale these tail jobs are scheduling-bound constants that
        # would otherwise serialize (measured ~1.5 s saved per run).
        import threading

        lineage = (
            staged.groupBy(
                F.regexp_extract(F.input_file_name(), r"part-(\d+)", 1)
                .cast("int")
                .alias("partition_id")
            )
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("input_bytes").alias("input_bytes"),
                F.sum(
                    F.when(F.col("status") == "ERROR", 1).otherwise(0)
                ).alias("errors"),
            )
            .select(F.lit(run_id).alias("run_id"), "*")
        )
        lineage_err: list[BaseException] = []

        def _lineage_job() -> None:
            try:
                # job groups are thread-local: re-tag inside the thread so
                # cancel_extraction reaches the lineage job too
                if job_group is not None:
                    spark.sparkContext.setJobGroup(
                        job_group, f"extraction {run_id} (lineage)",
                        interruptOnCancel=True,
                    )
                lineage_tbl.append(lineage)
            except BaseException as exc:  # re-raised on join
                lineage_err.append(exc)

        lineage_thread = threading.Thread(target=_lineage_job, daemon=True)
        lineage_thread.start()
        _mark("lineage_submit")

        def _join_lineage() -> None:
            # The lineage job scans ``staged``'s files; call this BEFORE
            # any branch that deletes or replaces them (staging rmtree,
            # dup-key sink rewrite), or the still-running scan would hit
            # missing files and fail a run whose sink already committed.
            lineage_thread.join()
            if lineage_err:
                raise lineage_err[0]

        # fresh-sink runs: build the manifest OPTIMISTICALLY on a thread
        # overlapping the lineage job, confirmed by an atomic rename.
        # The J5 dup-key check NO LONGER runs its own countDistinct
        # scan: build_manifest's per-url ``distinct_blocks`` rides the
        # manifest shuffle, and summing the (tiny) manifest output
        # yields the global key stats — one scan of the staged files
        # where round 2 had two. (``first_run`` was decided before
        # staging — staging writes INTO the sink path on a fresh run,
        # so re-probing here would lie.)
        manifest_err: list[BaseException] = []
        opt_manifest_path = f"{out_dir}/_manifest_opt_{run_id}"
        manifest_thread = None
        if first_run:

            def _manifest_job() -> None:
                try:
                    if job_group is not None:
                        spark.sparkContext.setJobGroup(
                            job_group, f"extraction {run_id} (manifest)",
                            interruptOnCancel=True,
                        )
                    build_manifest(staged).write.mode("overwrite").parquet(
                        opt_manifest_path
                    )
                except BaseException as exc:
                    manifest_err.append(exc)

            manifest_thread = threading.Thread(
                target=_manifest_job, daemon=True
            )
            manifest_thread.start()

        if first_run:
            manifest_thread.join()
            if manifest_err:
                raise manifest_err[0]
            # global key stats from the manifest output (one row per
            # url): dup detection is still GLOBAL — per-url distinct
            # page counts sum to the corpus-wide distinct key count.
            mstats = (
                spark.read.parquet(opt_manifest_path)
                .agg(
                    F.sum("total_blocks").alias("rows"),
                    F.sum("distinct_blocks").alias("keys"),
                    F.count(F.lit(1)).alias("docs"),
                    F.count(
                        F.when(F.col("status") == "ERROR", F.lit(1))
                    ).alias("err_docs"),
                )
                .collect()[0]
            )
        else:
            # incremental runs have no manifest thread: one keys-only
            # aggregation over the (small) staged batch
            mstats = staged.agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("url", "page_index").alias("keys"),
                F.countDistinct("url").alias("docs"),
                F.countDistinct(
                    F.when(F.col("status") == "ERROR", F.col("url"))
                ).alias("err_docs"),
            ).collect()[0]
        run_rows, run_keys, run_docs = (
            int(mstats["rows"]), int(mstats["keys"]), int(mstats["docs"])
        )
        run_err_docs = int(mstats["err_docs"])
        has_dup_keys = run_keys != run_rows
        _mark("key_stats")
        if first_run:
            if has_dup_keys:
                # rare: duplicate urls inside the very first batch —
                # rewrite the sink deduplicated; the optimistic manifest
                # summarized pre-dedup rows, so discard and rebuild.
                # Lineage still reads the pre-rewrite files: drain it
                # before replacing them.
                _join_lineage()
                shutil.rmtree(opt_manifest_path, ignore_errors=True)
                deduped = staged.dropDuplicates(["url", "page_index"])
                tmp = ParquetTable(
                    f"{out_dir}/_dedup_{run_id}", partition_by="url_bucket"
                )
                tmp.overwrite(deduped)
                shutil.rmtree(extracted_tbl.path, ignore_errors=True)
                shutil.move(tmp.path, extracted_tbl.path)
                manifest_tbl.overwrite(
                    build_manifest(extracted_tbl.read(spark))
                )
            else:
                if manifest_err:
                    raise manifest_err[0]
                # confirm the optimistically-built manifest atomically
                shutil.rmtree(manifest_tbl.path, ignore_errors=True)
                shutil.move(opt_manifest_path, manifest_tbl.path)
        else:
            merge_stats = extracted_tbl.merge_upsert(
                spark, staged, keys=["url", "page_index"]
            )
            # manifest is maintained INCREMENTALLY: summarize only this
            # run's urls and upsert by url — re-summarizing the whole
            # committed table every run would be an O(table) pass that
            # dwarfs small incremental runs. Post-merge the sink rows for
            # this run's urls are final, so their manifest rows are too.
            committed = committed_for_run(spark, extracted_tbl, staged)
            run_manifest = build_manifest(
                committed.join(
                    staged.select("url").distinct(), "url", "left_semi"
                )
            )
            manifest_tbl.merge_upsert(spark, run_manifest, keys=["url"])
            _join_lineage()  # lineage scans staging_path — drain first
            shutil.rmtree(staging_path, ignore_errors=True)
            # small-file maintenance: each run fans tasks x buckets
            # files into the sink; when the fullest bucket crosses the
            # bound, repack to one file per bucket so read-side task
            # counts stay O(buckets), not O(buckets x runs)
            if (_max_files_per_bucket(extracted_tbl.path)
                    > compact_files_per_bucket):
                extracted_tbl.compact(spark)
                compacted = True
        _mark("sink_and_manifest")

        if first_run and not has_dup_keys:
            # fresh sink, no dup keys: all-time == this run, and the
            # key-stats shuffle already produced every counter — no
            # manifest-scan job needed (manifest status is ERROR iff the
            # url has >=1 error row, exactly countDistinct(ERROR url)).
            docs_in, rows_written = run_docs, run_rows
            docs_done, docs_error = run_docs - run_err_docs, run_err_docs
        else:
            # incremental or dedup-rewritten: counters must reflect the
            # committed all-time manifest — one tiny aggregation job
            stats = (
                manifest_tbl.read(spark)
                .groupBy("status")
                .agg(
                    F.count(F.lit(1)).alias("docs"),
                    F.sum("total_blocks").alias("rows"),
                )
                .collect()
            )
            docs_done = sum(r["docs"] for r in stats if r["status"] == "DONE")
            docs_error = sum(
                r["docs"] for r in stats if r["status"] == "ERROR"
            )
            docs_in = sum(r["docs"] for r in stats)
            rows_written = sum(r["rows"] for r in stats)
        _mark("counters")

        _join_lineage()  # no-op if a branch above already drained it
        _mark("lineage_join")
    finally:
        for _k, _v in conf_saved.items():
            spark.conf.set(_k, _v)

    if job_group is not None:
        # job groups are sticky per thread: don't tag the caller's
        # unrelated later jobs with this run's cancellable group
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        spark.sparkContext.setLocalProperty(
            "spark.job.interruptOnCancel", None
        )

    return ExtractionResult(
        docs_in=docs_in,
        docs_processed=run_docs,
        rows_written=rows_written,
        docs_done=docs_done,
        docs_error=docs_error,
        out_dir=out_dir,
        resumed_skipped=resumed_skipped,
        stages=stages,
        merge_stats=merge_stats,
        compacted=compacted,
    )


__all__ = ["ExtractionResult", "cancel_extraction", "run_extraction_job"]
