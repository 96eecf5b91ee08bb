"""End-to-end extraction job (SURVEY.md §3.1 lifecycle, Spark-first).

    read pages -> dropDuplicates(url)            # idempotency dedupe (J5)
      -> anti-join committed output              # checkpointed resume (J4)
      -> skew-aware repartition                  # page fan-out analogue (T2)
      -> mapInPandas(extract)                    # split + extract (D1, D2)
      -> stage write (single execution)          # one pass over the bytes
      -> keyed upsert sink (url, page_index)     # idempotent write-back (S6)
      -> groupBy(url) manifest                   # job summary (A1-A7)
      -> per-partition lineage                   # gemini_logs analogue (S7)

Reference lifecycle: ``/root/reference/app/worker.py:170-505``.

The expensive stage (decode+extract over raw bytes) executes exactly
once: its output is staged to parquet, and the lineage aggregation, the
keyed merge, and the manifest all derive from the staged data. The
extraction partition id is captured in the same stage as the extract
(no shuffle in between), so lineage rows reflect the real executor
partitions.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from westa_ocr_spark.operators.extract import extract_pages
from westa_ocr_spark.operators.manifest import build_lineage, build_manifest
from westa_ocr_spark.operators.partitioning import (
    OVERSIZED_THRESHOLD,
    skew_repartition,
)
from westa_ocr_spark.operators.resume import resume_filter
from westa_ocr_spark.sources.tables import ParquetTable


@dataclass
class ExtractionResult:
    docs_in: int
    rows_written: int
    docs_done: int
    docs_error: int
    out_dir: str
    resumed_skipped: int = 0
    stages: dict = field(default_factory=dict)


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame | str,
    out_dir: str,
    *,
    num_partitions: int | None = None,
    resume: bool = True,
    run_id: str = "run",
    oversized_threshold: int = OVERSIZED_THRESHOLD,
) -> ExtractionResult:
    """Run the full extraction lifecycle; returns counters for the caller.

    ``pages`` is a DataFrame or a parquet path of the input table
    (url, warc_ts, html, text, lang).
    """
    if isinstance(pages, str):
        pages = spark.read.parquet(pages)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    extracted_tbl = ParquetTable(f"{out_dir}/extracted")
    manifest_tbl = ParquetTable(f"{out_dir}/manifest")
    lineage_tbl = ParquetTable(f"{out_dir}/lineage")

    # prune to the two columns extraction needs before any shuffle: the
    # parquet scan then reads only url+html (ReadSchema pruning).
    work = pages.select("url", "html").dropDuplicates(["url"])
    docs_in = work.count()

    resumed_skipped = 0
    if resume and extracted_tbl.exists():
        done = extracted_tbl.read(spark)
        work = resume_filter(work, done, key="url")
        resumed_skipped = docs_in - work.count()

    work = skew_repartition(
        work, num_partitions, oversized_threshold=oversized_threshold
    )
    extracted = extract_pages(work).withColumn(
        "_pid", F.spark_partition_id()
    )

    # single execution of the extract stage: stage to parquet, derive
    # lineage + merge + manifest from the staged result.
    staging = ParquetTable(f"{out_dir}/_staging_{run_id}")
    staging.overwrite(extracted)
    staged = staging.read(spark)

    lineage_tbl.append(build_lineage(staged, run_id))

    extracted_tbl.merge_upsert(
        spark, staged.drop("_pid"), keys=["url", "page_index"]
    )
    shutil.rmtree(staging.path, ignore_errors=True)

    committed = extracted_tbl.read(spark)
    manifest = build_manifest(committed)
    manifest_tbl.overwrite(manifest)

    man = manifest_tbl.read(spark)
    docs_done = man.filter("status = 'DONE'").count()
    docs_error = man.filter("status = 'ERROR'").count()
    return ExtractionResult(
        docs_in=docs_in,
        rows_written=committed.count(),
        docs_done=docs_done,
        docs_error=docs_error,
        out_dir=out_dir,
        resumed_skipped=resumed_skipped,
    )
