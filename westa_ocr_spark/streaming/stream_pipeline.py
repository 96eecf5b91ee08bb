"""Structured Streaming variant of the extraction pipeline.

The reference is a continuous service (queue + worker threads,
``/root/reference/app/main.py:363,386-400``); its batch semantics are
fully covered by the checkpointed-resume batch job (SURVEY.md §2.8 —
no watermarks/event-time state exist in the reference), but a
file-source streaming deployment is the natural continuous-ingest
shape: new page files land in a directory, each micro-batch extracts
and appends, and the checkpoint directory provides exactly-once
progress tracking (the streaming analogue of the reference's startup
re-enqueue, ``/root/reference/app/main.py:402-406``).

``mapInPandas`` works unchanged on streaming DataFrames, so the exact
same Arrow-batched extraction operator serves both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from westa_ocr_spark.operators.extract import extract_pages

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream over a directory of pages parquet files."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    *,
    trigger_available_now: bool = True,
):
    """Extract pages continuously: stream -> mapInPandas -> append sink.

    ``availableNow`` drains everything currently in the directory and
    stops (batch-equivalent, used by tests); drop the trigger for a
    long-running tail. The checkpoint makes restarts resume from the
    last committed micro-batch — per-file exactly-once, the streaming
    counterpart of the batch anti-join resume.
    """
    stream = read_pages_stream(spark, input_dir)
    extracted = extract_pages(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", f"{out_dir}/extracted")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
