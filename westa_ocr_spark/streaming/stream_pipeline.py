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


def start_windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: T.StructType,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_minutes: int = 10,
    watermark_minutes: int = 30,
):
    """Watermarked event-time tumbling-window counts over a file stream.

    The late-data contract: rows older than ``watermark_minutes``
    behind the max observed event time are dropped; windows are
    emitted once finalized (append mode), so the sink holds exactly
    one row per (window, key). With ``availableNow`` the drained
    result equals the batch ``groupBy(window(...), key)`` over the
    same files minus still-open windows.
    """
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast is a pure reinterpretation
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    counts = (
        stream.withWatermark(ts_col, f"{watermark_minutes} minutes")
        .groupBy(
            F.window(F.col(ts_col), f"{window_minutes} minutes").alias(
                "win"
            ),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )
    return (
        counts.writeStream.format("parquet")
        .option("path", f"{out_dir}/windowed")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
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


def windowed_counts_complete(
    spark: SparkSession,
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_minutes: int = 10,
    n_files: int = 4,
) -> DataFrame:
    """Batch-equivalence proof for streaming windowed counts.

    Stages ``events`` as ``n_files`` parquet files, streams them back
    one file per micro-batch (so aggregation state genuinely crosses
    batch boundaries), and aggregates tumbling-window counts in
    COMPLETE mode into a memory sink. Unlike the watermarked append
    pipeline (:func:`start_windowed_counts_stream` — the production
    shape, which trades completeness of trailing windows for bounded
    state), complete mode re-emits the full aggregate each trigger, so
    the drained result equals the batch ``groupBy(window, key)``
    EXACTLY — which is what lets the DuckDB oracle verify the
    streaming surface (registry ``stream_windowed_counts``).

    Output: (window_start epoch-seconds, key, n) — epoch longs so the
    oracle compare is exact across engines.
    """
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    tag = uuid.uuid4().hex[:8]
    stage = os.path.join(tempfile.gettempdir(), f"wstream_{tag}")
    src = events.select(
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(key_col).alias("key"),
    )
    src.repartition(n_files).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.groupBy(
            F.window("ts", f"{window_minutes} minutes").alias("win"),
            "key",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wcounts_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        spark.table(name)
        .select(
            F.col("win.start").cast("long").alias("window_start"),
            F.col("key").alias(key_col),
            "n",
        )
        # the memory sink is session-lived; materialize rows so the
        # staged files can be deleted before returning
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(stage, ignore_errors=True)
    return out


def start_extraction_upsert_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
):
    """Streaming extraction into the IDEMPOTENT keyed sink.

    ``foreachBatch`` hands each micro-batch to the same
    ``merge_upsert`` the batch pipeline uses (keys ``(url,
    page_index)``), so the combination delivers the reference's
    at-least-once + dedupe contract continuously: a replayed
    micro-batch (restart between sink write and checkpoint commit)
    re-upserts the same keys and the table stays exactly-once. On a
    real deployment the table is Iceberg and each batch is one
    snapshot commit; here the parquet fallback provides the same
    interface (sources/tables.py).
    """
    from westa_ocr_spark.sources.tables import keyed_table

    table = keyed_table(spark, table_path)

    def sink(batch_df, batch_id: int) -> None:
        table.merge_upsert(
            batch_df.sparkSession, batch_df, keys=["url", "page_index"]
        )

    stream = read_pages_stream(spark, input_dir)
    return (
        extract_pages(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_windows_complete(
    spark: SparkSession,
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    n_files: int = 4,
) -> DataFrame:
    """Streaming SESSION windows (gap-merged state) with an exact
    batch twin.

    ``F.session_window`` merges a key's window state whenever a new
    event lands within ``gap_minutes`` of the session's end — the
    stateful operation that distinguishes sessions from tumbling
    windows. Complete mode + availableNow over multiple micro-batches
    exercises cross-batch session merging, and the drained result
    equals the batch ``groupBy(session_window(...))`` — which in turn
    equals the classic gap-island SQL (lag + running flag sum), so
    DuckDB can verify the whole thing (registry
    ``stream_session_windows``).

    Output: (user_id, session_start epoch-seconds, n_events).
    """
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    tag = uuid.uuid4().hex[:8]
    stage = os.path.join(tempfile.gettempdir(), f"sstream_{tag}")
    src = events.select(
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(key_col).alias("key"),
    )
    src.repartition(n_files).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            "key",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = f"sessions_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        spark.table(name)
        .select(
            F.col("key").alias(key_col),
            F.col("win.start").cast("long").alias("session_start"),
            "n_events",
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(stage, ignore_errors=True)
    return out
