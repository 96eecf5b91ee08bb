"""Custom stateful streaming operator: cross-batch first-seen dedupe.

``applyInPandasWithState`` implementation of the reference's
idempotency contract in continuous mode: the first arrival of each key
passes through, later duplicates are dropped, with per-key state
(first-seen timestamp + hit count) kept by the state store across
micro-batches.

This is the streaming analogue of the batch sink-side key dedupe
(plans/pipeline.py) and of the reference's duplicate-request check
(``/root/reference/app/main.py:165-188``).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUPED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("first_seen_batch", T.LongType(), False),
        T.StructField("duplicates_dropped", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType(), False),
        T.StructField("hits", T.LongType(), False),
        T.StructField("batch", T.LongType(), False),
    ]
)


def _dedupe_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    rows = sum(len(p) for p in pdfs)
    if state.exists:
        seen, hits, batch = state.get
        state.update((True, hits + rows, batch))
        return iter(())  # duplicate key: emit nothing
    batch_id = int(state.getCurrentProcessingTimeMs())
    state.update((True, rows - 1, batch_id))
    return iter(
        [
            pd.DataFrame(
                {
                    "url": [key[0]],
                    "first_seen_batch": [batch_id],
                    "duplicates_dropped": [rows - 1],
                }
            )
        ]
    )


def streaming_first_seen(stream: DataFrame,
                         key_col: str = "url") -> DataFrame:
    """First occurrence of each key across all micro-batches."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _dedupe_fn,
            outputStructType=DEDUPED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            # NoTimeout: a processing-time timeout keeps the query
            # scheduling wake-up batches forever, so availableNow never
            # drains; long-running deployments bound state size by
            # restarting with a fresh checkpoint epoch instead
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_first_seen_stream(spark, input_dir: str, out_dir: str,
                            schema: T.StructType):
    """File stream -> stateful first-seen dedupe -> parquet sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    deduped = streaming_first_seen(stream.select("url"))
    return (
        deduped.writeStream.format("parquet")
        .option("path", f"{out_dir}/first_seen")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
