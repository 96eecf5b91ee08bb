"""Structured Streaming parity queries: the streaming pipelines run in
complete mode over a bounded replay so DuckDB can oracle them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from westa_ocr_spark.functions import textfns  # noqa: F401
from westa_ocr_spark.functions.textfns import round_det  # noqa: F401
from westa_ocr_spark.queries.common import (  # noqa: F401
    _SQL_NORM, _SQL_WORDS, _sql_lang_best, _sql_lang_from_best,
    _sql_lang_scores, _sql_occ, _sql_punct_ratio, _sql_quality,
    _sql_round_det, _sql_shingles, _sql_simhash16, _sql_stop_ratio,
    _sql_token_count, _t,
)

# ---------------------------------------------------------------------------
# Streaming parity: the drained complete-mode stream equals the batch
# aggregate, so the streaming surface gets a real DuckDB oracle row.

def _q_stream_windowed_counts(spark, sf):
    from westa_ocr_spark.streaming.stream_pipeline import (
        windowed_counts_complete,
    )

    return windowed_counts_complete(
        spark, _t(spark, sf, "events").select("ts", "event_type")
    )


_SQL_STREAM_WINDOWED_COUNTS = (
    "SELECT cast(floor(epoch(ts) / 600) * 600 AS bigint) AS window_start, "
    "event_type, count(*) AS n FROM events GROUP BY 1, 2"
)



# ---------------------------------------------------------------------------
# Streaming session windows (stateful gap-merge) vs gap-island SQL

def _q_stream_session_windows(spark, sf):
    from westa_ocr_spark.streaming.stream_pipeline import (
        session_windows_complete,
    )

    return session_windows_complete(
        spark,
        _t(spark, sf, "events").filter(F.col("user_id") < 200)
        .select("ts", "user_id"),
    )


_SQL_STREAM_SESSION_WINDOWS = (
    "WITH flagged AS (SELECT user_id, ts, CASE WHEN "
    "epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
    "> 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "THEN 1 ELSE 0 END AS new_session "
    "FROM events WHERE user_id < 200), "
    "islands AS (SELECT user_id, ts, sum(new_session) OVER ("
    "PARTITION BY user_id ORDER BY ts "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess "
    "FROM flagged) "
    "SELECT user_id, cast(floor(epoch(min(ts))) AS bigint) "
    "AS session_start, count(*) AS n_events "
    "FROM islands GROUP BY user_id, sess"
)




# name -> (Spark DataFrame fn, DuckDB oracle SQL or None).
DEFS = {
    "stream_windowed_counts": (_q_stream_windowed_counts, _SQL_STREAM_WINDOWED_COUNTS),
    "stream_session_windows": (_q_stream_session_windows, _SQL_STREAM_SESSION_WINDOWS),
}
