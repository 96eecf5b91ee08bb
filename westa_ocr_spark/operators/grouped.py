"""Grouped pandas operators (``groupBy().applyInPandas``).

Per-group vectorized transforms that genuinely need pandas semantics
(whole-group normalization) — the third leg of the pandas-UDF surface
next to scalar ``mapInPandas`` (extraction) and
``applyInPandasWithState`` (streaming state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def normalize_quality_per_group(docs: DataFrame, group_col: str,
                                value_col: str) -> DataFrame:
    """Per-group z-score normalization via grouped applyInPandas.

    Completes the pandas-UDF surface (scalar mapInPandas for
    extraction, applyInPandasWithState for streaming state, grouped
    applyInPandas here): each group arrives as one pandas DataFrame,
    is normalized vectorized, and returns (id, group, value, zscore).
    Deterministic: mean/std are order-independent within float noise,
    and the output is rounded to 6 dp.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField(group_col, T.StringType(), True),
            T.StructField(value_col, T.DoubleType(), True),
            T.StructField("zscore", T.DoubleType(), True),
        ]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vals = pdf[value_col].astype("float64")
        # sort before reducing so the summation order (and thus the
        # float result) is independent of partition arrival order
        ordered = vals.sort_values().to_numpy()
        mean = ordered.mean()
        std = ordered.std() or 1.0  # population std; 0 -> 1.0
        out = pdf[["doc_id", group_col, value_col]].copy()
        # round_det formula (floor(x*1e6 + 0.5)/1e6), NOT np.round:
        # half-to-even would diverge from the SQL-side oracle rounding
        out["zscore"] = np.floor((vals - mean) / std * 1e6 + 0.5) / 1e6
        return out

    return docs.select("doc_id", group_col, value_col).groupBy(
        group_col
    ).applyInPandas(norm, schema=schema)
