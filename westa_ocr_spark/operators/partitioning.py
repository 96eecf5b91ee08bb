"""Skew-aware repartitioning for heterogeneous page payloads.

The reference fans a large document out into independent page tasks so
any worker can pick them up (``/root/reference/app/worker.py:284-286``).
The batch analogue of that load-balancing is payload-size-aware
partitioning: AQE's skew handling only splits skewed *shuffle* blocks
for joins/aggs, not a size-skewed mapInPandas stage, so oversized
payloads are balanced explicitly (SURVEY.md §4.3).

Strategy:
* normal rows -> hash-partition on ``xxhash64(url)`` (uniform, and
  co-locates re-runs of the same url deterministically);
* oversized rows (``octet_length(html) >= threshold``) -> dense
  ``row_number`` over ``xxhash64(url)`` then ``repartitionByRange`` on
  it, which bounds every partition to ceil(n_big/k) big rows exactly
  (plain round-robin ``repartition(k)`` gives no such guarantee: each
  input partition starts its round-robin at an arbitrary offset, so big
  rows can still pile up). The global window is cheap because the
  oversized leg is tiny by definition (~1% of rows).

The two legs are unioned; a union concatenates partition lists without
another shuffle, so the extract stage sees len(small)+len(big)
partitions. At 100 TB this is one extra scan-side filter per leg and
no extra shuffle beyond the repartition that was needed anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OVERSIZED_THRESHOLD = 256 * 1024


def skew_repartition(
    pages: DataFrame,
    num_partitions: int,
    oversized_threshold: int = OVERSIZED_THRESHOLD,
    big_partitions: int | None = None,
    payload_col: str = "html",
    key_col: str = "url",
) -> DataFrame:
    """Partition pages so per-partition extraction cost is balanced."""
    size = F.octet_length(F.col(payload_col))
    small = (
        pages.filter(size < F.lit(oversized_threshold))
        .repartition(num_partitions, F.xxhash64(F.col(key_col)))
    )
    k = big_partitions or num_partitions
    big = (
        pages.filter(size >= F.lit(oversized_threshold))
        .withColumn(
            "_rn",
            F.row_number().over(Window.orderBy(F.xxhash64(F.col(key_col)))),
        )
        .repartitionByRange(k, "_rn")
        .drop("_rn")
    )
    return small.unionByName(big)
