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
* oversized rows (``octet_length(html) >= threshold``) -> round-robin
  ``repartition(k)``: balances counts with zero global coordination.
  (An exact row_number+range assignment was tried first and reverted:
  its global window sorts the whole oversized leg through one task —
  a measured serial bottleneck. Round-robin's worst case is a small
  constant imbalance per input partition, which vanishes for any
  realistic number of oversized rows.)

The two legs are unioned; a union concatenates partition lists without
another shuffle, so the extract stage sees len(small)+len(big)
partitions. At 100 TB this is one extra scan-side filter per leg and
no extra shuffle beyond the repartition that was needed anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OVERSIZED_THRESHOLD = 256 * 1024


def skew_split(
    pages: DataFrame,
    oversized_threshold: int = OVERSIZED_THRESHOLD,
    big_partitions: int | None = None,
    payload_col: str = "html",
    key_col: str = "url",
) -> DataFrame:
    """Split oversized payloads into their own balanced partitions.

    Assumes the input is already usefully partitioned (in the
    pipeline, ``dropDuplicates(url)``'s exchange provides url-hash
    partitioning for free); the small leg is passed through untouched
    (filters preserve partitioning — NO extra shuffle of the payload
    bytes), while the oversized leg is round-robin rebalanced.

    Round-robin (``repartition(k)`` without columns) balances counts
    without any global coordination. A row_number window would balance
    *exactly*, but its global sort funnels every oversized payload
    through ONE task — measured as a flat ~30 s serial bottleneck at
    200k docs. Spark's sort-before-round-robin is per-partition and
    stays parallel.

    NULL payloads size as 0 (coalesce) so they flow to the small leg
    and reach the per-row ERROR path; a bare octet_length(NULL) is
    NULL and would fail BOTH filters, silently dropping the row.
    """
    size = F.coalesce(F.octet_length(F.col(payload_col)), F.lit(0))
    small = pages.filter(size < F.lit(oversized_threshold))
    k = big_partitions or 32
    big = pages.filter(size >= F.lit(oversized_threshold)).repartition(k)
    return small.unionByName(big)


def skew_repartition(
    pages: DataFrame,
    num_partitions: int,
    oversized_threshold: int = OVERSIZED_THRESHOLD,
    big_partitions: int | None = None,
    payload_col: str = "html",
    key_col: str = "url",
) -> DataFrame:
    """skew_split plus an explicit url-hash repartition of the small
    leg — for callers whose input has no useful partitioning yet."""
    size = F.coalesce(F.octet_length(F.col(payload_col)), F.lit(0))
    small = (
        pages.filter(size < F.lit(oversized_threshold))
        .repartition(num_partitions, F.xxhash64(F.col(key_col)))
    )
    big = skew_split(
        pages.filter(size >= F.lit(oversized_threshold)),
        oversized_threshold=oversized_threshold,
        big_partitions=big_partitions or num_partitions,
        payload_col=payload_col,
        key_col=key_col,
    )
    return small.unionByName(big)
