"""End-to-end corpus dedup job: exact -> near-dup -> survivors.

The runnable counterpart to ``plans.pipeline`` for the dedup side of
a training-data build:

1. **exact pass** — ``keep_canonical``: one fingerprint aggregation
   keeps the minimum-id copy of each distinct normalized content;
2. **near-dup pass** — 128-perm x 16-band MinHash LSH candidate pairs
   over the exact survivors, resolved to groups by connected
   components (pointer doubling); every group keeps its canonical
   (minimum-id) member;
3. **report** — input/exact/near/survivor counts for lineage.

Shuffle budget: fingerprint agg (1), signature agg + band self-join +
CC rounds over the (tiny) candidate edge set, final semi-join. The
text payload crosses a shuffle exactly once (the fingerprint agg
carries md5s, the LSH path carries hashes — both fixed-width), so at
crawl scale the job is bounded by scans, not payload movement.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from westa_ocr_spark.operators.dedup import (
    duplicate_groups,
    keep_canonical,
)


@dataclass
class DedupResult:
    docs_in: int
    exact_survivors: int
    near_dup_groups: int
    docs_out: int
    survivors: DataFrame


def run_dedup_job(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_perm: int = 128, bands: int = 16) -> DedupResult:
    """Exact + near-dup dedup; returns survivors and counters."""
    docs_in = docs.count()
    exact = keep_canonical(docs, id_col, text_col).localCheckpoint(
        eager=True
    )
    exact_n = exact.count()

    groups = duplicate_groups(
        exact, id_col, text_col, num_perm=num_perm, bands=bands
    ).localCheckpoint(eager=True)
    n_groups = groups.select("canonical_id").distinct().count()

    # drop every grouped doc except its canonical member; docs in no
    # group pass through untouched (left_anti against the non-canon set)
    non_canonical = groups.filter(
        F.col("doc_id") != F.col("canonical_id")
    ).select(F.col("doc_id").alias(id_col))
    survivors = exact.join(non_canonical, id_col, "left_anti")
    return DedupResult(
        docs_in=docs_in,
        exact_survivors=exact_n,
        near_dup_groups=n_groups,
        docs_out=survivors.count(),
        survivors=survivors,
    )
