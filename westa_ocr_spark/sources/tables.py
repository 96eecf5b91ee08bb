"""Keyed-table sink abstraction: Iceberg MERGE INTO with parquet fallback.

The reference's core sink is an idempotent keyed upsert —
``INSERT ... ON CONFLICT(job_id,page_index) DO UPDATE``
(``/root/reference/app/repository.py:230-265``). The Spark-native
equivalent is Iceberg ``MERGE INTO`` on ``(url, page_index)`` with
snapshot-isolated commits. The Iceberg runtime jar is not available in
this sandbox, so the same interface is served by a parquet-directory
implementation whose upsert is read -> anti-join old vs new keys ->
union -> atomic directory swap. Tests and the local pipeline run on the
fallback; on a real cluster ``IcebergTable`` is selected automatically
when the catalog is configured.

Scale note (parquet fallback): the rewrite is O(table), acceptable only
for incremental local runs — which is exactly why the real deployment
target is Iceberg, where MERGE rewrites only matching data files and
the commit is an O(1) metadata swap.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _dir_nonempty(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.endswith(".parquet") or name == "_SUCCESS"
        for name in os.listdir(path)
    )


class ParquetTable:
    """Directory-of-parquet keyed table with upsert semantics."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _recover(self) -> None:
        """Heal the crash window between the two swap renames.

        ``merge_upsert`` renames ``path -> __old`` then ``__tmp ->
        path``; a crash in between leaves ``path`` absent with the
        merged data stranded in ``__tmp`` (complete: it carries
        ``_SUCCESS``) and the prior data in ``__old``. Promote the
        newest complete ``__tmp`` if present, else restore the newest
        ``__old``; sweep any remaining leftovers.
        """
        if _dir_nonempty(self.path):
            return
        parent = os.path.dirname(self.path) or "."
        base = os.path.basename(self.path)
        if not os.path.isdir(parent):
            return
        tmps, olds = [], []
        for name in os.listdir(parent):
            full = os.path.join(parent, name)
            if name.startswith(f"{base}__tmp_") and _dir_nonempty(full):
                tmps.append(full)
            elif name.startswith(f"{base}__old_") and _dir_nonempty(full):
                olds.append(full)
        candidates = sorted(tmps, key=os.path.getmtime) or sorted(
            olds, key=os.path.getmtime
        )
        if candidates:
            os.rename(candidates[-1], self.path)
        for leftover in tmps + olds:
            shutil.rmtree(leftover, ignore_errors=True)

    def exists(self) -> bool:
        self._recover()
        return _dir_nonempty(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.path)

    def merge_upsert(
        self, spark: SparkSession, df: DataFrame, keys: list[str]
    ) -> None:
        """Upsert df by keys: new rows win over existing rows.

        Mirrors the reference's ON CONFLICT DO UPDATE
        (``/root/reference/app/repository.py:256-262``). The incoming
        batch is key-deduplicated first (J5 idempotency — duplicate
        requests collapse to one row, ``/root/reference/app/main.py:
        165-188``).
        """
        df = df.dropDuplicates(keys)
        if not self.exists():
            df.write.mode("overwrite").parquet(self.path)
            return
        existing = self.read(spark)
        kept = existing.join(df.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(df.select(*existing.columns))
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)


class IcebergTable:
    """Iceberg-backed keyed table (requires a configured catalog)."""

    def __init__(self, identifier: str) -> None:
        self.identifier = identifier

    def exists(self) -> bool:  # pragma: no cover - needs iceberg runtime
        return True

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        return spark.read.table(self.identifier)

    def merge_upsert(
        self, spark: SparkSession, df: DataFrame, keys: list[str]
    ) -> None:
        """Emit the Iceberg MERGE for an idempotent keyed upsert.

        The incoming batch is key-deduplicated first — Iceberg's MERGE
        throws on multiple source matches per target row, and the
        reference's ON CONFLICT contract collapses duplicate requests
        to one row anyway. Contract-tested through a stub session
        (tests/test_tables.py) since no Iceberg runtime jar ships in
        this sandbox; see scripts/submit.sh for the spark-submit
        recipe that enables the real catalog.
        """
        df = df.dropDuplicates(keys)
        view = f"_merge_src_{uuid.uuid4().hex[:8]}"
        df.createOrReplaceTempView(view)
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {self.identifier} t USING {view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        spark.catalog.dropTempView(view)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        conf = spark.conf
        for key in ("spark.sql.catalog.spark_catalog",
                    "spark.sql.catalog.iceberg"):
            try:
                if "iceberg" in (conf.get(key) or "").lower():
                    return True
            except Exception:
                continue
    except Exception:
        pass
    return False


def keyed_table(spark: SparkSession, location: str):
    """Pick the best available keyed-table implementation."""
    if iceberg_available(spark) and "/" not in location:
        return IcebergTable(location)  # pragma: no cover
    return ParquetTable(location)


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist a frame bucketed+sorted by ``key`` (saveAsTable — the
    bucket metadata lives in the session catalog).

    Bucketing pre-shuffles ONCE at write time: any later equi-join or
    aggregation on ``key`` between tables bucketed the same way runs
    with NO exchange — the 100-TB pattern for repeatedly-joined keyed
    state (committed extractions, manifests, dedup groups), where one
    write-time shuffle amortizes across every downstream run. The
    plan-audit test asserts the bucketed self-join is exchange-free.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )
