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
from pyspark.sql.functions import col as F_col


def _dir_nonempty(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.endswith(".parquet") or name == "_SUCCESS"
        for name in os.listdir(path)
    )


class ParquetTable:
    """Directory-of-parquet keyed table with upsert semantics.

    ``partition_by`` names a hive-style partition column (e.g.
    ``url_bucket = pmod(xxhash64(url), N)``). A partitioned table
    buys two things at scale: partition-PRUNED incremental reads
    (the manifest semi-join scans only this run's buckets) and a
    merge that rewrites only the AFFECTED buckets — unaffected bucket
    directories are renamed into the new table generation, an O(1)
    metadata move per bucket instead of an O(table) rewrite. This is
    the parquet approximation of Iceberg's file-level MERGE.
    """

    _MOVE_MARKER = "_MERGE_MOVES"

    def __init__(self, path: str, partition_by: str | None = None) -> None:
        self.path = path
        self.partition_by = partition_by

    def _recover(self) -> None:
        """Heal the crash windows of ``merge_upsert``.

        Phase order on a partitioned merge: (1) write affected buckets
        to ``__tmp`` + write a ``_MERGE_MOVES`` marker naming them,
        (2) rename unaffected bucket dirs ``path -> __tmp``,
        (3) remove the marker, (4) rename ``path -> __old`` then
        ``__tmp -> path``. Recovery: a marker-bearing ``__tmp`` means
        phase 2 may be half-done — move the non-affected dirs BACK
        (they are the committed table's data; the affected dirs are
        the uncommitted merge) and discard the tmp. After that the
        classic swap-window logic applies: ``path`` absent with a
        complete (marker-free) ``__tmp`` promotes it, else the newest
        ``__old`` is restored; leftovers are swept.
        """
        parent = os.path.dirname(self.path) or "."
        base = os.path.basename(self.path)
        if not os.path.isdir(parent):
            return
        # phase-2 undo: interrupted partition-move merges
        for name in list(os.listdir(parent)):
            full = os.path.join(parent, name)
            marker = os.path.join(full, self._MOVE_MARKER)
            if not (name.startswith(f"{base}__tmp_")
                    and os.path.isfile(marker)):
                continue
            with open(marker, encoding="utf-8") as fh:
                affected = set(fh.read().split())
            os.makedirs(self.path, exist_ok=True)
            for entry in os.listdir(full):
                src = os.path.join(full, entry)
                if (os.path.isdir(src) and entry not in affected
                        and not os.path.exists(
                            os.path.join(self.path, entry))):
                    os.rename(src, os.path.join(self.path, entry))
            shutil.rmtree(full, ignore_errors=True)
        if _dir_nonempty(self.path):
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

    def _writer(self, df: DataFrame):
        w = df.write
        if self.partition_by and self.partition_by in df.columns:
            w = w.partitionBy(self.partition_by)
        return w

    def append(self, df: DataFrame) -> None:
        self._writer(df).mode("append").parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        self._writer(df).mode("overwrite").parquet(self.path)

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
            self.overwrite(df)
            return
        if self.partition_by and self.partition_by in df.columns:
            self._merge_partitioned(spark, df, keys)
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

    def compact(self, spark: SparkSession) -> None:
        """Small-file compaction: rewrite the table so each partition
        holds one file (the extract write fans every task into every
        bucket dir, so files accumulate as tasks x buckets x runs —
        the same reason Iceberg ships rewrite_data_files). One shuffle
        hash-partitioned on the partition column routes each bucket to
        exactly one task; the swap reuses the crash-safe tmp/old
        rename protocol."""
        df = self.read(spark)
        if self.partition_by and self.partition_by in df.columns:
            df = df.repartition(F_col(self.partition_by))
        else:
            df = df.coalesce(1)
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        w = df.write
        if self.partition_by and self.partition_by in df.columns:
            w = w.partitionBy(self.partition_by)
        w.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def _merge_partitioned(
        self, spark: SparkSession, df: DataFrame, keys: list[str]
    ) -> None:
        """Bucket-scoped merge: rewrite only the partitions the batch
        touches; every other bucket directory is renamed (not copied)
        into the new table generation. IO is O(affected buckets), the
        parquet stand-in for Iceberg's file-level MERGE INTO."""
        from pyspark.sql import functions as F

        pcol = self.partition_by
        affected_vals = sorted(
            r[0] for r in df.select(pcol).distinct().collect()
        )
        affected_dirs = {f"{pcol}={v}" for v in affected_vals}
        existing = self.read(spark).filter(F.col(pcol).isin(affected_vals))
        kept = existing.join(df.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(
            df.select(*existing.columns)
        )
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.partitionBy(pcol).mode("overwrite").parquet(tmp)
        # journal the move phase so _recover can undo a half-done one
        with open(os.path.join(tmp, self._MOVE_MARKER), "w",
                  encoding="utf-8") as fh:
            fh.write("\n".join(sorted(affected_dirs)))
        for entry in os.listdir(self.path):
            src = os.path.join(self.path, entry)
            if os.path.isdir(src) and entry not in affected_dirs:
                os.rename(src, os.path.join(tmp, entry))
        os.remove(os.path.join(tmp, self._MOVE_MARKER))
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
