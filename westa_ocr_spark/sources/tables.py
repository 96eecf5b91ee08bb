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


def _parquet_key_range(path: str, col: str):
    """(min, max) of ``col`` from the parquet footer, or None when any
    row group lacks usable statistics (then the caller must treat the
    file as possibly-overlapping). Parquet writers truncate long
    binary stats but keep them valid bounds (min is cut, max is cut
    and incremented), so range pruning on them stays conservative."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = None
        for i in range(md.num_columns):
            if md.schema.column(i).name == col:
                idx = i
                break
        if idx is None:
            return None
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        return None if lo is None else (lo, hi)
    except Exception:
        return None


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
        #: rewrite-amplification stats of the last partitioned merge
        self.last_merge_stats: dict | None = None

    def _recover(self) -> None:
        """Heal the crash windows of ``merge_upsert``.

        Phase order on a partitioned merge: (1) write affected buckets
        to ``__tmp`` + write a ``_MERGE_MOVES`` marker naming them,
        (2) rename unaffected bucket dirs ``path -> __tmp``,
        (3) rename ``path -> __old``, (4) rename ``__tmp -> path``
        (the marker travels with it), (5) remove the marker from the
        live path, (6) delete ``__old``. The marker survives through
        BOTH swap renames (round-3 bug: deleting it before the swap
        left a crash window where the live path held only the stale
        affected buckets yet recovery served it as complete).

        Recovery discrimination:

        * marker in the LIVE path -> phase-5 crash: the swap finished
          and the table is complete; drop the marker, sweep leftovers.
        * marker-bearing ``__tmp`` while ``path`` EXISTS -> phase-2
          window: the committed generation is (path + the unaffected
          dirs already moved into tmp); move those dirs back and
          discard the uncommitted merge.
        * marker-bearing ``__tmp`` while ``path`` is ABSENT -> the
          3->4 window: phase 2 must have completed (phase 3 only runs
          after), so tmp IS the complete new generation; promote it
          and drop the marker.

        After that the classic swap-window logic applies: ``path``
        absent with a complete marker-free ``__tmp`` promotes it, else
        the newest ``__old`` is restored; leftovers are swept.
        """
        parent = os.path.dirname(self.path) or "."
        base = os.path.basename(self.path)
        if not os.path.isdir(parent):
            return

        def _sweep() -> None:
            for name in list(os.listdir(parent)):
                if (name.startswith(f"{base}__tmp_")
                        or name.startswith(f"{base}__old_")):
                    shutil.rmtree(os.path.join(parent, name),
                                  ignore_errors=True)

        live_marker = os.path.join(self.path, self._MOVE_MARKER)
        if os.path.isfile(live_marker):
            # phase-5 crash: swap done, only cleanup remained
            os.remove(live_marker)
            _sweep()
            return
        for name in list(os.listdir(parent)):
            full = os.path.join(parent, name)
            marker = os.path.join(full, self._MOVE_MARKER)
            if not (name.startswith(f"{base}__tmp_")
                    and os.path.isfile(marker)):
                continue
            if os.path.exists(self.path):
                # phase-2 window: undo — move committed unaffected
                # dirs back, discard the uncommitted merge
                with open(marker, encoding="utf-8") as fh:
                    affected = set(fh.read().split())
                for entry in os.listdir(full):
                    src = os.path.join(full, entry)
                    if (os.path.isdir(src) and entry not in affected
                            and not os.path.exists(
                                os.path.join(self.path, entry))):
                        os.rename(src, os.path.join(self.path, entry))
                shutil.rmtree(full, ignore_errors=True)
            else:
                # 3->4 window: tmp holds the complete new generation
                os.rename(full, self.path)
                os.remove(os.path.join(self.path, self._MOVE_MARKER))
                _sweep()
                return
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
        self, spark: SparkSession, df: DataFrame, keys: list[str],
        unique_keys: bool = False,
    ) -> dict | None:
        """Upsert df by keys: new rows win over existing rows.

        Mirrors the reference's ON CONFLICT DO UPDATE
        (``/root/reference/app/repository.py:256-262``). The incoming
        batch is key-deduplicated first (J5 idempotency — duplicate
        requests collapse to one row, ``/root/reference/app/main.py:
        165-188``); a caller whose batch is ALREADY key-unique (e.g. a
        groupBy(keys) output) passes ``unique_keys=True`` to skip the
        dedup shuffle, which the partitioned path would otherwise pay
        once per evaluation of ``df`` (round 6, guide §2.4). On the
        partitioned path, returns the measured rewrite-amplification
        stats.
        """
        if not unique_keys:
            df = df.dropDuplicates(keys)
        if not self.exists():
            self.overwrite(df)
            return None
        if self.partition_by and self.partition_by in df.columns:
            return self._merge_partitioned(spark, df, keys)
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
    ) -> dict:
        """File-scoped merge: IO approaches O(delta), the parquet
        stand-in for Iceberg's file-level MERGE INTO.

        Two pruning levels, mirroring Iceberg's partition- then
        file-level planning:

        * unaffected bucket DIRECTORIES are renamed (not copied) into
          the new table generation — O(1) metadata per bucket;
        * within an affected bucket, a parquet FILE whose footer
          ``keys[0]`` min/max range cannot intersect the batch's key
          range for that bucket is hard-linked into the new generation
          untouched (links leave the committed copy in place, so the
          crash journal needs no new phase) — only genuinely
          key-overlapping files are read, anti-joined and rewritten.

        Returns rewrite-amplification stats (also kept on
        ``self.last_merge_stats``) so callers can record the measured
        cost of each incremental run: ``bytes_rewritten /
        bytes_incoming`` is the number Iceberg would drive to ~1.
        """
        from pyspark.sql import functions as F

        pcol = self.partition_by
        kcol = keys[0]
        ranges = {
            r[0]: (r[1], r[2])
            for r in df.groupBy(pcol)
            .agg(F.min(kcol).alias("lo"), F.max(kcol).alias("hi"))
            .collect()
        }
        affected_vals = sorted(ranges)
        affected_dirs = {f"{pcol}={v}" for v in affected_vals}
        rewrite_files: list[str] = []
        kept_files: list[tuple[str, str]] = []  # (bucket dir, filename)
        bytes_rewritten = bytes_kept = 0
        for v in affected_vals:
            dirname = f"{pcol}={v}"
            d = os.path.join(self.path, dirname)
            if not os.path.isdir(d):
                continue
            lo, hi = ranges[v]
            for fname in os.listdir(d):
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(d, fname)
                fr = _parquet_key_range(fpath, kcol)
                if fr is not None and (fr[1] < lo or fr[0] > hi):
                    kept_files.append((dirname, fname))
                    bytes_kept += os.path.getsize(fpath)
                else:
                    rewrite_files.append(fpath)
                    bytes_rewritten += os.path.getsize(fpath)
        cols = self.read(spark).columns
        if rewrite_files:
            existing = (
                spark.read.option("basePath", self.path)
                .parquet(*rewrite_files)
            )
            kept = existing.join(
                df.select(*keys).distinct(), keys, "left_anti"
            )
            merged = kept.unionByName(df.select(*cols))
        else:
            merged = df.select(*cols)
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.partitionBy(pcol).mode("overwrite").parquet(tmp)
        bytes_out = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, fs in os.walk(tmp)
            for f in fs if f.endswith(".parquet")
        )
        # hard-link pruned files into the new generation: the committed
        # copies stay in place until the atomic swap, so a crash here
        # is recovered by the unchanged phase-2 journal
        for dirname, fname in kept_files:
            dst_dir = os.path.join(tmp, dirname)
            os.makedirs(dst_dir, exist_ok=True)
            src = os.path.join(self.path, dirname, fname)
            dst = os.path.join(dst_dir, fname)
            try:
                os.link(src, dst)
            except OSError:  # pragma: no cover - cross-device fallback
                shutil.copy2(src, dst)
        self.last_merge_stats = {
            "files_rewritten": len(rewrite_files),
            "files_pruned": len(kept_files),
            "bytes_rewritten": bytes_rewritten,
            "bytes_pruned": bytes_kept,
            "bytes_out": bytes_out,
            "rewrite_amplification": (
                round(bytes_rewritten / bytes_out, 3)
                if bytes_out else 0.0
            ),
        }
        # journal the move phase so _recover can undo a half-done one
        with open(os.path.join(tmp, self._MOVE_MARKER), "w",
                  encoding="utf-8") as fh:
            fh.write("\n".join(sorted(affected_dirs)))
        for entry in os.listdir(self.path):
            src = os.path.join(self.path, entry)
            if os.path.isdir(src) and entry not in affected_dirs:
                os.rename(src, os.path.join(tmp, entry))
        # marker survives both swap renames; deleting it earlier opened
        # a window where the live path held only stale affected buckets
        # yet recovery's nonempty check served it as complete
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        os.remove(os.path.join(self.path, self._MOVE_MARKER))
        shutil.rmtree(old, ignore_errors=True)
        return self.last_merge_stats


class IcebergTable:
    """Iceberg-backed keyed table (requires a configured catalog)."""

    def __init__(self, identifier: str) -> None:
        self.identifier = identifier

    def exists(self) -> bool:  # pragma: no cover - needs iceberg runtime
        return True

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        return spark.read.table(self.identifier)

    def merge_upsert(
        self, spark: SparkSession, df: DataFrame, keys: list[str],
        unique_keys: bool = False,
    ) -> None:
        """Emit the Iceberg MERGE for an idempotent keyed upsert.

        The incoming batch is key-deduplicated first — Iceberg's MERGE
        throws on multiple source matches per target row, and the
        reference's ON CONFLICT contract collapses duplicate requests
        to one row anyway (``unique_keys=True`` skips the shuffle for
        batches that are already key-unique). Contract-tested through
        a stub session (tests/test_tables.py) since no Iceberg runtime
        jar ships in this sandbox; see scripts/submit.sh for the
        spark-submit recipe that enables the real catalog.
        """
        if not unique_keys:
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
