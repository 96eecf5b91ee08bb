"""Direct unit tests for the keyed-table sink (sources/tables.py)."""

import pytest

from westa_ocr_spark.sources.tables import ParquetTable, keyed_table


@pytest.fixture()
def tbl(tmp_path):
    return ParquetTable(str(tmp_path / "t"))


def _rows(spark, tbl):
    return {
        (r["k"], r["p"]): r["v"] for r in tbl.read(spark).collect()
    }


def test_first_write_creates_table(spark, tbl):
    df = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], ["k", "p", "v"])
    assert not tbl.exists()
    tbl.merge_upsert(spark, df, keys=["k", "p"])
    assert tbl.exists()
    assert _rows(spark, tbl) == {(1, 1): "a", (2, 1): "b"}


def test_upsert_new_rows_win(spark, tbl):
    df1 = spark.createDataFrame([(1, 1, "old"), (2, 1, "keep")],
                                ["k", "p", "v"])
    tbl.merge_upsert(spark, df1, keys=["k", "p"])
    df2 = spark.createDataFrame([(1, 1, "new"), (3, 1, "add")],
                                ["k", "p", "v"])
    tbl.merge_upsert(spark, df2, keys=["k", "p"])
    assert _rows(spark, tbl) == {
        (1, 1): "new", (2, 1): "keep", (3, 1): "add"
    }


def test_upsert_dedupes_incoming_batch(spark, tbl):
    # J5: duplicate keys inside one batch collapse to a single row
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "x"), (2, 1, "y")], ["k", "p", "v"]
    )
    tbl.merge_upsert(spark, df, keys=["k", "p"])
    assert len(_rows(spark, tbl)) == 2


def test_upsert_unique_keys_fastpath_matches_default(spark, tmp_path):
    """Round 6: ``unique_keys=True`` skips the J5 dedup shuffle for
    batches the caller guarantees key-unique — the merged table must
    be identical to the default path, on both the unpartitioned and
    the bucket-partitioned merge."""
    for part in (None, "p"):
        a = ParquetTable(str(tmp_path / f"a_{part}"), partition_by=part)
        b = ParquetTable(str(tmp_path / f"b_{part}"), partition_by=part)
        base = spark.createDataFrame(
            [(1, 1, "old"), (2, 2, "keep")], ["k", "p", "v"]
        )
        batch = spark.createDataFrame(
            [(1, 1, "new"), (3, 1, "add")], ["k", "p", "v"]
        )
        for t, fast in ((a, False), (b, True)):
            t.merge_upsert(spark, base, keys=["k"], unique_keys=fast)
            t.merge_upsert(spark, batch, keys=["k"], unique_keys=fast)
        assert _rows(spark, a) == _rows(spark, b) == {
            (1, 1): "new", (2, 2): "keep", (3, 1): "add"
        }


def test_keyed_table_picks_parquet_without_iceberg(spark, tmp_path):
    t = keyed_table(spark, str(tmp_path / "x"))
    assert isinstance(t, ParquetTable)


def test_recover_promotes_stranded_tmp(spark, tbl, tmp_path):
    """Crash between the two swap renames: path absent, merged data in
    __tmp, prior data in __old -> read() recovers the NEWER (__tmp)."""
    import os
    import time

    df1 = spark.createDataFrame([(1, 1, "old")], ["k", "p", "v"])
    tbl.merge_upsert(spark, df1, keys=["k", "p"])
    # simulate the crash window: stage a completed merged dir as __tmp
    # and move the live dir aside as __old
    df2 = spark.createDataFrame([(1, 1, "new"), (2, 1, "b")],
                                ["k", "p", "v"])
    tmp = f"{tbl.path}__tmp_deadbeef"
    df2.write.mode("overwrite").parquet(tmp)
    time.sleep(0.05)
    os.rename(tbl.path, f"{tbl.path}__old_cafebabe")
    # make __tmp the newest candidate (mtime order decides)
    os.utime(tmp)
    assert tbl.exists()  # triggers recovery
    assert _rows(spark, tbl) == {(1, 1): "new", (2, 1): "b"}
    # leftovers swept
    parent = os.path.dirname(tbl.path)
    assert [n for n in os.listdir(parent) if "__old_" in n or "__tmp_" in n] == []


def test_recover_restores_old_when_no_tmp(spark, tbl):
    import os

    df1 = spark.createDataFrame([(1, 1, "a")], ["k", "p", "v"])
    tbl.merge_upsert(spark, df1, keys=["k", "p"])
    os.rename(tbl.path, f"{tbl.path}__old_cafebabe")
    assert tbl.exists()
    assert _rows(spark, tbl) == {(1, 1): "a"}


def test_partitioned_merge_rewrites_only_affected_buckets(
        spark, tmp_path):
    """Bucket-scoped merge: a batch touching one bucket must leave
    every other bucket's data FILES untouched (renamed into the new
    generation, not rewritten) — the parquet stand-in for Iceberg's
    file-level MERGE."""
    import os

    tbl = ParquetTable(str(tmp_path / "pt"), partition_by="b")
    base = spark.createDataFrame(
        [(k, 1, f"v{k}", k % 4) for k in range(16)], ["k", "p", "v", "b"]
    )
    tbl.merge_upsert(spark, base, keys=["k", "p"])

    def bucket_files(b):
        d = os.path.join(tbl.path, f"b={b}")
        return sorted(
            (n, os.stat(os.path.join(d, n)).st_ino)
            for n in os.listdir(d) if n.endswith(".parquet")
        )

    before = {b: bucket_files(b) for b in range(4)}
    batch = spark.createDataFrame(
        [(0, 1, "NEW", 0), (99, 1, "added", 0)], ["k", "p", "v", "b"]
    )
    tbl.merge_upsert(spark, batch, keys=["k", "p"])
    # untouched buckets: identical file names AND inodes (renamed dirs)
    for b in (1, 2, 3):
        assert bucket_files(b) == before[b], f"bucket {b} was rewritten"
    assert bucket_files(0) != before[0]
    got = _rows(spark, tbl)
    assert got[(0, 1)] == "NEW" and got[(99, 1)] == "added"
    assert len(got) == 17


def test_compact_collapses_bucket_files(spark, tmp_path):
    """Compaction rewrites each bucket to one file (files accumulate
    as tasks x buckets x merges) and preserves every row."""
    import os

    tbl = ParquetTable(str(tmp_path / "pt"), partition_by="b")
    for batch in range(3):
        df = spark.createDataFrame(
            [(batch * 100 + k, 1, f"v{batch}_{k}", k % 4)
             for k in range(16)],
            ["k", "p", "v", "b"],
        ).repartition(4)  # several writer tasks -> several files/bucket
        tbl.merge_upsert(spark, df, keys=["k", "p"])
    before = _rows(spark, tbl)

    def n_files(b):
        d = os.path.join(tbl.path, f"b={b}")
        return len([n for n in os.listdir(d) if n.endswith(".parquet")])

    assert any(n_files(b) > 1 for b in range(4))  # fragmentation real
    tbl.compact(spark)
    assert all(n_files(b) == 1 for b in range(4))
    assert _rows(spark, tbl) == before


def test_partitioned_merge_move_phase_crash_recovers(spark, tmp_path):
    """Crash mid-move (marker present in __tmp): recovery must move
    the committed unaffected bucket dirs BACK and discard the
    uncommitted merge."""
    import os
    import shutil

    tbl = ParquetTable(str(tmp_path / "pt"), partition_by="b")
    base = spark.createDataFrame(
        [(k, 1, f"v{k}", k % 4) for k in range(8)], ["k", "p", "v", "b"]
    )
    tbl.merge_upsert(spark, base, keys=["k", "p"])
    # simulate a half-done move phase: affected bucket b=0 freshly
    # written into __tmp, marker still present, and unaffected b=1
    # already moved over from the live table
    tmp = f"{tbl.path}__tmp_deadbeef"
    spark.createDataFrame([(0, 1, "UNCOMMITTED", 0)],
                          ["k", "p", "v", "b"]) \
        .write.partitionBy("b").mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_MERGE_MOVES"), "w") as fh:
        fh.write("b=0")
    os.rename(os.path.join(tbl.path, "b=1"), os.path.join(tmp, "b=1"))
    assert shutil.os.path.isdir(os.path.join(tmp, "b=1"))
    assert tbl.exists()  # triggers recovery
    got = _rows(spark, tbl)
    # original table fully restored, uncommitted merge discarded
    assert got == {(k, 1): f"v{k}" for k in range(8)}
    parent = os.path.dirname(tbl.path)
    assert [n for n in os.listdir(parent) if "__tmp_" in n] == []


class _StubCatalog:
    def __init__(self):
        self.dropped = []

    def dropTempView(self, name):
        self.dropped.append(name)


class _StubSession:
    def __init__(self):
        self.sqls = []
        self.catalog = _StubCatalog()

    def sql(self, text):
        self.sqls.append(text)


class _StubDF:
    """Minimal DataFrame stand-in for the MERGE contract test."""

    def __init__(self):
        self.views = []
        self.dedup_keys = None

    def dropDuplicates(self, keys):
        self.dedup_keys = keys
        return self

    def createOrReplaceTempView(self, name):
        self.views.append(name)


def test_iceberg_merge_contract():
    """IcebergTable.merge_upsert emits the exact MERGE INTO statement
    the reference's ON CONFLICT contract maps to
    (/root/reference/app/repository.py:230-265), dedupes the source
    batch, and drops its temp view."""
    import re

    from westa_ocr_spark.sources.tables import IcebergTable

    t = IcebergTable("cat.db.ocr_pages")
    sess, df = _StubSession(), _StubDF()
    t.merge_upsert(sess, df, keys=["url", "page_index"])

    assert df.dedup_keys == ["url", "page_index"]
    assert len(df.views) == 1 and len(sess.sqls) == 1
    view = df.views[0]
    assert sess.catalog.dropped == [view]
    expected = (
        f"MERGE INTO cat.db.ocr_pages t USING {view} s "
        "ON t.url = s.url AND t.page_index = s.page_index "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert re.sub(r"\s+", " ", sess.sqls[0]) == expected


def test_partitioned_merge_swap_phase_crash_promotes_tmp(spark, tmp_path):
    """3->4 window (round-4 fix): path already renamed to __old, tmp
    complete but still marker-bearing. Recovery must promote the tmp
    — it holds the full new generation — not treat it as a half-done
    move phase."""
    import os

    tbl = ParquetTable(str(tmp_path / "pt"), partition_by="b")
    base = spark.createDataFrame(
        [(k, 1, f"v{k}", k % 4) for k in range(8)], ["k", "p", "v", "b"]
    )
    tbl.merge_upsert(spark, base, keys=["k", "p"])
    # build a complete new generation in __tmp: merged b=0 plus every
    # unaffected bucket dir moved over, marker still present
    tmp = f"{tbl.path}__tmp_cafef00d"
    spark.createDataFrame(
        [(0, 1, "NEWGEN", 0), (4, 1, "v4", 0)], ["k", "p", "v", "b"]
    ).write.partitionBy("b").mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_MERGE_MOVES"), "w") as fh:
        fh.write("b=0")
    for b in (1, 2, 3):
        os.rename(os.path.join(tbl.path, f"b={b}"),
                  os.path.join(tmp, f"b={b}"))
    # phase 3 done: live path renamed away
    os.rename(tbl.path, f"{tbl.path}__old_dead0001")

    assert tbl.exists()  # recovery promotes the tmp
    got = _rows(spark, tbl)
    expect = {(k, 1): f"v{k}" for k in range(8)}
    expect[(0, 1)] = "NEWGEN"
    assert got == expect
    parent = os.path.dirname(tbl.path)
    leftovers = [n for n in os.listdir(parent)
                 if "__tmp_" in n or "__old_" in n]
    assert leftovers == []
    assert not os.path.exists(os.path.join(tbl.path, "_MERGE_MOVES"))


def test_partitioned_merge_cleanup_phase_crash_drops_marker(
        spark, tmp_path):
    """Phase-5 window: swap completed, marker still in the live path,
    __old not yet deleted. Recovery keeps the live table, drops the
    marker, sweeps the old generation."""
    import os
    import shutil

    tbl = ParquetTable(str(tmp_path / "pt"), partition_by="b")
    base = spark.createDataFrame(
        [(k, 1, f"v{k}", k % 4) for k in range(8)], ["k", "p", "v", "b"]
    )
    tbl.merge_upsert(spark, base, keys=["k", "p"])
    with open(os.path.join(tbl.path, "_MERGE_MOVES"), "w") as fh:
        fh.write("b=0")
    old = f"{tbl.path}__old_dead0002"
    shutil.copytree(tbl.path, old)

    assert tbl.exists()
    assert _rows(spark, tbl) == {(k, 1): f"v{k}" for k in range(8)}
    parent = os.path.dirname(tbl.path)
    assert [n for n in os.listdir(parent) if "__old_" in n] == []
    assert not os.path.exists(os.path.join(tbl.path, "_MERGE_MOVES"))


def test_file_scoped_merge_prunes_nonoverlapping_files(spark, tmp_path):
    """O(delta) scoping: files in an affected bucket whose footer key
    range cannot intersect the batch are hard-linked (same inode) into
    the new generation, and the stats report the measured rewrite
    amplification."""
    import os

    tbl = ParquetTable(str(tmp_path / "pt"), partition_by="b")
    # two disjoint key-range files in bucket 0: k in [0,9], k in [1000,1009]
    lo = spark.createDataFrame(
        [(k, 1, f"lo{k}", 0) for k in range(10)], ["k", "p", "v", "b"]
    ).coalesce(1)
    tbl.merge_upsert(spark, lo, keys=["k", "p"])
    hi = spark.createDataFrame(
        [(k, 1, f"hi{k}", 0) for k in range(1000, 1010)],
        ["k", "p", "v", "b"],
    ).coalesce(1)
    tbl.merge_upsert(spark, hi, keys=["k", "p"])

    bucket = os.path.join(tbl.path, "b=0")
    files_before = {
        n: os.stat(os.path.join(bucket, n)).st_ino
        for n in os.listdir(bucket) if n.endswith(".parquet")
    }
    # identify the low-range file (the one the next merge must NOT touch)
    from westa_ocr_spark.sources.tables import _parquet_key_range
    lo_files = {
        n for n in files_before
        if _parquet_key_range(os.path.join(bucket, n), "k")[1] < 1000
    }
    assert lo_files  # sanity: footer stats usable

    batch = spark.createDataFrame(
        [(1005, 1, "NEW", 0)], ["k", "p", "v", "b"]
    )
    stats = tbl.merge_upsert(spark, batch, keys=["k", "p"])
    assert stats["files_pruned"] >= 1
    assert stats["files_rewritten"] >= 1
    assert stats["rewrite_amplification"] >= 0.0
    assert stats == tbl.last_merge_stats

    files_after = {
        n: os.stat(os.path.join(bucket, n)).st_ino
        for n in os.listdir(bucket) if n.endswith(".parquet")
    }
    # the non-overlapping file survived as the SAME inode (linked, not
    # rewritten)
    for n in lo_files:
        assert files_after[n] == files_before[n]
    got = _rows(spark, tbl)
    assert got[(1005, 1)] == "NEW"
    assert got[(0, 1)] == "lo0" and got[(1000, 1)] == "hi1000"
    assert len(got) == 20
