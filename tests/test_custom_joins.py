"""Semantics tests for the as-of and binned range joins."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(12)),
            (3, "u2", _ts(9)),   # before any right row for u2
            (4, "u3", _ts(15)),  # u3 has no right rows at all
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(9), "s1"),
            ("u1", _ts(11), "s2"),
            ("u1", _ts(12), "s3"),   # equal ts: <= matches
            ("u2", _ts(10), "s4"),
        ],
        ["user_id", "ts", "tag"],
    )
    return left, right


def test_asof_semantics(spark, frames):
    from westa_ocr_spark.operators.joins import asof_join

    left, right = frames
    out = {
        r["event_id"]: (r["tag"], r["asof_ts"])
        for r in asof_join(
            left, right, on="user_id", ts="ts", right_cols=["tag"]
        ).collect()
    }
    assert out[1] == ("s1", _ts(9))    # latest at-or-before 10:00
    assert out[2] == ("s3", _ts(12))   # equal ts matches (<=)
    assert out[3] == (None, None)      # nothing before 09:00
    assert out[4] == (None, None)      # key absent on the right
    assert len(out) == 4               # every left row exactly once


def test_binned_range_join_boundaries(spark, frames):
    from westa_ocr_spark.operators.joins import binned_range_join

    left, right = frames
    out = binned_range_join(
        left.withColumnRenamed("ts", "lts"),
        right.withColumnRenamed("ts", "rts"),
        on="user_id", left_ts="lts", right_ts="rts",
        window_seconds=3600,
    ).collect()
    pairs = sorted((r["event_id"], r["tag"]) for r in out)
    # event 1 (10:00): right in [10:00, 11:00) -> none (9:00 too early,
    # 11:00 is exclusive... 11:00 >= 10:00 and < 11:00? no: equal to
    # bound -> excluded? 11:00 < 11:00 false -> excluded)
    # event 2 (12:00): right s3 at 12:00 in [12:00, 13:00) -> included
    # event 3 (9:00): s4 at 10:00 NOT < 10:00 -> excluded
    assert pairs == [(2, "s3")]


def test_binned_range_join_matches_naive(spark):
    """Binned equi-join strategy == naive theta-join, on a dense grid
    crossing many bin boundaries."""
    from westa_ocr_spark.operators.joins import binned_range_join

    rows_l = [(i, "k", _ts(0, i)) for i in range(0, 50, 3)]
    rows_r = [(j, "k", _ts(0, j)) for j in range(0, 50, 2)]
    left = spark.createDataFrame(rows_l, ["lid", "k", "lts"])
    right = spark.createDataFrame(rows_r, ["rid", "k", "rts"])
    w = 420  # 7 minutes
    binned = binned_range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        window_seconds=w,
    )
    got = sorted((r["lid"], r["rid"]) for r in binned.collect())
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.join(right, "k")
        .filter(
            (F.col("rts").cast("long") >= F.col("lts").cast("long"))
            & (F.col("rts").cast("long") < F.col("lts").cast("long") + w)
        )
        .collect()
    )
    assert got == naive and len(got) > 30


def test_salted_join_matches_plain_join(spark):
    """Correctness: salted result == plain join result on a skewed
    key distribution (one key holds 90% of rows); the join key is
    (key, salt) so the hot key spreads over n_salts reducers."""
    from pyspark.sql import functions as F

    from westa_ocr_spark.operators.joins import salted_join

    skewed = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3), ("missing", 4)], ["k", "w"]
    )
    plain = skewed.join(dim, "k").select("k", "v", "w")
    salted = salted_join(skewed, dim, "k").select("k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # determinism across evaluations (xxhash64 salt, not rand())
    again = salted_join(skewed, dim, "k").select("k", "v", "w")
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_and_rejects_outer(spark):
    """Left joins preserve unmatched skewed rows exactly once; right/
    full joins are rejected (the replicated small side would emit
    n_salts copies of every unmatched small-side row)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from westa_ocr_spark.operators.joins import salted_join

    skewed = spark.createDataFrame(
        [("hot", i) for i in range(20)] + [("lonely", 99)], ["k", "v"]
    )
    dim = spark.createDataFrame([("hot", 1), ("unmatched", 2)], ["k", "w"])
    left = salted_join(skewed, dim, "k", how="left").select("k", "v", "w")
    rows = sorted(map(tuple, left.collect()))
    assert ("lonely", 99, None) in rows and len(rows) == 21
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="unsupported"):
            salted_join(skewed, dim, "k", how=how)
