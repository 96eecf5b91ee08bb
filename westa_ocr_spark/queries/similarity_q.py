"""Embedding similarity queries: exact cosine top-k / k-NN, hyperplane
LSH, IVF ANN, embedding near-duplicate pairs."""

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

from westa_ocr_spark.operators import similarity  # noqa: F401
# ---------------------------------------------------------------------------
# Similarity search

def _query_vec(spark, sf) -> list[float]:
    row = (
        _t(spark, sf, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def _q_embedding_topk(spark, sf):
    return similarity.cosine_topk(
        _t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10
    )


_SQL_EMBEDDING_TOPK = (
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "scored AS (SELECT vec_id, "
    + _sql_round_det(
        "list_sum(list_transform(list_zip(e.embedding, q.qv), "
        "p -> cast(p[1] AS double) * cast(p[2] AS double))) / ("
        "sqrt(list_sum(list_transform(e.embedding, "
        "x -> cast(x AS double) * cast(x AS double)))) * "
        "sqrt(list_sum(list_transform(q.qv, "
        "x -> cast(x AS double) * cast(x AS double)))))", 6)
    + " AS cosine FROM embeddings e, q) "
    "SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10"
)


def _q_embedding_knn(spark, sf):
    # small-batch exact k-NN join: 20 probes x all vectors, top-3 each.
    # Round 6 (guide §2.3 "don't compute things you throw away"): each
    # vector's norm is computed ONCE before the cross join and carried
    # as a column — the inline form re-derived both norms per PAIR,
    # tripling the interpreted higher-order-function work (measured
    # 5.1 s -> 2.6 s at sf1.0). The norm expression itself is
    # unchanged, so every carried value is bit-identical to the
    # per-pair evaluation and the rounded cosine cannot move.
    # float->double casts are hoisted per ROW too (exact: every float
    # is representable as a double), so the per-pair dot lambda is a
    # bare multiply-accumulate over pre-cast arrays.
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("_ed"),
    ).select(
        "vec_id", "_ed",
        F.sqrt(
            F.aggregate(
                F.transform("_ed", lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("_nrm"),
    )
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("_ed").alias("_pd"),
        F.col("_nrm").alias("_probe_nrm"),
    )
    joined = probes.crossJoin(emb).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    dot = F.aggregate(
        F.zip_with("_pd", "_ed", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = joined.select(
        "probe_id",
        "vec_id",
        round_det(
            dot / (F.col("_probe_nrm") * F.col("_nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "vec_id")
    return scored.select(
        "probe_id", "vec_id", "cosine",
        F.row_number().over(w).cast("long").alias("rn"),
    ).filter(F.col("rn") <= 3)


_SQL_EMBEDDING_KNN = (
    "WITH probes AS (SELECT vec_id AS probe_id, embedding AS probe_vec "
    "FROM embeddings WHERE vec_id < 20), scored AS ("
    "SELECT probe_id, vec_id, "
    + _sql_round_det(
        "list_sum(list_transform(list_zip(probe_vec, e.embedding), "
        "p -> cast(p[1] AS double) * cast(p[2] AS double))) / ("
        "sqrt(list_sum(list_transform(probe_vec, "
        "x -> cast(x AS double) * cast(x AS double)))) * "
        "sqrt(list_sum(list_transform(e.embedding, "
        "x -> cast(x AS double) * cast(x AS double)))))", 6)
    + " AS cosine FROM probes, embeddings e WHERE e.vec_id != probe_id) "
    "SELECT probe_id, vec_id, cosine, rn FROM (SELECT *, row_number() "
    "OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rn "
    "FROM scored) WHERE rn <= 3"
)


def _q_lsh_topk(spark, sf):
    # LSH-bucketed ANN — pandas-UDF signatures, no SQL twin
    return similarity.lsh_topk(
        _t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10
    )




def _q_ivf_topk(spark, sf):
    # IVF ANN (coarse-quantizer probe) — numpy-in-Arrow path, no SQL
    # twin (rows-only check)
    return similarity.ivf_topk(
        _t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10,
        n_centroids=16, n_probe=4,
    )




# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the remaining dedup modality)

def _q_embedding_dup_pairs(spark, sf):
    # exact all-pairs on a bounded slice — the oracle baseline
    # threshold 0.3: the synthetic embeddings are near-orthogonal
    # (max pair cosine ~0.5), so 0.3 yields a non-trivial pair set
    return similarity.cosine_dup_pairs_exact(
        _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200),
        threshold=0.3,
    )


_SQL_EMBEDDING_DUP_PAIRS = (
    "WITH e AS (SELECT vec_id, embedding FROM embeddings "
    "WHERE vec_id < 200) "
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    + _sql_round_det(
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), "
        "p -> cast(p[1] AS double) * cast(p[2] AS double))) / ("
        "sqrt(list_sum(list_transform(a.embedding, "
        "x -> cast(x AS double) * cast(x AS double)))) * "
        "sqrt(list_sum(list_transform(b.embedding, "
        "x -> cast(x AS double) * cast(x AS double)))))", 6)
    + " AS cosine FROM e a JOIN e b ON a.vec_id < b.vec_id "
    "WHERE "
    + _sql_round_det(
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), "
        "p -> cast(p[1] AS double) * cast(p[2] AS double))) / ("
        "sqrt(list_sum(list_transform(a.embedding, "
        "x -> cast(x AS double) * cast(x AS double)))) * "
        "sqrt(list_sum(list_transform(b.embedding, "
        "x -> cast(x AS double) * cast(x AS double)))))", 6)
    + " >= 0.3"
)


def _q_embedding_dup_pairs_lsh(spark, sf):
    # banded hyperplane LSH scale path (numpy signatures — rows-only)
    emb = _t(spark, sf, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    return similarity.cosine_dup_pairs_lsh(emb, dim=dim, threshold=0.3)





# name -> (Spark DataFrame fn, DuckDB oracle SQL or None).
DEFS = {
    "embedding_topk": (_q_embedding_topk, _SQL_EMBEDDING_TOPK),
    "embedding_knn": (_q_embedding_knn, _SQL_EMBEDDING_KNN),
    "lsh_topk": (_q_lsh_topk, None),
    "ivf_topk": (_q_ivf_topk, None),
    "embedding_dup_pairs": (_q_embedding_dup_pairs, _SQL_EMBEDDING_DUP_PAIRS),
    "embedding_dup_pairs_lsh": (_q_embedding_dup_pairs_lsh, None),
}
