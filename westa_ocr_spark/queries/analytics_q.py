"""Extended analytics: rollups, pivot, set ops, sampling, sessionize,
top terms, quantiles, z-scores, range windows, as-of/range joins,
hypertable rollup, Count-Min Sketch."""

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

def _q_rollup_counts(spark, sf):
    # rollup over (lang, source-bucket): subtotal + grand-total rows
    docs = _t(spark, sf, "documents")
    return (
        docs.rollup("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").alias("chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"), "n", "chars"
        )
    )


_SQL_ROLLUP_COUNTS = (
    "SELECT coalesce(lang, 'ALL') AS lang, count(*) AS n, "
    "cast(sum(n_chars) AS bigint) AS chars FROM documents "
    "GROUP BY ROLLUP(lang)"
)


def _q_pivot_event_types(spark, sf):
    # pivot: one column per event type, count per user bucket
    ev = _t(spark, sf, "events").withColumn(
        "bucket", (F.col("user_id") % 10).alias("bucket")
    )
    return (
        ev.groupBy("bucket")
        .pivot("event_type",
               ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


_SQL_PIVOT_EVENT_TYPES = (
    "SELECT user_id % 10 AS bucket, "
    + ", ".join(
        f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    + " FROM events GROUP BY 1"
)


def _q_set_ops(spark, sf):
    # union / except / intersect over projections
    docs = _t(spark, sf, "documents")
    langs = docs.select(F.col("lang").alias("v")).distinct()
    sources = docs.select(F.col("source").alias("v")).distinct()
    short = docs.filter(F.col("n_chars") < 200).select(
        F.col("lang").alias("v")
    ).distinct()
    return (
        langs.union(sources).distinct()
        .exceptAll(langs.intersect(short))
        .distinct()
    )


_SQL_SET_OPS = (
    "SELECT DISTINCT v FROM ("
    "SELECT lang AS v FROM documents UNION "
    "SELECT source AS v FROM documents) "
    "EXCEPT (SELECT DISTINCT lang AS v FROM documents "
    "INTERSECT SELECT DISTINCT lang AS v FROM documents "
    "WHERE n_chars < 200)"
)


def _q_deterministic_sample(spark, sf):
    # content-derived deterministic sampling (portable across engines,
    # unlike rand()/TABLESAMPLE): keep docs whose md5(doc_id) starts
    # with hex 0-3 (~25%)
    docs = _t(spark, sf, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.filter(h.isin("0", "1", "2", "3")).select(
        "doc_id", "lang"
    )


_SQL_DETERMINISTIC_SAMPLE = (
    "SELECT doc_id, lang FROM documents WHERE "
    "substring(md5(cast(doc_id AS varchar)), 1, 1) IN ('0','1','2','3')"
)


def _q_sessionize(spark, sf):
    # classic event sessionization: 30-min inactivity gap -> new
    # session; session ids are content-derived (user, session_no)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: cast via timestamp (session tz = UTC) to
    # epoch seconds — matches DuckDB's epoch(ts)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(w2).alias("session_no"),
    )


_SQL_SESSIONIZE = (
    "SELECT user_id, event_id, cast(sum(new_session) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) "
    "AS session_no "
    "FROM (SELECT user_id, event_id, ts, CASE WHEN "
    "epoch(ts) - lag(epoch(ts)) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) > 1800 "
    "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "IS NULL THEN 1 ELSE 0 END AS new_session FROM events)"
)


def _q_top_terms(spark, sf):
    # global term frequencies, top 20 (total order via term tiebreak)
    docs = _t(spark, sf, "documents")
    words = docs.select(
        F.explode(
            F.split(textfns.normalize_text(F.col("text")), " ")
        ).alias("term")
    ).filter(F.length("term") > 0)
    return (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(20)
    )


_SQL_TOP_TERMS = (
    "SELECT term, count(*) AS n FROM (SELECT unnest(string_split("
    + _SQL_NORM.format(c="text")
    + ", ' ')) AS term FROM documents) WHERE length(term) > 0 "
    "GROUP BY term ORDER BY n DESC, term LIMIT 20"
)




_BM25_TERMS = ["hash", "join", "spark"]


def _q_bm25_search(spark, sf):
    """BM25 document retrieval (round 4): score documents against the
    fixed query 'hash join spark' with the standard Okapi formula
    (k1=1.2, b=0.75), top 20. Corpus statistics (N, avgdl, per-term
    df) come from one tiny aggregate collected on the driver — the
    idf scalars then enter the scoring expression as literals, so the
    scan-side plan is a single stage with no BroadcastNestedLoopJoin
    (the q22/q11 pattern). Token counts reuse the registry's shared
    normalization, staged as their own projection so the split isn't
    re-evaluated per reference (CollapseProject pitfall). The DuckDB
    twin computes the identical expression tree from the same exact
    integer statistics, so doubles match bit-for-bit before the
    deterministic 6-dp round that both sides sort on."""
    import math

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 1000)
    words = F.split(textfns.normalize_text(F.col("text")), " ")

    def _tf(term):
        # NB: a two-arg lambda would select F.filter's (element, index)
        # overload — the term must close over a one-arg lambda
        return F.size(F.filter("w", lambda x: x == F.lit(term)))

    staged = docs.select("doc_id", words.alias("w")).select(
        "doc_id",
        F.size(F.filter("w", lambda x: F.length(x) > 0)).alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    ).collect()[0]
    n, avgdl = stats["n"], float(stats["avgdl"])
    score = F.lit(0.0)
    any_tf = F.lit(0)
    for t in _BM25_TERMS:
        df = stats[f"df_{t}"]
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        tf = F.col(f"tf_{t}")
        score = score + (
            F.lit(idf) * tf * F.lit(2.2)
            / (tf + F.lit(1.2)
               * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl)))
        )
        any_tf = any_tf + tf
    return (
        staged.filter(any_tf > 0)
        .select("doc_id", round_det(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


def _sql_bm25():
    tf_cols = ", ".join(
        f"len(list_filter({_SQL_WORDS.format(c='text')}, x -> x = '{t}'))"
        f" AS tf_{t}"
        for t in _BM25_TERMS
    )
    contrib = " + ".join(
        f"(ln((n - df_{t} + 0.5) / (df_{t} + 0.5) + 1) * tf_{t} * 2.2 "
        f"/ (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl)))"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    any_tf = " + ".join(f"tf_{t}" for t in _BM25_TERMS)
    return (
        "WITH staged AS (SELECT doc_id, "
        f"len(list_filter({_SQL_WORDS.format(c='text')},"
        " x -> length(x) > 0)) AS dl, "
        + tf_cols
        + " FROM documents WHERE doc_id < 1000), "
        f"stats AS (SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} "
        "FROM staged) SELECT doc_id, "
        + _sql_round_det(f"({contrib})", 6)
        + f" AS score FROM staged, stats WHERE {any_tf} > 0 "
        "ORDER BY score DESC, doc_id LIMIT 20"
    )


_SQL_BM25_SEARCH = _sql_bm25()


# ---------------------------------------------------------------------------
# Custom join operators (as-of, binned range) — DuckDB native ASOF as
# the oracle

def _q_asof_join(spark, sf):
    from westa_ocr_spark.operators.joins import asof_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event")
    )
    out = asof_join(
        purchases, signups, on="user_id", ts="ts",
        right_cols=["signup_event"],
    )
    return out.select(
        "event_id", "user_id", "ts", "asof_ts", "signup_event"
    )


_SQL_ASOF_JOIN = (
    "SELECT p.event_id, p.user_id, p.ts, s.ts AS asof_ts, "
    "s.event_id AS signup_event "
    "FROM (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type = 'signup') s "
    "ON p.user_id = s.user_id AND p.ts >= s.ts"
)


def _q_range_join(spark, sf):
    from westa_ocr_spark.operators.joins import binned_range_join

    ev = _t(spark, sf, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id",
        F.col("ts").alias("signup_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
    )
    joined = binned_range_join(
        signups, purchases, on="user_id",
        left_ts="signup_ts", right_ts="purchase_ts",
        window_seconds=86400,
    )
    return joined.groupBy("signup_id", "user_id").agg(
        F.count(F.lit(1)).alias("purchases_within_1d")
    )


_SQL_RANGE_JOIN = (
    "SELECT s.event_id AS signup_id, s.user_id, "
    "count(*) AS purchases_within_1d "
    "FROM (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type = 'signup') s "
    "JOIN (SELECT user_id, ts FROM events "
    "WHERE event_type = 'purchase') p "
    "ON s.user_id = p.user_id "
    "AND epoch(p.ts) >= epoch(s.ts) "
    "AND epoch(p.ts) < epoch(s.ts) + 86400 "
    "GROUP BY 1, 2"
)


def _q_value_quantiles(spark, sf):
    # exact percentiles per event type: p50 interpolated + p90/p99
    # discrete (order statistics — deterministic across engines)
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        round_det(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        round_det(
            F.expr(
                "sort_array(collect_list(value))"
                "[cast(ceil(0.9 * count(value)) as int) - 1]"
            ),
            6,
        ).alias("p90_disc"),
        F.max("value").alias("max_value"),
    )


_SQL_VALUE_QUANTILES = (
    "SELECT event_type, "
    + _sql_round_det("quantile_cont(value, 0.5)", 6)
    + " AS p50, "
    + _sql_round_det(
        "(list_sort(list(value)))"
        "[cast(ceil(0.9 * count(value)) AS int)]", 6)
    + " AS p90_disc, max(value) AS max_value "
    "FROM events GROUP BY event_type"
)


def _q_group_zscore(spark, sf):
    # grouped applyInPandas (vectorized per-group normalization) with
    # a real DuckDB oracle: both sides use population std, std==0 -> 1,
    # and the round_det half-up rounding, so values match to 6 dp
    from westa_ocr_spark.operators.grouped import (
        normalize_quality_per_group,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("n_chars")
    )
    return normalize_quality_per_group(docs, "lang", "n_chars")


_SQL_GROUP_ZSCORE = (
    "WITH stats AS (SELECT lang, avg(cast(n_chars AS double)) AS a, "
    "coalesce(nullif(stddev_pop(cast(n_chars AS double)), 0.0), 1.0) AS s "
    "FROM documents GROUP BY 1) "
    "SELECT d.doc_id, d.lang, cast(d.n_chars AS double) AS n_chars, "
    + _sql_round_det("(cast(d.n_chars AS double) - st.a) / st.s", 6)
    + " AS zscore FROM documents d JOIN stats st USING (lang)"
)




def _q_running_range_window(spark, sf):
    # range-frame window: events per user in the trailing hour
    # (RANGE BETWEEN on event-time seconds)
    ev = _t(spark, sf, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
    )


_SQL_RUNNING_RANGE_WINDOW = (
    "SELECT user_id, event_id, cast(count(*) OVER ("
    "PARTITION BY user_id ORDER BY epoch(ts) "
    "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS bigint) "
    "AS events_last_hour FROM events"
)




# ---------------------------------------------------------------------------
# Hypertable rollup: one scan -> continuous aggregates at several time
# granularities (the timescale-style rollup, explode fan-out keeps it
# a single pass + one shuffle on near-uniform (gran, bucket) keys)

_ROLLUP_GRANS = [("minute", 60), ("hour", 3600), ("day", 86400)]


def _q_hypertable_rollup(spark, sf):
    ev = _t(spark, sf, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    staged = ev.select(
        epoch.alias("_sec"),
        F.col("value").cast("decimal(18,6)").alias("_val"),
    )
    grans = F.array(
        *[
            F.struct(
                F.lit(name).alias("gran"),
                (F.floor(F.col("_sec") / F.lit(step)) * F.lit(step)).alias(
                    "bucket_start"
                ),
            )
            for name, step in _ROLLUP_GRANS
        ]
    )
    exploded = staged.select(
        "_val", F.explode(grans).alias("g")
    ).select("_val", "g.gran", "g.bucket_start")
    return exploded.groupBy("gran", "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        round_det(F.sum("_val").cast("double"), 4).alias("sum_value"),
    )


_SQL_HYPERTABLE_ROLLUP = (
    "WITH base AS (SELECT cast(floor(epoch(ts)) AS bigint) AS sec, "
    "cast(value AS decimal(18,6)) AS val FROM events), "
    "fan AS ("
    + " UNION ALL ".join(
        f"SELECT '{name}' AS gran, "
        f"cast(floor(sec / {step}) * {step} AS bigint) AS bucket_start, "
        "val FROM base"
        for name, step in _ROLLUP_GRANS
    )
    + ") SELECT gran, bucket_start, count(*) AS n, "
    + _sql_round_det("cast(sum(val) AS double)", 4)
    + " AS sum_value FROM fan GROUP BY 1, 2"
)



# ---------------------------------------------------------------------------
# Count-Min Sketch (mergeable frequency sketch as a DataFrame)

def _sql_cms_bucket(expr: str, d: int, width: int) -> str:
    h = f"md5('cms{d}:' || cast({expr} AS varchar))"
    v = (
        f"(ascii(substring({h}, 1, 1)) * 65536 + "
        f"ascii(substring({h}, 2, 1)) * 256 + "
        f"ascii(substring({h}, 3, 1)))"
    )
    return f"(({v}) % {width} + {width}) % {width}"


def _q_cms_estimates(spark, sf):
    """Build a CMS over event user_ids, then point-estimate the first
    30 users. The DuckDB twin rebuilds the identical sketch (same
    md5-derived buckets), so build + estimate verify end-to-end."""
    from westa_ocr_spark.operators.sketches import cms_build, cms_estimate

    ev = _t(spark, sf, "events")
    sketch = cms_build(ev, "user_id")
    probes = ev.select("user_id").filter(
        F.col("user_id") < 30
    ).distinct()
    return cms_estimate(sketch, probes, "user_id")


_SQL_CMS_ESTIMATES = (
    "WITH sketch AS ("
    + " UNION ALL ".join(
        f"SELECT {d} AS depth, {_sql_cms_bucket('user_id', d, 1024)} "
        "AS bucket FROM events"
        for d in range(4)
    )
    + "), agg AS (SELECT depth, bucket, count(*) AS cnt FROM sketch "
    "GROUP BY 1, 2), "
    "probes AS ("
    + " UNION ALL ".join(
        f"SELECT user_id AS key, {d} AS depth, "
        f"{_sql_cms_bucket('user_id', d, 1024)} AS bucket "
        "FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 30)"
        for d in range(4)
    )
    + ") SELECT key, min(cnt) AS est FROM agg "
    "JOIN probes USING (depth, bucket) GROUP BY key"
)




def _q_stratified_sample(spark, sf):
    """Per-language stratified sampling for training-data mixes:
    content-derived keep decision (md5 bucket of doc_id, portable
    across engines — rand()/TABLESAMPLE are not) against per-language
    rates. Verified by exact per-group counts, not just totals."""
    rates = {"en": 800, "de": 500, "fr": 500, "es": 250, "zh": 125}
    docs = _t(spark, sf, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
            16, 10,
        ).cast("long") % 1000
    )
    rate = F.create_map(
        *[x for k, v in rates.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("lang")]
    kept = docs.filter(bucket < F.coalesce(rate, F.lit(0)))
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .orderBy("lang")
    )


_SQL_STRATIFIED_SAMPLE = (
    "SELECT lang, count(*) AS n_kept, min(doc_id) AS first_id, "
    "max(doc_id) AS last_id FROM documents "
    "WHERE cast(concat('0x', substring(md5(cast(doc_id AS varchar)), "
    "1, 6)) AS bigint) % 1000 < "
    "CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500 "
    "WHEN 'fr' THEN 500 WHEN 'es' THEN 250 WHEN 'zh' THEN 125 "
    "ELSE 0 END "
    "GROUP BY lang ORDER BY lang"
)



# name -> (Spark DataFrame fn, DuckDB oracle SQL or None).
DEFS = {
    "rollup_counts": (_q_rollup_counts, _SQL_ROLLUP_COUNTS),
    "pivot_event_types": (_q_pivot_event_types, _SQL_PIVOT_EVENT_TYPES),
    "set_ops": (_q_set_ops, _SQL_SET_OPS),
    "deterministic_sample": (_q_deterministic_sample, _SQL_DETERMINISTIC_SAMPLE),
    "sessionize": (_q_sessionize, _SQL_SESSIONIZE),
    "top_terms": (_q_top_terms, _SQL_TOP_TERMS),
    "bm25_search": (_q_bm25_search, _SQL_BM25_SEARCH),
    "asof_join": (_q_asof_join, _SQL_ASOF_JOIN),
    "range_join": (_q_range_join, _SQL_RANGE_JOIN),
    "value_quantiles": (_q_value_quantiles, _SQL_VALUE_QUANTILES),
    "group_zscore": (_q_group_zscore, _SQL_GROUP_ZSCORE),
    "running_range_window": (_q_running_range_window, _SQL_RUNNING_RANGE_WINDOW),
    "hypertable_rollup": (_q_hypertable_rollup, _SQL_HYPERTABLE_ROLLUP),
    "cms_estimates": (_q_cms_estimates, _SQL_CMS_ESTIMATES),
    "stratified_sample": (_q_stratified_sample, _SQL_STRATIFIED_SAMPLE),
}


def _q_host_pagerank(spark, sf):
    """Host-graph centrality (round 5): PageRank over a deterministic
    synthetic host link graph derived from the documents table
    (two modular-arithmetic edges per doc over 97 hosts — the same
    expressions the DuckDB twin builds), 10 damped iterations with
    dangling-mass redistribution. The crawl-pipeline use: rank hosts
    by centrality as a document-quality prior."""
    from westa_ocr_spark.operators.graph import pagerank

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 2000)
    # md5-mixed destinations: a polynomial in doc_id would be CONSTANT
    # per src residue class (degenerate uniform ranks); hash mixing
    # gives a genuinely non-uniform degree distribution
    h = F.md5(F.col("doc_id").cast("string"))
    e1 = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 97)
        .alias("dst"),
    )
    e2 = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("long") % 97)
        .alias("dst"),
    )
    ranks = pagerank(e1.unionByName(e2), iterations=10)
    return ranks.select(
        "node", round_det(F.col("rank"), 6).alias("rank")
    ).orderBy("node")


def _sql_host_pagerank() -> str:
    d, n_iter = 0.85, 10
    head = """
WITH edges AS MATERIALIZED (
  SELECT doc_id % 97 AS src,
         cast(concat('0x', substring(md5(cast(doc_id AS VARCHAR)),
              1, 4)) AS BIGINT) % 97 AS dst
  FROM documents WHERE doc_id < 2000
  UNION ALL
  SELECT doc_id % 97,
         cast(concat('0x', substring(md5(cast(doc_id AS VARCHAR)),
              5, 4)) AS BIGINT) % 97
  FROM documents WHERE doc_id < 2000
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
nn AS MATERIALIZED (SELECT cast(count(*) AS double) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT src, cast(count(*) AS double) AS deg
           FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""
    iters = []
    for k in range(1, n_iter + 1):
        p = f"r{k - 1}"
        iters.append(f"""
dang{k} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0.0) AS m FROM {p} r
  WHERE r.node NOT IN (SELECT src FROM outdeg)
),
c{k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(r.rank / od.deg) AS contrib
  FROM edges e JOIN {p} r ON r.node = e.src
  JOIN outdeg od ON od.src = e.src GROUP BY e.dst
),
r{k} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {d}) / nn.n
         + {d} * (coalesce(c.contrib, 0.0) + dang{k}.m / nn.n) AS rank
  FROM nodes n CROSS JOIN nn CROSS JOIN dang{k}
  LEFT JOIN c{k} c ON c.node = n.node
)""")
    tail = (
        f"SELECT node, {_sql_round_det('rank', 6)} AS rank "
        f"FROM r{n_iter} ORDER BY node"
    )
    return head + "," + ",".join(iters) + "\n" + tail


_SQL_HOST_PAGERANK = _sql_host_pagerank()

DEFS["host_pagerank"] = (_q_host_pagerank, _SQL_HOST_PAGERANK)
