"""Query registry: every operator as (Spark DataFrame fn, DuckDB oracle SQL).

One entry per operator from SURVEY.md §2 plus the training-data-pipeline
operators (dedup, similarity, text analysis). The Spark side and the
SQL side are written as expression-level mirrors; parity is enforced by
``tests/test_queries.py`` exactly the way the grading driver does it
(row count + schema names + order-insensitive value compare).

Float discipline (so order-insensitive hashing can't be broken by
summation order):
* sums of money/rates go through DECIMAL (exact, order-independent),
  then cast to double and round;
* sums of whole-number doubles (quantities, counts) are exact in
  binary64 regardless of order;
* per-row double arithmetic (cosine, ratios) is identical expression
  trees on both sides, rounded to 6 dp.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from westa_ocr_spark.functions import textfns
from westa_ocr_spark.functions.textfns import round_det
from westa_ocr_spark.operators import dedup, similarity
from westa_ocr_spark.operators.parse_details import parse_detail_rows

# ---------------------------------------------------------------------------
# helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sql_round_det(expr: str, digits: int = 6) -> str:
    scale = float(10 ** digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


# SQL twin of textfns.normalize_text
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


def _sql_occ(col: str, needle: str) -> str:
    pad = f"(' ' || {col} || ' ')"
    return (
        f"cast((length({pad}) - length(replace({pad}, '{needle}', '')))"
        f" / {len(needle)} as bigint)"
    )


def _sql_lang_scores(col: str) -> dict[str, str]:
    return {
        lang: " + ".join(_sql_occ(col, w) for w in words)
        for lang, words in textfns._LANG_STOPWORDS.items()
    }


def _sql_lang_best(col: str) -> str:
    """DuckDB twin of textfns.lang_best_struct: list_max of
    (score, -rank) structs — lexicographic struct compare, ties to the
    alphabetically smallest language."""
    scores = _sql_lang_scores(col)
    langs = sorted(scores)
    items = ", ".join(
        f"struct_pack(s := ({scores[lang]}), r := {-i})"
        for i, lang in enumerate(langs)
    )
    return f"list_max([{items}])"


def _sql_lang_from_best(best: str) -> str:
    langs = sorted(textfns._LANG_STOPWORDS)
    arr = "[" + ", ".join(f"'{lang}'" for lang in langs) + "]"
    return (
        f"case when ({best}).s > 0 then ({arr})[-(({best}).r) + 1] "
        "else 'und' end"
    )


def _sql_token_count(col: str) -> str:
    return (
        f"cast(case when length(trim({col})) = 0 then 0 else "
        f"len(string_split_regex(trim({col}), '\\s+')) end as bigint)"
    )


def _sql_stop_ratio(col: str) -> str:
    toks = _sql_token_count(col)
    stops = " + ".join(
        _sql_occ(col, w)
        for ws in textfns._LANG_STOPWORDS.values()
        for w in ws
    )
    return (
        f"case when ({toks}) = 0 then 0.0 else "
        f"cast(({stops}) as double) / cast(({toks}) as double) end"
    )


def _sql_punct_ratio(col: str) -> str:
    return (
        f"case when length({col}) = 0 then 0.0 else "
        f"cast(length(regexp_replace({col}, '[^\\.,;:!\\?]', '', 'g')) "
        f"as double) / length({col}) end"
    )


def _sql_quality(col: str) -> str:
    length_f = f"least(length({col}) / 500.0, 1.0)"
    stop_f = f"least(({_sql_stop_ratio(col)}) / 0.2, 1.0)"
    punct_f = (
        f"greatest(0.0, 1.0 - greatest(0.0, ({_sql_punct_ratio(col)}) - 0.1)"
        " * 5.0)"
    )
    return _sql_round_det(f"0.4 * {length_f} + 0.3 * {stop_f} + 0.3 * {punct_f}", 6)


# SQL twin of dedup._shingles (k=3)
_SQL_WORDS = f"string_split({_SQL_NORM}, ' ')"


def _sql_shingles(col: str, k: int = 3) -> str:
    words = _SQL_WORDS.format(c=col)
    return (
        f"list_transform(range(1, greatest(len({words}) - {k - 1}, 1) + 1),"
        f" i -> array_to_string(({words})[i:i+{k - 1}], ' '))"
    )


def _sql_simhash16(col: str) -> str:
    words = (
        f"list_filter(string_split({_SQL_NORM.format(c=col)}, ' '),"
        " w -> length(w) > 0)"
    )
    hashes = (
        f"list_transform({words}, w -> ascii(substring(md5(w), 1, 1)) * 256"
        " + ascii(substring(md5(w), 2, 1)))"
    )
    terms = []
    for bit in range(16):
        votes = (
            f"list_sum(list_transform({hashes}, h -> case when "
            f"cast(floor(h / pow(2, {bit})) as bigint) % 2 = 1 "
            "then 1 else -1 end))"
        )
        terms.append(f"case when ({votes}) > 0 then {2 ** bit} else 0 end")
    return f"cast({' + '.join(terms)} as bigint)"


# ---------------------------------------------------------------------------
# SURVEY §2.2 filters / projections

def _q_filter_pending(spark, sf):
    # F1/F2: pending-status predicate (IN-list filter)
    return (
        _t(spark, sf, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select("event_id", "user_id", "event_type")
    )


_SQL_FILTER_PENDING = (
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE event_type IN ('signup', 'purchase')"
)


def _q_filter_errors(spark, sf):
    # F3: error-rows filter + projection
    return (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id",
                round_det(F.col("value"), 6).alias("value"))
    )


_SQL_FILTER_ERRORS = (
    "SELECT event_id, user_id, " + _sql_round_det("value", 6) + " AS value FROM events "
    "WHERE event_type = 'error'"
)


def _q_filter_nonempty(spark, sf):
    # F4: non-empty text predicate, aggregated per lang
    return (
        _t(spark, sf, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SQL_FILTER_NONEMPTY = (
    "SELECT lang, count(*) AS n_docs FROM documents "
    "WHERE length(trim(text)) > 0 GROUP BY lang"
)


def _q_filter_min_columns(spark, sf):
    # F5: >=15-column predicate over whitespace-split docs
    return (
        _t(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_cols"),
        )
        .filter(F.col("n_cols") >= 15)
    )


_SQL_FILTER_MIN_COLUMNS = (
    "SELECT doc_id, len(string_split(text, ' ')) AS n_cols FROM documents "
    "WHERE len(string_split(text, ' ')) >= 15"
)


def _q_project_rename(spark, sf):
    # F7/F8/F9: select + rename projection
    return _t(spark, sf, "documents").select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("language"),
        F.col("n_chars").alias("size_chars"),
    )


_SQL_PROJECT_RENAME = (
    "SELECT doc_id AS id, lang AS language, n_chars AS size_chars "
    "FROM documents"
)


# ---------------------------------------------------------------------------
# SURVEY §2.3 joins

def _q_join_assembly(spark, sf):
    # J1: 1:N assembly — orders left-joined to lineitem counters
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").alias("sum_qty"),  # whole numbers: exact
    )
    return (
        orders.join(agg, orders.o_orderkey == agg.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("sum_qty", F.lit(0.0)).alias("sum_qty"),
        )
    )


_SQL_JOIN_ASSEMBLY = (
    "SELECT o_orderkey, coalesce(a.n_lines, 0) AS n_lines, "
    "coalesce(a.sum_qty, 0.0) AS sum_qty FROM orders o LEFT JOIN ("
    "SELECT l_orderkey, count(*) AS n_lines, sum(l_quantity) AS sum_qty "
    "FROM lineitem GROUP BY l_orderkey) a ON o.o_orderkey = a.l_orderkey"
)


def _q_join_broadcast(spark, sf):
    # J2: broadcast small dim into fact scan
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


_SQL_JOIN_BROADCAST = (
    "SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty "
    "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"
)


def _q_resume_anti_join(spark, sf):
    # J4: checkpointed-resume anti-join (customers without orders)
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return cust.join(
        orders.select("o_custkey").distinct(),
        cust.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name")


_SQL_RESUME_ANTI_JOIN = (
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS ("
    "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
)


def _q_semi_join(spark, sf):
    # J5: idempotency semi-join (customers having orders), per segment
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return (
        cust.join(
            orders.select("o_custkey").distinct(),
            cust.c_custkey == F.col("o_custkey"),
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_SQL_SEMI_JOIN = (
    "SELECT c_mktsegment, count(*) AS n_customers FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
    "GROUP BY c_mktsegment"
)


# ---------------------------------------------------------------------------
# SURVEY §2.4 aggregations

def _q_manifest_counters(spark, sf):
    # A1-A6: per-key counters, skipped derivation, status synthesis,
    # '; '-joined error concat (deterministic lexical order)
    ev = _t(spark, sf, "events")
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.array_join(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("event_type") == "error",
                        F.concat(F.lit("evt_"), F.col("event_id")),
                    )
                )
            ),
            "; ",
        ).alias("last_error"),
    )
    return agg.select(
        "user_id",
        "total_events",
        (F.col("total_events") - F.col("n_errors")).alias("processed"),
        F.greatest(F.lit(0), F.col("n_errors")).alias("skipped"),
        F.when(F.col("n_errors") > 0, F.lit("ERROR"))
        .otherwise(F.lit("DONE"))
        .alias("status"),
        "last_error",
    )


_SQL_MANIFEST_COUNTERS = (
    "SELECT user_id, count(*) AS total_events, "
    "count(*) - count(CASE WHEN event_type = 'error' THEN 1 END) "
    "AS processed, "
    "greatest(0, count(CASE WHEN event_type = 'error' THEN 1 END)) "
    "AS skipped, "
    "CASE WHEN count(CASE WHEN event_type = 'error' THEN 1 END) > 0 "
    "THEN 'ERROR' ELSE 'DONE' END AS status, "
    "coalesce(string_agg(CASE WHEN event_type = 'error' THEN "
    "'evt_' || event_id END, '; ' ORDER BY "
    "CASE WHEN event_type = 'error' THEN 'evt_' || event_id END), '') "
    "AS last_error "
    "FROM events GROUP BY user_id"
)


def _q_count_totals(spark, sf):
    # A5: global counters + distinct
    return _t(spark, sf, "events").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


_SQL_COUNT_TOTALS = (
    "SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users, "
    "count(DISTINCT event_type) AS n_types FROM events"
)


def _q_status_rollup(spark, sf):
    # per-type stats with exact-safe aggregation
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_det(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


_SQL_STATUS_ROLLUP = (
    "SELECT event_type, count(*) AS n, "
    + _sql_round_det(
        "cast(sum(cast(value AS decimal(18,2))) AS double) / count(*)", 6)
    + " AS avg_value, min(ts) AS first_ts, max(ts) AS last_ts "
    "FROM events GROUP BY event_type"
)


# ---------------------------------------------------------------------------
# SURVEY §2.5 windows / ordering / limits

def _q_page_numbering(spark, sf):
    # W1: 1-based numbering within a document/order
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("long").alias("page_index"),
    )


_SQL_PAGE_NUMBERING = (
    "SELECT l_orderkey, l_linenumber, row_number() OVER ("
    "PARTITION BY l_orderkey ORDER BY l_linenumber) AS page_index "
    "FROM lineitem WHERE l_orderkey < 100"
)


def _q_recent_topk(spark, sf):
    # W3/W6: recent-first + limit (total order via tiebreak)
    return (
        _t(spark, sf, "events")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_id", "ts", "event_type")
        .limit(50)
    )


_SQL_RECENT_TOPK = (
    "SELECT event_id, ts, event_type FROM events "
    "ORDER BY ts DESC, event_id DESC LIMIT 50"
)


def _q_ring_buffer_topk(spark, sf):
    # W5: top-K per key (ring-buffer semantics)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        _t(spark, sf, "events")
        .select(
            "user_id", "event_id",
            F.row_number().over(w).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


_SQL_RING_BUFFER_TOPK = (
    "SELECT user_id, event_id, rn FROM (SELECT user_id, event_id, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, "
    "event_id DESC) AS rn FROM events) WHERE rn <= 3"
)


def _q_pagination_count(spark, sf):
    # W7: ceil(total / page_size)
    return _t(spark, sf, "events").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(100.0)).cast("long").alias("n_pages")
    )


_SQL_PAGINATION_COUNT = (
    "SELECT cast(ceil(count(*) / 100.0) AS bigint) AS n_pages FROM events"
)


# ---------------------------------------------------------------------------
# SURVEY §2.6 scalar / string / date functions

def _q_regex_header_extract(spark, sf):
    # X3/X4/X6 over a synthesized protocol page (semantics of the
    # reference's header regexes, deterministic by construction)
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    page = F.concat(
        F.lit("【得意先】"),
        F.col("source"),
        F.lit("\n【受注日】2025-01-15\n【注文明細】\n"),
        F.col("text"),
    )
    return docs.select(
        "doc_id",
        F.trim(F.regexp_extract(page, "【得意先】([^\n【]*)", 1)).alias(
            "tokusaki"
        ),
        F.trim(F.regexp_extract(page, "【受注日】([^\n【]*)", 1)).alias(
            "juchu_date"
        ),
        F.regexp_extract(page, "(?s)【注文明細】(.*)", 1).alias("detail"),
    )


_SQL_REGEX_HEADER_EXTRACT = (
    "SELECT doc_id, "
    "trim(regexp_extract(page, '【得意先】([^\n【]*)', 1)) AS tokusaki, "
    "trim(regexp_extract(page, '【受注日】([^\n【]*)', 1)) AS juchu_date, "
    "regexp_extract(page, '(?s)【注文明細】(.*)', 1) AS detail FROM ("
    "SELECT doc_id, '【得意先】' || source || "
    "'\n【受注日】2025-01-15\n【注文明細】\n' || text AS page "
    "FROM documents WHERE doc_id < 500)"
)


def _q_split_pages_explode(spark, sf):
    # X1/D5: page-delimiter split + blank drop + renumber
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    raw = F.concat(
        F.lit("--- PAGE 1 ---\n"),
        F.col("text"),
        F.lit("\n--- PAGE 2 ---\n"),
        F.col("source"),
        F.lit("\n--- PAGE 3 ---\n   \n"),  # blank page -> dropped
    )
    blocks = F.filter(
        F.split(raw, "--- PAGE [0-9]+ ---"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    return docs.select(
        "doc_id", F.posexplode(blocks).alias("pos", "block")
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("page_no"),
        F.trim("block").alias("block"),
    )


_SQL_SPLIT_PAGES_EXPLODE = (
    "SELECT doc_id, i AS page_no, trim(b) AS block FROM ("
    "SELECT doc_id, unnest(blocks) AS b, "
    "generate_subscripts(blocks, 1) AS i FROM ("
    "SELECT doc_id, list_filter(string_split_regex("
    "'--- PAGE 1 ---' || chr(10) || text || chr(10) || "
    "'--- PAGE 2 ---' || chr(10) || source || chr(10) || "
    "'--- PAGE 3 ---' || chr(10) || '   ' || chr(10), "
    "'--- PAGE [0-9]+ ---'), x -> length(trim(x)) > 0) AS blocks "
    "FROM documents WHERE doc_id < 200))"
)


def _q_csv_detail_parse(spark, sf):
    # X5/F5: CSV split + trim + positional mapping, >=15 columns kept
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    cells = F.transform(
        F.split(F.regexp_replace("text", " ", ","), ","), F.trim
    )
    return (
        docs.select("doc_id", cells.alias("cells"))
        .filter(F.size("cells") >= 15)
        .select(
            "doc_id",
            F.size("cells").cast("long").alias("n_fields"),
            F.element_at("cells", 1).alias("order_slip_no"),
            F.element_at("cells", 2).alias("delivery_place"),
            F.element_at("cells", 15).alias("order_note"),
        )
    )


_SQL_CSV_DETAIL_PARSE = (
    "SELECT doc_id, len(cells) AS n_fields, cells[1] AS order_slip_no, "
    "cells[2] AS delivery_place, cells[15] AS order_note FROM "
    "(SELECT doc_id, "
    "list_transform(string_split(regexp_replace(text, ' ', ',', 'g'), ','),"
    " x -> trim(x)) AS cells FROM documents WHERE doc_id < 300) "
    "WHERE len(cells) >= 15"
)


def _q_token_mask(spark, sf):
    # X10: token masking (prefix…suffix, full mask when short)
    docs = _t(spark, sf, "documents")
    src = F.col("source")
    return docs.select(
        "doc_id",
        F.when(F.length(src) <= 4, F.lit("****"))
        .otherwise(
            F.concat(
                F.substring(src, 1, 4), F.lit("…"), F.substring(src, -2, 2)
            )
        )
        .alias("masked"),
    )


_SQL_TOKEN_MASK = (
    "SELECT doc_id, CASE WHEN length(source) <= 4 THEN '****' ELSE "
    "substring(source, 1, 4) || '…' || substring(source, -2, 2) END "
    "AS masked FROM documents"
)


def _q_ts_format(spark, sf):
    # X15: UTC -> JST formatting (fixed +9, no DST)
    ev = _t(spark, sf, "events")
    return (
        ev.select(
            F.date_format(
                F.from_utc_timestamp("ts", "Asia/Tokyo"), "yyyyMMdd"
            ).alias("ymd_jst")
        )
        .groupBy("ymd_jst")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SQL_TS_FORMAT = (
    "SELECT strftime(ts + INTERVAL 9 HOUR, '%Y%m%d') AS ymd_jst, "
    "count(*) AS n FROM events GROUP BY 1"
)


def _q_deterministic_ids(spark, sf):
    # X11/X12: content-derived deterministic ids (sha256 prefix)
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.substring(
            F.sha2(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")),
                   256),
            1,
            16,
        ).alias("det_id"),
    )


_SQL_DETERMINISTIC_IDS = (
    "SELECT doc_id, substring(sha256('doc:' || cast(doc_id AS varchar)), "
    "1, 16) AS det_id FROM documents"
)


def _q_props_extract(spark, sf):
    # X14: nested-field decode (regex-based for engine parity)
    ev = _t(spark, sf, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("long")
    return (
        ev.select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SQL_PROPS_EXTRACT = (
    "SELECT cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS bigint) "
    "AS k, count(*) AS n FROM events GROUP BY 1"
)


# ---------------------------------------------------------------------------
# SURVEY §2.7 D5: structured multi-page parse (full composition)

def _q_parse_details(spark, sf):
    docs = _t(spark, sf, "documents").filter(
        (F.col("doc_id") < 200)
        & (F.size(F.split("text", " ")) >= 15)
    )
    words = F.split("text", " ")
    csvline = F.concat_ws(",", F.slice(words, 1, 15))
    raw = F.concat(
        F.lit("--- PAGE 1 ---\n【得意先】"),
        F.col("source"),
        F.lit("\n【受注日】2025-01-15\n【注文明細】\n"),
        csvline,
        F.lit("\n--- PAGE 2 ---\nこのページは注文書ではありません。"),
    )
    return parse_detail_rows(
        docs.select("doc_id", raw.alias("raw")), "doc_id", "raw"
    )


_SQL_PARSE_DETAILS = """
WITH src AS (
  SELECT doc_id,
         '--- PAGE 1 ---' || chr(10) || '【得意先】' || source || chr(10) ||
         '【受注日】2025-01-15' || chr(10) || '【注文明細】' || chr(10) ||
         array_to_string((string_split(text, ' '))[1:15], ',') || chr(10) ||
         '--- PAGE 2 ---' || chr(10) ||
         'このページは注文書ではありません。' AS raw
  FROM documents
  WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 15
), pages AS (
  SELECT doc_id, cast(i AS int) AS page_no, pg,
         contains(pg, 'このページは注文書ではありません。')
           AS is_non_order,
         trim(regexp_extract(pg, '【得意先】([^' || chr(10) ||
           '【]*)', 1)) AS tokusaki,
         trim(regexp_extract(pg, '【受注日】([^' || chr(10) ||
           '【]*)', 1)) AS juchu_date,
         trim(regexp_extract(pg, '【得意先注文番号】([^' || chr(10) ||
           '【]*)', 1)) AS chumon_bango,
         regexp_extract(pg, '(?s)【注文明細】(.*)', 1) AS detail
  FROM (
    SELECT doc_id, unnest(blocks) AS pg,
           generate_subscripts(blocks, 1) AS i
    FROM (
      SELECT doc_id, list_filter(
        string_split_regex(raw, '--- PAGE [0-9]+ ---'),
        x -> length(trim(x)) > 0) AS blocks
      FROM src))
), lines AS (
  SELECT doc_id, page_no, is_non_order, tokusaki, juchu_date,
         chumon_bango, cast(j AS int) AS row_no,
         list_transform(string_split(ln, ','), x -> trim(x)) AS cells
  FROM (
    SELECT *, unnest(dlines) AS ln, generate_subscripts(dlines, 1) AS j
    FROM (
      SELECT *, list_filter(string_split(detail, chr(10)),
        x -> length(trim(x)) > 0) AS dlines
      FROM pages))
)
SELECT doc_id AS id, page_no, is_non_order, tokusaki, juchu_date,
       chumon_bango, row_no, cast(len(cells) AS int) AS n_fields,
       cells[1] AS order_slip_no, cells[2] AS delivery_place,
       cells[3] AS customer, cells[4] AS customer_order_no,
       cells[5] AS order_date, cells[6] AS ship_date,
       cells[7] AS customer_due_date, cells[8] AS customer_item_code,
       cells[9] AS item_code, cells[10] AS product_name,
       cells[11] AS quantity, cells[12] AS unit,
       cells[13] AS unit_price, cells[14] AS delivery_note,
       cells[15] AS order_note
FROM lines WHERE len(cells) >= 15
"""


# ---------------------------------------------------------------------------
# Text analysis (training-data pipeline)

def _q_lang_id(spark, sf):
    docs = _t(spark, sf, "documents")
    return (
        textfns.with_lang_id(docs.select("text"), "text")
        .groupBy("lang_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SQL_LANG_ID = (
    "SELECT lang_id, count(*) AS n_docs FROM ("
    f"SELECT {_sql_lang_from_best('best')} AS lang_id FROM ("
    f"SELECT {_sql_lang_best('text')} AS best FROM documents)) GROUP BY 1"
)


def _q_quality_scores(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id", textfns.quality_score(F.col("text")).alias("quality")
    )


_SQL_QUALITY_SCORES = (
    f"SELECT doc_id, {_sql_quality('text')} AS quality FROM documents"
)


def _q_token_counts(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        textfns.token_count(F.col("text")).alias("ws_tokens"),
        textfns.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


_SQL_TOKEN_COUNTS = (
    f"SELECT doc_id, {_sql_token_count('text')} AS ws_tokens, "
    "cast(len(regexp_extract_all(text, "
    "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bigint) AS bpe_tokens "
    "FROM documents"
)


def _q_fingerprints(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id", textfns.fingerprint(F.col("text")).alias("fp")
    )


_SQL_FINGERPRINTS = (
    f"SELECT doc_id, md5({_SQL_NORM.format(c='text')}) AS fp FROM documents"
)


# ---------------------------------------------------------------------------
# Deduplication

def _q_exact_dedup(spark, sf):
    return dedup.exact_duplicates(_t(spark, sf, "documents"))


_SQL_EXACT_DEDUP = (
    f"SELECT fp, count(*) AS group_size, min(doc_id) AS canonical_id "
    f"FROM (SELECT md5({_SQL_NORM.format(c='text')}) AS fp, doc_id "
    "FROM documents) GROUP BY fp HAVING count(*) > 1"
)


def _q_minhash_signatures(spark, sf):
    return dedup.minhash_signatures(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    )


_SQL_MINHASH_SIGNATURES = (
    "SELECT doc_id, "
    + ", ".join(
        f"min(md5('{seed}:' || shingle)) AS mh_{i}"
        for i, seed in enumerate(dedup.MINHASH_SEEDS)
    )
    + " FROM (SELECT doc_id, unnest("
    + _sql_shingles("text")
    + ") AS shingle FROM documents WHERE doc_id < 500) "
    "WHERE length(shingle) > 0 GROUP BY doc_id"
)


def _q_minhash_lsh_buckets(spark, sf):
    return dedup.minhash_lsh_buckets(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    )


_SQL_MINHASH_LSH_BUCKETS = (
    "WITH sig AS (" + _SQL_MINHASH_SIGNATURES + "), bands AS ("
    "SELECT doc_id, 0 AS band, md5(mh_0 || '|' || mh_1) AS bucket FROM sig "
    "UNION ALL "
    "SELECT doc_id, 1 AS band, md5(mh_2 || '|' || mh_3) AS bucket FROM sig) "
    "SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS canonical_id "
    "FROM bands GROUP BY band, bucket HAVING count(*) > 1"
)


def _q_ngram_jaccard(spark, sf):
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 500),
        top_n=20,
    )


_SQL_NGRAM_JACCARD = (
    "WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ("
    "SELECT doc_id, unnest(" + _sql_shingles("text") + ") AS shingle "
    "FROM documents WHERE doc_id < 500) WHERE length(shingle) > 0), "
    "sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1), "
    "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "count(*) AS shared FROM sh a JOIN sh b USING (shingle) "
    "WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, shared, sa.n_shingles AS size_a, "
    "sb.n_shingles AS size_b, "
    + _sql_round_det(
        "cast(shared AS double) / (sa.n_shingles + sb.n_shingles - shared)",
        6)
    + " AS jaccard "
    "FROM shared JOIN sizes sa ON sa.doc_id = doc_a "
    "JOIN sizes sb ON sb.doc_id = doc_b "
    "ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20"
)


def _q_simhash16(spark, sf):
    return dedup.simhash16_df(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    )


_SQL_SIMHASH16 = (
    f"SELECT doc_id, {_sql_simhash16('text')} AS simhash "
    "FROM documents WHERE doc_id < 300"
)


def _q_simhash64(spark, sf):
    # 64-bit pandas-UDF SimHash — no SQL twin (rows-only check)
    return dedup.simhash64(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    )


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
    # small-batch exact k-NN join: 20 probes x all vectors, top-3 each
    emb = _t(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    joined = probes.crossJoin(emb).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    dot = F.aggregate(
        F.zip_with(
            "probe_vec",
            "embedding",
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = joined.select(
        "probe_id",
        "vec_id",
        round_det(
            dot / (norm(F.col("probe_vec")) * norm(F.col("embedding"))), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "vec_id")
    return scored.select(
        "*", F.row_number().over(w).cast("long").alias("rn")
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


# ---------------------------------------------------------------------------
# TPC-H-style analytics (decimal-exact money math)

def _q_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            round_det(F.sum(price).cast("double"), 2).alias(
                "sum_base_price"
            ),
            round_det(
                F.sum(price * (F.lit(1).cast("decimal(5,3)") - disc)).cast(
                    "double"
                ),
                2,
            ).alias("sum_disc_price"),
            round_det(
                F.sum(disc).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_TPCH_Q1 = (
    "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
    + _sql_round_det(
        "cast(sum(cast(l_extendedprice AS decimal(18,4))) AS double)", 2)
    + " AS sum_base_price, "
    + _sql_round_det(
        "cast(sum(cast(l_extendedprice AS decimal(18,4)) * "
        "(cast(1 AS decimal(5,3)) - cast(l_discount AS decimal(5,3)))) "
        "AS double)", 2)
    + " AS sum_disc_price, "
    + _sql_round_det(
        "cast(sum(cast(l_discount AS decimal(5,3))) AS double) / count(*)",
        6)
    + " AS avg_disc, count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus"
)


def _q_tpch_q3(spark, sf):
    cust = _t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            round_det(
                F.sum(price * (F.lit(1).cast("decimal(5,3)") - disc)).cast(
                    "double"
                ),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


_SQL_TPCH_Q3 = (
    "SELECT o_orderkey, o_orderdate, "
    + _sql_round_det(
        "cast(sum(cast(l_extendedprice AS decimal(18,4)) * "
        "(cast(1 AS decimal(5,3)) - cast(l_discount AS decimal(5,3)))) "
        "AS double)", 2)
    + " AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "GROUP BY o_orderkey, o_orderdate "
    "ORDER BY revenue DESC, o_orderkey LIMIT 10"
)


# ---------------------------------------------------------------------------
# Extraction pipeline as a query (rows-only: input is generated, the
# pages corpus isn't one of the oracle views)

def _q_extract_pages(spark, sf):
    import tempfile

    from westa_ocr_spark.corpus import write_pages_parquet
    from westa_ocr_spark.operators.extract import extract_pages

    from westa_ocr_spark.corpus import CORPUS_VERSION

    path = tempfile.gettempdir() + f"/westa_q_pages_v{CORPUS_VERSION}_200"
    write_pages_parquet(path, n=200, seed=42)
    out = extract_pages(spark.read.parquet(path))
    return out.select(
        "url", "page_index", "status", "kind", "n_blocks",
        F.length("text").alias("text_chars"),
    )


# ---------------------------------------------------------------------------
# registry

QUERIES: dict[str, tuple[Callable, str | None]] = {
    # §2.2 filters / projections
    "filter_pending": (_q_filter_pending, _SQL_FILTER_PENDING),
    "filter_errors": (_q_filter_errors, _SQL_FILTER_ERRORS),
    "filter_nonempty": (_q_filter_nonempty, _SQL_FILTER_NONEMPTY),
    "filter_min_columns": (_q_filter_min_columns, _SQL_FILTER_MIN_COLUMNS),
    "project_rename": (_q_project_rename, _SQL_PROJECT_RENAME),
    # §2.3 joins
    "join_assembly": (_q_join_assembly, _SQL_JOIN_ASSEMBLY),
    "join_broadcast": (_q_join_broadcast, _SQL_JOIN_BROADCAST),
    "resume_anti_join": (_q_resume_anti_join, _SQL_RESUME_ANTI_JOIN),
    "semi_join": (_q_semi_join, _SQL_SEMI_JOIN),
    # §2.4 aggregations
    "manifest_counters": (_q_manifest_counters, _SQL_MANIFEST_COUNTERS),
    "count_totals": (_q_count_totals, _SQL_COUNT_TOTALS),
    "status_rollup": (_q_status_rollup, _SQL_STATUS_ROLLUP),
    # §2.5 windows
    "page_numbering": (_q_page_numbering, _SQL_PAGE_NUMBERING),
    "recent_topk": (_q_recent_topk, _SQL_RECENT_TOPK),
    "ring_buffer_topk": (_q_ring_buffer_topk, _SQL_RING_BUFFER_TOPK),
    "pagination_count": (_q_pagination_count, _SQL_PAGINATION_COUNT),
    # §2.6 scalar functions
    "regex_header_extract": (
        _q_regex_header_extract, _SQL_REGEX_HEADER_EXTRACT),
    "split_pages_explode": (
        _q_split_pages_explode, _SQL_SPLIT_PAGES_EXPLODE),
    "csv_detail_parse": (_q_csv_detail_parse, _SQL_CSV_DETAIL_PARSE),
    "token_mask": (_q_token_mask, _SQL_TOKEN_MASK),
    "ts_format": (_q_ts_format, _SQL_TS_FORMAT),
    "deterministic_ids": (_q_deterministic_ids, _SQL_DETERMINISTIC_IDS),
    "props_extract": (_q_props_extract, _SQL_PROPS_EXTRACT),
    # §2.7 D5 structured parse
    "parse_details": (_q_parse_details, _SQL_PARSE_DETAILS),
    # text analysis
    "lang_id": (_q_lang_id, _SQL_LANG_ID),
    "quality_scores": (_q_quality_scores, _SQL_QUALITY_SCORES),
    "token_counts": (_q_token_counts, _SQL_TOKEN_COUNTS),
    "fingerprints": (_q_fingerprints, _SQL_FINGERPRINTS),
    # dedup
    "exact_dedup": (_q_exact_dedup, _SQL_EXACT_DEDUP),
    "minhash_signatures": (_q_minhash_signatures, _SQL_MINHASH_SIGNATURES),
    "minhash_lsh_buckets": (
        _q_minhash_lsh_buckets, _SQL_MINHASH_LSH_BUCKETS),
    "ngram_jaccard": (_q_ngram_jaccard, _SQL_NGRAM_JACCARD),
    "simhash16": (_q_simhash16, _SQL_SIMHASH16),
    "simhash64": (_q_simhash64, None),
    # similarity
    "embedding_topk": (_q_embedding_topk, _SQL_EMBEDDING_TOPK),
    "embedding_knn": (_q_embedding_knn, _SQL_EMBEDDING_KNN),
    "lsh_topk": (_q_lsh_topk, None),
    # TPC-H analytics
    "tpch_q1": (_q_tpch_q1, _SQL_TPCH_Q1),
    "tpch_q3": (_q_tpch_q3, _SQL_TPCH_Q3),
    # extraction pipeline (generated corpus, rows-only)
    "extract_pages_job": (_q_extract_pages, None),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in QUERIES.items() if sql is not None
    }


# ---------------------------------------------------------------------------
# Coverage batch 2: remaining §2 scalar ops + extended analytics

def _q_drive_id_normalize(spark, sf):
    # S4: drive-id normalization — strip scheme prefix, validate
    # ^[A-Za-z0-9_-]{10,}$ (reference regex:
    # /root/reference/app/file_fetcher.py:22,71-81)
    docs = _t(spark, sf, "documents")
    raw = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("drive://"))
        .when(F.col("doc_id") % 3 == 1, F.lit("drive:"))
        .otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.substring(F.md5("text"), 1, 4)
        ).otherwise(F.md5("text")),  # short ids are invalid
    )
    norm = F.regexp_replace(raw, "^drive:(//)?", "")
    return docs.select(
        "doc_id",
        F.when(
            norm.rlike("^[A-Za-z0-9_-]{10,}$"), norm
        ).alias("drive_id"),
    )


_SQL_DRIVE_ID_NORMALIZE = (
    "SELECT doc_id, CASE WHEN regexp_matches(norm, '^[A-Za-z0-9_-]{10,}$')"
    " THEN norm END AS drive_id FROM (SELECT doc_id, "
    "regexp_replace(CASE WHEN doc_id % 3 = 0 THEN 'drive://' "
    "WHEN doc_id % 3 = 1 THEN 'drive:' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN substring(md5(text), 1, 4) "
    "ELSE md5(text) END, '^drive:(//)?', '') AS norm FROM documents)"
)


def _q_prompt_assembly(spark, sf):
    # X6 date templating + X7 masters concat (null-skipping) + X9
    # preview + X13 CSV quoting + X16 error prefix + X17 key coalesce
    docs = _t(spark, sf, "documents")
    prompt = F.regexp_replace(
        F.lit("extract on {current_date} please"),
        r"\{current_date\}",
        F.date_format(F.lit("2025-01-15").cast("timestamp"), "yyyyMMdd"),
    )
    ship_csv = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit('"'),
                 F.regexp_replace(F.col("source"), '"', '""'),
                 F.lit('"')),
    )  # null for odd ids -> concat_ws skips
    full = F.concat_ws("\n\n", prompt, ship_csv, F.col("lang"))
    return docs.select(
        "doc_id",
        F.translate(F.substring(full, 1, 200), "\n", " ").alias(
            "prompt_preview"
        ),
        F.concat_ws(": ", F.lit("extract"), F.col("lang")).alias(
            "error_label"
        ),
        F.coalesce(
            F.when(F.col("doc_id") % 7 == 0, F.col("source")),
            F.concat_ws(":", F.col("doc_id"), F.lit("1")),
        ).alias("idempotency_key"),
    )


_SQL_PROMPT_ASSEMBLY = (
    "SELECT doc_id, replace(substring(assembled, 1, 200), chr(10), ' ') "
    "AS prompt_preview, 'extract: ' || lang AS error_label, "
    "coalesce(CASE WHEN doc_id % 7 = 0 THEN source END, "
    "doc_id || ':1') AS idempotency_key FROM (SELECT *, "
    "concat_ws(chr(10) || chr(10), "
    "replace('extract on {current_date} please', '{current_date}', "
    "strftime(timestamp '2025-01-15 00:00:00', '%Y%m%d')), "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'\"' || replace(source, '\"', '\"\"') || '\"' END, lang) AS assembled "
    "FROM documents)"
)


def _q_base64_roundtrip(spark, sf):
    # X8: base64 encode/decode of payload bytes
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    # Spark's base64 MIME-chunks with \r\n every 76 chars; strip to
    # the canonical unchunked form (DuckDB's output)
    enc = F.regexp_replace(
        F.base64(F.col("text").cast("binary")), "[\\r\\n]", ""
    )
    return docs.select(
        "doc_id",
        enc.alias("b64"),
        F.unbase64(enc).cast("string").alias("roundtrip"),
    )


_SQL_BASE64_ROUNDTRIP = (
    "SELECT doc_id, to_base64(encode(text)) AS b64, "
    "decode(from_base64(to_base64(encode(text)))) AS roundtrip "
    "FROM documents WHERE doc_id < 200"
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


QUERIES.update(
    {
        "drive_id_normalize": (
            _q_drive_id_normalize, _SQL_DRIVE_ID_NORMALIZE),
        "prompt_assembly": (_q_prompt_assembly, _SQL_PROMPT_ASSEMBLY),
        "base64_roundtrip": (_q_base64_roundtrip, _SQL_BASE64_ROUNDTRIP),
        "rollup_counts": (_q_rollup_counts, _SQL_ROLLUP_COUNTS),
        "pivot_event_types": (
            _q_pivot_event_types, _SQL_PIVOT_EVENT_TYPES),
        "set_ops": (_q_set_ops, _SQL_SET_OPS),
        "deterministic_sample": (
            _q_deterministic_sample, _SQL_DETERMINISTIC_SAMPLE),
        "sessionize": (_q_sessionize, _SQL_SESSIONIZE),
        "top_terms": (_q_top_terms, _SQL_TOP_TERMS),
    }
)


def _q_ivf_topk(spark, sf):
    # IVF ANN (coarse-quantizer probe) — numpy-in-Arrow path, no SQL
    # twin (rows-only check)
    return similarity.ivf_topk(
        _t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10,
        n_centroids=16, n_probe=4,
    )


QUERIES["ivf_topk"] = (_q_ivf_topk, None)


def _q_tpch_q5(spark, sf):
    # q5-style 6-way join: revenue per nation for one region — the
    # join-reordering / broadcast-dimension showcase (Catalyst picks
    # BHJ for region/nation/supplier, SMJ for the fact tables)
    region = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    supp = _t(spark, sf, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            round_det(
                F.sum(price * (F.lit(1).cast("decimal(5,3)") - disc)).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SQL_TPCH_Q5 = (
    "SELECT n_name, "
    + _sql_round_det(
        "cast(sum(cast(l_extendedprice AS decimal(18,4)) * "
        "(cast(1 AS decimal(5,3)) - cast(l_discount AS decimal(5,3)))) "
        "AS double)", 2)
    + " AS revenue, count(*) AS n_items "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey "
    "GROUP BY n_name"
)


def _q_tpch_q18(spark, sf):
    # q18-style: large orders (HAVING over grouped fact) joined back
    # to customers — aggregate-filter + rejoin pattern
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            round_det(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
    )


_SQL_TPCH_Q18 = (
    "SELECT c_name, o_orderkey, o_orderdate, "
    + _sql_round_det("o_totalprice", 2)
    + " AS o_totalprice, total_qty "
    "FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty "
    "FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey"
)


QUERIES.update(
    {
        "tpch_q5": (_q_tpch_q5, _SQL_TPCH_Q5),
        "tpch_q18": (_q_tpch_q18, _SQL_TPCH_Q18),
    }
)


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


QUERIES.update(
    {
        "asof_join": (_q_asof_join, _SQL_ASOF_JOIN),
        "range_join": (_q_range_join, _SQL_RANGE_JOIN),
    }
)


# ---------------------------------------------------------------------------
# Multimodal + page-payload operators as rows-only queries (binary
# inputs synthesized deterministically from the documents table)

def _media_df(spark, sf):
    """Synthetic media table: REAL png/jpeg/gif bytes (round 2 —
    correct CRCs, SOF segments, screen descriptors) with dimensions
    derived from doc_id, plus a garbage leg for the ERROR path."""
    from westa_ocr_spark.operators import multimodal as mm

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            urls, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 16 + i % 32, 16 + (i * 7) % 32
                if i % 4 == 0:
                    blob = mm.write_jpeg(w, h)
                elif i % 4 == 1:
                    blob = mm.write_png(w, h)
                elif i % 4 == 2:
                    blob = mm.write_gif(w, h)
                else:
                    blob = b"not an image " + str(i).encode()
                urls.append(f"doc://{i}")
                blobs.append(blob)
            yield pd.DataFrame({"url": urls, "data": blobs})

    schema = "url string, data binary"
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def _q_media_features(spark, sf):
    from westa_ocr_spark.operators.multimodal import (
        extract_image_features,
    )

    return extract_image_features(_media_df(spark, sf))


def _q_frame_sampling(spark, sf):
    from westa_ocr_spark.operators.multimodal import sample_frames

    out = sample_frames(_media_df(spark, sf))
    return out.select(
        "url", "frame_index", "status",
        F.octet_length("frame").alias("frame_bytes"),
    )


def _q_split_pdf_payloads(spark, sf):
    import tempfile

    from westa_ocr_spark.corpus import CORPUS_VERSION, write_pages_parquet
    from westa_ocr_spark.operators.split_pdf import split_pdf_payloads

    path = tempfile.gettempdir() + f"/westa_q_pages_v{CORPUS_VERSION}_200"
    write_pages_parquet(path, n=200, seed=42)
    pages = spark.read.parquet(path).filter(
        F.hex(F.substring("html", 1, 5)) == "255044462D"
    )
    out = split_pdf_payloads(pages)
    return out.select(
        "url", "page_index", "mime_type", "status",
        F.octet_length("data").alias("payload_bytes"),
    )


QUERIES.update(
    {
        "media_features": (_q_media_features, None),
        "frame_sampling": (_q_frame_sampling, None),
        "split_pdf_payloads": (_q_split_pdf_payloads, None),
    }
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


QUERIES.update(
    {
        "value_quantiles": (_q_value_quantiles, _SQL_VALUE_QUANTILES),
        "group_zscore": (_q_group_zscore, _SQL_GROUP_ZSCORE),
    }
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


QUERIES["running_range_window"] = (
    _q_running_range_window, _SQL_RUNNING_RANGE_WINDOW)


# ---------------------------------------------------------------------------
# Coverage batch 7 (round 2): duplicate-group resolution

def _q_duplicate_groups(spark, sf):
    """LSH/Jaccard candidate edges -> connected components ->
    (doc_id, canonical_id, group_size). The oracled twin derives its
    edges from the SQL-expressible Jaccard path (jaccard >= 0.9) so
    DuckDB can replay the whole thing with a recursive CTE; the
    128-perm LSH edge source is covered by `lsh_dup_candidates` +
    the chain-collapse unit test."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    edges = dedup.ngram_jaccard_pairs(
        docs, min_jaccard=0.9, top_n=None
    ).select("doc_a", "doc_b")
    return dedup.duplicate_groups(docs, edges=edges)


_SQL_DUPLICATE_GROUPS = (
    "WITH RECURSIVE sh AS (SELECT DISTINCT doc_id, shingle FROM ("
    "SELECT doc_id, unnest(" + _sql_shingles("text") + ") AS shingle "
    "FROM documents WHERE doc_id < 500) WHERE length(shingle) > 0), "
    "sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1), "
    "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "count(*) AS shared FROM sh a JOIN sh b USING (shingle) "
    "WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
    "pairs AS (SELECT doc_a, doc_b FROM shared "
    "JOIN sizes sa ON sa.doc_id = doc_a "
    "JOIN sizes sb ON sb.doc_id = doc_b WHERE "
    + _sql_round_det(
        "cast(shared AS double) / (sa.n_shingles + sb.n_shingles - shared)",
        6)
    + " >= 0.9), "
    "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "walk(node, label) AS (SELECT u, u FROM edges UNION "
    "SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node), "
    "comp AS (SELECT node, min(label) AS canonical_id FROM walk "
    "GROUP BY node) "
    "SELECT c.node AS doc_id, c.canonical_id, g.group_size "
    "FROM comp c JOIN (SELECT canonical_id, count(*) AS group_size "
    "FROM comp GROUP BY 1) g USING (canonical_id)"
)


def _q_lsh_dup_candidates(spark, sf):
    """Production 128-perm x 16-band LSH candidate pairs (xxhash64
    universal-hash family — not SQL-twinnable, rows-only check)."""
    return dedup.lsh_candidate_pairs(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    )


QUERIES["duplicate_groups"] = (_q_duplicate_groups, _SQL_DUPLICATE_GROUPS)
QUERIES["lsh_dup_candidates"] = (_q_lsh_dup_candidates, None)


# ---------------------------------------------------------------------------
# Streaming parity: the drained complete-mode stream equals the batch
# aggregate, so the streaming surface gets a real DuckDB oracle row.

def _q_stream_windowed_counts(spark, sf):
    from westa_ocr_spark.streaming.stream_pipeline import (
        windowed_counts_complete,
    )

    return windowed_counts_complete(
        spark, _t(spark, sf, "events").select("ts", "event_type")
    )


_SQL_STREAM_WINDOWED_COUNTS = (
    "SELECT cast(floor(epoch(ts) / 600) * 600 AS bigint) AS window_start, "
    "event_type, count(*) AS n FROM events GROUP BY 1, 2"
)

QUERIES["stream_windowed_counts"] = (
    _q_stream_windowed_counts, _SQL_STREAM_WINDOWED_COUNTS)


# ---------------------------------------------------------------------------
# Page-grain parse (reference pageResult shape: header-only pages kept)

def _q_parse_pages(spark, sf):
    from westa_ocr_spark.operators.parse_details import parse_pages

    docs = _t(spark, sf, "documents").filter(
        (F.col("doc_id") < 200)
        & (F.size(F.split("text", " ")) >= 15)
    )
    words = F.split("text", " ")
    csvline = F.concat_ws(",", F.slice(words, 1, 15))
    short = F.concat_ws(",", F.slice(words, 1, 5))
    raw = F.concat(
        F.lit("--- PAGE 1 ---\n【得意先】"),
        F.col("source"),
        F.lit("\n【受注日】2025-01-15\n【注文明細】\n"),
        csvline,
        F.lit("\n--- PAGE 2 ---\nこのページは注文書ではありません。"),
        # header-only page: header present, detail rows all <15 cols —
        # parse_detail_rows drops it, parse_pages must RETAIN it
        F.lit("\n--- PAGE 3 ---\n【得意先注文番号】A-77\n【注文明細】\n"),
        short,
    )
    return parse_pages(
        docs.select("doc_id", raw.alias("raw")), "doc_id", "raw"
    )


_SQL_PARSE_PAGES = """
WITH src AS (
  SELECT doc_id,
         '--- PAGE 1 ---' || chr(10) || '【得意先】' || source || chr(10) ||
         '【受注日】2025-01-15' || chr(10) || '【注文明細】' || chr(10) ||
         array_to_string((string_split(text, ' '))[1:15], ',') || chr(10) ||
         '--- PAGE 2 ---' || chr(10) ||
         'このページは注文書ではありません。' || chr(10) ||
         '--- PAGE 3 ---' || chr(10) || '【得意先注文番号】A-77' ||
         chr(10) || '【注文明細】' || chr(10) ||
         array_to_string((string_split(text, ' '))[1:5], ',') AS raw
  FROM documents
  WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 15
)
SELECT doc_id AS id, cast(i AS int) AS page_no,
       contains(pg, 'このページは注文書ではありません。') AS is_non_order,
       trim(regexp_extract(pg, '【得意先】([^' || chr(10) || '【]*)', 1))
         AS tokusaki,
       trim(regexp_extract(pg, '【受注日】([^' || chr(10) || '【]*)', 1))
         AS juchu_date,
       trim(regexp_extract(pg, '【得意先注文番号】([^' || chr(10) ||
         '【]*)', 1)) AS chumon_bango,
       cast(len(list_filter(
         list_filter(string_split(regexp_extract(pg,
           '(?s)【注文明細】(.*)', 1), chr(10)),
           x -> length(trim(x)) > 0),
         ln -> len(string_split(ln, ',')) >= 15)) AS int) AS n_details
FROM (
  SELECT doc_id, unnest(blocks) AS pg,
         generate_subscripts(blocks, 1) AS i
  FROM (
    SELECT doc_id, list_filter(
      string_split_regex(raw, '--- PAGE [0-9]+ ---'),
      x -> length(trim(x)) > 0) AS blocks
    FROM src))
"""

QUERIES["parse_pages"] = (_q_parse_pages, _SQL_PARSE_PAGES)


# ---------------------------------------------------------------------------
# WARC ingest (Common-Crawl source format) — rows-only: the input is
# synthesized WARC segments, not one of the pre-registered tables.

def _q_warc_ingest(spark, sf):
    """Synthesize WARC segments from the documents table (one gzip
    member per record, the CC layout), ingest them back through the
    binaryFile + mapInPandas source, and extract. Covers the
    source -> pages -> extraction composition end-to-end."""
    import os
    import tempfile
    import uuid

    from westa_ocr_spark.operators.extract import extract_pages
    from westa_ocr_spark.sources.warc import read_warc_pages, write_warc

    docs = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )
    stage = os.path.join(
        tempfile.gettempdir(), f"warc_q_{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(stage, exist_ok=True)
    per_seg = 50
    for seg in range(0, len(docs), per_seg):
        recs = [
            {
                "url": f"https://warc.example/d{r['doc_id']}",
                "date": "2025-01-01T00:00:00Z",
                "html": (
                    "<html><body><p>"
                    + (r["text"] or "")
                    + "</p></body></html>"
                ).encode(),
            }
            for r in docs[seg : seg + per_seg]
        ]
        with open(os.path.join(stage, f"seg-{seg:05d}.warc.gz"),
                  "wb") as f:
            f.write(write_warc(recs))
    pages = read_warc_pages(spark, stage).filter(F.col("status") == "OK")
    return extract_pages(pages).select(
        "url", "page_index", "status", "n_blocks",
        F.length("text").alias("text_chars"),
    )


QUERIES["warc_ingest"] = (_q_warc_ingest, None)


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


QUERIES["embedding_dup_pairs"] = (
    _q_embedding_dup_pairs, _SQL_EMBEDDING_DUP_PAIRS)
QUERIES["embedding_dup_pairs_lsh"] = (_q_embedding_dup_pairs_lsh, None)


# ---------------------------------------------------------------------------
# Canonical-survivor dedup (the filter a training pipeline applies)

def _q_dedup_keep_canonical(spark, sf):
    return dedup.keep_canonical(_t(spark, sf, "documents")).select(
        "doc_id", "lang", "n_chars"
    )


_SQL_DEDUP_KEEP_CANONICAL = (
    "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id IN ("
    f"SELECT min(doc_id) FROM (SELECT doc_id, "
    f"md5({_SQL_NORM.format(c='text')}) AS fp FROM documents) "
    "GROUP BY fp)"
)

QUERIES["dedup_keep_canonical"] = (
    _q_dedup_keep_canonical, _SQL_DEDUP_KEEP_CANONICAL)


# ---------------------------------------------------------------------------
# TPC-H q10: returned-item revenue per customer, top 20 (join-heavy
# agg + total-order limit; broadcast nation dim)

def _q_tpch_q10(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        round_det(
            F.sum(price * (F.lit(1).cast("decimal(5,3)") - disc)).cast(
                "double"
            ),
            2,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_returned"),
    )
    return agg.orderBy(F.desc("revenue"), "c_custkey").limit(20)


_SQL_TPCH_Q10 = (
    "SELECT c_custkey, c_name, n_name, "
    + _sql_round_det(
        "cast(sum(cast(l_extendedprice AS decimal(18,4)) * "
        "(cast(1 AS decimal(5,3)) - cast(l_discount AS decimal(5,3)))) "
        "AS double)", 2)
    + " AS revenue, count(*) AS n_returned "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20"
)

QUERIES["tpch_q10"] = (_q_tpch_q10, _SQL_TPCH_Q10)


# ---------------------------------------------------------------------------
# Gopher-style quality gate + repetition metrics (crawl filtering)

def _q_gopher_quality(spark, sf):
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return textfns.with_quality_flags(docs, "text").drop("text")


_SQL_GOPHER_WORDS = (
    "list_filter(string_split(" + _SQL_NORM.format(c="text")
    + ", ' '), w -> length(w) > 0)"
)

_SQL_GOPHER_QUALITY = (
    "WITH w AS (SELECT doc_id, text, " + _SQL_GOPHER_WORDS + " AS words "
    "FROM documents), "
    "base AS (SELECT doc_id, text, words, len(words) AS n, "
    "CASE WHEN len(words) >= 2 THEN list_transform("
    "range(1, greatest(len(words) - 1, 1) + 1), "
    "i -> array_to_string(words[i:i+1], ' ')) "
    "ELSE [] END AS bg FROM w), "
    "m AS (SELECT doc_id, text, n, bg, "
    "CASE WHEN n > 0 THEN "
    + _sql_round_det(
        "cast(length(array_to_string(words, '')) AS double) / n", 6)
    + " ELSE 0.0 END AS mean_word_len, "
    "CASE WHEN n > 0 THEN "
    + _sql_round_det(
        "cast(n - len(list_distinct(words)) AS double) / n", 6)
    + " ELSE 0.0 END AS dup_word_frac, "
    "CASE WHEN length(text) > 0 THEN "
    + _sql_round_det(
        "cast(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) "
        "AS double) / length(text)", 6)
    + " ELSE 0.0 END AS symbol_ratio, "
    "cast(" + " + ".join(
        _sql_occ("text", w) for w in textfns._LANG_STOPWORDS["en"])
    + " AS bigint) AS stop_hits FROM base) "
    "SELECT doc_id, cast(n AS bigint) AS n_words, mean_word_len, "
    "symbol_ratio, stop_hits, "
    "(n >= 50 AND n <= 100000 AND mean_word_len >= 3.0 AND "
    "mean_word_len <= 10.0 AND symbol_ratio <= 0.1 AND stop_hits >= 2) "
    "AS gopher_pass, dup_word_frac, "
    "CASE WHEN len(bg) > 0 THEN "
    + _sql_round_det(
        "cast(list_max(list_transform(list_distinct(bg), "
        "x -> len(list_filter(bg, y -> y = x)))) AS double) / len(bg)", 6)
    + " ELSE 0.0 END AS top_bigram_frac FROM m"
)

QUERIES["gopher_quality"] = (_q_gopher_quality, _SQL_GOPHER_QUALITY)


# ---------------------------------------------------------------------------
# URL canonicalization + crawl dedup by normalized URL

def _q_url_normalize(spark, sf):
    """Three deterministic variants per doc (case noise, default
    port, tracking params, trailing slash, fragment) must collapse to
    ONE normalized url each -> every group has n_variants = 3."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    host = F.concat(F.lit("site"), (F.col("doc_id") % 50).cast("string"),
                    F.lit(".example"))
    path = F.concat(F.lit("/p/"), F.col("doc_id").cast("string"))
    variants = F.array(
        F.concat(F.lit("https://"), host, path, F.lit("?id=1")),
        F.concat(F.lit("HTTPS://"), F.upper(host), F.lit(":443"),
                 path, F.lit("?id=1&utm_source=feed")),
        F.concat(F.lit("https://"), host, path, F.lit("?id=1#section")),
    )
    exploded = docs.select(
        F.explode(variants).alias("url")
    ).select(textfns.normalize_url(F.col("url")).alias("url_norm"))
    return exploded.groupBy("url_norm").agg(
        F.count(F.lit(1)).alias("n_variants")
    )


_SQL_URL_NORMALIZE = """
WITH raw AS (
  SELECT unnest([
    'https://' || host || path || '?id=1',
    'HTTPS://' || upper(host) || ':443' || path || '?id=1&utm_source=feed',
    'https://' || host || path || '?id=1#section'
  ]) AS url
  FROM (SELECT 'site' || cast(doc_id % 50 AS varchar) || '.example' AS host,
               '/p/' || cast(doc_id AS varchar) AS path
        FROM documents WHERE doc_id < 300)
), norm AS (
  SELECT regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lower(regexp_extract(regexp_replace(url, '#.*$', ''),
              '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) ||
            regexp_replace(regexp_replace(url, '#.*$', ''),
              '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
            ':(80|443)(/|\\?|$)', '\\2'),
          '(utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
        '[?&]+$', ''),
      '\\?&', '?'),
    '(.)/$', '\\1') AS url_norm
  FROM raw
)
SELECT url_norm, count(*) AS n_variants FROM norm GROUP BY 1
"""

QUERIES["url_normalize"] = (_q_url_normalize, _SQL_URL_NORMALIZE)


# ---------------------------------------------------------------------------
# C4-style cross-corpus line dedup (boilerplate lines by document freq)

def _q_line_dedup(spark, sf):
    """Synthesized multi-line docs: a corpus-wide cookie banner
    (df=500) and a per-group banner (df~71) must vanish; the
    doc-unique intro/tail lines must survive in order."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    words = F.split("text", " ")
    raw = F.concat_ws(
        "\n",
        F.concat(F.lit("intro "), F.col("doc_id").cast("string"),
                 F.lit(" "), F.concat_ws(" ", F.slice(words, 1, 5))),
        F.lit("cookie notice accept all cookies"),
        F.concat(F.lit("group banner "),
                 (F.col("doc_id") % 7).cast("string")),
        F.concat(F.lit("unique tail "), F.col("doc_id").cast("string")),
    )
    return dedup.line_corpus_dedup(
        docs.select("doc_id", raw.alias("text")), max_line_df=10
    )


_SQL_LINE_DEDUP = """
WITH src AS (
  SELECT doc_id,
    'intro ' || cast(doc_id AS varchar) || ' ' ||
      array_to_string((string_split(text, ' '))[1:5], ' ') || chr(10) ||
    'cookie notice accept all cookies' || chr(10) ||
    'group banner ' || cast(doc_id % 7 AS varchar) || chr(10) ||
    'unique tail ' || cast(doc_id AS varchar) AS raw
  FROM documents WHERE doc_id < 500
), lines AS (
  SELECT doc_id, cast(i AS int) - 1 AS pos, ln FROM (
    SELECT doc_id, unnest(ls) AS ln, generate_subscripts(ls, 1) AS i
    FROM (SELECT doc_id, string_split(raw, chr(10)) AS ls FROM src))
), hot AS (
  SELECT ln FROM (
    SELECT DISTINCT ln, doc_id FROM lines WHERE length(trim(ln)) > 0)
  GROUP BY ln HAVING count(*) > 10
)
SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text
FROM lines WHERE ln NOT IN (SELECT ln FROM hot)
GROUP BY doc_id
"""

QUERIES["line_dedup"] = (_q_line_dedup, _SQL_LINE_DEDUP)


# ---------------------------------------------------------------------------
# PII redaction (emails / IPv4 / phone-like runs -> typed placeholders)

def _q_pii_redaction(spark, sf):
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    seeded = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@mail.example.org or "),
        F.lit("+1 415 555 01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" at 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return docs.select(
        "doc_id", textfns.redact_pii(seeded).alias("redacted")
    )


def _sql_redact(expr: str) -> str:
    out = expr
    for pat, tag in textfns.PII_PATTERNS:
        # RE2 needs the non-capturing group syntax DuckDB also accepts;
        # patterns are shared verbatim, only the escaping context differs
        sql_pat = pat.replace("'", "''").replace("\\", "\\")
        out = f"regexp_replace({out}, '{sql_pat}', '{tag}', 'g')"
    return out


_SQL_PII_REDACTION = (
    "SELECT doc_id, " + _sql_redact(
        "text || ' contact user' || cast(doc_id AS varchar) || "
        "'@mail.example.org or ' || '+1 415 555 01' || "
        "lpad(cast(doc_id % 100 AS varchar), 2, '0') || ' at 10.0.' || "
        "cast(doc_id % 256 AS varchar) || '.7'")
    + " AS redacted FROM documents WHERE doc_id < 300"
)

QUERIES["pii_redaction"] = (_q_pii_redaction, _SQL_PII_REDACTION)


# ---------------------------------------------------------------------------
# Decontamination: benchmark n-gram overlap via rolling fingerprints

_PROBE_TEXT = (
    "the secret benchmark question about unicode tokens appears "
    "here exactly once verbatim"
)


def _sql_rolling_fps(expr: str, k: int = 8) -> str:
    words = f"string_split({_SQL_NORM.format(c=expr)}, ' ')"
    return (
        f"list_transform(range(1, greatest(len({words}) - {k - 1}, 1) + 1),"
        f" i -> md5(array_to_string(({words})[i:i+{k - 1}], ' ')))"
    )


def _q_decontamination(spark, sf):
    """Docs seeded with a benchmark sentence (doc_id%10==3) must be
    flagged by rolling-8-gram fingerprint overlap with the probe set;
    clean docs must not. The probe fp set is tiny and travels as a
    literal array (broadcast by closure)."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    contaminated = F.when(
        F.col("doc_id") % 10 == 3,
        F.concat(F.col("text"), F.lit(" " + _PROBE_TEXT)),
    ).otherwise(F.col("text"))
    staged = textfns.with_rolling_fps(
        docs.select("doc_id", contaminated.alias("t")), "t"
    )
    probe_fps = (
        textfns.with_rolling_fps(
            spark.range(1).select(F.lit(_PROBE_TEXT).alias("t")), "t"
        )
        .collect()[0]["fps"]
    )  # ~6 fps — bounded driver-side by construction
    hits = F.size(
        F.array_intersect(
            F.col("fps"), F.array(*[F.lit(x) for x in probe_fps])
        )
    )
    return (
        staged.select("doc_id", hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


_SQL_DECONTAMINATION = (
    "WITH probe AS (SELECT "
    + _sql_rolling_fps(f"'{_PROBE_TEXT}'")
    + " AS pfps), "
    "docs AS (SELECT doc_id, CASE WHEN doc_id % 10 = 3 THEN "
    f"text || ' {_PROBE_TEXT}' ELSE text END AS t "
    "FROM documents WHERE doc_id < 400), "
    "scored AS (SELECT doc_id, cast(len(list_intersect("
    + _sql_rolling_fps("t")
    + ", pfps)) AS int) AS n_hits FROM docs, probe) "
    "SELECT doc_id, n_hits FROM scored WHERE n_hits > 0"
)


QUERIES["decontamination"] = (_q_decontamination, _SQL_DECONTAMINATION)


# ---------------------------------------------------------------------------
# Crawl frontier analytics: per-domain stats with a blocklist filter

def _q_domain_stats(spark, sf):
    """Host extraction (www-stripped) + blocklist anti-filter + path
    depth stats per domain — the crawl-frontier rollup."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".example/"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("a/b/")).otherwise(F.lit("")),
        F.lit("p"), F.col("doc_id").cast("string"),
    )
    blocklist = ["site13.example", "site7.example"]
    staged = docs.select(url.alias("url"), "n_chars")
    host = F.regexp_replace(
        F.regexp_extract("url", r"^[a-z]+://([^/:?#]+)", 1),
        r"^www\.", "",
    )
    path = F.regexp_replace("url", r"^[a-z]+://[^/]*", "")
    depth = F.size(F.split(path, "/")) - 2  # leading '' and the leaf
    withd = staged.select(
        host.alias("domain"), depth.alias("depth"), "n_chars"
    ).filter(~F.col("domain").isin(blocklist))
    return withd.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.max("depth").alias("max_depth"),
        F.sum("n_chars").alias("total_chars"),
    )


_SQL_DOMAIN_STATS = """
WITH src AS (
  SELECT 'https://' ||
         CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END ||
         'site' || cast(doc_id % 20 AS varchar) || '.example/' ||
         CASE WHEN doc_id % 3 = 0 THEN 'a/b/' ELSE '' END ||
         'p' || cast(doc_id AS varchar) AS url, n_chars
  FROM documents WHERE doc_id < 500
), d AS (
  SELECT regexp_replace(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1),
                        '^www\\.', '') AS domain,
         len(string_split(regexp_replace(url, '^[a-z]+://[^/]*', ''),
             '/')) - 2 AS depth,
         n_chars
  FROM src
)
SELECT domain, count(*) AS n_pages, max(depth) AS max_depth,
       sum(n_chars) AS total_chars
FROM d WHERE domain NOT IN ('site13.example', 'site7.example')
GROUP BY domain
"""

QUERIES["domain_stats"] = (_q_domain_stats, _SQL_DOMAIN_STATS)


# ---------------------------------------------------------------------------
# Streaming session windows (stateful gap-merge) vs gap-island SQL

def _q_stream_session_windows(spark, sf):
    from westa_ocr_spark.streaming.stream_pipeline import (
        session_windows_complete,
    )

    return session_windows_complete(
        spark,
        _t(spark, sf, "events").filter(F.col("user_id") < 200)
        .select("ts", "user_id"),
    )


_SQL_STREAM_SESSION_WINDOWS = (
    "WITH flagged AS (SELECT user_id, ts, CASE WHEN "
    "epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
    "> 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "THEN 1 ELSE 0 END AS new_session "
    "FROM events WHERE user_id < 200), "
    "islands AS (SELECT user_id, ts, sum(new_session) OVER ("
    "PARTITION BY user_id ORDER BY ts "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess "
    "FROM flagged) "
    "SELECT user_id, cast(floor(epoch(min(ts))) AS bigint) "
    "AS session_start, count(*) AS n_events "
    "FROM islands GROUP BY user_id, sess"
)

QUERIES["stream_session_windows"] = (
    _q_stream_session_windows, _SQL_STREAM_SESSION_WINDOWS)


# ---------------------------------------------------------------------------
# TPC-H q14: promo revenue share per ship month (broadcast part dim,
# conditional aggregation with decimal discipline)

def _q_tpch_q14(spark, sf):
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    rev = price * (F.lit(1).cast("decimal(5,3)") - disc)
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    month = F.date_format(F.col("l_shipdate").cast("timestamp"),
                          "yyyy-MM")
    agg = joined.groupBy(month.alias("ship_month")).agg(
        round_det(
            (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                * 100.0
                / F.sum(rev).cast("double")
            ),
            4,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg


_SQL_TPCH_Q14 = (
    "SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, "
    + _sql_round_det(
        "cast(sum(CASE WHEN p_type = 'PROMO' THEN "
        "cast(l_extendedprice AS decimal(18,4)) * "
        "(cast(1 AS decimal(5,3)) - cast(l_discount AS decimal(5,3))) "
        "ELSE cast(0 AS decimal(18,4)) END) AS double) * 100.0 / "
        "cast(sum(cast(l_extendedprice AS decimal(18,4)) * "
        "(cast(1 AS decimal(5,3)) - cast(l_discount AS decimal(5,3)))) "
        "AS double)", 4)
    + " AS promo_share_pct, count(*) AS n_items "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "GROUP BY 1"
)

QUERIES["tpch_q14"] = (_q_tpch_q14, _SQL_TPCH_Q14)


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

QUERIES["hypertable_rollup"] = (
    _q_hypertable_rollup, _SQL_HYPERTABLE_ROLLUP)


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

QUERIES["cms_estimates"] = (_q_cms_estimates, _SQL_CMS_ESTIMATES)


# ---------------------------------------------------------------------------
# TPC-H q6: forecast revenue change — the classic predicate-pushdown
# scan (every filter reaches the parquet reader; asserted in
# tests/test_plans.py)

def _q_tpch_q6(spark, sf):
    li = _t(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    filtered = li.filter(
        (F.col("l_shipdate") >= "2024-01-01")
        & (F.col("l_shipdate") < "2025-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        round_det(F.sum(price * disc).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_SQL_TPCH_Q6 = (
    "SELECT "
    + _sql_round_det(
        "cast(sum(cast(l_extendedprice AS decimal(18,4)) * "
        "cast(l_discount AS decimal(5,3))) AS double)", 2)
    + " AS revenue, count(*) AS n_items FROM lineitem "
    "WHERE l_shipdate >= '2024-01-01' AND l_shipdate < '2025-01-01' "
    "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
)

QUERIES["tpch_q6"] = (_q_tpch_q6, _SQL_TPCH_Q6)
