"""Scalar-function operator family — the reference's own transforms
(SURVEY.md A19–A35) exercised as oracle-checked queries over the driver
tables. URLs/keys are CONSTRUCTED deterministically from documents columns
(the testdata has no URL column), then normalized with the engine's
functions — both engines build and transform the identical strings.

Determinism notes: only IEEE-exact math (sqrt is correctly-rounded per
IEEE 754; abs/floor/ceil/round/mod exact) appears in oracle-checked
queries — no ln/pow, whose libm implementations may differ by an ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.urls import host_of, strip_www, url_bone, url_prefix
from ..registry import register

# --- URL normalization (A21, A25, A27) ---------------------------------------

_URL_BONE_ORACLE = """
WITH urls AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'https://www.' WHEN doc_id % 4 = 1 THEN 'https://'
              WHEN doc_id % 4 = 2 THEN 'HTTP://WWW.' ELSE 'http://' END
         || source || '.example.com/' || lang || '/' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_replace(regexp_replace(url, '^https?://(www\\.)?', '', 'i'), '/$', '') AS bone,
       regexp_extract(url, '(https?://(?:www\\.)?)', 1) AS prefix,
       regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1), '^www\\.', '') AS host_no_www
FROM urls
"""


@register("func_url_normalize", oracle=_URL_BONE_ORACLE, tags=("scalar",))
def func_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """url_bone + url_prefix + www-strip, the reference's core string rules.
    The mixed-case arms exercise the case-insensitive prefix match
    (/root/reference/rankings_generator.py:135 lowercases before compare)."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.lit("https://www."))
        .when(F.col("doc_id") % 4 == 1, F.lit("https://"))
        .when(F.col("doc_id") % 4 == 2, F.lit("HTTP://WWW."))
        .otherwise(F.lit("http://")),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    d = d.withColumn("url", url)
    return d.select(
        "doc_id",
        "url",
        url_bone(F.col("url")).alias("bone"),
        url_prefix(F.col("url")).alias("prefix"),
        strip_www(host_of(F.col("url"))).alias("host_no_www"),
    )


# --- key parse + epoch→date (A28, A29) -----------------------------------------

_SPLIT_KEY_ORACLE = """
WITH keys AS (
  SELECT doc_id,
         lang || '_' || source || '_' || CAST(1700000000 + doc_id * 3600 AS VARCHAR) AS s3_key
  FROM documents
)
SELECT doc_id, s3_key,
       split_part(s3_key, '_', 1) AS term,
       (string_split(s3_key, '_'))[-1] AS epoch_str,
       DATE '1970-01-01'
         + CAST(CAST((string_split(s3_key, '_'))[-1] AS BIGINT) // 86400 AS INT) AS key_date
FROM keys
"""


@register("func_split_key_epoch", oracle=_SPLIT_KEY_ORACLE, tags=("scalar",))
def func_split_key_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's S3-key parse (`s3_key.split('_')[0]`, `[-1]`,
    /root/reference/ranking_urls_generator.py:217-218) + epoch→date
    (:140) — date derived by integer day arithmetic, timezone-free."""
    d = load(spark, sf_dir, "documents")
    key = F.concat_ws(
        "_",
        F.col("lang"),
        F.col("source"),
        (F.lit(1700000000) + F.col("doc_id") * 3600).cast("string"),
    )
    d = d.withColumn("s3_key", key)
    parts = F.split(F.col("s3_key"), "_")
    epoch_str = F.element_at(parts, -1)
    return d.select(
        "doc_id",
        "s3_key",
        F.element_at(parts, 1).alias("term"),
        epoch_str.alias("epoch_str"),
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            (epoch_str.cast("long") / F.lit(86400)).cast("int"),
        ).alias("key_date"),
    )


# --- conditional (if / multiIf) --------------------------------------------------

_COND_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS size_class,
       CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open
FROM orders
"""


@register("func_conditional", oracle=_COND_ORACLE, tags=("scalar",))
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiIf/if (ClickHouse conditional family) ≡ when/otherwise chains."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_open"),
    )


# --- JSON extraction --------------------------------------------------------------

# Both sides apply the SAME integer guard (engines disagree on non-integer
# strings: DuckDB CAST('3.5' AS BIGINT) rounds, Spark cast → NULL), and the
# SUM is CAST to BIGINT because DuckDB SUM(BIGINT) yields HUGEINT (int128) —
# a dtype-sensitive hash flips on that even when values match (round-1 red).
_JSON_ORACLE = """
WITH kk AS (
  SELECT event_type,
         CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM kk
GROUP BY event_type
ORDER BY event_type
"""


@register("func_json_extract", oracle=_JSON_ORACLE, tags=("scalar", "events"))
def func_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props payload column —
    get_json_object stays JVM-side (no Python UDF)."""
    e = load(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    k = F.when(k_str.rlike("^-?[0-9]+$"), k_str.cast("long"))
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --- array ops (A23 adjacents, A32–A34) --------------------------------------------

_ARRAY_ORACLE = """
WITH words AS (
  SELECT doc_id,
         string_split(trim(text), ' ') AS ws
  FROM documents
)
SELECT doc_id,
       len(ws) AS n_words,
       CASE WHEN list_contains(ws, 'spark') THEN 1 ELSE 0 END AS has_spark,
       array_to_string(list_sort(list_distinct(ws))[1:3], '|') AS first3_sorted
FROM words
"""


@register("func_array_ops", oracle=_ARRAY_ORACLE, tags=("scalar", "array"))
def func_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/contains/distinct/sort/slice/join —
    ClickHouse arrayJoin/arrayFilter analogs as native Spark exprs."""
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.when(F.array_contains(ws, "spark"), 1).otherwise(0).alias("has_spark"),
        F.concat_ws("|", F.slice(F.array_sort(F.array_distinct(ws)), 1, 3)).alias(
            "first3_sorted"
        ),
    )


_EXPLODE_ORACLE = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents) t
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 25
"""


@register("func_explode_wordcount", oracle=_EXPLODE_ORACLE, tags=("scalar", "array"))
def func_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrayJoin/explode → the canonical word count, top-25 deterministic."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(25)
    )


# --- string family ------------------------------------------------------------------

_STRING_ORACLE = """
SELECT c_custkey,
       lower(c_name) AS lname,
       upper(c_mktsegment) AS useg,
       substr(c_name, 1, 8) AS name8,
       length(c_name) AS name_len,
       CASE WHEN c_name LIKE '%0042%' THEN 1 ELSE 0 END AS has_0042,
       concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
       replace(c_name, 'Customer', 'Cust') AS short_name
FROM customer
"""


@register("func_string_family", oracle=_STRING_ORACLE, tags=("scalar",))
def func_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.length("c_name").cast("long").alias("name_len"),
        F.when(F.col("c_name").like("%0042%"), 1).otherwise(0).alias("has_0042"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("short_name"),
    )


# --- date family ---------------------------------------------------------------------

_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS od,
       date_trunc('month', CAST(o_orderdate AS DATE)) AS order_month,
       date_part('year', CAST(o_orderdate AS DATE)) AS order_year,
       date_part('dow', CAST(o_orderdate AS DATE)) AS order_dow,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
FROM orders
"""


@register("func_date_family", oracle=_DATE_ORACLE, tags=("scalar",))
def func_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toDate/toStartOfMonth/dateDiff analogs, all on DATE (timezone-free).
    DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1 → subtract 1."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        od.alias("od"),
        F.trunc(od, "month").alias("order_month"),
        F.year(od).cast("long").alias("order_year"),
        (F.dayofweek(od) - 1).cast("long").alias("order_dow"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_95"
        ),
    )


# --- math family (IEEE-exact only) ----------------------------------------------------

_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * 10, 0) / 10.0 AS price_r1,
       floor(l_discount * 100) AS disc_pct_floor,
       ceil(l_tax * 100) AS tax_pct_ceil,
       abs(l_quantity - 25) AS qty_dev,
       sqrt(l_quantity) AS qty_sqrt,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
"""


@register("func_math_family", oracle=_MATH_ORACLE, tags=("scalar",))
def func_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/sqrt/mod — sqrt is IEEE correctly-rounded so
    bit-identical across engines; ln/pow deliberately excluded (libm ulp
    drift) and exercised rows-only in tests."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round(x,1) differs per engine (decimal-string vs raw-double
        # rounding); scaled round-to-integer is engine-identical.
        (F.round(F.col("l_extendedprice") * 10) / F.lit(10.0)).alias("price_r1"),
        F.floor(F.col("l_discount") * 100).cast("double").alias("disc_pct_floor"),
        F.ceil(F.col("l_tax") * 100).cast("double").alias("tax_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


_REGEXP_ORACLE = """
SELECT event_id, props,
       regexp_extract(props, '([0-9]+)', 1) AS k_digits,
       regexp_replace(props, '[0-9]', '#', 'g') AS masked,
       regexp_matches(props, '^\\{"k": [0-9]+\\}$') AS is_kv_shape,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_digit_runs
FROM events
"""


@register("func_regexp_family", oracle=_REGEXP_ORACLE, tags=("scalar", "events"))
def func_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / global regexp_replace / rlike / regexp_count over
    the events props payload — the pattern-matching scalar surface
    (ClickHouse extract/replaceRegexpAll/match/countMatches parity).
    Patterns stay in the RE2∩Java-regex common subset so both engines
    compile them identically; all four are JVM-side whole-stage-codegen
    expressions (no UDF)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "props",
        F.regexp_extract("props", r"([0-9]+)", 1).alias("k_digits"),
        F.regexp_replace("props", r"[0-9]", "#").alias("masked"),
        F.col("props").rlike(r'^\{"k": [0-9]+\}$').alias("is_kv_shape"),
        F.regexp_count("props", F.lit(r"[0-9]+")).alias("n_digit_runs"),
    )


_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS key_and,
       o_orderkey | 4096 AS key_or,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2 AS key_shl,
       o_orderkey >> 1 AS key_shr,
       bit_count(o_orderkey) AS key_bits
FROM orders
"""


@register("func_bitwise_family", oracle=_BITWISE_ORACLE, tags=("scalar",))
def func_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shifts/popcount (ClickHouse bitAnd/bitOr/
    bitXor/bitShiftLeft/bitCount parity) — pure codegen expressions;
    the partition-hash and bitmap-index primitives."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderkey").bitwiseAND(F.lit(255))).alias("key_and"),
        (F.col("o_orderkey").bitwiseOR(F.lit(4096))).alias("key_or"),
        (F.col("o_orderkey").bitwiseXOR(F.col("o_custkey"))).alias("key_xor"),
        F.shiftleft(F.col("o_orderkey"), 2).alias("key_shl"),
        F.shiftright(F.col("o_orderkey"), 1).alias("key_shr"),
        F.bit_count(F.col("o_orderkey")).alias("key_bits"),
    )


_DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       date_part('quarter', CAST(o_orderdate AS DATE)) AS q,
       CAST(o_orderdate AS DATE) + 30 AS plus_30d
FROM orders
"""


@register("func_date_arith", oracle=_DATE_ARITH_ORACLE, tags=("scalar",))
def func_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family — addMonths/toLastDayOfMonth/toQuarter
    analogs. add_months clamps to month end in both engines (Jan 31 + 1
    month = Feb 28); everything stays on DATE so no timezone is
    consulted."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(od, 3).alias("plus_3m"),
        F.last_day(od).alias("month_end"),
        F.quarter(od).cast("long").alias("q"),
        F.date_add(od, 30).alias("plus_30d"),
    )
