"""Text-analysis operators over the `documents` table — the training-data
pipeline surface (BASELINE.json north_star: "text analysis"). Everything is
a pure column-expression pipeline (functions/text.py) with an exact DuckDB
mirror, so the whole family is hash-verified, not just smoke-tested.

Scale notes: all of these are embarrassingly parallel scans (no shuffle
except the final small group-by) — the 100 TB plan is scan → map → partial
agg, the cheapest shape Spark has.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..functions.text import (
    BPE_RE,
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_signals,
    token_count_bpe,
    token_count_ws,
)
from ..registry import register

_WS = "string_split(trim(text), ' ')"


def _sql_hits(markers: tuple[str, ...]) -> str:
    ors = " OR ".join(f"w = '{m}'" for m in markers)
    return f"len(list_filter({_WS}, w -> {ors}))"


# --- corpus stats by language ---------------------------------------------------

_STATS_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len({_WS})) AS BIGINT) AS total_tokens,
       CAST(SUM(len({_WS})) AS DOUBLE) / COUNT(*) AS avg_tokens,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("text_stats_by_lang", oracle=_STATS_ORACLE, tags=("text",))
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tok = token_count_ws(F.col("text"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(n_tok.cast("long")).alias("total_tokens"),
            (F.sum(n_tok.cast("long")).cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


# --- per-document quality signals -------------------------------------------------

_QUALITY_ORACLE = f"""
SELECT doc_id,
       len({_WS}) AS n_tokens,
       length(text) AS n_chars_m,
       CAST(length(text) - len({_WS}) + 1 AS DOUBLE) / len({_WS}) AS avg_word_len,
       CAST(len(list_distinct({_WS})) AS DOUBLE) / len({_WS}) AS uniq_token_ratio,
       CAST({_sql_hits(LANG_MARKERS['en'])} AS DOUBLE) / len({_WS}) AS stop_ratio_en
FROM documents
"""


@register("text_quality_signals", oracle=_QUALITY_ORACLE, tags=("text",))
def text_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality components (length, word stats, stopword density) —
    the filter-side of a data-quality pipeline. Ratios are single exact-int
    divisions (deterministic doubles)."""
    d = load(spark, sf_dir, "documents")
    sig = quality_signals(F.col("text"))
    return d.select(
        "doc_id",
        sig["n_tokens"].cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_m"),
        sig["avg_word_len"].alias("avg_word_len"),
        sig["uniq_token_ratio"].alias("uniq_token_ratio"),
        sig["stop_ratio_en"].alias("stop_ratio_en"),
    )


# --- language identification --------------------------------------------------------

_LANGID_CASES = []
for _lang in sorted(LANG_MARKERS, reverse=True):
    _LANGID_CASES.append((_lang, _sql_hits(LANG_MARKERS[_lang])))

_SCORE_COLS = ", ".join(f"{sql} AS s_{lang}" for lang, sql in _LANGID_CASES)
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang, _ in _LANGID_CASES) + ")"
_CHAIN = "'und'"
for _lang, _ in _LANGID_CASES:  # reverse-alpha → alpha-first tie-break
    _CHAIN = f"CASE WHEN s_{_lang} = best AND best > 0 THEN '{_lang}' ELSE {_CHAIN} END"

_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, {_SCORE_COLS} FROM documents
), best AS (
  SELECT *, {_BEST} AS best FROM scored
)
SELECT doc_id, lang AS labeled_lang, {_CHAIN} AS predicted_lang
FROM best
"""


@register("text_lang_id", oracle=_LANGID_ORACLE, tags=("text",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (n-gram-lite). Deterministic
    alphabetical tie-break; 'und' when no marker fires."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )


# --- BPE-ish token counting ----------------------------------------------------------

_BPE_ORACLE = f"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(len({_WS})) AS BIGINT) AS total_ws_tokens
FROM documents
GROUP BY source
ORDER BY source
"""


@register("text_token_count_bpe", oracle=_BPE_ORACLE, tags=("text",))
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretokenizer-style counting (letter runs | digit runs | symbols) —
    the token-budget estimator of a training pipeline."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.sum(token_count_bpe(F.col("text")).cast("long")).alias(
                "total_bpe_tokens"
            ),
            F.sum(token_count_ws(F.col("text")).cast("long")).alias(
                "total_ws_tokens"
            ),
        )
        .orderBy("source")
    )


# --- fingerprinting --------------------------------------------------------------------

_FP_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(lower(trim(text)))) AS n_distinct_fp
FROM documents
GROUP BY source
ORDER BY source
"""


@register("text_fingerprint", oracle=_FP_ORACLE, tags=("text",))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + distinct-count per
    source — the bookkeeping side of exact dedup."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(fingerprint(F.col("text"))).alias("n_distinct_fp"),
        )
        .orderBy("source")
    )


_QFILTER_ORACLE = f"""
SELECT doc_id, lang,
       len({_WS}) AS n_tokens,
       len(list_distinct({_WS})) AS n_uniq
FROM documents
WHERE len({_WS}) >= 30
  AND len(list_distinct({_WS})) * 10 >= len({_WS}) * 3
  AND {_sql_hits(LANG_MARKERS['en'])} * 2 <= len({_WS})
"""


@register("text_quality_filter", oracle=_QFILTER_ORACLE, tags=("text",))
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data FILTER step: keep documents passing length,
    vocabulary-diversity (uniq/n ≥ 0.3), and stopword-density (hits/n ≤
    0.5) thresholds — the decision surface quality_signals feeds.

    The thresholds are evaluated as INTEGER cross-products (uniq·10 ≥
    n·3, hits·2 ≤ n): round-4 drove a count off by one on a document
    sitting exactly at the 0.3 boundary, where engines may promote the
    `ratio >= 0.3` literal differently (DuckDB parses 0.3 as DECIMAL(2,1),
    Spark as double) — integer comparisons cannot drift. Pure
    scan→map→filter (no shuffle): the cheapest possible 100 TB shape."""
    d = load(spark, sf_dir, "documents")
    sig = quality_signals(F.col("text"))
    return (
        d.select(
            "doc_id",
            "lang",
            sig["n_tokens"].cast("long").alias("n_tokens"),
            sig["n_uniq"].cast("long").alias("n_uniq"),
            sig["stop_hits_en"].cast("long").alias("_stop_hits"),
        )
        .filter(
            (F.col("n_tokens") >= 30)
            & (F.col("n_uniq") * 10 >= F.col("n_tokens") * 3)
            & (F.col("_stop_hits") * 2 <= F.col("n_tokens"))
        )
        .drop("_stop_hits")
    )


# --- sequence packing (training-batch binning) ----------------------------------

_PACK_BUDGET = 4096  # tokens per training bin
_PACK_BUCKET = 100  # doc_ids per cumsum partition

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, CAST(len({_WS}) AS BIGINT) AS n_tokens FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tokens_before
  FROM toks
)
SELECT doc_id, n_tokens, tokens_before,
       CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM cum
"""


@register("text_pack_sequences", oracle=_PACK_ORACLE, tags=("text",))
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING: assign documents (in doc_id order) to fixed
    token-budget training bins — the batch-construction step of an LLM
    data pipeline.

    The global running token count is computed PARTITION-SAFELY (the
    oracle's single global window would run in one task at 100 TB): local
    cumsums within doc_id buckets in parallel, then a tiny one-row-per-
    bucket offset table (cumsum over #buckets rows) broadcast back — the
    same two-level shape as the gap-fill carry join."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        (F.col("doc_id") / _PACK_BUCKET).cast("long").alias("bucket"),
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "bucket_before",
            F.coalesce(F.sum("bucket_total").over(w_buckets), F.lit(0)),
        )
        .select("bucket", "bucket_before")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("local_before") + F.col("bucket_before")).alias(
                "tokens_before"
            ),
            (
                (F.col("local_before") + F.col("bucket_before"))
                / F.lit(_PACK_BUDGET)
            )
            .cast("long")
            .alias("bin_id"),
        )
    )


# --- stratified sampling ---------------------------------------------------------

_STRAT_ORACLE = """
SELECT lang, COUNT(*) AS n_total, TRUE AS frac_in_bounds
FROM documents
GROUP BY lang
ORDER BY lang
"""

_STRAT_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.1, "zh": 0.1}


@register("sample_stratified", oracle=_STRAT_ORACLE, tags=("sample",))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy`` — the rebalancing step
    of corpus construction: downsample over-represented languages).
    Sampled row sets are RNG-internal, so the query returns the checkable
    contract: per-language totals plus the assertion that each stratum's
    sampled fraction lands within 5σ of its target."""
    d = load(spark, sf_dir, "documents")
    sampled = d.sampleBy("lang", _STRAT_FRACTIONS, seed=42)
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    got = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    frac = F.create_map(
        *[F.lit(x) for kv in _STRAT_FRACTIONS.items() for x in kv]
    )
    p = frac[F.col("lang")]
    return (
        totals.join(got, "lang", "left")
        .select(
            "lang",
            "n_total",
            (
                F.abs(
                    F.coalesce(F.col("n_sampled"), F.lit(0)) / F.col("n_total")
                    - p
                )
                <= 5 * F.sqrt(p * (1 - p) / F.col("n_total"))
            ).alias("frac_in_bounds"),
        )
        .orderBy("lang")
    )


# --- end-to-end corpus curation pipeline -------------------------------------

_PIPELINE_ORACLE = f"""
WITH quality AS (
  SELECT doc_id, lang, text, len({_WS}) AS n_tokens
  FROM documents
  WHERE len({_WS}) >= 30
    AND len(list_distinct({_WS})) * 10 >= len({_WS}) * 3
    AND {{stop_hits}} * 2 <= len({_WS})
),
kept AS (
  SELECT * FROM (
    SELECT doc_id, lang, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                              ORDER BY doc_id) AS rn
    FROM quality) t
  WHERE rn = 1
),
raw AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang),
q AS (SELECT lang, COUNT(*) AS n_quality FROM quality GROUP BY lang),
-- CAST(SUM(..) AS BIGINT): DuckDB SUM(INTEGER) yields HUGEINT, which the
-- driver's fetch path coerces lossily — the r4/r5 hash-red cause.
k AS (SELECT lang, COUNT(*) AS n_kept,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
      FROM kept GROUP BY lang)
SELECT raw.lang, raw.n_raw,
       COALESCE(q.n_quality, 0) AS n_quality,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.tokens_kept, 0) AS tokens_kept
FROM raw LEFT JOIN q USING (lang) LEFT JOIN k USING (lang)
ORDER BY lang
""".replace("{stop_hits}", _sql_hits(LANG_MARKERS["en"]))


@register("pipeline_corpus_curation", oracle=_PIPELINE_ORACLE, tags=("text", "llm"))
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline END TO END in one DAG: quality filter
    (length / vocabulary-diversity / stopword-density — same thresholds as
    ``text_quality_filter``) → exact dedup (md5 fingerprint of normalized
    text, keep lowest doc_id — same rule as ``dedup_exact``) → per-language
    yield report (docs surviving each stage + token budget).

    One Catalyst plan: the filter is a scan-map-filter with no shuffle, the
    dedup shuffles 16-byte fingerprints once, the three per-lang aggregates
    reduce to a handful of rows joined at the end. The shape a real 100 TB
    curation run has — and the proof a user can chain this engine's stages
    without materializing intermediates."""
    d = load(spark, sf_dir, "documents")
    sig = quality_signals(F.col("text"))
    quality = d.select(
        "doc_id",
        "lang",
        "text",
        sig["n_tokens"].cast("long").alias("n_tokens"),
        sig["n_uniq"].cast("long").alias("_uniq"),
        sig["stop_hits_en"].cast("long").alias("_stop"),
    ).filter(
        (F.col("n_tokens") >= 30)
        # integer cross-products, not `ratio >= 0.3` — a doc sitting
        # exactly at the boundary flipped a count in round 4 (engines
        # promote the decimal literal differently)
        & (F.col("_uniq") * 10 >= F.col("n_tokens") * 3)
        & (F.col("_stop") * 2 <= F.col("n_tokens"))
    )
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    kept = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    raw = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_raw"))
    q = quality.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    k = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        raw.join(q, "lang", "left")
        .join(k, "lang", "left")
        .select(
            "lang",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
        .orderBy("lang")
    )


# --- benchmark decontamination (n-gram overlap vs an eval set) ---------------

_CONTAM_CAP = 100  # hub 5-grams excluded from matching (mirrored in oracle)

_CONTAM_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  -- contaminated training docs by construction: each benchmark doc
  -- re-enters the corpus lightly edited (prefix token), so its 5-grams
  -- survive — the case decontamination exists to catch
  SELECT doc_id + 2000000 AS doc_id, 'pre ' || text AS text
  FROM documents WHERE doc_id % 97 = 0
),
grams AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, len(ws) - 3),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               || ' ' || ws[i+3] || ' ' || ws[i+4])
         ) AS gs
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM corpus) t
  WHERE len(ws) >= 5
),
exploded AS (SELECT doc_id, unnest(gs) AS g FROM grams),
capped AS (SELECT g FROM exploded GROUP BY g HAVING COUNT(*) <= {_CONTAM_CAP}),
bench AS (SELECT doc_id AS bench_id, g FROM exploded WHERE doc_id % 97 = 0),
hits AS (
  SELECT e.doc_id, b.bench_id, COUNT(*) AS n_shared
  FROM exploded e
  JOIN capped USING (g)
  JOIN bench b USING (g)
  WHERE e.doc_id <> b.bench_id
  GROUP BY e.doc_id, b.bench_id
)
SELECT doc_id, bench_id, n_shared
FROM hits
WHERE n_shared >= 3
ORDER BY doc_id, bench_id
"""


@register("text_contamination_check", oracle=_CONTAM_ORACLE, tags=("text", "llm"))
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION: flag training documents sharing ≥3
    distinct 5-grams with any document in the eval set (here: doc_id
    divisible by 97 stands in for the benchmark corpus) — the overlap
    check run before any serious pretraining ingest.

    Same blocked shape as the dedup family: 5-grams by zip-slice
    (codegen, no window), equi-join on the gram — never a doc×bench
    cross join; the eval side is tiny and broadcasts. Hub grams (doc
    frequency > {_CONTAM_CAP}) are excluded symmetrically in both
    engines, bounding fan-out exactly like the Jaccard frequency cap."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    contaminated = d.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("pre "), F.col("text")).alias("text"),
    )
    corpus = d.unionAll(contaminated)
    ws = F.split(F.trim(F.col("text")), " ")
    exploded = (
        corpus.select("doc_id", ws.alias("ws"))
        # ≥5 tokens required: slice() with negative length (size - 4 < 0)
        # is a runtime error in Spark; the oracle carries the same guard
        .filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    *[
                        F.expr(f"slice(ws, {i}, size(ws) - 4)").alias(f"w{i}")
                        for i in range(1, 6)
                    ]
                )
            ).alias("t"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ", *[F.col(f"t.w{i}") for i in range(1, 6)]
            ).alias("g"),
        )
        .distinct()
    )
    capped = (
        exploded.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _CONTAM_CAP)
        .select("g")
    )
    bench = exploded.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    return (
        exploded.join(capped, "g")
        .join(F.broadcast(bench), "g")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .orderBy("doc_id", "bench_id")
    )


# --- PII detection + redaction --------------------------------------------------

# Training-corpus scrubbing pass. The synthetic documents carry no PII, so a
# deterministic contact line (derived from doc_id, identically in both
# engines) is prepended and then scrubbed — exercising the real surface:
# count + replace over email / IPv4 / phone patterns. All three regexes use
# the portable subset shared by Java regex (Spark) and RE2 (DuckDB).
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b555-\d{4}\b"

_PII_TEXT_SQL = (
    "'contact doc' || doc_id || '@example.org at 10.' || (doc_id % 250)"
    " || '.' || ((doc_id * 7) % 250) || '.9 tel 555-' "
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' re: ' || text"
)

_PII_ORACLE = f"""
WITH t AS (SELECT doc_id, {_PII_TEXT_SQL} AS pii_text FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(pii_text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(pii_text, '{_PII_IP}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(pii_text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(pii_text,
           '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_IP}', '[IP]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g') AS redacted
FROM t
ORDER BY doc_id
"""


@register("text_pii_redact", oracle=_PII_ORACLE, tags=("text", "llm"))
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: detect + redact emails, IPv4s
    and phone numbers (count columns + a fully-redacted text column). Pure
    map-side regex work inside whole-stage codegen — zero shuffles, the
    100 TB shape is scan -> map -> write."""
    d = load(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.lit("contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org at 10."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 250).cast("string"),
        F.lit(".9 tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.col("text"),
    )
    t = d.select("doc_id", pii_text.alias("pii_text"))
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("pii_text", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("pii_text", F.lit(_PII_IP), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all("pii_text", F.lit(_PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("pii_text", _PII_EMAIL, "[EMAIL]"),
                _PII_IP,
                "[IP]",
            ),
            _PII_PHONE,
            "[PHONE]",
        ).alias("redacted"),
    ).orderBy("doc_id")


# --- intra-document repetition stats (Gopher-style repetition filter) -----------

# Quality signal from the Gopher/MassiveText rules: documents dominated by a
# repeated phrase are boilerplate. Everything is an integer count over the
# token/bigram lists (array lambdas, map-side only); the repetitive flag is
# an integer cross-product (top_bigram_n * 5 >= n_bigrams), never a
# float-vs-literal compare (round-4 lesson).
_REP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_WS} AS ws, len({_WS}) AS n FROM documents
), b AS (
  SELECT doc_id, n, ws,
         CASE WHEN n >= 2
              THEN list_transform(range(1, n), i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END AS bi,
         CASE WHEN n >= 2
              THEN len(list_filter(range(2, n + 1), i -> ws[i] = ws[i - 1]))
              ELSE 0 END AS n_adj_dup
  FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(n_adj_dup AS BIGINT) AS n_adj_dup,
       CAST(len(bi) AS BIGINT) AS n_bigrams,
       CAST(len(bi) - len(list_distinct(bi)) AS BIGINT) AS n_dup_bigrams,
       CAST(COALESCE(list_max(list_transform(list_distinct(bi),
                g -> len(list_filter(bi, x -> x = g)))), 0) AS BIGINT)
         AS top_bigram_n,
       CAST(CASE WHEN COALESCE(list_max(list_transform(list_distinct(bi),
                g -> len(list_filter(bi, x -> x = g)))), 0) * 5 >= len(bi)
                 AND len(bi) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS repetitive
FROM b
ORDER BY doc_id
"""


@register("text_repetition_stats", oracle=_REP_ORACLE, tags=("text", "llm"))
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition profile (Gopher-rule family): adjacent
    duplicate tokens, duplicate bigram mass, and the dominant bigram's
    count, with an integer-ratio boilerplate flag. Array-lambda only —
    per-document work is bounded by document length, so the operator is a
    pure map at any corpus scale."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("ws"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n"),
    )
    b = t.select(
        "doc_id",
        "n",
        F.when(
            F.col("n") >= 2,
            F.expr(
                "transform(sequence(1, n - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bi"),
        F.when(
            F.col("n") >= 2,
            F.expr(
                "size(filter(sequence(2, n),"
                " i -> element_at(ws, i) = element_at(ws, i - 1)))"
            ),
        )
        .otherwise(F.lit(0))
        .alias("n_adj_dup"),
    )
    # Dominant-bigram count = longest run of equal adjacent elements in the
    # SORTED bigram array — O(n log n) per doc vs the O(n·distinct) scan of
    # counting each distinct bigram separately. The sorted array lives in
    # its own column (not the fold accumulator) so the fold state stays two
    # ints — no per-step array copy.
    b = b.withColumn("sb", F.array_sort("bi"))
    # Guard < 2, not == 0: with exactly one bigram, sequence(2, 1) is the
    # DESCENDING array [2, 1] and the fold would hit element_at(sb, 0)
    # (INVALID_INDEX_OF_ZERO) — the round-4 negative-slice failure class.
    # 0- and 1-bigram docs short-circuit to size(sb) (0 or 1), matching
    # the oracle's longest-run semantics.
    top_n = F.when(F.size("sb") < 2, F.size("sb")).otherwise(
        F.expr(
            "aggregate(sequence(2, size(sb)),"
            " named_struct('run', CAST(1 AS INT), 'best', CAST(1 AS INT)),"
            " (acc, i) -> IF(element_at(sb, i) = element_at(sb, i - 1),"
            "   named_struct('run', acc.run + 1,"
            "                'best', greatest(acc.best, acc.run + 1)),"
            "   named_struct('run', CAST(1 AS INT), 'best', acc.best)),"
            " acc -> acc.best)"
        )
    )
    return b.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("n_adj_dup").cast("long").alias("n_adj_dup"),
        F.size("bi").cast("long").alias("n_bigrams"),
        (F.size("bi") - F.size(F.array_distinct("bi"))).cast("long").alias(
            "n_dup_bigrams"
        ),
        top_n.cast("long").alias("top_bigram_n"),
        F.when((top_n * 5 >= F.size("bi")) & (F.size("bi") > 0), 1)
        .otherwise(0)
        .cast("long")
        .alias("repetitive"),
    ).orderBy("doc_id")


# --- fixed-size training-chunk splitter -----------------------------------------

# Sequence-packing's sibling: split each document into chunk_size-token
# windows advancing by stride tokens (overlap = chunk_size - stride), the
# standard LLM pretraining chunking shape. Chunk count and boundaries are
# pure integer math; explode(sequence(...)) fans rows out map-side with no
# shuffle at all.
_CHUNK, _STRIDE = 32, 24

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_WS} AS ws, len({_WS}) AS n FROM documents
), c AS (
  SELECT doc_id, ws, n,
         CASE WHEN n <= {_CHUNK} THEN 1
              ELSE 1 + (n - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE} END AS n_chunks
  FROM t
), e AS (
  SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS k FROM c
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_idx,
       CAST(k * {_STRIDE} AS BIGINT) AS start_tok,
       CAST(LEAST({_CHUNK}, n - k * {_STRIDE}) AS BIGINT) AS chunk_len,
       ws[k * {_STRIDE} + 1] AS first_tok,
       ws[k * {_STRIDE} + LEAST({_CHUNK}, n - k * {_STRIDE})] AS last_tok
FROM e
ORDER BY doc_id, chunk_idx
"""


@register("text_doc_chunking", oracle=_CHUNK_ORACLE, tags=("text", "llm"))
def text_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunk splitter (chunk=32 tokens, stride=24)
    for LLM pretraining windows. explode(sequence(0, n_chunks-1)) is a
    map-side fan-out — no shuffle, and chunk boundaries are integer-exact
    in both engines."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("ws"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n"),
    )
    c = t.withColumn(
        "n_chunks",
        F.when(F.col("n") <= _CHUNK, F.lit(1)).otherwise(
            1 + F.floor((F.col("n") - _CHUNK + _STRIDE - 1) / _STRIDE).cast("int")
        ),
    )
    e = c.select(
        "doc_id",
        "ws",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("k"),
    )
    start = F.col("k") * _STRIDE
    clen = F.least(F.lit(_CHUNK), F.col("n") - start)
    return e.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        clen.cast("long").alias("chunk_len"),
        F.element_at("ws", (start + 1).cast("int")).alias("first_tok"),
        F.element_at("ws", (start + clen).cast("int")).alias("last_tok"),
    ).orderBy("doc_id", "chunk_idx")


# --- corpus-wide top-k n-grams ---------------------------------------------------

_NGRAM_TOPK = 5

# DuckDB zips parallel unnests of equal-length lists positionally (same
# pattern as the bigram extraction in relevance.py); three aligned slices
# give the trigram stream without enumerating positions.
_NGRAM_ORACLE = f"""
WITH toks AS (
  SELECT lang, string_split(trim(text), ' ') AS l FROM documents
),
grams AS (
  SELECT lang,
         unnest(l[1:len(l) - 2]) || ' ' || unnest(l[2:len(l) - 1]) || ' ' || unnest(l[3:len(l)]) AS gram
  FROM toks WHERE len(l) >= 3
),
counted AS (
  SELECT lang, gram, COUNT(*) AS cnt FROM grams GROUP BY lang, gram
),
ranked AS (
  SELECT lang, gram, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, gram ASC) AS rn
  FROM counted
)
SELECT lang, CAST(rn AS BIGINT) AS rn, gram, cnt
FROM ranked WHERE rn <= {_NGRAM_TOPK}
ORDER BY lang, rn
"""


@register("text_ngram_topk", oracle=_NGRAM_ORACLE, tags=("text",))
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-5 trigrams per language — the n-gram census behind
    boilerplate detection and contamination blocklists in training-data
    pipelines.

    Trigram stream via slice+arrays_zip (one array op per document, no
    position explode); count is a single hash aggregation with map-side
    combine, and per-language ranking is a window over the (tiny)
    aggregated n-gram table, not the corpus. Ties broken by the gram string
    so the result is a total order. At 100 TB the grouped table is the only
    shuffle, already reduced by partial aggregation; a hub cap
    (filter cnt >= min_support before the window) bounds the ranked set.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.split(F.trim(F.col("text")), " ").alias("l")).filter(
        F.size("l") >= 3
    )
    grams = toks.select(
        "lang",
        F.explode(
            F.arrays_zip(
                F.expr("slice(l, 1, size(l) - 2)").alias("w1"),
                F.expr("slice(l, 2, size(l) - 2)").alias("w2"),
                F.expr("slice(l, 3, size(l) - 2)").alias("w3"),
            )
        ).alias("t"),
    ).select("lang", F.concat_ws(" ", "t.w1", "t.w2", "t.w3").alias("gram"))
    counted = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return (
        counted.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _NGRAM_TOPK)
        .select("lang", "rn", "gram", "cnt")
        .orderBy("lang", "rn")
    )


# --- deterministic domain-mixture sampling ---------------------------------------

# Target mixture: per-source keep rates in basis points (of 10000). Derived
# from the source index so the spec is visible in one line; a real pipeline
# would load this as a config table. src0,src4,... keep 20%; src1,src5,...
# 40%; src2,src6,... 60%; src3,src7,... 80%.
_MIX_RATES_BPS = {f"src{i}": 2000 * (i % 4 + 1) for i in range(20)}

_MIX_VALUES = ", ".join(f"('{s}', {r})" for s, r in sorted(_MIX_RATES_BPS.items()))

_MIX_ORACLE = f"""
WITH rates(source, rate_bps) AS (VALUES {_MIX_VALUES}),
d AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5('mix' || '|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 10000 AS u
  FROM documents
)
SELECT d.source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN u < r.rate_bps THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN u < r.rate_bps THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM d JOIN rates r ON d.source = r.source
GROUP BY d.source
ORDER BY d.source
"""


@register("text_domain_mixture", oracle=_MIX_ORACLE, tags=("text", "sample"))
def text_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture downsampling — hit per-source target
    proportions (the data-mixing step of a training-data pipeline) with a
    content-addressed coin: keep doc iff md5('mix|' || doc_id) % 10000 <
    rate_bps[source].

    Hash-based (not rand()) so the sample is reproducible across runs,
    engines, and retries — re-running the pipeline on 100 TB yields the
    byte-identical subset, and adding a source never reshuffles another
    source's sample. The per-source rate table is a broadcast dim (20 rows);
    the scan stays map-only into one partial-aggregated groupBy. Output
    reports per-source totals, kept counts, and an integer checksum of kept
    doc_ids so the driver hash-verifies WHICH docs were kept, not just how
    many.
    """
    d = load(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        sorted(_MIX_RATES_BPS.items()), "source string, rate_bps int"
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("mix"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    kept = F.col("u") < F.col("rate_bps")
    return (
        d.select("doc_id", "source")
        .withColumn("u", u)
        .join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(0)).alias("kept_id_sum"),
        )
        .orderBy("source")
    )


# --- per-domain document caps (C4 / RefinedWeb-style) ------------------------

_CAP_K = 10  # kept docs per source
# Phase-1 sizing target: rows one task's window sort may hold. The salt
# count derives from it: salts = ceil(max_domain_rows / this) — so the
# hottest domain's phase-1 sort is bounded per task no matter how skewed
# the corpus (at the 100 TB design point, one domain at 1% of a 5e10-row
# corpus derives ~500 salts instead of a fixed handful).
_CAP_TARGET_TASK_ROWS = 1_000_000

_DOMAIN_CAP_ORACLE = f"""
SELECT source, doc_id, n_tokens, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT source, doc_id,
         CAST(len({_WS}) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY len({_WS}) DESC, doc_id
         ) AS rnk
  FROM documents
) t
WHERE rnk <= {_CAP_K}
"""


def domain_top_k(
    d: DataFrame, k: int = _CAP_K, salts: int | None = None
) -> DataFrame:
    """Salted two-phase per-domain top-K over a ``(source, doc_id,
    n_tokens)`` frame — best first (most tokens; ties → lowest doc_id).

    Scale shape: a single window over ``source`` would hash one ENTIRE
    domain into one task — and web-crawl domains are exactly where key
    skew lives (one host can be 1% of the corpus). So top-K runs in two
    bounded phases: (1) row_number within (source, salt) where
    salt = doc_id % salts, keeping ≤ k per sub-partition — per-task rows
    ≈ |domain|/salts; (2) row_number within source over the ≤ salts·k
    survivors. Phase 1 can never drop a final winner (every global top-k
    row ranks ≤ k inside its own salt), so the result is row-identical
    to the direct single-window form FOR ANY salts ≥ 1 — the tie-break
    on unique doc_id makes the order total, hence the equality exact,
    not approximate (asserted across salt settings in
    tests/test_northstar.py).

    Sizing rule (``salts=None``, the default): one skew-safe pre-count —
    a map-side-combinable groupBy whose output is one row per domain —
    measures the hottest domain, and
    ``salts = ceil(max_domain_rows / _CAP_TARGET_TASK_ROWS)`` bounds
    phase 1's per-task sort at the target no matter the skew (the same
    derive-from-data discipline as kmeans auto-k). Callers that already
    know their skew pass ``salts`` explicitly and skip the pre-count."""
    if salts is None:
        mx = (
            d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .first()[0]
        )
        salts = max(1, math.ceil((mx or 0) / _CAP_TARGET_TASK_ROWS))
    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    w1 = Window.partitionBy(
        "source", (F.col("doc_id") % salts).alias("salt")
    ).orderBy(*order)
    survivors = (
        d.withColumn("pre", F.row_number().over(w1))
        .filter(F.col("pre") <= k)
        .drop("pre")
    )
    w2 = Window.partitionBy("source").orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("source", "doc_id", "n_tokens", "rnk")
    )


@register("text_domain_cap", oracle=_DOMAIN_CAP_ORACLE, tags=("text", "sample"))
def text_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps: keep at most K docs per source, best
    first (longest; ties → lowest doc_id) — the curation step that stops
    one hot domain from dominating the training mix (C4 capped URLs per
    host; RefinedWeb caps per-domain contributions). The salted two-phase
    plan, its salt-count sizing rule, and the row-identity argument live
    in ``domain_top_k``."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    return domain_top_k(d, _CAP_K)


# --- per-source KL divergence from the corpus distribution -------------------

# Domain-shift monitor: KL(P_source ‖ P_corpus) over the whitespace-token
# unigram distributions — the drift metric a curation pipeline watches to
# catch a crawl slice going off-distribution (and the weighting input for
# domain-temperature sampling). Per-term contributions are nano-quantized
# (floor(1e9 · p·ln(p/q))): the ln/multiply chain agrees across engines to
# ~2 ulp, so a floor flip needs the true value within ~1e-11 of an integer
# boundary — negligible over vocabulary-sized distinct count combinations.
# Everything hashed is then exact BIGINT.
_KL_SCALE = 1_000_000_000

# Shared CTE chain + raw (pre-FLOOR) term: interpolated into BOTH the
# oracle and the boundary guard so they cannot drift apart (round-6
# ADVICE; guard rationale in relevance.BM25_BOUNDARY_GUARD_SQL).
_KL_CTES = f"""tok AS (
  SELECT source, unnest({_WS}) AS w FROM documents
),
sc AS (SELECT source, w, COUNT(*) AS c_sw FROM tok GROUP BY source, w),
st AS (SELECT source, COUNT(*) AS n_s FROM tok GROUP BY source),
cc AS (SELECT w, COUNT(*) AS c_cw FROM tok GROUP BY w),
ct AS (SELECT COUNT(*) AS n_c FROM tok),
raw_terms AS (
  SELECT sc.source,
         {_KL_SCALE}.0 * ((sc.c_sw * 1.0 / st.n_s)
             * LN((sc.c_sw * 1.0 / st.n_s) / (cc.c_cw * 1.0 / ct.n_c))) AS r
  FROM sc
  JOIN st USING (source)
  JOIN cc USING (w)
  CROSS JOIN ct
)"""

_DOMAIN_KL_ORACLE = f"""
WITH {_KL_CTES}
SELECT source,
       COUNT(*) AS n_terms,
       CAST(SUM(CAST(FLOOR(r) AS BIGINT)) AS BIGINT) AS kl_nano
FROM raw_terms
GROUP BY source
ORDER BY source
"""

# ONE guard band for the whole repo (see relevance._GUARD_PRED) — a
# re-inlined copy here silently kept a stale band when the shared one
# was tuned.
from .relevance import _GUARD_PRED as _KL_GUARD_PRED  # noqa: E402

KL_BOUNDARY_GUARD_SQL = f"""
WITH {_KL_CTES}
SELECT source, r FROM raw_terms
WHERE {_KL_GUARD_PRED}
"""


def domain_kl_from_counts(sc: DataFrame) -> DataFrame:
    """Evaluate per-source KL(P_source ‖ P_corpus) from the (source, w,
    c_sw) token-count state — the marginals (per-source totals, corpus
    counts, corpus total) are exact integer sums OF that state, so batch
    and streaming twins that maintain the same counts evaluate to the
    same nano-quantized BIGINTs by construction.

    Shared by ``text_domain_kl`` (batch) and
    ``streaming/curation.domain_kl_from_count_state`` (the per-trigger
    drift monitor)."""
    st = sc.groupBy("source").agg(F.sum("c_sw").cast("long").alias("n_s"))
    cc = sc.groupBy("w").agg(F.sum("c_sw").cast("long").alias("c_cw"))
    ct = sc.agg(F.sum("c_sw").cast("long").alias("n_c"))
    p = (F.col("c_sw") * 1.0) / F.col("n_s")
    q = (F.col("c_cw") * 1.0) / F.col("n_c")
    contrib = (
        sc.join(F.broadcast(st), "source")
        .join(cc, "w")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            F.floor(F.lit(float(_KL_SCALE)) * (p * F.log(p / q)))
            .cast("long")
            .alias("t"),
        )
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("t").alias("kl_nano"),
        )
        .orderBy("source")
    )


@register("text_domain_kl", oracle=_DOMAIN_KL_ORACLE, tags=("text", "llm"))
def text_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_source ‖ P_corpus) per document source over unigram token
    distributions, nano-quantized into exact BIGINTs (see the oracle's
    determinism note) — the domain-drift monitor of a curation pipeline.

    Plan: ONE map-side-combined hash aggregate over the token stream to
    the O(sources·vocab) count state, whose integer marginals feed the
    evaluator (``domain_kl_from_counts``): corpus counts joined back onto
    the per-source counts (un-hinted — AQE decides; at 100M+-term
    vocabularies it shuffles on w, shape unchanged), per-source totals
    and the 1-row corpus total broadcast, then one final tiny aggregate.
    Nothing global ever exceeds O(vocabulary)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    sc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))
    return domain_kl_from_counts(sc)
