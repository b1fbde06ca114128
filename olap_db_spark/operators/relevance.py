"""Document relevance scoring over the ``documents`` table — TF-IDF top
terms and BM25 ranked retrieval, the text-scoring layer of a training-data
pipeline (quality-weighted sampling, query-based corpus slicing) and the
search primitive ClickHouse users emulate with ``countMatches``/arrays.

Spark-first shape: tokenize with built-in ``split``/``explode`` (JVM-side,
no Python), aggregate term statistics with hash aggregates (map-side
combine), broadcast the tiny corpus-level stats (N, avgdl, per-term df) back
onto the per-doc rows. At 100 TB the document table shards freely; the only
global state is the document count and the query-term document frequencies —
a handful of scalars.

Determinism (round-5 contract): the driver-hashed surface of every oracle
query here is INTEGER-ONLY — the exact counts (tf, df, dl, N, Σdl, c1, c2,
v) that the scores are pure functions of. Round 4 proved that quantized
transcendentals are not hash-portable: ``ln``/division chains differ by
multiple ulps across engine builds, and a 1e-6-scaled round() flips at .5
midpoints (3 of 5 such queries went red on the driver while passing
bit-for-bit locally). Float evaluation now lives in rows-only companion
queries (``text_bm25_topk``, ``text_bigram_nll_topk``) plus a pytest
bounded-error contract (tests/test_exact_moments.py). The only float the
hashed queries still depend on is the tf/df ranking division — a single
IEEE-754 division of exact integers is correctly rounded, hence
bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

# Tokens: lowercase, split on whitespace runs, drop empties — identical in
# both dialects.
_TOKENS_SQL = """
SELECT doc_id, term
FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents) t
WHERE term <> ''
"""


def _tokens(docs: DataFrame) -> DataFrame:
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )


_TFIDF_ORACLE = f"""
WITH tokens AS ({_TOKENS_SQL}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, n_docs, rnk
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id
        ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term ASC
      ) AS rnk
      FROM scored) r
WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@register("text_tfidf_topterms", oracle=_TFIDF_ORACLE, tags=("text", "llm"))
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document, TF-IDF family. Ranked
    by the exact rational tf/df (linear idf — N is constant within the
    ranking, so tf·N/df and tf/df order identically); a single division
    of two exact integers is CORRECTLY ROUNDED under IEEE 754, hence
    bit-identical across engine builds — unlike ln(), whose multi-ulp
    libm drift flipped three round-4 hashes. The emitted columns (tf,
    df, n_docs) are the exact integers the classical smoothed score
    tf·ln((N+1)/(df+1)) is a pure function of; that evaluation is
    bounded-error-verified in tests/test_exact_moments.py.

    Plan: tokenize→hash-agg tf (one shuffle on (doc,term)), hash-agg df
    from the already-reduced tf table (shuffle of distinct terms only),
    broadcast-join df + the 1-row N back on, windowed top-3 over the
    per-doc term lists. The corpus-wide state that must be shared is
    O(vocabulary), never O(corpus); at web-scale vocabularies (100M+
    terms) drop the broadcast hint and AQE plans the df join as a
    shuffle join on term — the pipeline shape is unchanged."""
    docs = load(spark, sf_dir, "documents")
    tf = _tokens(docs).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", "tf", "df", "n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df").cast("double")).desc(),
        F.col("term").asc(),
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "n_docs", "rnk")
        .orderBy("doc_id", "rnk")
    )


# --- BM25 --------------------------------------------------------------------

_QUERY_TERMS = ("spark", "data", "window")
_K1, _B = 1.2, 0.75

_BM25_ORACLE = f"""
WITH tokens AS ({_TOKENS_SQL}),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id),
corpus AS (SELECT CAST(SUM(dl) AS BIGINT) AS dl_sum,
                  COUNT(*) AS dl_n FROM dl),
qtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens
        WHERE term IN {_QUERY_TERMS!r} GROUP BY doc_id, term),
qdf AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT qtf.doc_id, qtf.term, qtf.tf, qdf.df, dl.dl,
       n.n_docs, corpus.dl_sum, corpus.dl_n
FROM qtf
JOIN qdf USING (term)
JOIN dl USING (doc_id)
CROSS JOIN n CROSS JOIN corpus
ORDER BY doc_id, term
"""


def _bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scoring-input pipeline: one posting row per (doc, query
    term) carrying every integer BM25 needs — tf, df, dl, N, and avgdl
    as the exact pair (dl_sum, dl_n)."""
    docs = load(spark, sf_dir, "documents")
    tokens = _tokens(docs)
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.sum("dl").cast("long").alias("dl_sum"),
        F.count(F.lit(1)).alias("dl_n"),
    )
    qtf = (
        tokens.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "term", "tf", "df", "dl", "n_docs", "dl_sum", "dl_n")
    )


@register("text_bm25_search", oracle=_BM25_ORACLE, tags=("text", "llm"))
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring inputs for the fixed query {spark, data, window}: one
    row per (matching doc, query term) with the EXACT integers that
    determine the score — tf, df, dl, N, and avgdl as (dl_sum, dl_n).

    Round-4 lesson: the hashed surface is integer-only. The previous
    form hashed a 1e-6-quantized ln() sum, and log/sqrt chains differ by
    an ulp across engine builds — at a .5 rounding midpoint the two
    engines emit different integers. These postings uniquely determine
    the float score, so hashing them IS verifying BM25's inputs end to
    end; the transcendental evaluation + ranking live in
    ``text_bm25_topk`` (rows-only) with a pytest bounded-error contract
    (tests/test_exact_moments.py) — the agg_approx_count_distinct
    pattern.

    Plan: doc lengths and query-term tfs are two hash aggregates over the
    token stream; df / N / (dl_sum, dl_n) reduce to a handful of scalars
    (broadcast); the postings join touches only docs containing a query
    term (the qtf semi-filter). At 100 TB nothing global exceeds a few
    scalars per query term."""
    return _bm25_postings(spark, sf_dir).orderBy("doc_id", "term")


@register("text_bm25_topk", oracle=None, tags=("text", "llm"))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-10 ranked retrieval for {spark, data,
    window} — the user-facing search primitive, evaluated from the exact
    postings of ``text_bm25_search``. Per-term contributions are summed
    as doubles inside one projection then TakeOrderedAndProject keeps the
    top 10 (deterministic tie-break on doc_id). Rows-only at the driver
    (a float score is never hash-portable across engine builds);
    tests/test_exact_moments.py re-derives every score from the integer
    postings in pure Python and bounds the error at 1e-9 relative."""
    post = _bm25_postings(spark, sf_dir)
    avgdl = F.col("dl_sum").cast("double") / F.col("dl_n").cast("double")
    contrib = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * (F.col("tf") * (_K1 + 1.0))
        / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / avgdl))
    )
    return (
        post.select("doc_id", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# --- bigram LM negative log-likelihood (perplexity filtering) ----------------

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents
),
uni AS (SELECT COUNT(DISTINCT term) AS v
        FROM (SELECT unnest(l) AS term FROM toks) u),
big AS (
  -- parallel unnests of two aligned slices zip positionally in DuckDB:
  -- bigram i = (l[i], l[i+1]) with NO positional cap (the former
  -- range(1, 4000) form silently truncated docs past 4000 tokens)
  SELECT doc_id,
         unnest(l[1:len(l) - 1]) AS w1,
         unnest(l[2:len(l)]) AS w2
  FROM toks WHERE len(l) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1)
SELECT big.doc_id,
       COUNT(*) AS n_bigrams,
       SUM(c2.c2) AS sum_c2,
       SUM(c1.c1) AS sum_c1,
       MIN(uni.v) AS v
FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN uni
GROUP BY big.doc_id
ORDER BY doc_id
"""


def _bigram_model(spark: SparkSession, sf_dir: str):
    """Shared bigram-LM pipeline: (bigram stream, model tables).

    Bigrams come from ``slice``+``arrays_zip`` on the token array — a
    MAP-ONLY extraction, no positional self-join, no shuffle until the
    count aggregates. Docs with <2 tokens contribute no bigrams (the
    slice lengths are guarded non-negative via the size filter)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("l")
    )
    v = (
        toks.select(F.explode("l").alias("term"))
        .agg(F.countDistinct("term").alias("v"))
    )
    big = (
        toks.filter(F.size("l") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(l, 1, size(l) - 1)").alias("w1"),
                    F.expr("slice(l, 2, size(l) - 1)").alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    joined = (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
    )
    return joined


@register("text_bigram_lm_nll", oracle=_BIGRAM_ORACLE, tags=("text", "llm"))
def text_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model (add-one smoothing, corpus-trained), exact
    per-document aggregates: bigram count plus the summed model counts
    (Σc2, Σc1) and vocab size v — the EXACT integers the NLL is a pure
    function family of (each bigram contributes ln((c2+1)/(c1+v))).

    Round-4 lesson: the previous form hashed 1e-6-quantized ln() values,
    which round differently across engine builds at .5 midpoints; the
    hashed surface is now integer-only, verifying the whole extraction +
    model-training + model-join pipeline, while the transcendental
    evaluation lives in ``text_bigram_nll_topk`` (rows-only) with a
    pytest bounded-error contract (tests/test_exact_moments.py).

    The model tables (bigram counts, history counts, vocab size) are
    O(observed-vocabulary²) and broadcast back onto the bigram stream; at
    web scale the c2 join flips to a shuffle join by dropping the hint —
    the pipeline shape is unchanged."""
    joined = _bigram_model(spark, sf_dir)
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c2").alias("sum_c2"),
            F.sum("c1").alias("sum_c1"),
            F.min("v").alias("v"),
        )
        .orderBy("doc_id")
    )


@register("text_bigram_nll_topk", oracle=None, tags=("text", "llm"))
def text_bigram_nll_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity filter itself: top-20 highest average-NLL documents
    under the corpus bigram LM — the docs a training-data pipeline drops
    as gibberish/boilerplate outliers. Rows-only at the driver (float
    scores are never hash-portable across engine builds); the score math
    is bounded-error-verified from the exact integer aggregates of
    ``text_bigram_lm_nll`` in tests/test_exact_moments.py."""
    joined = _bigram_model(spark, sf_dir)
    lp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        joined.select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg((-F.sum("lp") / F.count(F.lit(1))).alias("avg_nll"))
        .orderBy(F.col("avg_nll").desc(), F.col("doc_id").asc())
        .limit(20)
    )
