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

Determinism: scores are emitted as scaled BIGINTs (``*_e4``/``*_e6``), and
BM25's per-term contributions are rounded to integers BEFORE the per-doc
sum, so floating-point addition order can never flap the driver hash (the
``_determinism.py`` pattern applied to a multi-term scoring function). The
single ``ln`` per distinct df is computed from identical double inputs in
both engines; its ≤1-ulp platform drift is annihilated by the e4/e6
rounding except on boundaries ~1e-8 wide.
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
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)) * 10000, 0)
              AS BIGINT) AS score_e4
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, score_e4, rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_e4 DESC, term ASC) AS rnk
      FROM scored) r
WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@register("text_tfidf_topterms", oracle=_TFIDF_ORACLE, tags=("text", "llm"))
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))).

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
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                * 10000
            )
            .cast("long")
            .alias("score_e4"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_e4").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "score_e4", "rnk")
        .orderBy("doc_id", "rnk")
    )


# --- BM25 --------------------------------------------------------------------

_QUERY_TERMS = ("spark", "data", "window")
_K1, _B = 1.2, 0.75

_BM25_ORACLE = f"""
WITH tokens AS ({_TOKENS_SQL}),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
qtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens
        WHERE term IN {_QUERY_TERMS!r} GROUP BY doc_id, term),
qdf AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
contrib AS (
  SELECT qtf.doc_id,
         CAST(ROUND(
           LN((n.n_docs - qdf.df + 0.5) / (qdf.df + 0.5) + 1.0)
           * (qtf.tf * ({_K1} + 1.0))
           / (qtf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / avgdl.avgdl))
           * 1000000, 0) AS BIGINT) AS contrib_e6
  FROM qtf
  JOIN qdf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN avgdl
)
SELECT doc_id, SUM(contrib_e6) AS score_e6
FROM contrib
GROUP BY doc_id
ORDER BY score_e6 DESC, doc_id ASC
LIMIT 10
"""


@register("text_bm25_search", oracle=_BM25_ORACLE, tags=("text", "llm"))
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-10 documents for the fixed query
    {spark, data, window} — ranked retrieval over the corpus.

    Plan: doc lengths and query-term tfs are two hash aggregates over the
    token stream; df and avgdl reduce to a handful of scalars
    (broadcast); the scored join touches only docs containing a query
    term (the qtf semi-filter), then TakeOrderedAndProject for the top
    10. Per-term contributions are integer-rounded before the per-doc
    SUM, so the hash is addition-order-proof."""
    docs = load(spark, sf_dir, "documents")
    tokens = _tokens(docs)
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    qtf = (
        tokens.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    contrib = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_K1 + 1.0))
                / (
                    F.col("tf")
                    + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
                * 1000000
            )
            .cast("long")
            .alias("contrib_e6"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("contrib_e6").alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
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
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM toks, range(1, 4000) r(i)
  WHERE i <= len(l) - 1
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
contrib AS (
  SELECT big.doc_id,
         CAST(ROUND(LN((c2.c2 + 1.0) / (c1.c1 + uni.v)) * 1000000, 0)
              AS BIGINT) AS lp_e6
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN uni
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       SUM(lp_e6) AS sum_logprob_e6,
       CAST(ROUND(-CAST(SUM(lp_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
         AS avg_nll_e6
FROM contrib
GROUP BY doc_id
ORDER BY doc_id
"""


@register("text_bigram_lm_nll", oracle=_BIGRAM_ORACLE, tags=("text", "llm"))
def text_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model score per document (add-one smoothing,
    corpus-trained): avg negative log-likelihood — the PERPLEXITY-FILTER
    primitive a training-data pipeline uses to drop gibberish and
    boilerplate outliers.

    Spark-first shape: bigrams come from ``slice``+``arrays_zip`` on the
    token array — a MAP-ONLY extraction, no positional self-join, no
    shuffle until the count aggregates. The model tables (bigram counts,
    history counts, vocab size) are O(vocabulary²-observed) and broadcast
    back onto the bigram stream; per-bigram log-probs are integer-rounded
    before the per-doc sum (addition-order-proof, as in BM25). At web
    scale the c2 join flips to a shuffle join by dropping the hint — the
    pipeline shape is unchanged."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("l")
    )
    v = (
        toks.select(F.explode("l").alias("term"))
        .agg(F.countDistinct("term").alias("v"))
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(l, 1, size(l) - 1)").alias("w1"),
                F.expr("slice(l, 2, size(l) - 1)").alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    contrib = (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))) * 1000000
            )
            .cast("long")
            .alias("lp_e6"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_e6").alias("sum_logprob_e6"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_logprob_e6",
            F.round(
                -F.col("sum_logprob_e6").cast("double") / F.col("n_bigrams")
            )
            .cast("long")
            .alias("avg_nll_e6"),
        )
        .orderBy("doc_id")
    )
