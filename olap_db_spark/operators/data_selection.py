"""Training-data selection via importance resampling (DSIR).

Implements the published DSIR method (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every raw-corpus
document by a bag-of-hashed-n-grams log importance weight
log(p_target / p_raw) and sample the training subset with Gumbel-top-k —
the standard way to pick a target-domain-like slice out of a 100 TB crawl
before training.

Reference scope note: the reference repo (ranking-URL ingest lab) has no
data-selection surface; this operator extends the LLM-pipeline family the
round briefs call for, alongside dedup/quality/mixture in
``text_analysis.py`` / ``fuzzy_dedup.py``.

Determinism contract (same playbook as the relevance family):

- Features are word unigrams + bigrams hashed into ``_DSIR_BUCKETS``
  buckets with the portable md5-slice hash (identical integer in both
  engines) — the paper's hashed n-gram feature space.
- Per-bucket weights ln(p_t/p_r) over add-one-smoothed bucket counts are
  ln() of an EXACT integer rational, floor-quantized to micro units; the
  per-doc score is then an exact BIGINT sum (boundary-flip risk bounded
  exactly like the bigram/KL surfaces, and guarded by
  ``DSIR_BOUNDARY_GUARD_SQL`` in the parity fuzzer).
- The resampling noise is a content-addressed Gumbel: u derived from
  md5(doc_id) (an exact rational in (0,1)), g = -ln(-ln(u)) floor-
  quantized to micro units — reproducible across runs, engines, and
  retries, unlike rand(). Gumbel-top-k over (score + noise) IS sampling
  without replacement ∝ importance weight (Vieira 2014), so this is the
  paper's sampler, not a top-k approximation.

Scale shape (100 TB): gram extraction is map-only (slice+arrays_zip, no
positional self-join); bucket counts are two map-side-combined hash aggs
into O(_DSIR_BUCKETS) state; the weight table (≤1024 rows) is broadcast
back onto the gram stream; per-doc scoring is ONE shuffle of
(doc_id, int) pairs with partial aggregation; the Gumbel key is map-only
arithmetic on the aggregated frame; selection is TakeOrderedAndProject
(k·partitions merge, no global sort). Nothing global ever exceeds
O(buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_DSIR_BUCKETS = 1024
_DSIR_TARGET_SOURCE = "src0"  # the "target domain" sample: one crawl source
_DSIR_K = 64  # selected subset size
_W_SCALE = 1_000_000  # micro-quantization for both ln surfaces
_U_DENOM = 1_048_576  # 2^20: u = (md5 % 2^20 + 0.5) / 2^20, exact rational

# Portable md5-slice hash (same construction as text_domain_mixture's
# coin): first 8 hex chars as a 32-bit integer — identical in Spark
# (conv base16) and DuckDB (0x cast).
_BUCKET_SQL = (
    "CAST('0x' || substr(md5('dsir|' || gram), 1, 8) AS BIGINT) % "
    f"{_DSIR_BUCKETS}"
)

# Shared CTE chain + raw (pre-FLOOR) ln terms, interpolated into BOTH the
# oracle and the boundary guard so they cannot drift apart (the round-6
# guard convention; rationale in relevance.BM25_BOUNDARY_GUARD_SQL).
_DSIR_RAW_W = f"""{_W_SCALE}.0 * LN(
           ((COALESCE(tc.c_t, 0) + 1.0) * (rt.n_r + {_DSIR_BUCKETS}))
           / ((rc.c_r + 1.0) * (tt.n_t + {_DSIR_BUCKETS})))"""

_DSIR_RAW_G = f"""{_W_SCALE}.0 * (-LN(-LN(
           (CAST('0x' || substr(md5('dsirg|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
            % {_U_DENOM} + 0.5) / {_U_DENOM})))"""

_DSIR_CTES = f"""toks AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS l FROM documents
),
grams AS (
  SELECT doc_id, source, unnest(l) AS gram FROM toks
  UNION ALL
  SELECT doc_id, source, w1 || ' ' || w2 AS gram
  FROM (
    SELECT doc_id, source,
           unnest(l[1:len(l) - 1]) AS w1,
           unnest(l[2:len(l)]) AS w2
    FROM toks WHERE len(l) >= 2
  ) bg
),
gb AS (SELECT doc_id, source, {_BUCKET_SQL} AS b FROM grams),
rc AS (SELECT b, COUNT(*) AS c_r FROM gb GROUP BY b),
tc AS (SELECT b, COUNT(*) AS c_t FROM gb
       WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY b),
rt AS (SELECT COUNT(*) AS n_r FROM gb),
tt AS (SELECT COUNT(*) AS n_t FROM gb
       WHERE source = '{_DSIR_TARGET_SOURCE}'),
w_raw AS (
  SELECT rc.b, {_DSIR_RAW_W} AS r
  FROM rc
  LEFT JOIN tc ON rc.b = tc.b
  CROSS JOIN rt CROSS JOIN tt
),
w AS (SELECT b, CAST(FLOOR(r) AS BIGINT) AS w_micro FROM w_raw),
score AS (
  SELECT gb.doc_id, gb.source,
         COUNT(*) AS n_grams,
         CAST(SUM(w.w_micro) AS BIGINT) AS score_micro
  FROM gb JOIN w USING (b)
  GROUP BY gb.doc_id, gb.source
),
g_raw AS (SELECT doc_id, {_DSIR_RAW_G} AS r FROM score),
keyed AS (
  SELECT s.doc_id, s.source, s.n_grams, s.score_micro,
         CAST(FLOOR(g.r) AS BIGINT) AS gumbel_micro,
         s.score_micro + CAST(FLOOR(g.r) AS BIGINT) AS key_micro
  FROM score s JOIN g_raw g USING (doc_id)
)"""

_DSIR_ORACLE = f"""
WITH {_DSIR_CTES}
SELECT doc_id, source, n_grams, score_micro, gumbel_micro, key_micro
FROM keyed
ORDER BY key_micro DESC, doc_id ASC
LIMIT {_DSIR_K}
"""

# Integer-boundary guard for BOTH floor-quantized ln surfaces (per-bucket
# weight, per-doc Gumbel) — run by tests/test_parity_fuzz.py against
# adversarial corpora and the real sf0.01 data. ONE guard band for the
# whole repo: imported from relevance, never re-declared (tuning the
# drift band must reach every guard at once).
from .relevance import _GUARD_PRED  # noqa: E402

DSIR_BOUNDARY_GUARD_SQL = f"""
WITH {_DSIR_CTES}
SELECT CAST(b AS VARCHAR) AS which, r FROM w_raw WHERE {_GUARD_PRED}
UNION ALL
SELECT 'g:' || CAST(doc_id AS VARCHAR) AS which, r FROM g_raw WHERE {_GUARD_PRED}
"""


def _md5_coin(prefix: str, col, modulus: int):
    """Portable md5-slice integer in [0, modulus): first 8 hex chars of
    md5(prefix || '|' || col) as a 32-bit value — bit-identical to the
    oracle's ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(prefix), col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % modulus
    )


@register("text_dsir_select", oracle=_DSIR_ORACLE, tags=("text", "llm", "sample"))
def text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): Gumbel-top-64 documents by
    hashed-n-gram importance weight log(p_target/p_raw), with source
    'src0' as the target domain — see the module docstring for the
    determinism contract and the 100 TB plan shape."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), " ").alias("l")
    )
    # unigrams ∪ bigrams, both map-only (slice+arrays_zip — the
    # no-positional-self-join bigram shape shared with relevance.py)
    grams = toks.select(
        "doc_id", "source", F.explode("l").alias("gram")
    ).unionAll(
        toks.filter(F.size("l") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(l, 1, size(l) - 1)").alias("w1"),
                    F.expr("slice(l, 2, size(l) - 1)").alias("w2"),
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")).alias("gram"),
        )
    )
    gb = grams.select(
        "doc_id",
        "source",
        # the one portable-hash construction in this module (_md5_coin),
        # not a re-inlined copy that could drift from it
        _md5_coin("dsir", F.col("gram"), _DSIR_BUCKETS).alias("b"),
    )

    # ONE map-side-combined hash agg into O(buckets) state: the raw count
    # AND the target-domain count fold out of the same pass as
    # count(CASE WHEN source = target) — the previous shape ran two
    # separate bucket aggregates (rc, tc) then LEFT-joined them, which
    # re-derived the whole corpus-wide gram explode TWICE in the plan
    # (r12 optimization, guide §2.4: two aggregations keyed the same way
    # share one exchange — here they share the whole pipeline). The gram
    # TOTALS still come from the ≤1024-row bucket table (sum of counts),
    # NOT from separate gb.agg() branches — those would replan the explode
    # yet again for two integers (the dedup_lsh_eval 24-scan lesson).
    bc = gb.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.count(
            F.when(F.col("source") == _DSIR_TARGET_SOURCE, F.lit(1))
        ).alias("c_t"),
    )
    # coalesce is load-bearing: SUM over an EMPTY bucket table is NULL
    # where the old count() branch gave 0 — a corpus with no target-domain
    # docs must yield n_t = 0, not NULL-poisoned weights (caught by the
    # adversarial parity fuzzer, whose corpora have no src0)
    totals = bc.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).alias("n_r"),
        F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_t"),
    )

    ratio = (
        (F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1.0))
        * (F.col("n_r") + F.lit(_DSIR_BUCKETS))
    ) / ((F.col("c_r") + F.lit(1.0)) * (F.col("n_t") + F.lit(_DSIR_BUCKETS)))
    w = (
        bc.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.floor(F.lit(float(_W_SCALE)) * F.log(ratio))
            .cast("long")
            .alias("w_micro"),
        )
    )

    # ≤_DSIR_BUCKETS-row weight table broadcast onto the gram stream; ONE
    # shuffle of (doc_id, int) with partial aggregation
    score = (
        gb.join(F.broadcast(w), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w_micro").alias("score_micro"),
        )
    )

    # content-addressed Gumbel noise: map-only on the aggregated frame
    u = (
        _md5_coin("dsirg", F.col("doc_id"), _U_DENOM).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_U_DENOM))
    g_micro = F.floor(F.lit(float(_W_SCALE)) * (-F.log(-F.log(u)))).cast("long")
    return (
        score.withColumn("gumbel_micro", g_micro)
        .select(
            "doc_id",
            "source",
            "n_grams",
            "score_micro",
            "gumbel_micro",
            (F.col("score_micro") + F.col("gumbel_micro")).alias("key_micro"),
        )
        .orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
        .limit(_DSIR_K)
    )
