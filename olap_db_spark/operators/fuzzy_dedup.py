"""Document deduplication family (BASELINE.json north_star: "text dedup"):

- exact        : hash-groupBy on a normalized fingerprint
- n-gram Jaccard: shingle → explode → equi-join blocking → exact set math
- MinHash + LSH : md5-based minhash signatures → banded candidate join →
                  exact-Jaccard verification  (fully oracle-checked: the
                  hash family is md5, computable identically in DuckDB)
- SimHash      : 60-bit md5-derived simhash, banded by 15-bit chunks
                  (fully oracle-checked: hex→int via DuckDB '0x' cast /
                  Spark conv(hex,16,10); pytest adds dup-pair recall)
- embedding cosine near-dup: label-blocked pair join with deterministic
  fixed-point cosine (see _vector.py)

The testdata has no duplicate texts, so every query builds a DUP CORPUS
inside the query: documents ∪ (doc_id+1_000_000 copies, 10% of them
perturbed by an appended token). Both engines construct the identical
corpus, so near-dup pairs exist by construction and results hash-compare.

Scale design (the part that matters at 100 TB):
- No pairwise cross join anywhere. Candidates come from equi-join
  blocking (shared shingle / band key / LSH bucket / label) — the
  standard shuffle-friendly shape: explode → hash-partition by
  key → join within partitions.
- Hub keys are capped (shingle doc-frequency ≤ 50) to bound the
  worst-case pair fan-out; the cap is mirrored in the oracle so the
  check stays exact. At 100 TB you'd tune the cap, not the shape.
- MinHash signatures aggregate with min() per seed — map-side combine,
  one shuffle per doc, 8 integers of state per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register
from ._materialize import materialize
from ._vector import quantize, sql_cosine, sql_dot, sql_quantize
from .kmeans import _DIM as _EMB_DIM
from .kmeans import _ITERS as _KM_ITERS
from .kmeans import kmeans_fit_assign, sql_kmeans_assign

_DUP_OFFSET = 1_000_000

_CORPUS_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET} AS doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' zq' ELSE text END AS text
  FROM documents
"""

_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         ) AS shingles
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM corpus) t
  WHERE len(ws) >= 3
"""

_FREQ_CAP = 50


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" zq")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return d.unionAll(dup)


def _shingled(corpus: DataFrame) -> DataFrame:
    """doc_id + distinct 3-word shingle array (docs with ≥3 tokens).

    Built by zip-slicing the token array (``arrays_zip(slice(ws,1,n−2),
    slice(ws,2,n−2), slice(ws,3,n−2))``) and concatenating AFTER the
    explode — every expression is codegen'd. Two earlier shapes lost:
    an array-transform lambda (higher-order functions are interpreted
    per element — 8.5× slower at sf0.1) and posexplode + window leads
    (correct, but pays a per-doc sort and an extra exchange before the
    collect_set; the zip-slice form was measured ~2× faster at sf0.1).
    One shuffle total: the groupBy(doc_id) for the set aggregate."""
    ws = F.split(F.trim(F.col("text")), " ")
    # The ≥3-token guard is load-bearing, not cosmetic: slice() with a
    # negative length (size(ws) - 2 < 0 for a 1-token doc) is a runtime
    # error in Spark, and the oracle applies the same len >= 3 filter.
    exploded = corpus.select("doc_id", ws.alias("ws")).filter(
        F.size("ws") >= 3
    ).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 2)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 2)").alias("w2"),
                F.expr("slice(ws, 3, size(ws) - 2)").alias("w3"),
            )
        ).alias("t"),
    ).select(
        "doc_id",
        F.concat_ws(" ", F.col("t.w1"), F.col("t.w2"), F.col("t.w3")).alias("sh"),
    )
    return exploded.groupBy("doc_id").agg(F.collect_set("sh").alias("shingles"))


# --- exact dedup -----------------------------------------------------------------

_EXACT_ORACLE = f"""
WITH corpus AS ({_CORPUS_SQL})
SELECT md5(lower(trim(text))) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY 1
"""


@register("dedup_exact", oracle=_EXACT_ORACLE, tags=("dedup", "northstar"))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the fingerprint, keep lowest doc_id.
    The 100 TB shape — the fingerprint (16 bytes) is the only shuffled
    payload besides the id."""
    c = _dup_corpus(spark, sf_dir)
    return c.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fp")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --- incremental (cross-snapshot) dedup --------------------------------------------

_INCR_ORACLE = f"""
WITH base AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
),
batch AS (
  SELECT doc_id + {_DUP_OFFSET} AS doc_id,
         md5(lower(trim(
           CASE WHEN doc_id % 10 = 0 THEN text || ' zq' ELSE text END
         ))) AS fp
  FROM documents
  UNION ALL
  -- second arrival of every perturbed doc: an in-batch duplicate by
  -- construction, so all three status branches are non-vacuous
  SELECT doc_id + {2 * _DUP_OFFSET} AS doc_id,
         md5(lower(trim(text || ' zq'))) AS fp
  FROM documents
  WHERE doc_id % 10 = 0
),
firsts AS (SELECT fp, MIN(doc_id) AS first_id FROM batch GROUP BY fp)
SELECT b.doc_id, b.fp,
       CASE WHEN base.fp IS NOT NULL THEN 'dup_of_base'
            WHEN b.doc_id > f.first_id THEN 'dup_in_batch'
            ELSE 'novel' END AS status,
       CAST(CASE WHEN base.fp IS NULL AND b.doc_id = f.first_id
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM batch b
JOIN firsts f USING (fp)
LEFT JOIN base USING (fp)
"""


@register("dedup_incremental", oracle=_INCR_ORACLE, tags=("dedup",))
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-snapshot) dedup: the shape a continuously
    ingested crawl actually runs — dedup TODAY'S batch against the
    already-curated corpus without ever re-touching the corpus text.
    Base snapshot = ``documents``; new batch = the shifted dup-corpus
    half (90% exact copies of base, 10% perturbed → genuinely new) plus
    a SECOND arrival of every perturbed doc at doc_id + 2·offset, so
    in-batch duplicates exist by construction and all three status
    branches are exercised, not just declared. Every batch doc is
    classified: ``dup_of_base`` (fingerprint already
    in the corpus), ``dup_in_batch`` (a lower doc_id in the same batch
    owns the fingerprint), or ``novel``; ``keep`` marks exactly the
    first-arrival novel docs — what gets appended to the corpus.

    Scale shape: only (doc_id, 16-byte md5) pairs ever move — the base
    text is never read past fingerprinting, and at 100 TB the base side
    IS the stored fingerprint table (append ``keep=1`` rows back to it
    each batch, never recompute). One map-side-combinable hash-agg on
    the batch fingerprint + one equi-join against base fingerprints; a
    daily batch is tiny next to the accumulated corpus, so the join
    shuffles the small batch side into the base's layout (bucket the
    stored fp table by fp and the exchange disappears entirely), and
    Spark's runtime bloom filter prunes base partitions that contain no
    batch fingerprint."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    base_fp = d.select(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    ).distinct()
    batch = d.select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
        F.md5(
            F.lower(
                F.trim(
                    F.when(
                        F.col("doc_id") % 10 == 0,
                        F.concat(F.col("text"), F.lit(" zq")),
                    ).otherwise(F.col("text"))
                )
            )
        ).alias("fp"),
    ).unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 2 * _DUP_OFFSET).alias("doc_id"),
            F.md5(
                F.lower(F.trim(F.concat(F.col("text"), F.lit(" zq"))))
            ).alias("fp"),
        )
    )
    firsts = batch.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    j = batch.join(firsts, "fp").join(
        base_fp.withColumn("in_base", F.lit(1)), "fp", "left"
    )
    in_base = F.col("in_base").isNotNull()
    return j.select(
        "doc_id",
        "fp",
        F.when(in_base, F.lit("dup_of_base"))
        .when(F.col("doc_id") > F.col("first_id"), F.lit("dup_in_batch"))
        .otherwise(F.lit("novel"))
        .alias("status"),
        F.when(~in_base & (F.col("doc_id") == F.col("first_id")), 1)
        .otherwise(0)
        .cast("int")
        .alias("keep"),
    )


# --- n-gram Jaccard ----------------------------------------------------------------

# CTE block shared by the pair query and the connected-components oracle
def _jaccard_ctes(pair_pred: str = "TRUE") -> str:
    """Capped-blocking Jaccard CTE chain; ``pair_pred`` (over aliases
    ``a``/``b`` of the exploded shingle stream) restricts the evaluated
    pair universe — TRUE for the full eval, the sampled coin for the
    production-scale one."""
    return f"""corpus AS ({_CORPUS_SQL}),
shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(shingles) AS sh FROM shingled
),
capped AS (
  SELECT sh FROM exploded GROUP BY sh HAVING COUNT(*) <= {_FREQ_CAP}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM exploded a
  JOIN capped USING (sh)
  JOIN exploded b USING (sh)
  WHERE a.doc_id < b.doc_id AND ({pair_pred})
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM shingled),
jpairs AS (
  SELECT p.doc_a, p.doc_b,
         CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common) AS jaccard
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common) >= 0.5
)"""


_JACCARD_CTES = _jaccard_ctes()

_JACCARD_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT doc_a, doc_b, jaccard FROM jpairs
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup", "northstar"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.5.

    Blocking = shared shingle (equi-join), hub shingles capped at doc-freq
    ≤ 50 — candidate generation is a hash join on the shingle, never a
    cross join. Jaccard is exact integer set math → one deterministic
    division."""
    return _jaccard_pairs(_shingled(_dup_corpus(spark, sf_dir)))


def _jaccard_pairs(sh: DataFrame, doc_pred=None) -> DataFrame:
    """Exact capped-blocking Jaccard pairs (≥ 0.5) over a shingled frame.
    Shared by ``dedup_ngram_jaccard`` and ``dedup_lsh_eval`` so the eval
    scores against the identical truth pipeline (and the shingle subtree
    is built once per plan). ``doc_pred(doc_id)`` restricts the pair
    universe to pairs with a SAMPLED ENDPOINT (truth-set sampling) —
    pushed into the in-array pair GENERATION, so unsampled pairs are
    dropped before they are exploded or aggregated, and the sampling
    hash is computed once per doc-shingle occurrence, never per pair."""
    # One pass: explode carries each doc's shingle-set size, so pair rows
    # already hold both set sizes — no sizes join, no shingle recompute.
    coin = doc_pred(F.col("doc_id")) if doc_pred is not None else F.lit(True)
    exploded = sh.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        coin.alias("coin"),
        F.explode("shingles").alias("sh"),
    )
    grouped = (
        exploded.groupBy("sh")
        .agg(F.collect_list(F.struct("doc_id", "n_sh", "coin")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= _FREQ_CAP))
    )
    # In-array pair generation (collect_list order is irrelevant: the
    # a<b filter yields the same pair multiset under any ordering). The
    # coin filters INSIDE the array — a pair survives iff either endpoint
    # is sampled — so the exploded pair stream IS the sampled universe.
    pairs_arr = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x: F.transform(
                    F.col("ids"),
                    lambda y: F.struct(
                        x["doc_id"].alias("doc_a"),
                        x["n_sh"].alias("na"),
                        y["doc_id"].alias("doc_b"),
                        y["n_sh"].alias("nb"),
                        (x["coin"] | y["coin"]).alias("keep"),
                    ),
                ),
            )
        ),
        lambda s: (s["doc_a"] < s["doc_b"]) & s["keep"],
    )
    exploded_pairs = grouped.select(F.explode(pairs_arr).alias("p"))
    pairs = (
        exploded_pairs
        .groupBy(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.na").alias("na"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("p.nb").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash + LSH (md5 hash family → fully oracle-checked) -------------------------

_N_HASHES = 8
_BANDS = 4  # 4 bands × 2 rows
_N_MD5 = 2  # digests per shingle; each 128-bit digest yields 4 x 32-bit hashes

# 8 independent 32-bit hash functions from TWO md5 digests per shingle
# occurrence (hex-slice the 128-bit digest into four 8-char chunks): the
# min-hash statistics are unchanged (each chunk is an independent uniform
# hash) while the dominant md5 cost drops 4x. Hash j = chunk (j % 4) of
# digest (j // 4); fixed-width lowercase hex compares like the integer.
_SIGS_SQL = ", ".join(
    f"MIN(substr(md5('{j // 4}|' || sh), {1 + 8 * (j % 4)}, 8)) AS sig{j}"
    for j in range(_N_HASHES)
)
_BANDS_SQL = ", ".join(
    f"md5(sig{2*b} || sig{2*b+1}) AS band{b}" for b in range(_BANDS)
)
_BAND_UNION_SQL = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band_no, band{b} AS band_key FROM banded"
    for b in range(_BANDS)
)

_MINHASH_CTES = f"""corpus AS ({_CORPUS_SQL}),
shingled AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id, {_SIGS_SQL}
  FROM (SELECT doc_id, unnest(shingles) AS sh FROM shingled) t
  GROUP BY doc_id
),
banded AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
bandkeys AS ({_BAND_UNION_SQL}),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandkeys a JOIN bandkeys b
    ON a.band_no = b.band_no AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         / (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
  FROM candidates c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b
)"""

_MINHASH_ORACLE = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.5
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, tags=("dedup", "northstar"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 hashes from 2 md5 digests) → LSH(4 bands × 2) →
    exact-Jaccard verify.

    Fully oracle-checked: the hash family is hex-sliced md5-on-string,
    identical in both engines, so candidates AND verdicts hash-compare
    exactly.

    Scale shape: signature agg is 8 min()s (map-side combinable); banding
    turns candidate generation into 4 equi-joins on 16-byte keys; only
    candidate pairs (not all pairs) fetch shingle arrays for verification.
    """
    # shared-frame checkpoint (r12): the banding pass and both verify
    # sides reference the shingled corpus — one compute + reads instead
    # of re-running the explode + collect_set pipeline per reference
    # (same measured rationale as _lsh_eval_df). r13: via materialize()
    # — conf-gated reliable checkpoint for cluster fault tolerance.
    sh = materialize(_shingled(_dup_corpus(spark, sf_dir)))
    return (
        _candidate_jaccard(_lsh_candidates(sh), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def _lsh_candidates(sh: DataFrame, doc_pred=None) -> DataFrame:
    """MinHash signature → band keys → distinct candidate (doc_a < doc_b)
    pairs. Shared by ``dedup_minhash_lsh`` and ``dedup_lsh_eval``.

    Hash per occurrence + map-side-combined min: ONE shuffle. (A
    hash-distinct-shingles-then-join variant computes 20× fewer md5s but
    costs two extra shuffles — measured a wash locally and strictly
    worse at scale, where shuffles dominate hash compute.)

    ``doc_pred(doc_id)`` restricts candidate GENERATION to pairs with a
    sampled endpoint: the left join side becomes only the sampled docs'
    band keys, so a band group of size g emits O(sampled·g) join rows
    instead of O(g²) — the full (clone-quadratic) candidate set is never
    materialized. Sampled ⋈ all with least/greatest order normalization
    covers exactly the pairs where either endpoint is sampled (a
    both-sampled pair arrives twice, once per orientation; the DISTINCT
    that already dedups multi-band collisions collapses it)."""
    bandkeys = _band_keys(sh)
    if doc_pred is None:
        a = bandkeys.alias("a")
        b = bandkeys.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_no") == F.col("b.band_no"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    a = bandkeys.filter(doc_pred(F.col("doc_id"))).alias("a")
    b = bandkeys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def _band_keys(sh: DataFrame) -> DataFrame:
    """(doc_id, band_no, band_key) — the LSH index rows over a shingled
    frame: per-occurrence md5 hashing with map-side-combined MIN
    signature aggregate (ONE shuffle), then band-key hashing and the
    band explode. Shared by the pair generators (``_lsh_candidates``)
    and the incremental batch-vs-corpus assignment
    (``dedup_lsh_incremental``)."""
    exploded = sh.select("doc_id", F.explode("shingles").alias("sh"))
    digests = [
        F.md5(F.concat(F.lit(f"{a}|"), F.col("sh"))) for a in range(_N_MD5)
    ]
    sigs = exploded.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(digests[j // 4], 1 + 8 * (j % 4), 8)
            ).alias(f"sig{j}")
            for j in range(_N_HASHES)
        ]
    )
    banded = sigs.select(
        "doc_id",
        *[
            F.md5(F.concat(F.col(f"sig{2*b}"), F.col(f"sig{2*b+1}"))).alias(
                f"band{b}"
            )
            for b in range(_BANDS)
        ],
    )
    return banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"), F.col(f"band{b}").alias("band_key")
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_no", "bk.band_key")


def _candidate_jaccard(candidates: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard on candidate pairs only (never all pairs): two
    equi-joins fetch the shingle arrays, then integer set math."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = common.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - common
    )
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- LSH quality evaluation (measured precision/recall, not a claim) ---------

def _lsh_eval_oracle(pair_pred: str = "TRUE") -> str:
    """LSH-eval oracle with the pair-universe predicate (over aliases
    ``a``/``b``) injected into BOTH pair generators — truth and LSH
    candidates — so the sampled eval compares like against like."""
    return f"""
WITH {_jaccard_ctes(pair_pred)},
sigs AS (
  SELECT doc_id, {_SIGS_SQL}
  FROM (SELECT doc_id, unnest(shingles) AS sh FROM shingled) t
  GROUP BY doc_id
),
banded AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
bandkeys AS ({_BAND_UNION_SQL}),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandkeys a JOIN bandkeys b
    ON a.band_no = b.band_no AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id AND ({pair_pred})
),
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM candidates c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
),
cls AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE v.doc_a IS NOT NULL AND t.doc_a IS NOT NULL)
         AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (WHERE v.doc_a IS NULL) AS BIGINT) AS missed,
    CAST(COUNT(*) FILTER (WHERE t.doc_a IS NULL) AS BIGINT) AS beyond_blocking
  FROM verified v
  FULL OUTER JOIN jpairs t ON v.doc_a = t.doc_a AND v.doc_b = t.doc_b
),
cn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM candidates),
tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM jpairs),
vn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_verified FROM verified)
SELECT n_truth, n_cand, n_verified, tp, missed, beyond_blocking,
       CAST(CASE WHEN n_cand = 0 THEN 0
                 ELSE n_verified * 1000000 // n_cand END AS BIGINT)
         AS cand_precision_micro,
       CAST(CASE WHEN n_truth = 0 THEN 0
                 ELSE tp * 1000000 // n_truth END AS BIGINT)
         AS recall_micro
FROM cls, tn, cn, vn
"""


_LSH_EVAL_ORACLE = _lsh_eval_oracle()

# Truth-set sampling for the eval (the similarity.py construction on the
# document side): a pair is EVALUATED iff either endpoint's
# content-addressed md5 coin (mod _EVAL_COIN_MOD) lands 0 — "were this
# sampled doc's duplicates found?", measured over ~1−(1−1/mod)² of the
# pair universe. Both pair generators (exact truth and LSH candidates)
# apply the same predicate BEFORE their expensive verify/aggregate work.
_EVAL_COIN_PREFIX = "evalq"
_EVAL_COIN_MOD = 4


def _eval_coin(col):
    from .data_selection import _md5_coin

    return _md5_coin(_EVAL_COIN_PREFIX, col, _EVAL_COIN_MOD) == 0


def _sql_eval_coin(col: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{_EVAL_COIN_PREFIX}|' || "
        f"CAST({col} AS VARCHAR)), 1, 8) AS BIGINT) % {_EVAL_COIN_MOD} = 0"
    )


_SQL_EVAL_PAIR_PRED = (
    f"{_sql_eval_coin('a.doc_id')} OR {_sql_eval_coin('b.doc_id')}"
)


def _lsh_eval_df(spark: SparkSession, sf_dir: str, doc_pred=None) -> DataFrame:
    """Measured LSH quality: score the MinHash(8)×LSH(4×2) route against
    the exact capped-blocking Jaccard pairs on the same corpus — recall /
    candidate precision as NUMBERS, not docstring claims.

    One row: n_truth (exact pairs ≥ 0.5 under shared-shingle blocking,
    doc-freq cap 50), n_cand (LSH candidate pairs), n_verified
    (candidates passing exact-Jaccard verify), tp (verified ∩ truth),
    missed (truth pairs the LSH route lost — band-collision misses),
    beyond_blocking (verified pairs the capped exact blocking cannot see:
    pairs whose every shared shingle is a >cap hub — LSH's structural
    advantage), and integer-exact micro ratios via truncating DIV
    (Spark ``DIV`` ≡ DuckDB ``//`` on non-negatives).

    Scale shape: both pair generators are the production blocked shapes
    (never all-pairs); the comparison is ONE full-outer equi-join on the
    pair key, and every one of the six confusion counts folds out of that
    single joined stream in one map-side-combinable aggregate — no
    separate count branches re-deriving the pair pipelines (the first
    shape of this query did exactly that: three scalar-count subtrees
    re-ran candidate generation, verification and the truth route from
    the parquet scan up, 24 scans in the plan and 2× the runtime)."""
    # Materialize the shingled corpus ONCE (r12): both routes (LSH bands,
    # two verify sides, the exact-Jaccard truth) consume this frame — five
    # references whose explode + collect_set pipeline partially re-ran at
    # runtime (3.18 → 2.88 s measured at sf0.1 with the checkpoint). One
    # row per shingled doc; MEMORY_AND_DISK per the data-sized-checkpoint
    # rule, partition count inherited from the aggregate's (AQE-coalesced,
    # conf-scaled on a cluster) exchange. r13: via materialize() — conf-
    # gated reliable checkpoint for cluster fault tolerance.
    sh = materialize(_shingled(_dup_corpus(spark, sf_dir)))
    # UNFILTERED candidate jaccard: the verify threshold becomes a flag,
    # so n_cand and n_verified come from the same rows. The sampled
    # eval's endpoint coin (doc_pred) is pushed into pair GENERATION on
    # both routes — neither ever materializes the unsampled pair set.
    cands = _lsh_candidates(sh, doc_pred)
    cv = _candidate_jaccard(cands, sh).withColumn("in_c", F.lit(1))
    truth = _jaccard_pairs(sh, doc_pred).select(
        "doc_a", "doc_b", F.lit(1).alias("in_t")
    )
    j = cv.join(truth, ["doc_a", "doc_b"], "full_outer")
    # A truth pair that is also a candidate ALWAYS verifies (its exact
    # jaccard is ≥ 0.5 by the truth definition), so missed ≡ truth∧¬ver.
    # in_c-null rows make `ver` false (not null): false AND null = false.
    ver = F.col("in_c").isNotNull() & (F.col("jaccard") >= 0.5)
    in_t = F.col("in_t").isNotNull()
    # count(when(cond, 1)) not sum(): count is 0 (not NULL) on empty input.
    one = j.agg(
        F.count("in_t").alias("n_truth"),
        F.count("in_c").alias("n_cand"),
        F.count(F.when(ver, 1)).alias("n_verified"),
        F.count(F.when(ver & in_t, 1)).alias("tp"),
        F.count(F.when(in_t & ~ver, 1)).alias("missed"),
        F.count(F.when(ver & ~in_t, 1)).alias("beyond_blocking"),
    )
    return one.select(
        "n_truth",
        "n_cand",
        "n_verified",
        "tp",
        "missed",
        "beyond_blocking",
        F.expr(
            "CAST(CASE WHEN n_cand = 0 THEN 0"
            " ELSE n_verified * 1000000 DIV n_cand END AS BIGINT)"
        ).alias("cand_precision_micro"),
        F.expr(
            "CAST(CASE WHEN n_truth = 0 THEN 0"
            " ELSE tp * 1000000 DIV n_truth END AS BIGINT)"
        ).alias("recall_micro"),
    )


@register("dedup_lsh_eval", oracle=_LSH_EVAL_ORACLE, tags=("dedup",))
def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_eval_df(spark, sf_dir)


dedup_lsh_eval.__doc__ = _lsh_eval_df.__doc__


@register(
    "dedup_lsh_eval_sampled",
    oracle=_lsh_eval_oracle(_SQL_EVAL_PAIR_PRED),
    tags=("dedup", "sample"),
)
def dedup_lsh_eval_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_lsh_eval`` over a SAMPLED pair universe — the production
    form of the measurement (r8 verdict ask #5): only pairs incident to a
    coin-sampled doc (content-addressed md5 on doc_id, mod
    ``_EVAL_COIN_MOD``) are evaluated, in BOTH the exact-Jaccard truth
    route and the LSH candidate route, so the truth verify cost scales
    with the sample while recall/precision stay unbiased estimates of the
    full-universe numbers (each pair's inclusion is independent of its
    truth/candidate status). Fully oracle-checked including the coin.

    The coin is pushed into pair GENERATION on both routes (r9 verdict
    ask #2): the LSH candidate join takes sampled band keys on its left
    side, and the truth route's in-array pair builder filters on the
    endpoint coins — the unsampled (clone-quadratic at probe scale)
    candidate set is never materialized on either route."""
    return _lsh_eval_df(spark, sf_dir, _eval_coin)


# --- incremental fuzzy dedup (batch vs indexed corpus) -------------------------------

# Content-addressed batch split: docs whose md5 coin lands 0 are the NEW
# batch, the rest are the already-indexed base corpus — the same portable
# construction as the eval sampling, so the whole assignment hash-checks.
_INC_COIN_PREFIX = "lshnew"
_INC_COIN_MOD = 4


def _inc_coin(col):
    from .data_selection import _md5_coin

    return _md5_coin(_INC_COIN_PREFIX, col, _INC_COIN_MOD) == 0


def _sql_inc_coin(col: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{_INC_COIN_PREFIX}|' || "
        f"CAST({col} AS VARCHAR)), 1, 8) AS BIGINT) % {_INC_COIN_MOD} = 0"
    )


_LSH_INCREMENTAL_ORACLE = f"""
WITH corpus AS ({_CORPUS_SQL}),
shingled AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id, {_SIGS_SQL}
  FROM (SELECT doc_id, unnest(shingles) AS sh FROM shingled) t
  GROUP BY doc_id
),
banded AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
bandkeys AS ({_BAND_UNION_SQL}),
cands AS (
  SELECT DISTINCT n.doc_id AS new_doc, b.doc_id AS base_doc
  FROM bandkeys n JOIN bandkeys b
    ON n.band_no = b.band_no AND n.band_key = b.band_key
  WHERE ({_sql_inc_coin('n.doc_id')}) AND NOT ({_sql_inc_coin('b.doc_id')})
),
verified AS (
  SELECT c.new_doc, c.base_doc
  FROM cands c
  JOIN shingled sa ON sa.doc_id = c.new_doc
  JOIN shingled sb ON sb.doc_id = c.base_doc
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
),
newdocs AS (SELECT doc_id AS new_doc FROM shingled WHERE ({_sql_inc_coin('doc_id')}))
SELECT nd.new_doc,
       COALESCE(MIN(v.base_doc), nd.new_doc) AS assigned_group,
       CAST(COUNT(v.base_doc) AS BIGINT) AS n_matches
FROM newdocs nd LEFT JOIN verified v ON v.new_doc = nd.new_doc
GROUP BY nd.new_doc
"""


@register(
    "dedup_lsh_incremental",
    oracle=_LSH_INCREMENTAL_ORACLE,
    tags=("dedup", "incremental"),
)
def dedup_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental FUZZY dedup: assign a NEW batch of documents to the
    near-dup groups of an already-indexed base corpus — the production
    shape of continuous-ingest dedup (the exact-match version is
    ``dedup_incremental``; this is its MinHash/LSH analog, completing
    the round-10 index-maintenance family with ``sim_ivf_refresh`` and
    the persisted text index).

    The corpus splits by a content-addressed md5 coin into base (the
    standing index) and new (the arriving batch). Candidates come ONLY
    from new-batch band keys equi-joined against base band keys — never
    new×new or base×base, so a batch of b docs against a corpus of N
    costs O(b·collisions), not O((N+b)²) — then exact-Jaccard verify.
    One row per new doc: ``assigned_group`` = the lowest verified base
    doc_id (the group representative) or the doc's own id when nothing
    matches (it founds a new group), plus the verified match count.

    At 100 TB the base band keys are a persisted table (exactly
    ``_band_keys``'s output — 4 rows of 16 bytes per doc, bucketable by
    band_key) and the batch side is tiny: the join broadcasts the batch,
    the corpus is never rescanned per batch, and signature hashing is
    paid only for new docs. Here both sides derive from one corpus so
    the whole assignment — split, banding, candidates, verify, grouping
    — hash-checks against the DuckDB oracle."""
    sh = _shingled(_dup_corpus(spark, sf_dir))
    return lsh_assign(
        new_sh=sh.filter(_inc_coin(F.col("doc_id"))),
        base_index=lsh_base_index(sh.filter(~_inc_coin(F.col("doc_id")))),
    )


def _shingle_set_key(shingles) -> F.Column:
    """Canonical md5 of a shingle SET — the verbatim-collapse class key
    for the LSH family: banding and Jaccard depend ONLY on the shingle
    set, so docs sharing this key have identical band keys and identical
    jaccard to every other document. Length-prefixed concatenation of
    the sorted array is injective (no separator-ambiguity for shingles
    that could contain any separator byte)."""
    enc = F.transform(
        F.array_sort(shingles),
        lambda x: F.concat(F.length(x).cast("string"), F.lit(":"), x),
    )
    return F.md5(F.concat_ws("", enc))


def lsh_base_index(base_sh: DataFrame) -> DataFrame:
    """The persistable incremental-dedup index over a shingled base
    corpus: one row per DISTINCT shingle set — (brep = min member
    doc_id, bcnt = member count, shingles). This is what a deployment
    maintains as a table (and what the streaming twin pins once): an
    arriving batch is assigned against O(distinct texts) rows, so clone
    mass in the corpus never multiplies per-batch work."""
    keyed = base_sh.select(
        "doc_id", "shingles", _shingle_set_key(F.col("shingles")).alias("skey")
    )
    return keyed.groupBy("skey").agg(
        F.min("doc_id").alias("brep"),
        F.count(F.lit(1)).alias("bcnt"),
        # any member's array serves: identical skey ⟺ identical set, and
        # every consumer (banding, array_intersect) is order-invariant
        F.first("shingles").alias("shingles"),
    )


def lsh_assign(new_sh: DataFrame, base_index: DataFrame) -> DataFrame:
    """Assign NEW shingled docs to the near-dup groups of an indexed BASE
    corpus: one row per new doc (new_doc, assigned_group, n_matches).
    Shared by the registered ``dedup_lsh_incremental`` and the streaming
    twin (``streaming/fuzzy.py``).

    VERBATIM-COLLAPSE ON BOTH SIDES (the ``dedup_minhash_groups``
    argument, exact here because the banded candidate join has no
    doc-frequency cap): docs with identical shingle sets have identical
    MinHash signatures, band keys, and jaccard to everything, so
    (a, b) is a verified match iff (rep(a), rep(b)) is. The band join,
    the verify, and the per-class match stats therefore run over
    DISTINCT shingle sets only — O(new classes × base-class collisions),
    never multiplied by clone counts on either side (the pre-collapse
    shape ran 148 s at the sf10 probe purely on clone-collision mass) —
    and the result expands back exactly: assigned_group = the lowest
    verified base doc_id = min over matched base classes of their min
    member (class minima ARE the index's brep ids); n_matches = Σ bcnt
    over matched classes (a matched class matches in full)."""
    nkeyed = new_sh.select(
        "doc_id", "shingles", _shingle_set_key(F.col("shingles")).alias("skey")
    )
    nclasses = nkeyed.groupBy("skey").agg(
        F.min("doc_id").alias("nrep"), F.first("shingles").alias("shingles")
    )
    nrep_sh = nclasses.select(F.col("nrep").alias("doc_id"), "shingles")
    brep_sh = base_index.select(F.col("brep").alias("doc_id"), "shingles")
    cands = (
        _band_keys(nrep_sh)
        .alias("n")
        .join(
            _band_keys(brep_sh).alias("b"),
            (F.col("n.band_no") == F.col("b.band_no"))
            & (F.col("n.band_key") == F.col("b.band_key")),
        )
        .select(F.col("n.doc_id").alias("nrep"), F.col("b.doc_id").alias("brep"))
        .distinct()
    )
    sa = nrep_sh.select(F.col("doc_id").alias("nrep"), F.col("shingles").alias("sh_a"))
    sb = brep_sh.select(F.col("doc_id").alias("brep"), F.col("shingles").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = common.cast("double") / (F.size("sh_a") + F.size("sh_b") - common)
    verified = (
        cands.join(sa, "nrep")
        .join(sb, "brep")
        .filter(jac >= 0.5)
        .select("nrep", "brep")
    )
    stats = (
        verified.join(base_index.select("brep", "bcnt"), "brep")
        .groupBy("nrep")
        .agg(F.min("brep").alias("m"), F.sum("bcnt").alias("nm"))
    )
    return (
        nkeyed.select("doc_id", "skey")
        .join(nclasses.select("skey", "nrep"), "skey")
        .join(stats, "nrep", "left")
        .select(
            F.col("doc_id").alias("new_doc"),
            F.coalesce(F.col("m"), F.col("doc_id")).alias("assigned_group"),
            F.coalesce(F.col("nm"), F.lit(0)).cast("long").alias("n_matches"),
        )
    )


# --- SimHash (rows-only: hex→int not expressible in the oracle dialect) --------------

_SIM_BITS = 60
_CHUNK_BITS = 15

# DuckDB mirror of the full simhash pipeline. The token hash is the low 60
# bits of md5 (15 hex chars -> int via '0x' cast / conv(,16,10)) so both
# engines compute identical hashes; bit sums, chunk packing, banded
# candidate join and hamming verify are plain integer SQL.
_SIM_BITSUMS = ",\n         ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(_SIM_BITS)
)
_SIM_CHUNKS = ",\n       ".join(
    " + ".join(
        f"CASE WHEN b{c * _CHUNK_BITS + j} > 0 THEN CAST({2**j} AS BIGINT)"
        f" ELSE 0 END"
        for j in range(_CHUNK_BITS)
    )
    + f" AS chunk{c}"
    for c in range(4)
)
_SIM_FULL = " + ".join(
    f"chunk{c} * CAST({2 ** (c * _CHUNK_BITS)} AS BIGINT)" for c in range(4)
)
_SIMHASH_ORACLE = f"""
WITH corpus AS ({_CORPUS_SQL}),
tokens AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM corpus
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(w), 1, {_SIM_BITS // 4}) AS BIGINT) AS h
  FROM tokens
),
bits AS (
  SELECT doc_id,
         {_SIM_BITSUMS}
  FROM hashed GROUP BY doc_id
),
sim AS (
  SELECT doc_id,
       {_SIM_CHUNKS}
  FROM bits
),
sim2 AS (
  SELECT doc_id, {_SIM_FULL} AS simhash, chunk0, chunk1, chunk2, chunk3
  FROM sim
),
ck AS (
  SELECT doc_id, simhash, cno, cval FROM (
    SELECT doc_id, simhash, 0 AS cno, chunk0 AS cval FROM sim2
    UNION ALL SELECT doc_id, simhash, 1, chunk1 FROM sim2
    UNION ALL SELECT doc_id, simhash, 2, chunk2 FROM sim2
    UNION ALL SELECT doc_id, simhash, 3, chunk3 FROM sim2) u
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM ck a JOIN ck b
    ON a.cno = b.cno AND a.cval = b.cval AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""


@register("dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("dedup", "northstar"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit simhash per doc, candidates from 15-bit
    chunk collisions, verified by exact hamming distance ≤ 3.

    Banding guarantee (pigeonhole): 4 chunks collide on ≥1 chunk for any
    pair with hamming ≤ 3; beyond that recall decays — so the verify
    threshold matches the guarantee instead of over-promising.

    Oracle-checked since round 2: the token hash is the low 60 bits of
    md5 (DuckDB: CAST('0x'||hex AS BIGINT); Spark: conv(hex,16,10)), so
    bit sums, chunk packing, banding and hamming verify all mirror into
    SQL. tests/test_northstar.py additionally asserts exact-dup pairs at
    hamming 0. Scale shape identical to MinHash banding: equi-join on
    chunk values.
    """
    corpus = _dup_corpus(spark, sf_dir)
    ws = F.split(F.trim(F.col("text")), " ")
    # ONE md5 per token occurrence (explode → hash → 60 cheap bit-sum
    # aggregates); 15 hex chars = 60 bits < 2^63, so conv→long is exact.
    tokens = corpus.select("doc_id", F.explode(ws).alias("w"))
    h = F.conv(F.substring(F.md5(F.col("w")), 1, _SIM_BITS // 4), 16, 10).cast(
        "long"
    )
    hashed = tokens.select("doc_id", h.alias("h"))
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"b{j}")
            for j in range(_SIM_BITS)
        ]
    )

    # 4 chunks of 15 bits each + the full simhash value
    def _chunk(c):
        return sum(
            F.when(F.col(f"b{c * _CHUNK_BITS + j}") > 0, F.lit(2**j).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for j in range(_CHUNK_BITS)
        )

    # Materialize the per-doc simhash table ONCE (r12): the chunk-key
    # self-join references this subtree on BOTH sides, and at runtime the
    # token-explode + md5 + 60-aggregate pipeline executed twice (3.26 →
    # 2.68 s measured at sf0.1 with the checkpoint). The pinned state is
    # one row per document (doc_id + 5 ints ≈ 48 B) — this IS the simhash
    # index a dedup service would persist; MEMORY_AND_DISK per the
    # data-sized-checkpoint rule (r13: via materialize() — conf-gated
    # reliable checkpoint for cluster fault tolerance).
    sim = materialize(bit_sums.select(
        "doc_id",
        *[_chunk(c).alias(f"chunk{c}") for c in range(4)],
    ).withColumn(
        "simhash",
        sum(
            F.col(f"chunk{c}") * F.lit(2 ** (c * _CHUNK_BITS)).cast("long")
            for c in range(4)
        ),
    ))
    ck = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("cno"), F.col(f"chunk{c}").alias("cval"))
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", "ck.cno", "ck.cval")
    a, b = ck.alias("a"), ck.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.cno") == F.col("b.cno"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


# --- embedding cosine near-dup ---------------------------------------------------------

_EMB_CORPUS_SQL = f"""
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_DUP_OFFSET} AS vec_id, label, embedding FROM embeddings
"""

_EMB_ORACLE = f"""
WITH corpus AS ({_EMB_CORPUS_SQL}),
q AS (
  SELECT vec_id, label,
         {sql_quantize('embedding')} AS qv
  FROM corpus
),
n AS (
  SELECT vec_id, label, qv, {sql_dot('qv', 'qv')} AS n2 FROM q
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {sql_cosine(sql_dot('a.qv', 'b.qv'), 'a.n2', 'b.n2')} AS cos_sim
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE a.n2 > 0 AND b.n2 > 0
  AND {sql_cosine(sql_dot('a.qv', 'b.qv'), 'a.n2', 'b.n2')} >= 0.95
"""


# Per-task tile edge for the label-blocked pair matmul: a label block of
# k vectors is split into ⌈k/_EMB_TILE⌉ rank-contiguous tiles and the
# exact all-pairs scoring fans out over tile PAIRS, so one task computes
# at most a _EMB_TILE × _EMB_TILE matmul no matter how large a block
# grows. The total O(k²) work of exact all-pairs semantics is unchanged —
# it is DISTRIBUTED instead of concentrated in one quadratic straggler
# task per label (the sf1 scale probe caught the old shape at 31× cost
# for 10× data: 10 fixed labels → 10 tasks, each 100× the work). 1024 is
# the sf10-measured sweet spot between fan-out shuffle volume (rows are
# replicated ⌈k/T⌉ times) and per-task matmul size: 116 s vs 177 s for
# both 512 and 2048 at 40k-row blocks.
_EMB_TILE = 1024


@register("dedup_embedding_cosine", oracle=_EMB_ORACLE, tags=("dedup", "northstar"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: label-blocked pair scoring, fixed-point cosine
    ≥ 0.95. Blocking by label keeps the pair count linear-ish; at 100 TB
    the label becomes an LSH/IVF bucket (see similarity.ann_lsh) — the
    join shape is identical.

    Scale shape: within a label, rows are rank-tiled by vec_id
    (_EMB_TILE per tile) and every tile PAIR (ta ≤ tb) becomes one
    applyInPandas group scoring a bounded Ta×Tb integer matmul — the pair
    set and the arithmetic are bit-identical to the single-block form
    (same quantization, same int64 dots, same sqrt·sqrt division order),
    but per-task memory/work is capped by construction and the quadratic
    total parallelizes across the cluster. Row fan-out is ⌈k/T⌉ copies
    per row — O(k²/T) replicated rows, ≪ the O(k²) pair space."""
    e = load(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "label", "embedding").unionAll(
        e.select(
            (F.col("vec_id") + _DUP_OFFSET).alias("vec_id"), "label", "embedding"
        )
    )

    # Rank-contiguous tiles ordered by vec_id, so every row in tile ta has
    # a smaller vec_id than every row in tile tb > ta — the a<b pair
    # orientation is free. Each row joins group (ta, tb) once as side 'a'
    # (partners tb ≥ own tile) and once as side 'b' (partners ta ≤ own
    # tile); the diagonal group ta == tb sees each row on both sides and
    # keeps the strict upper triangle.
    w = Window.partitionBy("label").orderBy("vec_id")
    tiled = corpus.select(
        "vec_id",
        "label",
        "embedding",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(_EMB_TILE))
        .cast("int")
        .alias("tile"),
        (
            (F.count(F.lit(1)).over(Window.partitionBy("label")) - F.lit(1))
            / F.lit(_EMB_TILE)
        )
        .cast("int")
        .alias("last_tile"),
    )
    fan = tiled.select(
        "vec_id",
        "label",
        "embedding",
        F.col("tile").alias("ta"),
        F.explode(F.sequence(F.col("tile"), F.col("last_tile"))).alias("tb"),
        F.lit("a").alias("side"),
    ).unionAll(
        tiled.select(
            "vec_id",
            "label",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.col("tile"))).alias("ta"),
            F.col("tile").alias("tb"),
            F.lit("b").alias("side"),
        )
    )

    # Per-tile-pair scoring as ONE bounded integer matmul (applyInPandas
    # delivers the whole group): ~10× faster than per-pair array-lambda
    # dots, and bit-identical — quantization uses explicit round-half-away
    # (np.rint is banker's!) and the cosine divides by (sqrt·sqrt) in the
    # oracle's exact operation order. Self-contained closure (executor
    # workers can't import this package).
    def _make_tile_scorer():
        def pairs(pdf):
            import numpy as _np
            import pandas as _pd

            def prep(sub):
                ids = sub["vec_id"].to_numpy()
                m = _np.stack(sub["embedding"].map(_np.asarray).values).astype(
                    _np.float64
                )
                v = m * 1000000.0
                q = (_np.floor(_np.abs(v) + 0.5) * _np.sign(v)).astype(
                    _np.int64
                )
                n2 = (q * q).sum(axis=1)  # exact int64 self-dots
                # zero-norm vectors (all |x| < 0.5/scale) would make 0/0
                # NaN cosines with engine-divergent `>=` semantics;
                # exclude them (mirrored by the oracle's n2 > 0).
                nz = n2 > 0
                return ids[nz], q[nz], n2[nz].astype(_np.float64)

            empty = _pd.DataFrame(
                {
                    "vec_a": _np.array([], dtype=_np.int64),
                    "vec_b": _np.array([], dtype=_np.int64),
                    "cos_sim": _np.array([], dtype=_np.float64),
                }
            )
            ids_a, qa, n2a = prep(pdf[pdf["side"] == "a"])
            ids_b, qb, n2b = prep(pdf[pdf["side"] == "b"])
            if not len(ids_a) or not len(ids_b):
                return empty
            dots = qa @ qb.T  # exact int64
            cos = dots / (_np.sqrt(n2a)[:, None] * _np.sqrt(n2b)[None, :])
            # strict a<b keeps the upper triangle on the diagonal group
            # and is vacuously true off-diagonal (tiles ranked by vec_id)
            keep = (ids_a[:, None] < ids_b[None, :]) & (cos >= 0.95)
            ia, ib = _np.nonzero(keep)
            return _pd.DataFrame(
                {
                    "vec_a": ids_a[ia],
                    "vec_b": ids_b[ib],
                    "cos_sim": cos[ia, ib],
                }
            )

        return pairs

    return fan.groupBy("label", "ta", "tb").applyInPandas(
        _make_tile_scorer(), "vec_a LONG, vec_b LONG, cos_sim DOUBLE"
    )


# Connected components ARE SQL-expressible for the oracle: a recursive CTE
# computes each node's reachable set over the (tiny per-component) pair
# graph; component = min over {node} ∪ reachable. Exponential-closure cost
# is fine at oracle scale — the distributed engine uses star contraction.
# CTE chain shared with the cluster-representative oracle below.
_CC_CTES = f"""{_JACCARD_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jpairs
),
reach(node, m) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.m
),
comp AS (
  SELECT node, LEAST(node, MIN(m)) AS component FROM reach GROUP BY node
)"""

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_CC_CTES}
SELECT node AS doc_id, component,
       CAST(CASE WHEN node = component THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
FROM comp
"""


@register("dedup_components", oracle=_COMPONENTS_ORACLE, tags=("dedup", "northstar"))
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the Jaccard pair graph
    via alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the step that turns
    pairwise similarity into an actionable keep/drop list.

    Oracle-checked since round 2 (recursive-CTE closure in DuckDB; the
    invariants pytest remains). Scale shape: unlike min-label propagation
    (round-1 design — up to 16 full edge-list shuffle joins, the slowest
    query in BENCH_r01), star contraction REWIRES edges toward component
    minima each round, so the edge set collapses toward stars and rounds
    needed ≈ log(diameter). Near-dup graphs (tiny cliques) converge in
    2–3 rounds of joins over a shrinking edge set.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    cc = _star_contraction(pairs)
    return cc.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).cast("int").alias("is_keeper"),
    )


def _star_contraction(pairs: DataFrame) -> DataFrame:
    """Alternating large-star / small-star contraction over a
    ``(doc_a, doc_b)`` pair frame → one ``(doc_id, component)`` row per
    node that has at least one edge (component = the node-id minimum).
    Shared by ``dedup_components`` (exact-Jaccard graph) and
    ``dedup_minhash_groups`` (MinHash-LSH graph); the convergence and
    scale arguments live on ``dedup_components``."""
    # Materialize the canonical (u < v) edge list ONCE (r13: via
    # materialize() — conf-gated reliable checkpoint; lineage truncation
    # so each round's work is done exactly once is unchanged).
    edges = materialize(
        pairs.select(
            F.least("doc_a", "doc_b").alias("u"),
            F.greatest("doc_a", "doc_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct(),
        storage=None,
    )
    converged = False
    for _ in range(10):  # rounds ≈ log(diameter); near-dup graphs need 2-3
        # Large-star: each node u connects its LARGER neighbors to
        # m = min(N(u) ∪ {u}); long chains halve every round.
        sym = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("minv"), F.col("u")).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            # no distinct here: duplicate (u,v) rows cannot change the
            # small-star min(small) below, and new_edges dedupes at the
            # end of the round — dropping it saves one exchange per round
        )
        # Small-star: each node points its SMALLER neighbors (and itself)
        # at their minimum — flattens shallow trees into stars.
        d = ls.select(F.col("v").alias("big"), F.col("u").alias("small"))
        sml = d.groupBy("big").agg(F.min("small").alias("m"))
        e_leaves = (
            d.join(sml, "big")
            .where(F.col("small") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("small").alias("v"))
        )
        e_centers = sml.select(F.col("m").alias("u"), F.col("big").alias("v"))
        new_edges = materialize(
            e_leaves.unionAll(e_centers).distinct(), storage=None
        )
        edges = new_edges
        # Convergence test (r12): the fixpoints of alternating large-/
        # small-star contraction are exactly the star forests rooted at
        # component minima, and canonical (u < v) star-forest edges are
        # recognizable DIRECTLY — every node appears either only as a
        # root (u) or as a member (v) of exactly one root. The previous
        # test compared order-free signatures of consecutive edge sets,
        # which by construction runs one full contraction round (3
        # shuffles + checkpoint) PAST convergence just to watch the
        # signature repeat; this one small aggregate over the
        # just-checkpointed edges (one job, one exchange of 2|E| pre-
        # combined rows) stops in the round that converges. Violations:
        # a node that is both root and member, or a member with two
        # roots.
        roles = new_edges.select(
            F.col("u").alias("node"), F.lit(1).alias("as_u"), F.lit(0).alias("as_v")
        ).unionAll(
            new_edges.select(
                F.col("v").alias("node"), F.lit(0).alias("as_u"), F.lit(1).alias("as_v")
            )
        )
        non_star = (
            roles.groupBy("node")
            .agg(F.sum("as_u").alias("nu"), F.sum("as_v").alias("nv"))
            .filter((F.col("nv") > 1) | ((F.col("nu") > 0) & (F.col("nv") > 0)))
            .limit(1)
            .count()
        )
        if non_star == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            "star contraction did not converge within the round bound; "
            "raise the bound for graphs with larger component diameters"
        )
    # Converged edge set = stars (u = component min, v = member).
    members = edges.select(
        F.col("v").alias("doc_id"), F.col("u").alias("component")
    )
    centers = (
        edges.select("u").distinct().select(
            F.col("u").alias("doc_id"), F.col("u").alias("component")
        )
    )
    return members.unionAll(centers)


# --- canonical-representative selection per duplicate cluster ----------------

_CLUSTER_BEST_ORACLE = f"""
WITH RECURSIVE {_CC_CTES},
scored AS (
  SELECT c.node AS doc_id, c.component,
         CAST(len(string_split(trim(t.text), ' ')) AS BIGINT) AS n_tokens
  FROM comp c JOIN corpus t ON t.doc_id = c.node
),
best AS (
  SELECT component,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(MAX(n_tokens) AS BIGINT) AS best_tokens,
         CAST(SUM(n_tokens) AS BIGINT) AS tot
  FROM scored GROUP BY component
)
SELECT b.component,
       CAST(MIN(s.doc_id) AS BIGINT) AS keep_id,
       b.n_members, b.best_tokens,
       CAST(b.tot - b.best_tokens AS BIGINT) AS dropped_tokens
FROM best b
JOIN scored s ON s.component = b.component AND s.n_tokens = b.best_tokens
GROUP BY b.component, b.n_members, b.best_tokens, b.tot
"""


@register("dedup_cluster_best", oracle=_CLUSTER_BEST_ORACLE, tags=("dedup", "northstar"))
def dedup_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: the step AFTER clustering that
    real curation pipelines run — keep the highest-quality member of each
    near-dup cluster (longest doc; ties → lowest doc_id), not an arbitrary
    one. Composes ``dedup_components`` (star-contraction CC over the exact
    Jaccard pair graph) with a per-doc token count and reports, per
    cluster: the keeper, member count, and tokens that deduplication
    discards.

    Determinism: the keeper is argmax(tokens, then min doc_id), realised
    as one lexicographic struct-max ``max(struct(n_tokens, -doc_id))`` —
    a single map-side-combinable aggregate, no window, no tie ambiguity.

    Scale shape: CC output is O(duplicated docs), token counts are a
    map-only projection of the corpus; one equi-join + one hash aggregate
    on the component key. Nothing is driver-side; the corpus text never
    moves — only (doc_id, n_tokens) pairs shuffle."""
    comp = dedup_components(spark, sf_dir).select("doc_id", "component")
    toks = _dup_corpus(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    scored = comp.join(toks, "doc_id")
    best = scored.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        # ONE lexicographic struct-max carries both outputs: w.n_tokens IS
        # max(n_tokens) (it is the leading struct field), so keep_id and
        # best_tokens can never disagree about which row won.
        F.max(
            F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("w"),
        F.sum("n_tokens").alias("tot"),
    )
    return best.select(
        "component",
        (-F.col("w.neg_id")).alias("keep_id"),
        "n_members",
        F.col("w.n_tokens").alias("best_tokens"),
        (F.col("tot") - F.col("w.n_tokens")).alias("dropped_tokens"),
    )


# --- group-emitting MinHash dedup (the linear-output production route) --------

_MINHASH_GROUPS_ORACLE = f"""
WITH RECURSIVE {_MINHASH_CTES},
jm AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jm
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jm
),
reach(node, m) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.m
),
comp AS (
  SELECT node, LEAST(node, MIN(m)) AS component FROM reach GROUP BY node
),
sized AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS group_size
  FROM comp GROUP BY component
)
SELECT c.node AS doc_id, c.component AS group_id, s.group_size,
       CAST(CASE WHEN c.node = c.component THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
FROM comp c JOIN sized s ON s.component = c.component
"""


@register("dedup_minhash_groups", oracle=_MINHASH_GROUPS_ORACLE, tags=("dedup", "northstar"))
def dedup_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup with GROUP output — the production default at
    scale: LSH candidates → exact-Jaccard verify (≥ 0.5) → star-contraction
    connected components → one ``(doc_id, group_id, group_size,
    is_keeper)`` row per duplicated document.

    Why this exists alongside ``dedup_minhash_lsh``: the pair-emitting
    form's OUTPUT grows ~quadratically in per-document clone count (the
    sf10 probe measured ~100× for 100× rows on the replica corpus — true
    pair-set growth, not plan decay), while the group form emits one row
    per member: O(duplicated docs), linear by construction. A curation
    pipeline acts on keep/drop lists, not pair lists, so the linear form
    is what actually runs at 100 TB; the pair form remains the
    measurement/debug surface (``dedup_lsh_eval``).

    VERBATIM-COLLAPSE — the step that ALSO makes the intermediate work
    linear, not just the output (the first shape of this query verified
    the full candidate pair set and still ran 68× at sf10): exact-dedup
    runs before fuzzy-dedup. Documents are collapsed into text-equality
    classes (md5(text)); identical text ⇒ identical shingle SET ⇒
    identical MinHash signatures, band keys, and Jaccard to every other
    document — so the LSH + verify + CC pipeline runs over one
    representative per class (node id = the class's min doc_id), and the
    result expands back through the class table. Equivalence to the
    full-graph oracle is exact, not approximate:

    - clones of a ≥3-token doc always collide (identical band keys) and
      verify at jaccard 1, so a class of size ≥ 2 is a clique in the
      full graph — represented by its node's own component when the rep
      has no cross-class edge (``selfc`` below), by the rep's component
      otherwise;
    - a cross-class edge (a, b) exists in the full graph iff the edge
      between their reps exists (same shingle arrays ⇒ same candidate
      collision and the same verified jaccard);
    - star contraction labels each component by its minimum node id, and
      node ids are class minima, so the expanded component id is the
      global min doc_id — exactly the oracle's ``LEAST(node, MIN(m))``;
    - <3-token docs have no shingle row, hence no signatures and no
      edges in the full graph: the ``sh`` semi-join keeps their classes
      out of ``selfc`` too.

    Scale shape: the class collapse is one map-side md5 + one hash agg;
    candidate generation is the shared banded equi-join over DISTINCT
    texts (never all-pairs, and clone count no longer multiplies the
    candidate set — the replica corpus collapses ~clone_factor×);
    verification touches rep-level candidate pairs only; the CC fixpoint
    is the same log(diameter)-round star contraction as
    ``dedup_components``; the expansion is one equi-join back to
    O(duplicated docs) rows + one hash aggregate for group sizes."""
    corpus = _dup_corpus(spark, sf_dir)
    keyed = corpus.select("doc_id", F.md5(F.col("text")).alias("tkey"))
    # Materialize the class table ONCE (r12): `classes` is referenced by
    # the rep semi-join, the self-clique gate AND the member expansion —
    # left lazy, each reference re-scanned the corpus and re-ran the md5
    # class aggregate (the captured plan carried the corpus subtree 4×).
    # One row per DISTINCT text (tkey, node, csize) — the exact-dedup
    # class table a curation pipeline persists anyway.
    classes = materialize(keyed.groupBy("tkey").agg(
        F.min("doc_id").alias("node"), F.count(F.lit(1)).alias("csize")
    ))
    # The explicit repartition is a PLANNER-BUG GUARD, found by the sf100
    # probe (and reproducible at sf0.001 under autoBroadcastJoinThreshold
    # =-1): the optimizer pushes this semi-join into _dup_corpus's UNION
    # branches, each branch comes out hash-partitioned(doc_id, P), and
    # Spark 4.1 then treats the 2P-partition union as satisfying the
    # downstream shingle aggregate's doc_id distribution — skipping the
    # required exchange and crashing the sort-merge zip with "Can't zip
    # RDDs with unequal numbers of partitions: List(P, 2P)" (had it
    # executed, same-key groups split across the two concatenated halves
    # would have DUPLICATED aggregate rows). One explicit exchange of the
    # tiny rep frame (O(distinct texts)) restores a sound partitioning;
    # the aggregate reuses it, so no net exchange is added.
    reps = corpus.join(
        classes.select(F.col("node").alias("doc_id")), "doc_id", "left_semi"
    ).repartition("doc_id")
    # shared-frame checkpoint (r12): banding + both verify sides reference
    # the rep-level shingle table (O(distinct texts) rows — the collapsed
    # class-shingle table the LSH index persists); one compute + reads
    # (same measured rationale as _lsh_eval_df).
    sh = materialize(_shingled(reps))
    pairs = (
        _candidate_jaccard(_lsh_candidates(sh), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    cc = _star_contraction(pairs).select(
        F.col("doc_id").alias("node"), "component"
    )
    # classes of >= 2 shingled clones are cliques even when their rep has
    # no cross-class edge: they form their own component, rooted at the
    # node (= the class min, = the component min).
    # "the rep IS shingled" ⟺ its text has ≥ 3 tokens (_shingled's only
    # filter), so the gate is the map-only token-count predicate on the
    # rep rows — the former semi-join against `sh` re-derived the whole
    # shingle collect_set aggregate a second time (the checkpointed CC
    # already consumed it once) just to answer this membership test
    # (r12 optimization; guide §1.2 "don't compute things you throw
    # away").
    tok3 = reps.filter(F.size(F.split(F.trim(F.col("text")), " ")) >= 3).select(
        F.col("doc_id").alias("node")
    )
    selfc = (
        classes.filter(F.col("csize") >= 2)
        .join(tok3, "node", "left_semi")
        .join(cc, "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    node_comp = cc.unionByName(selfc)
    members = (
        keyed.join(classes.select("tkey", "node"), "tkey")
        .join(node_comp, "node")
        .select("doc_id", "component")
    )
    sizes = members.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return members.join(sizes, "component").select(
        "doc_id",
        F.col("component").alias("group_id"),
        "group_size",
        (F.col("doc_id") == F.col("component")).cast("int").alias("is_keeper"),
    )


# --- blocked fuzzy string matching (edit distance) ---------------------------

_LEV_ORACLE = """
WITH names AS (SELECT n_nationkey, n_name FROM nation),
typos AS (
  SELECT n_nationkey AS typo_key,
         substr(n_name, 1, 1) || substr(n_name, 3) AS typo
  FROM names
)
SELECT t.typo, n.n_name AS matched, t.typo_key, n.n_nationkey AS matched_key,
       levenshtein(t.typo, n.n_name) AS dist
FROM typos t JOIN names n
  ON substr(t.typo, 1, 1) = substr(n.n_name, 1, 1)
 AND abs(len(t.typo) - len(n.n_name)) <= 2
WHERE levenshtein(t.typo, n.n_name) <= 2
ORDER BY t.typo, matched
"""


@register("fuzzy_levenshtein_match", oracle=_LEV_ORACLE, tags=("dedup", "fuzzy"))
def fuzzy_levenshtein_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching by edit distance — entity-resolution /
    dirty-dimension repair (each nation name matched against its
    second-character-deleted typo). The join is BLOCKED (same first
    character + length band ≤ 2) before levenshtein runs, so the
    quadratic distance computation only touches candidate pairs inside a
    block — the standard shape for fuzzy joins at scale, where blocking
    keys (prefix, soundex, length band, LSH bucket) bound the pair count
    and the expensive metric runs post-join. levenshtein() is classic
    Wagner-Fischer in both engines — integer, deterministic."""
    names = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    typos = names.select(
        F.col("n_nationkey").alias("typo_key"),
        F.concat(
            F.substring("n_name", 1, 1), F.expr("substr(n_name, 3)")
        ).alias("typo"),
    )
    joined = typos.join(
        names,
        (F.substring("typo", 1, 1) == F.substring("n_name", 1, 1))
        & (
            F.abs(F.length("typo") - F.length("n_name")) <= 2
        ),
    )
    return (
        joined.withColumn("dist", F.levenshtein("typo", "n_name"))
        .filter(F.col("dist") <= 2)
        .select(
            "typo",
            F.col("n_name").alias("matched"),
            "typo_key",
            F.col("n_nationkey").alias("matched_key"),
            "dist",
        )
        .orderBy("typo", "matched")
    )


# --- SemDeDup: k-means-cluster-blocked embedding dedup ---------------------------

# Fixed-point perturbation on dimension 0 (+0.01 at the 1e6 quantization
# scale): every 10th duplicated vector becomes a NEAR-dup instead of an
# exact copy, so the verify threshold is exercised from both sides.
_SEM_PERTURB = 10_000

_SEM_CORPUS_SQL = f"""
  SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings
  UNION ALL
  SELECT vec_id + {_DUP_OFFSET} AS vec_id,
         CASE WHEN vec_id % 10 = 0
              THEN [qv[1] + {_SEM_PERTURB}] || qv[2:]
              ELSE qv END AS qv
  FROM (SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings) b
"""

_SEM_COS = sql_cosine(sql_dot("a.qv", "b.qv"), "a.n2", "b.n2")

# Hard per-task memory guard: a cluster larger than this is re-split into
# equal sub-blocks (deterministic: ROW_NUMBER over md5(vec_id) — HASH
# order, not id order, so correlated id ranges [e.g. original vs +offset
# duplicate ids] are not systematically separated), so one applyInPandas
# group never materializes more than _SEM_MAX_BLOCK vectors no matter how
# skewed the clustering gets. Pairs across sub-blocks of one oversized
# cluster are skipped — the same bounded-approximation contract SemDeDup
# already makes for pairs across clusters. With auto-k keeping
# E[cluster size] ≈ 512, splitting only fires on pathological skew.
_SEM_MAX_BLOCK = 4096

_SEMANTIC_ORACLE = f"""
WITH {sql_kmeans_assign(vecs_sql=_SEM_CORPUS_SQL, auto_k=True)},
n AS (
  SELECT vec_id, cluster, qv, {sql_dot('qv', 'qv')} AS n2,
         (ROW_NUMBER() OVER (PARTITION BY cluster
                             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1)
           // {_SEM_MAX_BLOCK} AS sub
  FROM assign{_KM_ITERS}
)
SELECT a.cluster AS cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_SEM_COS} AS cos_sim
FROM n a JOIN n b ON b.cluster = a.cluster AND b.sub = a.sub
                 AND a.vec_id < b.vec_id
WHERE a.n2 > 0 AND b.n2 > 0 AND {_SEM_COS} >= 0.95
"""


@register("dedup_semantic", oracle=_SEMANTIC_ORACLE, tags=("dedup", "northstar"))
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic duplicates
    are searched only WITHIN k-means clusters of the embedding space —
    the cluster is the blocking key, pruning the pair space from O(N²)
    to O(N·B) with k = max(16, ceil(N/512)) growing linearly with the
    corpus (``kmeans_fit_assign(k="auto")``), so E[cluster size] stays
    ~512 at any N.

    Fully oracle-checked end to end: the deterministic integer Lloyd loop
    unrolls into SQL (``sql_kmeans_assign(auto_k=True)`` over the
    duplicated corpus — k is computed IN SQL from COUNT(*), tracking the
    Spark side at any scale), and the within-cluster cosine is the proven
    fixed-point formula from ``dedup_embedding_cosine`` (exact int64
    dot/norms; one IEEE sqrt·sqrt·divide in the oracle's operation order).

    Scale shape: assignment is a map-only Arrow pass against broadcast
    centroids; the pairwise stage is one integer matmul per
    (cluster, sub-block) via applyInPandas, HARD-bounded at
    ``_SEM_MAX_BLOCK`` vectors per task by deterministic rank re-splitting
    of skew-oversized clusters — the same bucket-bounded O(block²)
    contract as the LSH/label-blocked dedups, now enforced rather than
    assumed. No cross join; driver state is the k×dim centroid matrix
    (beyond ~1e8 vectors a production run would shard that into a
    two-level coarse quantizer — the per-task and per-pair bounds here
    are unchanged by that swap)."""
    e = load(spark, sf_dir, "embeddings")
    base = e.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    perturbed = F.concat(
        F.array(F.element_at("qv", 1) + F.lit(_SEM_PERTURB)),
        F.slice("qv", 2, _EMB_DIM - 1),
    )
    dup = base.select(
        (F.col("vec_id") + _DUP_OFFSET).alias("vec_id"),
        F.when(F.col("vec_id") % 10 == 0, perturbed)
        .otherwise(F.col("qv"))
        .alias("qv"),
    )
    vecs = base.unionAll(dup)
    # r13 measured dead end (guide §1.1): kmeans_fit_assign(full=True) —
    # the (vec_id, qv, cluster) frame straight off the persisted
    # assignment, dropping this join — read 0.92× (2.6 vs 2.4 s quiet
    # interleaved A/B): `clustered` has exactly ONE consumer here (the
    # applyInPandas scorer), so the bigger persist write (64-long qv per
    # row) costs more than the single join it saves. The IVF/hybrid
    # consumers, which read the fitted frame 3–6×, DO use full=True.
    assigned = kmeans_fit_assign(spark, sf_dir, k="auto", vecs=vecs)
    clustered = vecs.join(assigned, "vec_id")
    # deterministic re-split of skew-oversized clusters into sub-blocks
    # of ≤ _SEM_MAX_BLOCK vectors; ranked in md5(vec_id) HASH order so
    # correlated id ranges don't land in systematically different blocks
    sub_w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    clustered = clustered.withColumn(
        "sub",
        F.floor((F.row_number().over(sub_w) - 1) / _SEM_MAX_BLOCK),
    )

    # One exact-int64 matmul per cluster block (applyInPandas delivers the
    # whole group) — same scorer shape as dedup_embedding_cosine, minus
    # the quantization step (qv is already fixed-point).
    def _make_cluster_scorer():
        def pairs(pdf):
            import numpy as _np
            import pandas as _pd

            ids = pdf["vec_id"].to_numpy()
            q = _np.stack(pdf["qv"].map(_np.asarray).values).astype(_np.int64)
            dots = q @ q.T  # exact int64
            n2 = _np.diag(dots).astype(_np.float64)
            nz = n2 > 0
            ids, dots, n2 = ids[nz], dots[_np.ix_(nz, nz)], n2[nz]
            cos = dots / (_np.sqrt(n2)[:, None] * _np.sqrt(n2)[None, :])
            iu = _np.triu_indices(len(ids), k=1)
            a, b, c = ids[iu[0]], ids[iu[1]], cos[iu]
            lo, hi = _np.minimum(a, b), _np.maximum(a, b)
            keep = c >= 0.95
            cl = int(pdf["cluster"].iloc[0]) if len(pdf) else 0
            return _pd.DataFrame(
                {
                    "cluster": _np.full(int(keep.sum()), cl, dtype=_np.int64),
                    "vec_a": lo[keep],
                    "vec_b": hi[keep],
                    "cos_sim": c[keep],
                }
            )

        return pairs

    return clustered.groupBy("cluster", "sub").applyInPandas(
        _make_cluster_scorer(),
        "cluster LONG, vec_a LONG, vec_b LONG, cos_sim DOUBLE",
    )


# --- span-level exact dedup: duplicated token windows across documents ------

# Substring-level duplication (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better", arXiv:2107.06499): whole-document dedup
# misses boilerplate PARAGRAPHS repeated across otherwise-distinct pages.
# The suffix-array approach there is replaced by the Spark-shaped
# equivalent: fingerprint every _SPAN_LEN-token window at _SPAN_STRIDE
# offsets (md5 of the joined tokens — portable across engines), then one
# hash aggregate finds fingerprints spanning ≥2 distinct documents.
# Stride = len/2 guarantees any duplicated run of ≥ 1.5·_SPAN_LEN tokens
# contains an aligned shared window in both copies.
_SPAN_LEN = 32
_SPAN_STRIDE = 16
_SPAN_TOPK = 100

_SPAN_ORACLE = f"""
WITH corpus AS ({_CORPUS_SQL}),
t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws,
         len(string_split(trim(text), ' ')) AS n
  FROM corpus
),
spans AS (
  SELECT doc_id,
         md5(array_to_string(ws[p + 1 : p + {_SPAN_LEN}], ' ')) AS fp
  FROM (
    SELECT doc_id, ws,
           unnest(range(0, n - {_SPAN_LEN} + 1, {_SPAN_STRIDE})) AS p
    FROM t WHERE n >= {_SPAN_LEN}
  )
),
dup AS (
  SELECT fp,
         COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occurrences,
         MIN(doc_id) AS first_doc,
         MAX(doc_id) AS last_doc
  FROM spans
  GROUP BY fp
  HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT fp, n_docs, n_occurrences, first_doc, last_doc
FROM dup
ORDER BY n_docs DESC, n_occurrences DESC, fp
LIMIT {_SPAN_TOPK}
"""


@register("dedup_span_exact", oracle=_SPAN_ORACLE, tags=("dedup", "llm"))
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup: 32-token windows (stride 16) repeated
    across ≥2 distinct documents — the boilerplate/paragraph duplication
    whole-document dedup cannot see (Lee et al. 2022's suffix-array
    substring dedup, re-expressed as window fingerprinting).

    Scale shape: the window explode is map-only with fan-out bounded at
    n/stride rows per doc (≈ 2 fingerprint rows per 32 tokens — strictly
    linear in corpus tokens, unlike a suffix array's global sort); one
    hash aggregate on the 16-byte fingerprint (map-side combine) finds
    cross-document spans; the top-k is TakeOrderedAndProject over the
    already-aggregated duplicate set only. No joins, no windows over raw
    data, nothing global but the final k rows.

    Corpus: the family's standard in-query dup corpus (full copies +
    10% tail-perturbed) — copies share every aligned window, perturbed
    copies share all but the last, so span-level hits exist by
    construction and hash-compare exactly."""
    d = _dup_corpus(spark, sf_dir)
    t = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("ws"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n"),
    ).filter(F.col("n") >= _SPAN_LEN)
    spans = t.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0, n - {_SPAN_LEN}, {_SPAN_STRIDE})")
        ).alias("p"),
        "ws",
    ).select(
        "doc_id",
        F.md5(
            F.array_join(F.expr(f"slice(ws, p + 1, {_SPAN_LEN})"), " ")
        ).alias("fp"),
    )
    dup = (
        spans.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return (
        dup.orderBy(
            F.col("n_docs").desc(),
            F.col("n_occurrences").desc(),
            F.col("fp").asc(),
        )
        .limit(_SPAN_TOPK)
        .select("fp", "n_docs", "n_occurrences", "first_doc", "last_doc")
    )
