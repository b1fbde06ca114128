"""Property-based tests (hypothesis) — SURVEY.md §5's property tier.

Pattern: hypothesis generates a BATCH of adversarial inputs, one Spark job
evaluates the column expression over the whole batch, and each result is
checked against a plain-Python reference implementation. (One example per
Spark job would be unusably slow; batch-per-property keeps it honest AND
fast.)"""

from __future__ import annotations

import re as _re

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from olap_db_spark.functions.urls import url_bone
from olap_db_spark.sources.readers import repair_array_literal

# printable, no quotes/backslashes (the reference's category strings are
# Faker words — SURVEY.md §7.3 item 7 scopes out embedded quotes)
_WORD = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
    ),
    min_size=0,
    max_size=12,
)


def _py_url_bone(url: str) -> str:
    out = _re.sub(r"^https?://(www\.)?", "", url, flags=_re.IGNORECASE)
    return _re.sub(r"/$", "", out)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(
                ["https://www.", "https://", "http://www.", "http://",
                 "HTTPS://WWW.", "HtTp://", ""]
            ),
            _WORD,
            st.sampled_from(["", "/", "/x/y", "/x/y/"]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_url_bone_matches_python_reference(spark, batch):
    urls = [f"{scheme}{host}.org{path}" for scheme, host, path in batch]
    df = spark.createDataFrame([(u,) for u in urls], "u STRING").select(
        "u", url_bone(F.col("u")).alias("b")
    )
    got = {r["u"]: r["b"] for r in df.collect()}
    for u in urls:
        assert got[u] == _py_url_bone(u), u


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=0, max_size=5), min_size=1, max_size=30))
def test_array_literal_roundtrip(spark, lists):
    # Python-repr list-of-str → repair → original list (the A23 CSV repair)
    reprs = [repr(xs) for xs in lists]
    df = spark.createDataFrame([(s,) for s in reprs], "s STRING").select(
        "s", repair_array_literal(F.col("s")).alias("a")
    )
    got = {r["s"]: r["a"] for r in df.collect()}
    for xs in lists:
        assert got[repr(xs)] == xs, repr(xs)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=200,
    )
)
def test_fixed_sum_order_independent(spark, values):
    """fixed_sum must equal the exact cents total regardless of row order
    and partitioning — the property the whole oracle strategy rests on."""
    import math

    from olap_db_spark.operators._determinism import fixed_sum

    # half-AWAY rounding like Spark/DuckDB (python round() is banker's)
    expected = (
        sum(int(math.floor(abs(v * 100) + 0.5)) * (1 if v >= 0 else -1) for v in values)
        / 100.0
    )
    for n_part in (1, 7):
        df = spark.createDataFrame(
            [(v,) for v in values], "v DOUBLE"
        ).repartition(n_part)
        got = df.agg(fixed_sum(F.col("v"), 100).alias("s")).collect()[0]["s"]
        assert got == expected, (n_part, got, expected)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=500),  # token counts per doc
        min_size=1,
        max_size=80,
    )
)
def test_pack_prefix_sum_matches_python(spark, counts):
    """The partition-safe two-level cumsum must equal the plain prefix
    sum for ANY token distribution (including zero-token docs and doc_ids
    crossing bucket boundaries)."""
    from pyspark.sql.window import Window

    from olap_db_spark.operators.text_analysis import _PACK_BUCKET

    rows = [(i * 37, c) for i, c in enumerate(counts)]  # ids cross buckets
    df = spark.createDataFrame(rows, "doc_id LONG, n_tokens LONG")
    # reproduce the operator's two-level shape over an arbitrary frame
    toks = df.withColumn(
        "bucket", (F.col("doc_id") / _PACK_BUCKET).cast("long")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("t"))
        .withColumn("before", F.coalesce(F.sum("t").over(w_b), F.lit(0)))
        .select("bucket", "before")
    )
    got = {
        r["doc_id"]: r["local_before"] + r["before"]
        for r in local.join(offsets, "bucket").collect()
    }
    run = 0
    for doc_id, c in rows:
        assert got[doc_id] == run, (doc_id, got[doc_id], run)
        run += c


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-1_000_000, max_value=1_000_000),
            min_size=8,
            max_size=8,
        ),
        min_size=17,
        max_size=40,
    )
)
def test_pq_subspace_argmin_matches_numpy(spark, vecs):
    """The JVM-side per-subspace code assignment (exact int argmin with
    lowest-code ties) must match the numpy reference for arbitrary
    integer subvectors."""
    import numpy as np

    from olap_db_spark.operators.similarity import _pq_subd2
    from pyspark.sql.window import Window

    cb = vecs[:16]  # 16 codes
    cands = vecs[16:]
    cb_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cb)], "code LONG, cv ARRAY<LONG>"
    )
    v_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cands)], "vid LONG, v ARRAY<LONG>"
    )
    w = Window.partitionBy("vid").orderBy("d2", "code")
    got = {
        r["vid"]: r["code"]
        for r in v_df.crossJoin(cb_df)
        .withColumn("d2", _pq_subd2(F.col("v"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    C = np.array(cb, dtype=np.int64)
    for i, v in enumerate(cands):
        d = ((np.array(v, dtype=np.int64)[None, :] - C) ** 2).sum(axis=1)
        assert got[i] == int(np.argmin(d)), (i, got[i])
