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
