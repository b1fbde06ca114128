"""URL scalar functions — the reference's string-normalization semantics
re-expressed as pure column expressions (no UDFs; everything stays inside
whole-stage codegen).

Reference parity:
- ``url_bone``   — strip scheme/`www.`/one trailing slash, case-insensitive
  prefix match (/root/reference/rankings_generator.py:132-139,
  /root/reference/ranking_urls_generator.py:119-126)
- ``url_prefix`` — the regex extract at /root/reference/ranking_urls_ingestor.py:58
- ``strip_www``  — /root/reference/ranking_urls_generator.py:153-154
- ``registered_domain`` — tldextract-lite (/root/reference/ranking_urls_generator.py:150-154):
  a heuristic public-suffix parse as a column expression; the full
  public-suffix-list version would be the engine's one genuine UDF
  (SURVEY.md A26) and is provided in ``functions.domains``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Case-insensitive "https://www. | https:// | http://www. | http://" prefix.
URL_PREFIX_RE = r"^https?://(www\.)?"
# The capture used by the reference's pandas `.str.extract` (A21).
URL_PREFIX_EXTRACT_RE = r"(https?://(?:www\.)?)"


def url_bone(url: Column) -> Column:
    """Scheme-, www.- and trailing-slash-free URL skeleton."""
    return F.regexp_replace(
        F.regexp_replace(url, "(?i)" + URL_PREFIX_RE, ""), "/$", ""
    )


def url_prefix(url: Column) -> Column:
    """The scheme+www prefix itself (empty string when absent)."""
    return F.regexp_extract(url, URL_PREFIX_EXTRACT_RE, 1)


def strip_www(host: Column) -> Column:
    return F.regexp_replace(host, r"^www\.", "")


def host_of(url: Column) -> Column:
    """Hostname: everything between scheme and first '/'."""
    return F.regexp_extract(url, r"^https?://([^/]+)", 1)
