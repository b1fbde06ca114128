"""Domain extraction — the one UDF the REFERENCE's own logic requires
(SURVEY.md A26; the engine's north-star extensions add further UDF
surfaces: grouped-agg, mapInPandas, stateful — see COVERAGE.md).

The reference uses ``tldextract`` (public-suffix-list lookup,
/root/reference/ranking_urls_generator.py:150-154), which is not
expressible as a regex. This module implements the PSL algorithm
(https://publicsuffix.org/list/) over a vendored static snapshot
(``psl_snapshot.dat``, same format as the upstream list — a full list is a
drop-in replacement): exact rules, ``*.`` wildcard rules, ``!`` exception
rules, prevailing-longest-match, implicit ``*`` default. If ``tldextract``
is importable it is preferred for bit-parity with the reference.

Implemented as an Arrow-batched pandas UDF — at 100 TB this runs
vectorized per batch, not per row, and the rule sets ship to executors
by value inside the closure (no package import on workers).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover - container has no tldextract
    import tldextract

    _EXTRACTOR = tldextract.TLDExtract(suffix_list_urls=())
except Exception:  # noqa: BLE001
    _EXTRACTOR = None

_PSL_PATH = os.path.join(os.path.dirname(__file__), "psl_snapshot.dat")


def _parse_psl(path: str = _PSL_PATH):
    """Parse a publicsuffix.org-format file → (rules, wildcards,
    exceptions) per section; wildcard entries store the PARENT labels
    ('*.ck' → 'ck'), exceptions store the matched tail ('!www.ck' →
    'www.ck')."""
    icann = (set(), set(), set())
    private = (set(), set(), set())
    bucket = icann
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("//"):
                if "BEGIN PRIVATE DOMAINS" in line:
                    bucket = private
                elif "BEGIN ICANN DOMAINS" in line:
                    bucket = icann
                continue
            rules, wilds, excs = bucket
            if line.startswith("!"):
                excs.add(line[1:])
            elif line.startswith("*."):
                wilds.add(line[2:])
            else:
                rules.add(line)
    return icann, private


_ICANN, _PRIVATE = _parse_psl()


def _suffix_len(labels: list[str], rules, wilds, excs) -> int:
    """Label count of the public suffix per the PSL algorithm."""
    n = len(labels)
    for i in range(n):  # exception rules prevail over everything
        if ".".join(labels[i:]) in excs:
            return n - i - 1
    best = 1  # implicit default rule '*'
    for i in range(n):
        tail = ".".join(labels[i:])
        if tail in rules:
            best = max(best, n - i)
        if i + 1 < n and ".".join(labels[i + 1 :]) in wilds:
            best = max(best, n - i)
    return best


def registered_domain_py(host: str | None, include_private: bool = False):
    """Pure-Python PSL lookup (driver-side twin of the UDF; used by
    tests). Returns None for empty hosts or hosts that ARE a public
    suffix (e.g. 'co.uk', 'anything.ck').

    ``include_private`` defaults to False — matching the reference, whose
    ``tldextract.extract()`` calls (/root/reference/ranking_urls_generator.py:151)
    use tldextract's default ``include_psl_private_domains=False``; e.g.
    'foo.github.io' → 'github.io' by default here and there."""
    if not host:
        return None
    labels = host.lower().rstrip(".").split(".")
    if len(labels) < 2 or any(not x for x in labels):
        return None
    rules, wilds, excs = (set(), set(), set())
    for sec in (_ICANN, _PRIVATE) if include_private else (_ICANN,):
        rules |= sec[0]
        wilds |= sec[1]
        excs |= sec[2]
    slen = _suffix_len(labels, rules, wilds, excs)
    if len(labels) <= slen:
        return None
    return ".".join(labels[len(labels) - slen - 1 :])


_UDF_CACHE: dict[str, object] = {}


def registered_domain_udf(host: Column, include_private: bool = False) -> Column:
    """Arrow-batched pandas UDF (created lazily — pandas_udf needs an
    active SparkSession to parse its return type). ``include_private``
    defaults to False for bit-parity with the reference's
    ``tldextract.extract()`` defaults (see ``registered_domain_py``).

    The worker function is a SELF-CONTAINED closure: executor Python
    workers cannot import this package (driver-owned sessions run from an
    arbitrary cwd), so nothing worker-side may reference module globals —
    only stdlib and by-value captured data (the frozen rule sets)."""
    key = f"rd:{include_private}"
    if key not in _UDF_CACHE:
        use_tld = _EXTRACTOR is not None
        sections = (_ICANN, _PRIVATE) if include_private else (_ICANN,)
        rules = frozenset().union(*(s[0] for s in sections))
        wilds = frozenset().union(*(s[1] for s in sections))
        excs = frozenset().union(*(s[2] for s in sections))

        def _batch(hosts: pd.Series) -> pd.Series:
            if use_tld:  # pragma: no cover — tldextract not in container
                import tldextract as _t

                ex = _t.TLDExtract(
                    suffix_list_urls=(),
                    include_psl_private_domains=include_private,
                )

                def one(h):
                    if not h:
                        return None
                    return ex(h.lower().rstrip(".")).registered_domain or None

            else:

                def one(h):
                    if not h:
                        return None
                    labels = h.lower().rstrip(".").split(".")
                    if len(labels) < 2 or any(not x for x in labels):
                        return None
                    n = len(labels)
                    for i in range(n):  # exceptions prevail
                        if ".".join(labels[i:]) in excs:
                            slen = n - i - 1
                            break
                    else:
                        slen = 1
                        for i in range(n):
                            if ".".join(labels[i:]) in rules:
                                slen = max(slen, n - i)
                            if i + 1 < n and ".".join(labels[i + 1 :]) in wilds:
                                slen = max(slen, n - i)
                    if n <= slen:
                        return None
                    return ".".join(labels[n - slen - 1 :])

            return hosts.map(one)

        _UDF_CACHE[key] = pandas_udf(_batch, "string")
    return _UDF_CACHE[key](host)


def subdomain_of(host: Column, registered: Column) -> Column:
    """Subdomain part, NULL when absent or 'www' — the reference's
    nullable-subdomain rule (/root/reference/rankings_generator.py:165-167).

    Computed by LENGTH arithmetic, not regex: interpolating the registered
    domain into a pattern would treat its dots as wildcards (regex
    injection) — 'blogxcasino.org' must not match '.casino.org'."""
    is_suffix = (host == registered) | host.endswith(
        F.concat(F.lit("."), registered)
    )
    sub = F.when(
        is_suffix & (F.length(host) > F.length(registered)),
        F.substring(
            host, F.lit(1), F.length(host) - F.length(registered) - F.lit(1)
        ),
    ).otherwise(F.lit(""))
    return F.when((sub == "") | (sub == "www"), F.lit(None)).otherwise(sub)
