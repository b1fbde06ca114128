"""Domain extraction — the one UDF the REFERENCE's own logic requires
(SURVEY.md A26; the engine's north-star extensions add further UDF
surfaces: grouped-agg, mapInPandas, stateful — see COVERAGE.md).

The reference uses ``tldextract`` (public-suffix-list lookup,
/root/reference/ranking_urls_generator.py:150-154) which is not expressible
as a regex. ``tldextract`` is not installed in this container, so the UDF is
import-gated: with the library present it does the real PSL parse; without
it, a deterministic two-label heuristic covers the common gTLD cases and a
short built-in list of two-level suffixes (co.uk etc.).

Implemented as an Arrow-batched pandas UDF — at 100 TB this runs
vectorized per batch, not per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover - container has no tldextract
    import tldextract

    _EXTRACTOR = tldextract.TLDExtract(suffix_list_urls=())
except Exception:  # noqa: BLE001
    _EXTRACTOR = None

_TWO_LEVEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za",
}


_UDF_CACHE: dict[str, object] = {}


def registered_domain_udf(host: Column) -> Column:
    """Arrow-batched pandas UDF (created lazily — pandas_udf needs an
    active SparkSession to parse its return type).

    The worker function is a SELF-CONTAINED closure: executor Python
    workers cannot import this package (driver-owned sessions run from an
    arbitrary cwd), so nothing worker-side may reference module globals —
    only stdlib and by-value captured data (the suffix set)."""
    if "rd" not in _UDF_CACHE:
        two_level = frozenset(_TWO_LEVEL_SUFFIXES)
        use_tld = _EXTRACTOR is not None

        def _batch(hosts: pd.Series) -> pd.Series:
            if use_tld:  # pragma: no cover — tldextract not in container
                import tldextract as _t

                ex = _t.TLDExtract(suffix_list_urls=())

                def one(h):
                    if not h:
                        return None
                    return ex(h.lower().rstrip(".")).registered_domain or None

            else:

                def one(h):
                    if not h:
                        return None
                    labels = h.lower().rstrip(".").split(".")
                    if len(labels) < 2:
                        return None
                    if len(labels) >= 3 and ".".join(labels[-2:]) in two_level:
                        return ".".join(labels[-3:])
                    return ".".join(labels[-2:])

            return hosts.map(one)

        _UDF_CACHE["rd"] = pandas_udf(_batch, "string")
    return _UDF_CACHE["rd"](host)


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
