"""URL canonicalization for crawl-corpus dedup — the normalization
step before URL-keyed exact dedup / frontier dedup in a web pipeline
(Common Crawl URLs arrive in dozens of trivially-different spellings).
Extension surface; the reference engine has no URL tier.

Everything here is PURE Catalyst expressions (``try_parse_url``, array
ops) — whole-stage codegen, zero Python, zero shuffles: exactly the
kind of row-local normalization that must stay JVM-side when it runs
over 100 TB of crawl records.

Canonical form:

- scheme and host lowercased; a leading ``www.`` dropped
- default ports stripped (``:80`` http, ``:443`` https)
- path kept verbatim except a single trailing ``/`` dropped
  (empty path → ``/`` is NOT added: ``http://a`` and ``http://a/``
  normalize to the same string)
- query parameters: tracking params dropped (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``ref``, ``mc_eid``), the rest SORTED —
  param order never changes content
- fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_eid)="


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col) -> Column:
    """Lowercased host, ``www.`` and default ports stripped."""
    host = F.lower(F.try_parse_url(_c(col), F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain(col, ccsl: tuple[str, ...] = ("co", "com", "org", "net",
                                             "ac", "gov", "edu")) -> Column:
    """Registrable-domain approximation: the last two host labels, or
    the last three when the second-level label is a common country-code
    second level (``example.co.uk`` → ``example.co.uk``). A full public
    -suffix list is a data file, not an algorithm; ``ccsl`` covers the
    overwhelming bulk of crawl traffic and is caller-extensible."""
    labels = F.split(url_host(col), r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take3 = (n >= F.lit(3)) & second.isin(*ccsl)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(
        F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), "."
    )
    return F.when(n <= 1, F.element_at(labels, 1)).otherwise(
        F.when(take3, last3).otherwise(last2)
    )


def canonicalize_url(col) -> Column:
    """Canonical URL string per the module contract; null/unparseable
    hosts → null (filter before keying a dedup on it)."""
    c = _c(col)
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    host = url_host(c)
    port_raw = F.regexp_extract(
        F.try_parse_url(c, F.lit("AUTHORITY")), r":(\d+)$", 1
    )
    default_port = (
        ((scheme == "http") & (port_raw == "80"))
        | ((scheme == "https") & (port_raw == "443"))
        | (port_raw == "")
    )
    port = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port_raw)
    )
    path = F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/$", "")
    query = F.try_parse_url(c, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        query.isNull() | (F.size(kept) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    return F.when(
        scheme.isNull() | host.isNull() | (host == ""), F.lit(None)
    ).otherwise(F.concat(scheme, F.lit("://"), host, port, path, qpart))
