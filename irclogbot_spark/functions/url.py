"""URL canonicalization — the dedup key every crawl-derived corpus
needs BEFORE content dedup: the same page arrives as
`HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#top` and
`http://example.com/a?a=1&b=2`, and a byte-level key treats them as
distinct documents. Canonicalizing first collapses them, which both
shrinks the content-dedup candidate space and enables URL-level
exact dedup/blocking (the Dolma/CCNet convention).

Rules (each one a pure JVM column op; the whole chain is one
codegen'd projection, RE2-safe so the DuckDB twin is
clause-identical):

1. drop the fragment (`#...` never reaches the server);
2. lowercase the scheme and the host (RFC 3986 §6.2.2.1 — case-
   insensitive components; path/query stay case-sensitive);
3. strip the scheme's default port (`:80` for http, `:443` for
   https);
4. empty path -> `/` (RFC 3986 §6.2.3);
5. drop tracking parameters (`utm_*`, `fbclid`, `gclid`) — they vary
   per referral, not per document;
6. sort the surviving query parameters (order is almost always
   semantically irrelevant; sorting makes the key total) and drop
   the `?` when none survive.

Supported shape: `scheme://host[:port][/path][?query][#fragment]`.
Inputs that don't look like that (no `://`) pass through lowercased
scheme-less — garbage in a `url` column should group as itself, not
throw.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking params dropped by rule 5 — the high-agreement core set;
#: extend per deployment
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules — one codegen'd
    expression, no UDF, no shuffle."""
    u = F.col(url) if isinstance(url, str) else url
    # 1. fragment off first (it may contain '?' or '/')
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?#]+)://", 1))
    after = F.regexp_replace(u, r"^[^:/?#]+://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    # 3. default ports by scheme
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            hostport.substr(F.lit(1), F.length(hostport) - 3),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            hostport.substr(F.lit(1), F.length(hostport) - 4),
        )
        .otherwise(hostport)
    )
    pathq = after.substr(F.length(hostport) + 1, F.lit(0x7FFFFFFF))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    # no '://' -> not the supported shape: lowercase passthrough
    return F.when(scheme == "", F.lower(u)).otherwise(canon)
