"""URL parsing / canonicalization for crawl-derived training corpora.

The curation steps before URL-keyed dedup and per-domain rebalancing:
extract host/path, strip `www.`, reduce to a registered-domain
heuristic, and canonicalize away query strings + fragments (tracking
params are the classic source of spurious URL-level duplicates).

Everything is JVM regexp over the RE2 ∩ java.util.regex syntax subset
(character classes, bounded repeats, alternation — no lookaround), so
the DuckDB oracle runs the byte-identical patterns; pure per-row
projections, zero shuffle, scales linearly.

Registered-domain note: without a public-suffix list (not in the
container, and a 10k-line data file is not the point of the exercise)
the heuristic is "last two dot-labels" — right for .com/.org/.net
style TLDs, wrong for co.uk-style two-level public suffixes;
documented limitation, same in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with the DuckDB oracle (suite/corpus.py) — keep in sync.
URL_HOST_REGEX = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
URL_PATH_REGEX = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
URL_SCHEME_REGEX = "^([a-z][a-z0-9+.-]*)://"
WWW_PREFIX_REGEX = "^www\\."
REGISTERED_DOMAIN_REGEX = "([a-z0-9-]+\\.[a-z]+)$"


def url_scheme(url: Column) -> Column:
    return F.regexp_extract(url, URL_SCHEME_REGEX, 1)


def url_host(url: Column) -> Column:
    """Authority component (host[:port]); '' when the value does not
    parse as a URL."""
    return F.regexp_extract(url, URL_HOST_REGEX, 1)


def strip_www(host: Column) -> Column:
    return F.regexp_replace(host, WWW_PREFIX_REGEX, "")


def registered_domain(host: Column) -> Column:
    """Last-two-labels heuristic (see module docstring)."""
    return F.regexp_extract(strip_www(host), REGISTERED_DOMAIN_REGEX, 1)


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, URL_PATH_REGEX, 1)


def path_depth(path: Column) -> Column:
    """Number of non-empty path segments."""
    return F.size(F.filter(F.split(path, "/"), lambda s: s != "")).cast("bigint")


def canonical_url(url: Column) -> Column:
    """Dedup key: scheme://host-without-www/path, query string and
    fragment dropped, trailing slash trimmed (but '/' kept for a bare
    root path). Collapses utm_*/session-id variants of one page into a
    single key — run exact dedup on this, not on the raw URL."""
    path = F.regexp_replace(url_path(url), "/+$", "")
    return F.concat(url_scheme(url), F.lit("://"), strip_www(url_host(url)), path)
