"""URL canonicalization for web-corpus curation (beyond-reference
operator family: URL-keyed dedup precedes content-level dedup in every
public web-pipeline description — near-zero cost, removes exact
re-crawls).

All pure column expressions (JVM-side, codegen'd): regex component
extraction, tracking-parameter removal, parameter sorting via
``array_sort``, scheme-aware default-port stripping. No UDFs, so the
normalize stage is map-only and fuses with the scan.

Scope note: ``registered_domain`` is the naive last-two-labels rule —
a real deployment feeds the Public Suffix List as a broadcast lookup
(co.uk-style suffixes); the seam is the same column-in/column-out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters dropped during normalization (public convention:
# the utm_* family plus the common click-id params).
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid|igshid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
# Anchored so a '?' inside the fragment can never be promoted to a
# query string ([^#?]* cannot skip past the first real '?'): the query
# is everything after the FIRST '?' that precedes any '#'.
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host: userinfo and port stripped unconditionally here;
    :func:`normalize_url` re-applies non-default ports."""
    hostport = F.regexp_extract(url, _HOSTPORT_RE, 1)
    no_user = F.regexp_replace(hostport, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d+$", ""))


def url_port(url: Column) -> Column:
    hostport = F.regexp_extract(url, _HOSTPORT_RE, 1)
    return F.regexp_extract(hostport, r":(\d+)$", 1)


def url_path(url: Column) -> Column:
    """Path with trailing slashes collapsed; bare host → '/'."""
    raw = F.regexp_extract(url, _PATH_RE, 1)
    stripped = F.regexp_replace(raw, r"/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def url_query_params(url: Column) -> Column:
    """Query parameters as a sorted array, tracking params removed."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.split(q, "&")
    kept = F.filter(
        parts,
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_sort(kept)


def registered_domain(host: Column) -> Column:
    """Naive eTLD+1 (last two labels) — see module docstring."""
    return F.regexp_extract(host, r"([^.\s]+\.[^.\s]+)$", 1)


def normalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme/host, userinfo dropped, default
    port stripped (80/http, 443/https; other ports kept), trailing-slash
    path collapse, fragment dropped, tracking params removed, remaining
    params sorted. Deterministic and pure — safe as a dedup key."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    params = url_query_params(url)
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), hostport, url_path(url), query)


def url_key(url: Column) -> Column:
    """sha256 of the canonical URL — fixed-width dedup/join key so the
    shuffle carries 32 bytes instead of arbitrary-length strings."""
    return F.sha2(normalize_url(url), 256)
