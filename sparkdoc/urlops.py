"""URL canonicalization and URL-keyed dedup for web-corpus curation.

Web crawls carry the same page under many URL spellings — mixed-case
scheme/host, default ports, fragments, tracking parameters, unordered query
strings, trailing slashes. Canonicalizing BEFORE content dedup removes the
cheap bulk of duplicates with a pure string transform (no shingling, no
joins), the standard first stage in CommonCrawl-derived pipelines (e.g.
CCNet, Wenzek et al. 2020 dedups per-URL before per-paragraph; RefinedWeb,
Penedo et al. 2023 §3.2 applies exactly this class of URL normalization).

The reference engine has no URL surface (its ingest is file/bytes —
core/input/handlers.py); this module is part of the training-data-pipeline
additions, alongside sparkdoc.filters and sparkdoc.dedup_text.

Canonical form (deterministic, engine-portable — every step is a regexp /
array expression with an exact DuckDB twin in __spark_entry__.oracle_sql):

  1. trim; strip the fragment (``#...`` — never sent to the server)
  2. lowercase the scheme and authority (host[:port]) ONLY — the path and
     query stay case-sensitive per RFC 3986 §6.2.2.1
  3. drop the default port (``:80`` for http, ``:443`` for https)
  4. collapse trailing ``/`` runs on the path (``/a/`` == ``/a``; a bare
     authority keeps no slash)
  5. drop tracking parameters: any ``utm_*`` plus the click-id set
     (fbclid, gclid, msclkid, mc_cid, mc_eid, igshid, ref) and empty params
  6. sort the surviving query parameters bytewise and rejoin with ``&``
     (parameter order is not semantic for the overwhelming majority of
     endpoints; sorting makes spelling order irrelevant)

Scale shape: whole-stage-codegen string/array exprs only — no UDF, no
shuffle for canonicalization; ``url_dedup`` adds exactly one hash shuffle
on the canonical key with a map-side-combined min/count agg (the same
window-free keep-min shape as dedup_text.exact_dedup).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# click-id / campaign parameters dropped outright (utm_* is prefix-matched)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref")


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column per the module contract. NULL in →
    NULL out; a value with no ``://`` authority is returned trimmed and
    fragment-stripped but otherwise untouched (no scheme to reason about)."""
    # trim AFTER the fragment strip too: removing '#...' can expose
    # whitespace that was mid-string at the first trim (idempotence fuzz)
    u = F.trim(F.regexp_replace(F.trim(col), "#.*$", ""))
    base = F.regexp_extract(u, "^([^?]*)", 1)
    query = F.when(u.contains("?"), F.regexp_replace(u, "^[^?]*\\?", "")).otherwise(F.lit(""))

    # scheme://authority , lowered; path untouched
    authority = F.lower(F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    path = F.regexp_replace(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    authority = F.regexp_replace(authority, "^(http://.*):80$", "$1")
    authority = F.regexp_replace(authority, "^(https://.*):443$", "$1")
    path = F.regexp_replace(path, "/+$", "")

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.regexp_extract(p, "^([^=]*)", 1).isin(*TRACKING_PARAMS),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        authority, path, F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit(""))
    )
    # no authority (mailto:, relative refs, garbage): leave the trimmed,
    # fragmentless spelling as-is rather than invent structure
    return F.when(authority == "", u).otherwise(canon)


#: multi-label public suffixes (PSL subset): when a host ends in one of
#: these, the registered domain keeps THREE labels, not two. The full
#: Mozilla Public Suffix List is thousands of entries; this embeds the
#: high-traffic country-code second-level suffixes — swap in the full list
#: as a broadcast table for production crawls.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "com.tr",
)


def url_host(col: Column) -> Column:
    """The lowercased host of a URL (no scheme, no port, no userinfo, no
    path). Empty string when the value has no ``://`` authority."""
    auth = F.lower(F.regexp_extract(col, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    no_user = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(no_user, ":[0-9]*$", "")


def registered_domain(host: Column) -> Column:
    """The registrable domain of a host: the last two labels, or the last
    THREE when the host ends in a two-level public suffix (so
    'a.b.example.co.uk' -> 'example.co.uk', 'www.example.com' ->
    'example.com'). Hosts with fewer labels pass through unchanged. Pure
    exprs: split + slice + array_join, no UDF."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    two_level = F.lit(False)
    for suf in TWO_LEVEL_SUFFIXES:
        two_level = two_level | host.endswith("." + suf) | (host == F.lit(suf))
    keep = F.when(two_level, F.lit(3)).otherwise(F.lit(2))
    return F.when(
        n <= keep, host
    ).otherwise(F.array_join(F.slice(labels, n - keep + 1, keep), "."))


def with_url_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``host`` and ``domain`` (registrable domain) — the grouping key
    for per-domain caps/rebalancing (filters.cap_per_group). Map-side only."""
    h = url_host(F.col(url_col))
    return df.withColumn("host", h).withColumn("domain", registered_domain(F.col("host")))


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_canon`` — the canonical form of ``df[url_col]``."""
    return df.withColumn("url_canon", canonical_url(F.col(url_col)))


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """One row per canonical URL: the keeper (min id — deterministic), the
    spelling count and distinct-spelling count. Exactly one shuffle on the
    canonical key; min/count combine map-side. Join back on ``keep_id`` to
    subset the corpus (the caller's join stays a cheap semi-join on the id).

    NULL-url rows are EXCLUDED from the result: an unknown URL is not a
    duplicate of other unknown URLs (same rule as the NULL-text exact-dup
    path) — callers keep those docs unconditionally."""
    return (
        with_canonical_url(df, url_col)
        .filter(F.col("url_canon").isNotNull())
        .groupBy("url_canon")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_rows"),
            F.count_distinct(url_col).alias("n_spellings"),
        )
    )


# --- URL admission (SSRF gate, static subset) --------------------------------
#
# Reference: URLValidator.validate + _validate_ip
# (core/input/validators.py:162-340) and the fetch-time re-check
# (core/input/handlers.py:212-260). The reference resolves EVERY A/AAAA
# record and rejects if ANY lands in a protected network ("one safe record
# must not vouch for an unsafe sibling"). A batch engine must not do DNS
# inside the DAG, so this operator applies the IDENTICAL per-address ladder
# to (a) IP-literal hostnames, and (b) an optional pre-resolved IP-list
# column produced by an ingest-side resolver — the gate logic itself never
# diverges from the reference's ordering:
#   cloud metadata endpoint → loopback → link-local → multicast → reserved
#   → private (checked LAST, exactly as the reference does — is_private is
#   also true for loopback/link-local, so order decides the reason string).

#: reject reasons, in the reference's check order
URL_REJECT_REASONS = (
    "bad_url", "bad_scheme", "no_host",
    "metadata_endpoint", "loopback", "link_local", "multicast", "reserved",
    "private",
)


def _ip_reason(ip_str: str):
    """One resolved address through the reference's ladder; None if safe."""
    import ipaddress

    try:
        ip = ipaddress.ip_address(ip_str)
    except ValueError:
        return "bad_url"
    if ip_str == "169.254.169.254":
        return "metadata_endpoint"
    if ip.is_loopback:
        return "loopback"
    if ip.is_link_local:
        return "link_local"
    if ip.is_multicast:
        return "multicast"
    if ip.is_reserved:
        return "reserved"
    if ip.is_private:
        return "private"
    return None


def _inet_aton_canonical(host: str):
    """Dotted-quad form of an inet_aton-style IPv4 literal, else None.

    Standard socket semantics accept octal (0177.0.0.1), hex (0x7f.0.0.1),
    plain-integer (2130706433) and short (127.1) spellings and connect with
    NO DNS resolution — so the admission ladder must see them as the
    addresses they are, or loopback/private targets slip through as
    'hostnames' (classic SSRF filter bypass)."""
    parts = host.split(".")
    if not 1 <= len(parts) <= 4 or host != host.strip():
        return None
    vals = []
    for p in parts:
        if not p:
            return None
        try:
            if p[:2].lower() == "0x":
                v = int(p, 16) if len(p) > 2 else None
            elif len(p) > 1 and p[0] == "0":
                v = int(p, 8)
            else:
                v = int(p, 10) if p.isdigit() else None
        except ValueError:
            return None
        if v is None:
            return None
        vals.append(v)
    # last part fills the remaining bytes (inet_aton rule)
    width = (5 - len(vals)) * 8
    if any(v > 255 for v in vals[:-1]) or vals[-1] >= (1 << width):
        return None
    n = 0
    for v in vals[:-1]:
        n = (n << 8) | v
    n = (n << width) | vals[-1]
    return f"{(n >> 24) & 255}.{(n >> 16) & 255}.{(n >> 8) & 255}.{n & 255}"


def admit_url(url: str, resolved_ips: list | None = None):
    """(admitted, reason) for one URL. reason is None when admitted.

    Checks, in reference order: parseable → scheme http/https → hostname
    present → if the hostname is an IP literal (INCLUDING inet_aton octal/
    hex/integer/short spellings, which fetchers resolve without DNS), the
    address ladder → every pre-resolved address (if given) through the same
    ladder."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit(url or "")
        host = parts.hostname
        _ = parts.port  # raises ValueError on malformed/out-of-range ports
    except ValueError:
        return False, "bad_url"
    if parts.scheme not in ("http", "https"):
        return False, "bad_scheme"
    if not parts.netloc or not host:
        return False, "no_host"
    # IP-literal hostname: the ladder applies with no resolver involved
    import ipaddress

    literal = host
    try:
        ipaddress.ip_address(host)
    except ValueError:
        literal = _inet_aton_canonical(host)
    if "[" in parts.netloc and literal is None:
        # bracketed hosts must be IP literals (RFC 3986); the reference's
        # resolver would fail on these
        return False, "bad_url"
    if literal is not None:
        r = _ip_reason(literal)
        if r:
            return False, r
    for ip in resolved_ips or []:
        r = _ip_reason(str(ip))
        if r:
            return False, r
    return True, None


def url_admission(
    df: DataFrame, url_col: str = "url", ips_col: str | None = None
) -> DataFrame:
    """Adds ``admitted`` (bool) + ``reject_reason`` (string, NULL when
    admitted) — Arrow-batched pandas UDF (stdlib urllib/ipaddress per value;
    no network, no DNS)."""
    from pyspark.sql.functions import pandas_udf

    if ips_col is None:

        @pandas_udf("string")
        def _gate(urls: pd.Series) -> pd.Series:
            return urls.map(lambda u: admit_url(u)[1] or "")
        out = df.withColumn("_r", _gate(F.col(url_col)))
    else:

        @pandas_udf("string")
        def _gate2(urls: pd.Series, ips: pd.Series) -> pd.Series:
            return pd.Series(
                [admit_url(u, list(i) if i is not None else None)[1] or ""
                 for u, i in zip(urls, ips)]
            )
        out = df.withColumn("_r", _gate2(F.col(url_col), F.col(ips_col)))
    return (
        out.withColumn("admitted", F.col("_r") == "")
        .withColumn("reject_reason", F.when(F.col("_r") != "", F.col("_r")))
        .drop("_r")
    )
