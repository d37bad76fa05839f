from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.urlops import (
    canonical_url,
    registered_domain,
    url_dedup,
    url_host,
    with_canonical_url,
    with_url_domain,
)


def _canon(spark, *urls: str | None) -> list[str | None]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


CASES = [
    # scheme+host lowered, path case kept
    ("HTTP://Example.COM/Path/To", "http://example.com/Path/To"),
    # default ports dropped, non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),  # 80 is NOT https default
    # fragment stripped
    ("http://ex.com/a#frag", "http://ex.com/a"),
    ("http://ex.com/a?x=1#frag", "http://ex.com/a?x=1"),
    # trailing slash runs collapse; bare authority keeps none
    ("http://ex.com/a/", "http://ex.com/a"),
    ("http://ex.com/a///", "http://ex.com/a"),
    ("http://ex.com/", "http://ex.com"),
    ("http://ex.com", "http://ex.com"),
    # tracking params dropped, rest sorted bytewise
    ("http://ex.com/a?utm_source=x&b=2&a=1", "http://ex.com/a?a=1&b=2"),
    ("http://ex.com/a?b=2&a=1&fbclid=zzz&gclid=1", "http://ex.com/a?a=1&b=2"),
    ("http://ex.com/a?ref=tw&x=1", "http://ex.com/a?x=1"),
    # refresh is NOT in the tracking set (exact match only, not prefix)
    ("http://ex.com/a?refresh=1", "http://ex.com/a?refresh=1"),
    # all params tracking -> no '?'
    ("http://ex.com/a?utm_campaign=c&utm_medium=m", "http://ex.com/a"),
    # empty params dropped; '&&' tolerated
    ("http://ex.com/a?&&x=1&", "http://ex.com/a?x=1"),
    # query values keep case and '='-less params survive
    ("http://ex.com/a?Key=Val&flag", "http://ex.com/a?Key=Val&flag"),
    # whitespace trimmed
    ("  http://ex.com/a  ", "http://ex.com/a"),
    # no authority: trimmed + fragment-stripped only
    ("mailto:Bob@Example.com", "mailto:Bob@Example.com"),
    ("not a url#x", "not a url"),
    ("", ""),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_cases(spark, raw, want):
    assert _canon(spark, raw) == [want]


def test_null_passthrough(spark):
    assert _canon(spark, None) == [None]


def test_idempotent(spark):
    raws = [r for r, _ in CASES]
    once = _canon(spark, *raws)
    twice = _canon(spark, *once)
    assert once == twice


def test_idempotent_fuzz(spark):
    # seeded fuzz over URL-shaped strings: canonicalization must be a
    # projection (canon(canon(x)) == canon(x)) for ANY input, including
    # degenerate ones — one Spark batch for all examples
    import random

    rng = random.Random(42)
    frags = [
        "http://", "HTTPS://", "hTtP://", "EX.com", "ex.COM", ":80", ":443",
        ":8080", "/", "//", "/A/b", "?", "&", "=", "#frag", "utm_x=1", "a=1",
        "b", "ref=t", "refresh=2", "fbclid", "%20", "..", "@", " ", "é", "Ã",
    ]
    raws = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 8))) for _ in range(400)]
    once = _canon(spark, *raws)
    twice = _canon(spark, *once)
    assert once == twice


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTP://Ex.com/a?utm_source=s&k=1"),
            (2, "http://ex.com/a/?k=1"),
            (3, "http://ex.com/a?k=1#top"),
            (4, "http://ex.com/b"),
            (5, "http://ex.com/b"),
        ],
        "doc_id bigint, url string",
    )
    got = {r["url_canon"]: r for r in url_dedup(df).collect()}
    a = got["http://ex.com/a?k=1"]
    assert (a["keep_id"], a["n_rows"], a["n_spellings"]) == (1, 3, 3)
    b = got["http://ex.com/b"]
    assert (b["keep_id"], b["n_rows"], b["n_spellings"]) == (4, 2, 1)


def test_url_dedup_null_urls_never_group(spark):
    # unknown URLs are not duplicates of each other: NULL-url rows are
    # excluded from the dedup result entirely (callers keep them)
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "http://ex.com/a")],
        "doc_id bigint, url string",
    )
    got = url_dedup(df).collect()
    assert len(got) == 1 and got[0]["url_canon"] == "http://ex.com/a"


HOST_CASES = [
    ("HTTP://WWW.Example.COM/path?q=1", "www.example.com", "example.com"),
    ("https://a.b.Example.co.uk:8443/x", "a.b.example.co.uk", "example.co.uk"),
    ("http://user:pw@Sub.Site.ORG:80/", "sub.site.org", "site.org"),
    ("https://example.com", "example.com", "example.com"),
    ("http://co.uk/odd", "co.uk", "co.uk"),  # bare suffix passes through
    ("http://localhost:9000/x", "localhost", "localhost"),
    ("http://deep.x.y.example.com.au/", "deep.x.y.example.com.au", "example.com.au"),
    ("mailto:bob@example.com", "", ""),  # no authority
    ("not a url", "", ""),
]


@pytest.mark.parametrize("raw,host,dom", HOST_CASES)
def test_host_and_domain(spark, raw, host, dom):
    df = spark.createDataFrame([(raw,)], "url string")
    r = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
    ).collect()[0]
    assert (r["h"], r["d"]) == (host, dom)


def test_with_url_domain_columns(spark):
    df = spark.createDataFrame(
        [(1, "http://www.a.co.uk/x"), (2, None)], "doc_id bigint, url string"
    )
    out = {r["doc_id"]: r for r in with_url_domain(df).collect()}
    assert (out[1]["host"], out[1]["domain"]) == ("www.a.co.uk", "a.co.uk")
    assert (out[2]["host"], out[2]["domain"]) == (None, None)


def test_with_canonical_keeps_rows(spark):
    df = spark.createDataFrame(
        [(1, "http://ex.com/x"), (2, None)], "doc_id bigint, url string"
    )
    out = with_canonical_url(df).orderBy("doc_id").collect()
    assert [r["url_canon"] for r in out] == ["http://ex.com/x", None]


# --- URL admission (SSRF gate, static subset) --------------------------------


def test_admit_url_truth_table():
    """Every authored case (synth.URL_ADMISSION_CASES) matches the kernel —
    the ladder order (metadata → loopback → link-local → multicast →
    reserved → private) decides the reason, exactly as the reference
    checks it (validators.py:260-340)."""
    from sparkdoc.synth import URL_ADMISSION_CASES
    from sparkdoc.urlops import admit_url

    for url, ips, want_admit, want_reason in URL_ADMISSION_CASES:
        admitted, reason = admit_url(url, ips)
        assert (int(admitted), reason) == (want_admit, want_reason), (url, ips)


def test_admit_url_any_unsafe_sibling_rejects():
    """One safe record must not vouch for an unsafe sibling
    (handlers.py:238-241)."""
    from sparkdoc.urlops import admit_url

    safe = ["93.184.216.34", "2606:4700::1111"]
    assert admit_url("http://x.example/", safe) == (True, None)
    for bad, reason in [("10.1.2.3", "private"), ("127.0.0.1", "loopback"),
                        ("169.254.169.254", "metadata_endpoint")]:
        admitted, r = admit_url("http://x.example/", safe + [bad])
        assert not admitted and r == reason


def test_url_admission_dataframe(spark):
    from sparkdoc.synth import URL_ADMISSION_CASES, url_admission_cases_df
    from sparkdoc.urlops import url_admission

    out = url_admission(url_admission_cases_df(spark), ips_col="resolved_ips")
    got = {r.case_id: (r.admitted, r.reject_reason) for r in out.collect()}
    for i, (_u, _ips, a, reason) in enumerate(URL_ADMISSION_CASES):
        assert got[i] == (bool(a), reason), i
    # url-only variant (no ips column)
    out2 = url_admission(url_admission_cases_df(spark).drop("resolved_ips"))
    got2 = {r.case_id: r.admitted for r in out2.collect()}
    # cases whose verdict depends ONLY on the url agree; ip-list rejects
    # become admits without the resolver column
    for i, (u, ips, a, _r) in enumerate(URL_ADMISSION_CASES):
        if not ips:
            assert got2[i] == bool(a), i


def test_admit_url_inet_aton_spellings():
    """Octal/hex/integer/short IPv4 spellings connect without DNS — the
    ladder must see them as addresses (SSRF filter bypass, review fix)."""
    from sparkdoc.urlops import admit_url

    for u in ["http://0177.0.0.1/", "http://2130706433/", "http://127.1/",
              "http://0x7f.0.0.1/"]:
        admitted, reason = admit_url(u)
        assert not admitted and reason == "loopback", u
    assert admit_url("http://0xA9FEA9FE/") == (False, "metadata_endpoint")
    assert admit_url("http://192.168.1/") == (False, "private")
    # octal public address still admits; real hostnames unaffected
    assert admit_url("http://01.02.03.04/") == (True, None)
    assert admit_url("http://example.com/") == (True, None)
    assert admit_url("http://1e2.example/") == (True, None)
