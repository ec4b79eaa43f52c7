"""URL canonicalization unit tests — edge cases beyond the synthesized
registry corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.functions import urls as U


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [
        r["c"] for r in df.select(U.normalize_url(F.col("url")).alias("c")).collect()
    ]


def test_normalize_edge_cases(spark):
    cases = {
        # default port + tracking + fragment + trailing slashes
        "HTTPS://WWW.X.COM:443/a/b//?utm_source=s&b=2&a=1#f":
            "https://www.x.com/a/b?a=1&b=2",
        # non-default port kept, userinfo dropped
        "http://u:p@host.org:8080/path": "http://host.org:8080/path",
        # bare host → '/', http default port stripped
        "HTTP://Host.NET:80": "http://host.net/",
        # IPv4 host, no port, empty query string
        "http://10.0.0.1/x?": "http://10.0.0.1/x",
        # all params are tracking → query dropped entirely
        "https://a.io/p?utm_a=1&gclid=2&fbclid=3": "https://a.io/p",
        # params already canonical stay put
        "https://a.io/p?a=1&b=2": "https://a.io/p?a=1&b=2",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values()), dict(zip(cases, got))


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://news.sub.example.co:9999/x",)], "url string"
    )
    row = df.select(
        U.url_host(F.col("url")).alias("h"),
        U.registered_domain(U.url_host(F.col("url"))).alias("d"),
    ).collect()[0]
    assert row["h"] == "news.sub.example.co"
    assert row["d"] == "example.co"  # naive eTLD+1, documented


def test_url_key_is_case_and_order_insensitive(spark):
    df = spark.createDataFrame(
        [
            ("HTTPS://A.IO/p?b=2&a=1",),
            ("https://a.io/p?a=1&b=2",),
        ],
        "url string",
    )
    keys = {r["k"] for r in df.select(U.url_key(F.col("url")).alias("k")).collect()}
    assert len(keys) == 1


def test_ipv6_and_odd_hosts_documented_behavior(spark):
    """IPv6 bracket hosts: the port-strip regex removes ':8080' but the
    bracket form is preserved as-is (lowercased); registered_domain
    yields '' for non-dotted hosts — documented naive-eTLD behavior,
    not silent corruption."""
    df = spark.createDataFrame(
        [("http://[2001:DB8::1]:8080/x",), ("http://localhost:9090/y",)],
        "url string",
    )
    rows = df.select(
        U.url_host(F.col("url")).alias("h"),
        U.registered_domain(U.url_host(F.col("url"))).alias("d"),
        U.normalize_url(F.col("url")).alias("c"),
    ).collect()
    ipv6, local = rows
    assert ipv6["h"] == "[2001:db8::1]"
    assert ipv6["d"] == ""            # bracket host: no eTLD+1
    assert ipv6["c"] == "http://[2001:db8::1]:8080/x"
    assert local["h"] == "localhost"
    assert local["d"] == ""           # single-label host: no eTLD+1
    assert local["c"] == "http://localhost:9090/y"


def test_fragment_question_mark_is_not_a_query(spark):
    """Regression: a '?' INSIDE the fragment must not be promoted to a
    query string — 'p#frag?x=1' and 'p?x=1' are different resources and
    must produce different dedup keys."""
    df = spark.createDataFrame(
        [
            ("http://a.com/p#frag?x=1",),
            ("http://a.com/p?x=1",),
        ],
        "url string",
    )
    canon = [r["c"] for r in df.select(U.normalize_url(F.col("url")).alias("c")).collect()]
    assert canon == ["http://a.com/p", "http://a.com/p?x=1"]
    keys = {r["k"] for r in df.select(U.url_key(F.col("url")).alias("k")).collect()}
    assert len(keys) == 2
