"""Unit tests for URL normalization and domain analytics
(aces_spark/datapipe/urls.py) — hand-checked normalization cases."""

from __future__ import annotations

from aces_spark.datapipe.urls import domain_stats, normalize_urls

CASES = [
    # (raw, expected_norm, expected_domain)
    (
        "HTTP://WWW.Example.COM:80/Path/1?utm_source=a&id=7&utm_campaign=b#frag",
        "http://www.example.com/Path/1?id=7",
        "www.example.com",
    ),
    (
        "https://Shop.Site.COM:443/item?gclid=g1",
        "https://shop.site.com/item",
        "shop.site.com",
    ),
    # non-default port survives; path case is preserved
    (
        "https://Host.org:8443/CaseSensitive/Path",
        "https://host.org:8443/CaseSensitive/Path",
        "host.org",
    ),
    # no query, no fragment → only authority lowercasing
    ("http://news.example.net/a/9", "http://news.example.net/a/9", "news.example.net"),
    # fbclid stripped, real params kept in order
    (
        "https://b.org/p?x=1&fbclid=abc&y=2",
        "https://b.org/p?x=1&y=2",
        "b.org",
    ),
    # userinfo skipped by domain extraction; :80 on https is NOT default
    (
        "https://user:pw@Secure.example.com:80/x",
        "https://user:pw@secure.example.com:80/x",
        "secure.example.com",
    ),
]


def test_url_normalize_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "doc_id long, url string"
    )
    out = {r["doc_id"]: r for r in normalize_urls(df).collect()}
    for i, (raw, norm, dom) in enumerate(CASES):
        assert out[i]["norm_url"] == norm, f"case {i}: {raw}"
        assert out[i]["domain"] == dom, f"case {i}: {raw}"


def test_domain_stats_counts_normalized_uniques(spark):
    # two raw variants of the SAME normalized url + one distinct url
    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_source=1"),
            (2, "HTTP://a.COM/x#frag"),
            (3, "http://a.com/y"),
            (4, "https://b.org/z"),
        ],
        "doc_id long, url string",
    )
    out = {r["domain"]: r for r in domain_stats(df).collect()}
    assert out["a.com"]["n_urls"] == 3
    assert out["a.com"]["n_unique_urls"] == 2  # /x collapses, /y distinct
    assert out["b.org"]["n_urls"] == 1 and out["b.org"]["n_unique_urls"] == 1
