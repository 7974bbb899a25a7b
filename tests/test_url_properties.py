"""Property-style URL canonicalization tests (SURVEY §5 item 5):
idempotence + invariants over the full combinatorial component space,
evaluated in one Spark job."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from findopendata_spark.functions.urls import canonicalize_url, url_host

SCHEMES = ["http", "https", "HTTP", "HtTpS"]
HOSTS = ["Example.ORG", "a.b.co", "data-7.example.net", "X9.example.org"]
PORTS = ["", ":80", ":443", ":8080"]
PATHS = ["", "/", "/d/000000000042", "/A/b/C/", "/x//y/"]
QUERIES = ["", "?b=2&a=1", "?z=9", "?a=1&a=0", "?k=v&c=d&b=x"]
FRAGS = ["", "#sec", "#a/b"]


def _all_urls():
    combos = itertools.product(SCHEMES, HOSTS, PORTS, PATHS, QUERIES, FRAGS)
    return [f"{s}://{h}{po}{pa}{q}{f}" for s, h, po, pa, q, f in combos]


def test_canonicalize_idempotent_and_invariants(spark):
    urls = _all_urls()  # 4*4*4*5*5*3 = 4800 combinations
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = (
        df.select(
            "url",
            canonicalize_url(F.col("url")).alias("c1"),
            url_host(F.col("url")).alias("h"),
        )
        .withColumn("c2", canonicalize_url(F.col("c1")))
        .withColumn("h2", url_host(F.col("c1")))
        .collect()
    )
    assert len(out) == 4800
    for r in out:
        # idempotence: the canonical form is a fixed point
        assert r["c2"] == r["c1"], (r["url"], r["c1"], r["c2"])
        # host extraction is stable across canonicalization
        assert r["h2"] == r["h"], (r["url"], r["h"], r["h2"])
        # invariants: no fragment, lowercase scheme, no trailing slash,
        # default ports dropped, query params sorted
        assert "#" not in r["c1"]
        scheme, rest = r["c1"].split("://", 1)
        assert scheme == scheme.lower()
        authority = rest.split("/")[0].split("?")[0]
        # only the SCHEME-MATCHING default port is dropped; http://h:443
        # is a real non-default port and must survive
        if scheme == "http":
            assert not authority.endswith(":80")
        if scheme == "https":
            assert not authority.endswith(":443")
        assert r["h"] == r["h"].lower()
        before_query = r["c1"].split("?")[0]
        assert not before_query.endswith("/")
        if "?" in r["c1"]:
            parts = r["c1"].split("?", 1)[1].split("&")
            assert parts == sorted(parts)
    # distinct canonical keys collapse exactly the case/port/fragment/
    # query-order variants: every (host-lower, path-stripped, sorted-query)
    # class maps to ONE canonical form
    canon = {r["c1"] for r in out}
    assert len(canon) < len(urls)  # real collapsing happened
