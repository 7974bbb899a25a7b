"""Microbench: parse_url-based canonicalizer vs substring_index-based.

Times each expression over N synthetic links shaped like the crawl's
(https://host/d/<id>, 10% /private/, occasional query strings), plus a
cross-check that both variants agree bit-for-bit on the property-test
combinatorial URL space. Run standalone: python scripts/urlbench.py [N].
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import Column, functions as F

sys.path.insert(0, "/root/repo")
from findopendata_spark.functions.urls import canonicalize_url, url_host
from findopendata_spark.session import get_spark


def canonicalize_url_fast(url: Column) -> Column:
    """Candidate: substring_index/instr splitter instead of 4 URI parses."""
    ok = url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.expr(
        "substr(substring_index(url, '#', 1), "
        "length(substring_index(substring_index(url, '#', 1), '://', 1)) + 4)"
    )
    qpos = F.instr(rest, "?")
    pre_q = F.when(qpos > 0, F.substring(rest, F.lit(1), qpos - 1)).otherwise(rest)
    query = F.when(qpos > 0, F.substring(rest, qpos + 1, F.lit(1 << 30))).otherwise(
        F.lit("")
    )
    spos = F.instr(pre_q, "/")
    hostport = F.lower(
        F.when(spos > 0, F.substring(pre_q, F.lit(1), spos - 1)).otherwise(pre_q)
    )
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.when(
        spos > 0, F.substring(pre_q, spos, F.lit(1 << 30))
    ).otherwise(F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    out = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_query)).otherwise(F.lit("")),
    )
    return F.when(ok, out)


def url_host_fast(url: Column) -> Column:
    nofrag = F.substring_index(url, "#", 1)
    rest = F.substring_index(nofrag, "://", -1)
    auth = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    host = F.substring_index(F.substring_index(auth, "@", -1), ":", 1)
    return F.when(url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), F.lower(host))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("urlbench", cores=8, shuffle_partitions=16)

    # parity on the property-test combinatorial space
    import itertools

    SCHEMES = ["http", "https", "HTTP", "HtTpS"]
    HOSTS = ["Example.ORG", "a.b.co", "data-7.example.net", "X9.example.org"]
    PORTS = ["", ":80", ":443", ":8080"]
    PATHS = ["", "/", "/d/000000000042", "/A/b/C/", "/x//y/"]
    QUERIES = ["", "?b=2&a=1", "?z=9", "?a=1&a=0", "?k=v&c=d&b=x"]
    FRAGS = ["", "#sec", "#a/b"]
    urls = [
        f"{s}://{h}{po}{pa}{q}{f}"
        for s, h, po, pa, q, f in itertools.product(
            SCHEMES, HOSTS, PORTS, PATHS, QUERIES, FRAGS
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    bad = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("a"),
        canonicalize_url_fast(F.col("url")).alias("b"),
        url_host(F.col("url")).alias("ha"),
        url_host_fast(F.col("url")).alias("hb"),
    ).filter(
        ~(F.col("a").eqNullSafe(F.col("b")) & F.col("ha").eqNullSafe(F.col("hb")))
    )
    mism = bad.limit(5).collect()
    print("MISMATCHES:", len(mism))
    for r in mism:
        print("  ", r)

    # throughput over crawl-shaped links
    links = spark.range(n).select(
        F.concat(
            F.lit("https://"),
            F.when(F.pmod("id", F.lit(2)) == 0, F.lit("hot.example.net")).otherwise(
                F.concat(F.lit("data-"), F.pmod("id", F.lit(24)), F.lit(".example.net"))
            ),
            F.when(F.pmod("id", F.lit(10)) == 0, F.lit("/private/")).otherwise(
                F.lit("/d/")
            ),
            F.lpad(F.pmod("id", F.lit(8_000_000)).cast("string"), 12, "0"),
        ).alias("url")
    ).localCheckpoint()

    def t(label, expr):
        t0 = time.time()
        links.select(expr.alias("c")).select(
            F.sum(F.length("c")).alias("s")
        ).collect()
        print(f"{label}: {time.time() - t0:.2f}s")

    for _ in range(2):
        t("parse_url canon", canonicalize_url(F.col("url")))
        t("fast canon      ", canonicalize_url_fast(F.col("url")))
        t("parse_url host  ", url_host(F.col("url")))
        t("fast host       ", url_host_fast(F.col("url")))
        t("canon+host parse", F.concat(canonicalize_url(F.col("url")),
                                        url_host(F.col("url"))))
        t("canon+host fast ", F.concat(canonicalize_url_fast(F.col("url")),
                                        url_host_fast(F.col("url"))))
    spark.stop()


if __name__ == "__main__":
    main()
