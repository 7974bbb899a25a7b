"""Serving layer: the reference apiserver's routes
(``apiserver/main.py:271-477``) over warmed engine indexes — stdlib
HTTP server, probe-cost requests, parity with the batch queries."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def api(spark):
    from findopendata_spark.serving import ApiServer

    srv = ApiServer(spark, SF)
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=120
    ) as r:
        return r.status, json.loads(r.read())


def test_original_hosts(api, spark):
    code, body = _get(api, "/api/original-hosts")
    want = {
        r["source"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("source").distinct().collect()
    }
    assert code == 200 and set(body["original_hosts"]) == want


def test_keyword_search_matches_batch_q29(api, spark):
    import __spark_entry__ as E

    code, body = _get(api, "/api/keyword-search?q=data+table+query+spark&limit=20")
    assert code == 200
    got = [(r["doc_id"], r["score"]) for r in body["results"]]
    want = [
        (r["doc_id"], r["score"])
        for r in E.queries()["q29_keyword_search"](spark, SF).collect()
    ]
    assert got == want and len(got) > 0


def test_keyword_search_title_and_empty_query(api):
    code, body = _get(api, "/api/keyword-search-title?q=data&limit=5")
    assert code == 200 and len(body["results"]) <= 5
    code, body = _get(api, "/api/keyword-search?q=")
    assert code == 200 and body["results"] == []


def test_similar_packages_matches_batch_q41(api, spark):
    import __spark_entry__ as E

    q_doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.length("text") >= 80)
        .agg(F.min("doc_id"))
        .collect()[0][0]
    )
    code, body = _get(api, f"/api/similar-packages?id={q_doc}&limit=10")
    assert code == 200
    got = [
        (r["doc_id"], r["title_similarity"], r["description_similarity"])
        for r in body["results"]
    ]
    want = [
        (r["doc_id"], r["title_similarity"], r["description_similarity"])
        for r in E.queries()["q41_similar_packages"](spark, SF).collect()
    ]
    assert got == want and len(got) == 10
    # unknown/short doc: empty result, not an error
    code, body = _get(api, "/api/similar-packages?id=999999999")
    assert code == 200 and body["results"] == []


def test_package_brief_and_404(api, spark):
    row = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id").limit(1).collect()[0]
    )
    code, body = _get(api, f"/api/package/{row['doc_id']}")
    assert code == 200
    assert body["doc_id"] == row["doc_id"]
    assert body["source"] == row["source"]
    assert body["title"] == row["text"][:40]
    assert body["n_chars"] == len(row["text"])
    try:
        code, body = _get(api, "/api/package/999999999")
    except urllib.error.HTTPError as e:
        code, body = e.code, json.loads(e.read())
    assert code == 404 and "error" in body
    try:
        code, body = _get(api, "/api/no-such-route")
    except urllib.error.HTTPError as e:
        code, body = e.code, json.loads(e.read())
    assert code == 404


def test_joinable_column_search_matches_batch_q16(api, spark):
    import __spark_entry__ as E

    code, body = _get(
        api,
        "/api/joinable-column-search?file_id=q_probe&column_name=dockey"
        "&threshold=0.1&limit=10",
    )
    assert code == 200
    got = {
        (r["file_id"], r["column_name"], r["jaccard"], r["containment"])
        for r in body["results"]
    }
    want = {
        (r["file_id"], r["column_name"], r["jaccard"], r["containment"])
        for r in E.queries()["q16_joinable_column_search"](spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_concurrent_requests(api):
    """FAIR-scheduled session: concurrent probes all succeed."""
    import concurrent.futures as cf

    paths = [
        "/api/original-hosts",
        "/api/keyword-search?q=data&limit=5",
        "/api/keyword-search-title?q=table",
        "/api/original-hosts",
    ]
    with cf.ThreadPoolExecutor(4) as ex:
        codes = list(ex.map(lambda p: _get(api, p)[0], paths))
    assert codes == [200, 200, 200, 200]


def test_joinable_route_from_persisted_store(api, spark, tmp_path):
    """VERDICT r04 item 6: with a catalog supplied, warm() probes the
    PERSISTED column_sketches table IncrementalIndexes maintains (plus
    its kept verify records) instead of the session-cached store — and
    the joinable-column route answers identically (the reference's LSH
    server boots from the sketch table the same way,
    lshserver/main.go:26-82)."""
    from findopendata_spark.catalog import SnapshotCatalog
    from findopendata_spark.config import SketchConfig
    from findopendata_spark.indexing import IncrementalIndexes
    from findopendata_spark.queries2 import _sketch_store
    from findopendata_spark.serving import ApiServer

    records, _ = _sketch_store(spark, SF)
    root = str(tmp_path / "serve_cat")
    IncrementalIndexes(SnapshotCatalog(root)).sketch_append(
        spark, records, SketchConfig(), n_salts=4, keep_records=True
    )
    srv = ApiServer(spark, SF, catalog_root=root)
    srv.warm()
    got = srv.joinable_column_search("q_probe", "dockey", 0.1, 10)
    want = api.joinable_column_search("q_probe", "dockey", 0.1, 10)
    assert got == want and len(got) > 0


def test_similar_packages_route_from_persisted_trigram_store(
    api, spark, tmp_path
):
    """VERDICT r05 item 8: with a catalog carrying the crawl-maintained
    trigram tables, warm() probes the PERSISTED postings/sizes
    (IncrementalIndexes latest-wave-wins read) instead of the
    session-built index — and the similar-packages route answers
    identically to the session-path server."""
    from findopendata_spark.catalog import SnapshotCatalog
    from findopendata_spark.indexing import IncrementalIndexes
    from findopendata_spark.serving import ApiServer

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    root = str(tmp_path / "serve_tri_cat")
    idx = IncrementalIndexes(SnapshotCatalog(root))
    idx.trigram_append(spark, docs, "title")
    idx.trigram_append(spark, docs, "description")

    srv = ApiServer(spark, SF, catalog_root=root)
    # warm only the trigram side (the sketch tables are absent in this
    # catalog on purpose — the route under test does not need them)
    srv._docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
    srv._t_idx = srv._warm_trigram("title")
    srv._d_idx = srv._warm_trigram("description")

    q_doc = (
        docs.filter(F.length("text") >= 80).agg(F.min("doc_id"))
        .collect()[0][0]
    )
    got = srv.similar_packages(q_doc, 10)
    want = api.similar_packages(q_doc, 10)
    assert got == want and len(got) == 10
