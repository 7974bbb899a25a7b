"""Tests for sources / metadata / sinks / streaming / multimodal / dedup."""

from __future__ import annotations

import glob
import gzip
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from findopendata_spark.catalog import SnapshotCatalog
from findopendata_spark.dedup import (
    exact_dup_groups,
    near_dup_pairs,
    shingles_expr,
    simhash64,
    tokens_expr,
)
from findopendata_spark.metadata import (
    build_packages,
    freshness_filter,
    stale_work_list,
)
from findopendata_spark.multimodal import media_features
from findopendata_spark.sinks import write_avro, write_csv, write_json_gzip
from findopendata_spark.sources.csv_blobs import parse_csv_blob, parse_csv_blobs
from findopendata_spark.streaming import windowed_event_counts


# ---------------------------------------------------------------- CSV (S12)

def test_csv_header_detected():
    content = "city,population\nBerlin,3600000\nParis,2100000\n".encode()
    headers, rows = parse_csv_blob("f", content)
    assert headers == ["city", "population"]
    assert list(rows) == [["Berlin", "3600000"], ["Paris", "2100000"]]


def test_csv_latin1_encoding():
    content = "name;región\nJosé;Andalucía\n".encode("iso-8859-1")
    headers, rows = parse_csv_blob("f", content)
    assert headers == ["name", "región"]
    assert list(rows) == [["José", "Andalucía"]]


def test_csv_headerless_defaults():
    content = "1,2,3\n4,5,6\n".encode()
    headers, rows = parse_csv_blob("f", content)
    assert headers == ["Column-0", "Column-1", "Column-2"]
    assert len(list(rows)) == 2


def test_csv_header_not_first_row():
    content = "1,2\na,b\nx,y\n".encode()
    headers, rows = parse_csv_blob("f", content)
    assert headers == ["a", "b"]
    assert list(rows) == [["x", "y"]]


def test_csv_min_headers():
    with pytest.raises(ValueError):
        parse_csv_blob("f", b"only\nv\n")


def test_csv_blobs_distributed(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"t{i}.csv").write_text(f"a,b\nr{i}1,r{i}2\nr{i}3,r{i}4\n")
    bin_df = spark.read.format("binaryFile").load(str(tmp_path / "*.csv"))
    rec = parse_csv_blobs(bin_df)
    rows = rec.collect()
    assert len(rows) == 3 * 2 * 2  # 3 files x 2 rows x 2 cols
    assert {r["column_name"] for r in rows} == {"a", "b"}
    one = [r for r in rows if r["file_id"].endswith("t1.csv")]
    assert sorted((r["ingest_key"], r["column_pos"], r["val"]) for r in one) == [
        (0, 0, "r11"), (0, 1, "r12"), (1, 0, "r13"), (1, 1, "r14"),
    ]


# ------------------------------------------------------- catalog MERGE (S16)

def test_merge_upsert_freshness(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame(
        [("k1", "old", 100), ("k2", "keep", 200)], "key string, v string, ts long"
    )
    cat.merge_upsert(spark, "t", base, ["key"])
    upd = spark.createDataFrame(
        [("k1", "new", 150), ("k2", "stale", 50), ("k3", "ins", 10)],
        "key string, v string, ts long",
    )
    cat.merge_upsert(spark, "t", upd, ["key"], ts_col="ts")
    got = {r["key"]: (r["v"], r["ts"]) for r in cat.read(spark, "t").collect()}
    assert got == {"k1": ("new", 150), "k2": ("keep", 200), "k3": ("ins", 10)}


# ----------------------------------------------------------- metadata (§3.2)

def test_build_packages_strip_and_coalesce(spark):
    raw = spark.createDataFrame(
        [
            ("https://p0", "a", "<b>Hello</b>  World", "<p>desc</p>",
             ["t1", "t2"], "Org", None, "2020-01-02 03:04:05",
             "2019-01-01 00:00:00"),
        ],
        "endpoint string, package_id string, title string, notes string, "
        "tags array<string>, organization_title string, modified string, "
        "metadata_modified string, metadata_created string",
    )
    row = build_packages(raw).collect()[0]
    assert row["title"] == "Hello World"
    assert row["description"] == "desc"
    assert str(row["modified"]).startswith("2020-01-02")
    assert len(row["id"]) == 64  # content-derived sha2, not uuid-v1mc


def test_stale_and_freshness_rules(spark):
    items = spark.createDataFrame(
        [("a", 100), ("b", 100), ("c", 100)], "key string, modified long"
    )
    done = spark.createDataFrame(
        [("a", 50), ("b", 150)], "key string, updated long"
    )
    stale = {r["key"] for r in stale_work_list(items, done, "key").collect()}
    assert stale == {"a", "c"}  # a modified after done; c never done
    fresh = {r["key"] for r in freshness_filter(items, done, "key").collect()}
    assert fresh == {"a", "c"}


def test_split_by_format(spark):
    from findopendata_spark.metadata import split_by_format

    res = spark.createDataFrame(
        [("r1", " CSV "), ("r2", "json"), ("r3", "csv")],
        "resource_id string, format string",
    )
    got = {r["resource_id"]: r["action"] for r in split_by_format(res).collect()}
    assert got == {"r1": "download", "r2": "register", "r3": "download"}


def test_tag_names_struct_extraction(spark):
    from findopendata_spark.metadata import tag_names

    df = spark.createDataFrame(
        [([{"name": "health"}, {"name": None}, {"name": "gov"}],)],
        "tags array<struct<name:string>>",
    )
    row = df.select(tag_names(F.col("tags")).alias("names")).collect()[0]
    assert row["names"] == ["health", "gov"]


def test_table_sample_first_n_ordered(spark):
    from findopendata_spark.metadata import table_sample

    rows = []
    for rix in range(5):
        for cix, col in enumerate(["b_col", "a_col"]):  # order ≠ alphabetical
            rows.append(("f", rix, col, f"v{rix}{cix}", cix))
    rec = spark.createDataFrame(
        rows,
        "file_id string, ingest_key long, column_name string, val string, "
        "column_pos int",
    )
    out = {r["ingest_key"]: r["record"] for r in table_sample(rec, n=3).collect()}
    assert sorted(out) == [0, 1, 2]  # first 3 records only
    # first-record column order preserved (b_col before a_col)
    assert [c["column_name"] for c in out[0]] == ["b_col", "a_col"]
    assert [c["val"] for c in out[1]] == ["v10", "v11"]


def test_arrays_zip_column_pairs(spark):
    """C10 (``apiserver/main.py:346-355``): zip column_names with
    sketch ids into [{column_name, id}] structs."""
    df = spark.createDataFrame(
        [(["a", "b"], ["id1", "id2"])],
        "column_names array<string>, column_sketch_ids array<string>",
    )
    out = df.select(
        F.arrays_zip("column_names", "column_sketch_ids").alias("z")
    ).collect()[0]["z"]
    assert [(e["column_names"], e["column_sketch_ids"]) for e in out] == [
        ("a", "id1"), ("b", "id2"),
    ]


# ----------------------------------------------------------------- sinks

def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    p = str(tmp_path / "j")
    write_json_gzip(df, p)
    files = glob.glob(os.path.join(p, "*.json.gz"))
    assert files
    rows = []
    for fn in files:
        with gzip.open(fn, "rt") as f:
            rows += [json.loads(line) for line in f if line.strip()]
    assert sorted(r["id"] for r in rows) == [1, 2]
    write_csv(df, str(tmp_path / "c"))
    back = spark.read.option("header", "true").csv(str(tmp_path / "c"))
    assert back.count() == 2
    # no spark-avro jar here → write_avro falls back to the engine's own
    # OCF encoder (deep roundtrip coverage lives in tests/test_avro_ocf.py)
    write_avro(df, str(tmp_path / "a"))
    assert glob.glob(os.path.join(str(tmp_path / "a"), "*.avro"))


# ----------------------------------------------------------------- streaming

def test_streaming_matches_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    windowed_event_counts(spark, src, ckpt, out)
    got = spark.read.parquet(out)
    # append mode only emits windows the watermark has passed; the final
    # window(s) within `watermark` of max event time stay in state
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("c")
    ).collect()[0]["c"]
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .filter(F.col("win.end") <= F.lit(cutoff))
    )
    finalized = got.filter(F.col("win_end") <= F.lit(cutoff))
    assert finalized.count() == batch.count()
    j = finalized.select("win_start", "event_type", "cnt").exceptAll(
        batch.select(F.col("win.start").alias("win_start"), "event_type", "cnt")
    )
    assert j.count() == 0
    assert got.count() >= batch.count()  # emitted set ⊇ finalized set


# ----------------------------------------------------------------- multimodal

def test_media_features_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "image", bytearray(b"payload-1")), (2, "audio", bytearray(b""))],
        "doc_id long, media_kind string, payload binary",
    )
    rows = {r["doc_id"]: r for r in media_features(docs, buckets=4).collect()}
    import hashlib

    assert rows[1]["digest"] == hashlib.sha256(b"payload-1").hexdigest()
    assert rows[1]["n_bytes"] == 9 and rows[2]["n_bytes"] == 0
    assert rows[1]["decoder"] == "stub-sha256"
    assert len(rows[1]["feature"]) == 8
    # deterministic: rerun gives identical features
    rows2 = {r["doc_id"]: r for r in media_features(docs, buckets=4).collect()}
    assert rows2[1]["feature"] == rows[1]["feature"]


# ----------------------------------------------------------------- dedup

@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        (1, base),
        (2, base),                                  # exact dup of 1
        (3, base.replace("today", "tomorrow")),     # near dup of 1
        (4, "completely different words appear in this unrelated document text here now"),
        (5, "yet another entirely distinct body of text with no shared shingles at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(spark, dup_docs):
    groups = exact_dup_groups(dup_docs).collect()
    assert len(groups) == 1 and groups[0]["n"] == 2 and groups[0]["keeper"] == 1


def test_near_dup_pairs_match_exact_pairwise(spark, dup_docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in near_dup_pairs(dup_docs, threshold=0.5).collect()
    }
    # independent exact pairwise oracle
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in dup_docs.select(
            "doc_id", shingles_expr(F.col("text")).alias("sh")
        ).collect()
    }
    expect = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = sh[a] | sh[b]
            j = len(sh[a] & sh[b]) / len(u) if u else 0.0
            if j >= 0.5:
                expect[(a, b)] = round(j, 6)
    assert got == expect
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0


def test_simhash_hamming_property(spark, dup_docs):
    hashes = dup_docs.select(
        "doc_id", F.transform(tokens_expr(F.col("text")), lambda t: F.xxhash64(t)).alias("hashes")
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(hashes).collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")  # noqa: E731
    assert sh[1] == sh[2]  # identical text → identical simhash
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])  # near dup closer than unrelated
    assert ham(sh[1], sh[3]) <= 16


def test_embedding_near_dup_skew_guard(spark):
    """One label holding 90% of vectors must NOT produce O(n^2) pairs:
    it sub-blocks by IVF cell (cells = ceil(n/cap) first members), and
    the output equals brute force restricted to the assigned cells."""
    import numpy as np

    from findopendata_spark.embedding import embedding_near_dup

    rng = np.random.RandomState(3)
    n_hot, n_cold, dim = 450, 50, 8
    rows = []
    for i in range(n_hot):
        rows.append((i, "hot", [float(x) for x in rng.randn(dim)]))
    for i in range(n_cold):
        rows.append((n_hot + i, "cold", [float(x) for x in rng.randn(dim)]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, v array<double>"
    )
    cap = 50
    out = embedding_near_dup(emb, threshold=-1.0, block_cap=cap)
    pairs = out.count()
    # hot label sub-blocks into ceil(450/50)=9 cells: pair count is
    # sum(cell_i choose 2) << 450 choose 2; cold label stays all-pairs.
    hot_pairs = pairs - (n_cold * (n_cold - 1)) // 2
    assert hot_pairs < 0.35 * (n_hot * (n_hot - 1)) // 2, hot_pairs
    # parity: brute force within (label, assigned cell) gives same pairs
    got = {(r["a"], r["b"]) for r in out.collect()}
    # recompute assignment in numpy
    hot = np.array([r[2] for r in rows[:n_hot]])
    cents = hot[:9]  # first 9 by vec_id
    cos = (hot @ cents.T) / (
        np.linalg.norm(hot, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
    )
    cell = cos.argmax(axis=1)  # ties: lower centroid id (argmax first-max)
    expect = set()
    for i in range(n_hot):
        for j in range(i + 1, n_hot):
            if cell[i] == cell[j]:
                expect.add((i, j))
    for i in range(n_cold):
        for j in range(i + 1, n_cold):
            expect.add((n_hot + i, n_hot + j))
    assert got == expect


def test_enrich_doc_json(spark):
    """C6 full: the doc-JSON payload column (reference metadata.py:50-54
    stores lm.process(title).to_json()); stub payload carries token
    spans with offsets + in-vocab flags and names the stub model."""
    import json as _json

    from findopendata_spark.enrichment import enrich_doc_json

    df = spark.createDataFrame(
        [(1, "New York la"), (2, None)], "id long, title string"
    )
    rows = {r["id"]: r["doc_json"] for r in enrich_doc_json(df).collect()}
    d = _json.loads(rows[1])
    assert d["model"] == "hash-vector-stub"
    assert [t["text"] for t in d["tokens"]] == ["new", "york", "la"]
    assert [t["has_vector"] for t in d["tokens"]] == [True, True, False]
    assert d["tokens"][1]["start"] == 4 and d["tokens"][1]["end"] == 8
    assert _json.loads(rows[2])["tokens"] == []


def test_near_dup_bucket_cap_bounds_candidates(spark):
    """Skew guard: an adversarial corpus where many docs share one
    band bucket must not explode candidate pairs when bucket_cap is
    set; pairs found under the cap are a subset of the exact result
    and high-similarity pairs still surface via their other bands."""
    rows = []
    base = "w" + " w".join(str(i % 7) for i in range(60))
    for i in range(40):  # 40 near-identical docs (J ~ 1 across the set)
        rows.append((i, base + f" tail{i % 2}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = near_dup_pairs(docs, threshold=0.5, num_perm=64)
    capped = near_dup_pairs(docs, threshold=0.5, num_perm=64, bucket_cap=25)
    got_full = {(r["a"], r["b"]) for r in full.collect()}
    got_capped = {(r["a"], r["b"]) for r in capped.collect()}
    assert got_capped <= got_full
    # the two identical-text subgroups (tail0/tail1) collide on EVERY
    # band, so their buckets exceed any cap < group size; a tiny cap
    # must still terminate and produce a bounded, correct subset
    tiny = near_dup_pairs(docs, threshold=0.5, num_perm=64, bucket_cap=5)
    assert {(r["a"], r["b"]) for r in tiny.collect()} <= got_full


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF search: on cluster-structured vectors, probing 2/8 cells
    recovers most of the brute-force top-10 (recall bound), and every
    returned pair's cosine is exact (no approximation inside a cell)."""
    import numpy as np

    from findopendata_spark.embedding import ivf_topk

    rng = np.random.RandomState(5)
    centers = rng.randn(8, 16) * 3
    rows = []
    for i in range(400):
        c = i % 8
        rows.append((i, [float(x) for x in centers[c] + rng.randn(16) * 0.3]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    query = emb.orderBy("vec_id").limit(1)
    got = ivf_topk(emb, query, k=10, n_cells=8, n_probe=2).collect()
    assert len(got) == 10
    assert [r["rank"] for r in got] == list(range(1, 11))
    # brute force reference
    V = np.array([r[1] for r in rows])
    q = V[0]
    cos = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    cos[0] = -2  # exclude the query itself
    brute = set(np.argsort(-cos)[:10])
    hits = sum(1 for r in got if r["vec_id"] in brute)
    assert hits >= 8, hits  # clustered data: probing 2 cells recalls >=80%
    for r in got:  # within-cell scores are exact
        v = V[r["vec_id"]]
        exact = float((v @ q) / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(r["cos_sim"] - round(exact, 4)) < 1e-9


def test_simhash_near_dup_pairs_recall_exact(spark):
    """Band-of-bits candidate recall vs an exact all-pairs Hamming scan
    (VERDICT r03 item 4): with max_hamming < n_bands the pigeonhole
    guarantee makes the banded result EQUAL the brute-force pairs."""
    from findopendata_spark.dedup import (
        md5_token_hashes_expr,
        simhash_near_dup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashes = docs.select(
        "doc_id", md5_token_hashes_expr(F.col("text")).alias("hashes")
    )
    sigs = simhash64(hashes).cache()
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_dup_pairs(sigs, max_hamming=3, n_bands=4).collect()
    }
    sh = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")  # noqa: E731
    ids = sorted(sh)
    expect = {
        (a, b): ham(sh[a], sh[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(sh[a], sh[b]) <= 3
    }
    assert got == expect and len(got) > 0
    sigs.unpersist()


def test_md5_simhash64_fused_kernel_matches_expression_path(spark):
    """The r06 fused (tokenize+md5+fold) mapInPandas kernel must be
    bit-identical to simhash64(md5_token_hashes_expr(text)) — including
    whitespace-only text (single '' token) and mixed-length batches."""
    from findopendata_spark.dedup import md5_simhash64, md5_token_hashes_expr

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).unionByName(
        spark.createDataFrame(
            [(100001, "   "), (100002, "Tab\tand  Spaces "),
             (100003, "single"), (100004, "a b c d e f g h i j " * 40)],
            "doc_id long, text string",
        ).select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("srcX").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    hashes = docs.select(
        "doc_id", md5_token_hashes_expr(F.col("text")).alias("hashes")
    )
    expect = {r["doc_id"]: r["simhash"] for r in simhash64(hashes).collect()}
    got = {r["doc_id"]: r["simhash"] for r in md5_simhash64(docs).collect()}
    assert got == expect and len(got) == 504


def test_simhash_bucket_cap_bounds_adversarial_corpus(spark):
    """Skew guard (VERDICT r03 item 3): 10k docs collapsing onto ONE
    signature (the zero/boilerplate-doc web-scale failure mode) would
    uncapped rebuild an O(n^2) join — 10k docs share every band bucket,
    ~50M pairs. With bucket_cap the mega-bucket is dropped in every
    band, candidate volume stays linear, and true pairs living in
    under-cap buckets still surface."""
    from findopendata_spark.dedup import simhash_near_dup_pairs

    rows = [(i, 0) for i in range(10_000)]  # adversarial: all simhash 0
    # two true near-dup pairs far from the mega-bucket
    rows += [
        (20001, 0x0F0F0F0F0F0F0F0), (20002, 0x0F0F0F0F0F0F0F1),  # ham 1
        (20003, 0x123456789ABCDE0), (20004, 0x123456789ABCDE0),  # ham 0
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            sigs, max_hamming=3, n_bands=4, bucket_cap=100
        ).collect()
    }
    assert got == {(20001, 20002): 1, (20003, 20004): 0}
    # subset property on a corpus where the cap bites only the hot bucket
    small = spark.createDataFrame(rows[:50] + rows[10_000:],
                                  "doc_id long, simhash long")
    full = {
        (r["a"], r["b"])
        for r in simhash_near_dup_pairs(small, max_hamming=3).collect()
    }
    capped = {
        (r["a"], r["b"])
        for r in simhash_near_dup_pairs(
            small, max_hamming=3, bucket_cap=10
        ).collect()
    }
    assert capped <= full
    assert (20001, 20002) in capped and (20003, 20004) in capped


def test_simhash_near_dup_pairs_rejects_unsound_bands():
    import pytest as _pytest

    from findopendata_spark.dedup import simhash_near_dup_pairs

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(None, max_hamming=4, n_bands=4)


def test_rolling_min_fingerprint_matches_scalar_reference(spark):
    """The flat-array + reduceat kernel must equal a per-doc scalar
    rolling hash — incl. the boundary masks (a doc's last n-1 window
    positions bleed into the next doc's codes and must be ignored)."""
    from findopendata_spark.dedup import FP_BASE, FP_MOD, rolling_min_fingerprint

    rows = [
        (1, "abcdefgh"),                # exactly n chars: one window
        (2, "zzzzzzzzz"),               # 9 chars: two windows
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "aaaaaaaabbbbbbbb"),
        (5, "x" * 8 + "y" * 300),       # long tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {r["doc_id"]: r["fingerprint"]
           for r in rolling_min_fingerprint(df, n=8).collect()}

    def scalar_fp(t, n=8):
        best = None
        for i in range(len(t) - n + 1):
            h = 0
            for ch in t[i:i + n]:
                h = (h * FP_BASE + ord(ch)) % FP_MOD
            best = h if best is None else min(best, h)
        return best

    expect = {i: scalar_fp(t) for i, t in rows}
    assert got == expect


def test_trained_ivf_recall_not_worse_than_seed(spark):
    """Lloyd's-trained centroids must not lose recall vs the first-n-by-id
    seed quantizer on cluster-structured data (VERDICT r03 item 5), and
    cells must stay non-degenerate (every vector assigned, <= n_cells)."""
    import numpy as np

    from findopendata_spark.embedding import (
        assign_cells,
        first_n_centroids,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(5)
    centers = rng.randn(8, 16) * 3
    rows = []
    for i in range(400):
        c = i % 8
        rows.append((i, [float(x) for x in centers[c] + rng.randn(16) * 0.3]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    query = emb.orderBy("vec_id").limit(1)

    V = np.array([r[1] for r in rows])
    q = V[0]
    cos = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    cos[0] = -2
    brute = set(np.argsort(-cos)[:10])

    def recall(cents):
        got = ivf_topk(emb, query, k=10, n_probe=2, centroids=cents).collect()
        return sum(1 for r in got if r["vec_id"] in brute)

    seed = first_n_centroids(emb, 8)
    trained = train_ivf_centroids(emb, n_cells=8, n_iter=2).cache()
    r_seed, r_trained = recall(seed), recall(trained)
    assert r_trained >= r_seed, (r_trained, r_seed)
    assert r_trained >= 8

    assigned = assign_cells(emb, trained)
    assert assigned.count() == 400
    cells = {r["_cell"] for r in assigned.select("_cell").distinct().collect()}
    assert 1 <= len(cells) <= 8


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer (SURVEY §2.8): the availableNow
    run's final per-user update must equal the batch q21 sessionize, and
    a SECOND availableNow run over appended data must continue from the
    checkpointed state (counts grow, never reset)."""
    import __spark_entry__ as E

    from findopendata_spark.streaming.stateful import (
        read_session_totals,
        sessionize_stream,
    )

    src = str(tmp_path / "events_src")
    out = str(tmp_path / "events_out")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src)

    ck = str(tmp_path / "ck")
    sessionize_stream(spark, src, ck, out)
    got1 = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in read_session_totals(spark, out).collect()
    }
    n_first = {
        r["user_id"]: r["n"]
        for r in first.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {u: v[1] for u, v in got1.items()} == n_first

    # append the rest; resumed query continues from the state store
    second.write.mode("append").parquet(src)
    sessionize_stream(spark, src, ck, out)
    got2 = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in read_session_totals(spark, out).collect()
    }
    total_events = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in E.queries()["q21_sessionize"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # the split interleaves arrival order, so session counts may differ
    # from the batch answer (out-of-order arrival can split OR merge);
    # the order-robust invariants: every event counted exactly once, and
    # the resumed run strictly extends the first run's state
    for u, n in total_events.items():
        assert got2[u][1] == n
        assert got2[u][1] >= got1.get(u, (0, 0))[1]
        assert got2[u][0] >= got1.get(u, (0, 0))[0]

    # clean single-pass parity: one run over ALL events, event-time order
    src2 = str(tmp_path / "events_all")
    out2 = str(tmp_path / "events_out2")
    ev.orderBy("ts", "event_id").coalesce(1).write.parquet(src2)
    sessionize_stream(spark, src2, str(tmp_path / "ck2"), out2)
    got3 = {
        r["user_id"]: r["n_sessions"]
        for r in read_session_totals(spark, out2).collect()
    }
    assert got3 == batch


def test_stateful_sessionize_three_batches_with_mid_stream_kill(
    spark, tmp_path
):
    """VERDICT r03 item 8 (resume half): >= 3 micro-batches over the
    query's lifetime with a KILLED attempt in the middle — a sink that
    raises mid-batch fails before the commit log advances, so the
    state-store version rolls back; the resumed run replays the same
    planned batch and the final totals equal a clean one-pass run."""
    from pyspark.sql.streaming import StreamingQueryException

    from findopendata_spark.streaming.stateful import (
        read_session_totals,
        sessionize_stream,
    )

    from pyspark.sql import Window

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # three chronological chunks (global window is fine at test scale)
    tiled = ev.withColumn(
        "_tile", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    chunks = [
        tiled.filter(F.col("_tile") == i).drop("_tile") for i in (1, 2, 3)
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1
    chunks[0].write.mode("append").parquet(src)
    sessionize_stream(spark, src, ck, out)
    # batch 2 attempt is KILLED mid-sink (after a partial write — the
    # replay appends identical rows under the same batch_id, which the
    # latest-update reader tolerates by construction)
    chunks[1].write.mode("append").parquet(src)

    def killing_sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)
        raise RuntimeError("injected mid-stream kill")

    with pytest.raises(StreamingQueryException):
        sessionize_stream(spark, src, ck, out, sink=killing_sink)
    # resume: replays the failed batch exactly, then batch 3
    sessionize_stream(spark, src, ck, out)
    chunks[2].write.mode("append").parquet(src)
    sessionize_stream(spark, src, ck, out)

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in read_session_totals(spark, out).collect()
    }
    # clean single-pass reference over the same events in event-time order
    src2, out2 = str(tmp_path / "src2"), str(tmp_path / "out2")
    ev.orderBy("ts", "event_id").coalesce(1).write.parquet(src2)
    sessionize_stream(spark, src2, str(tmp_path / "ck2"), out2)
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in read_session_totals(spark, out2).collect()
    }
    assert got == want and len(got) > 0


def test_sample_frames_edges_and_resize_stub(spark):
    """Frame sampler: n_frames < k yields each frame exactly once, in
    order; resize stage passes payloads through unchanged without PIL
    (documented stub) with the target dims stamped."""
    from findopendata_spark.multimodal import resize_images, sample_frames

    rows = [(1, b"aa", 3), (2, b"bb", 1), (3, b"cc", 16), (4, None, 240)]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, n_frames long"
    )
    got = sample_frames(df, k=8, buckets=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert sorted(by_doc[1]) == [0, 1, 2]          # 3 frames, k=8 → all 3
    assert by_doc[2] == [0]                        # single frame
    assert sorted(by_doc[3]) == [0, 2, 4, 6, 8, 10, 12, 14]  # evenly spaced
    assert len(by_doc[4]) == 8 and len(set(by_doc[4])) == 8
    import hashlib as _h

    d1 = {r["frame_idx"]: r["frame_digest"] for r in got if r["doc_id"] == 1}
    assert d1[2] == _h.md5(b"aa:2").hexdigest()

    rz = resize_images(df, target=(224, 224), buckets=4).collect()
    assert {r["doc_id"]: bytes(r["payload"]) for r in rz}[1] == b"aa"
    assert all(r["width"] == 224 and r["height"] == 224 for r in rz)
    assert {r["resizer"] for r in rz} == {"stub-passthrough"}


def test_allpairs_jaccard_exactness_vs_bruteforce(spark):
    """Prefix-filtered AllPairs join must equal the O(n^2) scan exactly,
    including boundary pairs where |B|*t == |A| (the size-filter edge)
    and J == t exactly (3/5 at t=0.6) — the float-guard cases."""
    import random

    from findopendata_spark.dedup import allpairs_jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        # boundary: A's 3 grams all inside B's 5 grams -> J = 3/5 = t
        (1, "a b c d e"),
        (2, "a b c d e f g"),
        # exact duplicate pair
        (3, "x y z q r s"),
        (4, "x y z q r s"),
        # disjoint
        (5, "p1 p2 p3 p4"),
    ] + [
        (10 + i, " ".join(rng.choices(vocab, k=rng.randint(3, 30))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.6
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in allpairs_jaccard_pairs(docs, threshold=t, shingle_n=3).collect()
    }
    from findopendata_spark.dedup import shingles_expr

    g = {
        r["doc_id"]: set(r["g"])
        for r in docs.select(
            "doc_id", shingles_expr(F.col("text"), 3).alias("g")
        ).collect()
    }
    expect = {}
    ids = sorted(g)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not g[a] or not g[b]:
                continue
            u = g[a] | g[b]
            j = len(g[a] & g[b]) / len(u)
            if j >= t:
                expect[(a, b)] = round(j, 6)
    assert got == expect
    assert got[(1, 2)] == 0.6      # boundary pair survived the filters
    assert got[(3, 4)] == 1.0


def test_allpairs_plan_has_no_cross_join(spark):
    """The candidate stage must be an equi-join on prefix grams — a
    cross join / broadcast nested loop anywhere in the plan means the
    prefilter silently degraded to O(n^2)."""
    from findopendata_spark.dedup import allpairs_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"t{i} t{i+1} t{i+2} t{i+3} common") for i in range(20)],
        "doc_id long, text string",
    )
    plan = allpairs_jaccard_pairs(docs, threshold=0.6)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stateful_sessionize_late_events_surfaced(spark, tmp_path):
    """VERDICT r04 item 7: a micro-batch arriving with event times older
    than the state's last-seen time is an ordering-contract violation —
    it must be SURFACED (per-user n_late counter in every update), not
    silently miscounted; in-order streams report n_late == 0."""
    import datetime as dt

    from findopendata_spark.streaming.stateful import (
        read_session_totals,
        sessionize_stream,
    )

    def ev_df(rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1, 0, 0, s), u, "click", 1.0, "{}")
                for i, (u, s) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    src = str(tmp_path / "late_src")
    out = str(tmp_path / "late_out")
    ck = str(tmp_path / "late_ck")
    # batch 1: user 7 at t=10,20; user 8 at t=30 (in order)
    ev_df([(7, 10), (7, 20), (8, 30)]).write.mode("append").parquet(src)
    sessionize_stream(spark, src, ck, out)
    t1 = {r["user_id"]: r for r in read_session_totals(spark, out).collect()}
    assert t1[7]["n_late"] == 0 and t1[8]["n_late"] == 0

    # batch 2: user 7 gets TWO events older than its last_ts (t=5, 15)
    # and one in order (t=25); user 8 stays in order (t=40)
    ev_df([(7, 5), (7, 15), (7, 25), (8, 40)]).write.mode("append").parquet(src)
    sessionize_stream(spark, src, ck, out)
    t2 = {r["user_id"]: r for r in read_session_totals(spark, out).collect()}
    assert t2[7]["n_late"] == 2, t2
    assert t2[8]["n_late"] == 0
    # every event still counted exactly once
    assert t2[7]["n_events"] == 5 and t2[8]["n_events"] == 2
