"""Avro OCF codec + sink/source tests (reference
tests/test_storage_local.py:42-95 put_avro/get semantics, re-expressed
for the engine's own spec-implementation)."""

from __future__ import annotations

import pytest

from findopendata_spark.formats.avro_ocf import (
    MAGIC,
    read_avro_blob,
    write_avro_blob,
)

# reference tests/test_storage_local.py fixtures (same shape)
SCHEMA = {
    "name": "root",
    "type": "record",
    "fields": [
        {"name": "h1", "type": "string"},
        {"name": "h2", "type": ["null", "long"]},
        {"name": "h3", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {
            "name": "loc",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "loc_type",
                    "fields": [
                        {"name": "lat", "type": "double"},
                        {"name": "lon", "type": "double"},
                    ],
                },
            ],
        },
    ],
}
RECORDS = [
    {"h1": "a", "h2": 1, "h3": 0.5, "tags": ["x", "y"],
     "loc": {"lat": 1.5, "lon": -2.5}},
    {"h1": "b", "h2": None, "h3": None, "tags": [], "loc": None},
    {"h1": "ü†f-8", "h2": -(2**40), "h3": 3.14159, "tags": ["z"],
     "loc": {"lat": 0.0, "lon": 0.0}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_blob_roundtrip(codec):
    blob = write_avro_blob(SCHEMA, RECORDS, codec=codec)
    assert blob.startswith(MAGIC)
    schema, recs = read_avro_blob(blob)
    assert schema == SCHEMA
    assert recs == RECORDS
    # field order follows the schema (reference avro2json OrderedDict)
    assert list(recs[0]) == ["h1", "h2", "h3", "tags", "loc"]


def test_blob_deterministic():
    assert write_avro_blob(SCHEMA, RECORDS) == write_avro_blob(SCHEMA, RECORDS)


def test_blob_multi_block():
    recs = [{"h1": f"r{i}", "h2": i, "h3": None, "tags": [], "loc": None}
            for i in range(10_000)]
    blob = write_avro_blob(SCHEMA, recs, block_records=1000)
    _, out = read_avro_blob(blob)
    assert out == recs


def test_corrupt_sync_detected():
    blob = bytearray(write_avro_blob(SCHEMA, RECORDS, codec="null"))
    blob[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        read_avro_blob(bytes(blob))


def test_spark_sink_source_roundtrip(spark, tmp_path):
    """write_avro → read_avro roundtrip via the fallback OCF path
    (no spark-avro jar in this sandbox — the fallback IS the code
    under test; with the jar present the same API uses the datasource)."""
    from pyspark.sql import functions as F

    from findopendata_spark.sinks import read_avro, write_avro

    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id").cast("string")).alias("name"),
        (F.col("id") / 3.0).alias("score"),
        F.array(F.lit("a"), F.col("id").cast("string")).alias("tags"),
    )
    out = str(tmp_path / "avro_out")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.count() == 500
    a = {tuple(r) for r in df.select("k", "name").collect()}
    b = {tuple(r) for r in back.select("k", "name").collect()}
    assert a == b
    s = {r["k"]: r["score"] for r in back.collect()}
    assert abs(s[3] - 1.0) < 1e-12
    t = {r["k"]: list(r["tags"]) for r in back.collect()}
    assert t[7] == ["a", "7"]


def test_spark_sink_empty_and_binary_roundtrip(spark, tmp_path):
    """ADVICE r02 edge cases: an empty DataFrame round-trips (schema-only
    OCF file), and BinaryType columns survive the fallback's JSON bridge
    (base64 both ways)."""
    from pyspark.sql import functions as F

    from findopendata_spark.sinks import read_avro, write_avro

    # empty input → schema-only file, read back as 0 rows w/ schema
    df = spark.range(5).select(
        F.col("id").alias("k"), F.lit("x").alias("name")
    ).filter(F.col("k") < 0)
    out = str(tmp_path / "avro_empty")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.count() == 0
    assert set(back.columns) == {"k", "name"}

    # binary payloads round-trip byte-exact
    bdf = spark.range(20).select(
        F.col("id").alias("k"),
        F.encode(F.concat(F.lit("payload-\x01\x02-"),
                          F.col("id").cast("string")), "UTF-8").alias("blob"),
    )
    out2 = str(tmp_path / "avro_bin")
    write_avro(bdf, out2)
    back2 = read_avro(spark, out2)
    a = {r["k"]: bytes(r["blob"]) for r in bdf.collect()}
    b = {r["k"]: bytes(r["blob"]) for r in back2.collect()}
    assert a == b


def test_read_avro_missing_dir_raises(spark, tmp_path):
    import pytest as _pytest

    from findopendata_spark.sinks import read_avro

    empty = tmp_path / "nothing"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError, match="no .avro files"):
        read_avro(spark, str(empty))
