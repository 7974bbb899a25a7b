"""Ported reference Avro-inference tests (reference tests/test_avro.py:10-99)
plus nested/array/edge coverage for the Spark-native fold."""

from __future__ import annotations

import json

import pytest

from findopendata_spark.functions.avro_infer import (
    flatten_avro,
    infer_avro_schema,
)

# reference tests/test_avro.py:11-17
RECORDS = [
    {"username": "javasucks", "email": "go@example.com"},
    {"username": "moonshoot", "email": "moon@example.com"},
    {"username": "twilight", "email": "tw@example.com"},
    {"username": "birdeye", "email": "be@example.com", "amount": 0},
    {"username": "birdeye", "amount": 1000},
]

# reference tests/test_avro.py:19-61
RECORDS_NESTED = [
    {**r, "location": {"latitude": 12.22 + i, "longitude": -84.23 + i}}
    for i, r in enumerate(RECORDS)
]

FIELD_NAMES = ["email", "username", "amount"]
FIELD_NAMES_NESTED = ["email", "username", "amount", "location"]


def _df(spark, records):
    return spark.createDataFrame(
        [(i, json.dumps(r)) for i, r in enumerate(records)], "i long, js string"
    )


def test_basic(spark):
    """reference test_basic: 3 fields inferred from 5 records."""
    schema = infer_avro_schema(_df(spark, RECORDS), "js", order_col="i")
    assert schema["type"] == "record"
    assert len(schema["fields"]) == 3


def test_field_order(spark):
    """reference test_field_order: field_names imposes order."""
    schema = infer_avro_schema(
        _df(spark, RECORDS), "js", field_names=FIELD_NAMES, order_col="i"
    )
    assert [f["name"] for f in schema["fields"]] == FIELD_NAMES


def test_nested(spark):
    """reference test_nested: unknown fields (location) go last; the
    nested object becomes a ["null", record] union named {prop}_type."""
    schema = infer_avro_schema(
        _df(spark, RECORDS_NESTED), "js", field_names=FIELD_NAMES, order_col="i"
    )
    assert [f["name"] for f in schema["fields"]] == FIELD_NAMES_NESTED
    loc = schema["fields"][-1]["type"]
    assert loc[0] == "null"
    assert loc[1]["type"] == "record"
    assert loc[1]["name"] == "location_type"
    inner = {f["name"]: f["type"] for f in loc[1]["fields"]}
    assert inner["latitude"] == ["null", "double"]
    assert inner["longitude"] == ["null", "double"]


def test_every_field_is_nullable_union(spark):
    """reference avro.py:30-35: every field wraps in ["null", T]."""
    schema = infer_avro_schema(_df(spark, RECORDS), "js", order_col="i")
    for f in schema["fields"]:
        assert isinstance(f["type"], list) and f["type"][0] == "null"


def test_arrays_and_types(spark):
    recs = [
        {"tags": ["a", "b"], "n": 1, "ok": True},
        {"tags": ["c"], "n": 2.5, "ok": False, "note": None},
    ]
    schema = infer_avro_schema(_df(spark, recs), "js", order_col="i")
    by_name = {f["name"]: f["type"] for f in schema["fields"]}
    assert by_name["tags"][1] == {"type": "array", "items": "string"}
    assert by_name["n"][1] == "double"  # int+float coerce to number
    assert by_name["ok"][1] == "boolean"
    assert by_name["note"] == ["null", "null"] or by_name["note"][1] in (
        "null",
        "string",
    )


def test_empty_input(spark):
    df = spark.createDataFrame([], "i long, js string")
    schema = infer_avro_schema(df, "js", order_col="i")
    assert schema == {"type": "record", "name": "Root"}


def test_head_bound(spark):
    """Only the first `head` records (by order_col) participate —
    reference JSON2AvroRecords(head=...)."""
    recs = [{"a": 1}, {"a": 2}, {"a": 3, "late_field": "x"}]
    schema = infer_avro_schema(_df(spark, recs), "js", order_col="i", head=2)
    assert [f["name"] for f in schema["fields"]] == ["a"]


def test_flatten_avro(spark):
    schema = infer_avro_schema(
        _df(spark, RECORDS_NESTED), "js", field_names=FIELD_NAMES, order_col="i"
    )
    rows = flatten_avro(schema)
    assert ("email", "string", True) in rows
    assert ("amount", "long", True) in rows
    assert ("location", "record", True) in rows
    assert ("location.latitude", "double", True) in rows
