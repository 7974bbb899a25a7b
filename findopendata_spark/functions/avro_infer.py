"""JSON → Avro schema inference (SURVEY §2.1 S15, full semantics).

Reference: ``findopendata/parsers/avro.py:24-113`` — a genson
``SchemaBuilder`` folds the first ``head`` JSON records into a JSON
schema, ``_json_to_avro_schema`` converts it to Avro with (a) every
field wrapped in a ``["null", T]`` union, (b) nested objects becoming
records named ``{prop}_type``, (c) arrays becoming ``{"type":"array",
"items": ...}`` named ``{name}_item_type``, and (d) field order imposed
by a caller-provided ``field_names`` list (Socrata's
``columns_field_name``), unknown fields last. Tested by
``tests/test_avro.py:10-99`` (ported here in tests/test_avro_infer.py).

Spark re-expression: the genson fold IS a distributed aggregation, so we
run it as one — ``schema_of_variant_agg(parse_json(col))`` merges every
record's structure executor-side (Spark 4 variant type) and returns one
DDL string; the driver only converts that to the Avro dict. No JSON
record ever reaches the driver and no per-row Python runs.

Documented divergences from the reference (both driver-visible only in
degenerate inputs):
- genson remembers first-seen property order; the variant fold returns
  fields alphabetically. With ``field_names`` given (the reference's
  production path — Socrata always supplies it) order is imposed anyway.
- genson can emit multi-type unions (e.g. int+string); Spark's fold
  coerces mixed numerics to the wider type and anything else to
  ``string``, so unions beyond ``["null", T]`` collapse to their
  coercion. JSON ``integer`` maps to Avro ``long`` (Spark infers 64-bit)
  where the reference maps to ``int``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ATOMIC = {
    T.BooleanType: "boolean",
    T.LongType: "long",
    T.IntegerType: "long",
    T.DoubleType: "double",
    T.FloatType: "double",
    T.StringType: "string",
    T.NullType: "null",
}


def _avro_type(dt: T.DataType, name: str) -> object:
    """Spark DataType → Avro type (reference _json_to_avro_schema)."""
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            at = _avro_type(f.dataType, f"{f.name}_type")
            union = ["null"] + at if isinstance(at, list) else ["null", at]
            fields.append({"name": f.name, "type": union})
        return {"type": "record", "name": name, "fields": fields}
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "items": _avro_type(dt.elementType, f"{name}_item_type"),
        }
    if isinstance(dt, T.DecimalType):
        return "double"  # JSON "number": variant infers exact decimals
    if isinstance(dt, T.BinaryType):
        return "bytes"  # raw payloads round-trip (sinks base64 the JSON leg)
    for cls, avro in _ATOMIC.items():
        if isinstance(dt, cls):
            return avro
    return "string"  # timestamps/any exotic variant leaf


def _order_fields(fields: list[dict], field_names: list[str] | None) -> list[dict]:
    if field_names is None:
        return fields
    order = {n: i for i, n in enumerate(field_names)}
    return sorted(fields, key=lambda f: order.get(f["name"], len(order)))


def infer_avro_schema(
    df: DataFrame,
    json_col: str,
    field_names: list[str] | None = None,
    head: int = 25_000,
    order_col: str | None = None,
    name: str = "Root",
) -> dict:
    """Infer the Avro schema of a column of JSON strings.

    ``head`` bounds inference to the first records (reference
    ``JSON2AvroRecords(head=25000)``); "first" is by ``order_col`` when
    given (else the DataFrame's current order is taken as arrival
    order). Returns the Avro schema as a plain dict.
    """
    h = df.select(json_col) if order_col is None else (
        df.select(json_col, order_col).orderBy(order_col)
    )
    h = h.limit(head)
    row = h.agg(
        F.schema_of_variant_agg(F.parse_json(F.col(json_col))).alias("ddl")
    ).collect()[0]
    ddl = row["ddl"]
    if ddl is None or not ddl.upper().startswith("OBJECT"):
        return {"type": "record", "name": name}  # empty/non-object input
    struct = T.StructType.fromDDL(ddl.replace("OBJECT<", "STRUCT<"))
    schema = _avro_type(struct, name)
    if not schema.get("fields"):
        return {"type": "record", "name": name}
    schema["fields"] = _order_fields(schema["fields"], field_names)
    return schema


def flatten_avro(schema: dict, prefix: str = "") -> list[tuple[str, str, bool]]:
    """Flatten an Avro record schema into (path, type, nullable) rows —
    the driver-checkable projection of the inferred tree."""
    out: list[tuple[str, str, bool]] = []
    for f in schema.get("fields", []):
        t = f["type"]
        nullable = isinstance(t, list) and "null" in t
        core = next((x for x in t if x != "null"), "null") if isinstance(t, list) else t
        path = f"{prefix}{f['name']}"
        if isinstance(core, dict) and core.get("type") == "record":
            out.append((path, "record", nullable))
            out.extend(flatten_avro(core, prefix=f"{path}."))
        elif isinstance(core, dict) and core.get("type") == "array":
            items = core["items"]
            leaf = items["type"] if isinstance(items, dict) else items
            out.append((path, f"array<{leaf}>", nullable))
            if isinstance(items, dict) and items.get("type") == "record":
                out.extend(flatten_avro(items, prefix=f"{path}[]."))
        else:
            out.append((path, str(core), nullable))
    return out
