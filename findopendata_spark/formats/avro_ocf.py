"""Avro Object Container File encoder/decoder, from the public Avro spec.

Implements the subset the reference writes and reads (S10/S14:
``storage/base.py put_avro``, ``parsers/avro.py avro2json``): records of
null/boolean/int/long/float/double/string/bytes, nullable unions,
arrays, and nested records; codecs ``null``, ``deflate`` (the spec's
raw-DEFLATE) and ``snappy`` — the reference's default
(``storage/base.py:77-90``) — via the deterministic pure-Python encoder
in :mod:`findopendata_spark.formats.snappy_codec` (python-snappy, when
installed, is used on the read side). The codec is a per-file metadata
field, so files interoperate with any Avro reader either way.

Wire format (Avro 1.11 spec §Object Container Files):
``Obj\\x01`` magic → metadata map (``avro.schema`` JSON,
``avro.codec``) → 16-byte sync marker → blocks of
``(count, byte-size, data, sync)``; scalars are zigzag varints, floats
little-endian IEEE, strings/bytes length-prefixed.

This is a from-scratch implementation of the public spec — no code from
the reference (which delegates to the fastavro package).
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive encoders / decoders
# ---------------------------------------------------------------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


# ---------------------------------------------------------------------------
# datum encoder / decoder (schema-driven)
# ---------------------------------------------------------------------------

def _write_datum(buf: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union: index then value
        idx = _union_index(schema, value)
        _write_long(buf, idx)
        _write_datum(buf, schema[idx], value)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "string":
        _write_bytes(buf, str(value).encode("utf-8"))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            _write_datum(buf, f["type"], value.get(f["name"]))
    elif t == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for it in items:
                _write_datum(buf, schema["items"], it)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type: {t}")


def _union_index(schemas: list, value) -> int:
    def kind(s):
        return s["type"] if isinstance(s, dict) else s

    if value is None:
        for i, s in enumerate(schemas):
            if kind(s) == "null":
                return i
        raise ValueError("null value but no null branch in union")
    pref = {
        bool: ("boolean",),
        int: ("long", "int", "double", "float"),
        float: ("double", "float"),
        str: ("string",),
        bytes: ("bytes",),
        dict: ("record",),
        list: ("array",),
    }
    wanted = pref.get(type(value), ())
    for w in wanted:
        for i, s in enumerate(schemas):
            if kind(s) == w:
                return i
    for i, s in enumerate(schemas):
        if kind(s) != "null":
            return i
    raise ValueError(f"no union branch for {type(value)}")


def _read_datum(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        return _read_datum(buf, schema[_read_long(buf)])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return _read_bytes(buf)
    if t == "record":
        return {f["name"]: _read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # spec: negative count → byte size follows
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_read_datum(buf, schema["items"]))
    raise ValueError(f"unsupported Avro type: {t}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def write_avro_blob(
    schema: dict, records, codec: str = "deflate", block_records: int = 4096
) -> bytes:
    """Encode records as one Avro OCF byte blob (S10 put_avro analog).

    The sync marker is derived from the schema hash, so identical
    (schema, records, codec) inputs produce byte-identical files —
    rerun-stable exports. ``snappy`` (the reference's default codec,
    ``storage/base.py:77-90``) always encodes with the deterministic
    pure-Python encoder (:mod:`findopendata_spark.formats.snappy_codec`)
    to keep that guarantee; per the Avro spec each snappy block carries a
    4-byte big-endian CRC32 of the UNCOMPRESSED data."""
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported codec: {codec}")
    schema_json = json.dumps(schema)
    sync = hashlib.md5(schema_json.encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)

    it = iter(records)
    while True:
        block = io.BytesIO()
        n = 0
        for rec in it:
            _write_datum(block, schema, rec)
            n += 1
            if n >= block_records:
                break
        if n == 0:
            break
        data = block.getvalue()
        if codec == "deflate":  # spec: raw DEFLATE, no zlib header
            data = zlib.compress(data)[2:-4]
        elif codec == "snappy":  # spec: snappy + BE CRC32 of raw data
            from findopendata_spark.formats import snappy_codec

            data = snappy_codec.compress(data) + struct.pack(
                ">I", zlib.crc32(data) & 0xFFFFFFFF
            )
        _write_long(out, n)
        _write_bytes(out, data)
        out.write(sync)
        if n < block_records:
            break
    return out.getvalue()


def read_avro_blob(data: bytes):
    """Decode an Avro OCF blob → (schema, records) with record fields in
    schema order (S14 / reference ``avro2json``)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            crc = struct.unpack(">I", block[-4:])[0]
            try:  # python-snappy if present (reads any valid stream)
                import snappy as _pysnappy  # pragma: no cover

                block = _pysnappy.decompress(block[:-4])
            except ImportError:
                from findopendata_spark.formats import snappy_codec

                block = snappy_codec.decompress(block[:-4])
            if zlib.crc32(block) & 0xFFFFFFFF != crc:
                raise ValueError("snappy block CRC mismatch")
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        bb = io.BytesIO(block)
        for _ in range(n):
            records.append(_read_datum(bb, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records
