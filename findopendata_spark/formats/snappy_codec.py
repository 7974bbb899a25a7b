"""Pure-Python Snappy block-format codec (public format description:
google/snappy ``format_description.txt``).

Exists so the Avro OCF writer can emit the reference's default codec
(``/root/reference/findopendata/storage/base.py:77-90`` writes snappy via
fastavro/python-snappy) without a C extension in this sandbox.

- :func:`compress` is a greedy hash-match encoder (4-byte anchors,
  type-1/2 copies, literal runs) — real compression, not store-only, and
  fully deterministic, so Avro blobs stay byte-reproducible across
  environments (python-snappy's output may differ build-to-build, which
  would break the writer's rerun-stability guarantee — reads accept any
  valid snappy stream, including python-snappy's).
- :func:`decompress` handles the complete format: 1/2/4-byte-offset
  copies (including overlapping copies) and all literal length forms.
"""

from __future__ import annotations

_MIN_MATCH = 4
_MAX_COPY_LEN = 64


def _write_uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    while start < end:
        # literal runs have no length cap, but emit in bounded chunks so
        # the 4-length-byte form is never needed
        n = min(end - start, 1 << 16)
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0x100:
            out.append(60 << 2)
            out.append(n - 1)
        else:
            out.append(61 << 2)
            out += (n - 1).to_bytes(2, "little")
        out += data[start : start + n]
        start += n


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # type 1: len 4..11, offset < 2048 (3 len bits + 3 offset-high bits)
    if 4 <= length <= 11 and offset < 2048:
        out.append(1 | ((length - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    else:  # type 2: len 1..64, offset <= 65535
        out.append(2 | ((length - 1) << 2))
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    out = bytearray()
    _write_uvarint(out, len(data))
    n = len(data)
    i = lit_start = 0
    table: dict[bytes, int] = {}
    while i + _MIN_MATCH <= n:
        key = data[i : i + 4]
        j = table.get(j_key := bytes(key))
        table[j_key] = i
        if j is not None and i - j <= 0xFFFF:
            _emit_literal(out, data, lit_start, i)
            length = 4
            limit = min(_MAX_COPY_LEN, n - i)
            while length < limit and data[j + length] == data[i + length]:
                length += 1
            _emit_copy(out, i - j, length)
            i += length
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    want, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 → that many extra length bytes
                extra = ln - 59
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: invalid copy offset")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-at-a-time semantics
            for k in range(ln):
                out.append(out[start + k])
    if len(out) != want:
        raise ValueError(
            f"snappy: length mismatch (want {want}, got {len(out)})"
        )
    return bytes(out)
