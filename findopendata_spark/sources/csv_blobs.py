"""Sniffing CSV blob parser (SURVEY §2.1 S12).

Reference behavior (``findopendata/parsers/csv.py:21-97``):
encoding guessed from an 8 KiB head (cchardet), dialect guessed by
``csv.Sniffer`` over the first 5 lines, header = the first of the first
10 rows whose cells are all non-empty and non-numeric, default
``Column-i`` headers otherwise, minimum 2 headers; records stream as
(header → value) dicts in file order.

Spark re-expression: one ``mapInPandas`` pass over ``binaryFile`` rows —
each blob is parsed with the same stdlib ``csv`` machinery (the sniffing
logic is inherently per-file, not per-row, so a file-at-a-time Arrow
batch is the vectorization unit) and emitted in the engine's long record
form ``(file_id, column_name, ingest_key, val)``, ready for
:func:`findopendata_spark.sketch.sketch_columns`. ``ingest_key``
preserves file row order — the order-sensitive aggregates (first-record
column order, first-N samples, SURVEY §7 hard parts) depend on it.

Encoding detection: ``charset_normalizer``/``chardet`` when importable,
else a UTF-8 → Latin-1 fallback chain (Latin-1 never fails, matching the
reference's lenient path for its two fixture encodings).
"""

from __future__ import annotations

import csv
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RECORD_SCHEMA = (
    "file_id string, ingest_key long, column_name string, val string, "
    "column_pos int"
)


def _guess_encoding(head: bytes) -> str:
    try:  # optional deps — not in this container
        import charset_normalizer

        best = charset_normalizer.from_bytes(head).best()
        if best is not None:
            return best.encoding
    except ImportError:
        pass
    try:
        import chardet

        r = chardet.detect(head)
        if r.get("confidence", 0) >= 0.5:
            return r["encoding"]
    except ImportError:
        pass
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso-8859-1"


def _is_number(x: str) -> bool:
    try:
        float(x)
        return True
    except ValueError:
        return False


def parse_csv_blob(
    file_id: str,
    content: bytes,
    guess_encoding_bytes: int = 8192,
    guess_dialect_lines: int = 5,
    guess_header_rows: int = 10,
    allow_no_header: bool = True,
    header_prefix: str = "Column-",
    min_header_count: int = 2,
):
    """One blob → (headers, row iterator). Reference-rule for rule."""
    encoding = _guess_encoding(content[:guess_encoding_bytes])
    text = content.decode(encoding, errors="replace")
    fileobj = io.StringIO(text, newline="")
    sample = "".join(fileobj.readline() for _ in range(guess_dialect_lines))
    try:
        dialect = csv.Sniffer().sniff(sample)
    except csv.Error:
        dialect = csv.excel
    fileobj.seek(0)
    reader = csv.reader(fileobj, dialect)
    head = [row for _, row in zip(range(guess_header_rows), reader)]
    headers, header_row_pos = None, 0
    for i, row in enumerate(head):
        if row and all(len(v.strip()) > 0 and not _is_number(v) for v in row):
            headers, header_row_pos = row, i
            break
    if headers is None:
        if not allow_no_header:
            raise ValueError("could not locate a header row in the CSV blob")
        ncol = max((len(r) for r in head), default=0)
        headers = [f"{header_prefix}{i}" for i in range(ncol)]
        header_row_pos = -1
    if len(headers) < min_header_count:
        raise ValueError(
            f"header has fewer than {min_header_count} columns"
        )
    import itertools

    rows = itertools.chain(head[header_row_pos + 1 :], reader)
    return headers, rows


def parse_csv_blobs(binary_df: DataFrame, max_records_per_file: int | None = None):
    """binaryFile rows (path, content) → long-form records.

    Use with ``spark.read.format("binaryFile").load(glob)``. Each file is
    one unit of work; Spark distributes files across executors, so a
    100 TB blob store parses with per-file parallelism — the same unit
    the reference gives one Celery task (``indexing.py:59-91``).
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, file_row in pdf.iterrows():
                fid = file_row["path"]
                headers, rows = parse_csv_blob(fid, bytes(file_row["content"]))
                out_f, out_k, out_c, out_v, out_p = [], [], [], [], []
                for rix, row in enumerate(rows):
                    if max_records_per_file and rix >= max_records_per_file:
                        break
                    for cix, (h, v) in enumerate(zip(headers, row)):
                        out_f.append(fid)
                        out_k.append(rix)
                        out_c.append(h)
                        out_v.append(v)
                        out_p.append(cix)
                yield pd.DataFrame(
                    {
                        "file_id": out_f,
                        "ingest_key": out_k,
                        "column_name": out_c,
                        "val": out_v,
                        "column_pos": out_p,
                    }
                )

    return binary_df.select("path", "content").mapInPandas(parse, RECORD_SCHEMA)
