"""Dataset sources (SURVEY §2.1 S7-S15): blob readers + format parsers.

Plain formats map straight onto Spark readers (S7 ``spark.read.json``,
S13 JSONL, S14 avro via the optional spark-avro jar, S8 binaryFile);
the custom piece is the reference's sniffing CSV parser
(``findopendata/parsers/csv.py``), re-expressed as an Arrow-batched
``mapInPandas`` over ``binaryFile`` rows in :mod:`csv_blobs`.
"""

from findopendata_spark.sources.csv_blobs import parse_csv_blobs  # noqa: F401
