"""Blob/export sinks (SURVEY §2.1 S9-S11, S17).

| reference                                           | here |
|------------------------------------------------------|------|
| ``put_json(records, gzip_compress=True)`` (S11)      | :func:`write_json_gzip` |
| ``put_avro(schema, records, codec="snappy")`` (S10)  | :func:`write_avro` (needs the spark-avro jar — import-gated) |
| ``\\COPY (row_to_json(...)) TO PROGRAM 'gzip'`` (S17) | :func:`export_column_sketches` |
| resource-URL CSV export (S17)                        | :func:`write_csv` |

All are thin ``df.write`` wrappers — the reference needed a bespoke
storage layer (``storage/base.py:20-104``) because Celery workers write
files one at a time; Spark writers already partition, compress, and
commit atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_json_gzip(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """gzip JSONL (reference S11: ``storage/local.py:74-88``)."""
    df.write.mode(mode).option("compression", "gzip").json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header CSV export (reference S17: ``sql/export_resource_urls.sql``)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> None:
    """Snappy Avro (reference S10). Requires the spark-avro package —
    absent in this sandbox, so gated with a clear error."""
    try:
        df.write.mode(mode).option("compression", compression).format(
            "avro"
        ).save(path)
    except Exception as e:  # noqa: BLE001
        if "avro" in str(e).lower() or "DATA_SOURCE_NOT_FOUND" in str(e):
            raise RuntimeError(
                "spark-avro jar not on the classpath; add "
                "org.apache.spark:spark-avro_2.13 via spark.jars.packages"
            ) from e
        raise


def export_column_sketches(
    sketches: DataFrame, package_files: DataFrame, packages: DataFrame, path: str
) -> None:
    """The reference's gzip-JSONL sketch export
    (``sql/export_column_sketches.sql:1-30``): sketches ⋈ files ⋈
    packages, one JSON object per sketch."""
    joined = (
        sketches.join(
            package_files.select(
                F.col("id").alias("package_file_id"),
                "package_id",
                "original_url",
                "format",
            ),
            sketches["file_id"] == F.col("package_file_id"),
            "left",
        )
        .join(
            packages.select(F.col("id").alias("package_id"), "title"),
            "package_id",
            "left",
        )
        .drop("package_file_id")
    )
    write_json_gzip(joined, path)
