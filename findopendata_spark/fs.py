"""Scheme-agnostic file access via the Hadoop FileSystem API (SURVEY
§2.1 sources/sinks; VERDICT r03 item 9).

The reference ships per-cloud storage drivers
(``/root/reference/findopendata/storage/gcp.py:14-93``,
``storage/azure.py``). Spark's answer is configuration, not code: every
``df.read``/``df.write`` already routes through Hadoop's FileSystem
registry, so GCS/Azure/S3 are the SAME engine code plus a connector jar
and conf:

- GCS:   ``spark.jars.packages=com.google.cloud.bigdataoss:gcs-connector``
         + ``spark.hadoop.fs.gs.impl=...GoogleHadoopFileSystem`` →
         ``gs://bucket/path``
- Azure: ``hadoop-azure`` jar + ``spark.hadoop.fs.azure.account.key...``
         → ``abfss://container@account.dfs.core.windows.net/path``
- S3:    ``hadoop-aws`` jar → ``s3a://bucket/path``

This module covers the few places the engine touches files OUTSIDE a
DataFrame job (the own-OCF fallback writer, schema peeking) with the
same registry, so those paths are scheme-agnostic too. Tests exercise a
non-``file:`` scheme with ``viewfs://`` — Hadoop's mount-table
filesystem, available with no extra jars — as the local cloud-emulator
stand-in (each mount link plays the role of a bucket).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return path.getFileSystem(conf), path, jvm


def write_bytes(spark: SparkSession, uri: str, data: bytes) -> None:
    fs, path, _ = _fs_and_path(spark, uri)
    out = fs.create(path, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_bytes(spark: SparkSession, uri: str) -> bytes:
    fs, path, jvm = _fs_and_path(spark, uri)
    inp = fs.open(path)
    try:
        # commons-io copies JVM-side; py4j then returns the byte[] by
        # value (a positional readFully into a python bytearray would
        # mutate only the JVM copy)
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(inp))
    finally:
        inp.close()


def list_files(
    spark: SparkSession, dir_uri: str, suffix: str | None = None
) -> list[str]:
    """Sorted file URIs directly under ``dir_uri`` (non-recursive)."""
    fs, path, _ = _fs_and_path(spark, dir_uri)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        if st.isFile():
            name = st.getPath().toString()
            if suffix is None or name.endswith(suffix):
                out.append(name)
    return sorted(out)


def exists(spark: SparkSession, uri: str) -> bool:
    fs, path, _ = _fs_and_path(spark, uri)
    return bool(fs.exists(path))


def mkdirs(spark: SparkSession, uri: str) -> None:
    fs, path, _ = _fs_and_path(spark, uri)
    fs.mkdirs(path)


def delete(spark: SparkSession, uri: str, recursive: bool = True) -> None:
    fs, path, _ = _fs_and_path(spark, uri)
    if fs.exists(path):
        fs.delete(path, recursive)
