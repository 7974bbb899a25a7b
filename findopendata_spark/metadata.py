"""Metadata generation: packages / package_files (SURVEY §3.2).

Reference lifecycle: ``generate_metadata.py:18-94`` computes the stale
work list (J1 CTE chain), then per-package tasks (``metadata.py:19-157``)
blob-read raw JSON, HTML-strip + enrich title/description, and upsert
``packages`` / ``package_files`` (``sql/create_metadata_tables.sql``).

Spark re-expression: the whole run is two MERGEs fed by one DataFrame
each — enrichment is pure column expressions (C4/C5/C11/C12), the
incremental work list is a left join + staleness filter (J1), and the
reference's time-random ``uuid_generate_v1mc()`` ids become
content-derived sha2 ids so reruns are reproducible (SURVEY §7 hard
parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from findopendata_spark.functions.text import (
    coalesce_timestamps,
    sanitize_filename,
    strip_html,
)


def build_packages(raw: DataFrame) -> DataFrame:
    """Raw harvested package rows → `packages` rows.

    Expected raw columns (CKAN shapes, ``metadata.py:48-67``): endpoint,
    package_id, title, notes, tags (array<string> or array<struct<name>>),
    organization_title, modified, metadata_modified, metadata_created.
    """
    ts = coalesce_timestamps(
        F.col("modified"), F.col("metadata_modified"), F.col("metadata_created")
    )
    tags_col = F.col("tags")
    return raw.select(
        F.sha2(F.concat_ws("/", "endpoint", "package_id"), 256).alias("id"),
        F.concat_ws("/", "endpoint", "package_id").alias("key"),
        strip_html(F.col("title")).alias("title"),
        strip_html(F.col("notes")).alias("description"),
        tags_col.alias("tags"),
        F.col("organization_title").alias("organization_display_name"),
        ts.alias("modified"),
        F.lit("ckan").alias("crawler"),
    )


def build_package_files(resources: DataFrame) -> DataFrame:
    """Raw resource rows → `package_files` rows (``metadata.py:160-250``).

    Expected: endpoint, package_id, resource_id, url, format, size,
    created, revision_timestamp, last_modified.
    """
    ts = coalesce_timestamps(
        F.col("created"), F.col("revision_timestamp"), F.col("last_modified")
    )
    fname = F.element_at(F.split(F.col("url"), "/"), -1)
    return resources.filter(
        F.col("resource_id").isNotNull() & F.col("url").isNotNull()  # F4 guards
    ).select(
        F.sha2(
            F.concat_ws("/", "endpoint", "package_id", "resource_id"), 256
        ).alias("id"),
        F.sha2(F.concat_ws("/", "endpoint", "package_id"), 256).alias(
            "package_id"
        ),
        F.col("url").alias("original_url"),
        F.lower(F.trim(F.col("format"))).alias("format"),
        sanitize_filename(fname).alias("filename"),
        F.col("size").cast("long").alias("file_size"),
        ts.alias("modified"),
    )


def split_by_format(
    resources: DataFrame, accepted: tuple[str, ...] = ("csv",)
) -> DataFrame:
    """Format-whitelist routing (F2, ``ckan_crawler.py:25,79-85``):
    accepted formats get action='download', everything else
    action='register' (metadata only, no blob fetch)."""
    fmt = F.lower(F.trim(F.col("format")))
    return resources.withColumn(
        "action",
        F.when(fmt.isin(*accepted), F.lit("download")).otherwise(
            F.lit("register")
        ),
    )


def tag_names(tags_col):
    """Extract tag names from CKAN-style tag structs (C11,
    ``metadata.py:55``): ``[{name: ...}, ...] → [name, ...]``, dropping
    entries without a name."""
    return F.transform(
        F.filter(tags_col, lambda t: t["name"].isNotNull()),
        lambda t: t["name"],
    )


def table_sample(records: DataFrame, n: int = 20) -> DataFrame:
    """First-n records per file in ingest order (A7,
    ``table_sketch.py:50-52``; size ``configs-example.yaml:57``) —
    pivoted back to one struct row per record, column order preserved by
    ``column_pos`` (the first-record-defines-order rule,
    ``table_sketch.py:42-43``)."""
    from pyspark.sql import Window

    first_rows = records.withColumn(
        "_rk", F.dense_rank().over(
            Window.partitionBy("file_id").orderBy("ingest_key")
        )
    ).filter(F.col("_rk") <= n)
    return first_rows.groupBy("file_id", "ingest_key").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("column_pos", "column_name", "val"))),
            lambda s: F.struct(
                s["column_name"].alias("column_name"), s["val"].alias("val")
            ),
        ).alias("record")
    )


def stale_work_list(
    items: DataFrame, done_times: DataFrame, key: str, ts_col: str = "modified",
    done_ts_col: str = "updated",
) -> DataFrame:
    """Incremental needs-recompute join (J1,
    ``sketch_dataset_content.py:13-30`` / ``generate_metadata.py:18-39``):
    keep items never processed or modified since last processing."""
    done = done_times.groupBy(key).agg(F.max(done_ts_col).alias("_done_ts"))
    return (
        items.join(done, key, "left")
        .filter(
            F.col("_done_ts").isNull() | (F.col(ts_col) > F.col("_done_ts"))
        )
        .drop("_done_ts")
    )


def freshness_filter(
    incoming: DataFrame, registered: DataFrame, key: str,
    modified_col: str = "modified", registered_ts: str = "updated",
) -> DataFrame:
    """Late-update skip (F3, ``ckan_crawler.py:161-171,266-273``): drop
    rows whose modified <= the registered updated time."""
    reg = registered.select(F.col(key), F.col(registered_ts).alias("_reg_ts"))
    return (
        incoming.join(reg, key, "left")
        .filter(F.col("_reg_ts").isNull() | (F.col(modified_col) > F.col("_reg_ts")))
        .drop("_reg_ts")
    )
