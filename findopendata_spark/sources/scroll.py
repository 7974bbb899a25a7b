"""Deterministic scroll/pagination semantics (SURVEY §2.1 S2-S4).

The reference consumes three live pagination protocols:

- CKAN ``package_search``: offset scroll, ``start += rows`` (page 50),
  stop on empty page (``findopendata/ckan/__init__.py:8-37``);
- Socrata discovery: cursor scroll, ``scroll_id := last result id``
  (``socrata_crawler.py:157-173``);
- Socrata SODA records: keyset pagination ``$order=:id $offset $limit``
  with limit 25 000 (``socrata/__init__.py:4-44``).

All three reduce to the same determinism anchor: a TOTAL ORDER over
records plus a page size — which is exactly a window rank. This module
re-expresses them as DataFrame ops so fixture-mode ingestion (and any
test) consumes a table with identical (page, slot) coordinates to what
the live scroller would see; the live path plugs the same coordinates
into the fetch UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def paginate(
    df: DataFrame,
    order_cols: list[str],
    page_size: int = 50,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign (page, slot) scroll coordinates under a total order.

    ``partition_cols`` scopes the scroll (one scroll per endpoint, like
    one Celery task per API). page is 0-based, slot is 0-based within
    the page: record k in order → page k//page_size, slot k%page_size —
    byte-equal to the reference's offset scroll, and equal to cursor
    (scroll_id = last id) paging whenever order_cols start with the id.

    Without ``partition_cols`` the rank is still exact but computed
    scalably: a naked ``Window.partitionBy()`` would ship EVERY row to
    one task, so instead the rows are range-repartitioned on the order
    keys, ranked locally per partition, and offset by the broadcast
    per-partition prefix counts (the only unpartitioned window runs over
    the tiny one-row-per-partition count frame).
    """
    order = [F.asc(c) for c in order_cols]
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
        rn = F.row_number().over(w) - 1
        out = df
    else:
        d = df.repartitionByRange(*order).withColumn(
            "_pid", F.spark_partition_id()
        )
        w_local = Window.partitionBy("_pid").orderBy(*order)
        d = d.withColumn("_lrn", F.row_number().over(w_local) - 1)
        counts = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
        w_off = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.select(
            "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
        )
        out = d.join(F.broadcast(offsets), "_pid")
        rn = F.col("_off") + F.col("_lrn")
    paged = out.withColumn("page", (rn / page_size).cast("int")).withColumn(
        "slot", (rn % page_size).cast("int")
    )
    return paged.drop("_pid", "_lrn", "_off")


def pages_in_scroll_order(paged: DataFrame, partition_cols: list[str] | None = None):
    """Iterator of page DataFrames in scroll order — the driver-side wave
    analog of the reference's while-loop over HTTP pages. Stops on the
    first empty page by construction (pages are dense)."""
    n_pages_row = paged.agg(F.max("page").alias("m")).collect()[0]
    if n_pages_row["m"] is None:
        return
    for p in range(int(n_pages_row["m"]) + 1):
        yield p, paged.filter(F.col("page") == p)
