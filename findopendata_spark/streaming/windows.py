"""Watermarked tumbling-window aggregation over a streaming source.

``readStream`` → event-time window + watermark → sink. With
``Trigger.AvailableNow`` this processes a backlog exactly once and
stops — the streaming twin of one crawl wave. State (window partials)
lives in the checkpoint dir; a killed query resumes from it, the same
exactly-once story the crawler gets from atomic wave commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    output_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    schema: str = EVENTS_SCHEMA,
) -> None:
    """Run the windowed aggregation over all currently-available input
    (availableNow) and write append-mode parquet; blocks until done.

    Watermark semantics: rows later than `watermark` behind the max
    event time are dropped — the streaming generalization of the
    reference's late-update skip (F3, ``ckan_crawler.py:168-171``),
    where staleness is judged against registered state instead.
    """
    stream = (
        spark.readStream.schema(schema).parquet(source_path)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
