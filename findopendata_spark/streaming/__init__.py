"""Structured Streaming surface (SURVEY §2.8).

The reference is batch-iterative (Celery scroll tasks + timestamped
upserts); its streaming-shaped concerns map to:

- micro-batch     → the crawler's driver wave loop (crawler/wave.py)
- late data       → timestamp-conditioned MERGE (catalog.merge_upsert)
- exactly-once    → atomic wave commits (catalog.commit_wave)

This package adds the genuinely-streaming path for event feeds:
watermarked tumbling-window aggregation over a file stream with
``availableNow`` (the replay-batch trigger) — the idiomatic Spark shape
the wave loop upgrades to when input arrives continuously.
"""

from findopendata_spark.streaming.windows import windowed_event_counts  # noqa: F401
