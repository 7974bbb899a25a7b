"""Crawler engine: URL frontier + fetch scheduler (BASELINE.json north rule).

Re-expresses the reference harvester's Celery-task dataflow
(``harvest_datasets.py:16-19`` → ``ckan_crawler.py`` /
``socrata_crawler.py`` task fan-out over RabbitMQ, state in Postgres) as a
deterministic per-wave Spark job:

- Celery task boundary  → DataFrame stage boundary (shuffle)
- RabbitMQ queue        → frontier table (snapshot-versioned)
- Postgres upsert       → seen/frontier MERGE inside one atomic wave commit
- ``-Ofair`` scheduling → explicit host-keyed politeness window + salting
- task log lines        → lineage rows per (wave, host_shard)
"""

from findopendata_spark.crawler.wave import (  # noqa: F401
    CrawlState,
    crawl,
    recrawl_stale,
    run_wave,
)
from findopendata_spark.crawler.graph import GraphConfig, seed_frontier  # noqa: F401
