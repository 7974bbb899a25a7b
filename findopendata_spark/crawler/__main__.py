"""spark-submit entry point for the crawl scheduler.

    spark-submit --py-files findopendata_spark.zip \
        -m ... findopendata_spark/crawler/__main__.py \
        --state-dir /data/crawl --waves 10 --bulk-seeds 1000000

or locally: ``python -m findopendata_spark.crawler --state-dir /tmp/c``.
Resumes automatically from the last committed wave in --state-dir
(north rule: exact resume; see catalog.SnapshotCatalog).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="findopendata_spark crawler")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--bulk-seeds", type=int, default=0,
                    help="0 = portal seed list; N = synthetic N-URL frontier")
    ap.add_argument("--budget", type=int, default=None,
                    help="per-host per-wave fetch budget")
    ap.add_argument("--graph-size", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from findopendata_spark.config import CrawlConfig
    from findopendata_spark.crawler import crawl
    from findopendata_spark.crawler.graph import GraphConfig
    from findopendata_spark.session import get_spark

    cfg = CrawlConfig(
        **({"per_host_wave_budget": args.budget} if args.budget else {})
    )
    gcfg = (
        GraphConfig(graph_size=args.graph_size) if args.graph_size else GraphConfig()
    )
    spark = get_spark("crawler", cores=args.cores)
    t0 = time.time()
    state = crawl(
        spark, args.state_dir, waves=args.waves, cfg=cfg, gcfg=gcfg,
        bulk_seeds=args.bulk_seeds,
        log=lambda s: print(json.dumps(s), flush=True),
    )
    print(json.dumps({
        "done": True,
        "last_wave": state.cat.current_wave(),
        "wall_s": round(time.time() - t0, 2),
        # which master actually ran: under spark-submit this must be the
        # launcher's --master (session.get_spark skips .master() when it
        # detects the launcher env), not a local[cores] override
        "master": spark.sparkContext.master,
    }))


if __name__ == "__main__":
    main()
