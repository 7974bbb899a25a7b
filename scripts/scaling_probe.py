"""Probe crawl scaling under different master topologies.

Runs the bench crawl (same cfg as bench.py) in a fresh subprocess per
configuration and prints wall/throughput for each. Usage:

    python scripts/scaling_probe.py local[4] local[16] \
        local-cluster[1,4,6144] local-cluster[4,4,6144]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
master = %(master)r
cores = %(cores)d
from findopendata_spark.session import get_spark
from findopendata_spark.config import CrawlConfig
from findopendata_spark.crawler import crawl
from findopendata_spark.crawler.graph import GraphConfig
from pyspark.sql import functions as F

shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
spark = get_spark(
    "probe", cores=cores, shuffle_partitions=2 * cores, master=master,
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": os.path.join(shm, "spark-local"),
    },
)
cfg = CrawlConfig(per_host_wave_budget=30_000, hot_host_salt=32)
gcfg = GraphConfig(graph_size=8_000_000, out_links_min=8, out_links_max=24)
wd = tempfile.mkdtemp(prefix="probe-warm-", dir=shm)
crawl(spark, wd, waves=1, cfg=CrawlConfig(per_host_wave_budget=500, hot_host_salt=32),
      gcfg=gcfg, bulk_seeds=10_000)
shutil.rmtree(wd, ignore_errors=True)
d = tempfile.mkdtemp(prefix="probe-crawl-", dir=shm)
try:
    t0 = time.time()
    state = crawl(spark, d, waves=1, cfg=cfg, gcfg=gcfg, bulk_seeds=700_000)
    wall = time.time() - t0
    lin = state.cat.read_appended(spark, "lineage")
    agg = lin.agg(F.sum("urls_candidates").alias("s"),
                  F.sum("urls_deduped").alias("d")).collect()[0]
    work = int(agg["s"]) + int(agg["d"])
    print("PROBEJSON:" + json.dumps({
        "master": master, "wall_s": round(wall, 2), "work": work,
        "urls_per_s": round(work / wall, 1)}))
finally:
    shutil.rmtree(d, ignore_errors=True)
    spark.stop()
"""


def run(master: str) -> dict:
    if master.startswith("local-cluster"):
        cores = int(master.split("[")[1].split(",")[0]) * int(
            master.split(",")[1]
        )
    else:
        cores = int(master.split("[")[1].rstrip("]"))
    code = CHILD % {"repo": REPO, "master": master, "cores": cores}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PROBEJSON:"):
            return json.loads(line[len("PROBEJSON:"):])
    print(out.stdout[-3000:])
    print(out.stderr[-3000:])
    raise RuntimeError(f"probe failed for {master}")


if __name__ == "__main__":
    results = []
    for m in sys.argv[1:]:
        r = run(m)
        results.append(r)
        print(json.dumps(r))
    print(json.dumps(results))
