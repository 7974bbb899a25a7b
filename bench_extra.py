"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink isolation + collect timing + .explain("formatted") capture.

NOT part of the frozen measurement contract (bench.py is); numbers from
here are cited in OPTIMIZATION_r06.md. Usage:

    python bench_extra.py [--sf DIR] [--runs N] [--plans OUTDIR] \
        [--mode collect|noop|both] [q34_embedding_near_dup ...]

With no query names, runs the full registry. Prints one JSON line with
per-query seconds (best-of-N) for the chosen mode(s).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>.txt explain output")
    ap.add_argument("--mode", default="collect",
                    choices=["collect", "noop", "both"])
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from findopendata_spark.session import get_spark

    spark = get_spark("bench-extra", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    qs = entry.queries()
    names = args.names or sorted(qs)
    out: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(name)
        rec: dict = {}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = q(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if args.mode in ("collect", "both"):
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                q(spark, args.sf).collect()
                best = min(best, time.time() - t0)
            rec["collect"] = round(best, 3)
        if args.mode in ("noop", "both"):
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                q(spark, args.sf).write.format("noop").mode(
                    "overwrite").save()
                best = min(best, time.time() - t0)
            rec["noop"] = round(best, 3)
        out[name] = rec
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": args.sf, "runs": args.runs, "queries": out}))


if __name__ == "__main__":
    main()
