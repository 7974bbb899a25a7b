"""Aggregate per-stage task metrics from a Spark event log.

Usage: python scripts/evlog_stages.py /tmp/evlog/<app-file> [min_wall_s]

Prints one line per stage: wall, task count, sum/mean/max task run time,
executor CPU, GC, shuffle read/write bytes, input bytes, and the stage
name — max_task ~ wall exposes granularity/skew; cpu << run exposes
waiting (python workers, shuffle fetch, spill).
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    if path.endswith(".zstd"):
        import subprocess

        raw = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        ).stdout.decode()
        lines = raw.splitlines()
    else:
        lines = open(path, encoding="utf-8", errors="replace").read().splitlines()

    stages: dict[tuple[int, int], dict] = {}
    for ln in lines:
        try:
            ev = json.loads(ln)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "submit": si.get("Submission Time"),
                "tasks": 0, "run": 0.0, "cpu": 0.0, "gc": 0.0,
                "max_task": 0.0, "sh_read": 0, "sh_write": 0,
                "input": 0, "spill": 0, "py_total": 0.0,
            }
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            st = stages.get((si["Stage ID"], si["Stage Attempt ID"]))
            if st:
                sub = si.get("Submission Time") or st["submit"]
                comp = si.get("Completion Time")
                st["wall"] = (comp - sub) / 1e3 if (sub and comp) else None
        elif k == "SparkListenerTaskEnd":
            st = stages.get((ev["Stage ID"], ev["Stage Attempt ID"]))
            tm = ev.get("Task Metrics")
            if not (st and tm):
                continue
            run = tm.get("Executor Run Time", 0) / 1e3
            st["tasks"] += 1
            st["run"] += run
            st["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
            st["gc"] += tm.get("JVM GC Time", 0) / 1e3
            st["max_task"] = max(st["max_task"], run)
            st["sh_read"] += (
                tm.get("Shuffle Read Metrics", {}).get("Remote Bytes Read", 0)
                + tm.get("Shuffle Read Metrics", {}).get("Local Bytes Read", 0)
            )
            st["sh_write"] += tm.get("Shuffle Write Metrics", {}).get(
                "Shuffle Bytes Written", 0
            )
            st["input"] += tm.get("Input Metrics", {}).get("Bytes Read", 0)
            st["spill"] += tm.get("Disk Bytes Spilled", 0)

    rows = [
        (sid, st) for (sid, _a), st in stages.items()
        if st.get("wall") and st["wall"] >= min_wall
    ]
    rows.sort(key=lambda r: -r[1]["wall"])
    hdr = (
        "stage  wall_s tasks  sum_run  mean  max_task    cpu     gc "
        "shread_MB shwrite_MB input_MB spill_MB  name"
    )
    print(hdr)
    for sid, st in rows:
        n = max(st["tasks"], 1)
        print(
            f"{sid:5d} {st['wall']:7.1f} {st['tasks']:5d} "
            f"{st['run']:8.1f} {st['run']/n:5.1f} {st['max_task']:9.1f} "
            f"{st['cpu']:6.1f} {st['gc']:6.1f} "
            f"{st['sh_read']/2**20:9.0f} {st['sh_write']/2**20:10.0f} "
            f"{st['input']/2**20:8.0f} {st['spill']/2**20:8.0f}  {st['name']}"
        )


if __name__ == "__main__":
    main()
