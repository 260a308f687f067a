"""Summarize a Spark rolling event log: per-stage wall, task-time sums,
CPU, GC, shuffle bytes, and gaps between stages (driver think-time).

Usage: python tools/analyze_eventlog.py <app_id> [topN]
Reads /tmp/spark-events/eventlog_v2_<app_id>/.
"""

from __future__ import annotations

import glob
import os
import json
import subprocess
import sys


def lines(path: str):
    if path.endswith(".zstd"):
        proc = subprocess.run(["zstd", "-dc", path], capture_output=True, text=True)
        yield from proc.stdout.splitlines()
    else:
        with open(path) as fh:
            yield from fh


def main() -> None:
    app = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    files = sorted(
        glob.glob(f"/tmp/spark-events/eventlog_v2_{app}/events_*")
        or glob.glob(os.path.join(app, "events_*"))
        or ([app] if os.path.isfile(app) else [])
    )
    stages: dict[int, dict] = {}
    tm: dict[int, dict] = {}
    jobs: list[dict] = []
    stage_job: dict[int, int] = {}
    for f in files:
        for line in lines(f):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                for sid in e.get("Stage IDs", []):
                    stage_job[sid] = jid
                jobs.append(
                    dict(
                        id=jid,
                        t=e.get("Submission Time", 0),
                        desc=(e.get("Properties") or {}).get(
                            "spark.job.description", ""
                        )[:60],
                        call=(e.get("Properties") or {}).get("callSite.short", ""),
                    )
                )
            elif ev == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == e["Job ID"]:
                        j["end"] = e.get("Completion Time", 0)
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = dict(
                    name=si["Stage Name"].split()[0],
                    sub=si.get("Submission Time", 0),
                    done=si.get("Completion Time", 0),
                    tasks=si["Number of Tasks"],
                )
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                d = tm.setdefault(
                    e["Stage ID"],
                    dict(run=0.0, cpu=0.0, gc=0.0, n=0, shr=0, shw=0, inp=0, maxrun=0.0),
                )
                run = m.get("Executor Run Time", 0) / 1000
                d["run"] += run
                d["maxrun"] = max(d["maxrun"], run)
                d["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                d["gc"] += m.get("JVM GC Time", 0) / 1000
                d["n"] += 1
                sr = m.get("Shuffle Read Metrics") or {}
                d["shr"] += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                d["shw"] += sw.get("Shuffle Bytes Written", 0)
                inp = m.get("Input Metrics") or {}
                d["inp"] += inp.get("Bytes Read", 0)

    order = sorted(stages.items(), key=lambda kv: kv[1]["sub"])
    t0 = order[0][1]["sub"] if order else 0
    total_gap = 0.0
    prev_done = t0
    rows = []
    for sid, s in order:
        gap = max(0.0, (s["sub"] - prev_done) / 1000)
        total_gap += gap
        prev_done = max(prev_done, s["done"])
        d = tm.get(sid, {})
        rows.append((sid, s, d, gap))
    wall = (prev_done - t0) / 1000
    sum_stage = sum((s["done"] - s["sub"]) / 1000 for _, s in order)
    print(
        f"app={app} stages={len(stages)} span={wall:.1f}s "
        f"sum_stage_wall={sum_stage:.1f}s inter-stage gap={total_gap:.1f}s"
    )
    print(
        f"{'stage':>5} {'t+':>7} {'wall':>7} {'gap':>6} {'tasks':>5} {'run':>8} "
        f"{'maxtask':>8} {'cpu':>8} {'gc':>6} {'shR':>7} {'shW':>7} {'in':>7}  name"
    )
    by_dur = sorted(rows, key=lambda r: -(r[1]["done"] - r[1]["sub"]))[:top]
    keep = {r[0] for r in by_dur}
    for sid, s, d, gap in rows:
        if sid not in keep and gap < 0.5:
            continue
        dur = (s["done"] - s["sub"]) / 1000
        print(
            f"{sid:5d} {(s['sub']-t0)/1000:7.1f} {dur:7.1f} {gap:6.1f} {s['tasks']:5d} "
            f"{d.get('run',0):8.1f} {d.get('maxrun',0):8.1f} {d.get('cpu',0):8.1f} "
            f"{d.get('gc',0):6.1f} {d.get('shr',0)/1e6:7.0f} {d.get('shw',0)/1e6:7.0f} "
            f"{d.get('inp',0)/1e6:7.0f}  j{stage_job.get(sid,-1)} {s['name']}"
        )
    print("\njobs (gaps between job end and next job start):")
    jobs.sort(key=lambda j: j["t"])
    prev = t0
    for j in jobs:
        jgap = max(0.0, (j["t"] - prev) / 1000)
        dur = (j.get("end", j["t"]) - j["t"]) / 1000
        if jgap >= 0.4 or dur >= 2.0:
            print(
                f"  j{j['id']:<3d} t+{(j['t']-t0)/1000:7.1f} gap={jgap:6.1f} "
                f"dur={dur:6.1f}  {j['call']}  {j['desc']}"
            )
        prev = max(prev, j.get("end", j["t"]))


if __name__ == "__main__":
    main()
