#!/usr/bin/env python3
"""Profile the crawl-replay bench: where does non-scaling time go?

Runs run_crawl_bench in-process with Spark event logging, then parses the
event log to attribute wall-clock to:
- per-job wall time (submission → completion) and summed task time,
- gaps BETWEEN jobs (driver-only time: broadcast hash-table builds,
  collect post-processing, manifest IO, Python driver loops),
- Python-worker init / scan time accumulables.

Usage: python3 scripts/profile_crawl.py [--cores 4] [--hosts 20000]
       [--waves 3] [--heft 120]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--hosts", type=int, default=20000)
    ap.add_argument("--pages-base", type=int, default=3)
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--heft", type=int, default=120)
    ap.add_argument("--checkpoint-interval", type=int, default=4)
    ap.add_argument("--web-dir", default=None)
    args = ap.parse_args()
    web_dir = args.web_dir or os.path.join(
        "/tmp", f"benchweb-h{args.hosts}-p{args.pages_base}-f{args.heft}-s101"
    )
    os.makedirs(web_dir, exist_ok=True)

    evdir = tempfile.mkdtemp(prefix="crawl-ev-")
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.session import get_spark
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.benchmarks import (
        run_crawl_bench,
    )

    spark = get_spark(
        "profile-crawl",
        cores=args.cores,
        shuffle_partitions=args.cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    res = run_crawl_bench(
        spark,
        n_hosts=args.hosts,
        pages_base=args.pages_base,
        n_seeds=args.hosts,
        waves=args.waves,
        seed=101,
        partitions=args.cores,
        heft=args.heft,
        checkpoint_interval=args.checkpoint_interval,
        web_dir=web_dir,
    )
    wall = time.time() - t0
    print("RESULT", json.dumps(res))
    spark.stop()

    # ---- parse the event log --------------------------------------------
    files = sorted(glob.glob(f"{evdir}/*") + glob.glob(f"{evdir}/*/events_*"))
    events = []
    for f in files:
        if os.path.isdir(f):
            continue
        with open(f) as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    pass

    jobs: dict[int, dict] = {}
    task_time_by_stage: dict[int, float] = {}
    py_init_by_stage: dict[int, float] = {}
    gc_by_stage: dict[int, float] = {}
    stage_to_job: dict[int, int] = {}
    stage_names: dict[int, str] = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {
                "start": e["Submission Time"],
                "end": None,
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:80],
                "callsite": (e.get("Properties") or {}).get("callSite.short", ""),
            }
            for s in e.get("Stage Infos", []):
                stage_to_job[s["Stage ID"]] = jid
                stage_names[s["Stage ID"]] = s.get("Stage Name", "")[:60]
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            ti = e.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
            task_time_by_stage[sid] = task_time_by_stage.get(sid, 0.0) + dur
            tm = e.get("Task Metrics") or {}
            gc_by_stage[sid] = gc_by_stage.get(sid, 0.0) + tm.get("JVM GC Time", 0) / 1000.0
            for acc in ti.get("Accumulables", []):
                if "initialize Python" in str(acc.get("Name", "")):
                    try:
                        py_init_by_stage[sid] = py_init_by_stage.get(sid, 0.0) + float(
                            acc.get("Update", 0)
                        ) / 1000.0
                    except (TypeError, ValueError):
                        pass

    ordered = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    total_job_wall = 0.0
    total_gap = 0.0
    prev_end = None
    gaps = []
    rows = []
    for jid, j in ordered:
        if j["end"] is None:
            continue
        jw = (j["end"] - j["start"]) / 1000.0
        tt = sum(task_time_by_stage.get(s, 0.0) for s in j["stages"])
        total_job_wall += jw
        if prev_end is not None and j["start"] > prev_end:
            g = (j["start"] - prev_end) / 1000.0
            total_gap += g
            gaps.append((g, prev_jid, jid))
        prev_end, prev_jid = j["end"], jid
        rows.append((jw, tt, jid, j["callsite"] or j["desc"]))

    print(f"\n== wall {wall:.1f}s | sum job wall {total_job_wall:.1f}s | "
          f"inter-job gap {total_gap:.1f}s | jobs {len(ordered)}")
    print(f"== python-worker-init total {sum(py_init_by_stage.values()):.1f}s "
          f"(summed across tasks)")
    print(f"== jvm GC total {sum(gc_by_stage.values()):.1f}s (summed across tasks)")
    top_gc = sorted(gc_by_stage.items(), key=lambda kv: -kv[1])[:8]
    print("-- top GC stages:", [(s, round(v, 1)) for s, v in top_gc])
    print("\n-- top 15 jobs by wall (jobwall, tasksum, id, callsite):")
    for jw, tt, jid, cs in sorted(rows, reverse=True)[:15]:
        par = tt / jw if jw > 0 else 0
        print(f"  {jw:7.2f}s  tasks {tt:7.2f}s  x{par:4.1f}  job {jid:4d}  {cs}")
    print("\n-- top 15 inter-job gaps (sec, after job, before job):")
    for g, a, b in sorted(gaps, reverse=True)[:15]:
        print(f"  {g:7.2f}s  after job {a:4d} → before job {b:4d}  "
              f"({jobs[b]['callsite'] or jobs[b]['desc']})")
    print(f"\nevent log dir: {evdir}")


if __name__ == "__main__":
    main()
