#!/usr/bin/env python3
"""Round-6 measurement harness (bench.py is FROZEN for the driver; this
file is the builder's instrument — guide §1).

Per headline query: noop-sink wall seconds (same protocol as bench.py)
plus ``.explain("formatted")`` dumped to plans/r06/<query>_<tag>.txt.
Optionally the crawl replay with its per-section wall profile.

Usage:
  python3 bench_extra.py --tag before [--only q_a,q_b] [--repeat 1]
      [--skip-crawl] [--no-plans]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402  (frozen list — reuse, don't copy)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.benchmarks import (  # noqa: E402
    run_crawl_bench,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.queries import (  # noqa: E402
    queries,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.session import (  # noqa: E402
    get_spark,
)

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--only", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--skip-crawl", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # identical warm protocol to bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    only = {s for s in args.only.split(",") if s}
    qmap = queries()
    names = [n for n in HEADLINE if (not only or n in only)]
    os.makedirs(PLANS_DIR, exist_ok=True)

    timings: dict[str, list[float]] = {}
    for name in names:
        for r in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings.setdefault(name, []).append(dt)
            if r == 0 and not args.no_plans:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            print(f"{name:28s} {dt:8.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)

    out = {
        "tag": args.tag,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "queries": {k: v for k, v in timings.items()},
        "queries_min": {k: min(v) for k, v in timings.items()},
        "total_first": round(sum(v[0] for v in timings.values()), 3),
    }

    if not args.skip_crawl and not only:
        fast = os.environ.get(
            "BENCH_CRAWL_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
        )
        crawl_params = dict(
            n_hosts=int(os.environ.get("BENCH_CRAWL_HOSTS", "20000")),
            pages_base=int(os.environ.get("BENCH_CRAWL_PAGES", "3")),
            n_seeds=int(os.environ.get("BENCH_CRAWL_SEEDS", "20000")),
            waves=int(os.environ.get("BENCH_CRAWL_WAVES", "3")),
            heft=int(os.environ.get("BENCH_CRAWL_HEFT", "60")),
            checkpoint_interval=int(os.environ.get("BENCH_CRAWL_CKPT", "4")),
            partitions=max(8, int(cpus) if str(cpus).isdigit() else 32),
        )
        workdir = tempfile.mkdtemp(prefix="crawlbench-", dir=fast) if fast else None
        try:
            spark.sparkContext.setJobDescription(f"crawl_replay [{args.tag}]")
            crawl = run_crawl_bench(spark, workdir=workdir, **crawl_params)
        finally:
            spark.sparkContext.setJobDescription(None)
            if workdir:
                shutil.rmtree(workdir, ignore_errors=True)
        out["crawl"] = crawl

    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
