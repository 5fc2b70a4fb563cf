"""Command-line entry points.

``python3 -m distributed_web_search_engine_crawler_indexing_pagerank__spark.cli crawl`` runs a
tiny end-to-end crawl against the deterministic synthetic pseudo-web and
prints a per-wave trace summary — the quickest way to see the whole
scheduler working. ``bench-crawl`` runs the throughput replay.
"""

from __future__ import annotations

import argparse
import json
import tempfile


def _cmd_crawl(args) -> None:
    from .catalog import Catalog
    from .oracle.simulator import CrawlConfig
    from .plans.crawl import SparkCrawler
    from .session import get_spark
    from . import webgen

    spark = get_spark("cli-crawl", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    pages, responses, robots = webgen.gen_web_local(args.seed, args.hosts, args.pages)
    cfg = CrawlConfig(
        target_pages=args.target,
        max_pages_per_host=args.host_cap,
        max_waves=args.waves,
        strict_robots=True,
    )
    workdir = args.workdir or tempfile.mkdtemp(prefix="crawl-cli-")
    crawler = SparkCrawler(
        spark,
        Catalog(workdir),
        spark.createDataFrame(responses),
        spark.createDataFrame(robots),
        cfg,
        n_bloom_shards=4,
        checkpoint_interval=args.checkpoint_interval,
    )
    crawler.init_from_seeds(webgen.seed_urls(args.seed, args.hosts, args.pages, args.seeds))
    crawler.run(verbose=True)
    trace = crawler.cat.read(spark, "trace")
    print("\noutcomes:")
    for row in trace.groupBy("outcome").count().orderBy("outcome").collect():
        print(f"  {row['outcome']}: {row['count']}")
    print(f"pages fetched: {crawler.total_pages()}")
    print(f"catalog: {workdir}")


def _cmd_bench_crawl(args) -> None:
    from .benchmarks import run_crawl_bench
    from .session import get_spark

    spark = get_spark("cli-bench", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    res = run_crawl_bench(
        spark,
        n_hosts=args.hosts,
        pages_base=args.pages,
        n_seeds=args.seeds,
        waves=args.waves,
        heft=args.heft,
        partitions=args.cores,
        checkpoint_interval=args.checkpoint_interval,
    )
    print(json.dumps(res))


def _cmd_curate(args) -> None:
    """End-to-end training-data curation pass over a documents parquet:
    quality filter → exact dedup → near-dup clustering (shingle Jaccard
    → connected components) → per-language stratified quota — printing
    the funnel counts at each stage (the pipeline a 100-TB corpus would
    run, at toy scale)."""
    from pyspark.sql import functions as F

    from .operators.curate import curate_funnel
    from .session import get_spark

    spark = get_spark("cli-curate", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.input)
    total = docs.count()

    eval_ids = docs.where(F.col("doc_id") % args.eval_mod == 0).select("doc_id")
    stages = curate_funnel(
        docs, eval_ids, min_jaccard=args.min_jaccard, quota=args.quota
    )
    print(f"documents:            {total}")
    print(f"after quality filter: {stages['quality'].count()}")
    print(f"after decontaminate:  {stages['clean'].count()}")
    print(f"after exact dedup:    {stages['exact'].count()}")
    print(f"after near-dup drop:  {stages['neardup'].count()}")
    sampled = stages["sampled"]
    print(f"after lang quota:     {sampled.count()}")
    for r in sampled.groupBy("lang").count().orderBy("lang").collect():
        print(f"  {r['lang']}: {r['count']}")
    if args.out:
        stages["neardup"].join(sampled.select("doc_id"), "doc_id").write.mode(
            "overwrite"
        ).parquet(args.out)
        print(f"curated parquet: {args.out}")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="distributed_web_search_engine_crawler_indexing_pagerank__spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="tiny end-to-end crawl on the synthetic pseudo-web")
    c.add_argument("--seed", type=int, default=11)
    c.add_argument("--hosts", type=int, default=8)
    c.add_argument("--pages", type=int, default=12)
    c.add_argument("--seeds", type=int, default=4)
    c.add_argument("--target", type=int, default=60)
    c.add_argument("--host-cap", type=int, default=8)
    c.add_argument("--waves", type=int, default=25)
    c.add_argument("--cores", type=int, default=8)
    c.add_argument("--checkpoint-interval", type=int, default=1)
    c.add_argument("--workdir", default=None)
    c.set_defaults(fn=_cmd_crawl)

    b = sub.add_parser("bench-crawl", help="fetch-free frontier-replay throughput")
    b.add_argument("--hosts", type=int, default=2000)
    b.add_argument("--pages", type=int, default=12)
    b.add_argument("--seeds", type=int, default=2000)
    b.add_argument("--waves", type=int, default=3)
    b.add_argument("--heft", type=int, default=1)
    b.add_argument("--cores", type=int, default=8)
    b.add_argument("--checkpoint-interval", type=int, default=4)
    b.set_defaults(fn=_cmd_bench_crawl)

    cu = sub.add_parser(
        "curate",
        help="training-data curation funnel over a documents parquet "
        "(quality filter -> decontaminate -> exact dedup -> near-dup "
        "clustering -> lang quota)",
    )
    cu.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet")
    cu.add_argument("--min-jaccard", type=float, default=0.5)
    cu.add_argument(
        "--eval-mod",
        type=int,
        default=97,
        help="doc_id modulus defining the synthetic held-out eval set",
    )
    cu.add_argument("--quota", type=int, default=40)
    cu.add_argument("--cores", type=int, default=8)
    cu.add_argument("--out", default=None)
    cu.set_defaults(fn=_cmd_curate)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
