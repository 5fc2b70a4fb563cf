#!/usr/bin/env python3
"""spark-submit driver: runs the crawl CLI inside a Spark deployment.

The package itself ships via ``--py-files`` (see ``scripts/submit_crawl.sh``)
— this file is only the thin application entry spark-submit requires. On a
real cluster the same invocation fans the Arrow/pandas UDF kernels out to
executors; the session factory's ``local[N]`` master is overridden by
whatever ``--master`` spark-submit passes.
"""

import sys

from distributed_web_search_engine_crawler_indexing_pagerank__spark import cli

if __name__ == "__main__":
    cli.main(sys.argv[1:])
