"""Driver contract for the spark-graft builder (PySpark target).

``entry`` — flagship smoke query (the scheduler's politeness window over
a synthesized frontier at sf0.001). ``queries``/``oracle_sql`` — the full
operator registry with DuckDB oracles, defined in
``distributed_web_search_engine_crawler_indexing_pagerank__spark.queries`` (one entry per
implemented operator from SURVEY.md §2 plus the training-data operator
families). The end-to-end crawl itself is exercised by the pytest
trace-equality suite and by ``bench.py`` (it is iterative/stateful, not a
single-DataFrame query).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_web_search_engine_crawler_indexing_pagerank__spark.queries import (
    oracle_sql as _oracle_sql,
    queries as _queries,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = _queries()["q_politeness_window"]
    return q(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
