from __future__ import annotations

import os
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


@pytest.fixture(scope="session")
def spark():
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="tests", cores=int(os.environ.get("TEST_CORES", "8")))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
