from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syncquill_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small parallelism: unit-test tables are tiny; 4 threads beats 32
    # on fixed per-task overhead.
    s = get_spark("syncquill-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def make_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)
