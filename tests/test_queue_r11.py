"""Every R11-QUEUE query vs its DuckDB oracle at sf0.001 — the same
fingerprint compare as the registered suite (tests/test_queries_oracle.py),
run BEFORE registration so promoting a queued pair carries no
correctness risk."""

from __future__ import annotations

import duckdb
import pytest

from syncquill_spark.plans.queue_r11 import QUEUE_ORACLES, QUEUE_QUERIES
from tests.test_queries_oracle import TABLES, fingerprint


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_queue_is_consistent():
    assert set(QUEUE_QUERIES) == set(QUEUE_ORACLES)


@pytest.mark.parametrize("name", sorted(QUEUE_QUERIES))
def test_queued_query_matches_oracle(spark, sf_dir, duck, name):
    spark_pdf = QUEUE_QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(QUEUE_ORACLES[name]).df()
    assert fingerprint(spark_pdf) == fingerprint(duck_pdf)
