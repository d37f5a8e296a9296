"""Every PERMANENTLY-QUEUED query vs its DuckDB oracle at sf0.001 —
the same fingerprint compare as the registered suite
(tests/test_queries_oracle.py), one parametrized test node per queued
pair (round-10 verdict #5: a fixture regen cannot silently strand a
waived pair — the sweep fails loudly in `pytest -q`).

These five pairs are the registry end-state's permanent residue
(`plans/queue_permanent.py` docstring carries the full policy): each
is a variant/composition of a registered row, the driver verifies the
base row every <=2 rounds, and THIS sweep re-proves the variant's own
full fingerprint every round."""

from __future__ import annotations

import duckdb
import pytest

from syncquill_spark.plans.queue_permanent import QUEUE_ORACLES, QUEUE_QUERIES
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
    # the end-state contract: the five declared permanent pairs plus
    # the r12 additions curation_url_dedup and dedup_fuzzy_names, the
    # r14 addition multimodal_triage, the r15 addition
    # multimodal_media_pairs, and the r16 addition
    # multimodal_video_pairs (the queue may grow; the REGISTRY stays
    # frozen at 142)
    assert sorted(QUEUE_QUERIES) == [
        "curation_temperature_mix",
        "curation_url_dedup",
        "dedup_fuzzy_names",
        "multimodal_media_pairs",
        "multimodal_triage",
        "multimodal_video_pairs",
        "similarity_topk_rerank",
        "text_bigram_pruned_gate",
        "text_lines_dedup",
        "text_normalize",
    ]


@pytest.mark.parametrize("name", sorted(QUEUE_QUERIES))
def test_queued_query_matches_oracle(spark, sf_dir, duck, name):
    spark_pdf = QUEUE_QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(QUEUE_ORACLES[name]).df()
    assert fingerprint(spark_pdf) == fingerprint(duck_pdf)
