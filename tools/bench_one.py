"""Isolated repeat timing for individual registered queries — the
A/B measurement harness for optimization work (guide §1: measure
first, re-measure after).

Replicates bench.py's per-query methodology exactly (clearCache +
driver GC before each timed run, noop sink as the action, job
description labels) but runs ONE query several times so a claim about
a specific query rides repeats, not the single-shot full-registry run
whose +/-15% VM envelope swallows per-query deltas.

Usage: python tools/bench_one.py [--repeats N] [--sf DIR] query [query ...]
Prints one JSON line per query: {"query": ..., "times": [...], "median": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syncquill_spark import get_spark  # noqa: E402
from syncquill_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("syncquill-bench-one")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: parquet reader + one shuffle + codegen
    from pyspark.sql import functions as F

    warm = spark.read.parquet(os.path.join(args.sf, "region.parquet"))
    (
        warm.join(warm.selectExpr("r_regionkey as k"), warm["r_regionkey"] == F.col("k"))
        .groupBy("r_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    from syncquill_spark.functions.vectors import dot_arrow

    spark.range(0, 32, 1, 32).selectExpr(
        "array(cast(id as double)) as a", "array(cast(id as double)) as b"
    ).select(dot_arrow("a", "b")).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = QUERIES.get(name)
        if fn is None:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        times: list[float] = []
        for i in range(args.repeats):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"bench_one {name} rep{i}")
            t0 = time.time()
            try:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(
                    json.dumps(
                        {"query": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
                    )
                )
                break
            times.append(round(time.time() - t0, 3))
        else:
            print(
                json.dumps(
                    {
                        "query": name,
                        "times": times,
                        "median": round(statistics.median(times), 3),
                    }
                ),
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
