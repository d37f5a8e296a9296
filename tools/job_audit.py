"""Per-query Spark JOB count audit — the fixed-cost lever.

At bench scale (sf0.1: 5k docs / 1.5 MB text) most registered queries
are dominated by per-job fixed cost (scheduling, barriers), not data.
At cluster scale every job is a synchronization barrier too, so an
avoidable action (an eager materialization, a sequential write that
could overlap) costs wall-clock at EVERY scale. This tool counts the
jobs each query's single noop-sink action actually schedules, via
job-group tagging + the status tracker — queries whose job count is
far above the registry median are the candidates worth reading.

Usage: python tools/job_audit.py [--sf DIR] [query ...]
Prints one JSON line per query: {"query": ..., "jobs": N, "sec": t}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syncquill_spark import get_spark  # noqa: E402
from syncquill_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":  # two-token form: --sf DIR (ADVICE r16)
            i += 1
            if i >= len(argv):
                sys.exit("--sf requires a directory argument")
            sf_dir = argv[i]
        else:
            args.append(a)
        i += 1
    names = args or sorted(QUERIES)

    spark = get_spark("syncquill-job-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from syncquill_spark.operators._cache import release_cached_intermediates

    for name in names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        group = f"audit-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        release_cached_intermediates()
        print(json.dumps({"query": name, "jobs": jobs, "sec": round(sec, 3)}), flush=True)


if __name__ == "__main__":
    main()
