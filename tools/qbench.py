"""Isolated per-query bench: time one or more registered queries with the
exact bench.py protocol (untimed warm-up drain, then best-of-N noop
drains) without paying for the other 47 headliners — the measurement
loop for optimization A/Bs (guide §1: isolate each expensive query with
the noop sink).

Usage: python tools/qbench.py [--reps N] [--sf DIR] name [name ...]

Prints one JSON line {"queries": {name: best_sec}, "reps": N, "all":
{name: [rep..]}} so the full rep spread is visible (host noise on this
box swings single reps; the spread says whether a delta is real).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("qbench")
    qs = entrymod.queries()
    # same untimed scaffolding as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from impala_workload_analyzer_spark.corpus.builder import ensure_corpus
    from impala_workload_analyzer_spark.sources.profile_render import ensure_profiles
    from impala_workload_analyzer_spark.sources.profiles import materialized_table
    ensure_scan_cache(spark, sf_dir)
    ensure_corpus(spark, sf_dir)
    ensure_profiles(spark, sf_dir)
    for table in ("queries", "operators"):
        materialized_table(spark, sf_dir, table)

    out: dict[str, float] = {}
    allreps: dict[str, list[float]] = {}
    for name in names:
        build = lambda: qs[name](spark, sf_dir)  # noqa: E731
        spark.sparkContext.setJobDescription(f"qbench:{name}:warmup")
        build().write.format("noop").mode("overwrite").save()
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qbench:{name}:rep{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        out[name] = min(times)
        allreps[name] = times
    print(json.dumps({"queries": out, "reps": reps, "all": allreps}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
