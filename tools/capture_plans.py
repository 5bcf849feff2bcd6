"""Dump ``.explain("formatted")`` for the given registered queries to
``plans/<round>/<name>_<suffix>.txt`` — the optimization round's
before/after plan evidence (guide §1.1/§7.2).

Usage: python tools/capture_plans.py --suffix before [--round rN]
           [--sf DIR] [--final] name [...]
       (``all`` expands to every bench.py headliner)

``--final`` collects the query first and captures the ADAPTIVE final plan
(isFinalPlan=true) — the evidence for claims that hinge on a runtime AQE
decision (e.g. "AQE still broadcasts this join without the hard hint"),
which the static pre-execution plan cannot show. Only use it on queries
with small report-sized outputs (the collect is driver-side).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    suffix = "before"
    round_dir = "r16"
    final = False
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        elif args[i] == "--round":
            round_dir = args[i + 1]; i += 2
        elif args[i] == "--final":
            final = True; i += 1
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from bench import HEADLINERS
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.session import get_spark

    if names == ["all"]:
        names = list(HEADLINERS)

    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    from impala_workload_analyzer_spark.corpus.builder import ensure_corpus
    from impala_workload_analyzer_spark.sources.profile_render import ensure_profiles
    from impala_workload_analyzer_spark.sources.profiles import materialized_table
    ensure_scan_cache(spark, sf_dir)
    ensure_corpus(spark, sf_dir)
    ensure_profiles(spark, sf_dir)
    for table in ("queries", "operators"):
        materialized_table(spark, sf_dir, table)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        if final:
            df.collect()  # materialize so AQE finalizes every subplan
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
