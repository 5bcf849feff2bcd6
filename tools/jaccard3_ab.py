"""One-off A/B for the _rare_pair_overlap broadcast-hint removal (r16):
time the _shared_jaccard3 build cold-on-warm-shingles (bench.py's
decomposition) and print the FINAL adaptive plan's join strategies so the
"AQE still broadcasts the doc-side attach at sf0.1 without the hint"
claim is measured, not assumed.

Usage: python tools/jaccard3_ab.py [--sf DIR]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from impala_workload_analyzer_spark import cache_util
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _shared_jaccard3,
        _shared_shingles,
    )
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("jaccard3-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_scan_cache(spark, sf_dir)
    _shared_shingles(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def evict(tag: str) -> None:
        for key in [k for k in cache_util._DF_CACHE if k[2] == tag]:
            cache_util._DF_CACHE.pop(key).unpersist(blocking=True)

    times = []
    for r in range(3):
        evict("jaccard3")
        spark.sparkContext.setJobDescription(f"jaccard3 cold build rep{r}")
        t0 = time.perf_counter()
        _shared_jaccard3(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))

    # final adaptive plan of the raw (unpersisted) pipeline: collect a
    # fresh lineage so AQE runs end-to-end and finalizes join strategies
    from impala_workload_analyzer_spark.pipeline.dedup import _ngram_jaccard_of

    df = _ngram_jaccard_of(_shared_shingles(spark, sf_dir))
    df.collect()
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    joins = sorted(set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", txt)))
    counts = {j: txt.count(j) for j in joins}
    print(json.dumps({"build_reps": times, "best": min(times),
                      "final_plan_joins": counts,
                      "is_final": "isFinalPlan=true" in txt}))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r16", "dd2_ngram_jaccard_pairs_after_final.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
