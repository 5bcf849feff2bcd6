"""One-off A/B for the _sql_features persist cut (r16, verdict #1):
time three cold builds of the shared parsed-feature frame at sf0.1 —

  full    persist(sql_features(...))                  (r15 shape)
  select  persist(sql_features(...).select(11 cols))  (narrow cache, wide Arrow)
  narrow  persist(narrow mapInPandas twin)            (narrow cache + narrow Arrow)

plus the bare un-persisted parse as the floor. Each variant: evict, then
persist + noop drain, best-of-3 (persist materialization is the cost under
test, so every rep is cold).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARED = (
    "query_id", "stmt_type", "parameterized_stmt",
    "num_output_columns", "num_limits", "num_where_binary_eq",
    "num_where_subqueries", "num_select_analytic_exprs",
    "num_where_like_like", "num_where_like_rlike", "num_where_like_regexp",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.session import get_spark
    from impala_workload_analyzer_spark.sources.profile_render import ensure_profiles
    from impala_workload_analyzer_spark.sources.profiles import materialized_table
    from impala_workload_analyzer_spark.sql_introspect.parser import (
        extract_sql_features,
    )
    from impala_workload_analyzer_spark.sql_introspect.queries import sql_features

    spark = get_spark("sqlfeat-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_scan_cache(spark, sf_dir)
    ensure_profiles(spark, sf_dir)
    materialized_table(spark, sf_dir, "queries")

    _S, _L = T.StringType(), T.LongType()
    narrow_schema = T.StructType(
        [T.StructField("query_id", _S), T.StructField("stmt_type", _S),
         T.StructField("parameterized_stmt", _S)]
        + [T.StructField(c, _L) for c in SHARED[3:]]
    )

    def narrow_run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for qid, stmt in zip(pdf["query_id"], pdf["sql_stmt"]):
                feats = extract_sql_features(stmt)
                if feats is None:
                    rows.append((qid, "UnparsedStmt", None) + (None,) * 8)
                    continue
                s = feats["stats"]
                if s is None:
                    rows.append((qid, feats["type"], feats["parameterized_stmt"])
                                + (None,) * 8)
                    continue
                like = s["num_where_like_predicates"]
                rows.append((
                    qid, feats["type"], feats["parameterized_stmt"],
                    s["num_output_columns"], s["num_limits"],
                    s["num_where_binary_predicates"]["="],
                    s["num_where_subqueries"], s["num_select_analytic_exprs"],
                    like["LIKE"], like["RLIKE"], like["REGEXP"],
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in narrow_schema.fields])

    def narrow_frame():
        q = (materialized_table(spark, sf_dir, "queries")
             .select("query_id", "sql_stmt")
             .repartition(spark.sparkContext.defaultParallelism))
        return q.mapInPandas(narrow_run, schema=narrow_schema)

    variants = {
        "bare_parse": (lambda: sql_features(spark, sf_dir), False),
        "full_persist": (lambda: sql_features(spark, sf_dir), True),
        "select_persist": (lambda: sql_features(spark, sf_dir).select(*SHARED), True),
        "narrow_persist": (narrow_frame, True),
    }
    out = {}
    for name, (build, do_persist) in variants.items():
        times = []
        for r in range(3):
            df = build()
            if do_persist:
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
            spark.sparkContext.setJobDescription(f"sqlfeat:{name}:rep{r}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            if do_persist:
                df.unpersist(blocking=True)
        out[name] = {"best": min(times), "reps": times}

    # value-equality spot check: narrow twin vs full-parse projection
    a = narrow_frame()
    b = sql_features(spark, sf_dir).select(*SHARED)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    out["narrow_vs_full_exceptAll"] = diff
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
