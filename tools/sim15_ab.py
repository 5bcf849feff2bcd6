"""One-off A/B for sim15/sim16's rerank tier (r16): the exact-rerank
joins the full embeddings scan twice with the norm computed on EVERY
corpus row before the join, though only queries x pool rows survive.
Variant: join raw vectors first, compute both norms (identical sqrt(dot)
expressions) on the surviving pool rows only — same arithmetic on the
same rows, bit-identical sim.

Timed warm-marginal on the persisted ranked frame (the state sim16's
tier and the bench tier probe execute in), plus the live sim15 shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def deferred_variant(spark, sf_dir, ranked):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.similarity import (
        _RERANK_POOL,
        _TOP_K,
        _spark_dot,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pool = (
        ranked.filter(F.col("rank") <= _RERANK_POOL)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").alias("adc_rank"))
    )
    q = emb.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("qv"))
    n = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("nv"))
    scored = (
        F.broadcast(pool)
        .join(q, "query_id")
        .join(n, "neighbor_id")
        .withColumn("qn", F.expr(f"sqrt({_spark_dot('qv', 'qv')})"))
        .withColumn("nn", F.expr(f"sqrt({_spark_dot('nv', 'nv')})"))
        .withColumn(
            "sim",
            F.round(F.expr(_spark_dot("qv", "nv")) / (F.col("qn") * F.col("nn")), 9),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", "sim", "adc_rank")
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.pipeline.similarity import (
        _ivfpq_ranked_shared,
        _ivfpq_rerank_of,
    )
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("sim15-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_scan_cache(spark, sf_dir)
    ranked = _ivfpq_ranked_shared(spark, sf_dir)
    ranked.write.format("noop").mode("overwrite").save()

    cur = _ivfpq_rerank_of(spark, sf_dir, ranked)
    new = deferred_variant(spark, sf_dir, ranked)
    diff = cur.exceptAll(new).count() + new.exceptAll(cur).count()

    out = {"exceptAll_diff": diff}
    for name, fn in (("current", lambda: _ivfpq_rerank_of(spark, sf_dir, ranked)),
                     ("deferred", lambda: deferred_variant(spark, sf_dir, ranked))):
        fn().write.format("noop").mode("overwrite").save()
        times = []
        for r in range(4):
            spark.sparkContext.setJobDescription(f"sim15:{name}:rep{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        out[name] = {"best": min(times), "reps": times}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
