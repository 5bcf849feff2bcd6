"""One-off A/B for a9's unpivot-to-one-join question (r16, verdict #7):
at sf0.1 the double self-join vs unpivot read marginal; this measures
both shapes on a 10x key-offset copy of the operators/queries corpus
(the sf1_sweep convention applied to the profile tables, in-memory) so
the saved child-side exchange's growth is visible.

  double — the shipped shape: joins x children on (query_id,left_child),
           then x children on (query_id,right_child)
  unpivot — explode each join into (side, child_id), join children ONCE
           on (query_id, child_id), re-pivot by (query_id, id)

Equality: exceptAll both ways on the 1x corpus before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.corpus import (
        corpus_operators,
        corpus_queries,
    )
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("a9-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_scan_cache(spark, sf_dir)

    def widen(df, copies):
        if copies == 1:
            return df
        c = spark.range(copies).select(F.col("id").alias("copy"))
        return df.crossJoin(c).withColumn(
            "query_id", F.concat_ws("#", F.col("copy").cast("string"), "query_id")
        ).drop("copy")

    def classified(ops, q, unpivot: bool):
        joins = ops.filter(F.col("name").isin("HASH JOIN", "CROSS JOIN")).join(q, "query_id")
        children = ops.select(
            "query_id", F.col("id").alias("child_id"),
            (F.col("num_rows") * F.col("row_size")).alias("child_bytes"),
        )
        if not unpivot:
            j = (
                joins.alias("j")
                .join(children.alias("l"),
                      (F.col("j.query_id") == F.col("l.query_id"))
                      & (F.col("j.left_child_id") == F.col("l.child_id")))
                .join(children.alias("r"),
                      (F.col("j.query_id") == F.col("r.query_id"))
                      & (F.col("j.right_child_id") == F.col("r.child_id")))
                .select(
                    F.col("j.query_id").alias("query_id"), F.col("j.id").alias("id"),
                    F.col("j.name").alias("name"), F.col("j.join_impl").alias("join_impl"),
                    F.col("j.num_hosts").alias("num_hosts"), F.col("j.avg_time").alias("avg_time"),
                    F.col("l.child_bytes").alias("left_bytes"),
                    F.col("r.child_bytes").alias("right_bytes"),
                )
            )
        else:
            sides = joins.select(
                "query_id", "id", "name", "join_impl", "num_hosts", "avg_time",
                F.explode(F.array(
                    F.struct(F.lit("l").alias("side"), F.col("left_child_id").alias("child_id")),
                    F.struct(F.lit("r").alias("side"), F.col("right_child_id").alias("child_id")),
                )).alias("s"),
            ).select("query_id", "id", "name", "join_impl", "num_hosts",
                     "avg_time", "s.side", "s.child_id")
            j = (
                sides.join(children, ["query_id", "child_id"])
                .groupBy("query_id", "id", "name", "join_impl", "num_hosts", "avg_time")
                .agg(
                    F.max(F.when(F.col("side") == "l", F.col("child_bytes"))).alias("left_bytes"),
                    F.max(F.when(F.col("side") == "r", F.col("child_bytes"))).alias("right_bytes"),
                )
                .filter(F.col("left_bytes").isNotNull() & F.col("right_bytes").isNotNull())
            )
        bcost = F.least("left_bytes", "right_bytes") * F.col("num_hosts")
        pcost = F.col("left_bytes") + F.col("right_bytes")
        wrong_impl = F.when(bcost == pcost, F.lit(False)).otherwise(
            F.when(bcost < pcost, F.col("join_impl") != "BROADCAST").otherwise(
                F.col("join_impl") != "PARTITIONED"))
        wrong_side = ((F.col("join_impl") == "BROADCAST")
                      & (F.col("left_bytes") < F.col("right_bytes")))
        cls = j.withColumn(
            "classification",
            F.when(wrong_impl, "wrong_impl").when(wrong_side, "wrong_side")
            .otherwise("correct"))
        return (
            cls.groupBy("classification")
            .agg(F.count("*").alias("num_joins"), F.sum("avg_time").alias("total_time"))
            .select("classification", "num_joins",
                    F.expr("CAST(FLOOR(total_time / CAST(1000000 AS DOUBLE)) AS BIGINT)")
                    .alias("total_time_ms"))
        )

    q1 = corpus_queries(spark, sf_dir).filter(F.col("tag") == "tpch").select("query_id")
    ops1 = corpus_operators(spark, sf_dir)
    a = classified(ops1, q1, False)
    b = classified(ops1, q1, True)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()

    out = {"exceptAll_diff_1x": diff}
    for copies in (1, 10):
        ops = widen(ops1, copies)
        q = widen(q1, copies)
        for name, unpivot in (("double", False), ("unpivot", True)):
            build = lambda: classified(ops, q, unpivot)  # noqa: E731
            build().write.format("noop").mode("overwrite").save()
            times = []
            for r in range(3):
                spark.sparkContext.setJobDescription(f"a9:{name}x{copies}:rep{r}")
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 4))
            out[f"{name}_x{copies}"] = {"best": min(times), "reps": times}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
