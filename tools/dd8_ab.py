"""One-off A/B for dd8/_shared_components (r16): the CC build re-executes
dd3's banded LSH + exact verify even when _shared_minhash_pairs already
holds the identical verified pair set in the session — the pairs cost is
paid twice per session. Variant: edges come from the shared pairs frame.

Timed in bench order (shingles, jaccard3, minhash_pairs warm first), so
the reading is the _shared_components build cost the bench publishes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant_components(spark, sf_dir):
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _CC_MAX_ITERS,
        _shared_minhash_pairs,
    )

    pairs = _shared_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.localCheckpoint(eager=True)
    labels = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_CC_MAX_ITERS):
        neigh = labels.join(edges, labels["doc_id"] == edges["src"]).select(
            F.col("dst").alias("doc_id"), "label"
        )
        new_labels = (
            labels.select("doc_id", "label")
            .unionByName(neigh)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old"), "doc_id"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("component_id"))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _shared_jaccard3,
        _shared_minhash_pairs,
        _shared_shingles,
        neardup_components,
    )
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("dd8-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_scan_cache(spark, sf_dir)
    for fn in (_shared_shingles, _shared_jaccard3, _shared_minhash_pairs):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    cur = neardup_components(spark, sf_dir)
    new = variant_components(spark, sf_dir)
    diff = cur.exceptAll(new).count() + new.exceptAll(cur).count()

    out = {"exceptAll_diff": diff}
    for name, fn in (("current", neardup_components),
                     ("shared_pairs", variant_components)):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for r in range(3):
            spark.sparkContext.setJobDescription(f"dd8:{name}:rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        out[name] = {"best": min(times), "reps": times}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
