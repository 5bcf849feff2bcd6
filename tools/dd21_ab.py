"""One-off A/B for dd21's verify+truth+rollup tail (r16, verdict #5):

  current — _verify_jaccard's exploded double-join (|cands| x doc_len
            intermediate) + re-join of pair_cfgs on (doc_a, doc_b)
  arrays  — per-doc shingle arrays attached to the pair_cfgs rows
            directly (two doc_id-keyed joins, AQE-broadcast at sf0.1),
            jaccard = size(array_intersect)/union inline — no explosion
            and no candidate re-join

Both run on warm shared frames (bench.py measures dd21 post-build, so
warm-marginal is the comparable state). Equality is checked with
exceptAll both ways before timings are trusted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def arrays_variant(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.corpus.corpus_sql import IDIV
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _DD21_BUCKET_CAP,
        _DD21_CONFIGS,
        _JACCARD_THRESHOLD,
        _N_HASHES,
        _P,
        _SPARK_H,
        _minhash_sig,
        _shared_jaccard3,
        _shared_shingles,
    )

    shingles = _shared_shingles(spark, sf_dir)
    sh = shingles.withColumn("hx", F.expr(_SPARK_H.format(x="shingle")) % _P)
    sig = _minhash_sig(sh)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nb).alias("n_bands"),
                        F.lit(j).alias("band_idx"),
                        F.concat_ws(
                            "_", *[F.col(f"h{j * r + k}") for k in range(r)]
                        ).alias("band_key"),
                    )
                    for nb, r in _DD21_CONFIGS
                    for j in range(nb)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.n_bands", "b.band_idx", "b.band_key")
    wb = Window.partitionBy("n_bands", "band_idx", "band_key")
    sized = bands.withColumn("bsz", F.count("*").over(wb).cast("bigint"))
    hot_stats = (
        sized.filter(F.col("bsz") > _DD21_BUCKET_CAP)
        .groupBy("n_bands", "band_idx", "band_key")
        .agg(F.max("bsz").alias("bsz"))
        .groupBy("n_bands")
        .agg(
            F.count("*").cast("bigint").alias("n_hot_buckets"),
            F.expr(IDIV("SUM(bsz * (bsz - 1))", 2)).alias("n_hot_pairs"),
        )
    )
    cold = sized.filter(F.col("bsz") <= _DD21_BUCKET_CAP).select(
        "doc_id", "n_bands", "band_idx", "band_key"
    )
    pair_cfgs = (
        cold.alias("x")
        .join(
            cold.alias("y"),
            (F.col("x.n_bands") == F.col("y.n_bands"))
            & (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.n_bands").alias("n_bands"),
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.collect_set("n_bands").alias("cfgs"))
    )
    # the A/B's change: per-doc shingle arrays attached directly
    doc_arrays = shingles.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("ss"),
        F.count("*").cast("long").alias("sz"),
    )
    truth = _shared_jaccard3(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("is_true")
    )
    n_true = truth.agg(F.count("*").cast("bigint").alias("n_true"))
    inter = F.size(F.array_intersect("ss_a", "ss_b")).cast("long")
    jaccard = inter.cast("double") / (
        F.col("sz_a") + F.col("sz_b") - inter
    ).cast("double")
    scored = (
        pair_cfgs.join(
            doc_arrays.select(F.col("doc_id").alias("doc_a"),
                              F.col("ss").alias("ss_a"),
                              F.col("sz").alias("sz_a")), "doc_a")
        .join(
            doc_arrays.select(F.col("doc_id").alias("doc_b"),
                              F.col("ss").alias("ss_b"),
                              F.col("sz").alias("sz_b")), "doc_b")
        .withColumn("jaccard", jaccard)
        .join(truth, ["doc_a", "doc_b"], "left")
        .select(F.explode("cfgs").alias("n_bands"), "jaccard", "is_true")
        .groupBy("n_bands")
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            F.sum(
                F.when(F.col("jaccard") >= _JACCARD_THRESHOLD, 1).otherwise(0)
            ).cast("bigint").alias("n_verified"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).cast("bigint")
            .alias("n_true_found"),
        )
    )
    return (
        scored.join(F.broadcast(hot_stats), "n_bands", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            F.col("n_bands").cast("bigint").alias("n_bands"),
            (F.lit(_N_HASHES) / F.col("n_bands")).cast("bigint").alias("rows_per_band"),
            "n_candidates",
            F.coalesce(F.col("n_hot_buckets"), F.lit(0)).cast("bigint")
            .alias("n_hot_buckets"),
            F.coalesce(F.col("n_hot_pairs"), F.lit(0)).cast("bigint")
            .alias("n_hot_pairs"),
            "n_verified",
            "n_true_found",
            "n_true",
        )
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from impala_workload_analyzer_spark.io import ensure_scan_cache
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _shared_jaccard3,
        _shared_shingles,
        lsh_band_sensitivity,
    )
    from impala_workload_analyzer_spark.session import get_spark

    spark = get_spark("dd21-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_scan_cache(spark, sf_dir)
    _shared_shingles(spark, sf_dir).write.format("noop").mode("overwrite").save()
    _shared_jaccard3(spark, sf_dir).write.format("noop").mode("overwrite").save()

    cur = lsh_band_sensitivity(spark, sf_dir)
    new = arrays_variant(spark, sf_dir)
    diff = cur.exceptAll(new).count() + new.exceptAll(cur).count()

    out = {"exceptAll_diff": diff}
    for name, df_fn in (("current", lambda: lsh_band_sensitivity(spark, sf_dir)),
                        ("arrays", lambda: arrays_variant(spark, sf_dir))):
        df_fn().write.format("noop").mode("overwrite").save()
        times = []
        for r in range(3):
            spark.sparkContext.setJobDescription(f"dd21:{name}:rep{r}")
            t0 = time.perf_counter()
            df_fn().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        out[name] = {"best": min(times), "reps": times}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
