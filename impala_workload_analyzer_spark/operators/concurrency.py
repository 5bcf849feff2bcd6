"""Query-concurrency sweep (reference: ``stats.py:383-405``) — the
flagship window computation (SURVEY.md W1).

The reference sorts (timestamp, delta) event tuples client-side and runs a
running-sum sweep line. Here the sweep is a Spark window:

- unpivot each query interval into (+1 at start_time, -1 at end_time);
- ``level = sum(delta) over (partition by cluster order by ts, delta rows
  unbounded preceding..current)`` — the running concurrency *after* each
  event, matching the reference's ``curr`` (initialized to 1 = level after
  the first, necessarily-start, event);
- ``interval = lead(ts) - ts`` weighted by ``level`` where level > 0
  gives max and the time-weighted average concurrency.

Tie handling matches the lexicographic sort at ``stats.py:390``: at equal
timestamps, -1 events order before +1. Equal (ts, delta) rows are
interchangeable — their pairwise intervals are zero.

Reference quirk preserved knowingly (SURVEY.md §7 "hard part 4"): clusters
are discovered under the tag filter but queries are then swept per cluster
WITHOUT re-filtering tag (stats.py:383-385) — the semi-join below mirrors
that exactly.

Scale: one shuffle on ``cluster`` (few distinct values -> salting would
apply if clusters skewed; window state is O(1) per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..corpus import corpus_queries, with_corpus


def concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per cluster: max and time-weighted average concurrency."""
    q = corpus_queries(spark, sf_dir)
    clusters = q.filter(F.col("tag") == "tpch").select("cluster").distinct()
    scoped = q.join(clusters, "cluster", "left_semi").select("cluster", "start_time", "end_time")
    events = scoped.select(
        "cluster",
        F.explode(
            F.array(
                F.struct(F.col("start_time").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("end_time").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("cluster", "e.ts", "e.delta")
    w_order = Window.partitionBy("cluster").orderBy("ts", "delta")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = events.select(
        "cluster",
        F.sum("delta").over(w_run).alias("level"),
        (F.lead("ts").over(w_order) - F.col("ts")).alias("interval"),
    ).filter(F.col("interval").isNotNull())
    return (
        swept.groupBy("cluster")
        .agg(
            F.max("level").alias("max_concurrent"),
            (
                F.sum(F.when(F.col("level") > 0, F.col("interval") * F.col("level")).otherwise(0)).cast("double")
                / F.sum(F.when(F.col("level") > 0, F.col("interval")).otherwise(0))
            ).alias("avg_concurrent"),
        )
        .select("cluster", "max_concurrent", F.round("avg_concurrent", 9).alias("avg_concurrent"))
    )


ORACLES = {
    "w1_concurrency_sweep": with_corpus("""
        , ev AS (
          SELECT cluster, start_time AS ts, 1 AS delta FROM iwa_queries
          WHERE cluster IN (SELECT DISTINCT cluster FROM iwa_queries WHERE tag = 'tpch')
          UNION ALL
          SELECT cluster, end_time AS ts, -1 AS delta FROM iwa_queries
          WHERE cluster IN (SELECT DISTINCT cluster FROM iwa_queries WHERE tag = 'tpch')
        ),
        swept AS (
          SELECT cluster,
                 SUM(delta) OVER (PARTITION BY cluster ORDER BY ts, delta
                                  ROWS UNBOUNDED PRECEDING) AS level,
                 LEAD(ts) OVER (PARTITION BY cluster ORDER BY ts, delta) - ts AS interval
          FROM ev
        )
        SELECT cluster,
               CAST(MAX(level) AS BIGINT) AS max_concurrent,
               ROUND(CAST(SUM(CASE WHEN level > 0 THEN interval * level ELSE 0 END) AS DOUBLE)
                     / SUM(CASE WHEN level > 0 THEN interval ELSE 0 END), 9) AS avg_concurrent
        FROM swept WHERE interval IS NOT NULL
        GROUP BY cluster"""),
}

SPARK_QUERIES = {"w1_concurrency_sweep": concurrency_sweep}
