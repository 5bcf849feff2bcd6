"""Pre-aggregation effectiveness audit (reference: ``code/python/aggs.py``).

J3: each PRE AGGREGATE is joined to its single input child via
``child.parent_id = agg.id`` (aggs.py:18-22) — a self-join on
``(query_id, parent_id)`` instead of the reference's per-row ``find_one``.

A10 (aggs.py:24-34): rows in/out are per-node RowsReturned scaled by
num_hosts; in < out rows are dropped (guard, aggs.py:27-29); in == 0 maps
to ratio 1.0 (aggs.py:31-32).

A11 (aggs.py:36-44): histogram over bins [0, 1.1) step 0.1 — ratio is
always <= 1.0 after the guard, so ``floor(ratio*10)`` reproduces numpy's
binning including 1.0 landing in the final [1.0, 1.1) bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import corpus_operators, corpus_queries, with_corpus


def preagg_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — per-PRE-agg output/input row ratio, reading RowsReturned from
    the ``avg_counters`` map exactly like ``aggs.py:24-25``."""
    q = corpus_queries(spark, sf_dir).filter(F.col("tag") == "tpch").select("query_id")
    ops = corpus_operators(spark, sf_dir)
    aggs = ops.filter((F.col("name") == "AGGREGATE") & (F.col("agg_type") == "PRE")).join(q, "query_id")
    rr = F.element_at("avg_counters", F.lit("RowsReturned"))
    aggs = aggs.select(
        "query_id",
        F.col("id").alias("agg_id"),
        (rr * F.col("num_hosts")).alias("num_output_rows"),
    )
    children = ops.select(
        "query_id",
        F.col("parent_id").alias("agg_id"),
        (rr * F.col("num_hosts")).alias("num_input_rows"),
    )
    return (
        aggs.join(children, ["query_id", "agg_id"])
        .filter(F.col("num_input_rows") >= F.col("num_output_rows"))
        .select(
            "query_id",
            "agg_id",
            "num_input_rows",
            "num_output_rows",
            F.when(F.col("num_input_rows") == 0, F.lit(1.0))
            .otherwise(F.col("num_output_rows") / F.col("num_input_rows"))
            .alias("reduction_pct"),
        )
    )


def preagg_reduction_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — bin the A10 ratios into [0, 1.1) step 0.1 (aggs.py:36-44)."""
    ratios = preagg_reduction(spark, sf_dir)
    return (
        ratios.withColumn("bin", F.floor(F.col("reduction_pct") * 10).cast("long"))
        .groupBy("bin")
        .agg(F.count("*").alias("num_pre_aggs"))
    )


_A10 = """
, preagg AS (
  SELECT a.query_id, a.id AS agg_id,
         CAST(c.rows_returned AS DOUBLE) * c.num_hosts AS num_input_rows,
         CAST(a.rows_returned AS DOUBLE) * a.num_hosts AS num_output_rows
  FROM iwa_operators a
  JOIN iwa_queries q ON a.query_id = q.query_id AND q.tag = 'tpch'
  JOIN iwa_operators c ON c.query_id = a.query_id AND c.parent_id = a.id
  WHERE a.name = 'AGGREGATE' AND a.agg_type = 'PRE'
),
kept AS (
  SELECT query_id, agg_id, num_input_rows, num_output_rows,
         CASE WHEN num_input_rows = 0 THEN 1.0
              ELSE num_output_rows / num_input_rows END AS reduction_pct
  FROM preagg WHERE num_input_rows >= num_output_rows
)
"""

ORACLES = {
    "a10_preagg_reduction": with_corpus(_A10 + "SELECT * FROM kept"),
    "a11_preagg_reduction_hist": with_corpus(
        _A10
        + """SELECT CAST(FLOOR(reduction_pct * 10) AS BIGINT) AS bin,
                    COUNT(*) AS num_pre_aggs
             FROM kept GROUP BY 1"""
    ),
}

SPARK_QUERIES = {
    "a10_preagg_reduction": preagg_reduction,
    "a11_preagg_reduction_hist": preagg_reduction_hist,
}
