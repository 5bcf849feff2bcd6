"""Join-strategy correctness audit (reference: ``code/python/joins.py``).

The reference runs two ``find_one`` lookups per join operator (N+1 pattern,
``joins.py:51-58``); here the child resolution is a set-based double
self-join of ``operators`` on ``(query_id, child_id = id)`` (SURVEY.md J2)
that Catalyst executes as two shuffle-hash joins on ``query_id`` — one
shuffle at any scale, AQE-coalesced.

Cost model (joins.py:5-30, audited exactly):

- broadcastCost  = min(leftBytes, rightBytes) * num_hosts
- partitionedCost = leftBytes + rightBytes   (bytes = num_rows * row_size)
- wrong impl  : equal costs -> correct; else the cheaper strategy must be
  the chosen ``join_impl``
- wrong side  : only checked when impl is correct (elif, joins.py:60-65);
  BROADCAST builds on the right child, so leftBytes < rightBytes is wrong
- rollup (A9): counts + summed avg_time per class, ms via py2 floor div
  (joins.py:73-97)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import IDIV, corpus_operators, corpus_queries, with_corpus


def _classified_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = corpus_queries(spark, sf_dir).filter(F.col("tag") == "tpch").select("query_id")
    ops = corpus_operators(spark, sf_dir)
    joins = ops.filter(F.col("name").isin("HASH JOIN", "CROSS JOIN")).join(q, "query_id")
    children = ops.select(
        "query_id",
        F.col("id").alias("child_id"),
        (F.col("num_rows") * F.col("row_size")).alias("child_bytes"),
    )
    j = (
        joins.alias("j")
        .join(
            children.alias("l"),
            (F.col("j.query_id") == F.col("l.query_id"))
            & (F.col("j.left_child_id") == F.col("l.child_id")),
        )
        .join(
            children.alias("r"),
            (F.col("j.query_id") == F.col("r.query_id"))
            & (F.col("j.right_child_id") == F.col("r.child_id")),
        )
        .select(
            F.col("j.query_id").alias("query_id"),
            F.col("j.id").alias("id"),
            F.col("j.name").alias("name"),
            F.col("j.join_impl").alias("join_impl"),
            F.col("j.num_hosts").alias("num_hosts"),
            F.col("j.avg_time").alias("avg_time"),
            F.col("l.child_bytes").alias("left_bytes"),
            F.col("r.child_bytes").alias("right_bytes"),
        )
    )
    bcost = F.least("left_bytes", "right_bytes") * F.col("num_hosts")
    pcost = F.col("left_bytes") + F.col("right_bytes")
    wrong_impl = F.when(bcost == pcost, F.lit(False)).otherwise(
        F.when(bcost < pcost, F.col("join_impl") != "BROADCAST").otherwise(
            F.col("join_impl") != "PARTITIONED"
        )
    )
    wrong_side = (
        (F.col("join_impl") == "BROADCAST")
        & (F.col("left_bytes") < F.col("right_bytes"))
    )
    return j.withColumn(
        "classification",
        F.when(wrong_impl, "wrong_impl")
        .when(wrong_side, "wrong_side")
        .otherwise("correct"),
    )


def join_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 + A7/A8 per-join detail: each join with its resolved child sizes
    and audit classification."""
    return _classified_joins(spark, sf_dir).select(
        "query_id", "id", "name", "join_impl",
        "left_bytes", "right_bytes", "classification",
    )


def join_audit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — counts and total time per audit class (joins.py:35-68)."""
    return (
        _classified_joins(spark, sf_dir)
        .groupBy("classification")
        .agg(F.count("*").alias("num_joins"), F.sum("avg_time").alias("total_time"))
        .select(
            "classification",
            "num_joins",
            F.expr("CAST(FLOOR(total_time / CAST(1000000 AS DOUBLE)) AS BIGINT)").alias("total_time_ms"),
        )
    )


_CLASSIFIED = f"""
, jc AS (
  SELECT j.query_id, j.id, j.name, j.join_impl, j.avg_time,
         l.num_rows * l.row_size AS left_bytes,
         r.num_rows * r.row_size AS right_bytes,
         CASE
           WHEN NOT (CASE
                 WHEN LEAST(l.num_rows * l.row_size, r.num_rows * r.row_size) * j.num_hosts
                      = l.num_rows * l.row_size + r.num_rows * r.row_size THEN FALSE
                 WHEN LEAST(l.num_rows * l.row_size, r.num_rows * r.row_size) * j.num_hosts
                      < l.num_rows * l.row_size + r.num_rows * r.row_size
                   THEN j.join_impl <> 'BROADCAST'
                 ELSE j.join_impl <> 'PARTITIONED' END)
                AND j.join_impl = 'BROADCAST'
                AND l.num_rows * l.row_size < r.num_rows * r.row_size
             THEN 'wrong_side'
           WHEN (CASE
                 WHEN LEAST(l.num_rows * l.row_size, r.num_rows * r.row_size) * j.num_hosts
                      = l.num_rows * l.row_size + r.num_rows * r.row_size THEN FALSE
                 WHEN LEAST(l.num_rows * l.row_size, r.num_rows * r.row_size) * j.num_hosts
                      < l.num_rows * l.row_size + r.num_rows * r.row_size
                   THEN j.join_impl <> 'BROADCAST'
                 ELSE j.join_impl <> 'PARTITIONED' END)
             THEN 'wrong_impl'
           ELSE 'correct' END AS classification
  FROM iwa_operators j
  JOIN iwa_queries q ON j.query_id = q.query_id AND q.tag = 'tpch'
  JOIN iwa_operators l ON j.query_id = l.query_id AND j.left_child_id = l.id
  JOIN iwa_operators r ON j.query_id = r.query_id AND j.right_child_id = r.id
  WHERE j.name IN ('HASH JOIN', 'CROSS JOIN')
)
"""

ORACLES = {
    "j2_join_children": with_corpus(
        _CLASSIFIED
        + """SELECT query_id, id, name, join_impl, left_bytes, right_bytes, classification
             FROM jc"""
    ),
    "a9_join_audit_rollup": with_corpus(
        _CLASSIFIED
        + f"""SELECT classification, COUNT(*) AS num_joins,
                    {IDIV('SUM(avg_time)', 1000000)} AS total_time_ms
             FROM jc GROUP BY classification"""
    ),
}

SPARK_QUERIES = {
    "j2_join_children": join_children,
    "a9_join_audit_rollup": join_audit_rollup,
}
