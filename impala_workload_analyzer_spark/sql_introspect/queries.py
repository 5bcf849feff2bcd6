"""Driver-contract queries for the SQL-introspection layer (Q1-Q6).

``q1_sql_features`` runs the full EP2 pipeline (SURVEY.md §3): ingest the
profile logs (ing3), then enrich each statement with the feature struct via
``extract_sql_features`` inside Arrow-batched ``mapInPandas`` — the AST
lives only inside the UDF, exactly as the reference's Impala frontend AST
lives only inside the Java pass (QueryAnalyzer.java:333-349).

The oracle re-derives the expected features per corpus statement template
in SQL. The deep per-clause parity (subquery merges, operator-keyed maps,
analytic exprs, between/in/exists, parameterizer normalization) is covered
by the table-driven unit tests in tests/test_sql_introspect.py — the
corpus templates exercise the end-to-end plumbing.

Scale: enrichment is a stateless projection over the queries table — no
shuffle; at 100 TB it fuses into the ingest scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus.corpus_sql import with_corpus
from ..sources.profiles import materialized_table
from .parser import extract_sql_features

_L, _S, _B = T.LongType(), T.StringType(), T.BooleanType()

FEATURES_SCHEMA = T.StructType([
    T.StructField("query_id", _S),
    T.StructField("stmt_type", _S),
    T.StructField("num_output_columns", _L),
    T.StructField("num_group_by_columns", _L),
    T.StructField("num_order_by_columns", _L),
    T.StructField("num_limits", _L),
    T.StructField("num_where_binary_eq", _L),
    T.StructField("num_where_binary_gt", _L),
    T.StructField("num_where_in_predicates", _L),
    T.StructField("num_from_subqueries", _L),
    T.StructField("num_with_subqueries", _L),
    T.StructField("max_depth_subqueries", _L),
    T.StructField("num_select_function_call_exprs", _L),
    T.StructField("overwrite", _B),
    T.StructField("parameterized_stmt", _S),
])


def sql_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1_sql_features — EP2: per-statement feature extraction + template.

    The input is small in bytes but CPU-heavy per row (a parse per
    statement), so AQE's size-based coalescing would funnel it into one
    partition; repartition explicitly to keep every core parsing."""
    queries = (
        materialized_table(spark, sf_dir, "queries")
        .select("query_id", "sql_stmt")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for qid, stmt in zip(pdf["query_id"], pdf["sql_stmt"]):
                feats = extract_sql_features(stmt)
                if feats is None:
                    rows.append((qid, "UnparsedStmt") + (None,) * 13)
                    continue
                s = feats["stats"]
                if s is None:
                    rows.append((qid, feats["type"]) + (None,) * 11
                                + (feats["overwrite"], feats["parameterized_stmt"]))
                    continue
                rows.append((
                    qid, feats["type"], s["num_output_columns"],
                    s["num_group_by_columns"], s["num_order_by_columns"],
                    s["num_limits"], s["num_where_binary_predicates"]["="],
                    s["num_where_binary_predicates"][">"],
                    s["num_where_in_predicates"], s["num_from_subqueries"],
                    s["num_with_subqueries"], s["max_depth_subqueries"],
                    s["num_select_function_call_exprs"], feats["overwrite"],
                    feats["parameterized_stmt"],
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return queries.mapInPandas(run, schema=FEATURES_SCHEMA)


def features_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3_features_rollup — the enriched corpus as DATA (A15-shape): counts
    and feature sums per statement class, sorted by count desc."""
    return (
        sql_features(spark, sf_dir)
        .groupBy("stmt_type")
        .agg(
            F.count("*").alias("n_queries"),
            F.sum("num_output_columns").alias("sum_output_columns"),
            F.sum("num_limits").alias("sum_limits"),
            F.sum("num_where_binary_eq").alias("sum_where_eq"),
            F.count_distinct("parameterized_stmt").alias("n_templates"),
        )
    )


# expected features per corpus statement template (profile_render.sql_stmt_for);
# SELECT statements rotate through 4 shape variants on k % 4
_FEATURE_CASE = """
  SELECT query_id, k, sql_type,
    CASE sql_type WHEN 'DdlStmt' THEN 'CreateTableStmt' ELSE sql_type END AS stmt_type,
    CASE sql_type
      WHEN 'SelectStmt' THEN CASE WHEN k % 4 = 2 THEN 1 ELSE 2 END
      WHEN 'UnionStmt' THEN 1 WHEN 'InsertStmt' THEN 1 ELSE NULL END
      AS num_output_columns,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 = 1 THEN 1 ELSE 0 END
      AS num_group_by_columns,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 = 0 THEN 1 ELSE 0 END
      AS num_order_by_columns,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 = 0 THEN 1 ELSE 0 END
      AS num_limits,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 IN (0, 2) THEN 1
         WHEN sql_type = 'UnionStmt' THEN 1 ELSE 0 END
      AS num_where_binary_eq,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'InsertStmt' THEN 1
         WHEN sql_type = 'SelectStmt' AND k % 4 = 1 THEN 1 ELSE 0 END
      AS num_where_binary_gt,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 = 2 THEN 1 ELSE 0 END
      AS num_where_in_predicates,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL ELSE 0 END AS num_from_subqueries,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL ELSE 0 END AS num_with_subqueries,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 = 2 THEN 1 ELSE 0 END
      AS max_depth_subqueries,
    CASE WHEN sql_type = 'DdlStmt' THEN NULL
         WHEN sql_type = 'SelectStmt' AND k % 4 IN (1, 3) THEN 1 ELSE 0 END
      AS num_select_function_call_exprs,
    CASE WHEN sql_type = 'InsertStmt' THEN FALSE ELSE NULL END AS overwrite,
    CASE sql_type
      WHEN 'SelectStmt' THEN CASE k % 4
        WHEN 1 THEN 'SELECT ?, sum(?) FROM ? WHERE ? > 1 GROUP BY ?'
        WHEN 2 THEN 'SELECT ? FROM ? WHERE ? IN ((SELECT ? FROM ? WHERE ? = 1))'
        WHEN 3 THEN 'SELECT ?, rank() OVER (PARTITION BY ? ORDER BY ? DESC) FROM ? WHERE ? LIKE ''?'''
        ELSE 'SELECT ?, ? FROM ? WHERE ? = 1 ORDER BY ? ASC LIMIT 1' END
      WHEN 'UnionStmt' THEN 'SELECT ? FROM ? WHERE ? = 1 UNION ALL SELECT ? FROM ?'
      ELSE NULL END AS parameterized_stmt
  FROM iwa_queries WHERE k % 41 <> 0
"""

ORACLES = {
    "q1_sql_features": with_corpus(f"""
        SELECT query_id, stmt_type, num_output_columns, num_group_by_columns,
               num_order_by_columns, num_limits, num_where_binary_eq,
               num_where_binary_gt, num_where_in_predicates, num_from_subqueries,
               num_with_subqueries, max_depth_subqueries,
               num_select_function_call_exprs, overwrite, parameterized_stmt
        FROM ({_FEATURE_CASE})"""),
    "q3_features_rollup": with_corpus(f"""
        SELECT stmt_type, COUNT(*) AS n_queries,
               SUM(num_output_columns) AS sum_output_columns,
               SUM(num_limits) AS sum_limits,
               SUM(num_where_binary_eq) AS sum_where_eq,
               COUNT(DISTINCT parameterized_stmt) AS n_templates
        FROM ({_FEATURE_CASE})
        GROUP BY stmt_type"""),
}

SPARK_QUERIES = {
    "q1_sql_features": sql_features,
    "q3_features_rollup": features_rollup,
}
