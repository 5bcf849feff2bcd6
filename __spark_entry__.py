"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Query keys are named after the SURVEY.md §2 operator inventory
(a1_.. j2_.. w1_.. etc.) plus the TPC-H-style headliners and the
training-data pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from impala_workload_analyzer_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the W1 concurrency sweep —
    the reference's richest computation (stats.py:383-405) — over the
    deterministic workload corpus."""
    from impala_workload_analyzer_spark.operators.concurrency import concurrency_sweep

    return concurrency_sweep(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; non-SQL-expressible
    ops (ML clustering, streaming, ingest UDFs) are rows-only."""
    return all_oracles()
