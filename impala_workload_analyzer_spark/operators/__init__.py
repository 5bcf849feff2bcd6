"""Analytical query repertoire over the workload corpus (SURVEY.md §2).

Each module exports ``SPARK_QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLES`` (name -> DuckDB SQL) which the registry aggregates into
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""
