"""Aggregates every module's SPARK_QUERIES / ORACLES into the single
dictionaries the driver contract (__spark_entry__.py) exposes."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = []


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from .operators import (  # noqa: PLC0415
        concurrency,
        consistency,
        join_audit,
        preagg,
        time_share,
        workload_stats,
    )

    modules = [workload_stats, join_audit, preagg, concurrency, consistency, time_share]
    for extra in _optional_modules():
        modules.append(extra)
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        for name, fn in getattr(mod, "SPARK_QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def _optional_modules():
    mods = []
    import importlib  # noqa: PLC0415

    for dotted in (
        "impala_workload_analyzer_spark.tpch",
        "impala_workload_analyzer_spark.tpch_full",
        "impala_workload_analyzer_spark.functions.unit_queries",
        "impala_workload_analyzer_spark.functions.bitcast",
        "impala_workload_analyzer_spark.pipeline.dedup",
        "impala_workload_analyzer_spark.pipeline.text",
        "impala_workload_analyzer_spark.pipeline.similarity",
        "impala_workload_analyzer_spark.pipeline.events_analytics",
        "impala_workload_analyzer_spark.pipeline.multimodal",
        "impala_workload_analyzer_spark.streaming.stream_queries",
        "impala_workload_analyzer_spark.ml.clustering",
        "impala_workload_analyzer_spark.sources.profiles",
        "impala_workload_analyzer_spark.sql_introspect.queries",
        "impala_workload_analyzer_spark.plans.draw_plan",
    ):
        try:
            mods.append(importlib.import_module(dotted))
        except ModuleNotFoundError:
            continue
    return mods


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
