"""Invariant tests for the OLAP-style workload rollups (a20/a21/a22)
at sf0.001 — the oracle gate checks exact values; these pin the
structural algebra that must hold for ANY corpus."""

from __future__ import annotations

from impala_workload_analyzer_spark.corpus import corpus_operators, corpus_queries
from impala_workload_analyzer_spark.operators.workload_stats import (
    operator_cooccurrence,
    runtime_deciles,
    workload_cube,
)


def test_cube_marginals_are_consistent(spark, sf_dir):
    """a20: the all-NULL grand-total row equals the corpus count, and each
    single-dimension marginal partitions it exactly."""
    rows = workload_cube(spark, sf_dir).collect()
    total = corpus_queries(spark, sf_dir).count()
    grand = [r for r in rows
             if r["query_type"] is None and r["sql_type"] is None
             and r["cluster"] is None]
    assert len(grand) == 1 and grand[0]["num_queries"] == total
    for dim in ("query_type", "sql_type", "cluster"):
        others = [d for d in ("query_type", "sql_type", "cluster") if d != dim]
        marginal = [r for r in rows
                    if r[dim] is not None and all(r[o] is None for o in others)]
        assert sum(r["num_queries"] for r in marginal) == total
        assert max(r["max_hosts"] for r in marginal) == grand[0]["max_hosts"]


def test_deciles_partition_each_type(spark, sf_dir):
    """a21: per query_type the deciles are 1..10, counts differ by at most
    one, boundaries are ordered, and counts add to the type's total."""
    per_type: dict[str, list] = {}
    for r in runtime_deciles(spark, sf_dir).collect():
        per_type.setdefault(r["query_type"], []).append(r)
    totals = {
        r["query_type"]: r["count"]
        for r in corpus_queries(spark, sf_dir)
        .groupBy("query_type").count().collect()
    }
    assert set(per_type) == set(totals)
    for qt, rows in per_type.items():
        rows.sort(key=lambda r: r["decile"])
        assert [r["decile"] for r in rows] == list(range(1, 11))
        counts = [r["num_queries"] for r in rows]
        assert sum(counts) == totals[qt]
        assert max(counts) - min(counts) <= 1
        for a, b in zip(rows, rows[1:]):
            assert a["hi_runtime"] <= b["lo_runtime"]
            assert a["lo_runtime"] <= a["mean_runtime"] <= a["hi_runtime"]


def test_cooccurrence_bounded_by_individual_presence(spark, sf_dir):
    """a22: pairs are strictly ordered and each pair count is bounded by
    the rarer operator's query presence."""
    presence = {
        r["name"]: r["cnt"]
        for r in corpus_operators(spark, sf_dir)
        .select("query_id", "name").distinct()
        .groupBy("name").count().withColumnRenamed("count", "cnt").collect()
    }
    rows = operator_cooccurrence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["num_queries"] <= min(
            presence[r["name_a"]], presence[r["name_b"]])
