"""Corpus invariants: determinism, FK integrity, planted A16 violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_workload_analyzer_spark.corpus import (
    corpus_fragments,
    corpus_operators,
    corpus_queries,
)
from impala_workload_analyzer_spark.operators.consistency import counter_consistency


def test_corpus_is_deterministic(spark, sf_dir):
    a = corpus_queries(spark, sf_dir).orderBy("query_id").collect()
    b = corpus_queries(spark, sf_dir).orderBy("query_id").collect()
    assert a == b


def test_unique_keys(spark, sf_dir):
    """The reference enforces unique (query_id, id) via a Mongo index
    (profile_analyzer.py:15-21); here it is an assertion query."""
    ops = corpus_operators(spark, sf_dir)
    frags = corpus_fragments(spark, sf_dir)
    assert ops.groupBy("query_id", "id").count().filter("count > 1").count() == 0
    assert frags.groupBy("query_id", "id").count().filter("count > 1").count() == 0
    q = corpus_queries(spark, sf_dir)
    assert q.groupBy("query_id").count().filter("count > 1").count() == 0


def test_operators_fk_into_queries(spark, sf_dir):
    q = corpus_queries(spark, sf_dir).select("query_id")
    orphans = (
        corpus_operators(spark, sf_dir).select("query_id").distinct()
        .join(q, "query_id", "left_anti")
    )
    assert orphans.count() == 0


def test_hosts_cover_num_hosts(spark, sf_dir):
    """assert len(hosts) >= num_hosts (profile_analyzer.py:308)."""
    q = corpus_queries(spark, sf_dir)
    assert q.filter(F.size("hosts") < F.col("num_hosts")).count() == 0


def test_consistency_check_finds_planted_violations(spark, sf_dir):
    """The corpus plants floor-mean violations on a deterministic slice;
    A16 must find exactly those and nothing else."""
    bad = counter_consistency(spark, sf_dir)
    rows = bad.collect()
    assert len(rows) > 0, "planted violations not detected"
    # all detected rows are real: recompute python-side
    ops = corpus_operators(spark, sf_dir).select(
        "query_id", "id", "avg_counters", "counters"
    ).collect()
    bykey = {(r["query_id"], r["id"]): r for r in ops}
    for v in rows:
        if v["source"] != "operator":
            continue
        r = bykey[(v["query_id"], v["id"])]
        inst = r["counters"][v["counter_name"]]
        assert int(sum(inst) // len(inst)) != int(r["avg_counters"][v["counter_name"]])
