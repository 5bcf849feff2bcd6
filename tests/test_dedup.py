"""Dedup operator invariants at sf0.001."""

from __future__ import annotations

from impala_workload_analyzer_spark.io import load_table
from impala_workload_analyzer_spark.pipeline import dedup


def test_exact_dedup_partitions_docs(spark, sf_dir):
    """Every document lands in exactly one digest group."""
    groups = dedup.exact_dedup(spark, sf_dir)
    total_docs = load_table(spark, sf_dir, "documents").count()
    agg = groups.groupBy().sum("num_docs").collect()[0][0]
    assert agg == total_docs


def test_jaccard_pairs_are_canonical_and_bounded(spark, sf_dir):
    rows = dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.5 <= r["jaccard"] <= 1.0


def test_minhash_is_subset_of_exact_pairs(spark, sf_dir):
    """LSH candidates verified by exact Jaccard can never exceed the exact
    pair set (no false positives after verification)."""
    exact = {(r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()}
    assert lsh <= exact


def test_simhash_deterministic(spark, sf_dir):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, sf_dir).collect()}
    assert a == b
    assert all(v >= 0 for v in a.values())
