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


def test_hot_shingle_cap_prunes_candidates_but_keeps_exact_jaccard(spark):
    """A boilerplate shingle shared by > _SHINGLE_DF_CAP docs must not feed
    the candidate self-join (the O(k^2) scale-killer), yet verified pairs
    still report Jaccard computed on FULL shingle sets (hot ones included)."""
    cap = dedup._SHINGLE_DF_CAP
    rows = [(i, "alpha beta gamma delta") for i in range(cap + 1)]
    rows.append((200, "alpha beta gamma one two three four five"))
    rows.append((201, "alpha beta gamma one two three four six"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup._ngram_jaccard_of(dedup._shingles_of(docs)).collect()
    # the cap+1 identical boilerplate docs (pairwise jaccard 1.0) produce NO
    # pairs: their only shingles exceed the document-frequency cap
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert set(got) == {(200, 201)}
    # 6 shingles each, 5 shared — one of them ("alpha beta gamma") is hot,
    # but verification still counts it: 5 / (6 + 6 - 5)
    assert abs(got[(200, 201)] - 5 / 7) < 1e-9


def test_norm_dedup_keeps_longest_raw_variant(spark, sf_dir):
    """dd7 groups formatting variants together and keeps the longest raw
    text (ties -> lowest doc_id); every document lands in one group."""
    groups = dedup.norm_dedup_keep_best(spark, sf_dir)
    total_docs = load_table(spark, sf_dir, "documents").count()
    rows = groups.collect()
    assert sum(r["num_docs"] for r in rows) == total_docs
    kept = {r["kept_doc_id"] for r in rows}
    assert len(kept) == len(rows)  # one representative per group


def test_neardup_components_fixpoint(spark, sf_dir):
    """dd8: every doc gets a component; both ends of every near-dup pair
    share one; each component's id is the min doc_id of its members."""
    comp = {r["doc_id"]: r["component_id"]
            for r in dedup.neardup_components(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    assert len(comp) == total
    for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect():
        assert comp[r["doc_a"]] == comp[r["doc_b"]]
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    assert all(min(ms) == c for c, ms in members.items())


def test_simhash_deterministic(spark, sf_dir):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, sf_dir).collect()}
    assert a == b
    assert all(v >= 0 for v in a.values())


def test_incremental_dedup_matches_recompute(spark, sf_dir):
    """dd10: status and canonical assignment match a sequential recompute
    of the seen-index rule."""
    import hashlib

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _INCR_SPLIT,
        incremental_dedup,
    )

    docs = [
        (r["doc_id"], hashlib.md5(r["text"].encode()).hexdigest(),
         int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % 100)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect()
    ]
    seen = {}
    for doc_id, dig, b in sorted(docs):
        if b < _INCR_SPLIT:
            seen.setdefault(dig, doc_id)
    new = sorted((d, dig) for d, dig, b in docs if b >= _INCR_SPLIT)
    first = {}
    expect = {}
    for doc_id, dig in new:
        if dig in seen:
            expect[doc_id] = ("dup_of_seen", seen[dig])
        elif dig in first:
            expect[doc_id] = ("dup_in_shard", first[dig])
        else:
            first[dig] = doc_id
            expect[doc_id] = ("kept", doc_id)
    got = {r["doc_id"]: (r["status"], r["canonical_doc_id"])
           for r in incremental_dedup(spark, sf_dir).collect()}
    assert got == expect


def test_dup_span_coverage_python_twin(spark, sf_dir):
    """dd15: coverage fractions match an independent pure-Python
    positional-shingle computation, and bounds hold (0 <= covered <=
    n_tokens; a doc whose every shingle is corpus-unique has coverage 0)."""
    import re
    from collections import Counter

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import dup_span_coverage

    docs = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower().strip()).split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    occ = Counter()
    spans = {}
    for doc_id, w in docs.items():
        if len(w) < 3:
            continue
        spans[doc_id] = [
            (" ".join(w[i : i + 3]), i) for i in range(len(w) - 2)
        ]
        occ.update(s for s, _ in spans[doc_id])
    expect = {}
    for doc_id, sh in spans.items():
        covered = set()
        for s, i in sh:
            if occ[s] >= 2:
                covered.update((i, i + 1, i + 2))
        expect[doc_id] = (len(docs[doc_id]), len(covered))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_covered"], r["dup_fraction"])
        for r in dup_span_coverage(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for doc_id, (n_tokens, n_covered) in expect.items():
        gt, gc, frac = got[doc_id]
        assert (gt, gc) == (n_tokens, n_covered)
        assert 0 <= gc <= gt
        assert abs(frac - gc / gt) < 1e-8


def test_minhash_calibration_bounds(spark, sf_dir):
    """dd16: estimates are k/N grid values in [0,1]; exact Jaccard matches
    dd2's uncapped computation on the same pairs; every dd3 survivor
    (jaccard >= threshold) appears as a calibration row."""
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _N_HASHES,
        minhash_calibration,
        minhash_lsh_pairs,
    )

    rows = minhash_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["est_jaccard"] * _N_HASHES
        assert abs(k - round(k)) < 1e-6 and 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
        assert abs(r["error"] - (r["est_jaccard"] - r["jaccard"])) < 1e-8
    cal = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    for r in minhash_lsh_pairs(spark, sf_dir).collect():
        assert cal[(r["doc_a"], r["doc_b"])] == r["jaccard"]


def test_dedup_comparison_consistent_with_tiers(spark, sf_dir):
    """dd17: every method row reproduces from the tier outputs it
    summarizes (pair counts and distinct-doc_b drop sets), and fractions
    divide the corpus totals."""
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _words,
        dedup_comparison,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_neardup_pairs,
    )

    got = {r["method"]: r for r in dedup_comparison(spark, sf_dir).collect()}
    assert set(got) == {"exact", "jaccard3", "minhash", "simhash"}
    docs = load_table(spark, sf_dir, "documents")
    tok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.expr(_words(True))).alias("n")
        ).collect()
    }
    tiers = {
        "jaccard3": ngram_jaccard_pairs(spark, sf_dir),
        "minhash": minhash_lsh_pairs(spark, sf_dir),
        "simhash": simhash_neardup_pairs(spark, sf_dir),
    }
    for name, df in tiers.items():
        rows = df.select("doc_a", "doc_b").collect()
        dropped = {r["doc_b"] for r in rows}
        assert got[name]["n_pairs"] == len(rows)
        assert got[name]["n_docs_dropped"] == len(dropped)
        assert got[name]["tokens_dropped"] == sum(tok[d] for d in dropped)
    n_docs, n_toks = len(tok), sum(tok.values())
    for r in got.values():
        assert abs(r["doc_drop_frac"] - r["n_docs_dropped"] / n_docs) < 1e-8
        assert abs(r["token_drop_frac"] - r["tokens_dropped"] / n_toks) < 1e-8


def test_effective_dataset_consistent_with_components(spark, sf_dir):
    """dd18: per-source totals reproduce from dd8's components and raw
    token counts; survival ratios bracket in (0, 1]; global kept docs =
    number of components."""
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _words,
        effective_dataset,
        neardup_components,
    )

    rows = effective_dataset(spark, sf_dir).collect()
    comp = {r["doc_id"]: r["component_id"]
            for r in neardup_components(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.expr(_words(True))).alias("n")
    ).collect()
    agg = {}
    for d in docs:
        a = agg.setdefault(d["source"], [0, 0, 0, 0])
        a[0] += 1
        a[1] += d["n"]
        if comp[d["doc_id"]] == d["doc_id"]:
            a[2] += 1
            a[3] += d["n"]
    assert {r["source"] for r in rows} == set(agg)
    for r in rows:
        e = agg[r["source"]]
        assert [r["n_docs"], r["n_tokens"], r["kept_docs"], r["kept_tokens"]] == e
        assert 0 < r["doc_survival"] <= 1 and 0 < r["token_survival"] <= 1
    assert sum(r["kept_docs"] for r in rows) == len(set(comp.values()))


def test_component_size_spectrum_partitions_corpus(spark, sf_dir):
    """dd20: the spectrum must partition the corpus exactly (sum of
    n_docs = corpus size, shares sum to 1, removable = docs - kept) and
    match a python recomputation over dd8's components."""
    from collections import Counter

    from impala_workload_analyzer_spark.pipeline.dedup import (
        component_size_spectrum,
        neardup_components,
    )

    comp_sizes = Counter()
    for r in neardup_components(spark, sf_dir).collect():
        comp_sizes[r["component_id"]] += 1
    hist = Counter(comp_sizes.values())
    total = sum(comp_sizes.values())
    rows = component_size_spectrum(spark, sf_dir).collect()
    assert {r["comp_size"]: r["n_components"] for r in rows} == dict(hist)
    assert sum(r["n_docs"] for r in rows) == total
    assert sum(r["removable_docs"] for r in rows) == total - len(comp_sizes)
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r["n_docs"] == r["comp_size"] * r["n_components"]
        assert r["removable_docs"] == r["n_docs"] - r["n_components"]


def test_split_overlap_matches_join_overlap(spark, sf_dir):
    """The split exact-intersection (rare count + hot array_intersect,
    r15 optimization) must agree row-for-row with the legacy join-based
    verify over the same rare-shingle candidates — on the fixture corpus
    AND on a synthetic corpus where a hot shingle contributes to the
    intersection of a true pair."""
    sh = dedup._shingles_df(spark, sf_dir)
    legacy = dedup._pair_overlap(dedup._rare_shingle_cands(sh), sh)
    cols = ["doc_a", "doc_b", "inter", "sz_a", "sz_b"]
    split = dedup._rare_pair_overlap(sh).select(*cols)
    legacy = legacy.select(*cols)
    assert split.exceptAll(legacy).count() == 0
    assert legacy.exceptAll(split).count() == 0

    cap = dedup._SHINGLE_DF_CAP
    rows = [(i, "alpha beta gamma delta") for i in range(cap + 1)]
    rows.append((300, "alpha beta gamma one two three four five"))
    rows.append((301, "alpha beta gamma one two three four six"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh2 = dedup._shingles_of(docs)
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["sz_a"], r["sz_b"])
           for r in dedup._rare_pair_overlap(sh2).collect()}
    # the hot "alpha beta gamma" shingle still counts toward inter
    assert got[(300, 301)] == (5, 6, 6)
