"""Round-8 operators: LSH band sweep, concurrency mass certificate,
plan motifs, dup x quality interaction, mixture temperature recipe."""

from __future__ import annotations

import math


def test_dd21_band_sweep_nested_and_pinned_to_dd3(spark, sf_dir):
    """dd21: the (8,2) row must reproduce dd3 exactly (same signature,
    same verify); candidate sets are nested by construction so both the
    candidate volume and the true-pair recall are monotone in the band
    count; found-true never exceeds either side of the intersection."""
    from impala_workload_analyzer_spark.pipeline.dedup import (
        lsh_band_sensitivity,
        minhash_lsh_pairs,
    )

    rows = {r["n_bands"]: r for r in lsh_band_sensitivity(spark, sf_dir).collect()}
    assert set(rows) == {16, 8, 4}
    for r in rows.values():
        assert r["rows_per_band"] * r["n_bands"] == 16
        assert r["n_verified"] <= r["n_candidates"]
        assert r["n_true_found"] <= min(r["n_candidates"], r["n_true"])
        # hot-bucket accounting: no bucket crosses the cap at fixture
        # scale (the monotone-nesting asserts below rely on that), and
        # the skipped-volume columns are present and consistent
        assert r["n_hot_buckets"] == 0 and r["n_hot_pairs"] == 0
    assert rows[16]["n_candidates"] >= rows[8]["n_candidates"] >= rows[4]["n_candidates"]
    assert rows[16]["n_true_found"] >= rows[8]["n_true_found"] >= rows[4]["n_true_found"]
    assert rows[8]["n_verified"] == minhash_lsh_pairs(spark, sf_dir).count()


def test_w8_mass_conservation_and_littles_law(spark, sf_dir):
    """w8: the sweep-line integral equals the duration sum per cluster
    (recomputed in python), the certificate is TRUE everywhere, and the
    floored mean residence is consistent."""
    from impala_workload_analyzer_spark.corpus import corpus_queries
    from impala_workload_analyzer_spark.operators.concurrency import (
        concurrency_mass_certificate,
    )

    rows = concurrency_mass_certificate(spark, sf_dir).collect()
    assert rows
    q = corpus_queries(spark, sf_dir).select(
        "cluster", "start_time", "end_time"
    ).collect()
    expect: dict[str, list[int]] = {}
    for r in q:
        expect.setdefault(r["cluster"], [0, 0])
        expect[r["cluster"]][0] += 1
        expect[r["cluster"]][1] += r["end_time"] - r["start_time"]
    for r in rows:
        n, mass = expect[r["cluster"]]
        assert r["mass_conserved"] is True
        assert r["n_queries"] == n
        assert r["runtime_mass_us"] == mass == r["sweep_mass_us"]
        assert r["mean_residence_us"] == math.floor(mass / n)


def test_pt7_motifs_match_python_chain_count(spark, sf_dir):
    """pt7: motif occurrence totals equal a python recount of 2-edge
    chains over pt1's edge set, and per-motif query counts never exceed
    occurrence counts."""
    from impala_workload_analyzer_spark.plans.draw_plan import (
        plan_edges,
        plan_motifs,
    )

    edges = plan_edges(spark, sf_dir).collect()
    children: dict[tuple[str, int], list[int]] = {}
    for e in edges:
        children.setdefault((e["query_id"], e["parent_op"]), []).append(e["child_op"])
    n_chains = sum(
        len(children.get((qid, child), []))
        for (qid, _), kids in children.items()
        for child in kids
    )
    rows = plan_motifs(spark, sf_dir).collect()
    assert sum(r["n_occurrences"] for r in rows) == n_chains
    for r in rows:
        assert 1 <= r["n_queries"] <= r["n_occurrences"]


def test_dd22_buckets_partition_the_corpus(spark, sf_dir):
    """dd22: bucket doc counts partition the document table, keeps never
    exceed docs, and the keep total matches tx2's."""
    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import dup_quality_profile
    from impala_workload_analyzer_spark.pipeline.text import quality_score

    rows = dup_quality_profile(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    kept = sum(r["keep"] for r in quality_score(spark, sf_dir).collect())
    assert sum(r["n_keep"] for r in rows) == kept
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert r["keep_ppm"] == (r["n_keep"] * 1_000_000) // r["n_docs"]
        assert r["mean_tokens"] >= 1


def test_tx30_weights_normalize_and_flatten_with_temperature(spark, sf_dir):
    """tx30: per alpha the ppm weights sum to 1e6 up to floor loss; at
    alpha=1 weights are proportional to token counts; lowering alpha
    strictly flattens the mixture (max weight non-increasing in alpha);
    draw_tokens recompute from the published integers."""
    from impala_workload_analyzer_spark.pipeline.text import (
        mixture_temperature_recipe,
    )

    rows = mixture_temperature_recipe(spark, sf_dir).collect()
    by_alpha: dict[int, list] = {}
    for r in rows:
        by_alpha.setdefault(r["alpha_permille"], []).append(r)
    assert set(by_alpha) == {250, 500, 750, 1000}
    max_w = {}
    for a, rs in by_alpha.items():
        s = sum(r["weight_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= s <= 1_000_000
        max_w[a] = max(r["weight_ppm"] for r in rs)
        for r in rs:
            assert r["draw_tokens"] == (r["budget_tokens"] * r["weight_ppm"]) // 1_000_000
            assert r["epochs_ppm"] == (r["draw_tokens"] * 1_000_000) // r["n_tokens"]
    assert max_w[250] <= max_w[500] <= max_w[750] <= max_w[1000]
    big1000 = max(by_alpha[1000], key=lambda r: r["weight_ppm"])
    assert big1000["n_tokens"] == max(r["n_tokens"] for r in by_alpha[1000])


def test_a31_affinity_is_symmetric_free_and_bounded(spark, sf_dir):
    """a31: pairs are strictly ordered (each unordered pair once),
    query counts never exceed a5's scanning-query universe, and the
    joint bytes are positive wherever a pair exists."""
    from impala_workload_analyzer_spark.operators.workload_stats import (
        table_affinity,
    )

    rows = table_affinity(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["table_a"] < r["table_b"]
        assert (r["table_a"], r["table_b"]) not in seen
        seen.add((r["table_a"], r["table_b"]))
        assert r["n_queries"] >= 1
        assert r["joint_scan_bytes"] > 0


def test_dd23_audit_prices_the_whole_index(spark, sf_dir):
    """dd23: bucket postings sum to the full shingle index, pair_work
    matches the python recount, and every bucket's work is consistent
    with its df range."""
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _shingles_df,
        shingle_hotspot_audit,
    )

    rows = shingle_hotspot_audit(spark, sf_dir).collect()
    sh = _shingles_df(spark, sf_dir).collect()
    from collections import Counter

    dfs = Counter(r["shingle"] for r in sh)
    assert sum(r["n_postings"] for r in rows) == len(sh)
    assert sum(r["n_shingles"] for r in rows) == len(dfs)
    assert sum(r["pair_work"] for r in rows) == sum(
        d * (d - 1) // 2 for d in dfs.values()
    )


def test_sim22_upsert_conserves_the_corpus(spark, sf_dir):
    """sim22: indexed + delta counts across lists equal the corpus; the
    hash split puts ~20% in the delta; shares sum to ~1e6 ppm."""
    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.similarity import (
        ivf_upsert_audit,
    )

    rows = ivf_upsert_audit(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    n_idx = sum(r["n_indexed"] for r in rows)
    n_dlt = sum(r["n_delta"] for r in rows)
    assert n_idx + n_dlt == total
    assert 0.05 < n_dlt / total < 0.4  # ~20% hash split
    share = sum(r["delta_share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000
    for r in rows:
        assert r["growth_ppm"] == (r["n_delta"] * 1_000_000) // max(r["n_indexed"], 1)


def test_w9_serial_replay_matches_lindley_recursion(spark, sf_dir):
    """w9: the closed-form window replay must equal a direct python
    Lindley recursion per cluster; serial makespan dominates the actual
    one; delays are non-negative."""
    from impala_workload_analyzer_spark.corpus import corpus_queries
    from impala_workload_analyzer_spark.operators.concurrency import (
        serial_replay_whatif,
    )

    q = corpus_queries(spark, sf_dir).select(
        "cluster", "query_id", "start_time", "end_time"
    ).collect()
    per: dict[str, list] = {}
    for r in q:
        per.setdefault(r["cluster"], []).append(
            (r["start_time"], r["query_id"], r["end_time"] - r["start_time"])
        )
    expect = {}
    for cl, rows in per.items():
        rows.sort()
        finish, total_delay, max_fin = 0, 0, 0
        first_arr = rows[0][0]
        for arr, _, rt in rows:
            start = max(arr, finish)
            total_delay += start - arr
            finish = start + rt
            max_fin = max(max_fin, finish)
        expect[cl] = (len(rows), max_fin - first_arr, total_delay)
    out = serial_replay_whatif(spark, sf_dir).collect()
    assert len(out) == len(expect)
    for r in out:
        n, mk, dl = expect[r["cluster"]]
        assert r["n_queries"] == n
        assert r["serial_makespan_us"] == mk
        assert r["total_queue_delay_us"] == dl
        assert r["serial_makespan_us"] >= r["actual_makespan_us"]
        assert r["slowdown_ppm"] >= 1_000_000


def test_shared_caches_equal_their_live_lineage(spark, sf_dir):
    """The persisted shared frames (dedup shingles, exact top-k truth)
    must be row-identical to their live definitions — correctness can
    never depend on cache state."""
    from impala_workload_analyzer_spark.pipeline.dedup import (
        _shared_shingles,
        _shingles_df,
    )
    from impala_workload_analyzer_spark.pipeline.similarity import (
        _exact_topk_shared,
        brute_force_topk,
    )

    live = sorted(map(tuple, _shingles_df(spark, sf_dir).collect()))
    shared = sorted(map(tuple, _shared_shingles(spark, sf_dir).collect()))
    assert live == shared
    live_k = sorted(map(tuple, brute_force_topk(spark, sf_dir).collect()))
    shared_k = sorted(map(tuple, _exact_topk_shared(spark, sf_dir).collect()))
    assert live_k == shared_k


def test_a32_version_grid_medians_match_python(spark, sf_dir):
    """a32: floor-means and integer-rank medians recompute in python."""
    from impala_workload_analyzer_spark.corpus import corpus_queries
    from impala_workload_analyzer_spark.operators.workload_stats import (
        version_regression,
    )

    q = corpus_queries(spark, sf_dir).select(
        "impala_version", "sql_type", "runtime"
    ).collect()
    per: dict[tuple, list] = {}
    for r in q:
        if r["runtime"] is not None:
            per.setdefault((r["impala_version"], r["sql_type"]), []).append(r["runtime"])
    rows = version_regression(spark, sf_dir).collect()
    assert len(rows) == len(per)
    for r in rows:
        vals = sorted(per[(r["impala_version"], r["sql_type"])])
        assert r["n_queries"] == len(vals)
        assert r["mean_runtime_ns"] == sum(vals) // len(vals)
        assert r["p50_runtime_ns"] == vals[(len(vals) - 1) // 2]


def test_sim23_cells_partition_the_corpus_and_bounds_hold(spark, sf_dir):
    """sim23: n_vecs across cells equals the corpus; max >= mean; the
    global mean from sim11 reconstructs from the cell sums."""
    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.similarity import (
        pq_assign,
        pq_cell_distortion,
    )

    rows = pq_cell_distortion(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == total
    import math

    glob = sum(math.floor(r["mse"] * 1e6) for r in pq_assign(spark, sf_dir).collect())
    assert sum(r["sum_mse_micro"] for r in rows) == glob
    for r in rows:
        assert r["mean_mse_micro"] <= r["max_mse_micro"]
        assert r["mean_mse_micro"] == r["sum_mse_micro"] // r["n_vecs"]


def test_a33_advice_follows_the_reference_cost_model(spark, sf_dir):
    """a33: the verdict must equal the reference's joins.py cost rule
    recomputed from the published integers, with the not-broadcast tie
    rule; pair universe matches a31's."""
    from impala_workload_analyzer_spark.operators.workload_stats import (
        join_strategy_advice,
        table_affinity,
    )

    rows = join_strategy_advice(spark, sf_dir).collect()
    pairs31 = {(r["table_a"], r["table_b"]) for r in table_affinity(spark, sf_dir).collect()}
    assert {(r["table_a"], r["table_b"]) for r in rows} == pairs31
    for r in rows:
        bc = min(r["mean_bytes_a"], r["mean_bytes_b"]) * r["max_hosts"]
        pc = r["mean_bytes_a"] + r["mean_bytes_b"]
        assert r["broadcast_cost"] == bc and r["partitioned_cost"] == pc
        assert r["advice"] == ("BROADCAST" if bc < pc else "PARTITIONED")


def test_snk5_jsonl_roundtrip_preserves_every_byte(spark, sf_dir):
    """snk5: shard doc counts partition the corpus and the read-back
    text checksum equals the source-side recompute — JSON encoding
    preserved every byte of every document."""
    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.text import (
        _CKSUM_MOD,
        _SPARK_H,
        jsonl_export,
    )
    from pyspark.sql import functions as F

    rows = jsonl_export(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    src = (
        load_table(spark, sf_dir, "documents")
        .select((F.expr(_SPARK_H.format(x="text")) % _CKSUM_MOD).alias("th"))
        .agg(F.sum("th"))
        .collect()[0][0]
    )
    assert sum(r["text_checksum"] for r in rows) == src


def test_ev26_drop_curve_is_monotone_and_matches_ev15(spark, sf_dir):
    """ev26: drops are non-increasing in the watermark delay, the
    largest delay's drops never exceed ev15's late-event count, and ppm
    recomputes from the integers."""
    from impala_workload_analyzer_spark.pipeline.events_analytics import (
        disorder_profile,
        watermark_whatif,
    )

    late = {r["event_type"]: r["n_late"] for r in disorder_profile(spark, sf_dir).collect()}
    per: dict[str, dict] = {}
    for r in watermark_whatif(spark, sf_dir).collect():
        per.setdefault(r["event_type"], {})[r["delay_s"]] = r
        assert r["drop_ppm"] == (r["n_dropped"] * 1_000_000) // r["n_events"]
    for et, by_d in per.items():
        assert set(by_d) == {60, 600, 3600}
        assert by_d[60]["n_dropped"] >= by_d[600]["n_dropped"] >= by_d[3600]["n_dropped"]
        assert by_d[60]["n_dropped"] <= late[et]
