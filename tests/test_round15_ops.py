"""Round-15 operators: w11 (admission-cap what-if), ts4 (footprint vs
runtime rank correlation), ev32/st22 (trigram motifs, batch + stream),
tx35 (declared-vs-detected language confusion).

Each gets (a) a physical-plan contract — the shape that survives 100 TB
must actually appear in the plan — and (b) an independent property
check against a differently-derived quantity, the w8/test_w10
conservation convention."""

from __future__ import annotations

import __spark_entry__ as entrymod
from pyspark.sql import functions as F


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_w11_rides_the_sweep_histogram(spark, sf_dir):
    # w1's sweep window + the (cluster, level) histogram are the only
    # cluster-keyed exchanges; the cap fanout (x3) and the final agg ride
    # the same clustering — no cartesian, no single-partition stage
    plan = _plan(spark, sf_dir, "w11_overcap_residency")
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(") <= 2, plan
    assert "SinglePartition" not in plan, plan


def test_w11_agrees_with_the_level_histogram(spark, sf_dir):
    # independent derivation: rebuild the busy-time histogram straight
    # from _swept_levels and check every published (cluster, cap) row —
    # over_us, excess_mass_us, the ppm floor, and cap monotonicity
    from impala_workload_analyzer_spark.operators.concurrency import (
        _W11_CAPS,
        _swept_levels,
    )

    hist: dict[str, dict[int, int]] = {}
    for r in (
        _swept_levels(spark, sf_dir)
        .filter(F.col("level") > 0)
        .groupBy("cluster", "level")
        .agg(F.sum("interval").alias("us"))
        .collect()
    ):
        hist.setdefault(r["cluster"], {})[r["level"]] = r["us"]

    rows = entrymod.queries()["w11_overcap_residency"](spark, sf_dir).collect()
    assert {r["cluster"] for r in rows} == set(hist)
    assert len(rows) == len(hist) * len(_W11_CAPS)
    by_cluster: dict[str, dict[int, dict]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["cap"]] = r
    for cluster, caps in by_cluster.items():
        h = hist[cluster]
        busy = sum(h.values())
        prev_over = None
        for cap in sorted(caps):
            r = caps[cap]
            over = sum(us for lv, us in h.items() if lv > cap)
            excess = sum((lv - cap) * us for lv, us in h.items() if lv > cap)
            assert r["busy_us"] == busy
            assert r["over_us"] == over
            assert r["excess_mass_us"] == excess
            expect_ppm = over * 1_000_000 // busy if busy else None
            assert r["over_ppm"] == expect_ppm
            if prev_over is not None:  # larger cap, less residency
                assert r["over_us"] <= prev_over
            prev_over = r["over_us"]


def test_ts4_three_keyed_exchanges(spark, sf_dir):
    # harvest dedup + the query_id join + the tag-keyed rank windows
    # (both windows share the tag exchange); no cartesian, nothing
    # single-partition
    plan = _plan(spark, sf_dir, "ts4_footprint_runtime_corr")
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(") <= 3, plan
    assert "SinglePartition" not in plan, plan


def test_ts4_matches_a_local_spearman(spark, sf_dir):
    # recompute rho per tag in plain Python from the same inputs
    # (footprints + runtimes) and check n, sum_d2, rho, and bounds;
    # also n must agree with ts3's census (same inner-join scope)
    from impala_workload_analyzer_spark.corpus import corpus_queries
    from impala_workload_analyzer_spark.sources.profiles import (
        parsed_time_series,
    )
    from impala_workload_analyzer_spark.sources.time_series_queries import (
        query_footprints,
    )

    fps = query_footprints(parsed_time_series(spark, sf_dir)).select(
        "tag", "query_id", "footprint"
    )
    rt = corpus_queries(spark, sf_dir).select("query_id", "runtime")
    rows = fps.join(rt, "query_id").collect()
    by_tag: dict[str, list] = {}
    for r in rows:
        by_tag.setdefault(r["tag"], []).append((r["footprint"], r["runtime"], r["query_id"]))

    got = {r["tag"]: r for r in entrymod.queries()[
        "ts4_footprint_runtime_corr"](spark, sf_dir).collect()}
    census = {r["tag"]: r["n_queries"] for r in entrymod.queries()[
        "ts3_query_memory_footprint"](spark, sf_dir).collect()}
    assert set(got) == set(by_tag) == set(census)
    for tag, triples in by_tag.items():
        n = len(triples)
        rf = {q: i + 1 for i, (_, _, q) in enumerate(
            sorted(triples, key=lambda t: (t[0], t[2])))}
        rr = {q: i + 1 for i, (_, _, q) in enumerate(
            sorted(triples, key=lambda t: (t[1], t[2])))}
        s = sum((rf[q] - rr[q]) ** 2 for _, _, q in triples)
        r = got[tag]
        assert r["n_queries"] == n == census[tag]
        assert r["sum_d2"] == s
        if n >= 2:
            rho = 1.0 - 6.0 * s / (n * (n * n - 1.0))
            assert abs(r["spearman_rho"] - rho) < 1e-8
            assert -1.0 <= r["spearman_rho"] <= 1.0
        else:
            assert r["spearman_rho"] is None


def test_ev32_single_user_shuffle_then_tiny_rank(spark, sf_dir):
    # one user-keyed exchange for the lead windows, one motif-keyed
    # aggregate; the global rank's single partition runs over the
    # aggregated motif table (type-cardinality^3), never the events
    plan = _plan(spark, sf_dir, "ev32_trigram_motifs")
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(") == 2, plan
    assert "hashpartitioning(user_id" in plan
    assert plan.count("SinglePartition") == 1, plan


def test_ev32_motif_counts_and_shares(spark, sf_dir):
    # trigram conservation: total trigrams = sum over users of
    # max(events_u - 2, 0); ranks are 1..10 with n non-increasing;
    # every share is the exact floor ppm of that total
    from impala_workload_analyzer_spark.io import load_table

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id").count().collect()
    )
    total = sum(max(r["count"] - 2, 0) for r in per_user)
    rows = sorted(
        entrymod.queries()["ev32_trigram_motifs"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(a["n"] >= b["n"] for a, b in zip(rows, rows[1:]))
    assert sum(r["n"] for r in rows) <= total
    for r in rows:
        assert r["share_ppm"] == r["n"] * 1_000_000 // total


def test_motif_rollup_rank_determinism(spark):
    # tie-break is (n DESC, t1, t2, t3); ppm floors; top-N budget
    from impala_workload_analyzer_spark.pipeline.events_analytics import (
        motif_rollup,
    )

    tri = spark.createDataFrame(
        [("a", "b", "c")] * 3 + [("b", "a", "c")] * 3 + [("c", "c", "c")],
        "t1 string, t2 string, t3 string",
    )
    rows = {r["rank"]: r for r in motif_rollup(tri).collect()}
    assert [rows[k]["t1"] for k in (1, 2, 3)] == ["a", "b", "c"]
    assert rows[1]["share_ppm"] == 3 * 1_000_000 // 7
    assert rows[3]["share_ppm"] == 1_000_000 // 7


def test_w12_no_cartesian_no_global_sort(spark, sf_dir):
    # (cluster, bucket) counts + cluster spans + the grid join + the
    # final rollup — bounded keyed exchanges, the bucket grid joins as
    # a broadcast-scale dimension, nothing single-partition
    plan = _plan(spark, sf_dir, "w12_arrival_burstiness")
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(") <= 4, plan
    assert "SinglePartition" not in plan, plan


def test_w12_matches_a_local_dispersion(spark, sf_dir):
    # recompute the index of dispersion per cluster in plain Python
    # from raw arrival minutes — empty buckets included — and check
    # every published statistic; arrivals must sum to w1's query scope
    from impala_workload_analyzer_spark.corpus import corpus_queries

    q = corpus_queries(spark, sf_dir)
    clusters = {r["cluster"] for r in q.filter(F.col("tag") == "tpch")
                .select("cluster").distinct().collect()}
    arrivals: dict[str, list[int]] = {}
    for r in q.select("cluster", "start_time").collect():
        if r["cluster"] in clusters:
            arrivals.setdefault(r["cluster"], []).append(
                r["start_time"] // 60_000_000)

    rows = {r["cluster"]: r for r in entrymod.queries()[
        "w12_arrival_burstiness"](spark, sf_dir).collect()}
    assert set(rows) == set(arrivals)
    for cluster, mins in arrivals.items():
        lo, hi = min(mins), max(mins)
        counts = [0] * (hi - lo + 1)
        for m in mins:
            counts[m - lo] += 1
        n_b, n_a = len(counts), sum(counts)
        mean = n_a / n_b
        disp = (sum(c * c for c in counts) / n_b - mean * mean) / mean
        r = rows[cluster]
        assert (r["n_buckets"], r["n_arrivals"]) == (n_b, n_a)
        assert abs(r["mean_per_bucket"] - mean) < 1e-8
        assert abs(r["dispersion"] - disp) < 1e-8
        assert r["is_bursty"] == (disp > 1.0)


def test_tx35_broadcasts_the_profile_and_sums_to_tx3(spark, sf_dir):
    # rides tx3's plan: profile and lang dims broadcast, no cartesian;
    # and the confusion matrix row-sums must equal the per-declared-lang
    # document counts (every doc lands in exactly one cell)
    plan = _plan(spark, sf_dir, "tx35_langid_confusion")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan

    from impala_workload_analyzer_spark.io import load_table

    per_lang = {
        r["lang"]: r["count"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").count().collect()
    }
    rows = entrymod.queries()["tx35_langid_confusion"](spark, sf_dir).collect()
    sums: dict[str, int] = {}
    for r in rows:
        sums[r["lang"]] = sums.get(r["lang"], 0) + r["n_docs"]
        assert r["agree"] == (r["lang"] == r["pred_lang"])
        expect = r["n_docs"] * 1_000_000 // per_lang[r["lang"]]
        assert r["row_share_ppm"] == expect
    assert sums == per_lang


def test_ev33_one_shuffle_then_ladder(spark, sf_dir):
    # ev27's shape: one user-keyed shuffle (ev3's sessionize windows),
    # the depth ladder as conditional aggregates reduced to one row,
    # then the |ladder|-row explode + hazard lag (the single partition)
    plan = _plan(spark, sf_dir, "ev33_session_depth_survival")
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(") == 1, plan
    assert "hashpartitioning(user_id" in plan


def test_ev33_matches_session_depth_histogram(spark, sf_dir):
    # independent derivation off ev3's session rollup: survivors at k,
    # monotone non-increasing, ppm floors, hazard consistency
    from impala_workload_analyzer_spark.pipeline.events_analytics import (
        _EV33_DEPTHS,
        sessionize,
    )

    depths = [r["n_events"] for r in sessionize(spark, sf_dir)
              .select("n_events").collect()]
    total = len(depths)
    rows = sorted(entrymod.queries()["ev33_session_depth_survival"](
        spark, sf_dir).collect(), key=lambda r: r["depth"])
    assert [r["depth"] for r in rows] == list(_EV33_DEPTHS)
    prev = None
    for r in rows:
        surv = sum(1 for d in depths if d >= r["depth"])
        assert r["n_sessions_total"] == total
        assert r["n_sessions_surviving"] == surv
        assert r["survival_ppm"] == surv * 1_000_000 // total
        if prev is None:
            assert r["continuation_ppm"] is None
        else:
            assert surv <= prev
            expect = surv * 1_000_000 // prev if prev else None
            assert r["continuation_ppm"] == expect
        prev = surv


def test_sim27_partitions_by_band_and_hits_k_bound(spark, sf_dir):
    # everything downstream of the audited searches is K-bounded; the
    # census must cover every (tier, bucket) with consistent counts:
    # per tier the query counts sum to the batch size, hits stay within
    # [min_hits * n, n * k], and ppm is the exact floor
    from impala_workload_analyzer_spark.pipeline.similarity import (
        _QUERY_K,
        _SIM27_BUCKETS,
        _TOP_K,
    )

    rows = entrymod.queries()["sim27_margin_recall_profile"](
        spark, sf_dir).collect()
    assert {r["tier"] for r in rows} == {"lsh", "ivf", "int8"}
    per_tier: dict[str, int] = {}
    for r in rows:
        assert 0 <= r["difficulty_bucket"] < _SIM27_BUCKETS
        per_tier[r["tier"]] = per_tier.get(r["tier"], 0) + r["n_queries"]
        assert r["min_hits"] * r["n_queries"] <= r["sum_hits"]
        assert r["sum_hits"] <= r["n_queries"] * _TOP_K
        assert r["mean_recall_ppm"] == (
            r["sum_hits"] * 1_000_000 // (r["n_queries"] * _TOP_K))
    assert set(per_tier.values()) == {_QUERY_K}


def test_dd29_covers_every_multidoc_component(spark, sf_dir):
    # the band census must partition dd8's multi-doc components exactly
    # (components + docs conserved), with band edges on the floored ppm
    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.dedup import (
        neardup_components,
    )

    comp = {r["doc_id"]: r["component_id"]
            for r in neardup_components(spark, sf_dir).collect()}
    chars = {r["doc_id"]: r["n_chars"]
             for r in load_table(spark, sf_dir, "documents")
             .select("doc_id", "n_chars").collect()}
    groups: dict[int, list[int]] = {}
    for d, c in comp.items():
        groups.setdefault(c, []).append(chars[d])
    expect: dict[str, list] = {}
    for lens in groups.values():
        if len(lens) < 2:
            continue
        ppm = max(lens) * 1_000_000 // max(min(lens), 1)
        band = ("near_equal" if ppm < 1_100_000
                else "moderate" if ppm < 2_000_000
                else "containment_suspect")
        agg = expect.setdefault(band, [0, 0, 0])
        agg[0] += 1
        agg[1] += len(lens)
        agg[2] = max(agg[2], ppm)
    rows = entrymod.queries()["dd29_component_length_spread"](
        spark, sf_dir).collect()
    got = {r["band"]: [r["n_components"], r["n_docs"], r["max_ratio_ppm"]]
           for r in rows}
    assert got == expect


def test_pt9_rides_pt2_and_conserves_operator_time(spark, sf_dir):
    # plan contract: pt2's colocated walk + the (query,id) join + the
    # depth rollup; the share window single-partitions only the
    # max-depth-row table. Property: node count and total time conserve
    # against the raw operators table, and shares sum to <= 1e6
    plan = _plan(spark, sf_dir, "pt9_depth_time_profile")
    assert "CartesianProduct" not in plan
    assert plan.count("SinglePartition") <= 1, plan

    from impala_workload_analyzer_spark.corpus import corpus_operators

    ops = corpus_operators(spark, sf_dir).agg(
        F.count("*").alias("n"), F.sum("avg_time").alias("t")
    ).collect()[0]
    rows = entrymod.queries()["pt9_depth_time_profile"](spark, sf_dir).collect()
    assert sum(r["n_nodes"] for r in rows) == ops["n"]
    grand = sum(r["total_time"] for r in rows)
    assert grand == ops["t"]
    assert sum(r["time_share_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["time_share_ppm"] == r["total_time"] * 1_000_000 // grand


def test_q6_novelty_conserves_templates(spark, sf_dir):
    # every template is new exactly once (sum of n_new_templates =
    # distinct templates), statements conserve against q4's scope,
    # and the ppm is the exact floor
    rows = entrymod.queries()["q6_template_novelty"](spark, sf_dir).collect()
    q4 = entrymod.queries()["q4_template_runtime"](spark, sf_dir).collect()
    n_templates = len(q4)
    n_statements = sum(r["n_queries"] for r in q4)
    assert sum(r["n_new_templates"] for r in rows) == n_templates
    assert sum(r["n_statements"] for r in rows) == n_statements
    first = min(rows, key=lambda r: r["bucket"])
    assert first["n_new_templates"] == first["n_templates"]  # all new at t0
    for r in rows:
        assert 0 <= r["n_new_templates"] <= r["n_templates"]
        assert r["new_template_ppm"] == (
            r["n_new_templates"] * 1_000_000 // r["n_templates"])


def test_tx36_frontier_conserves_and_prices_waste(spark, sf_dir):
    # every budget packs the same document set (n_docs conserved);
    # token mass is monotone non-decreasing in budget (larger budgets
    # truncate less); bins >= shards-with-docs (each non-empty shard
    # has at least one bin); waste is the exact floor ppm; one shuffle
    # keyed (budget, shard), no cartesian, no global sort
    plan = _plan(spark, sf_dir, "tx36_packing_frontier")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan, plan

    from impala_workload_analyzer_spark.io import load_table
    from impala_workload_analyzer_spark.pipeline.text import _TX36_BUDGETS

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = sorted(entrymod.queries()["tx36_packing_frontier"](
        spark, sf_dir).collect(), key=lambda r: r["budget"])
    assert [r["budget"] for r in rows] == list(_TX36_BUDGETS)
    prev_tokens = 0
    for r in rows:
        assert r["n_docs"] == n_docs
        assert r["total_tokens"] >= prev_tokens
        prev_tokens = r["total_tokens"]
        assert r["capacity_tokens"] == r["n_bins"] * r["budget"]
        assert r["total_tokens"] <= r["capacity_tokens"]
        assert r["waste_ppm"] == (
            (r["capacity_tokens"] - r["total_tokens"]) * 1_000_000
            // r["capacity_tokens"])
        assert 1 <= r["min_docs_per_bin"] <= r["max_docs_per_bin"]
