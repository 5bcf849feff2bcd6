"""Two-phase distributed prefix scan (W1 scale path) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_workload_analyzer_spark.operators.concurrency import _two_phase_sweep


def _mk_events():
    rows = []
    for i in range(2000):
        s = (i * 37) % 50021
        e = s + 1 + (i * 13) % 997
        rows.append(("c1", s, 1))
        rows.append(("c1", e, -1))
    return rows


def test_two_phase_sweep_matches_sequential_scan(spark):
    """One big skewed cluster: the chunked scan must (a) actually split the
    cluster across >1 chunk — the parallelism the single-window version
    can't get — and (b) emit exactly the sequential running-sum result."""
    rows = _mk_events()
    events = spark.createDataFrame(rows, "cluster string, ts long, delta int")
    out = _two_phase_sweep(events, 16).collect()

    assert len({r["chunk"] for r in out}) > 1

    # sequential reference: sort by (ts, delta), running sum, next-ts delta
    seq = sorted((ts, d) for _, ts, d in rows)
    level, expect = 0, []
    for i, (ts, d) in enumerate(seq):
        level += d
        nxt = seq[i + 1][0] if i + 1 < len(seq) else None
        expect.append((level, None if nxt is None else nxt - ts))
    key = lambda t: (t[0], t[1] is None, t[1] or 0)  # noqa: E731
    got = sorted(((r["level"], r["interval"]) for r in out), key=key)
    assert got == sorted(expect, key=key)


def test_two_phase_sweep_single_timestamp_degenerate(spark):
    """All events at one timestamp -> one chunk, no div-by-zero, levels are
    a permutation of the prefix sums."""
    events = spark.createDataFrame(
        [("c", 5, 1), ("c", 5, 1), ("c", 5, -1), ("c", 5, -1)],
        "cluster string, ts long, delta int",
    )
    out = _two_phase_sweep(events, 8).collect()
    assert len(out) == 4
    # tie order is (ts, delta): deltas sort as [-1, -1, 1, 1] -> prefix
    # sums [-1, -2, -1, 0]; all intervals inside the tie group are 0
    assert sorted(r["level"] for r in out) == [-2, -1, -1, 0]
    assert [r["interval"] for r in out if r["interval"] is not None] == [0, 0, 0]


def test_littles_law_identity_w4_equals_w1(spark, sf_dir):
    """Two independent algorithms, one number: w4's interval-union
    avg_active (total active time / busy time) must equal w1's
    sweep-line time-weighted avg_concurrent on every cluster — the
    integral of the concurrency level over busy time IS the summed
    query durations."""
    from impala_workload_analyzer_spark.operators.concurrency import (
        cluster_utilization,
        concurrency_sweep,
    )

    w1 = {r["cluster"]: r["avg_concurrent"]
          for r in concurrency_sweep(spark, sf_dir).collect()}
    w4 = {r["cluster"]: r["avg_active"]
          for r in cluster_utilization(spark, sf_dir).collect()}
    assert set(w1) == set(w4)
    for cluster, avg in w1.items():
        assert abs(avg - w4[cluster]) < 1e-6, (cluster, avg, w4[cluster])


def test_concurrency_percentiles_bracket_w1(spark, sf_dir):
    """w5: p50 <= p95 <= max per cluster, max agrees with w1, and the
    p95 level covers >= 95% of busy time while the next-lower level
    does not (the exact integer-percentile definition)."""
    from pyspark.sql import functions as F

    from impala_workload_analyzer_spark.operators.concurrency import (
        _swept_levels,
        concurrency_percentiles,
        concurrency_sweep,
    )

    w1 = {r["cluster"]: r["max_concurrent"]
          for r in concurrency_sweep(spark, sf_dir).collect()}
    rows = concurrency_percentiles(spark, sf_dir).collect()
    busy = {}
    for r in (
        _swept_levels(spark, sf_dir)
        .filter(F.col("level") > 0)
        .groupBy("cluster", "level")
        .agg(F.sum("interval").alias("us"))
        .collect()
    ):
        busy.setdefault(r["cluster"], {})[r["level"]] = r["us"]
    assert {r["cluster"] for r in rows} == set(w1)
    for r in rows:
        assert r["p50_concurrent"] <= r["p95_concurrent"] <= r["max_concurrent"]
        assert r["max_concurrent"] == w1[r["cluster"]]
        h = busy[r["cluster"]]
        total = sum(h.values())
        assert r["busy_us"] == total
        at_or_below = sum(us for lv, us in h.items() if lv <= r["p95_concurrent"])
        below = sum(us for lv, us in h.items() if lv < r["p95_concurrent"])
        assert at_or_below * 100 >= 95 * total
        assert below * 100 < 95 * total


def test_w10_weighted_mass_conservation(spark, sf_dir):
    """Weighted Little's law (w8's certificate, byte-weighted): w10's
    sweep integral of the memory-demand level over time must equal the
    independent one-line aggregate sum(footprint x duration) over the
    same weighted query set — any dropped event, wrong weight sign,
    tie mis-order, or two-phase chunk-offset bug breaks equality.
    Also: peak demand is at least the largest single footprint and at
    most the cluster's footprint sum."""
    from impala_workload_analyzer_spark.corpus import corpus_queries
    from impala_workload_analyzer_spark.operators.concurrency import (
        memory_demand_sweep,
    )
    from impala_workload_analyzer_spark.sources.profiles import (
        parsed_time_series,
    )
    from impala_workload_analyzer_spark.sources.time_series_queries import (
        query_footprints,
    )

    out = {r["cluster"]: r
           for r in memory_demand_sweep(spark, sf_dir).collect()}

    q = corpus_queries(spark, sf_dir)
    clusters = q.filter(F.col("tag") == "tpch").select("cluster").distinct()
    scoped = q.join(clusters, "cluster", "left_semi").select(
        "cluster", "query_id", "start_time", "end_time"
    )
    fp = query_footprints(parsed_time_series(spark, sf_dir)).select(
        "query_id", "footprint"
    )
    ref = (
        scoped.join(fp, "query_id")
        .groupBy("cluster")
        .agg(
            F.sum(
                F.col("footprint")
                * (F.col("end_time") - F.col("start_time"))
            ).cast("bigint").alias("mass"),
            F.max("footprint").cast("bigint").alias("max_fp"),
            F.sum("footprint").cast("bigint").alias("sum_fp"),
        )
    ).collect()
    assert {r["cluster"] for r in ref} == set(out)
    for r in ref:
        got = out[r["cluster"]]
        assert got["mem_mass_bytes_us"] == r["mass"], r["cluster"]
        assert r["max_fp"] <= got["peak_mem_bytes"] <= r["sum_fp"], r["cluster"]


def test_w10_mean_demand_zero_busy_publishes_null(spark):
    """ADVICE r14: busy_us = 0 (every weighted query with a zero
    footprint) must publish NULL on BOTH engines — unguarded, Spark
    casts the 0/0 NaN to bigint 0 while DuckDB errors on the cast, a
    cross-engine crash the gate would surface. The corpus never renders
    the degenerate, so pin the production expression directly."""
    import duckdb

    from impala_workload_analyzer_spark.operators.concurrency import (
        _mean_demand_col,
    )

    df = spark.createDataFrame(
        [(100, 0), (100, 7), (0, 0)],
        "mem_mass_bytes_us bigint, busy_us bigint",
    )
    got = {(r["mem_mass_bytes_us"], r["busy_us"]): r["mean_mem_demand_bytes"]
           for r in df.select("*", _mean_demand_col()).collect()}
    assert got == {(100, 0): None, (100, 7): 14, (0, 0): None}

    oracle = duckdb.sql("""
        SELECT mass, busy,
               CASE WHEN busy = 0 THEN NULL
                    ELSE CAST(FLOOR(mass / CAST(busy AS DOUBLE)) AS BIGINT)
               END AS mean
        FROM (VALUES (100, 0), (100, 7), (0, 0)) t(mass, busy)
    """).fetchall()
    assert {(m, b): v for m, b, v in oracle} == got


def test_two_phase_sweep_attributed_payload_chunked(spark):
    """The extra_order/payload parameterization (w13): with forced
    chunking, each event's ATTRIBUTED level (query_id tie-break) must
    equal the sequential scan's, with payload columns carried through —
    per-event equality, strictly stronger than the multiset check."""
    rows = []
    for i in range(2000):
        s = (i * 37) % 50021
        e = s + 1 + (i * 13) % 997
        qid, dur = f"q{i:04d}", e - s
        rows.append(("c1", s, 1, qid, dur))
        rows.append(("c1", e, -1, qid, dur))
    events = spark.createDataFrame(
        rows, "cluster string, ts long, delta int, query_id string, dur long"
    )
    out = _two_phase_sweep(
        events, 16, extra_order=("query_id",),
        payload=("delta", "query_id", "dur"),
    ).collect()
    assert len({r["chunk"] for r in out}) > 1

    seq = sorted((ts, d, q, dur) for _, ts, d, q, dur in rows)
    level, expect = 0, {}
    for ts, d, q, dur in seq:
        level += d
        expect[(q, d)] = (level, dur)
    got = {(r["query_id"], r["delta"]): (r["level"], r["dur"]) for r in out}
    assert got == expect


def test_w13_matches_sequential_attribution(spark, sf_dir):
    """w13 cross-check: recompute each query's admission level with a
    plain Python sweep over (ts, delta, query_id) and compare every
    published (cluster, level) row; counts conserve to the w1 scope."""
    from impala_workload_analyzer_spark.corpus import corpus_queries

    q = corpus_queries(spark, sf_dir)
    clusters = {r["cluster"] for r in q.filter(F.col("tag") == "tpch")
                .select("cluster").distinct().collect()}
    per_cluster: dict[str, list] = {}
    for r in q.select("cluster", "query_id", "start_time", "end_time").collect():
        if r["cluster"] in clusters:
            per_cluster.setdefault(r["cluster"], []).append(r)

    expect: dict[tuple, list] = {}
    for cluster, qs in per_cluster.items():
        events = []
        for r in qs:
            dur = r["end_time"] - r["start_time"]
            events.append((r["start_time"], 1, r["query_id"], dur))
            events.append((r["end_time"], -1, r["query_id"], dur))
        events.sort()
        level = 0
        for ts, d, qid, dur in events:
            level += d
            if d == 1:
                expect.setdefault((cluster, level), []).append(dur)

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["w13_start_level_runtime"](spark, sf_dir).collect()
    assert sum(r["n_queries"] for r in rows) == sum(
        len(v) for v in per_cluster.values())
    got = {(r["cluster"], r["start_level"]):
           (r["n_queries"], r["mean_dur_us"], r["max_dur_us"]) for r in rows}
    want = {k: (len(v), sum(v) // len(v), max(v)) for k, v in expect.items()}
    assert got == want
