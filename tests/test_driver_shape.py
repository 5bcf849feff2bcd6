"""Driver-shape contract: every published query result must be
hashable by the DRIVER's canonicalizer (pandas sort_values + value
hash), which raises on list/dict cells. Round 13's single red row was
exactly this class — ing6's correct answer failed the harness because
its ``samples`` column was ArrayType while the local gate's
``_norm_cell`` tolerated lists. These tests pin (a) the gate-time lint
that now rejects non-scalar output columns first, and (b) the
scalarized time-series projection + its degenerate-input semantics
(zero-sample series; ADVICE r13)."""

from __future__ import annotations

from impala_workload_analyzer_spark.sources.profiles import (
    TS_SCHEMA,
    explode_time_series,
    ramp_over,
)
from impala_workload_analyzer_spark.sources.time_series_queries import (
    footprint_over,
    skew_over,
)
from tools.check import driver_unsafe_cols


def test_lint_rejects_synthetic_array_map_struct_columns(spark):
    """A query emitting any top-level ArrayType / MapType / StructType
    column must fail the builder's gate (tools/check.py) BEFORE it can
    reach the driver — the local gate may never be more permissive than
    the binding harness again."""
    df = spark.sql("""
        SELECT 1 AS k,
               array(1, 2) AS a,
               map('x', 1) AS m,
               named_struct('f', 1) AS s,
               'ok' AS txt
    """)
    assert driver_unsafe_cols(df.dtypes) == ["a", "m", "s"]
    scalar = spark.sql("SELECT 1 AS k, 'ok' AS txt, CAST(1.5 AS DOUBLE) AS d")
    assert driver_unsafe_cols(scalar.dtypes) == []


def test_lint_is_an_allowlist_not_a_blocklist():
    """The lint must reject ANY dtype outside the known-scalar set —
    a blocklist of array</map</struct< would wave through other
    pandas-unhashable column types (an ML VectorUDT renders as plain
    'vector'), re-opening the exact gap the lint closes (review r14).
    Pure-function check: driver_unsafe_cols takes (name, dtype) pairs."""
    assert driver_unsafe_cols([("v", "vector")]) == ["v"]
    assert driver_unsafe_cols([("u", "some_future_udt")]) == ["u"]
    assert driver_unsafe_cols(
        [("k", "bigint"), ("d", "decimal(18,6)"), ("b", "binary"),
         ("t", "timestamp"), ("s", "string")]
    ) == []
    # parameterized string scalars land as hashable pandas strings and
    # must pass the allowlist (ADVICE r14) — but only as a parameterized
    # prefix, a bare unknown name still fails
    assert driver_unsafe_cols(
        [("c", "char(10)"), ("v", "varchar(32)"), ("d", "decimal(38,0)")]
    ) == []
    assert driver_unsafe_cols([("c", "character")]) == ["c"]


def test_explode_time_series_is_scalar_and_empty_safe(spark):
    """The shared ing6/st20 projection publishes the sample vector as
    scalars (csv + n/first/last); a wire-legal zero-sample series lands
    as (0, NULL, NULL, '') instead of raising, and ts1's span
    contribution clamps to 0 rather than -period (ADVICE r13)."""
    rows = [
        ("t", "7", 0, 1, {"MemoryUsage|BYTES|500": [10, 30],
                          "Empty|BYTES|500": []}),
    ]
    df = spark.createDataFrame(rows, TS_SCHEMA)
    out = explode_time_series(df)
    assert driver_unsafe_cols(out.dtypes) == []
    got = {r["counter_name"]: r for r in out.collect()}
    mem = got["MemoryUsage"]
    assert (mem["n_samples"], mem["first_sample"], mem["last_sample"],
            mem["samples_csv"]) == (2, 10, 30, "10,30")
    assert (mem["unit"], mem["period_ms"]) == ("BYTES", 500)
    empty = got["Empty"]
    assert (empty["n_samples"], empty["first_sample"], empty["last_sample"],
            empty["samples_csv"]) == (0, None, None, "")

    (ramp,) = ramp_over(df).collect()
    assert ramp["n_series"] == 2
    assert ramp["sum_span_ms"] == 500  # 500*(2-1) + clamp(500*(0-1)) = 500
    assert (ramp["n_ramp_up"], ramp["n_ramp_down"]) == (1, 0)
    assert ramp["sum_delta"] == 20
    assert (ramp["max_delta"], ramp["min_delta"]) == (20, 20)


def test_peak_analytics_ignore_zero_sample_series(spark):
    """skew_over (ts2/st21) and footprint_over (ts3) must not let a
    wire-legal zero-sample series poison their aggregates with the
    NULL array_max yields on an empty vector: empty series carry no
    peak and are excluded; an instance or query whose series are ALL
    empty contributes no row at all (review r14)."""
    rows = [
        ("t", "7", 0, 1, {"MemoryUsage|BYTES|500": [10, 30],
                          "Empty|BYTES|500": []}),
        ("t", "7", 0, 2, {"MemoryUsage|BYTES|500": [5, 9],
                          "Empty|BYTES|500": []}),
        ("t", "8", 1, 1, {"OnlyEmpty|BYTES|500": []}),
    ]
    df = spark.createDataFrame(rows, TS_SCHEMA)

    skew = {(r["fragment_id"], r["counter_name"]): r
            for r in skew_over(df).collect()}
    assert set(skew) == {(0, "MemoryUsage")}  # no Empty/OnlyEmpty rows
    r = skew[(0, "MemoryUsage")]
    assert (r["n_fragments"], r["n_skewed"], r["sum_skew"],
            r["max_skew"], r["sum_peak"]) == (1, 1, 21, 21, 30)

    (fp,) = footprint_over(df).collect()  # query 8 contributes nothing
    assert (fp["tag"], fp["n_queries"], fp["n_series"]) == ("t", 1, 2)
    assert (fp["sum_footprint"], fp["max_footprint"],
            fp["min_footprint"]) == (39, 39, 39)
