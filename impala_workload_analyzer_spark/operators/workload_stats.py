"""Workload statistics (reference: ``code/python/stats.py``).

The reference loops per query with N+1 Mongo sub-queries; every analytic
here is one set-based DataFrame DAG (SURVEY.md §3 EP3): a broadcast-able
equi-join of ``queries`` onto ``operators``/``fragments`` followed by a
single hash aggregation. At 100 TB the corpus tables shuffle once on
``query_id`` (or not at all when ``queries`` broadcasts); no per-row
driver round-trips exist anywhere.

Python-2 semantics preserved from the reference: ms/s/MB rescaling uses
integer floor division (``stats.py:103,149,157``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..corpus import IDIV, corpus_fragments, corpus_operators, corpus_queries, with_corpus

# statement classes the stats pass analyzes (stats.py:18-20)
STMT_TYPES = ("SelectStmt", "InsertStmt", "UnionStmt")
_STMT_IN = "('SelectStmt', 'InsertStmt', 'UnionStmt')"


def _filtered_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 tag filter + P2 membership filter (stats.py:18-20)."""
    q = corpus_queries(spark, sf_dir)
    return q.filter((F.col("tag") == "tpch") & F.col("sql_type").isin(*STMT_TYPES))


def op_time_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-query operator time rollup (stats.py:58-61):
    ``$match(query_id) -> $group(by name, sum(avg_time))`` re-expressed as
    one grouped aggregation over the J1 join."""
    q = _filtered_queries(spark, sf_dir).select("query_id")
    ops = corpus_operators(spark, sf_dir)
    return (
        ops.join(q, "query_id")
        .groupBy("query_id", "name")
        .agg(F.sum("avg_time").alias("sum_time"))
    )


def codegen_sink_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — per-query grand sums of fragment CodeGen / HdfsTableSink time
    (stats.py:63-71), reading the nested counter maps like the reference
    reads ``avg_code_gen.TotalTime``."""
    q = _filtered_queries(spark, sf_dir).select("query_id")
    frags = corpus_fragments(spark, sf_dir)
    return (
        frags.join(q, "query_id")
        .groupBy("query_id")
        .agg(
            F.sum(F.element_at("avg_code_gen", F.lit("TotalTime"))).alias("code_gen_time"),
            F.sum(F.element_at("avg_hdfs_table_sink", F.lit("TotalTime"))).alias("hdfs_table_sink_time"),
        )
    )


def join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — per-query join census (stats.py:117-142): four Mongo count()
    round-trips per query become one conditional-aggregation pass."""
    q = _filtered_queries(spark, sf_dir).select("query_id")
    ops = corpus_operators(spark, sf_dir)
    is_join = F.col("name").isin("HASH JOIN", "CROSS JOIN")
    return (
        q.join(ops, "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.count(F.when(is_join, 1)).alias("num_joins"),
            F.count(F.when(is_join & (F.col("join_impl") == "BROADCAST"), 1)).alias("num_broadcast_joins"),
            F.count(F.when(is_join & (F.col("join_impl") == "PARTITIONED"), 1)).alias("num_partitioned_joins"),
            F.count(
                F.when((F.col("name") == "HASH JOIN") & (F.col("join_type") == "INNER JOIN"), 1)
            ).alias("num_inner_joins"),
        )
    )


def distinct_scan_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — distinct tables scanned per query (profile_analyzer.py:305),
    checked against the stored ``num_tables``."""
    q = _filtered_queries(spark, sf_dir).select("query_id", "num_tables")
    ops = corpus_operators(spark, sf_dir)
    scans = ops.filter(F.col("name") == "SCAN HDFS")
    return (
        q.join(scans, "query_id", "left")
        .groupBy("query_id", "num_tables")
        .agg(F.count_distinct("table_name").alias("num_tables_computed"))
    )


def scan_size_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — summed SCAN HDFS bytes per query, 0 when none (stats.py:144-151);
    MB via py2 floor division (``size / 1024 / 1024``)."""
    q = _filtered_queries(spark, sf_dir).select("query_id")
    ops = corpus_operators(spark, sf_dir)
    scan_sums = (
        ops.filter(F.col("name") == "SCAN HDFS")
        .groupBy("query_id")
        .agg(F.sum("size").alias("scan_bytes"))
    )
    return (
        q.join(scan_sums, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("scan_bytes", F.lit(0)).alias("scan_bytes"),
            F.expr(
                "CAST(FLOOR(COALESCE(scan_bytes, 0) / CAST(1048576 AS DOUBLE)) AS BIGINT)"
            ).alias("scan_mb"),
        )
    )


# (metric name, per-query expression) — inputs to the A6 distribution sweep
_A6_METRICS = (
    "num_joins", "num_broadcast_joins", "num_partitioned_joins", "num_inner_joins",
    "num_tables", "num_hdfs_scans", "num_output_columns", "num_from_subqueries",
    "num_group_by_columns", "num_order_by_columns", "num_limits", "scan_mb",
    "runtime_s",
)


def _per_query_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _filtered_queries(spark, sf_dir)
    jc = join_counts(spark, sf_dir)
    sz = scan_size_per_query(spark, sf_dir).select("query_id", "scan_mb")
    return (
        q.select(
            "query_id", "num_tables", "num_hdfs_scans", "num_output_columns",
            "num_from_subqueries", "num_group_by_columns", "num_order_by_columns",
            "num_limits",
            F.expr("CAST(FLOOR(runtime / CAST(1000000000 AS DOUBLE)) AS BIGINT)").alias("runtime_s"),
        )
        .join(jc, "query_id")
        .join(sz, "query_id")
    )


def workload_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — min/max/avg of every workload distribution the reference plots
    (stats.py:174-344), as (metric, min, max, avg) rows.

    avg is written explicitly as sum/count so Spark and the oracle evaluate
    the identical double expression."""
    m = _per_query_metrics(spark, sf_dir)
    stacked = m.select(
        "query_id",
        F.expr(
            "stack({n}, {args}) AS (metric, value)".format(
                n=len(_A6_METRICS),
                args=", ".join(f"'{c}', {c}" for c in _A6_METRICS),
            )
        ),
    )
    return stacked.groupBy("metric").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.sum("value").cast("double") / F.count("value")).alias("avg_value"),
    )


def rollup_by_sql_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — per-statement-class rollup (stats.py:407-411): group all tagged
    queries by sql_type; runtime total in ms via py2 floor division."""
    q = corpus_queries(spark, sf_dir).filter(F.col("tag") == "tpch")
    return (
        q.groupBy("sql_type")
        .agg(F.sum("runtime").alias("total_runtime"), F.count("*").alias("num_queries"))
        .select(
            "sql_type",
            F.expr("CAST(FLOOR(total_runtime / CAST(1000000 AS DOUBLE)) AS BIGINT)").alias("total_runtime_ms"),
            "num_queries",
        )
    )


def workload_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a20 — multidimensional workload CUBE over (query_type, sql_type,
    cluster): query counts, total runtime (ms, py2 floor), and max hosts
    at every grouping-set granularity — the OLAP drill-down surface the
    reference approximates with one hand-written rollup per dimension
    (stats.py:407-411 does only sql_type). NULL dimension values mark the
    rolled-up axes, exactly as DuckDB's CUBE emits them.

    Scale: Catalyst expands the cube into an Expand + single hash
    aggregate — one shuffle regardless of how many grouping sets, with
    map-side partial aggregation on the expanded rows."""
    q = corpus_queries(spark, sf_dir)
    return (
        q.cube("query_type", "sql_type", "cluster")
        .agg(
            F.count("*").alias("num_queries"),
            F.expr(
                "CAST(FLOOR(SUM(runtime) / CAST(1000000 AS DOUBLE)) AS BIGINT)"
            ).alias("total_runtime_ms"),
            F.max("num_hosts").alias("max_hosts"),
        )
    )


def runtime_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a21 — runtime decile profile per query_type: NTILE(10) over
    runtime, then per-decile count / boundary / mean — the latency-
    distribution banding an operator dashboard draws (the reference plots
    raw histograms; deciles are the drill-down form). Ties broken by
    query_id so the banding is deterministic across engines.

    Scale: one window sort per query_type partition plus a tiny rollup;
    at cluster scale the exact NTILE would swap for the a19-style sketch
    quantiles — this is the exact twin."""
    q = corpus_queries(spark, sf_dir)
    w = Window.partitionBy("query_type").orderBy("runtime", "query_id")
    banded = q.select(
        "query_type", "runtime",
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )
    return banded.groupBy("query_type", "decile").agg(
        F.count("*").alias("num_queries"),
        F.min("runtime").alias("lo_runtime"),
        F.max("runtime").alias("hi_runtime"),
        F.expr(
            "CAST(FLOOR(SUM(runtime) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
        ).alias("mean_runtime"),
    )


def operator_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a22 — operator co-occurrence matrix: for every unordered pair of
    operator types, how many queries contain both — the workload-
    characterization signal behind the reference's clustering features
    (which operators travel together: scans with exchanges, joins with
    preaggs). Pairs are ordered name_a < name_b so each appears once.

    Scale: distinct (query, name) first (one shuffle, heavy map-side
    collapse since plans repeat operators), then a self-join on query_id
    that reuses the same partitioning; the output is bounded by the
    operator-type vocabulary squared, not by data."""
    ops = corpus_operators(spark, sf_dir).select("query_id", "name").distinct()
    a, b = ops.alias("a"), ops.alias("b")
    return (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .groupBy(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .agg(F.count("*").alias("num_queries"))
    )


def query_num_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 — num_hosts = max over the query's operators
    (profile_analyzer.py:303); output kept alongside the stored value so the
    invariant is visible."""
    q = corpus_queries(spark, sf_dir).filter(F.col("sql_type") != "DdlStmt")
    ops = corpus_operators(spark, sf_dir)
    return (
        ops.groupBy("query_id")
        .agg(F.max("num_hosts").alias("max_op_num_hosts"))
        .join(q.select("query_id", "num_hosts"), "query_id")
    )


def operator_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — straggler detection (stats.py:43-46): diff_time = max - avg,
    expressed as a share of query runtime, thresholded at 1%."""
    q = _filtered_queries(spark, sf_dir).select("query_id", "runtime")
    ops = corpus_operators(spark, sf_dir)
    return (
        ops.join(q, "query_id")
        .withColumn("diff_time", F.col("max_time") - F.col("avg_time"))
        .withColumn("diff_time_pct", F.round(F.col("diff_time") / F.col("runtime").cast("double"), 9))
        .filter(F.col("diff_time_pct") >= 0.01)
        .select("query_id", "id", "name", "diff_time", "diff_time_pct")
    )


# ---------------------------------------------------------------- oracles --
_FQ = f"SELECT * FROM iwa_queries WHERE tag = 'tpch' AND sql_type IN {_STMT_IN}"

_A6_PER_QUERY = f"""
fq AS ({_FQ}),
jc AS (
  SELECT fq.query_id,
         COUNT(CASE WHEN o.name IN ('HASH JOIN', 'CROSS JOIN') THEN 1 END) AS num_joins,
         COUNT(CASE WHEN o.name IN ('HASH JOIN', 'CROSS JOIN') AND o.join_impl = 'BROADCAST' THEN 1 END) AS num_broadcast_joins,
         COUNT(CASE WHEN o.name IN ('HASH JOIN', 'CROSS JOIN') AND o.join_impl = 'PARTITIONED' THEN 1 END) AS num_partitioned_joins,
         COUNT(CASE WHEN o.name = 'HASH JOIN' AND o.join_type = 'INNER JOIN' THEN 1 END) AS num_inner_joins
  FROM fq LEFT JOIN iwa_operators o ON fq.query_id = o.query_id
  GROUP BY fq.query_id
),
sz AS (
  SELECT fq.query_id,
         COALESCE(s.scan_bytes, 0) AS scan_bytes,
         {IDIV('COALESCE(s.scan_bytes, 0)', 1048576)} AS scan_mb
  FROM fq LEFT JOIN (
    SELECT query_id, CAST(SUM(size) AS BIGINT) AS scan_bytes
    FROM iwa_operators WHERE name = 'SCAN HDFS' GROUP BY query_id
  ) s ON fq.query_id = s.query_id
),
pq AS (
  SELECT fq.query_id, fq.num_tables, fq.num_hdfs_scans, fq.num_output_columns,
         fq.num_from_subqueries, fq.num_group_by_columns, fq.num_order_by_columns,
         fq.num_limits, {IDIV('fq.runtime', 1000000000)} AS runtime_s,
         jc.num_joins, jc.num_broadcast_joins, jc.num_partitioned_joins,
         jc.num_inner_joins, sz.scan_mb
  FROM fq JOIN jc ON fq.query_id = jc.query_id JOIN sz ON fq.query_id = sz.query_id
)
"""

# metrics the reference renders as dense BAR charts (stats.py:182-331 —
# every hist'd metric except the wide-ranged scan size and runtime)
_PLT_BAR_METRICS = tuple(
    m for m in _A6_METRICS if m not in ("scan_mb", "runtime_s")
)


def _stacked_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _per_query_metrics(spark, sf_dir)
    return m.select(
        F.expr(
            "stack({n}, {args}) AS (metric, value)".format(
                n=len(_A6_METRICS),
                args=", ".join(f"'{c}', {c}" for c in _A6_METRICS),
            )
        )
    )


def metric_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plt1 — S11's plot DATA layer: the exact histogram series behind
    every ``plots.hist`` call in the reference (stats.py:177-344 renders
    the A6 per-query metrics). Bin arithmetic is the reference's
    python-2 recipe verbatim (plots.py:23-41): ``step = max(1,
    (max-min)/10)`` integer floor, edges ``range(min, max(min+11*step,
    max+step), step)``, and pyplot's last-bin-right-inclusive counting.
    One row per (metric, bin) with empty bins zero-filled — pixels are a
    presentation concern (SURVEY §1.4), the series IS the plot.

    Exactness: every edge and bin index is BIGINT arithmetic, identical
    in both engines.

    Scale: the per-metric stats table is metric-cardinality (broadcast
    back); binning is one map-side expression + one grouped count over
    (metric, bin) — never a sort."""
    stacked = _stacked_metrics(spark, sf_dir)
    stats = (
        stacked.groupBy("metric")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .withColumn("step", F.expr("greatest(1, (mx - mn) div 10)"))
        .withColumn("stop", F.expr("greatest(mn + step * 11, mx + step)"))
        .withColumn("nbins", F.expr("(stop - mn - 1) div step"))
    )
    grid = stats.select(
        "metric", "mn", "step",
        F.posexplode(F.expr("sequence(0, nbins - 1)")).alias("_i", "bin_idx"),
    ).select(
        "metric",
        F.col("bin_idx").cast("bigint").alias("bin_idx"),
        (F.col("mn") + F.col("bin_idx") * F.col("step")).alias("bin_start"),
        (F.col("mn") + (F.col("bin_idx") + 1) * F.col("step")).alias("bin_end"),
    )
    counts = (
        stacked.join(F.broadcast(stats), "metric")
        .select(
            "metric",
            F.expr("least((value - mn) div step, nbins - 1)").alias("bin_idx"),
        )
        .groupBy("metric", "bin_idx")
        .agg(F.count("*").cast("bigint").alias("n_queries"))
    )
    return (
        grid.join(counts, ["metric", "bin_idx"], "left")
        .select(
            "metric", "bin_idx", "bin_start", "bin_end",
            F.coalesce("n_queries", F.lit(0)).cast("bigint").alias("n_queries"),
        )
    )


def metric_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plt2 — the dense integer BAR series behind every ``plots.bar``
    call (plots.py:44-59: ``height[v - min] += 1`` over the value range).
    One row per (metric, value) from min..max, zero-filled. Covers the
    count-valued metrics the reference bars (the wide-ranged scan size /
    runtime get histograms only — same exclusion as stats.py).

    Scale: bar metrics are small-count columns (joins, tables, clauses),
    so the dense min..max grid is tens of rows per metric by the
    REFERENCE's own chart contract; one grouped count + one grid join."""
    stacked = _stacked_metrics(spark, sf_dir).filter(
        F.col("metric").isin(*_PLT_BAR_METRICS)
    )
    stats = stacked.groupBy("metric").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    grid = stats.select(
        "metric", F.explode(F.expr("sequence(mn, mx)")).alias("value")
    )
    counts = stacked.groupBy("metric", "value").agg(
        F.count("*").cast("bigint").alias("n_queries")
    )
    return (
        grid.join(counts, ["metric", "value"], "left")
        .select(
            "metric",
            F.col("value").cast("bigint").alias("value"),
            F.coalesce("n_queries", F.lit(0)).cast("bigint").alias("n_queries"),
        )
    )


def runtime_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a23 — runtime DRIFT detection per (cluster, sql_type): the workload
    time axis splits at its global midpoint (integer arithmetic, so both
    engines draw the identical boundary), each group's early/late floor-
    mean runtimes are compared, and ``drift`` = late/early — the
    regression-watch view an operator reads to catch a cluster or
    statement class getting slower over the observation window (the
    reference eyeballs this from its runtime histograms; this is the
    queryable form). Groups with an empty half are dropped — no
    baseline, no drift claim.

    Scale: one pass for the 2-value bounds (broadcast back), one grouped
    agg over the corpus — group count is clusters x statement types,
    constant-bounded. Means are py2 floor-division (the corpus counter
    convention); the ratio divides the two floored BIGINTs, so the gate
    value is engine-exact."""
    q = corpus_queries(spark, sf_dir)
    bounds = q.groupBy().agg(
        F.min("start_time").alias("lo"), F.max("start_time").alias("hi")
    )
    tagged = q.crossJoin(F.broadcast(bounds)).withColumn(
        "late", F.col("start_time") * 2 > F.col("lo") + F.col("hi")
    )
    agg = tagged.groupBy("cluster", "sql_type").agg(
        F.sum(F.when(~F.col("late"), 1).otherwise(0)).cast("bigint").alias("early_n"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).cast("bigint").alias("late_n"),
        F.expr(
            f"{IDIV('SUM(CASE WHEN NOT late THEN runtime ELSE 0 END)', 'NULLIF(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END), 0)')}"
        ).alias("early_mean"),
        F.expr(
            f"{IDIV('SUM(CASE WHEN late THEN runtime ELSE 0 END)', 'NULLIF(SUM(CASE WHEN late THEN 1 ELSE 0 END), 0)')}"
        ).alias("late_mean"),
    )
    return agg.filter((F.col("early_n") > 0) & (F.col("late_n") > 0)).select(
        "cluster",
        "sql_type",
        "early_n",
        "late_n",
        "early_mean",
        "late_mean",
        F.round(
            F.col("late_mean").cast("double") / F.col("early_mean"), 9
        ).alias("drift"),
    )


def cost_model_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a24 — per-operator-name COST MODEL calibration: least-squares fit
    of avg_time against num_rows across the workload's operators, giving
    each operator class an empirical ns-per-row slope, fixed-cost
    intercept, and R² — measured-profile grounding for the kind of cost
    reasoning the reference's join audit hard-codes (joins.py's
    broadcast-vs-partitioned constants). An operator whose R² is high
    and slope large is row-bound; a high intercept marks per-instance
    setup cost.

    Float discipline: all five moments (Σx, Σy, Σxy, Σx², Σy²)
    accumulate as exact DECIMAL — commutative, so partial-agg order can
    never move the fit — and both engines then evaluate the identical
    closed-form double expressions. Groups with zero variance in either
    axis are excluded (no line to fit). One grouped agg over the
    bucketed operator corpus; output is name-cardinality rows."""
    ops = corpus_operators(spark, sf_dir).select(
        "name",
        F.col("num_rows").cast("decimal(19,0)").alias("x"),
        F.col("avg_time").cast("decimal(19,0)").alias("y"),
    )
    agg = ops.groupBy("name").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_ops").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = n * F.col("sxy").cast("double") - sx * sy
    varx = n * F.col("sxx").cast("double") - sx * sx
    vary = n * F.col("syy").cast("double") - sy * sy
    slope = cov / varx
    return agg.filter((varx > 0) & (vary > 0)).select(
        "name",
        "n_ops",
        F.round(slope, 6).alias("ns_per_row"),
        F.round((sy - slope * sx) / n, 6).alias("fixed_ns"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


_RESID_TOP = 20  # model-unexplained instances reported


def cost_model_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a25 — COST-MODEL residual outliers: every operator instance scored
    against a24's fitted per-name line (predicted = ns_per_row * rows +
    fixed), reporting the ``_RESID_TOP`` instances with the largest
    absolute residual — "which executions the calibrated model cannot
    explain", the triage list a regression review reads after a24
    calibrates. Predictions use a24's PUBLISHED coefficients quantized
    to integer micro-units via FLOOR(coeff * 1e6) — the published
    double is cross-engine bit-identical (a24 hash-matches), the *1e6
    multiply is one IEEE op, and FLOOR is exactly determined by the
    double's bits (no decimal-string rounding, the r07 trap: Spark
    rounds a double's exact decimal expansion while DuckDB scales and
    rounds in binary, so ROUND/CAST-to-DECIMAL of a raw double can
    differ in the last unit). Everything downstream is exact DECIMAL
    integer arithmetic in micro-ns; the published doubles are casts OF
    the identical exact value (tpch_q1's numeric discipline).
    |residual| ordering compares the exact micro integers, tie-broken
    by (query_id, op_id).

    Scale: a24's single grouped agg builds the name-cardinality fit
    table, broadcast back over the bucketed operator scan (ev12's
    two-pass shape — the operator stream never shuffles); the top-N cut
    is a distributed TakeOrderedAndProject."""
    fit = cost_model_fit(spark, sf_dir).select(
        "name",
        F.floor(F.col("ns_per_row") * 1e6).cast("decimal(25,0)").alias("ns_u"),
        F.floor(F.col("fixed_ns") * 1e6).cast("decimal(25,0)").alias("fx_u"),
    )
    ops = corpus_operators(spark, sf_dir).select(
        "query_id",
        F.col("id").alias("op_id"),
        "name",
        F.col("num_rows").cast("bigint").alias("num_rows"),
        F.col("avg_time").cast("bigint").alias("avg_time"),
    )
    pred_u = (F.col("ns_u") * F.col("num_rows") + F.col("fx_u")).cast(
        "decimal(38,0)"
    )
    scored = (
        ops.join(F.broadcast(fit), "name")
        .withColumn("pred_u", pred_u)
        .withColumn(
            "resid_u",
            (
                F.col("avg_time").cast("decimal(25,0)") * 1000000 - F.col("pred_u")
            ).cast("decimal(38,0)"),
        )
    )
    return (
        scored.orderBy(
            F.abs(F.col("resid_u")).desc(), F.asc("query_id"), F.asc("op_id")
        )
        .limit(_RESID_TOP)
        .select(
            "query_id", "op_id", "name", "num_rows", "avg_time",
            (F.col("pred_u").cast("double") / 1e6).alias("predicted"),
            (F.col("resid_u").cast("double") / 1e6).alias("residual"),
        )
    )


_QUANTILES = (("q50", 0.5), ("q95", 0.95), ("q99", 0.99))


def operator_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a18 — exact per-operator-name quantiles of avg_time, defined by
    integer rank arithmetic (value at 0-indexed rank floor(p * (n - 1)) of
    the ascending sort) so both engines compute bit-identical BIGINT
    answers — no float interpolation, no cross-engine rounding trap.

    Scale: a per-name sort (window) is the exact path; the sketch-based
    a19 twin is the 100 TB path (mergeable, single pass, no sort)."""
    from pyspark.sql import Window  # noqa: PLC0415

    ops = corpus_operators(spark, sf_dir).select("name", "avg_time")
    w = Window.partitionBy("name").orderBy("avg_time")
    ranked = ops.select(
        "name",
        "avg_time",
        (F.row_number().over(w) - 1).alias("rk"),
        F.count("*").over(Window.partitionBy("name")).alias("n"),
    )
    picks = [
        ranked.filter(F.col("rk") == F.floor(F.lit(p) * (F.col("n") - 1)))
        .groupBy("name")
        # ties on avg_time make any rank-holder equivalent: the VALUE is
        # identical; min() collapses duplicates deterministically
        .agg(F.min("avg_time").alias("value"))
        .withColumn("quantile", F.lit(label))
        for label, p in _QUANTILES
    ]
    out = picks[0]
    for df in picks[1:]:
        out = out.unionByName(df)
    return out.select("name", "quantile", "value")


_W7_QUANTILES = (("p50", 0.5), ("p95", 0.95))


def plan_overhead_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w7 — PLANNING / SCHEDULING OVERHEAD: per cluster, exact p50/p95 of
    (a) the planner's share of total runtime (ppm, integer floor) and
    (b) the fragment start lag (ns between query start and first
    fragment execution — admission + scheduling). The two pre-execution
    overheads a workload analyzer separates from execution time when
    deciding whether a slow cluster is slow at PLANNING or at RUNNING;
    uses the profile's plan_time / fragment_start_time fields no other
    analytic reads.

    Exactness: both metrics are BIGINT (ppm via floor division), and the
    quantiles are a18's integer-rank picks — engine-exact end to end.

    Scale: two windows over query-cardinality rows partitioned by
    cluster; output is clusters x quantiles."""
    q = corpus_queries(spark, sf_dir).filter(
        (F.col("runtime").isNotNull()) & (F.col("runtime") > 0)
    ).select(
        "cluster",
        F.expr(
            "CAST(FLOOR(plan_time * 1000000 / CAST(runtime AS DOUBLE)) AS BIGINT)"
        ).alias("plan_ppm"),
        F.col("fragment_start_time").cast("bigint").alias("sched_lag_ns"),
    )
    out = None
    for metric in ("plan_ppm", "sched_lag_ns"):
        w = Window.partitionBy("cluster").orderBy(metric)
        ranked = q.select(
            "cluster",
            F.col(metric).alias("value"),
            (F.row_number().over(w) - 1).alias("rk"),
            F.count("*").over(Window.partitionBy("cluster")).alias("n"),
        )
        for label, p in _W7_QUANTILES:
            pick = (
                ranked.filter(F.col("rk") == F.floor(F.lit(p) * (F.col("n") - 1)))
                .groupBy("cluster")
                .agg(F.min("value").alias("value"))
                .select(
                    "cluster",
                    F.lit(metric).alias("metric"),
                    F.lit(label).alias("quantile"),
                    "value",
                )
            )
            out = pick if out is None else out.unionByName(pick)
    return out


def host_load_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a27 — HOST LOAD BALANCE: explode each query's executor host list
    and measure, per cluster, how evenly query assignments spread across
    its hosts — max/min assignments and the imbalance ratio
    (max_load x n_hosts / total, 1.0 = perfectly even). The fleet-ops
    complement to p5's per-operator skew: a hot HOST, not a hot operator.

    Scale: one explode + one grouped agg on (cluster, host) — host
    cardinality rows — then a cluster rollup; all counts integer, one
    rounded division at the end."""
    q = corpus_queries(spark, sf_dir).select(
        "cluster", F.explode("hosts").alias("host")
    )
    per_host = q.groupBy("cluster", "host").agg(
        F.count("*").cast("bigint").alias("load")
    )
    return (
        per_host.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_hosts"),
            F.sum("load").cast("bigint").alias("n_assignments"),
            F.max("load").alias("max_load"),
            F.min("load").alias("min_load"),
        )
        .withColumn(
            "imbalance",
            F.round(
                (F.col("max_load") * F.col("n_hosts"))
                / F.col("n_assignments").cast("double"),
                9,
            ),
        )
    )


def cardinality_qerror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a26 — PLANNER CARDINALITY AUDIT: per operator class, the Q-error
    of the optimizer's row estimates (|ln(est/actual)|, the standard
    misestimation metric) plus how often the planner underestimates —
    the feedback loop a cost-based optimizer team reads to find which
    operator's stats are lying. Uses the profile's est_num_rows vs
    num_rows, both > 0 (−1 sentinels mean "estimate unavailable").

    Exactness: the per-row error is rounded to 6 decimals and summed as
    DECIMAL(18,6) — exact, partial-agg-order-proof — then one double
    division at the end; both engines feed identical decimals.

    Scale: one filter + one grouped agg over the bucketed operator scan."""
    ops = corpus_operators(spark, sf_dir).select(
        "name", "num_rows", "est_num_rows"
    ).filter((F.col("num_rows") > 0) & (F.col("est_num_rows") > 0))
    scored = ops.withColumn(
        "qerr",
        F.expr(
            "CAST(round(abs(ln(CAST(est_num_rows AS DOUBLE)"
            " / CAST(num_rows AS DOUBLE))), 6) AS DECIMAL(18,6))"
        ),
    )
    agg = scored.groupBy("name").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.sum("qerr").alias("sum_qerr"),
        F.max("qerr").cast("double").alias("max_qerr"),
        F.sum(
            F.when(F.col("est_num_rows") < F.col("num_rows"), 1).otherwise(0)
        ).cast("bigint").alias("n_underest"),
    )
    return agg.select(
        "name",
        "n_ops",
        F.round(F.col("sum_qerr").cast("double") / F.col("n_ops"), 9).alias(
            "mean_qerr"
        ),
        "max_qerr",
        F.round(F.col("n_underest") / F.col("n_ops").cast("double"), 9).alias(
            "underest_frac"
        ),
    )


# admission-control gate for a28: queries whose per-host peak footprint
# exceeds this would queue under a mem_limit=256MB pool
_MEM_LIMIT = 256 * 1024 * 1024


def memory_reservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a28 — MEMORY RESERVATION / ADMISSION-CONTROL REPORT: per query,
    the aggregate peak memory its operators actually used vs what the
    planner estimated (the profile's PeakMemoryUsage vs
    EstimatedPeakMemoryUsage, ``profile_analyzer.py:219`` parse), the
    per-host footprint (py2 floor division, consistent with the
    reference's unit rescaling), the single hungriest operator class,
    and whether the query would queue under a 256 MB-per-host admission
    pool — the capacity-planning read an Impala admin does before
    setting mem_limit.

    Exactness: every column is integer arithmetic (sums, floor-div,
    comparisons) — hash-stable across engines with no float rounding.
    The top operator is picked by a deterministic
    (peak_mem DESC, name ASC, id ASC) window rank, never ``max_by``
    (tie order undefined in both engines).

    Scale: one keyed aggregation plus one window rank, both partitioned
    by query_id over the bucketed operator scan — no driver work, no
    broadcast of anything data-sized; the queries side joins on the
    same key."""
    q = _filtered_queries(spark, sf_dir).select("query_id", "num_hosts")
    ops = corpus_operators(spark, sf_dir).select(
        "query_id", "id", "name", "peak_mem", "est_peak_mem"
    )
    agg = ops.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.sum("peak_mem").cast("bigint").alias("total_peak_mem"),
        F.sum("est_peak_mem").cast("bigint").alias("total_est_peak_mem"),
        F.sum(
            F.greatest(F.col("peak_mem") - F.col("est_peak_mem"), F.lit(0))
        ).cast("bigint").alias("underest_bytes"),
    )
    wtop = Window.partitionBy("query_id").orderBy(
        F.desc("peak_mem"), F.asc("name"), F.asc("id")
    )
    top = (
        ops.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("name").alias("top_mem_op"),
            F.col("peak_mem").alias("top_mem_bytes"),
        )
    )
    return (
        agg.join(top, "query_id")
        .join(q, "query_id")
        .withColumn(
            "mem_per_host",
            F.expr(IDIV("total_peak_mem", "num_hosts")).cast("bigint"),
        )
        .withColumn("over_limit", F.col("mem_per_host") > F.lit(_MEM_LIMIT))
        .select(
            "query_id", "n_ops", "total_peak_mem", "total_est_peak_mem",
            "underest_bytes", "top_mem_op", "top_mem_bytes",
            "mem_per_host", "over_limit",
        )
    )


def shuffle_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a29 — SHUFFLE-AMPLIFICATION AUDIT: per query, the rows its plan
    moved through EXCHANGE operators relative to the rows its scans
    produced — the network-pressure metric that separates "this query
    is slow because it reads a lot" from "this query is slow because
    its plan re-shuffles what it read" (high amplification points at a
    missing pre-aggregation or a join order that shuffles the fact side
    repeatedly). Uses the profile's per-operator RowsReturned
    (``num_rows``), −1 sentinels excluded.

    Exactness: integer sums and counts; the amplification ratio is one
    final division rounded to 9, NULL when no scan rows exist (DDL-less
    plan or all-sentinel scans) — same guard in both engines.

    Scale: a single conditional grouped aggregation over the bucketed
    operator scan, partitioned by query_id — no second shuffle."""
    ops = corpus_operators(spark, sf_dir).select("query_id", "name", "num_rows")
    agg = ops.filter(F.col("num_rows") >= 0).groupBy("query_id").agg(
        F.sum(
            F.when(F.col("name") == "EXCHANGE", F.col("num_rows")).otherwise(0)
        ).cast("bigint").alias("exchange_rows"),
        F.sum(
            F.when(F.col("name").startswith("SCAN"), F.col("num_rows")).otherwise(0)
        ).cast("bigint").alias("scan_rows"),
        F.sum(
            F.when(F.col("name") == "EXCHANGE", 1).otherwise(0)
        ).cast("bigint").alias("n_exchanges"),
        F.sum(
            F.when(F.col("name").startswith("SCAN"), 1).otherwise(0)
        ).cast("bigint").alias("n_scans"),
    )
    return agg.select(
        "query_id", "exchange_rows", "scan_rows", "n_exchanges", "n_scans",
        F.when(
            F.col("scan_rows") > 0,
            F.round(F.col("exchange_rows") / F.col("scan_rows").cast("double"), 9),
        ).alias("amplification"),
    )


def capacity_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a30 — CAPACITY TREND: per cluster, the least-squares slope of
    query arrivals per minute over the workload's time span — the
    "is this cluster's load growing, and how fast" number a capacity
    review extrapolates from (a24's exact-moment fit pattern applied to
    the arrival time series instead of the cost model). Empty minutes
    inside the span count as zero via the ev25-style generated grid —
    skipping them would bias the slope toward busy periods.

    Exactness: bucket ids, counts, and all five fit moments
    (B, Σx, Σy, Σxy, Σx²) are exact integers; slope and mean are each
    ONE final integer-ratio division rounded to 9 — partial-agg order
    can never move them. x is rebased to the cluster's first minute so
    the moments stay far below 2^63.

    Scale: one grouped count per (cluster, minute) — the only
    query-cardinality shuffle — then a minute-cardinality grid join and
    a cluster-cardinality moment rollup."""
    q = corpus_queries(spark, sf_dir).select(
        "cluster", F.expr(IDIV("start_time", 60_000_000)).alias("minute")
    )
    counts = q.groupBy("cluster", "minute").agg(
        F.count("*").cast("bigint").alias("y")
    )
    span = counts.groupBy("cluster").agg(
        F.min("minute").alias("lo"), F.max("minute").alias("hi")
    )
    grid = span.select(
        "cluster", "lo",
        F.explode(F.sequence("lo", "hi")).alias("minute"),
    )
    filled = (
        grid.join(counts, ["cluster", "minute"], "left")
        .fillna(0, ["y"])
        .withColumn("x", (F.col("minute") - F.col("lo")).cast("bigint"))
    )
    m = filled.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("b"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return m.select(
        "cluster",
        F.col("b").alias("n_buckets"),
        F.col("sy").alias("n_queries"),
        F.round(F.col("sy") / F.col("b").cast("double"), 9).alias("qpm_mean"),
        F.when(
            F.col("b") * F.col("sxx") - F.col("sx") * F.col("sx") > 0,
            F.round(
                (F.col("b") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.col("b") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double"),
                9,
            ),
        ).alias("slope_qpm"),
    )


_TAIL_P = 0.9  # tail = queries at or above the per-cluster p90 runtime


def tail_latency_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w6 — TAIL-LATENCY ATTRIBUTION: per cluster, which operator class
    carries the most time inside the slowest decile of queries — the
    fleet-triage question ("what should THIS cluster's owners optimize")
    that combines a18's exact rank-quantile (the p90 runtime cutoff,
    integer rank arithmetic so both engines agree bit-for-bit) with A1's
    operator rollup restricted to the tail set.

    Scale: one window rank over query-cardinality rows for the cutoff,
    the cutoff table is cluster-cardinality (broadcast), and the operator
    rollup is one keyed aggregation over the tail's operators only."""
    q = _filtered_queries(spark, sf_dir).filter(
        F.col("runtime").isNotNull()
    ).select("cluster", "query_id", "runtime")
    wrk = Window.partitionBy("cluster").orderBy("runtime")
    ranked = q.select(
        "cluster",
        "runtime",
        (F.row_number().over(wrk) - 1).alias("rk"),
        F.count("*").over(Window.partitionBy("cluster")).alias("n"),
    )
    thr = (
        ranked.filter(F.col("rk") == F.floor(F.lit(_TAIL_P) * (F.col("n") - 1)))
        .groupBy("cluster")
        .agg(
            F.min("runtime").alias("tail_threshold"),
            F.min("n").cast("bigint").alias("n_queries"),
        )
    )
    tail = q.join(F.broadcast(thr), "cluster").filter(
        F.col("runtime") >= F.col("tail_threshold")
    )
    ops = corpus_operators(spark, sf_dir).select("query_id", "name", "avg_time")
    agg = (
        ops.join(tail.select("cluster", "query_id"), "query_id")
        .groupBy("cluster", "name")
        .agg(F.sum("avg_time").cast("bigint").alias("op_time"))
    )
    pick = Window.partitionBy("cluster").orderBy(F.desc("op_time"), F.asc("name"))
    top = (
        agg.withColumn("rk2", F.row_number().over(pick))
        .filter(F.col("rk2") == 1)
        .select("cluster", F.col("name").alias("top_operator"),
                F.col("op_time").alias("top_operator_time"))
    )
    n_tail = tail.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_tail")
    )
    return (
        thr.join(n_tail, "cluster")
        .join(top, "cluster")
        .select(
            "cluster", "n_queries", "tail_threshold", "n_tail",
            "top_operator", "top_operator_time",
        )
    )


_SKETCH_EPS = 0.005  # rank-error bound checked in-engine; percentile_approx
# at accuracy 10000 guarantees 1e-4 relative rank error — 50x slack


def operator_time_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a19 — the same quantiles via ``percentile_approx`` (Greenwald-Khanna
    sketch): single-pass, mergeable, no per-group sort — the plan that
    survives 100 TB.

    The raw sketch value is algorithm-dependent (no cross-engine twin), so
    the query is SELF-VALIDATING: it locates the sketch value's 0-indexed
    rank interval [cnt_lt, cnt_le - 1] inside each (name, quantile) group
    and emits ``within_bound`` = does that interval intersect the target
    rank floor(p * (n - 1)) +- _SKETCH_EPS * n. The hashed output is the
    EXACT quantile (a18's integer-rank definition) plus the boolean; the
    DuckDB oracle recomputes the exact value and asserts TRUE — so a
    driver green row certifies both the exact path AND the sketch's rank
    error bound. Second pin: ``test_quantile_sketch_within_rank_error``."""
    ops = corpus_operators(spark, sf_dir).select("name", "avg_time")
    agg = ops.groupBy("name").agg(
        *[
            F.expr(f"percentile_approx(avg_time, {p}, 10000)").alias(label)
            for label, p in _QUANTILES
        ]
    )
    stack_args = ", ".join(f"'{label}', {label}" for label, _ in _QUANTILES)
    sketch = agg.selectExpr(
        "name", f"stack({len(_QUANTILES)}, {stack_args}) AS (quantile, sk_value)"
    )
    # sketch is (n_names x 3) rows — broadcast it back over the operator
    # stream; the stream itself never shuffles twice (one groupBy)
    p_expr = F.when(F.col("quantile") == "q50", F.lit(0.5)).when(
        F.col("quantile") == "q95", F.lit(0.95)
    ).otherwise(F.lit(0.99))
    located = (
        ops.join(F.broadcast(sketch), "name")
        .groupBy("name", "quantile", "sk_value")
        .agg(
            F.sum(F.when(F.col("avg_time") < F.col("sk_value"), 1).otherwise(0)).alias("cnt_lt"),
            F.sum(F.when(F.col("avg_time") <= F.col("sk_value"), 1).otherwise(0)).alias("cnt_le"),
            F.count("*").alias("n"),
        )
        .withColumn("target_rk", F.floor(p_expr * (F.col("n") - 1)))
        .withColumn(
            "within_bound",
            (F.col("cnt_le") - 1 >= F.col("target_rk") - _SKETCH_EPS * F.col("n"))
            & (F.col("cnt_lt") <= F.col("target_rk") + _SKETCH_EPS * F.col("n")),
        )
    )
    exact = operator_time_quantiles(spark, sf_dir).withColumnRenamed(
        "value", "exact_value"
    )
    return exact.join(
        located.select("name", "quantile", "within_bound"), ["name", "quantile"]
    ).select("name", "quantile", "exact_value", "within_bound")


ORACLES: dict[str, str] = {
    "a18_operator_time_quantiles": with_corpus("""
        , ranked AS (
          SELECT name, avg_time,
                 ROW_NUMBER() OVER (PARTITION BY name ORDER BY avg_time) - 1 AS rk,
                 COUNT(*) OVER (PARTITION BY name) AS n
          FROM iwa_operators
        )
        SELECT name, q.quantile, MIN(avg_time) AS value
        FROM ranked
        JOIN (VALUES ('q50', 0.5), ('q95', 0.95), ('q99', 0.99)) q(quantile, p)
          ON rk = CAST(FLOOR(q.p * (n - 1)) AS BIGINT)
        GROUP BY name, q.quantile"""),
    # plt1/plt2: S11's plot data series — py2 bin arithmetic in SQL
    "plt1_metric_histograms": with_corpus(
        ",\n" + _A6_PER_QUERY.strip() + f"""
        , stacked AS (
          SELECT metric, value FROM pq
          UNPIVOT (value FOR metric IN ({", ".join(_A6_METRICS)}))),
        stats AS (
          SELECT metric, MIN(value) AS mn, MAX(value) AS mx,
                 GREATEST(1, (MAX(value) - MIN(value)) // 10) AS step
          FROM stacked GROUP BY metric),
        stats2 AS (
          SELECT *, GREATEST(mn + step * 11, mx + step) AS stop FROM stats),
        stats3 AS (
          SELECT *, (stop - mn - 1) // step AS nbins FROM stats2),
        grid AS (
          SELECT metric, CAST(i AS BIGINT) AS bin_idx,
                 mn + i * step AS bin_start,
                 mn + (i + 1) * step AS bin_end
          FROM stats3,
               LATERAL (SELECT unnest(range(0, nbins)) AS i)),
        counts AS (
          SELECT s.metric,
                 LEAST((s.value - t.mn) // t.step, t.nbins - 1) AS bin_idx,
                 CAST(COUNT(*) AS BIGINT) AS n_queries
          FROM stacked s JOIN stats3 t USING (metric)
          GROUP BY 1, 2)
        SELECT g.metric, g.bin_idx, g.bin_start, g.bin_end,
               CAST(COALESCE(c.n_queries, 0) AS BIGINT) AS n_queries
        FROM grid g LEFT JOIN counts c
          ON c.metric = g.metric AND c.bin_idx = g.bin_idx"""
    ),
    "plt2_metric_bars": with_corpus(
        ",\n" + _A6_PER_QUERY.strip() + f"""
        , stacked AS (
          SELECT metric, value FROM pq
          UNPIVOT (value FOR metric IN ({", ".join(_PLT_BAR_METRICS)}))),
        stats AS (
          SELECT metric, MIN(value) AS mn, MAX(value) AS mx
          FROM stacked GROUP BY metric),
        grid AS (
          SELECT metric, CAST(v AS BIGINT) AS value
          FROM stats, LATERAL (SELECT unnest(range(mn, mx + 1)) AS v)),
        counts AS (
          SELECT metric, value, CAST(COUNT(*) AS BIGINT) AS n_queries
          FROM stacked GROUP BY 1, 2)
        SELECT g.metric, g.value,
               CAST(COALESCE(c.n_queries, 0) AS BIGINT) AS n_queries
        FROM grid g LEFT JOIN counts c
          ON c.metric = g.metric AND c.value = g.value"""
    ),
    # w7: BIGINT overhead metrics + a18's integer-rank quantile picks
    "w7_plan_overhead_quantiles": with_corpus("""
        , base AS (
          SELECT cluster,
                 CAST(FLOOR(plan_time * 1000000 / CAST(runtime AS DOUBLE))
                      AS BIGINT) AS plan_ppm,
                 CAST(fragment_start_time AS BIGINT) AS sched_lag_ns
          FROM iwa_queries
          WHERE runtime IS NOT NULL AND runtime > 0),
        stacked AS (
          SELECT cluster, 'plan_ppm' AS metric, plan_ppm AS value FROM base
          UNION ALL
          SELECT cluster, 'sched_lag_ns', sched_lag_ns FROM base),
        ranked AS (
          SELECT cluster, metric, value,
                 ROW_NUMBER() OVER (PARTITION BY cluster, metric
                                    ORDER BY value) - 1 AS rk,
                 COUNT(*) OVER (PARTITION BY cluster, metric) AS n
          FROM stacked)
        SELECT cluster, metric, q.quantile, MIN(value) AS value
        FROM ranked
        JOIN (VALUES ('p50', 0.5), ('p95', 0.95)) q(quantile, p)
          ON rk = CAST(FLOOR(q.p * (n - 1)) AS BIGINT)
        GROUP BY cluster, metric, q.quantile"""),
    # a27: the corpus CTE has no hosts array, but the fixture's host list
    # is by construction host<cluster>-<i> for i in 1..num_hosts, so the
    # per-host LOAD distribution (all the output reads) reconstructs from
    # the host INDEX — names never reach the output columns
    "a27_host_load_balance": with_corpus("""
        , assigned AS (
          SELECT cluster, i AS host
          FROM iwa_queries,
               LATERAL (SELECT unnest(range(1, num_hosts + 1)) AS i)),
        per_host AS (
          SELECT cluster, host, CAST(COUNT(*) AS BIGINT) AS load
          FROM assigned GROUP BY 1, 2)
        SELECT cluster,
               CAST(COUNT(*) AS BIGINT) AS n_hosts,
               CAST(SUM(load) AS BIGINT) AS n_assignments,
               MAX(load) AS max_load,
               MIN(load) AS min_load,
               ROUND(MAX(load) * COUNT(*) / CAST(SUM(load) AS DOUBLE), 9)
                 AS imbalance
        FROM per_host GROUP BY cluster"""),
    # a26: per-row rounded-6 q-error summed as exact DECIMAL(18,6)
    "a26_cardinality_qerror": with_corpus("""
        , scored AS (
          SELECT name, est_num_rows, num_rows,
                 CAST(round(abs(ln(CAST(est_num_rows AS DOUBLE)
                        / CAST(num_rows AS DOUBLE))), 6)
                      AS DECIMAL(18,6)) AS qerr
          FROM iwa_operators
          WHERE num_rows > 0 AND est_num_rows > 0)
        SELECT name,
               CAST(COUNT(*) AS BIGINT) AS n_ops,
               ROUND(CAST(SUM(qerr) AS DOUBLE) / COUNT(*), 9) AS mean_qerr,
               CAST(MAX(qerr) AS DOUBLE) AS max_qerr,
               ROUND(SUM(CASE WHEN est_num_rows < num_rows THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 9) AS underest_frac
        FROM scored GROUP BY name"""),
    # a28: all-integer admission report; the top operator rank mirrors the
    # engine's deterministic (peak_mem DESC, name ASC, id ASC) window
    "a28_memory_reservation": with_corpus(f"""
        , agg AS (
          SELECT query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_ops,
                 CAST(SUM(peak_mem) AS BIGINT) AS total_peak_mem,
                 CAST(SUM(est_peak_mem) AS BIGINT) AS total_est_peak_mem,
                 CAST(SUM(GREATEST(peak_mem - est_peak_mem, 0)) AS BIGINT)
                   AS underest_bytes
          FROM iwa_operators GROUP BY query_id),
        top AS (
          SELECT query_id, name AS top_mem_op, peak_mem AS top_mem_bytes
          FROM (SELECT query_id, name, peak_mem, id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY peak_mem DESC, name ASC, id ASC) AS rn
                FROM iwa_operators)
          WHERE rn = 1)
        SELECT a.query_id, a.n_ops, a.total_peak_mem, a.total_est_peak_mem,
               a.underest_bytes, t.top_mem_op, t.top_mem_bytes,
               CAST({IDIV('a.total_peak_mem', 'q.num_hosts')} AS BIGINT)
                 AS mem_per_host,
               CAST({IDIV('a.total_peak_mem', 'q.num_hosts')} AS BIGINT)
                 > {_MEM_LIMIT} AS over_limit
        FROM agg a
        JOIN top t ON a.query_id = t.query_id
        JOIN ({_FQ}) q ON a.query_id = q.query_id"""),
    # a29: conditional integer sums over the operator scan; ratio NULL
    # when no scan rows, mirrored by CASE in both engines
    "a29_shuffle_amplification": with_corpus("""
        SELECT query_id,
               CAST(SUM(CASE WHEN name = 'EXCHANGE' THEN num_rows ELSE 0 END)
                 AS BIGINT) AS exchange_rows,
               CAST(SUM(CASE WHEN name LIKE 'SCAN%' THEN num_rows ELSE 0 END)
                 AS BIGINT) AS scan_rows,
               CAST(SUM(CASE WHEN name = 'EXCHANGE' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_exchanges,
               CAST(SUM(CASE WHEN name LIKE 'SCAN%' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_scans,
               CASE WHEN SUM(CASE WHEN name LIKE 'SCAN%' THEN num_rows
                                  ELSE 0 END) > 0
                    THEN ROUND(SUM(CASE WHEN name = 'EXCHANGE' THEN num_rows
                                        ELSE 0 END)
                               / CAST(SUM(CASE WHEN name LIKE 'SCAN%'
                                               THEN num_rows ELSE 0 END)
                                      AS DOUBLE), 9)
               END AS amplification
        FROM iwa_operators
        WHERE num_rows >= 0
        GROUP BY query_id"""),
    # a30: exact integer fit moments over the zero-filled minute grid;
    # slope/mean are single rounded divisions, degenerate-span guarded
    "a30_capacity_trend": with_corpus(f"""
        , counts AS (
          SELECT cluster, {IDIV('start_time', 60000000)} AS minute,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM iwa_queries GROUP BY 1, 2),
        span AS (
          SELECT cluster, MIN(minute) AS lo, MAX(minute) AS hi
          FROM counts GROUP BY cluster),
        grid AS (
          SELECT cluster, lo, unnest(range(lo, hi + 1)) AS minute
          FROM span),
        filled AS (
          SELECT g.cluster, g.minute - g.lo AS x, COALESCE(c.y, 0) AS y
          FROM grid g LEFT JOIN counts c
            ON c.cluster = g.cluster AND c.minute = g.minute),
        m AS (
          SELECT cluster,
                 CAST(COUNT(*) AS BIGINT) AS b,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM filled GROUP BY cluster)
        SELECT cluster, b AS n_buckets, sy AS n_queries,
               ROUND(sy / CAST(b AS DOUBLE), 9) AS qpm_mean,
               CASE WHEN b * sxx - sx * sx > 0
                    THEN ROUND((b * sxy - sx * sy)
                               / CAST(b * sxx - sx * sx AS DOUBLE), 9)
               END AS slope_qpm
        FROM m"""),
    # w6: exact integer-rank p90 cutoff per cluster, then the operator
    # rollup over the tail set — top operator per cluster
    "w6_tail_latency_attribution": with_corpus(f"""
        , fq AS (SELECT * FROM ({_FQ}) WHERE runtime IS NOT NULL),
        ranked AS (
          SELECT cluster, runtime,
                 ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY runtime) - 1 AS rk,
                 COUNT(*) OVER (PARTITION BY cluster) AS n
          FROM fq),
        thr AS (
          SELECT cluster, MIN(runtime) AS tail_threshold,
                 CAST(MIN(n) AS BIGINT) AS n_queries
          FROM ranked
          WHERE rk = CAST(FLOOR({_TAIL_P} * (n - 1)) AS BIGINT)
          GROUP BY cluster),
        tail AS (
          SELECT f.cluster, f.query_id
          FROM fq f JOIN thr t ON f.cluster = t.cluster
          WHERE f.runtime >= t.tail_threshold),
        agg AS (
          SELECT t.cluster, o.name, CAST(SUM(o.avg_time) AS BIGINT) AS op_time
          FROM iwa_operators o JOIN tail t ON o.query_id = t.query_id
          GROUP BY 1, 2),
        top AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                       ORDER BY op_time DESC, name ASC) AS rk2
          FROM agg),
        nt AS (
          SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_tail
          FROM tail GROUP BY 1)
        SELECT t.cluster, t.n_queries, t.tail_threshold, nt.n_tail,
               top.name AS top_operator, top.op_time AS top_operator_time
        FROM thr t
        JOIN nt USING (cluster)
        JOIN top ON top.cluster = t.cluster AND top.rk2 = 1"""),
    # a19's oracle recomputes the exact quantile and asserts the sketch's
    # in-engine rank-error certificate as literal TRUE (see the docstring)
    "a19_operator_time_quantiles_sketch": with_corpus("""
        , ranked AS (
          SELECT name, avg_time,
                 ROW_NUMBER() OVER (PARTITION BY name ORDER BY avg_time) - 1 AS rk,
                 COUNT(*) OVER (PARTITION BY name) AS n
          FROM iwa_operators
        )
        SELECT name, q.quantile, MIN(avg_time) AS exact_value,
               TRUE AS within_bound
        FROM ranked
        JOIN (VALUES ('q50', 0.5), ('q95', 0.95), ('q99', 0.99)) q(quantile, p)
          ON rk = CAST(FLOOR(q.p * (n - 1)) AS BIGINT)
        GROUP BY name, q.quantile"""),
    "a1_op_time_by_name": with_corpus(f"""
        SELECT o.query_id, o.name, CAST(SUM(o.avg_time) AS BIGINT) AS sum_time
        FROM iwa_operators o JOIN ({_FQ}) q ON o.query_id = q.query_id
        GROUP BY o.query_id, o.name"""),
    "a2_codegen_sink_totals": with_corpus(f"""
        SELECT f.query_id,
               CAST(SUM(f.avg_code_gen_total) AS DOUBLE) AS code_gen_time,
               CAST(SUM(f.avg_hdfs_table_sink_total) AS DOUBLE) AS hdfs_table_sink_time
        FROM iwa_fragments f JOIN ({_FQ}) q ON f.query_id = q.query_id
        GROUP BY f.query_id"""),
    "a3_join_counts": with_corpus(f"""
        , fq AS ({_FQ})
        SELECT fq.query_id,
               COUNT(CASE WHEN o.name IN ('HASH JOIN', 'CROSS JOIN') THEN 1 END) AS num_joins,
               COUNT(CASE WHEN o.name IN ('HASH JOIN', 'CROSS JOIN') AND o.join_impl = 'BROADCAST' THEN 1 END) AS num_broadcast_joins,
               COUNT(CASE WHEN o.name IN ('HASH JOIN', 'CROSS JOIN') AND o.join_impl = 'PARTITIONED' THEN 1 END) AS num_partitioned_joins,
               COUNT(CASE WHEN o.name = 'HASH JOIN' AND o.join_type = 'INNER JOIN' THEN 1 END) AS num_inner_joins
        FROM fq LEFT JOIN iwa_operators o ON fq.query_id = o.query_id
        GROUP BY fq.query_id"""),
    "a4_distinct_scan_tables": with_corpus(f"""
        SELECT q.query_id, q.num_tables,
               COUNT(DISTINCT o.table_name) AS num_tables_computed
        FROM ({_FQ}) q
        LEFT JOIN (SELECT * FROM iwa_operators WHERE name = 'SCAN HDFS') o
          ON q.query_id = o.query_id
        GROUP BY q.query_id, q.num_tables"""),
    "a5_scan_size_per_query": with_corpus(f"""
        SELECT q.query_id,
               COALESCE(s.scan_bytes, 0) AS scan_bytes,
               {IDIV('COALESCE(s.scan_bytes, 0)', 1048576)} AS scan_mb
        FROM ({_FQ}) q
        LEFT JOIN (
          SELECT query_id, CAST(SUM(size) AS BIGINT) AS scan_bytes
          FROM iwa_operators WHERE name = 'SCAN HDFS' GROUP BY query_id
        ) s ON q.query_id = s.query_id"""),
    "a6_workload_distributions": with_corpus(
        ",\n" + _A6_PER_QUERY.strip() + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT '{m}' AS metric, MIN({m}) AS min_value, MAX({m}) AS max_value,"
            f" CAST(SUM({m}) AS DOUBLE) / COUNT({m}) AS avg_value FROM pq"
            for m in _A6_METRICS
        )
    ),
    "a15_rollup_by_sql_type": with_corpus(f"""
        SELECT sql_type,
               {IDIV('SUM(runtime)', 1000000)} AS total_runtime_ms,
               COUNT(*) AS num_queries
        FROM iwa_queries WHERE tag = 'tpch' GROUP BY sql_type"""),
    "a20_workload_cube": with_corpus(f"""
        SELECT query_type, sql_type, cluster,
               COUNT(*) AS num_queries,
               {IDIV('SUM(runtime)', 1000000)} AS total_runtime_ms,
               MAX(num_hosts) AS max_hosts
        FROM iwa_queries
        GROUP BY CUBE (query_type, sql_type, cluster)"""),
    "a22_operator_cooccurrence": with_corpus("""
        SELECT a.name AS name_a, b.name AS name_b, COUNT(*) AS num_queries
        FROM (SELECT DISTINCT query_id, name FROM iwa_operators) a
        JOIN (SELECT DISTINCT query_id, name FROM iwa_operators) b
          ON a.query_id = b.query_id AND a.name < b.name
        GROUP BY 1, 2"""),
    "a21_runtime_deciles": with_corpus(f"""
        SELECT query_type, CAST(decile AS BIGINT) AS decile,
               COUNT(*) AS num_queries,
               MIN(runtime) AS lo_runtime,
               MAX(runtime) AS hi_runtime,
               {IDIV('SUM(runtime)', 'COUNT(*)')} AS mean_runtime
        FROM (
          SELECT query_type, runtime,
                 NTILE(10) OVER (PARTITION BY query_type
                                 ORDER BY runtime, query_id) AS decile
          FROM iwa_queries) banded
        GROUP BY 1, 2"""),
    "a25_cost_model_outliers": with_corpus(f"""
        , moments AS (
          SELECT name,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(num_rows AS DECIMAL(19,0))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(avg_time AS DECIMAL(19,0))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(num_rows AS DECIMAL(19,0))
                          * CAST(avg_time AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(num_rows AS DECIMAL(19,0))
                          * CAST(num_rows AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(avg_time AS DECIMAL(19,0))
                          * CAST(avg_time AS DECIMAL(19,0))) AS DOUBLE) AS syy
          FROM iwa_operators GROUP BY name),
        fit AS (
          SELECT name,
                 ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS ns_per_row,
                 ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                       / n, 6) AS fixed_ns
          FROM moments
          WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0),
        fit_u AS (
          SELECT name,
                 CAST(FLOOR(ns_per_row * 1e6) AS DECIMAL(25,0)) AS ns_u,
                 CAST(FLOOR(fixed_ns * 1e6) AS DECIMAL(25,0)) AS fx_u
          FROM fit),
        scored AS (
          SELECT o.query_id, o.id AS op_id, o.name,
                 CAST(o.num_rows AS BIGINT) AS num_rows,
                 CAST(o.avg_time AS BIGINT) AS avg_time,
                 CAST(f.ns_u * CAST(o.num_rows AS BIGINT) + f.fx_u
                      AS DECIMAL(38,0)) AS pred_u
          FROM iwa_operators o JOIN fit_u f USING (name)),
        resid AS (
          SELECT *, CAST(CAST(avg_time AS DECIMAL(25,0)) * 1000000 - pred_u
                         AS DECIMAL(38,0)) AS resid_u
          FROM scored)
        SELECT query_id, op_id, name, num_rows, avg_time,
               CAST(pred_u AS DOUBLE) / 1e6 AS predicted,
               CAST(resid_u AS DOUBLE) / 1e6 AS residual
        FROM resid
        ORDER BY ABS(resid_u) DESC, query_id, op_id
        LIMIT {_RESID_TOP}"""),
    "a24_cost_model_fit": with_corpus("""
        SELECT name, n_ops,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                 AS ns_per_row,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) AS fixed_ns,
               ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        FROM (
          SELECT name,
                 CAST(COUNT(*) AS BIGINT) AS n_ops,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(num_rows AS DECIMAL(19,0))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(avg_time AS DECIMAL(19,0))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(num_rows AS DECIMAL(19,0))
                          * CAST(avg_time AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(num_rows AS DECIMAL(19,0))
                          * CAST(num_rows AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(avg_time AS DECIMAL(19,0))
                          * CAST(avg_time AS DECIMAL(19,0))) AS DOUBLE) AS syy
          FROM iwa_operators GROUP BY name) t
        WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""),
    "a23_runtime_drift": with_corpus(f"""
        SELECT cluster, sql_type, early_n, late_n, early_mean, late_mean,
               ROUND(CAST(late_mean AS DOUBLE) / early_mean, 9) AS drift
        FROM (
          SELECT cluster, sql_type,
                 CAST(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT) AS early_n,
                 CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS late_n,
                 {IDIV("SUM(CASE WHEN NOT late THEN runtime ELSE 0 END)", "NULLIF(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END), 0)")} AS early_mean,
                 {IDIV("SUM(CASE WHEN late THEN runtime ELSE 0 END)", "NULLIF(SUM(CASE WHEN late THEN 1 ELSE 0 END), 0)")} AS late_mean
          FROM (
            SELECT q.cluster, q.sql_type, q.runtime,
                   q.start_time * 2 > b.lo + b.hi AS late
            FROM iwa_queries q
            CROSS JOIN (SELECT MIN(start_time) AS lo, MAX(start_time) AS hi
                        FROM iwa_queries) b) t
          GROUP BY 1, 2) g
        WHERE early_n > 0 AND late_n > 0"""),
    "a17_query_num_hosts": with_corpus("""
        SELECT o.query_id, MAX(o.num_hosts) AS max_op_num_hosts, q.num_hosts
        FROM iwa_operators o
        JOIN (SELECT * FROM iwa_queries WHERE sql_type <> 'DdlStmt') q
          ON o.query_id = q.query_id
        GROUP BY o.query_id, q.num_hosts"""),
    "p5_operator_skew": with_corpus(f"""
        SELECT o.query_id, o.id, o.name,
               o.max_time - o.avg_time AS diff_time,
               ROUND((o.max_time - o.avg_time) / CAST(q.runtime AS DOUBLE), 9) AS diff_time_pct
        FROM iwa_operators o JOIN ({_FQ}) q ON o.query_id = q.query_id
        WHERE ROUND((o.max_time - o.avg_time) / CAST(q.runtime AS DOUBLE), 9) >= 0.01"""),
}

SPARK_QUERIES = {
    "a1_op_time_by_name": op_time_by_name,
    "a2_codegen_sink_totals": codegen_sink_totals,
    "a3_join_counts": join_counts,
    "a4_distinct_scan_tables": distinct_scan_tables,
    "a5_scan_size_per_query": scan_size_per_query,
    "a6_workload_distributions": workload_distributions,
    "a15_rollup_by_sql_type": rollup_by_sql_type,
    "a20_workload_cube": workload_cube,
    "a21_runtime_deciles": runtime_deciles,
    "a22_operator_cooccurrence": operator_cooccurrence,
    "a23_runtime_drift": runtime_drift,
    "a24_cost_model_fit": cost_model_fit,
    "a25_cost_model_outliers": cost_model_outliers,
    "a17_query_num_hosts": query_num_hosts,
    "p5_operator_skew": operator_skew,
    "a18_operator_time_quantiles": operator_time_quantiles,
    "a19_operator_time_quantiles_sketch": operator_time_quantiles_sketch,
    "w6_tail_latency_attribution": tail_latency_attribution,
    "a26_cardinality_qerror": cardinality_qerror,
    "a28_memory_reservation": memory_reservation,
    "a29_shuffle_amplification": shuffle_amplification,
    "a30_capacity_trend": capacity_trend,
    "w7_plan_overhead_quantiles": plan_overhead_quantiles,
    "a27_host_load_balance": host_load_balance,
    "plt1_metric_histograms": metric_histograms,
    "plt2_metric_bars": metric_bars,
}


def table_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a31 — TABLE-AFFINITY matrix: for every unordered pair of scanned
    tables, how many queries scan both and the total bytes those
    queries read from the pair — the co-location advice table. At
    cluster scale, the top pairs by joint scan volume are exactly the
    tables worth bucketing/partitioning on a shared key so their joins
    stop shuffling; the reference reads scans per query
    (profile_analyzer.py:304-305) but never rolls them into pair form.

    Scale: distinct (query, table) off the scan slice first (a22's
    shape — heavy map-side collapse), then a query-keyed self-join
    bounded by tables-per-query squared; output is bounded by the table
    vocabulary squared, not by data."""
    scans = (
        corpus_operators(spark, sf_dir)
        .filter((F.col("name") == "SCAN HDFS") & F.col("table_name").isNotNull())
        .groupBy("query_id", "table_name")
        .agg(F.sum("size").cast("bigint").alias("scan_bytes"))
    )
    a, b = scans.alias("a"), scans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.table_name") < F.col("b.table_name")),
        )
        .groupBy(
            F.col("a.table_name").alias("table_a"),
            F.col("b.table_name").alias("table_b"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum(F.col("a.scan_bytes") + F.col("b.scan_bytes"))
            .cast("bigint")
            .alias("joint_scan_bytes"),
        )
    )


ORACLES["a31_table_affinity"] = with_corpus("""
        , scans AS (
          SELECT query_id, table_name,
                 CAST(SUM(size) AS BIGINT) AS scan_bytes
          FROM iwa_operators
          WHERE name = 'SCAN HDFS' AND table_name IS NOT NULL
          GROUP BY query_id, table_name)
        SELECT a.table_name AS table_a, b.table_name AS table_b,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(a.scan_bytes + b.scan_bytes) AS BIGINT)
                 AS joint_scan_bytes
        FROM scans a
        JOIN scans b
          ON b.query_id = a.query_id AND a.table_name < b.table_name
        GROUP BY 1, 2""")

SPARK_QUERIES["a31_table_affinity"] = table_affinity


def version_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a32 — VERSION REGRESSION report: per (impala_version, sql_type),
    query count, total runtime (floor ms), floor-mean runtime, and the
    exact integer-rank p50 — the "did the upgrade regress SELECTs"
    comparison a workload review runs after a fleet rollout. The corpus
    carries impala_version per profile (reference
    profile_analyzer.py:328-334 harvests it; the reference never rolls
    it up); a23's drift report slices by TIME, this one slices by the
    software version actually running.

    Exactness: counts, floor-divisions, and a18's integer-rank median —
    no float column.

    Scale: one window + one grouped agg over query-cardinality rows,
    partitioned by a tiny (version x sql_type) key."""
    from ..corpus.corpus_sql import IDIV  # noqa: PLC0415

    q = corpus_queries(spark, sf_dir).filter(
        F.col("runtime").isNotNull()
    ).select("impala_version", "sql_type", "runtime")
    w = Window.partitionBy("impala_version", "sql_type").orderBy("runtime")
    ranked = q.select(
        "impala_version",
        "sql_type",
        "runtime",
        (F.row_number().over(w) - 1).alias("rk"),
        F.count("*").over(
            Window.partitionBy("impala_version", "sql_type")
        ).alias("n"),
    )
    med = (
        ranked.filter(F.col("rk") == F.floor(F.lit(0.5) * (F.col("n") - 1)))
        .groupBy("impala_version", "sql_type")
        .agg(F.min("runtime").cast("bigint").alias("p50_runtime_ns"))
    )
    agg = q.groupBy("impala_version", "sql_type").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum("runtime").cast("bigint").alias("sum_runtime_ns"),
    )
    return agg.join(med, ["impala_version", "sql_type"]).select(
        "impala_version",
        "sql_type",
        "n_queries",
        F.expr(IDIV("sum_runtime_ns", 1000000)).alias("total_runtime_ms"),
        F.expr(IDIV("sum_runtime_ns", "n_queries")).alias("mean_runtime_ns"),
        "p50_runtime_ns",
    )


def _a32_oracle() -> str:
    return with_corpus(f"""
        , q AS (
          SELECT impala_version, sql_type, runtime FROM iwa_queries
          WHERE runtime IS NOT NULL),
        ranked AS (
          SELECT impala_version, sql_type, runtime,
                 ROW_NUMBER() OVER (PARTITION BY impala_version, sql_type
                                    ORDER BY runtime) - 1 AS rk,
                 COUNT(*) OVER (PARTITION BY impala_version, sql_type) AS n
          FROM q),
        med AS (
          SELECT impala_version, sql_type,
                 CAST(MIN(runtime) AS BIGINT) AS p50_runtime_ns
          FROM ranked WHERE rk = FLOOR(0.5 * (n - 1))
          GROUP BY impala_version, sql_type),
        agg AS (
          SELECT impala_version, sql_type,
                 CAST(COUNT(*) AS BIGINT) AS n_queries,
                 CAST(SUM(runtime) AS BIGINT) AS sum_runtime_ns
          FROM q GROUP BY impala_version, sql_type)
        SELECT a.impala_version, a.sql_type, a.n_queries,
               {IDIV('a.sum_runtime_ns', 1000000)} AS total_runtime_ms,
               {IDIV('a.sum_runtime_ns', 'a.n_queries')} AS mean_runtime_ns,
               m.p50_runtime_ns
        FROM agg a JOIN med m USING (impala_version, sql_type)""")


ORACLES["a32_version_regression"] = _a32_oracle()
SPARK_QUERIES["a32_version_regression"] = version_regression


def join_strategy_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a33 — JOIN-STRATEGY ADVICE: the reference's broadcast-vs-
    partitioned cost model (joins.py:5-20: broadcastCost =
    min(leftBytes, rightBytes) * num_hosts, partitionedCost =
    leftBytes + rightBytes) applied FORWARD over the a31 table-affinity
    pairs — instead of auditing past join choices (a9), advise the next
    one from workload history. Per co-scanned table pair: floor-mean
    scanned bytes per side across the queries that join them, the
    cluster width those queries actually ran at (max num_hosts), both
    model costs, and the cheaper strategy. Equal costs keep the
    reference's tie rule (joins.py:16-18: not-broadcast wins ties).

    Exactness: floor-mean bytes, integer cost products, a CASE verdict —
    all BIGINT/string.

    Scale: a31's distinct (query, table) aggregation plus one query-
    keyed join to pick up num_hosts; output bounded by table-pairs."""
    from ..corpus.corpus_sql import IDIV  # noqa: PLC0415

    scans = (
        corpus_operators(spark, sf_dir)
        .filter((F.col("name") == "SCAN HDFS") & F.col("table_name").isNotNull())
        .groupBy("query_id", "table_name")
        .agg(F.sum("size").cast("bigint").alias("scan_bytes"))
    )
    hosts = corpus_queries(spark, sf_dir).select(
        "query_id", F.col("num_hosts").cast("bigint").alias("num_hosts")
    )
    a, b = scans.alias("a"), scans.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.table_name") < F.col("b.table_name")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.table_name").alias("table_a"),
            F.col("b.table_name").alias("table_b"),
            F.col("a.scan_bytes").alias("bytes_a"),
            F.col("b.scan_bytes").alias("bytes_b"),
        )
        .join(hosts, "query_id")
        .groupBy("table_a", "table_b")
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum("bytes_a").cast("bigint").alias("sum_a"),
            F.sum("bytes_b").cast("bigint").alias("sum_b"),
            F.max("num_hosts").cast("bigint").alias("max_hosts"),
        )
    )
    mean_a = F.expr(IDIV("sum_a", "n_queries"))
    mean_b = F.expr(IDIV("sum_b", "n_queries"))
    advised = pairs.select(
        "table_a",
        "table_b",
        "n_queries",
        mean_a.alias("mean_bytes_a"),
        mean_b.alias("mean_bytes_b"),
        "max_hosts",
    ).withColumn(
        "broadcast_cost",
        F.least("mean_bytes_a", "mean_bytes_b") * F.col("max_hosts"),
    ).withColumn(
        "partitioned_cost", F.col("mean_bytes_a") + F.col("mean_bytes_b")
    )
    return advised.select(
        "table_a",
        "table_b",
        "n_queries",
        "mean_bytes_a",
        "mean_bytes_b",
        "max_hosts",
        F.col("broadcast_cost").cast("bigint").alias("broadcast_cost"),
        F.col("partitioned_cost").cast("bigint").alias("partitioned_cost"),
        F.when(
            F.col("broadcast_cost") < F.col("partitioned_cost"), "BROADCAST"
        ).otherwise("PARTITIONED").alias("advice"),
    )


def _a33_oracle() -> str:
    return with_corpus(f"""
        , scans AS (
          SELECT query_id, table_name,
                 CAST(SUM(size) AS BIGINT) AS scan_bytes
          FROM iwa_operators
          WHERE name = 'SCAN HDFS' AND table_name IS NOT NULL
          GROUP BY query_id, table_name),
        pairs AS (
          SELECT a.table_name AS table_a, b.table_name AS table_b,
                 CAST(COUNT(*) AS BIGINT) AS n_queries,
                 CAST(SUM(a.scan_bytes) AS BIGINT) AS sum_a,
                 CAST(SUM(b.scan_bytes) AS BIGINT) AS sum_b,
                 CAST(MAX(q.num_hosts) AS BIGINT) AS max_hosts
          FROM scans a
          JOIN scans b
            ON b.query_id = a.query_id AND a.table_name < b.table_name
          JOIN iwa_queries q ON q.query_id = a.query_id
          GROUP BY 1, 2),
        m AS (
          SELECT table_a, table_b, n_queries,
                 {IDIV('sum_a', 'n_queries')} AS mean_bytes_a,
                 {IDIV('sum_b', 'n_queries')} AS mean_bytes_b,
                 max_hosts
          FROM pairs)
        SELECT table_a, table_b, n_queries, mean_bytes_a, mean_bytes_b,
               max_hosts,
               CAST(LEAST(mean_bytes_a, mean_bytes_b) * max_hosts AS BIGINT)
                 AS broadcast_cost,
               CAST(mean_bytes_a + mean_bytes_b AS BIGINT) AS partitioned_cost,
               CASE WHEN LEAST(mean_bytes_a, mean_bytes_b) * max_hosts
                         < mean_bytes_a + mean_bytes_b
                    THEN 'BROADCAST' ELSE 'PARTITIONED' END AS advice
        FROM m""")


ORACLES["a33_join_strategy_advice"] = _a33_oracle()
SPARK_QUERIES["a33_join_strategy_advice"] = join_strategy_advice


def operator_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a34 — operator ASSOCIATION STRENGTH: a22 counts how many queries
    contain each unordered operator-type pair; this adds the marginals
    and the normalized association figures that make those counts
    actionable — directional confidence (given a query runs operator A,
    how often does B ride along, in exact ppm) and lift in milli-units
    (observed co-occurrence over the independence expectation). Lift
    >> 1000 names the operator pairs that structurally travel together
    (the motif signal pt7 reads off plan shapes, here recovered from
    bag-of-operators alone); confidence asymmetry separates "every A
    implies B" from "B is just everywhere". This is the workload-
    characterization layer behind the reference's clustering features
    (``clustering.py:14-40`` builds per-query operator-count vectors;
    lift is the pairwise structure of those vectors).

    Exactness: counts are BIGINTs off distinct (query, name); ppm and
    milli figures are integer floor divisions. The lift numerator
    ``n_both * n_total * 1000`` stays under IDIV's 2^53 exact-double
    envelope through sf1 (~1.5M corpus queries -> <= 2.3e15).

    Scale: one distinct over (query_id, name) (heavy map-side collapse),
    a self-join reusing that query_id partitioning (a22's plan), then
    everything downstream is bounded by the operator-type vocabulary:
    the marginal and total frames are vocabulary-sized and broadcast."""
    ops = corpus_operators(spark, sf_dir).select("query_id", "name").distinct()
    a, b = ops.alias("a"), ops.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .groupBy(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    marg = ops.groupBy("name").agg(F.count("*").cast("bigint").alias("n_q"))
    total = ops.agg(
        F.count_distinct(F.col("query_id")).cast("bigint").alias("n_total")
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("name").alias("name_a"), F.col("n_q").alias("n_a"))),
            "name_a",
        )
        .join(
            F.broadcast(marg.select(F.col("name").alias("name_b"), F.col("n_q").alias("n_b"))),
            "name_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "name_a", "name_b", "n_both", "n_a", "n_b", "n_total",
            F.expr(IDIV("n_both * 1000000", "n_a")).alias("conf_a_to_b_ppm"),
            F.expr(IDIV("n_both * 1000000", "n_b")).alias("conf_b_to_a_ppm"),
            F.expr(IDIV("n_both * n_total * 1000", "n_a * n_b")).alias("lift_milli"),
        )
    )


ORACLES["a34_operator_lift"] = with_corpus(f"""
        , ops AS (SELECT DISTINCT query_id, name FROM iwa_operators),
        pairs AS (
          SELECT a.name AS name_a, b.name AS name_b,
                 CAST(COUNT(*) AS BIGINT) AS n_both
          FROM ops a JOIN ops b
            ON a.query_id = b.query_id AND a.name < b.name
          GROUP BY 1, 2),
        marg AS (SELECT name, CAST(COUNT(*) AS BIGINT) AS n_q
                 FROM ops GROUP BY name),
        tot AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_total
                FROM ops)
        SELECT p.name_a, p.name_b, p.n_both,
               ma.n_q AS n_a, mb.n_q AS n_b, t.n_total,
               {IDIV('p.n_both * 1000000', 'ma.n_q')} AS conf_a_to_b_ppm,
               {IDIV('p.n_both * 1000000', 'mb.n_q')} AS conf_b_to_a_ppm,
               {IDIV('p.n_both * t.n_total * 1000', 'ma.n_q * mb.n_q')} AS lift_milli
        FROM pairs p
        JOIN marg ma ON p.name_a = ma.name
        JOIN marg mb ON p.name_b = mb.name
        CROSS JOIN tot t""")
SPARK_QUERIES["a34_operator_lift"] = operator_lift


def scan_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a35 — SCAN SELECTIVITY AUDIT: per scanned table, how much of it
    queries actually read. Each SCAN HDFS node's row count is ratioed
    (exact ppm) against the table's largest observed scan — the
    unfiltered-scan proxy, since the widest read bounds the table's
    live cardinality from below — giving the selectivity distribution
    the predicate-pushdown advisory reads: a table whose minimum
    selectivity sits near 1e6 is NEVER filtered (partitioning or
    clustering it buys nothing; a31's co-location advice is where its
    wins are), while a low-min high-count table is the next bucketing
    candidate. Extends a4's table census (profile_analyzer.py:305 reads
    the per-query table list) from "which tables" to "how selectively".

    Exactness: row counts are corpus BIGINTs (< 2^17, far inside the
    IDIV envelope); every ratio is an integer floor-division ppm.

    Scale: one filter off the operators scan, one bounded groupBy for
    the per-table maxima (broadcast back — the table vocabulary is
    tiny), one table-keyed rollup. Output is one row per table."""
    ops = corpus_operators(spark, sf_dir)
    scans = ops.filter(F.col("name") == "SCAN HDFS").select(
        "table_name", F.col("num_rows").cast("bigint").alias("nr")
    )
    mx = scans.groupBy("table_name").agg(
        F.max("nr").cast("bigint").alias("max_rows")
    )
    sel = scans.join(F.broadcast(mx), "table_name").withColumn(
        "sel_ppm", F.expr(IDIV("nr * 1000000", "max_rows"))
    )
    return sel.groupBy("table_name").agg(
        F.count("*").cast("bigint").alias("n_scans"),
        F.max("max_rows").alias("max_rows"),
        F.min("sel_ppm").alias("min_sel_ppm"),
        F.expr(IDIV("SUM(sel_ppm)", "COUNT(*)")).alias("mean_sel_ppm"),
        F.sum((F.col("sel_ppm") == 1_000_000).cast("bigint")).alias("n_full_scans"),
    )


ORACLES["a35_scan_selectivity"] = with_corpus(f"""
        , scans AS (
          SELECT table_name, CAST(num_rows AS BIGINT) AS nr
          FROM iwa_operators WHERE name = 'SCAN HDFS'),
        mx AS (
          SELECT table_name, CAST(MAX(nr) AS BIGINT) AS max_rows
          FROM scans GROUP BY table_name),
        sel AS (
          SELECT s.table_name, s.nr, m.max_rows,
                 {IDIV('s.nr * 1000000', 'm.max_rows')} AS sel_ppm
          FROM scans s JOIN mx m ON s.table_name = m.table_name)
        SELECT table_name,
               CAST(COUNT(*) AS BIGINT) AS n_scans,
               CAST(MAX(max_rows) AS BIGINT) AS max_rows,
               CAST(MIN(sel_ppm) AS BIGINT) AS min_sel_ppm,
               {IDIV('SUM(sel_ppm)', 'COUNT(*)')} AS mean_sel_ppm,
               CAST(SUM(CASE WHEN sel_ppm = 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_full_scans
        FROM sel GROUP BY table_name""")
SPARK_QUERIES["a35_scan_selectivity"] = scan_selectivity


def straggler_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a36 — STRAGGLER CENSUS by operator type: p5 flags individual
    straggling operator instances (diff_time = max - avg instance time,
    thresholded at 1% of query runtime — stats.py:43-46); this rolls
    the same predicate up per operator NAME into the capacity-planning
    view — which operator TYPES produce stragglers, how often (exact
    ppm of that type's population), how many queries they touch, and
    how much absolute straggle time they carry. The a13/a14 pattern
    (per-type rollup over a per-instance filter) applied to skew: a
    type with high straggler_ppm is where repartitioning/salting
    effort pays; one with high max but low ppm was one bad plan.

    Exactness: diff_time sums are exact BIGINT ns; the straggler
    predicate reuses p5's ROUND(..., 9) >= 0.01 tree verbatim so both
    engines flag identical instances; the rate is floor-division ppm.

    Scale: one join keyed by query_id (runtime attach), one groupBy
    over the bounded operator-name vocabulary. No new shuffles beyond
    p5's own shape."""
    q = _filtered_queries(spark, sf_dir).select("query_id", "runtime")
    ops = corpus_operators(spark, sf_dir)
    j = (
        ops.join(q, "query_id")
        .withColumn("diff_time", (F.col("max_time") - F.col("avg_time")).cast("bigint"))
        .withColumn(
            "is_strag",
            F.round(F.col("diff_time") / F.col("runtime").cast("double"), 9) >= 0.01,
        )
    )
    return j.groupBy("name").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.sum(F.col("is_strag").cast("bigint")).cast("bigint").alias("n_stragglers"),
        F.countDistinct(F.when(F.col("is_strag"), F.col("query_id")))
        .cast("bigint").alias("n_queries_affected"),
        F.expr(IDIV("SUM(CAST(is_strag AS BIGINT)) * 1000000", "COUNT(*)"))
        .alias("straggler_ppm"),
        F.sum(F.when(F.col("is_strag"), F.col("diff_time")).otherwise(F.lit(0)))
        .cast("bigint").alias("straggler_diff_time"),
        F.max("diff_time").cast("bigint").alias("max_diff_time"),
    )


ORACLES["a36_straggler_census"] = with_corpus(f"""
        , j AS (
          SELECT o.name, o.query_id,
                 CAST(o.max_time - o.avg_time AS BIGINT) AS diff_time,
                 ROUND((o.max_time - o.avg_time)
                       / CAST(q.runtime AS DOUBLE), 9) >= 0.01 AS is_strag
          FROM iwa_operators o JOIN ({_FQ}) q ON o.query_id = q.query_id)
        SELECT name,
               CAST(COUNT(*) AS BIGINT) AS n_ops,
               CAST(SUM(CASE WHEN is_strag THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_stragglers,
               CAST(COUNT(DISTINCT CASE WHEN is_strag THEN query_id END)
                 AS BIGINT) AS n_queries_affected,
               {IDIV('SUM(CASE WHEN is_strag THEN 1 ELSE 0 END) * 1000000',
                     'COUNT(*)')} AS straggler_ppm,
               CAST(SUM(CASE WHEN is_strag THEN diff_time ELSE 0 END)
                 AS BIGINT) AS straggler_diff_time,
               CAST(MAX(diff_time) AS BIGINT) AS max_diff_time
        FROM j GROUP BY name""")
SPARK_QUERIES["a36_straggler_census"] = straggler_census
