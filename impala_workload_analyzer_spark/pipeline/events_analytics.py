"""Event-stream analytics over the ``events`` fixture (batch form):
tumbling / sliding windows, gap-based sessionization, JSON props
extraction. The reference has no streaming surface (SURVEY.md §2.11) — these
are the planned extensions, all oracle-checked; ``streaming.stream_queries``
runs the tumbling agg as a real Structured Streaming job against the same
oracle.

Portability: window starts are emitted as epoch seconds (BIGINT) —
timestamp collection is timezone-fragile across engines; double sums are
rounded to 6 decimals to absorb partial-agg accumulation order.

Scale notes (100 TB): ev1/ev2 are single-shuffle hash aggs keyed by
(window, type) — at cluster scale the key space is tiny, so partial
aggregation collapses almost everything map-side. ev3 shuffles once on
user_id then does a linear in-partition scan (window + running sum) —
the canonical sessionization plan; skewed users are the known hot spot
(AQE skew handling or user-salting with session re-merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

_GAP_MIN = 30  # session gap


def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev1 — 1-hour tumbling windows x event_type: count + value sum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev2 — 1-hour windows sliding every 30 minutes (each event lands in
    exactly 2 windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev3 — gap-based sessionization (30-min inactivity): gaps-and-islands
    via lag + running sum, then per-session rollup. The batch twin of
    ``F.session_window``."""
    ev = load_table(spark, sf_dir, "events").withColumn("t", F.unix_micros("ts"))
    order = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("t").over(order).isNull()
            | (F.col("t") - F.lag("t").over(order) > _GAP_MIN * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("t").alias("session_start_us"),
        F.max("t").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev4 — JSON extraction from the ``props`` string column + rollup by
    event_type over the extracted key."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.round(F.avg(F.col("k").cast("double")), 6).alias("avg_k"),
        F.count_distinct("k").alias("distinct_k"),
    )


_EV1_ORACLE = """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events GROUP BY 1, 2"""

ORACLES = {
    "ev1_tumbling_hourly": _EV1_ORACLE,
    "ev2_sliding_hourly": """
        WITH offsets(off) AS (VALUES (0), (1800))
        SELECT CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT) - off
                 AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM events CROSS JOIN offsets GROUP BY 1, 2""",
    "ev3_sessionize": f"""
        WITH t AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS t FROM events),
        flagged AS (
          SELECT *, CASE WHEN LAG(t) OVER w IS NULL
                           OR t - LAG(t) OVER w > {_GAP_MIN} * 60 * 1000000
                         THEN 1 ELSE 0 END AS new_session
          FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        sess AS (
          SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged)
        SELECT user_id, session_id,
               MIN(t) AS session_start_us,
               MAX(t) AS session_end_us,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM sess GROUP BY user_id, session_id""",
    "ev4_json_props_stats": """
        WITH e AS (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        SELECT event_type,
               COUNT(*) AS n_events,
               MIN(k) AS min_k,
               MAX(k) AS max_k,
               ROUND(AVG(CAST(k AS DOUBLE)), 6) AS avg_k,
               COUNT(DISTINCT k) AS distinct_k
        FROM e GROUP BY event_type""",
}

SPARK_QUERIES = {
    "ev1_tumbling_hourly": tumbling_hourly,
    "ev2_sliding_hourly": sliding_hourly,
    "ev3_sessionize": sessionize,
    "ev4_json_props_stats": json_props_stats,
}
