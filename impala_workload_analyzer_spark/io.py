"""Table loaders for the driver-generated TPC-H-ish fixtures (TESTDATA.md).

All readers are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning for free; at cluster scale the same call reads a
partitioned directory tree and prunes partitions from the filters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to session-TZ TimestampType
    (micros), whatever physical type the fixture generation used:

    - INT64 nanos (older fixtures stored parquet TIMESTAMP(NANOS); with
      ``nanosAsLong`` Spark surfaces it as BIGINT): exact integer
      division ns -> us, matching DuckDB's truncating ns reader.
    - TIMESTAMP_NTZ (current fixtures store TIMESTAMP(MICROS) without
      UTC adjustment): cast to TimestampType — value-preserving under
      the session's UTC timezone, matching DuckDB's naive TIMESTAMP.
    - TimestampType already: pass through.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events fixture and normalize ``ts`` (see
    ``normalize_event_ts``). ``nanosAsLong`` is set at call time so
    nanos-era fixtures also load on a caller-owned session; it is a
    no-op for the current TIMESTAMP(MICROS) files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_event_ts(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a lazy DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view (mirrors the DuckDB oracle
    setup, which pre-registers the same names)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
