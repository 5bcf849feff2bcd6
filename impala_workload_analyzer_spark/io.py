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


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read it as raw INT64 nanoseconds
    (``nanosAsLong``) and rebuild a microsecond TimestampType column with
    exact integer division (DuckDB's reader truncates ns -> us the same
    way). Set at call time so it also works on a caller-owned session."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a lazy DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view (mirrors the DuckDB oracle
    setup, which pre-registers the same names)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
