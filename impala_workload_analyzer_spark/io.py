"""Table loaders for the driver-generated TPC-H-ish fixtures (TESTDATA.md).

All readers are ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning for free; at cluster scale the same call reads a
partitioned directory tree and prunes partitions from the filters.

SCAN CACHE: the fixtures are single files with ONE parquet row group, so
a direct scan is effectively single-threaded — Spark assigns row groups
to byte-range splits by group midpoint, so every split but one yields
zero rows, whatever ``maxPartitionBytes`` says. A real deployment owns
its file layout (100 TB lands as many files/row groups and this shim
never triggers); here the non-tiny tables are re-materialized ONCE per
sf_dir into a parallel multi-file layout — a verbatim row copy, keyed by
the source file's size signature so a regenerated fixture auto-rebuilds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# region/nation are constant-sized dimension stubs — direct read is fine
_SCAN_CACHED = frozenset(TABLES) - {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _src_sig(path: str) -> str:
    return str(os.stat(path).st_size)


def _scan_cached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    src = os.path.join(sf_dir, f"{name}.parquet")
    root = os.path.join(_REPO_ROOT, ".scan_cache",
                        os.path.basename(os.path.normpath(sf_dir)), name)
    sig_path = os.path.join(root, "_SRC_SIG")
    valid = (
        os.path.exists(os.path.join(root, "_SUCCESS"))
        and os.path.exists(sig_path)
        and open(sig_path).read().strip() == _src_sig(src)
    )
    if not valid:
        n = spark.sparkContext.defaultParallelism
        spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(root)
        with open(sig_path, "w") as f:
            f.write(_src_sig(src))
    return spark.read.parquet(root)


def ensure_scan_cache(spark: SparkSession, sf_dir: str) -> None:
    """Materialize every scan-cached table (ingest-side scaffolding —
    call outside any timed region, like the corpus/profile builders)."""
    for name in sorted(_SCAN_CACHED):
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            _scan_cached(spark, sf_dir, name).schema  # noqa: B018 - force build


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    if name in _SCAN_CACHED:
        return _scan_cached(spark, sf_dir, name)
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
    """Read the events fixture (scan-cached) and normalize ``ts`` (see
    ``normalize_event_ts``). ``nanosAsLong`` is set at call time so
    nanos-era fixtures also load on a caller-owned session; it is a
    no-op for the current TIMESTAMP(MICROS) files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(_scan_cached(spark, sf_dir, "events"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a lazy DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view (mirrors the DuckDB oracle
    setup, which pre-registers the same names)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
