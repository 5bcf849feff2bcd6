"""SparkSession factory tuned for the engine.

Local testing runs ``local[N]``; the configs are chosen so the same plans
scale to a multi-executor cluster: AQE handles post-shuffle partition
coalescing and skew joins, Arrow accelerates the few pandas-UDF paths,
and broadcast threshold stays at default so small dimension tables
broadcast automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "impala-workload-analyzer-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Shuffle partitions default to the local core count; on a real cluster
    AQE coalesces them after each exchange so over-provisioning is cheap.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture carries parquet TIMESTAMP(NANOS) (see io.load_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
