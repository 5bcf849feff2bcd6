"""Bucketed-table materialization helpers.

The corpus / ingest materializations are consumed by many analytics that
join or group on ``query_id`` (J1-J4, A1, A16, W2, pt1/pt2 …). Writing
them as plain parquet makes every one of those consumers re-shuffle the
same table on the same key. Instead they are written ONCE as bucketed +
sorted catalog tables: ``HashPartitioning(query_id)`` then satisfies the
clustered distribution of every downstream join/aggregate whose keys
include ``query_id``, so those exchanges (and sorts) disappear from the
plans — the Spark-native equivalent of the co-located index lookups the
reference gets from its (query_id, id) Mongo index
(profile_analyzer.py:15-21).

At 100 TB the bucket count would scale with the data (and live in a real
metastore); locally 32 matches the shuffle parallelism. Table metadata in
the in-memory catalog dies with the session, so on a warm cache in a new
process the table is re-registered over the existing bucketed files with
the same DDL — file layout and bucket hashing are unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 32


def _table_name(prefix: str, sf_dir: str, which: str) -> str:
    import os  # noqa: PLC0415

    sf = os.path.basename(os.path.normpath(sf_dir))
    return re.sub(r"[^A-Za-z0-9_]", "_", f"{prefix}_{sf}_{which}")


def write_bucketed(df: DataFrame, path: str, table: str, key: str = "query_id") -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, path: str, table: str,
                  key: str = "query_id") -> DataFrame:
    """Read a previously-written bucketed table, re-registering the
    catalog entry if this is a fresh session over a warm cache."""
    if not spark.catalog.tableExists(table):
        schema_ddl = spark.read.parquet(path).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
            f"LOCATION '{path}'"
        )
    return spark.table(table)
