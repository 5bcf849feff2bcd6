"""Oracle-checked exercises of the F1-F3 unit parsers: format corpus
metrics with the Impala pretty-printer format, parse them back with the
engine functions, and emit (pretty, parsed, original) — the DuckDB twin
re-derives both directions independently."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import corpus_operators, with_corpus
from .units import pp_bytes, pp_number, pp_number_to_units, pp_size_to_bytes, pp_time, pp_time_to_ns


def size_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — pp_size_to_bytes over formatted scan sizes."""
    scans = corpus_operators(spark, sf_dir).filter(F.col("name") == "SCAN HDFS")
    return scans.select(
        "query_id",
        "id",
        "size",
        pp_bytes(F.col("size")).alias("pretty"),
        pp_size_to_bytes(pp_bytes(F.col("size"))).alias("parsed_bytes"),
    )


def number_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — pp_number_to_units over formatted row counts."""
    ops = corpus_operators(spark, sf_dir)
    return ops.select(
        "query_id",
        "id",
        "num_rows",
        pp_number(F.col("num_rows")).alias("pretty"),
        pp_number_to_units(pp_number(F.col("num_rows"))).alias("parsed_units"),
    )


def time_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — pp_time_to_ns over formatted operator times (max_time reaches
    the compound 'XmYs' branch)."""
    ops = corpus_operators(spark, sf_dir)
    return ops.select(
        "query_id",
        "id",
        "max_time",
        pp_time(F.col("max_time")).alias("pretty"),
        pp_time_to_ns(pp_time(F.col("max_time"))).alias("parsed_ns"),
    )


def _comp(src: str, pattern: str, mult: str) -> str:
    ext = f"regexp_extract({src}, '{pattern}', 1)"
    return f"(CASE WHEN {ext} = '' THEN 0.0 ELSE CAST({ext} AS DOUBLE) * {mult} END)"


def _parse_size(src: str) -> str:
    return ("CAST(TRUNC(" + " + ".join([
        _comp(src, r"([0-9.]+) ?GB", "1073741824.0"),
        _comp(src, r"([0-9.]+) ?MB", "1048576.0"),
        _comp(src, r"([0-9.]+) ?KB", "1024.0"),
        _comp(src, r"(-?[0-9.]+) ?B", "1.0"),
    ]) + ") AS BIGINT)")


def _parse_number(src: str) -> str:
    return ("CAST(TRUNC(" + " + ".join([
        _comp(src, r"([0-9.]+)B", "1000000000.0"),
        _comp(src, r"([0-9.]+)M", "1000000.0"),
        _comp(src, r"([0-9.]+)K", "1000.0"),
        _comp(src, r"^(-?[0-9.]+)$", "1.0"),
    ]) + ") AS BIGINT)")


def _parse_time(src: str) -> str:
    return ("CAST(TRUNC(" + " + ".join([
        _comp(src, r"([0-9.]+)h", "3600000000000.0"),
        _comp(src, r"([0-9.]+)m($|[0-9])", "60000000000.0"),
        _comp(src, r"([0-9.]+)s", "1000000000.0"),
        _comp(src, r"([0-9.]+)ms", "1000000.0"),
        _comp(src, r"([0-9.]+)us", "1000.0"),
        _comp(src, r"([0-9.]+)ns", "1.0"),
    ]) + ") AS BIGINT)")


def _fixed_sql(col: str, divisor: str, decimals: int, suffix: str) -> str:
    """DuckDB twin of units._fixed: fixed-decimal formatting through an
    exactly-representable scaled integer (see that docstring)."""
    scale = 10**decimals
    scaled = f"CAST(ROUND({col} * {scale} / {divisor}) AS BIGINT)"
    return (
        f"(CAST(CAST(FLOOR({scaled} / {float(scale)}) AS BIGINT) AS STRING)"
        f" || '.' || LPAD(CAST({scaled} % {scale} AS STRING), {decimals}, '0')"
        f" || '{suffix}')"
    )


_SIZE_PRETTY = f"""(CASE
  WHEN size >= 1073741824 THEN {_fixed_sql('size', '1073741824.0', 2, ' GB')}
  WHEN size >= 1048576 THEN {_fixed_sql('size', '1048576.0', 2, ' MB')}
  WHEN size >= 1024 THEN {_fixed_sql('size', '1024.0', 2, ' KB')}
  ELSE {_fixed_sql('size', '1.0', 2, ' B')} END)"""

_NUMBER_PRETTY = f"""(CASE
  WHEN num_rows >= 1000000000 THEN {_fixed_sql('num_rows', '1000000000.0', 2, 'B')}
  WHEN num_rows >= 1000000 THEN {_fixed_sql('num_rows', '1000000.0', 2, 'M')}
  WHEN num_rows >= 1000 THEN {_fixed_sql('num_rows', '1000.0', 2, 'K')}
  ELSE CAST(num_rows AS STRING) END)"""

_TIME_PRETTY = f"""(CASE
  WHEN max_time >= 60000000000 THEN
    CAST(CAST(FLOOR(max_time / 60000000000.0) AS BIGINT) AS STRING) || 'm'
    || CAST(CAST(FLOOR((max_time % 60000000000) / 1000000000.0) AS BIGINT) AS STRING) || 's'
  WHEN max_time >= 1000000000 THEN {_fixed_sql('max_time', '1000000000.0', 3, 's')}
  WHEN max_time >= 1000000 THEN {_fixed_sql('max_time', '1000000.0', 3, 'ms')}
  WHEN max_time >= 1000 THEN {_fixed_sql('max_time', '1000.0', 3, 'us')}
  ELSE CAST(max_time AS STRING) || 'ns' END)"""

ORACLES = {
    "f1_pp_size_roundtrip": with_corpus(f"""
        , pretty_t AS (
          SELECT query_id, id, size, {_SIZE_PRETTY} AS pretty
          FROM iwa_operators WHERE name = 'SCAN HDFS'
        )
        SELECT query_id, id, size, pretty, {_parse_size('pretty')} AS parsed_bytes
        FROM pretty_t"""),
    "f2_pp_number_roundtrip": with_corpus(f"""
        , pretty_t AS (
          SELECT query_id, id, num_rows, {_NUMBER_PRETTY} AS pretty FROM iwa_operators
        )
        SELECT query_id, id, num_rows, pretty, {_parse_number('pretty')} AS parsed_units
        FROM pretty_t"""),
    "f3_pp_time_roundtrip": with_corpus(f"""
        , pretty_t AS (
          SELECT query_id, id, max_time, {_TIME_PRETTY} AS pretty FROM iwa_operators
        )
        SELECT query_id, id, max_time, pretty, {_parse_time('pretty')} AS parsed_ns
        FROM pretty_t"""),
}

SPARK_QUERIES = {
    "f1_pp_size_roundtrip": size_roundtrip,
    "f2_pp_number_roundtrip": number_roundtrip,
    "f3_pp_time_roundtrip": time_roundtrip,
}
