"""F4 — bit-reinterpret int64 -> float64 (SURVEY.md §2.8).

The reference decodes Impala DOUBLE_VALUE counters by reinterpreting the
thrift i64 payload as an IEEE-754 double (``profile_analyzer.py:405-411``,
``struct.unpack('d', struct.pack('q', v))``). No Catalyst built-in does
this, so it is the one place a vectorized pandas UDF is the right tool:
numpy ``view('float64')`` reinterprets the whole Arrow batch with zero
copies.

The driver-gate fixture builds bit patterns ``bits(1.0) + k`` — doubles of
the form ``1 + k * 2^-52`` — whose values DuckDB can recompute EXACTLY with
plain arithmetic, so even this non-SQL operator gets a value-checked
oracle (for normal doubles; NaN/inf/subnormals are covered by unit tests).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_ONE_BITS = 4607182418800017408  # struct.unpack('<q', struct.pack('<d', 1.0))[0]
_TWO_52 = 4503599627370496  # 2^52


# NB: returnType must be a DataType INSTANCE — a DDL string would be parsed
# through the active SparkContext at import time, and this module must be
# importable before any session exists (the driver's oracle-only pass).
@pandas_udf(DoubleType())
def bits_to_double(bits: pd.Series) -> pd.Series:
    """Vectorized reinterpret: one numpy view over the Arrow batch."""
    return pd.Series(bits.to_numpy(dtype="int64").view("float64"))


def double_value(col: Column) -> Column:
    """F4 as a Column function (profile_analyzer.py:405-411)."""
    return bits_to_double(col)


def bit_reinterpret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f4_bit_reinterpret — reinterpret ``bits(1.0) + o_orderkey % 2^20``
    per order; value is exactly ``1 + k * 2^-52``."""
    from ..io import load_table  # noqa: PLC0415

    orders = load_table(spark, sf_dir, "orders")
    df = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.lit(_ONE_BITS) + F.col("o_orderkey") % 1048576).alias("bits"),
    )
    return df.select("k", "bits", double_value(F.col("bits")).alias("value"))


ORACLES = {
    "f4_bit_reinterpret": f"""
        SELECT o_orderkey AS k,
               {_ONE_BITS} + o_orderkey % 1048576 AS bits,
               1.0 + CAST(o_orderkey % 1048576 AS DOUBLE) / {_TWO_52}.0 AS value
        FROM orders""",
}

SPARK_QUERIES = {"f4_bit_reinterpret": bit_reinterpret}
