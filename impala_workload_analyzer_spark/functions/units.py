"""Scalar function library (SURVEY.md §2.8): Impala pretty-print parsers
re-expressed as pure Column expressions — JVM-side, whole-stage-codegen
friendly, no Python UDFs in the hot path.

The parsers mirror ``profile_analyzer.py:341-403`` exactly, including the
quirks: every unit group is optional and ADDITIVE (so "1h2m" sums, and so
would "1.5GB2MB"), and the float sum is truncated toward zero like py2
``long()``.

The ``pp_*`` formatters are the inverse direction (Impala's
pretty-printer format) used to exercise the parsers on corpus data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _component(col: Column, pattern: str, mult: float) -> Column:
    """Extract one optional unit group and scale it; 0 when absent."""
    ext = F.regexp_extract(col, pattern, 1)
    return F.when(ext == "", F.lit(0.0)).otherwise(ext.cast("double") * mult)


def _trunc_long(x: Column) -> Column:
    """py2 ``long(float)`` — truncate toward zero (Spark's double->long
    cast already truncates; made explicit for symmetry with the DuckDB
    oracles, which must use TRUNC because their cast rounds)."""
    return x.cast("long")


def pp_size_to_bytes(col: Column) -> Column:
    """F1 — '278.73 KB' -> 285419 (profile_analyzer.py:341-360).
    1024-based units, optional space, specials '0' and '-1.00 B'."""
    total = (
        _component(col, r"([0-9.]+) ?GB", 1024.0**3)
        + _component(col, r"([0-9.]+) ?MB", 1024.0**2)
        + _component(col, r"([0-9.]+) ?KB", 1024.0)
        + _component(col, r"(-?[0-9.]+) ?B", 1.0)
    )
    return _trunc_long(total)


def pp_number_to_units(col: Column) -> Column:
    """F2 — '2.85K' -> 2850 (profile_analyzer.py:362-380). DECIMAL units
    B=1e9, M=1e6, K=1e3, bare number passthrough, special '-1'."""
    total = (
        _component(col, r"([0-9.]+)B", 1e9)
        + _component(col, r"([0-9.]+)M", 1e6)
        + _component(col, r"([0-9.]+)K", 1e3)
        + _component(col, r"^(-?[0-9.]+)$", 1.0)
    )
    return _trunc_long(total)


def pp_time_to_ns(col: Column) -> Column:
    """F3 — '795.202us' / '1h2m' -> ns (profile_analyzer.py:382-403).
    Compound additive h/m/s/ms/us/ns components."""
    # NB: the minute pattern avoids lookahead (absent from RE2, which the
    # DuckDB oracle twin uses): 'm' counts as minutes only when followed by
    # end-of-string or another component's digits, so '250ms' stays ms.
    total = (
        _component(col, r"([0-9.]+)h", 3600.0 * 1e9)
        + _component(col, r"([0-9.]+)m($|[0-9])", 60.0 * 1e9)
        + _component(col, r"([0-9.]+)s", 1e9)
        + _component(col, r"([0-9.]+)ms", 1e6)
        + _component(col, r"([0-9.]+)us", 1e3)
        + _component(col, r"([0-9.]+)ns", 1.0)
    )
    return _trunc_long(total)


def _fixed(col: Column, divisor: float, decimals: int, suffix: str) -> Column:
    """'%.{decimals}f{suffix}' via an exactly-representable scaled integer.

    Rounding a raw double at fractional precision diverges across engines
    when the true decimal sits on a .5 boundary that binary can't represent
    (Spark rounds the shortest decimal repr, DuckDB the binary value).
    Scaling to an integer first makes every .5 boundary exact, so both
    engines round identically.
    """
    scale = 10**decimals
    scaled = F.round(col * scale / F.lit(divisor)).cast("long")
    return F.concat(
        F.floor(scaled / scale).cast("long").cast("string"),
        F.lit("."),
        F.lpad((scaled % scale).cast("string"), decimals, "0"),
        F.lit(suffix),
    )


def pp_bytes(col: Column) -> Column:
    """Format bytes like Impala's pretty-printer ('%.2f KB', 1024-based)."""
    return (
        F.when(col >= 1024**3, _fixed(col, 1024.0**3, 2, " GB"))
        .when(col >= 1024**2, _fixed(col, 1024.0**2, 2, " MB"))
        .when(col >= 1024, _fixed(col, 1024.0, 2, " KB"))
        .otherwise(_fixed(col, 1.0, 2, " B"))
    )


def pp_number(col: Column) -> Column:
    """Format a count with decimal K/M/B units ('%.2f')."""
    return (
        F.when(col >= 1_000_000_000, _fixed(col, 1e9, 2, "B"))
        .when(col >= 1_000_000, _fixed(col, 1e6, 2, "M"))
        .when(col >= 1_000, _fixed(col, 1e3, 2, "K"))
        .otherwise(col.cast("string"))
    )


def pp_time(col: Column) -> Column:
    """Format ns like Impala: '1m30s' above a minute, else fractional
    s/ms/us/ns with 3 decimals."""
    return (
        F.when(
            col >= 60_000_000_000,
            F.concat(
                F.floor(col / 60_000_000_000).cast("string"), F.lit("m"),
                F.floor((col % 60_000_000_000) / 1_000_000_000).cast("string"), F.lit("s"),
            ),
        )
        .when(col >= 1_000_000_000, _fixed(col, 1e9, 3, "s"))
        .when(col >= 1_000_000, _fixed(col, 1e6, 3, "ms"))
        .when(col >= 1_000, _fixed(col, 1e3, 3, "us"))
        .otherwise(F.concat(col.cast("string"), F.lit("ns")))
    )


def cluster_id(hosts: Column) -> Column:
    """F5 — md5 of the space-joined sorted host list
    (profile_analyzer.py:45,302)."""
    return F.md5(F.concat_ws(" ", F.array_sort(hosts)))
