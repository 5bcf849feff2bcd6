"""Analytics over the TTimeSeriesCounter harvest (round 13).

The harvest itself lives in ``profiles.parsed_time_series`` (the
``time_series`` MapType landing column; RuntimeProfile.thrift:50-59 —
declared by the wire format, never read by any reference script, so
these are the field's first consumers). This module holds the
DOWNSTREAM analytics so they can evolve without invalidating the
derived-data cache fingerprint (cache_util._SOURCES hashes profiles.py;
analytics over its output do not shape cache content).

ts1 (the ramp rollup) predates this module and lives beside the harvest
in profiles.py; new time-series analytics land here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .profiles import _K, _TAG, parsed_time_series
from ..corpus.corpus_sql import with_corpus


def time_series_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts2 — CROSS-INSTANCE PEAK SKEW: per (tag, fragment id, sampled
    counter), how unevenly the per-instance series peak — the sampled
    high-watermark each fragment instance actually reached — splits
    across a fragment's instances. One row per group with the fragment
    count, how many fragments saw any imbalance, the total/extreme
    peak spread (max instance peak minus min instance peak, exact
    integers), and the peak mass itself — the straggler-memory readout
    an admission controller wants from sampled counters, which the
    point-in-time counter harvest (S7) cannot see.

    Scale: rides the harvest's parse + S8 dedup, then two keyed
    aggregates — per (query, fragment, counter) across instances
    (cardinality = fragments x counters), then the
    |tags| x |fragments| x |counters| rollup. The map explode is
    in-partition and bounded by the wire payload; everything is
    integer arithmetic (no division anywhere)."""
    return skew_over(parsed_time_series(spark, sf_dir))


def skew_over(df: DataFrame) -> DataFrame:
    """ts2's rollup over any ``time_series``-bearing frame — split out
    (the ramp_over pattern) so the streaming twin st21 can run the
    SAME analytic over the watermark-finalized streamed sink: one
    shared body, so batch/stream skew readouts cannot drift.

    A wire-legal ZERO-SAMPLE series has no peak — array_max would
    yield NULL and poison the group's aggregates — so empty vectors
    are filtered out before peak extraction: an instance that sampled
    nothing reached no high-watermark (the ramp analytic's clamp
    treatment of the same input class; review r14)."""
    s = df.select(
        "tag", "query_id", "fragment_id",
        F.explode("time_series").alias("series_key", "samples"),
    )
    per_inst = s.where(F.size("samples") > 0).select(
        "tag", "query_id", "fragment_id",
        # right-anchored name: everything before the trailing unit and
        # period fields, so counter names containing '|' group correctly
        F.expr(
            "array_join(slice(split(series_key, '\\\\|'), 1,"
            " size(split(series_key, '\\\\|')) - 2), '|')"
        ).alias("counter_name"),
        F.array_max("samples").alias("peak"),
    )
    per_frag = per_inst.groupBy(
        "tag", "query_id", "fragment_id", "counter_name"
    ).agg(F.max("peak").alias("mx"), F.min("peak").alias("mn"))
    return (
        per_frag.groupBy("tag", "fragment_id", "counter_name")
        .agg(
            F.count("*").cast("bigint").alias("n_fragments"),
            F.sum((F.col("mx") > F.col("mn")).cast("bigint"))
            .cast("bigint").alias("n_skewed"),
            F.sum(F.col("mx") - F.col("mn")).cast("bigint").alias("sum_skew"),
            F.max(F.col("mx") - F.col("mn")).cast("bigint").alias("max_skew"),
            F.sum("mx").cast("bigint").alias("sum_peak"),
        )
    )


def query_memory_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts3 — PER-QUERY SAMPLED MEMORY FOOTPRINT census: per tag, the
    distribution of each query's memory footprint as seen by the
    sampled counters — the sum over all of the query's fragment
    instances of that instance's sampled BYTES-series peak. Summing
    per-series peaks is deliberately the CONSERVATIVE (upper-bound)
    footprint — per-instance peaks need not align in time — which is
    exactly the bound an admission controller reserves against. The
    point-in-time counter harvest (S7) cannot produce this: only the
    sampled series (field 10) sees the high-watermark.

    Scale: rides the harvest's parse + S8 dedup; the map explode is
    in-partition, the BYTES filter drops non-memory series before any
    shuffle, then two keyed aggregates — per (tag, query) with map-side
    partials (cardinality = |queries|), then the |tags|-row census.
    Integer arithmetic only."""
    return footprint_over(parsed_time_series(spark, sf_dir))


def query_footprints(df: DataFrame) -> DataFrame:
    """Per-(tag, query) conservative memory footprint over any
    ``time_series``-bearing frame: the sum across the query's fragment
    instances of each non-empty BYTES-series sampled peak. The shared
    inner aggregate of ts3's census and w10's memory-weighted sweep.
    Zero-sample series carry no peak and are excluded from both the
    series count and the footprint (a series that sampled nothing is
    not a memory reading; review r14)."""
    s = df.select(
        "tag", "query_id",
        F.explode("time_series").alias("series_key", "samples"),
    )
    # right-anchored: unit is the second-to-last '|' field (names may
    # contain '|'); period_ms is last
    unit = F.element_at(F.split("series_key", "\\|"), -2)
    return (
        s.where((unit == F.lit("BYTES")) & (F.size("samples") > 0))
        .select("tag", "query_id", F.array_max("samples").alias("peak"))
        .groupBy("tag", "query_id")
        .agg(
            F.count("*").cast("bigint").alias("n_series"),
            F.sum("peak").cast("bigint").alias("footprint"),
        )
    )


def footprint_over(df: DataFrame) -> DataFrame:
    """ts3's census over any ``time_series``-bearing frame (the
    ramp_over/skew_over pattern), rolled up from the shared
    ``query_footprints`` aggregate."""
    per_q = query_footprints(df)
    return per_q.groupBy("tag").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum("n_series").cast("bigint").alias("n_series"),
        F.sum("footprint").cast("bigint").alias("sum_footprint"),
        F.max("footprint").cast("bigint").alias("max_footprint"),
        F.min("footprint").cast("bigint").alias("min_footprint"),
    )


# the rendered corpus carries one MemoryUsage series per instance with
# samples [cg % 4096, sink % 4096] (profile_render._counter_nodes), so
# each instance's peak is GREATEST of the two and the oracle re-derives
# both instances from the corpus fragment columns
ORACLES = {
    "ts2_memory_skew": with_corpus(f"""
        SELECT tag, fragment_id, counter_name,
               CAST(COUNT(*) AS BIGINT) AS n_fragments,
               CAST(SUM(CASE WHEN mx > mn THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_skewed,
               CAST(SUM(mx - mn) AS BIGINT) AS sum_skew,
               CAST(MAX(mx - mn) AS BIGINT) AS max_skew,
               CAST(SUM(mx) AS BIGINT) AS sum_peak
        FROM (
          SELECT {_TAG} AS tag, id AS fragment_id,
                 'MemoryUsage' AS counter_name,
                 GREATEST(GREATEST(cg_i1 % 4096, sink_i1 % 4096),
                          GREATEST(cg_i2 % 4096, sink_i2 % 4096)) AS mx,
                 LEAST(GREATEST(cg_i1 % 4096, sink_i1 % 4096),
                       GREATEST(cg_i2 % 4096, sink_i2 % 4096)) AS mn
          FROM iwa_fragments WHERE {_K} % 41 <> 0
        ) GROUP BY tag, fragment_id, counter_name"""),
    "ts3_query_memory_footprint": with_corpus(f"""
        SELECT tag,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(n_series) AS BIGINT) AS n_series,
               CAST(SUM(footprint) AS BIGINT) AS sum_footprint,
               CAST(MAX(footprint) AS BIGINT) AS max_footprint,
               CAST(MIN(footprint) AS BIGINT) AS min_footprint
        FROM (
          SELECT {_TAG} AS tag, query_id,
                 CAST(2 * COUNT(*) AS BIGINT) AS n_series,
                 CAST(SUM(GREATEST(cg_i1 % 4096, sink_i1 % 4096)
                        + GREATEST(cg_i2 % 4096, sink_i2 % 4096)) AS BIGINT)
                   AS footprint
          FROM iwa_fragments WHERE {_K} % 41 <> 0
          GROUP BY 1, 2
        ) GROUP BY tag"""),
}

SPARK_QUERIES = {
    "ts2_memory_skew": time_series_skew,
    "ts3_query_memory_footprint": query_memory_footprint,
}


def footprint_runtime_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts4 — DOES SAMPLED MEMORY PREDICT RUNTIME? Per ingest tag, the
    Spearman rank correlation between each harvested query's
    conservative memory footprint (ts3's per-query sum of sampled
    BYTES-series peaks) and its reported runtime. The number an
    admission controller needs before using footprint as a proxy
    admission weight (w10): rho near 1 means memory-ordered admission
    approximates runtime-ordered admission; rho near 0 means the two
    resources must be modeled independently. Scope is the harvested
    queries (inner join on query_id — a query whose profile landed no
    sampled memory series has no footprint to correlate), the w10
    convention.

    Exactness: ranks are ROW_NUMBER over the deterministic total
    orders (footprint, query_id) / (runtime, query_id) — the unique
    query_id tie-break makes both engines' rank assignments identical,
    so ``sum_d2`` (the Spearman numerator Sum d_i^2) is an exact
    bigint; rho = 1 - 6*S / (n*(n^2-1)) evaluates the same explicit
    double expression tree on both engines (operands stay below 2^53
    up to n ~ 1.1M queries per tag) and publishes rounded to 9 digits,
    NULL-guarded for n < 2 (denominator zero; the w10 ADVICE-r14
    convention).

    Scale: rides the harvest parse + the shared ``query_footprints``
    aggregate; the rank windows partition by tag — at a 100 TB corpus
    the per-tag rank is the dominant sort, and the standard remedy is
    the same two-phase chunked scan w1 uses (rank = per-chunk row
    number + broadcast chunk-count offsets) the moment one tag
    overflows a task; the final rollup is |tags| rows."""
    from ..corpus import corpus_queries  # noqa: PLC0415

    fps = query_footprints(parsed_time_series(spark, sf_dir)).select(
        "tag", "query_id", "footprint"
    )
    rt = corpus_queries(spark, sf_dir).select("query_id", "runtime")
    j = fps.join(rt, "query_id")
    from pyspark.sql import Window  # noqa: PLC0415

    wf = Window.partitionBy("tag").orderBy("footprint", "query_id")
    wr = Window.partitionBy("tag").orderBy("runtime", "query_id")
    ranked = j.select(
        "tag",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wr).alias("rr"),
    )
    d = (F.col("rf") - F.col("rr")).cast("bigint")
    per = ranked.groupBy("tag").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum(d * d).cast("bigint").alias("sum_d2"),
    )
    nd = F.col("n_queries").cast("double")
    rho = F.lit(1.0) - F.lit(6.0) * F.col("sum_d2").cast("double") / (
        nd * (nd * nd - F.lit(1.0))
    )
    return per.select(
        "tag",
        "n_queries",
        "sum_d2",
        F.when(F.col("n_queries") < 2, F.lit(None).cast("double"))
        .otherwise(F.round(rho, 9))
        .alias("spearman_rho"),
    )


ORACLES["ts4_footprint_runtime_corr"] = with_corpus(f"""
        , fp AS (
          SELECT {_TAG} AS tag, query_id,
                 CAST(SUM(GREATEST(cg_i1 % 4096, sink_i1 % 4096)
                        + GREATEST(cg_i2 % 4096, sink_i2 % 4096)) AS BIGINT)
                   AS footprint
          FROM iwa_fragments WHERE {_K} % 41 <> 0
          GROUP BY 1, 2),
        ranked AS (
          SELECT fp.tag,
                 ROW_NUMBER() OVER (PARTITION BY fp.tag
                                    ORDER BY fp.footprint, fp.query_id) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY fp.tag
                                    ORDER BY q.runtime, fp.query_id) AS rr
          FROM fp JOIN iwa_queries q USING (query_id)),
        per AS (
          SELECT tag, CAST(COUNT(*) AS BIGINT) AS n_queries,
                 CAST(SUM((rf - rr) * (rf - rr)) AS BIGINT) AS sum_d2
          FROM ranked GROUP BY tag)
        SELECT tag, n_queries, sum_d2,
               CASE WHEN n_queries < 2 THEN NULL
                    ELSE ROUND(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
                               / (CAST(n_queries AS DOUBLE)
                                  * (CAST(n_queries AS DOUBLE)
                                     * CAST(n_queries AS DOUBLE) - 1.0)), 9)
               END AS spearman_rho
        FROM per""")

SPARK_QUERIES["ts4_footprint_runtime_corr"] = footprint_runtime_rank_corr
