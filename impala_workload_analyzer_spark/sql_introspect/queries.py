"""Driver-contract queries for the SQL-introspection layer (Q1-Q6).

``q1_sql_features`` runs the full EP2 pipeline (SURVEY.md §3): ingest the
profile logs (ing3), then enrich each statement with the feature struct via
``extract_sql_features`` inside Arrow-batched ``mapInPandas`` — the AST
lives only inside the UDF, exactly as the reference's Impala frontend AST
lives only inside the Java pass (QueryAnalyzer.java:333-349).

The oracle re-derives the expected features per corpus statement template
in SQL. The deep per-clause parity (subquery merges, operator-keyed maps,
analytic exprs, between/in/exists, parameterizer normalization) is covered
by the table-driven unit tests in tests/test_sql_introspect.py — the
corpus templates exercise the end-to-end plumbing.

Scale: enrichment is a stateless projection over the queries table — no
shuffle; at 100 TB it fuses into the ingest scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus.corpus_sql import with_corpus
from ..sources.profiles import materialized_table
from .parser import _BINARY_OPS, _COMPOUND_OPS, _LIKE_OPS, extract_sql_features

_L, _S, _B = T.LongType(), T.StringType(), T.BooleanType()

# the FULL QueryStats surface (QueryStats.java:44-89): 27 scalar counters in
# _new_stats order, then the 9 operator-keyed maps flattened one column per
# operator — typed BIGINT columns hash identically across Spark and DuckDB,
# where MapType key ordering would not.
_SCALAR_COUNTERS = (
    "num_output_columns", "num_from_subqueries", "num_where_subqueries",
    "num_with_subqueries", "max_depth_subqueries", "num_group_by_columns",
    "num_order_by_columns", "num_limits", "num_where_in_predicates",
    "num_where_between_predicates", "num_where_exists_predicates",
    "num_where_is_null_predicates", "num_where_function_call_exprs",
    "num_where_case_exprs", "num_where_arithmetic_exprs",
    "num_where_cast_exprs", "num_where_timestamp_arithmetic_exprs",
    "num_select_case_exprs", "num_select_arithmetic_exprs",
    "num_select_cast_exprs", "num_select_function_call_exprs",
    "num_select_analytic_exprs", "num_select_is_null_predicates",
    "num_having_function_call_exprs", "num_using_columns",
    "num_on_function_call_exprs", "num_on_between_predicates",
)

_OP_NAMES = {
    "=": "eq", "!=": "ne", "<=": "le", ">=": "ge", "<": "lt", ">": "gt",
    "<=>": "nseq", "AND": "and", "OR": "or", "NOT": "not",
    "LIKE": "like", "RLIKE": "rlike", "REGEXP": "regexp",
}

# (stats key, column prefix, operator tuple)
_MAP_COUNTERS = (
    ("num_where_compound_predicates", "num_where_compound", _COMPOUND_OPS),
    ("num_select_compound_predicates", "num_select_compound", _COMPOUND_OPS),
    ("num_having_compound_predicates", "num_having_compound", _COMPOUND_OPS),
    ("num_on_compound_predicates", "num_on_compound", _COMPOUND_OPS),
    ("num_where_binary_predicates", "num_where_binary", _BINARY_OPS),
    ("num_select_binary_predicates", "num_select_binary", _BINARY_OPS),
    ("num_having_binary_predicates", "num_having_binary", _BINARY_OPS),
    ("num_on_binary_predicates", "num_on_binary", _BINARY_OPS),
    ("num_where_like_predicates", "num_where_like", _LIKE_OPS),
)

COUNTER_COLUMNS = list(_SCALAR_COUNTERS) + [
    f"{prefix}_{_OP_NAMES[op]}"
    for _, prefix, ops in _MAP_COUNTERS
    for op in ops
]

FEATURES_SCHEMA = T.StructType(
    [T.StructField("query_id", _S), T.StructField("stmt_type", _S)]
    + [T.StructField(c, _L) for c in COUNTER_COLUMNS]
    + [T.StructField("overwrite", _B), T.StructField("parameterized_stmt", _S)]
)


def _flat_counters(s: dict) -> tuple:
    vals = [s[k] for k in _SCALAR_COUNTERS]
    for key, _, ops in _MAP_COUNTERS:
        vals.extend(s[key][op] for op in ops)
    return tuple(vals)


def sql_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1_sql_features — EP2: per-statement feature extraction + template,
    surfacing the full ~70-column QueryStats counter set
    (QueryAnalyzer.java:290-325).

    The input is small in bytes but CPU-heavy per row (a parse per
    statement), so AQE's size-based coalescing would funnel it into one
    partition; repartition explicitly to keep every core parsing."""
    queries = (
        materialized_table(spark, sf_dir, "queries")
        .select("query_id", "sql_stmt")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n = len(COUNTER_COLUMNS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for qid, stmt in zip(pdf["query_id"], pdf["sql_stmt"]):
                feats = extract_sql_features(stmt)
                if feats is None:
                    rows.append((qid, "UnparsedStmt") + (None,) * (n + 2))
                    continue
                s = feats["stats"]
                if s is None:
                    rows.append((qid, feats["type"]) + (None,) * n
                                + (feats["overwrite"], feats["parameterized_stmt"]))
                    continue
                rows.append((qid, feats["type"]) + _flat_counters(s)
                            + (feats["overwrite"], feats["parameterized_stmt"]))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return queries.mapInPandas(run, schema=FEATURES_SCHEMA)


# Union of the columns the shared frame's consumers actually read (q3's
# rollup, q4's template runtime, q5's lint, q6's novelty census). The
# persisted frame carries ONLY these (r16 optimization, guide §2.3/§5):
# the other ~60 BIGINT counters crossed Arrow, were cached columnar, and
# were drained by every consumer without ever being read. q1 (the full
# ~75-column contract surface) keeps its own live plan and does NOT read
# this frame. Adding a consumer that needs another counter = add the
# column here (an absent column fails at plan time, never silently).
_SHARED_COLUMNS = (
    "query_id", "stmt_type", "parameterized_stmt",
    "num_output_columns", "num_limits", "num_where_binary_eq",
    "num_where_subqueries", "num_select_analytic_exprs",
    "num_where_like_like", "num_where_like_rlike", "num_where_like_regexp",
)

_SHARED_SCHEMA = T.StructType(
    [T.StructField("query_id", _S), T.StructField("stmt_type", _S),
     T.StructField("parameterized_stmt", _S)]
    + [T.StructField(c, _L) for c in _SHARED_COLUMNS[3:]]
)


def _sql_features_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer-facing subset of q1's parse, emitted directly from
    the Python side: the SAME ``extract_sql_features`` AST walk per
    statement (values identical to ``sql_features(...)​.select(cols)`` —
    pinned by tests/test_sql_introspect.py), but only the 8 counters the
    consumers read cross the Arrow boundary instead of all 71
    (guide §4.1: you control how many columns cross)."""
    queries = (
        materialized_table(spark, sf_dir, "queries")
        .select("query_id", "sql_stmt")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _SHARED_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for qid, stmt in zip(pdf["query_id"], pdf["sql_stmt"]):
                feats = extract_sql_features(stmt)
                if feats is None:
                    rows.append((qid, "UnparsedStmt", None) + (None,) * 8)
                    continue
                s = feats["stats"]
                if s is None:
                    rows.append((qid, feats["type"], feats["parameterized_stmt"])
                                + (None,) * 8)
                    continue
                like = s["num_where_like_predicates"]
                rows.append((
                    qid, feats["type"], feats["parameterized_stmt"],
                    s["num_output_columns"], s["num_limits"],
                    s["num_where_binary_predicates"]["="],
                    s["num_where_subqueries"], s["num_select_analytic_exprs"],
                    like["LIKE"], like["RLIKE"], like["REGEXP"],
                ))
            yield pd.DataFrame(rows, columns=cols)

    return queries.mapInPandas(run, schema=_SHARED_SCHEMA)


def _sql_features_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1's parsed feature frame persisted once per (session, corpus) —
    the feature-store pattern (_shared_shingles / _exact_topk_shared)
    applied to the introspection family's shared intermediate. The
    parse is CPU-heavy per row (a full AST walk per statement inside
    mapInPandas) and FOUR consumers re-ran it per query (q3's rollup,
    q4's template runtime, q5's lint, q6's novelty census), while the
    output is one narrow row per statement — trivially persistable.
    Production shape: the enriched features are written back to the
    store once per ingest (S9) and every report joins them. q1 itself
    keeps its live, contract-pinned plan; correctness never depends on
    the cache (a cold call rebuilds). Keyed by applicationId via
    cache_util.session_persisted (ADVICE r8). Since r16 the persisted
    projection is ``_SHARED_COLUMNS`` only (the verdict's top item: ~2 s
    of the 3.3 s cold build was materializing counters no consumer
    read); ``_sql_features_narrow`` keeps the identical parse."""
    from ..cache_util import session_persisted  # noqa: PLC0415

    return session_persisted(
        spark, sf_dir, "sql_features",
        lambda: _sql_features_narrow(spark, sf_dir),
    )


def features_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3_features_rollup — the enriched corpus as DATA (A15-shape): counts
    and feature sums per statement class, sorted by count desc."""
    return (
        _sql_features_shared(spark, sf_dir)
        .groupBy("stmt_type")
        .agg(
            F.count("*").alias("n_queries"),
            F.sum("num_output_columns").alias("sum_output_columns"),
            F.sum("num_limits").alias("sum_limits"),
            F.sum("num_where_binary_eq").alias("sum_where_eq"),
            F.count_distinct("parameterized_stmt").alias("n_templates"),
        )
    )


def template_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4_template_runtime — the workload-analyzer HEADLINE report: per
    parameterized statement template (Q5's fingerprint), how many
    statements instantiate it and their total / floor-mean / max runtime
    — "which query shapes cost the cluster the most", the rollup every
    capacity review starts from. Statements with no template (DDL,
    inserts, parse failures) are out of scope by definition.

    Scale: the parse already ran per-row (q1's stateless mapInPandas
    projection); this adds ONE shuffle keyed by template string —
    cardinality = distinct templates, orders of magnitude below
    statements — after a query_id-keyed join whose both sides came out
    of the same ingest. All runtime arithmetic is exact BIGINT (floor
    mean via DIV), so partial-agg order can never move a value."""
    feats = _sql_features_shared(spark, sf_dir).select(
        "query_id", "parameterized_stmt")
    q = materialized_table(spark, sf_dir, "queries").select("query_id", "runtime")
    return (
        feats.filter(F.col("parameterized_stmt").isNotNull())
        .join(q, "query_id")
        .groupBy("parameterized_stmt")
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum("runtime").cast("bigint").alias("total_runtime"),
            F.max("runtime").cast("bigint").alias("max_runtime"),
        )
        .withColumn("avg_runtime", F.expr("total_runtime DIV n_queries"))
    )


def sql_antipatterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5_sql_antipatterns — the WORKLOAD LINT report: per statement
    template, which rewrite-advisor rules fire and how much runtime the
    flagged shape costs — the triage list a SQL-review rotation works
    from. Rules over q1's parsed feature counters:

    - ``analytic_no_limit``: window functions with no LIMIT — the
      full-partition sort/materialization shape;
    - ``subquery_filter``: WHERE-clause subqueries — the semi-join
      candidates a planner may de-correlate badly;
    - ``like_filter``: LIKE/RLIKE/REGEXP predicates — non-sargable
      filters that defeat scan pruning.

    Only templates with at least one flag appear (a lint report is its
    violations). Flags aggregate per template with MAX (any flagged
    instantiation flags the template) — integer 0/1 max cast to boolean
    identically in both engines; runtime sums are exact BIGINT.

    Scale: identical shape to q4 — the per-row parse already ran; this
    adds one template-keyed shuffle over template-cardinality rows."""
    feats = _sql_features_shared(spark, sf_dir).select(
        "query_id",
        "parameterized_stmt",
        "num_select_analytic_exprs",
        "num_limits",
        "num_where_subqueries",
        "num_where_like_like",
        "num_where_like_rlike",
        "num_where_like_regexp",
    )
    q = materialized_table(spark, sf_dir, "queries").select(
        "query_id", "runtime"
    )
    flagged = (
        feats.filter(F.col("parameterized_stmt").isNotNull())
        .join(q, "query_id")
        .withColumn(
            "f_analytic",
            (
                (F.col("num_select_analytic_exprs") > 0)
                & (F.col("num_limits") == 0)
            ).cast("int"),
        )
        .withColumn(
            "f_subquery", (F.col("num_where_subqueries") > 0).cast("int")
        )
        .withColumn(
            "f_like",
            (
                F.col("num_where_like_like")
                + F.col("num_where_like_rlike")
                + F.col("num_where_like_regexp")
                > 0
            ).cast("int"),
        )
    )
    agg = flagged.groupBy("parameterized_stmt").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum("runtime").cast("bigint").alias("total_runtime"),
        F.max("f_analytic").cast("boolean").alias("analytic_no_limit"),
        F.max("f_subquery").cast("boolean").alias("subquery_filter"),
        F.max("f_like").cast("boolean").alias("like_filter"),
    )
    return agg.filter(
        F.col("analytic_no_limit")
        | F.col("subquery_filter")
        | F.col("like_filter")
    )


# Expected counters per corpus statement template (profile_render.
# sql_stmt_for); SELECT statements rotate through 4 shape variants on
# k % 4. Values below were pinned by running extract_sql_features on each
# template (tests/test_sql_introspect.py locks the parser behavior);
# every counter not listed is 0 for parsed statements and NULL for DDL.
# Template keys: "InsertStmt"/"UnionStmt", and 0-3 for SelectStmt k % 4.
_EXPECTED = {
    "num_output_columns": {"InsertStmt": 1, "UnionStmt": 1, 0: 2, 1: 2, 2: 1, 3: 2},
    "num_where_subqueries": {2: 1},
    "max_depth_subqueries": {2: 1},
    "num_group_by_columns": {1: 1},
    "num_order_by_columns": {0: 1},
    "num_limits": {0: 1},
    "num_where_in_predicates": {2: 1},
    "num_select_function_call_exprs": {1: 1, 3: 1},
    "num_select_analytic_exprs": {3: 1},
    # v2's IN-subquery WHERE merges into the parent (Q4 merge semantics)
    "num_where_binary_eq": {"UnionStmt": 1, 0: 1, 2: 1},
    "num_where_binary_gt": {"InsertStmt": 1, 1: 1},
    "num_where_like_like": {3: 1},
}


def _counter_case(col: str) -> str:
    v = _EXPECTED.get(col, {})
    return (
        "CAST(CASE WHEN sql_type = 'DdlStmt' THEN NULL"
        f" WHEN sql_type = 'InsertStmt' THEN {v.get('InsertStmt', 0)}"
        f" WHEN sql_type = 'UnionStmt' THEN {v.get('UnionStmt', 0)}"
        + "".join(f" WHEN k % 4 = {i} THEN {v.get(i, 0)}" for i in range(4))
        + f" END AS BIGINT) AS {col}"
    )


_FEATURE_CASE = (
    """
  SELECT query_id, k, sql_type,
    CASE sql_type WHEN 'DdlStmt' THEN 'CreateTableStmt' ELSE sql_type END AS stmt_type,
    """
    + ",\n    ".join(_counter_case(c) for c in COUNTER_COLUMNS)
    + """,
    CASE WHEN sql_type = 'InsertStmt' THEN FALSE ELSE NULL END AS overwrite,
    CASE sql_type
      WHEN 'SelectStmt' THEN CASE k % 4
        WHEN 1 THEN 'SELECT ?, sum(?) FROM ? WHERE ? > 1 GROUP BY ?'
        WHEN 2 THEN 'SELECT ? FROM ? WHERE ? IN (SELECT ? FROM ? WHERE ? = 1)'
        WHEN 3 THEN 'SELECT ?, rank() OVER (PARTITION BY ? ORDER BY ? DESC) FROM ? WHERE ? LIKE ''?'''
        ELSE 'SELECT ?, ? FROM ? WHERE ? = 1 ORDER BY ? ASC LIMIT 1' END
      WHEN 'UnionStmt' THEN 'SELECT ? FROM ? WHERE ? = 1 UNION ALL SELECT ? FROM ?'
      ELSE NULL END AS parameterized_stmt
  FROM iwa_queries WHERE k % 41 <> 0
"""
)

ORACLES = {
    "q1_sql_features": with_corpus(f"""
        SELECT query_id, stmt_type,
               {", ".join(COUNTER_COLUMNS)},
               overwrite, parameterized_stmt
        FROM ({_FEATURE_CASE})"""),
    "q3_features_rollup": with_corpus(f"""
        SELECT stmt_type, COUNT(*) AS n_queries,
               CAST(SUM(num_output_columns) AS BIGINT) AS sum_output_columns,
               CAST(SUM(num_limits) AS BIGINT) AS sum_limits,
               CAST(SUM(num_where_binary_eq) AS BIGINT) AS sum_where_eq,
               COUNT(DISTINCT parameterized_stmt) AS n_templates
        FROM ({_FEATURE_CASE})
        GROUP BY stmt_type"""),
    "q4_template_runtime": with_corpus(f"""
        SELECT f.parameterized_stmt,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(q.runtime) AS BIGINT) AS total_runtime,
               CAST(MAX(q.runtime) AS BIGINT) AS max_runtime,
               CAST(SUM(q.runtime) // COUNT(*) AS BIGINT) AS avg_runtime
        FROM ({_FEATURE_CASE}) f JOIN iwa_queries q USING (query_id)
        WHERE f.parameterized_stmt IS NOT NULL
        GROUP BY f.parameterized_stmt"""),
    "q5_sql_antipatterns": with_corpus(f"""
        , flagged AS (
          SELECT f.parameterized_stmt, q.runtime,
                 CASE WHEN f.num_select_analytic_exprs > 0
                           AND f.num_limits = 0 THEN 1 ELSE 0 END AS f_analytic,
                 CASE WHEN f.num_where_subqueries > 0 THEN 1 ELSE 0 END
                   AS f_subquery,
                 CASE WHEN f.num_where_like_like + f.num_where_like_rlike
                           + f.num_where_like_regexp > 0 THEN 1 ELSE 0 END
                   AS f_like
          FROM ({_FEATURE_CASE}) f JOIN iwa_queries q USING (query_id)
          WHERE f.parameterized_stmt IS NOT NULL)
        SELECT parameterized_stmt,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(runtime) AS BIGINT) AS total_runtime,
               CAST(MAX(f_analytic) AS BOOLEAN) AS analytic_no_limit,
               CAST(MAX(f_subquery) AS BOOLEAN) AS subquery_filter,
               CAST(MAX(f_like) AS BOOLEAN) AS like_filter
        FROM flagged
        GROUP BY parameterized_stmt
        HAVING MAX(f_analytic) = 1 OR MAX(f_subquery) = 1
            OR MAX(f_like) = 1"""),
}

SPARK_QUERIES = {
    "q1_sql_features": sql_features,
    "q3_features_rollup": features_rollup,
    "q4_template_runtime": template_runtime,
    "q5_sql_antipatterns": sql_antipatterns,
}


_Q6_BUCKET_US = 60_000_000  # template-novelty arrival bucket (1 min;
# a production corpus spanning months would widen this to hours/days —
# the fixture corpus spans ~18 minutes, so minutes give a real curve)


def template_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6_template_novelty — WORKLOAD DRIFT BY TEMPLATE CHURN: per arrival
    bucket (1 minute) of statement start time, how many parameterized statements ran,
    how many distinct templates (Q5's fingerprint) they collapse to,
    and how many of those templates were seen for the FIRST time in that
    bucket, with the first-seen share in floor ppm. a23 tracks drift in
    runtime for shapes that persist; q6 tracks drift in the SHAPE SET
    itself — a spike in first-seen templates is a deploy / new-tenant /
    ad-hoc-exploration signature, the leading indicator a capacity
    review wants before those templates accumulate runtime. Statements
    with no template (DDL, inserts, parse failures) are out of scope,
    the q4 convention.

    Exactness: the day bucket is integer DIV of the microsecond start
    time; first-seen is MIN(bucket) per template — an exact integer
    aggregate — and every published figure is a count or an IDIV floor
    ppm, identical on both engines.

    Scale: the parse already ran per-row (q1's stateless mapInPandas
    projection); this adds one shuffle keyed by the template string
    (cardinality = distinct templates) for the first-seen aggregate
    and one keyed by bucket (cardinality = observation buckets) for the
    census — both orders of magnitude below statements, with map-side
    partials throughout."""
    from ..corpus.corpus_sql import IDIV  # noqa: PLC0415

    feats = _sql_features_shared(spark, sf_dir).select(
        "query_id", "parameterized_stmt")
    q = materialized_table(spark, sf_dir, "queries").select(
        "query_id", "start_time"
    )
    j = (
        feats.filter(F.col("parameterized_stmt").isNotNull())
        .join(q, "query_id")
        .select(
            "parameterized_stmt",
            F.expr(f"start_time DIV {_Q6_BUCKET_US}").alias("bucket"),
        )
    )
    first = j.groupBy("parameterized_stmt").agg(
        F.min("bucket").alias("first_bucket")
    )
    per_day = (
        j.join(first, "parameterized_stmt")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_statements"),
            F.countDistinct("parameterized_stmt").cast("bigint")
            .alias("n_templates"),
            F.countDistinct(
                F.when(F.col("first_bucket") == F.col("bucket"),
                       F.col("parameterized_stmt"))
            ).cast("bigint").alias("n_new_templates"),
        )
    )
    return per_day.select(
        "bucket",
        "n_statements",
        "n_templates",
        "n_new_templates",
        F.expr(IDIV("n_new_templates * 1000000", "n_templates"))
        .alias("new_template_ppm"),
    )


def _q6_oracle() -> str:
    from ..corpus.corpus_sql import IDIV  # noqa: PLC0415

    return with_corpus(f"""
        , j AS (
          SELECT f.parameterized_stmt,
                 CAST(q.start_time // {_Q6_BUCKET_US} AS BIGINT) AS bucket
          FROM ({_FEATURE_CASE}) f JOIN iwa_queries q USING (query_id)
          WHERE f.parameterized_stmt IS NOT NULL),
        first AS (
          SELECT parameterized_stmt, MIN(bucket) AS first_bucket
          FROM j GROUP BY parameterized_stmt)
        SELECT j.bucket,
               CAST(COUNT(*) AS BIGINT) AS n_statements,
               CAST(COUNT(DISTINCT j.parameterized_stmt) AS BIGINT)
                 AS n_templates,
               CAST(COUNT(DISTINCT CASE WHEN f.first_bucket = j.bucket
                                        THEN j.parameterized_stmt END)
                    AS BIGINT) AS n_new_templates,
               {IDIV('COUNT(DISTINCT CASE WHEN f.first_bucket = j.bucket THEN j.parameterized_stmt END) * 1000000', 'COUNT(DISTINCT j.parameterized_stmt)')}
                 AS new_template_ppm
        FROM j JOIN first f USING (parameterized_stmt)
        GROUP BY j.bucket""")


ORACLES["q6_template_novelty"] = _q6_oracle()
SPARK_QUERIES["q6_template_novelty"] = template_novelty
