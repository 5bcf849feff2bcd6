"""Table-driven parity tests for the SQL introspection layer, mirroring the
reference visitor semantics (QueryAnalyzer.java / QueryStats.java /
Parameterizer.java) clause by clause."""

from __future__ import annotations

import pytest

from impala_workload_analyzer_spark.sql_introspect.parser import (
    classify_statement,
    extract_sql_features,
    parameterize_sql,
)


def stats(sql: str) -> dict:
    return extract_sql_features(sql)["stats"]


# --- Q2 classification -------------------------------------------------------

@pytest.mark.parametrize("sql,expected", [
    ("SELECT 1", "SelectStmt"),
    ("SELECT 1 UNION ALL SELECT 2", "UnionStmt"),
    ("WITH v AS (SELECT 1) SELECT * FROM v", "SelectStmt"),
    ("INSERT INTO t SELECT 1", "InsertStmt"),
    ("INSERT OVERWRITE t SELECT 1", "InsertStmt"),
    ("CREATE TABLE t (i INT)", "CreateTableStmt"),
    ("DROP TABLE t", "DropStmt"),
    ("SHOW TABLES", "ShowStmt"),
])
def test_classification(sql, expected):
    assert classify_statement(sql) == expected


# --- Q3 per-clause attribution ------------------------------------------------

def test_star_pins_output_columns_to_minus_one():
    # QueryAnalyzer.java:93-99: * anywhere -> -1, sticky
    assert stats("SELECT a, *, b FROM t")["num_output_columns"] == -1
    assert stats("SELECT a, b FROM t")["num_output_columns"] == 2


def test_union_output_columns_last_operand_wins():
    # QueryAnalyzer.java:66-71: assignment per operand, merge skips it
    s = stats("SELECT a, b FROM t UNION ALL SELECT * FROM u")
    assert s["num_output_columns"] == -1
    s = stats("SELECT * FROM t UNION ALL SELECT a FROM u")
    assert s["num_output_columns"] == 1


def test_where_operator_keyed_maps():
    s = stats("SELECT 1 FROM t WHERE a = 1 AND b != 2 OR c < 3 AND d LIKE 'x%'")
    assert s["num_where_binary_predicates"]["="] == 1
    assert s["num_where_binary_predicates"]["!="] == 1
    assert s["num_where_binary_predicates"]["<"] == 1
    assert s["num_where_compound_predicates"]["AND"] == 2
    assert s["num_where_compound_predicates"]["OR"] == 1
    assert s["num_where_like_predicates"]["LIKE"] == 1


def test_clause_attribution_is_disjoint():
    s = stats("SELECT a = 1 FROM t JOIN u ON t.x = u.x "
              "WHERE t.y > 2 GROUP BY a HAVING count(*) >= 3")
    assert s["num_select_binary_predicates"]["="] == 1
    assert s["num_on_binary_predicates"]["="] == 1
    assert s["num_where_binary_predicates"][">"] == 1
    assert s["num_having_binary_predicates"][">="] == 1
    assert s["num_having_function_call_exprs"] == 1
    assert s["num_group_by_columns"] == 1


def test_between_children_visited():
    # QueryAnalyzer.java:161-170: BETWEEN children manually populated, so
    # nested exprs inside the bounds are visited
    s = stats("SELECT 1 FROM t WHERE a BETWEEN f(1) AND g(2)")
    assert s["num_where_between_predicates"] == 1
    assert s["num_where_function_call_exprs"] == 2


def test_in_subquery_counts_both():
    s = stats("SELECT 1 FROM t WHERE a IN (SELECT b FROM u WHERE c = 1)")
    assert s["num_where_in_predicates"] == 1
    assert s["num_where_subqueries"] == 1
    assert s["num_where_binary_predicates"]["="] == 1  # merged from subquery


def test_analytic_also_counts_function_call():
    # AnalyticExpr has the FunctionCallExpr as a child -> both visited
    s = stats("SELECT rank() OVER (ORDER BY x) FROM t")
    assert s["num_select_analytic_exprs"] == 1
    assert s["num_select_function_call_exprs"] == 1


def test_timestamp_arithmetic_distinct_from_arithmetic():
    s = stats("SELECT 1 FROM t WHERE ts > now() - INTERVAL 3 DAY AND a + 1 = 2")
    assert s["num_where_timestamp_arithmetic_exprs"] == 1
    assert s["num_where_arithmetic_exprs"] == 1


# --- Q4 subquery accounting ----------------------------------------------------

def test_max_depth_subqueries():
    # QueryAnalyzer.java:277-279: max-merge then +1 if this level has any
    assert stats("SELECT 1 FROM t")["max_depth_subqueries"] == 0
    assert stats("SELECT 1 FROM (SELECT 1 FROM t) v")["max_depth_subqueries"] == 1
    deep = stats("SELECT 1 FROM (SELECT 1 FROM (SELECT 1 FROM t) a) b")
    assert deep["max_depth_subqueries"] == 2
    # two subqueries at the SAME level -> still depth 1
    wide = stats("SELECT 1 FROM (SELECT 1) a, (SELECT 1) b "
                 "WHERE x IN (SELECT y FROM u)")
    assert wide["max_depth_subqueries"] == 1
    assert wide["num_from_subqueries"] == 2
    assert wide["num_where_subqueries"] == 1


def test_with_views_counted_and_merged():
    s = stats("WITH v AS (SELECT a FROM t WHERE a = 1), "
              "w AS (SELECT b FROM u LIMIT 5) SELECT 1 FROM v")
    assert s["num_with_subqueries"] == 2
    assert s["num_where_binary_predicates"]["="] == 1
    assert s["num_limits"] == 1
    # with-views alone don't bump depth (only FROM/WHERE subqueries do)
    assert s["max_depth_subqueries"] == 0


def test_using_columns():
    assert stats("SELECT 1 FROM a JOIN b USING (x, y, z)")["num_using_columns"] == 3


# --- Q5 parameterization --------------------------------------------------------

@pytest.mark.parametrize("sql,expected", [
    ("SELECT a, b FROM t WHERE id = 42",
     "SELECT ?, ? FROM ? WHERE ? = 1"),
    ("SELECT a AS x FROM db.t tt WHERE tt.s = 'foo' AND flag = true",
     "SELECT ? FROM ? WHERE ? = '?' AND ? = FALSE"),
    ("SELECT * FROM t LIMIT 100 OFFSET 10",
     "SELECT * FROM ? LIMIT 1 OFFSET 1"),
    ("SELECT a FROM (SELECT a FROM t) sub",
     "SELECT ? FROM (SELECT ? FROM ?) ?"),
    ("WITH v AS (SELECT a FROM t) SELECT a FROM v ORDER BY a DESC",
     "WITH ? AS (SELECT ? FROM ?) SELECT ? FROM ? ORDER BY ? DESC"),
    ("SELECT a FROM t JOIN u USING (k) WHERE a IN (1, 2, 3)",
     "SELECT ? FROM ? INNER JOIN ? USING (?) WHERE ? IN (1, 1, 1)"),
    ("SELECT 1 UNION SELECT 2",
     "SELECT 1 UNION SELECT 1"),
])
def test_parameterize(sql, expected):
    assert parameterize_sql(sql) == expected


def test_parameterize_idempotent():
    sql = "SELECT a, b + 1 FROM t WHERE c = 'x' OR d < 3.5 ORDER BY a LIMIT 7"
    once = parameterize_sql(sql)
    assert parameterize_sql(once.replace("'?'", "'q'").replace("?", "x")) is not None
    # re-parameterizing the template itself is a fixed point modulo the
    # placeholder spelling: structure can't change
    assert parameterize_sql(sql) == once


def test_insert_not_parameterized():
    # QueryAnalyzer.java:22-31 never calls the parameterizer for inserts
    assert parameterize_sql("INSERT INTO t SELECT a FROM u") is None
    feats = extract_sql_features("INSERT OVERWRITE t SELECT a FROM u")
    assert feats["overwrite"] is True
    assert feats["parameterized_stmt"] is None


# --- r05 parity pass: templates hand-aligned with the public Impala
# frontend's toSql() conventions (Parameterizer.java:16-208 applied to
# each corpus statement shape, rendered per the Apache Impala frontend) --


@pytest.mark.parametrize("sql,expected", [
    # the four corpus SELECT rotations + union (profile_render.sql_stmt_for)
    ("SELECT c1, c2 FROM t WHERE id = 7 ORDER BY c1 LIMIT 10",
     "SELECT ?, ? FROM ? WHERE ? = 1 ORDER BY ? ASC LIMIT 1"),
    ("SELECT c1, sum(c2) FROM t WHERE id > 7 GROUP BY c1",
     "SELECT ?, sum(?) FROM ? WHERE ? > 1 GROUP BY ?"),
    # IN-subquery: ONE paren pair (Subquery.toSql supplies it;
    # InPredicate.toSql adds none)
    ("SELECT c1 FROM t WHERE id IN (SELECT id FROM u WHERE x = 7)",
     "SELECT ? FROM ? WHERE ? IN (SELECT ? FROM ? WHERE ? = 1)"),
    ("SELECT c1, rank() OVER (PARTITION BY c2 ORDER BY c3 DESC) "
     "FROM t WHERE name LIKE 'a7%'",
     "SELECT ?, rank() OVER (PARTITION BY ? ORDER BY ? DESC) "
     "FROM ? WHERE ? LIKE '?'"),
    ("SELECT c1 FROM a WHERE id = 7 UNION ALL SELECT c1 FROM b",
     "SELECT ? FROM ? WHERE ? = 1 UNION ALL SELECT ? FROM ?"),
    # NOT LIKE == NOT (a LIKE b), as the Impala grammar builds it
    ("SELECT c1 FROM t WHERE name NOT LIKE 'x%'",
     "SELECT ? FROM ? WHERE NOT ? LIKE '?'"),
    # window frames parse and render; boundary literals parameterize
    ("SELECT sum(c2) OVER (ORDER BY c1 ROWS BETWEEN 3 PRECEDING AND "
     "CURRENT ROW) FROM t",
     "SELECT sum(?) OVER (ORDER BY ? ASC ROWS BETWEEN 1 PRECEDING AND "
     "CURRENT ROW) FROM ?"),
    ("SELECT sum(c2) OVER (ORDER BY c1 RANGE UNBOUNDED PRECEDING) FROM t",
     "SELECT sum(?) OVER (ORDER BY ? ASC RANGE UNBOUNDED PRECEDING) FROM ?"),
    # INTERVAL unit keeps its written case (toSql prints it as parsed)
    ("SELECT c1 FROM t WHERE d > now() - interval 3 days",
     "SELECT ? FROM ? WHERE ? > now() - INTERVAL 1 days"),
    # ROWS/RANGE stay non-reserved outside OVER
    ("SELECT rows FROM t WHERE range = 5",
     "SELECT ? FROM ? WHERE ? = 1"),
    # nested CASE renders in CaseExpr.toSql's single-space form — input
    # whitespace/newlines normalize away, structure keeps no extra parens
    ("SELECT CASE WHEN a = 1 THEN  CASE  b WHEN 2 THEN 'x'  ELSE 'y' END "
     "ELSE 'z' END FROM t",
     "SELECT CASE WHEN ? = 1 THEN CASE ? WHEN 1 THEN '?' ELSE '?' END "
     "ELSE '?' END FROM ?"),
    # chained BETWEEN under AND: each BetweenPredicate.toSql is
    # 'expr BETWEEN lo AND hi', the CompoundPredicate joins with ' AND '
    ("SELECT c1 FROM t WHERE a BETWEEN 1 AND 5 AND b NOT BETWEEN 6 AND 9",
     "SELECT ? FROM ? WHERE ? BETWEEN 1 AND 1 AND ? NOT BETWEEN 1 AND 1"),
])
def test_parameterize_impala_tosql_parity(sql, expected):
    assert parameterize_sql(sql) == expected


# --- property-based grammar fuzz: canonicalization is a fixed point ---------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ident = st.sampled_from(["a", "b2", "c_x", "t", "u", "v1"])
_lit = st.sampled_from(["1", "3.5", "'s'", "TRUE", "FALSE", "NULL"])


def _exprs(depth):
    base = st.one_of(_ident, _lit)
    if depth <= 0:
        return base
    sub = _exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["+", "-", "*", "/", "%"]), sub)
        .map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
        st.tuples(sub, st.sampled_from(["=", "<", ">", "<=", ">=", "<>"]), sub)
        .map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
        sub.map(lambda e: f"NOT {e}"),
        sub.map(lambda e: f"({e})"),
        st.tuples(st.sampled_from(["sum", "count", "min", "max", "fn2"]), sub)
        .map(lambda t: f"{t[0]}({t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"{t[0]} IN ({t[1]}, {t[1]})"),
        st.tuples(sub, sub, sub).map(
            lambda t: f"CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END"),
        sub.map(lambda e: f"CAST({e} AS INT)"),
        sub.map(lambda e: f"{e} IS NOT NULL"),
        st.tuples(sub, st.sampled_from(["'x%'", "'%y'"])).map(
            lambda t: f"{t[0]} LIKE {t[1]}"),
    )


_select = st.builds(
    lambda items, tbl, where, group, order, limit: (
        "SELECT " + ", ".join(items)
        + f" FROM {tbl}"
        + (f" WHERE {where}" if where else "")
        + (f" GROUP BY {group}" if group else "")
        + (f" ORDER BY {order} DESC" if order else "")
        + (" LIMIT 5" if limit else "")
    ),
    st.lists(_exprs(2), min_size=1, max_size=3),
    _ident,
    st.one_of(st.none(), _exprs(2)),
    st.one_of(st.none(), _ident),
    st.one_of(st.none(), _ident),
    st.booleans(),
)


@settings(max_examples=300, deadline=None)
@given(_select)
def test_parser_canonicalization_fixed_point(sql):
    """parse -> to_sql must be a canonical form: re-parsing and
    re-rendering the rendered SQL reproduces it byte-for-byte, and
    parameterization is idempotent modulo the placeholder spelling."""
    from impala_workload_analyzer_spark.sql_introspect.parser import (
        SqlParseError,
        parse_sql,
        to_sql,
    )

    try:
        stmt = parse_sql(sql)
    except SqlParseError:
        return  # grammar corner the mini-parser rejects — fine, just no crash
    rendered = to_sql(stmt)
    assert to_sql(parse_sql(rendered)) == rendered
    assert parameterize_sql(rendered) == parameterize_sql(sql)


def test_sql_antipatterns_matches_python(spark, sf_dir):
    """q5: the lint report must equal a python recomputation over q1's
    parsed features joined to the corpus runtimes — same rules, same
    any-instantiation-flags-the-template MAX semantics, only flagged
    templates present."""
    from impala_workload_analyzer_spark.corpus import corpus_queries
    from impala_workload_analyzer_spark.sql_introspect.queries import (
        sql_antipatterns,
        sql_features,
    )

    runtime = {
        r["query_id"]: r["runtime"]
        for r in corpus_queries(spark, sf_dir).collect()
    }
    exp: dict[str, dict] = {}
    for f in sql_features(spark, sf_dir).select(
        "query_id", "parameterized_stmt", "num_select_analytic_exprs",
        "num_limits", "num_where_subqueries", "num_where_like_like",
        "num_where_like_rlike", "num_where_like_regexp",
    ).collect():
        if f["parameterized_stmt"] is None:
            continue
        t = exp.setdefault(
            f["parameterized_stmt"],
            {"n": 0, "rt": 0, "an": False, "sq": False, "lk": False},
        )
        t["n"] += 1
        t["rt"] += runtime[f["query_id"]]
        t["an"] |= (
            f["num_select_analytic_exprs"] > 0 and f["num_limits"] == 0
        )
        t["sq"] |= f["num_where_subqueries"] > 0
        t["lk"] |= (
            f["num_where_like_like"]
            + f["num_where_like_rlike"]
            + f["num_where_like_regexp"]
            > 0
        )
    want = {k: v for k, v in exp.items() if v["an"] or v["sq"] or v["lk"]}
    got = {
        r["parameterized_stmt"]: r
        for r in sql_antipatterns(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    assert len(got) > 0
    for stmt, v in want.items():
        g = got[stmt]
        assert g["n_queries"] == v["n"]
        assert g["total_runtime"] == v["rt"]
        assert g["analytic_no_limit"] == v["an"]
        assert g["subquery_filter"] == v["sq"]
        assert g["like_filter"] == v["lk"]


def test_narrow_shared_frame_equals_full_projection(spark, sf_dir):
    """The r16 narrow shared frame (_sql_features_narrow) must be
    value-identical to the full q1 parse projected to _SHARED_COLUMNS —
    same AST walk, same NULL conventions for DDL/unparsed statements —
    so q3-q6 reading the narrow frame can never drift from q1's
    contract surface."""
    from impala_workload_analyzer_spark.sql_introspect.queries import (
        _SHARED_COLUMNS,
        _sql_features_narrow,
        sql_features,
    )

    narrow = _sql_features_narrow(spark, sf_dir)
    assert [f.name for f in narrow.schema.fields] == list(_SHARED_COLUMNS)
    full = sql_features(spark, sf_dir).select(*_SHARED_COLUMNS)
    assert narrow.schema == full.schema
    assert narrow.exceptAll(full).count() == 0
    assert full.exceptAll(narrow).count() == 0
    assert narrow.count() > 0
