"""Deterministic workload-corpus definition, shared by Spark and DuckDB.

The reference analyzer's data model is three MongoDB collections —
``queries``, ``operators``, ``fragments`` (FIXTURES.md Family B; built by
``/root/reference/code/python/profile_analyzer.py:23-313``). Real Impala
profiles are absent from the snapshot (`.gitignore:7`), so this module
*derives* an equivalent corpus deterministically from the driver-generated
``orders`` fixture with pure arithmetic.

The derivation is written in the **portable intersection of Spark SQL and
DuckDB SQL** and used verbatim by both engines:

- the Spark engine runs ``spark.sql(with_corpus(...))`` (see ``builder.py``);
- every corpus analytic's ``oracle_sql()`` entry embeds the same CTE text.

Because both engines evaluate the identical expression tree over identical
parquet doubles, results agree bit-for-bit — this is what makes the corpus
analytics fully oracle-checkable instead of rows-only.

Structural invariants honored (FIXTURES.md "Structural invariants"):
- every HASH/CROSS JOIN row has resolvable left/right children
  (consumed by the join audit, ``joins.py:51-58``);
- every PRE AGGREGATE has exactly one child row with ``parent_id = agg.id``
  and RowsReturned on both (``aggs.py:18-25``); a ~4% slice violates
  in >= out to exercise the guard at ``aggs.py:27-29`` and a ~5% slice has
  in == 0 (ratio := 1.0, ``aggs.py:31-32``);
- per query ``max(operators.num_hosts) == queries.num_hosts``
  (``profile_analyzer.py:303``);
- join impl/side choices vary so all three join-audit classes
  (correct / wrong-impl / wrong-side, ``joins.py:5-30``) are non-empty;
- DDL queries have no operators/fragments (``profile_analyzer.py:29-37``
  routes DDL to a plan-less insert path);
- stored averaged counters equal the floor-mean of per-instance counters
  (``profile_analyzer.py:413-424``, py2 integer division) except for a ~3%
  slice deliberately inconsistent, so the A16 consistency check has
  real violations to find.

Plan shape per (non-DDL) query, ids and parentage (parent_id is
fragment-local, NULL for a fragment's root, as parsed from plan-text
indentation at ``profile_analyzer.py:113-141``)::

    fragment 1 (root, exchange_id NULL):   6 SORT|TOP-N
                                           5 AGGREGATE (POST, FINALIZE)
                                           4 EXCHANGE
    fragment 0 (exchange_id = 4):          3 AGGREGATE (PRE)
                                          [8 CROSS JOIN (children 2,7)]   when k%3=0
                                          [7 SCAN HDFS part]              when k%3=0
                                           2 HASH JOIN (children 0,1)
                                           1 SCAN HDFS t{k%4}|lineitem
                                           0 SCAN HDFS lineitem
"""

from __future__ import annotations


def _idiv(a: str, b: str | int) -> str:
    """Integer division, portable and identical in Spark SQL and DuckDB.

    Matches python-2 ``/`` on positive ints (floor), which the reference
    relies on for ms rescaling (``stats.py:103``) and counter means
    (``profile_analyzer.py:423``). Values stay far below 2^53 so the
    double round-trip is exact.
    """
    return f"CAST(FLOOR(({a}) / CAST(({b}) AS DOUBLE)) AS BIGINT)"


IDIV = _idiv

# --- base scalars derived once per source order row -------------------------
_BASE = f"""
iwa_base AS (
  SELECT
    o_orderkey AS k,
    o_custkey AS c,
    CAST(o_orderkey AS STRING) AS query_id,
    CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS runtime,
    CAST(1 + (o_orderkey % 10) AS BIGINT) AS nh
  FROM orders
)
"""

_QUERIES = f"""
iwa_queries AS (
  SELECT
    query_id,
    'tpch' AS tag,
    CASE WHEN k % 31 = 0 THEN 'DDL'
         WHEN k % 7 IN (4, 5) THEN 'DML'
         ELSE 'QUERY' END AS query_type,
    CASE WHEN k % 31 = 0 THEN 'DdlStmt'
         WHEN k % 7 IN (4, 5) THEN 'InsertStmt'
         WHEN k % 7 = 6 THEN 'UnionStmt'
         ELSE 'SelectStmt' END AS sql_type,
    runtime,
    {_idiv('runtime', 20)} AS plan_time,
    {_idiv('runtime', 50)} AS fragment_start_time,
    CAST(1704067200000000 + (k % 500) * 2000000 + (c % 100) * 500000 AS BIGINT) AS start_time,
    CAST(1704067200000000 + (k % 500) * 2000000 + (c % 100) * 500000
         + {_idiv('runtime', 1000)} AS BIGINT) AS end_time,
    md5(CAST(k % 8 AS STRING)) AS cluster,
    nh AS num_hosts,
    CAST(CASE WHEN k % 31 = 0 THEN 0 WHEN k % 3 = 0 THEN 3 ELSE 2 END AS BIGINT) AS num_hdfs_scans,
    CAST(CASE WHEN k % 31 = 0 THEN 0
              WHEN k % 3 = 0 AND k % 5 = 0 THEN 2
              WHEN k % 3 = 0 THEN 3
              WHEN k % 5 = 0 THEN 1
              ELSE 2 END AS BIGINT) AS num_tables,
    CAST(CASE WHEN k % 13 = 0 THEN -1 ELSE 1 + (k % 9) END AS BIGINT) AS num_output_columns,
    k % 3 AS num_from_subqueries,
    k % 5 AS num_group_by_columns,
    k % 4 AS num_order_by_columns,
    k % 2 AS num_limits,
    'impalad version 2.' || CAST(k % 3 AS STRING) || '.0' AS impala_version,
    'RELEASE' AS impala_flag,
    'build-' || CAST(k % 2 AS STRING) AS impala_build,
    k, c, nh AS q_nh
  FROM iwa_base
)
"""


# --- per-operator formula table ---------------------------------------------
def _nr(op_id: int) -> str:
    """num_rows for plan node `op_id` (varies per query via k, c)."""
    return f"(100 + ((k * {2 * op_id + 3} + c * {op_id + 1}) % 100000))"


def _rs(op_id: int) -> str:
    """row_size bytes."""
    return f"(8 + ((k + {17 * op_id}) % 120))"


def _nh(op_id: int) -> str:
    # fragment-0 operators run on every host; fragment-1 (coordinator-side
    # EXCHANGE/POST-AGG/SORT) runs on 1 — keeps max(op nh) == query nh.
    return "nh" if op_id in (0, 1, 2, 3, 7, 8) else "CAST(1 AS BIGINT)"


def _avg_time(op_id: int) -> str:
    return _idiv("runtime", 10 + 7 * op_id)


def _base_rr(op_id: int) -> str:
    """Per-host RowsReturned before PRE-agg overrides."""
    return _idiv(_nr(op_id), _nh(op_id))


def _rr(op_id: int) -> str:
    """avg_counters['RowsReturned'] per node, with the PRE-agg slices:
    k%19=0 -> zero-input queries; k%23=0 -> in<out guard violations."""
    if op_id == 2:
        return f"(CASE WHEN k % 19 = 0 AND k % 3 <> 0 THEN 0 ELSE {_base_rr(2)} END)"
    if op_id == 8:
        return f"(CASE WHEN k % 19 = 0 THEN 0 ELSE {_base_rr(8)} END)"
    if op_id == 3:
        child = f"(CASE WHEN k % 3 = 0 THEN {_rr(8)} ELSE {_rr(2)} END)"
        return (
            f"(CASE WHEN k % 19 = 0 THEN 0 "
            f"WHEN k % 23 = 0 THEN {child} + 5 "
            f"ELSE {_idiv(child + ' * (k % 11)', 10)} END)"
        )
    return _base_rr(op_id)


_OP_NAME = {
    0: "'SCAN HDFS'", 1: "'SCAN HDFS'", 7: "'SCAN HDFS'",
    2: "'HASH JOIN'", 8: "'CROSS JOIN'",
    3: "'AGGREGATE'", 5: "'AGGREGATE'",
    4: "'EXCHANGE'",
    6: "(CASE WHEN k % 2 = 0 THEN 'SORT' ELSE 'TOP-N' END)",
}
_OP_FRAGMENT = {0: 0, 1: 0, 2: 0, 3: 0, 7: 0, 8: 0, 4: 1, 5: 1, 6: 1}
_OP_PARENT = {
    0: "2", 1: "2",
    2: "(CASE WHEN k % 3 = 0 THEN 8 ELSE 3 END)",
    7: "8", 8: "3",
    3: "CAST(NULL AS BIGINT)",
    4: "5", 5: "6",
    6: "CAST(NULL AS BIGINT)",
}
_OP_TABLE = {
    0: "'lineitem'",
    1: "(CASE WHEN k % 5 = 0 THEN 'lineitem' ELSE 't' || CAST(k % 4 AS STRING) END)",
    7: "'part'",
}
_NULL_STR = "CAST(NULL AS STRING)"
_NULL_LONG = "CAST(NULL AS BIGINT)"


def _op_branch(op_id: int) -> str:
    nr, rs, rr = _nr(op_id), _rs(op_id), _rr(op_id)
    avg_t = _avg_time(op_id)
    name = _OP_NAME[op_id]
    table = _OP_TABLE.get(op_id, _NULL_STR)
    is_scan = op_id in (0, 1, 7)
    size = f"CAST({nr} * {rs} AS BIGINT)" if is_scan else _NULL_LONG
    if op_id == 2:
        join_type = ("(CASE WHEN k % 4 IN (0, 1) THEN 'INNER JOIN' "
                     "WHEN k % 4 = 2 THEN 'LEFT OUTER JOIN' "
                     "ELSE 'RIGHT OUTER JOIN' END)")
        join_impl = "(CASE WHEN k % 2 = 0 THEN 'BROADCAST' ELSE 'PARTITIONED' END)"
        left_child, right_child = "CAST(0 AS BIGINT)", "CAST(1 AS BIGINT)"
    elif op_id == 8:
        join_type = _NULL_STR
        join_impl = "(CASE WHEN c % 2 = 0 THEN 'BROADCAST' ELSE 'PARTITIONED' END)"
        left_child, right_child = "CAST(2 AS BIGINT)", "CAST(7 AS BIGINT)"
    else:
        join_type = join_impl = _NULL_STR
        left_child = right_child = _NULL_LONG
    if op_id == 3:
        agg_type, detail = "'PRE'", "'STREAMING'"
    elif op_id == 5:
        agg_type, detail = "'POST'", "'FINALIZE'"
    else:
        agg_type = _NULL_STR
        if is_scan:
            detail = f"{table} || ' [partitions: 1/1]'"
        elif op_id == 2:
            detail = f"{join_type} || ', ' || {join_impl}"
        elif op_id == 8:
            detail = join_impl
        else:
            detail = "''"
    # per-instance counter values; stored avg must equal floor-mean of the
    # instances (profile_analyzer.py:413-424) except the k%29 broken slice.
    rr_delta = f"(CASE WHEN {rr} >= 3 AND k % 29 <> 0 THEN k % 3 ELSE 0 END)"
    rr_i1 = f"(CASE WHEN k % 29 = 0 THEN {rr} + 1 ELSE {rr} + {rr_delta} END)"
    rr_i2 = f"(CASE WHEN k % 29 = 0 THEN {rr} + 2 ELSE {rr} - {rr_delta} END)"
    tt_delta = f"(CASE WHEN {avg_t} >= 1000 THEN (k + {op_id}) % 1000 ELSE 0 END)"
    where = "" if op_id in (0, 1, 2, 3, 4, 5, 6) else "WHERE k % 3 = 0"
    return f"""  SELECT
    query_id,
    CAST({op_id} AS BIGINT) AS id,
    {name} AS name,
    CAST({_OP_FRAGMENT[op_id]} AS BIGINT) AS fragment_id,
    {_OP_PARENT[op_id]} AS parent_id,
    {_nh(op_id)} AS num_hosts,
    {avg_t} AS avg_time,
    {avg_t} + {_idiv(avg_t + f' * ((k + {op_id}) % 10)', 9)} AS max_time,
    CAST({nr} AS BIGINT) AS num_rows,
    CAST(CASE WHEN (k + {op_id}) % 11 = 0 THEN -1
              ELSE {nr} - {_idiv(nr, 10)} END AS BIGINT) AS est_num_rows,
    CAST(({nr} * {rs}) % 1073741824 + 65536 AS BIGINT) AS peak_mem,
    CAST(({nr} * {rs}) % 1073741824 + 65536
         - {_idiv(f'(({nr} * {rs}) % 1073741824 + 65536)', 20)} AS BIGINT) AS est_peak_mem,
    {detail} AS detail,
    CAST(CASE WHEN (k + {op_id}) % 13 = 0 THEN -1
              ELSE {nr} + {op_id % 7} END AS BIGINT) AS cardinality,
    CAST({rs} AS BIGINT) AS row_size,
    {table} AS table_name,
    {size} AS size,
    {join_type} AS join_type,
    {join_impl} AS join_impl,
    {left_child} AS left_child_id,
    {right_child} AS right_child_id,
    {agg_type} AS agg_type,
    CAST({rr} AS BIGINT) AS rows_returned,
    CAST({rr_i1} AS BIGINT) AS rr_i1,
    CAST({rr_i2} AS BIGINT) AS rr_i2,
    {avg_t} + {tt_delta} AS tt_i1,
    {avg_t} - {tt_delta} AS tt_i2
  FROM iwa_base {where}"""


_OPERATORS = (
    "iwa_operators AS (\n"
    + "\n  UNION ALL\n".join(_op_branch(i) for i in (0, 1, 2, 3, 4, 5, 6, 7, 8))
    + "\n)"
)
# DDL queries produce no plan (profile_analyzer.py:29-37): filter them out.
_OPERATORS = _OPERATORS.replace("FROM iwa_base ", "FROM iwa_base WHERE k % 31 <> 0 ")
_OPERATORS = _OPERATORS.replace("WHERE k % 31 <> 0 WHERE k % 3 = 0",
                                "WHERE k % 31 <> 0 AND k % 3 = 0")


def _fragment_branch(frag_id: int) -> str:
    if frag_id == 0:
        exchange_id = "CAST(4 AS BIGINT)"
        cg = _idiv("runtime", 30)
        sink = f"(CASE WHEN k % 31 <> 0 AND k % 7 IN (4, 5) THEN {_idiv('runtime', 40)} ELSE 0 END)"
    else:
        exchange_id = _NULL_LONG
        cg = _idiv("runtime", 60)
        sink = "CAST(0 AS BIGINT)"
    cg_delta = f"(CASE WHEN {cg} >= 500 THEN k % 500 ELSE 0 END)"
    return f"""  SELECT
    query_id,
    CAST({frag_id} AS BIGINT) AS id,
    {exchange_id} AS exchange_id,
    CAST({cg} AS DOUBLE) AS avg_code_gen_total,
    CAST({sink} AS DOUBLE) AS avg_hdfs_table_sink_total,
    {cg} + {cg_delta} AS cg_i1,
    {cg} - {cg_delta} AS cg_i2,
    CAST({sink} AS BIGINT) AS sink_i1,
    CAST({sink} AS BIGINT) AS sink_i2
  FROM iwa_base WHERE k % 31 <> 0"""


_FRAGMENTS = (
    "iwa_fragments AS (\n"
    + "\n  UNION ALL\n".join(_fragment_branch(i) for i in (0, 1))
    + "\n)"
)

CORPUS_CTES = ",\n".join([_BASE.strip(), _QUERIES.strip(), _OPERATORS, _FRAGMENTS])


def with_corpus(select_sql: str) -> str:
    """Wrap an analytic SELECT with the corpus CTEs.

    Valid in both Spark SQL (over a registered ``orders`` view) and DuckDB
    (over the driver's pre-registered ``orders`` view).
    """
    return f"WITH {CORPUS_CTES}\n{select_sql}"
