"""Ingest-layer unit tests: the stateful plan parser and unit parsers
(reference: profile_analyzer.py:78-193, 341-403)."""

from __future__ import annotations

import textwrap

from impala_workload_analyzer_spark.sources import profiles as P

_PROFILE = textwrap.dedent("""\
    === Summary ===
    Query State: FINISHED
    Query Status: OK
    Query Type: QUERY
    Sql Statement: SELECT 1
    Start Time: 2024-01-01 00:00:00.000001000
    End Time: 2024-01-01 00:00:01.000000000
    Impala Version: impalad version 2.1.0 RELEASE (build 1)
    Coordinator: h1:22000
    Query Timeline: 0,10,10,25,100
    Query Id: 77
    Per Node Peak Memory Usage: h2:22000(1.00 MB) h1:22000(1.00 MB)
    === ExecSummary ===
    h1
    h2
    h3
      2:HASH JOIN  2  1h2m  2h  2.85K  -1  278.73 KB  100 B  j
      1:SCAN HDFS  2  795.202us  1ms  10  9  1.00 MB  1.00 MB  t1 x
      0:SCAN HDFS  2  250ms  1s  20  18  2 B  1 B  lineitem y
    === Plan ===
    F00:PLAN FRAGMENT [RANDOM]
      2:HASH JOIN [LEFT OUTER JOIN, BROADCAST]
      |  tuple-ids=0 row-size=12B cardinality=unavailable
      |--1:SCAN HDFS [t1, partitions: 1/1]
      |  tuple-ids=0 row-size=8B cardinality=10
         partitions=1/1 files=1 size=4KB
      0:SCAN HDFS [lineitem]
      |  tuple-ids=0 row-size=4B cardinality=20
         partitions=1/1 files=2 size=1MB
    """)


def test_unit_parsers_match_reference_cases():
    assert P._pp_size("278.73 KB") == 285419
    assert P._pp_size("-1.00 B") == -1
    assert P._pp_size("0") == 0
    assert P._pp_number("2.85K") == 2850
    assert P._pp_number("-1") == -1
    assert P._pp_time("795.202us") == 795202
    assert P._pp_time("1h2m") == 3720 * 10**9


def test_plan_tree_parse_right_child_first():
    query, ops, frags = P.parse_profile(_PROFILE, "t")
    by_id = {o["id"]: o for o in ops}
    join = by_id[2]
    # right child listed first in plan text (profile_analyzer.py:136-141)
    assert join["right_child_id"] == 1
    assert join["left_child_id"] == 0
    assert join["join_type"] == "LEFT OUTER JOIN"
    assert join["join_impl"] == "BROADCAST"
    assert join["cardinality"] == -1 and join["row_size"] == 12
    assert by_id[1]["parent_id"] == 2 and by_id[0]["parent_id"] == 2
    assert by_id[1]["table"] == "t1" and by_id[1]["size"] == 4096
    assert by_id[0]["size"] == 1024**2
    assert join["parent_id"] is None
    # exec summary values parsed through the pretty-print parsers
    assert join["avg_time"] == 3720 * 10**9
    assert join["num_rows"] == 2850 and join["est_num_rows"] == -1
    assert join["peak_mem"] == 285419 and join["est_peak_mem"] == 100
    # query-level rollups
    assert query["num_hdfs_scans"] == 2 and query["num_tables"] == 2
    assert query["num_hosts"] == 2
    assert query["hosts"] == ["h1:22000", "h2:22000"] if "hosts" in query else True
    assert query["plan_time"] == 10 and query["fragment_start_time"] == 15
    assert query["runtime"] == 100
    assert frags[0]["exchange_id"] is None


def test_status_gate_drops_failed_profiles():
    bad = _PROFILE.replace("Query State: FINISHED", "Query State: EXCEPTION")
    query, ops, frags = P.parse_profile(bad, "t")
    assert query is None and ops == [] and frags == []


def test_ddl_path(spark=None):
    ddl = textwrap.dedent("""\
        === Summary ===
        Query State: FINISHED
        Query Status: OK
        Query Type: DDL
        Sql Statement: CREATE TABLE x (i INT)
        Start Time: 2024-01-01 00:00:00.000000000
        End Time: 2024-01-01 00:00:01.000000000
        Impala Version: impalad version 2.0.0 RELEASE (build 0)
        Coordinator: h9:22000
        Query Timeline: 0,5,5,9,50
        Query Id: 31
        """)
    query, ops, frags = P.parse_profile(ddl, "t")
    assert query["query_type"] == "DDL"
    assert query["num_hosts"] == 1
    assert query["plan_time"] is None  # DDL has no plan (profile_analyzer.py:39-48)
    assert ops == [] and frags == []
