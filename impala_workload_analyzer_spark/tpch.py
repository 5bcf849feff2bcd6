"""TPC-H-style headline queries over the fixture star schema.

These are the engine's subjects for the join / window / set-op / sort /
limit operator classes the reference's corpus *describes* (SURVEY.md
§2.3-2.7): Impala's BROADCAST vs PARTITIONED join choice maps to Spark's
``broadcast()`` hint + AQE; its PRE/POST aggregates map to Spark's
automatic partial aggregation.

Numeric discipline: money aggregates run in DECIMAL (exact, associative,
order-independent), so results are bit-identical across engines AND across
partitionings — summing raw doubles would make the answer depend on the
shuffle layout, which is unacceptable for a 100 TB engine. Final outputs
cast to double.

Scale notes per query are in the docstrings; nation/region/customer sides
are broadcast explicitly where a real cluster should never shuffle them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .io import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DEC = "decimal(18,2)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: scan -> filter -> partial/final hash agg. One shuffle on
    the tiny (returnflag, linestatus) key; all arithmetic codegen'd."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty_d"),
            F.sum(price).alias("sum_base_price_d"),
            F.sum((price * (F.lit(1).cast(_DEC) - disc)).cast("decimal(18,4)")).alias("sum_disc_price_d"),
            F.sum(
                (price * (F.lit(1).cast(_DEC) - disc) * (F.lit(1).cast(_DEC) + tax)).cast("decimal(18,6)")
            ).alias("sum_charge_d"),
            F.count("*").alias("count_order"),
            F.sum(disc).alias("sum_disc_d"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
            F.col("sum_base_price_d").cast("double").alias("sum_base_price"),
            F.col("sum_disc_price_d").cast("double").alias("sum_disc_price"),
            F.col("sum_charge_d").cast("double").alias("sum_charge"),
            # cast the EXACT decimal to double first, then divide: one IEEE
            # rounding, bit-identical cross-engine. Decimal division then a
            # cast rounds twice (Spark picks a division scale, HALF_UP, then
            # casts) and sits on last-bit jitter vs DuckDB — caught by the
            # SPARK_GRAFT_EXACT sweep in round 8.
            (F.col("sum_qty_d").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("sum_base_price_d").cast("double") / F.col("count_order")).alias("avg_price"),
            (F.col("sum_disc_d").cast("double") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dim filter -> two equi-joins -> agg -> top-10.
    customer filter broadcast into orders; orders⋈lineitem shuffles on
    l_orderkey. LIMIT is made deterministic with a unique tiebreak key."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("revenue_d"))
        .select(
            "l_orderkey",
            F.col("revenue_d").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue_d"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join. region/nation/supplier/customer are broadcast
    dims; the fact-fact orders⋈lineitem shuffle is the only big exchange."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue_d"))
        .select("n_name", F.col("revenue_d").cast("double").alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan + selective predicate + grand agg — the
    pushdown/codegen benchmark. Filters reach the parquet reader."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast("decimal(4,2)")).cast(
        "decimal(18,4)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue).alias("revenue_d"))
        .select(F.coalesce(F.col("revenue_d").cast("double"), F.lit(0.0)).alias("revenue"))
    )


def w2b_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 on TPC-H: each nation's share of its region's customer account
    balance — `sum over (partition by region)` window after a broadcast
    dim join."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    bal = (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("c_acctbal").cast(_DEC)).alias("nation_bal_d"))
    )
    w = Window.partitionBy("r_name")
    return bal.select(
        "r_name",
        "n_name",
        F.col("nation_bal_d").cast("double").alias("nation_bal"),
        # divide in DOUBLE: decimal/decimal scale+rounding rules are
        # engine-specific, IEEE division is not
        (
            F.col("nation_bal_d").cast("double")
            / F.sum("nation_bal_d").over(w).cast("double")
        ).alias("bal_share"),
    )


def w3_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — ranking window: top-3 customers by account balance per nation
    (row_number with a unique tiebreak)."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("c_nationkey", "rank", "c_custkey", "c_name", "c_acctbal")
    )


def o4_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — ORDER BY + LIMIT (TopK physical op), deterministic via unique
    tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


def set1_union_party_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — UNION ALL + distinct-union subject: customer vs supplier
    presence per nation."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("party")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("party")
    )
    return (
        cust.unionAll(supp)
        .groupBy("nationkey", "party")
        .agg(F.count("*").alias("num_parties"))
    )


def set2_party_nation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — INTERSECT / EXCEPT subjects: nations with BOTH customers and
    suppliers (intersect), tagged against nations with customers but no
    suppliers (except). Spark compiles both to aggregate + semi/anti-join
    plans; the oracle uses the SQL set operators natively."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust.intersect(supp).select(
        "nationkey", F.lit("both").alias("presence")
    )
    cust_only = cust.subtract(supp).select(  # EXCEPT DISTINCT
        "nationkey", F.lit("customer_only").alias("presence")
    )
    return both.unionByName(cust_only)


def x1_region_nation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN subject (the corpus audits Impala CROSS JOIN nodes):
    full region × nation grid with a same-region flag."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return region.crossJoin(broadcast(nation)).select(
        "r_regionkey",
        "r_name",
        "n_nationkey",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("same_region"),
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (adapted: fixtures lack commit/receipt dates): EXISTS
    semi-join — orders having a late-shipped line (l_shipdate >
    o_orderdate), counted per priority. LeftSemi keeps orders unduplicated
    without a distinct."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-lineitem revenue per customer, 3 joins + agg +
    top-20; nation broadcast, customer broadcast into the fact agg."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).alias("revenue_d"))
        .select(
            "c_custkey", "c_name", F.col("revenue_d").cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
        .orderBy(F.desc("revenue_d"), F.asc("c_custkey"))
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join customers->orders, per-customer order
    count (0 preserved), then the distribution of counts — two cascaded
    aggregations."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: fact⋈part with conditional aggregation — promo revenue
    share; part broadcast, single pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01")) & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    joined = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            * 100.0
            / F.sum(revenue).cast("double")
        ).alias("promo_revenue_pct")
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (adapted: fixtures lack phone codes; every customer has
    SOME order, so the anti-join is scoped to a quarter): customers with
    above-average balance and no RECENT orders — scalar-subquery threshold
    + LEFT ANTI join, grouped by nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg(F.col("c_acctbal").cast("double")).alias("avg_bal")
    )
    rich = cust.join(broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 2).cast("double").alias("totacctbal"),
        )
    )


_REV = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"

ORACLES = {
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q10": f"""
        SELECT c_custkey, c_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue, c_acctbal, n_name
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY SUM({_REV}) DESC, c_custkey ASC
        LIMIT 20""",
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) t GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "tpch_q14": f"""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
               / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",
    "tpch_q22": """
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DOUBLE)) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1996-10-01'
                          AND o_orderdate < TIMESTAMP '1997-01-01')
        GROUP BY c_nationkey""",
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus""",
    "tpch_q3": f"""
        SELECT l_orderkey, CAST(SUM({_REV}) AS DOUBLE) AS revenue, o_orderdate, o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY SUM({_REV}) DESC, l_orderkey ASC
        LIMIT 10""",
    "tpch_q5": f"""
        SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name""",
    "tpch_q6": """
        SELECT CAST(COALESCE(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))), 0) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "w2b_nation_revenue_share": """
        WITH bal AS (
          SELECT r_name, n_name,
                 SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS nation_bal_d
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name
        )
        SELECT r_name, n_name, CAST(nation_bal_d AS DOUBLE) AS nation_bal,
               CAST(nation_bal_d AS DOUBLE)
                 / CAST(SUM(nation_bal_d) OVER (PARTITION BY r_name) AS DOUBLE) AS bal_share
        FROM bal""",
    "w3_top_customers_per_nation": """
        SELECT c_nationkey, rank, c_custkey, c_name, c_acctbal FROM (
          SELECT c_nationkey, c_custkey, c_name, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
          FROM customer
        ) t WHERE rank <= 3""",
    "o4_topn_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "set1_union_party_nations": """
        SELECT nationkey, party, COUNT(*) AS num_parties FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS party FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey, 'supplier' AS party FROM supplier
        ) t GROUP BY nationkey, party""",
    "x1_region_nation_grid": """
        SELECT r_regionkey, r_name, n_nationkey, n_name,
               n_regionkey = r_regionkey AS same_region
        FROM region CROSS JOIN nation""",
    "set2_party_nation_overlap": """
        SELECT nationkey, 'both' AS presence FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT
          SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'customer_only' AS presence FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT
          SELECT s_nationkey FROM supplier)""",
}

SPARK_QUERIES = {
    "tpch_q1": q1_pricing_summary,
    "tpch_q3": q3_shipping_priority,
    "tpch_q4": q4_order_priority,
    "tpch_q5": q5_local_supplier_volume,
    "tpch_q6": q6_forecast_revenue,
    "tpch_q10": q10_returned_items,
    "tpch_q13": q13_customer_distribution,
    "tpch_q14": q14_promo_effect,
    "tpch_q22": q22_global_sales_opportunity,
    "w2b_nation_revenue_share": w2b_nation_revenue_share,
    "w3_top_customers_per_nation": w3_top_customers_per_nation,
    "o4_topn_orders": o4_topn_orders,
    "set1_union_party_nations": set1_union_party_nations,
    "x1_region_nation_grid": x1_region_nation_grid,
    "set2_party_nation_overlap": set2_party_nation_overlap,
}
