"""Relational query registry — SURVEY.md §2.2-2.8 coverage.

Every [impl] operator row of the reference's inventory plus the
[absent] rubric rows (aggregations, windows, set ops, sorts, scalar
functions) the new engine adds. Each query has a DuckDB oracle twin;
float aggregates use the oracle-exact decimal recipe from
`functions.exact` so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import read_table
from ..functions.exact import dec, dsum, sql_dsum
from ..operators import relational as R

# --- P1/P3/P4: schema-conforming projection + rename + drop ---------------
# Reference: ccdc/chip.py:25-36 (select schema fields, drop extras),
# ccdc/randomforest.py:101-103 (rename), ccdc/segment.py:116 (drop).


def p1_conform_project(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    extra = li.withColumn("extra", F.lit(1))  # dropped by conform (P1 contract)
    out = R.conform(extra, ["l_orderkey", "l_linenumber", "l_quantity", "l_tax"])
    out = R.rename(out, {"l_quantity": "qty"})
    return R.drop(out, "l_tax")


# --- P6/P7: NOT-IN + range-conjunction predicates -------------------------
# Reference: ccdc/randomforest.py:64 ('trends[0] NOT IN (0, 9)'),
# ccdc/randomforest.py:69 ('sday >= {} AND eday <= {}').


def p6_p7_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    out = R.filter_not_in(li, "l_returnflag", ["A"])
    out = R.filter_range(
        out,
        "l_shipdate",
        F.lit("1996-01-01").cast("timestamp_ntz"),
        F.lit("1996-12-31").cast("timestamp_ntz"),
    )
    return out.filter(F.col("l_quantity") > 25).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


# --- J1: selective-read join (ids ⋈ table, broadcast) ---------------------
# Reference: ccdc/chip.py:49-51 — restrict big table to a work list.


def j1_selective_read(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    li = read_table(spark, "lineitem", sf)
    ids = R.distinct_keys(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"), ["o_orderkey"]
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    return R.selective_read(li, ids, ["l_orderkey"]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# --- J2: multi-key attach join + aggregation (revenue by nation) ----------
# Reference join shape: ccdc/features.py:6-17 (attach aux to segments).


def j2_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_table(spark, "customer", sf)
    orders = read_table(spark, "orders", sf).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = read_table(spark, "lineitem", sf)
    nation = read_table(spark, "nation", sf)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    revenue = F.sum(dec("l_extendedprice", 2) * (1 - dec("l_discount", 4)))
    return (
        joined.groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


# --- J3: join then drop joined column --------------------------------------
# Reference: ccdc/segment.py:103-116 (6-key join + drop('rfrawp')).


def j3_join_drop(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    cust = read_table(spark, "customer", sf).select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    out = R.equi_join(orders, cust, ["o_custkey"])
    return R.drop(out, "c_nationkey").select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )


# --- J4/A3: distinct key projection ----------------------------------------
# Reference: ccdc/randomforest.py:67 (select(cx,cy).distinct()).


def j4_distinct_keys(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    return R.distinct_keys(li, ["l_orderkey", "l_linestatus"])


# --- [absent §2.3] left / semi / anti joins --------------------------------


def j5_left_join_null_handling(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_table(spark, "customer", sf)
    urgent = read_table(spark, "orders", sf).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    out = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left")
    return out.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_urgent"),
        F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_urgent_price"),
    )


def j6_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_table(spark, "customer", sf)
    orders = read_table(spark, "orders", sf)
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = cust.join(urgent, ["c_custkey"], "left_semi").withColumn(
        "tag", F.lit("has_urgent")
    )
    anti = cust.join(urgent, ["c_custkey"], "left_anti").withColumn(
        "tag", F.lit("no_urgent")
    )
    return semi.select("c_custkey", "tag").unionByName(anti.select("c_custkey", "tag"))


# --- A1/A2: count + deterministic first ------------------------------------
# Reference: ccdc/randomforest.py:73-79 (guard count), :77 (first()).


def a1_count_guard(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    return li.filter(F.col("l_quantity") >= 30).agg(F.count("*").alias("n"))


def a2_first_row(spark: SparkSession, sf: str) -> DataFrame:
    # first() made deterministic: min-key row via orderBy+limit.
    orders = read_table(spark, "orders", sf)
    return orders.orderBy("o_orderkey").limit(1).select("o_orderkey", "o_orderstatus")


# --- [absent §2.4] groupBy aggregations (TPC-H Q1-shaped) -------------------


def a4_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    price = dec("l_extendedprice", 2, 14)
    disc = dec("l_discount", 4, 6)
    tax = dec("l_tax", 4, 6)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(dec("l_discount", 4)).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
    )


def a5_group_having(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_table(spark, "customer", sf)
    nation = read_table(spark, "nation", sf)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            ),
        )
        .filter(F.col("n_cust") > 3)
    )


# --- [absent §2.4] grouping sets / rollup / cube ----------------------------


def a6_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def a7_cube(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


def a8_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


def a9_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # HLL sketches differ across engines — rows-only check (no oracle).
    li = read_table(spark, "lineitem", sf)
    return li.agg(F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"))


# --- [absent §2.5] window functions -----------------------------------------


def w1_rank_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def w2_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, "events", sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    )


def w3_lag_gaps(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


# --- [absent §2.7] set operations -------------------------------------------
# Nearest reference analog: driver-side flatten/concat (ccdc/core.py:108).


def set1_union_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_table(spark, "customer", sf)
    orders = read_table(spark, "orders", sf)
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(urgent).withColumn("tag", F.lit("both"))
    only_b = building.exceptAll(urgent).withColumn("tag", F.lit("building_only"))
    return both.unionByName(only_b)


# --- O/[absent §2.6]: global sort + top-k ------------------------------------
# Reference only has driver-side take() (ccdc/core.py:98-99).


def o1_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- F1/F2 + [absent §2.8]: date / string / conditional scalar functions ----
# Reference: ordinal→ISO conversion ccdc/pyccd.py:113-115; range string
# ccdc/core.py:41-50.


def f1_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch"),
        F.date_format(d, "yyyy-MM").alias("yr_mo"),
    )


def f4_case_when(spark: SparkSession, sf: str) -> DataFrame:
    # CASE WHEN bucketing + LIKE/regex predicates ([absent] rows of §2.2);
    # coalesce-style null defaulting mirrors pyccd.default sentinel
    # substitution (ccdc/pyccd.py:99-103).
    orders = read_table(spark, "orders", sf)
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return (
        orders.filter(F.col("o_orderpriority").rlike("^[123]-"))
        .filter(F.col("o_orderstatus").like("%O%") | F.col("o_orderstatus").isin("F"))
        .groupBy(bucket.alias("price_bucket"))
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("sum_price"))
    )


QUERIES = {
    "p1_conform_project": p1_conform_project,
    "p6_p7_filter_predicates": p6_p7_filter_predicates,
    "j1_selective_read": j1_selective_read,
    "j2_revenue_by_nation": j2_revenue_by_nation,
    "j3_join_drop": j3_join_drop,
    "j4_distinct_keys": j4_distinct_keys,
    "j5_left_join_null_handling": j5_left_join_null_handling,
    "j6_semi_anti": j6_semi_anti,
    "a1_count_guard": a1_count_guard,
    "a2_first_row": a2_first_row,
    "a4_pricing_summary": a4_pricing_summary,
    "a5_group_having": a5_group_having,
    "a6_rollup": a6_rollup,
    "a7_cube": a7_cube,
    "a8_count_distinct": a8_count_distinct,
    "a9_approx_distinct": a9_approx_distinct,
    "w1_rank_topk_per_group": w1_rank_topk_per_group,
    "w2_running_sum": w2_running_sum,
    "w3_lag_gaps": w3_lag_gaps,
    "set1_union_intersect_except": set1_union_intersect_except,
    "o1_topk_orders": o1_topk_orders,
    "f1_date_functions": f1_date_functions,
    "f4_case_when": f4_case_when,
}

ORACLES = {
    "p1_conform_project": """
        SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem
    """,
    "p6_p7_filter_predicates": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem
        WHERE l_returnflag NOT IN ('A')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <= TIMESTAMP '1996-12-31'
          AND l_quantity > 25
    """,
    "j1_selective_read": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    "j2_revenue_by_nation": f"""
        SELECT n_name,
               {sql_dsum("CAST(l_extendedprice AS DECIMAL(18,2))"
                         " * (1 - CAST(l_discount AS DECIMAL(18,4)))", 6, 38)}
                   AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "j3_join_drop": """
        SELECT o_orderkey, o_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "j4_distinct_keys": """
        SELECT DISTINCT l_orderkey, l_linestatus FROM lineitem
    """,
    "j5_left_join_null_handling": """
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_urgent,
               COALESCE(MAX(o_totalprice), 0.0) AS max_urgent_price
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') u
          ON c_custkey = u.o_custkey
        GROUP BY c_custkey
    """,
    "j6_semi_anti": """
        SELECT c_custkey, 'has_urgent' AS tag FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT c_custkey, 'no_urgent' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "a1_count_guard": """
        SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity >= 30
    """,
    "a2_first_row": """
        SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 1
    """,
    "a4_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR)
                    AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (1 - CAST(l_discount AS DECIMAL(6,4)))
                        * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS VARCHAR)
                    AS DOUBLE) AS sum_charge,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "a5_group_having": """
        SELECT n_name, COUNT(*) AS n_cust,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*) AS avg_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING COUNT(*) > 3
    """,
    "a6_rollup": f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "a7_cube": """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "a8_count_distinct": """
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        FROM lineitem
    """,
    # a9_approx_distinct: intentionally no oracle (sketches differ by engine).
    "w1_rank_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
        WHERE rn <= 3
    """,
    "w2_running_sum": """
        SELECT user_id, event_id,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
                   AS DOUBLE) AS running_value
        FROM events
    """,
    "w3_lag_gaps": """
        SELECT user_id, event_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    """,
    "set1_union_intersect_except": """
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        urgent AS (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT')
        SELECT c_custkey, 'both' AS tag
        FROM (SELECT c_custkey FROM building INTERSECT
              SELECT c_custkey FROM urgent) t
        UNION ALL
        SELECT c_custkey, 'building_only' AS tag
        FROM (SELECT c_custkey FROM building EXCEPT ALL
              SELECT c_custkey FROM urgent) t
    """,
    "o1_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
    "f1_date_functions": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                    AS INT) AS days_since_epoch,
               strftime(o_orderdate, '%Y-%m') AS yr_mo
        FROM orders
    """,
    "f4_case_when": f"""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                    WHEN o_totalprice < 300000 THEN 'mid'
                    ELSE 'high' END AS price_bucket,
               COUNT(*) AS n,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        WHERE regexp_matches(o_orderpriority, '^[123]-')
          AND (o_orderstatus LIKE '%O%' OR o_orderstatus IN ('F'))
        GROUP BY 1
    """,
}
