"""Relational query registry — SURVEY.md §2.2-2.8 coverage.

Every [impl] operator row of the reference's inventory plus the
[absent] rubric rows (aggregations, windows, set ops, sorts, scalar
functions) the new engine adds. Each query has a DuckDB oracle twin;
float aggregates use the oracle-exact decimal recipe from
`functions.exact` so value hashes match bit-for-bit.

Round-2 consolidation: the driver records only the first 50
registry entries, so near-duplicate queries were folded together
without losing operator coverage (each fold is noted on the
surviving query's docstring):
- j3_join_drop   → j2 (drop step inside the revenue plan)
- j4_distinct    → j1 (distinct_keys is the work-list build)
- j6_semi_anti   → j5_join_variants (left + semi + anti together)
- a2_first_row   → o1 (first() ≡ orderBy + limit(1))
- a8_count_distinct → a1_count_guard
- a12_percentiles   → a4_pricing_summary
- a7_cube / a11_grouping_sets → a6_multidim_agg
- w3_lag / w4_range_frame     → w2_window_frames
- f4_case_when   → f1_date_functions (CASE/LIKE/regex as columns)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import read_table, register_views
from ..functions.dates import micros
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


# --- J1 + J4/A3: selective-read join (distinct work list, broadcast) ------
# Reference: ccdc/chip.py:49-51 — restrict big table to a work list;
# ccdc/randomforest.py:67 (select(cx,cy).distinct() builds that list).


def j1_selective_read(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    li = read_table(spark, "lineitem", sf)
    ids = R.distinct_keys(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"), ["o_orderkey"]
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    return R.selective_read(li, ids, ["l_orderkey"]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# --- J2 (+J3/P4): multi-key attach join + drop + aggregation ---------------
# Reference join shape: ccdc/features.py:6-17 (attach aux to segments);
# join-then-drop: ccdc/segment.py:103-116 (6-key join + drop('rfrawp')).


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
    # J3: drop the joined-in key column before the aggregate
    joined = R.drop(joined, "n_nationkey")
    revenue = F.sum(dec("l_extendedprice", 2) * (1 - dec("l_discount", 4)))
    return (
        joined.groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


# --- [absent §2.3] left / semi / anti joins in one plan --------------------


def j5_join_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer (null-handling agg) + left_semi/left_anti tagging
    over the same key — the three non-inner join variants in one
    oracle-checked output (folds old j5 + j6)."""
    cust = read_table(spark, "customer", sf)
    urgent = read_table(spark, "orders", sf).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    base = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_urgent"),
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_urgent_price"),
        )
    )
    keys = urgent.select(F.col("o_custkey").alias("c_custkey"))
    semi = cust.join(keys, ["c_custkey"], "left_semi").select(
        "c_custkey", F.lit("has_urgent").alias("tag")
    )
    anti = cust.join(keys, ["c_custkey"], "left_anti").select(
        "c_custkey", F.lit("no_urgent").alias("tag")
    )
    return base.join(semi.unionByName(anti), "c_custkey")


# --- A1 (+A8-fold): count guard + exact count-distinct ---------------------
# Reference: ccdc/randomforest.py:73-79 (guard count).


def a1_count_guard(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf)
    return li.agg(
        F.count(F.when(F.col("l_quantity") >= 30, 1)).alias("n_heavy"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


# --- [absent §2.4] groupBy aggregations (TPC-H Q1-shaped, + percentiles) ---


def a4_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape + exact per-group percentiles (folds old a12)."""
    li = read_table(spark, "lineitem", sf)
    price = dec("l_extendedprice", 2, 14)
    disc = dec("l_discount", 4, 6)
    tax = dec("l_tax", 4, 6)
    pct = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9)))
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
            F.element_at(pct, 1).alias("p50_qty"),
            F.element_at(pct, 2).alias("p90_qty"),
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


# --- [absent §2.4] rollup + cube + grouping sets (one tagged union) --------


def a6_multidim_agg(spark: SparkSession, sf: str) -> DataFrame:
    """All three multi-dimensional grouping operators in one output:
    DataFrame rollup (lineitem), DataFrame cube (orders), and the SQL
    front door's GROUPING SETS (lineitem), tagged by `op` (folds old
    a6/a7/a11)."""
    li = read_table(spark, "lineitem", sf)
    orders = read_table(spark, "orders", sf)
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.lit("rollup").alias("op"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("g1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("g2"),
            "n",
            "sum_qty",
        )
    )
    cube = (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("cube").alias("op"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("g1"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("g2"),
            "n",
            F.lit(None).cast("double").alias("sum_qty"),
        )
    )
    register_views(spark, sf, only=("lineitem",))
    gs = spark.sql(
        """
        SELECT 'gs' AS op,
               COALESCE(l_returnflag, 'ALL') AS g1,
               COALESCE(l_linestatus, 'ALL') AS g2,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gs)


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


def w2_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Running sum (ROWS frame), lag gap, and trailing-hour RANGE
    frame in one pass over events (folds old w2/w3/w4). The first two
    windows share one (user_id, ts, event_id) sort; the RANGE frame
    orders by the same instant in µs so no extra exchange is needed."""
    ev = read_table(spark, "events", sf).withColumn("t_us", micros("ts"))
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rows = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hour_us = 3_600_000_000
    w_range = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(-hour_us, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w_rows).cast("double").alias("running_value"),
        (F.col("t_us") - F.lag("t_us").over(w_ord)).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w_range)
        .cast("double")
        .alias("trailing_hour_value"),
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


# --- O/[absent §2.6] + A2: global sort + top-k ------------------------------
# Reference only has driver-side take() (ccdc/core.py:98-99). A2's
# deterministic first() is the limit(1) special case of this plan.


def o1_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- F1/F2 + [absent §2.8]: date / conditional / pattern scalar functions ---
# Reference: ordinal→ISO conversion ccdc/pyccd.py:113-115; range string
# ccdc/core.py:41-50; CASE/coalesce mirrors pyccd.default sentinel
# substitution (ccdc/pyccd.py:99-103). Folds old f4: the CASE bucket
# and LIKE/regex predicates ride along as projection columns.


def f1_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_table(spark, "orders", sf)
    d = F.col("o_orderdate").cast("date")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch"),
        F.date_format(d, "yyyy-MM").alias("yr_mo"),
        bucket.alias("price_bucket"),
        F.col("o_orderpriority").rlike("^[123]-").alias("is_prio123"),
        (
            F.col("o_orderstatus").like("%O%") | F.col("o_orderstatus").isin("F")
        ).alias("status_of"),
    )


QUERIES = {
    "p1_conform_project": p1_conform_project,
    "p6_p7_filter_predicates": p6_p7_filter_predicates,
    "j1_selective_read": j1_selective_read,
    "j2_revenue_by_nation": j2_revenue_by_nation,
    "j5_join_variants": j5_join_variants,
    "a1_count_guard": a1_count_guard,
    "a4_pricing_summary": a4_pricing_summary,
    "a5_group_having": a5_group_having,
    "a6_multidim_agg": a6_multidim_agg,
    # a9_approx_distinct deliberately unregistered (round 4): the HLL
    # sketch can never earn an oracle (engines differ), so its slot
    # goes to the oracle-paired d8_substring_spans; approx-distinct
    # coverage lives in tests/test_substring.py::test_approx_distinct.
    "w1_rank_topk_per_group": w1_rank_topk_per_group,
    "w2_window_frames": w2_window_frames,
    "set1_union_intersect_except": set1_union_intersect_except,
    "o1_topk_orders": o1_topk_orders,
    "f1_date_functions": f1_date_functions,
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
    "j5_join_variants": """
        WITH urgent AS (
            SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'),
        base AS (
            SELECT c_custkey,
                   COUNT(o_orderkey) AS n_urgent,
                   COALESCE(MAX(o_totalprice), 0.0) AS max_urgent_price
            FROM customer LEFT JOIN urgent ON c_custkey = o_custkey
            GROUP BY c_custkey),
        tags AS (
            SELECT c_custkey, 'has_urgent' AS tag FROM customer
            WHERE EXISTS (SELECT 1 FROM urgent WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT c_custkey, 'no_urgent' AS tag FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM urgent WHERE o_custkey = c_custkey))
        SELECT b.c_custkey, b.n_urgent, b.max_urgent_price, t.tag
        FROM base b JOIN tags t ON b.c_custkey = t.c_custkey
    """,
    "a1_count_guard": """
        SELECT COUNT(*) FILTER (WHERE l_quantity >= 30) AS n_heavy,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        FROM lineitem
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
               COUNT(*) AS count_order,
               quantile_cont(l_quantity, 0.5) AS p50_qty,
               quantile_cont(l_quantity, 0.9) AS p90_qty
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
    "a6_multidim_agg": f"""
        SELECT 'rollup' AS op,
               COALESCE(l_returnflag, 'ALL') AS g1,
               COALESCE(l_linestatus, 'ALL') AS g2,
               COUNT(*) AS n,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS op,
               COALESCE(o_orderpriority, 'ALL') AS g1,
               COALESCE(o_orderstatus, 'ALL') AS g2,
               COUNT(*) AS n,
               CAST(NULL AS DOUBLE) AS sum_qty
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        UNION ALL
        SELECT 'gs' AS op,
               COALESCE(l_returnflag, 'ALL') AS g1,
               COALESCE(l_linestatus, 'ALL') AS g2,
               COUNT(*) AS n,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    # a9_approx_distinct: unregistered (see QUERIES note) — sketches
    # differ by engine, so no oracle was ever possible.
    "w1_rank_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
        WHERE rn <= 3
    """,
    "w2_window_frames": """
        SELECT user_id, event_id,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
                   AS DOUBLE) AS running_value,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                   AS VARCHAR) AS DOUBLE) AS trailing_hour_value
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
               strftime(o_orderdate, '%Y-%m') AS yr_mo,
               CASE WHEN o_totalprice < 100000 THEN 'low'
                    WHEN o_totalprice < 300000 THEN 'mid'
                    ELSE 'high' END AS price_bucket,
               regexp_matches(o_orderpriority, '^[123]-') AS is_prio123,
               (o_orderstatus LIKE '%O%' OR o_orderstatus IN ('F')) AS status_of
        FROM orders
    """,
}
