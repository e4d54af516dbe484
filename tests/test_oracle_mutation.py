"""Adversarial audit of the verification machinery itself (r8 VERDICT
next-round #1): mutation-test the DuckDB oracle twins.

The correctness evidence chain is query → driver compare → oracle
twin; a bug that made a query and its twin wrong TOGETHER would be
invisible to every green row. These tests close the loop from the
other side: for a dozen registry slots we deliberately perturb the
SPARK side with realistic bug classes (off-by-one predicate, dropped
join key, swapped tags, shifted window frame, changed constants) and
assert the DRIVER'S EXACT comparison (tools/oracle_compare.py — the
same module driver_sim.py imports) goes RED against the unmutated
twin. A mutation that stayed green would mean the twin + test data
cannot detect that semantic dimension — a hole.

Every slot also asserts its UNMUTATED query is green first, so a red
verdict is attributable to the mutation, not harness wiring.

The comparator's three dimensions (rows / schema / value-multiset)
are additionally each proven independently sensitive with synthetic
output-level perturbations, including the multiset-preserving
cross-row value swap only the row-wise tuple compare can catch.

Reference anchor: the driver contract in /root/repo/__spark_entry__.py:1-10.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from oracle_compare import compare  # noqa: E402

from lcmap_firebird_spark.catalog import read_table  # noqa: E402
from lcmap_firebird_spark.functions.dates import micros  # noqa: E402
from lcmap_firebird_spark.functions.exact import dec, dsum  # noqa: E402
from lcmap_firebird_spark.operators import dedup as D  # noqa: E402
from lcmap_firebird_spark.operators import relational as R  # noqa: E402
from lcmap_firebird_spark.queries import dedup as QD  # noqa: E402
from lcmap_firebird_spark.queries import relational as QR  # noqa: E402


def _want(oracle, name, module):
    return oracle.execute(module.ORACLES[name]).fetchdf()


def _assert_green(spark, oracle, sf_dir, name, module):
    got = module.QUERIES[name](spark, sf_dir).toPandas()
    v = compare(got, _want(oracle, name, module))
    assert all(v.values()), f"{name} baseline not green: {v}"


def _assert_red(spark, oracle, sf_dir, name, module, mutant_df, label):
    v = compare(mutant_df.toPandas(), _want(oracle, name, module))
    assert not all(v.values()), (
        f"HOLE IN TWIN: mutation {label!r} of {name} stayed green — "
        "the oracle + test data cannot detect this bug class"
    )


# --- off-by-one predicate boundaries ---------------------------------------


def test_mut_p6_boundary(spark, oracle, sf_dir):
    """> 25 mutated to >= 25: boundary rows exist in the date window
    (22 at sf0.001), so the row count must diverge."""
    name = "p6_p7_filter_predicates"
    _assert_green(spark, oracle, sf_dir, name, QR)
    li = read_table(spark, "lineitem", sf_dir)
    out = R.filter_not_in(li, "l_returnflag", ["A"])
    out = R.filter_range(
        out,
        "l_shipdate",
        F.lit("1996-01-01").cast("timestamp_ntz"),
        F.lit("1996-12-31").cast("timestamp_ntz"),
    )
    mut = out.filter(F.col("l_quantity") >= 25).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "quantity > -> >=")


def test_mut_a1_filter_boundary(spark, oracle, sf_dir):
    """Aggregate-internal predicate >= 30 mutated to > 30: one output
    row either way (rows stay green) — only the value multiset can
    catch it."""
    name = "a1_count_guard"
    _assert_green(spark, oracle, sf_dir, name, QR)
    li = read_table(spark, "lineitem", sf_dir)
    mut = li.agg(
        F.count(F.when(F.col("l_quantity") > 30, 1)).alias("n_heavy"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "count filter >= -> >")


def test_mut_a5_having_boundary(spark, oracle, sf_dir):
    """HAVING > 3 mutated to >= 3: a nation with exactly 3 customers
    exists at sf0.001, so the group set diverges."""
    name = "a5_group_having"
    _assert_green(spark, oracle, sf_dir, name, QR)
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    mut = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            ),
        )
        .filter(F.col("n_cust") >= 3)
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "HAVING > -> >=")


def test_mut_o1_limit_offbyone(spark, oracle, sf_dir):
    name = "o1_topk_orders"
    _assert_green(spark, oracle, sf_dir, name, QR)
    orders = read_table(spark, "orders", sf_dir)
    mut = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(49)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "limit 50 -> 49")


def test_mut_w1_topk_offbyone(spark, oracle, sf_dir):
    name = "w1_rank_topk_per_group"
    _assert_green(spark, oracle, sf_dir, name, QR)
    orders = read_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    mut = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "rn <= 3 -> <= 2")


# --- dropped / wrong join key ----------------------------------------------


def test_mut_j1_wrong_worklist(spark, oracle, sf_dir):
    """Work-list filter changed to a different priority class — the
    selective read returns a different id set."""
    name = "j1_selective_read"
    _assert_green(spark, oracle, sf_dir, name, QR)
    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    ids = R.distinct_keys(
        orders.filter(F.col("o_orderpriority") == "2-HIGH"), ["o_orderkey"]
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    mut = R.selective_read(li, ids, ["l_orderkey"]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "work-list 1-URGENT -> 2-HIGH")


def test_mut_j2_dropped_join_key_and_swapped_agg(spark, oracle, sf_dir):
    """Two classic bug classes on the flagship smoke query: joining
    customer on the WRONG key column, and dropping the (1 - discount)
    factor from the revenue aggregate (row set identical, values
    wrong)."""
    name = "j2_revenue_by_nation"
    _assert_green(spark, oracle, sf_dir, name, QR)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = read_table(spark, "lineitem", sf_dir)
    nation = read_table(spark, "nation", sf_dir)

    def build(join_col, with_discount):
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust[join_col])
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        )
        joined = R.drop(joined, "n_nationkey")
        rev = dec("l_extendedprice", 2) * (1 - dec("l_discount", 4)) if with_discount else dec("l_extendedprice", 2)
        return joined.groupBy("n_name").agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )

    _assert_red(
        spark, oracle, sf_dir, name, QR,
        build("c_nationkey", True), "join key c_custkey -> c_nationkey",
    )
    _assert_red(
        spark, oracle, sf_dir, name, QR,
        build("c_custkey", False), "revenue without (1 - discount)",
    )


# --- swapped labels / set-op semantics ---------------------------------------


def test_mut_j5_swapped_tags(spark, oracle, sf_dir):
    """semi/anti memberships swapped — row count and per-column value
    multisets are NOT both preserved (tag counts flip), and the
    row-wise compare catches the mislabel regardless."""
    name = "j5_join_variants"
    _assert_green(spark, oracle, sf_dir, name, QR)
    cust = read_table(spark, "customer", sf_dir)
    urgent = read_table(spark, "orders", sf_dir).filter(
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
        "c_custkey", F.lit("no_urgent").alias("tag")
    )
    anti = cust.join(keys, ["c_custkey"], "left_anti").select(
        "c_custkey", F.lit("has_urgent").alias("tag")
    )
    mut = base.join(semi.unionByName(anti), "c_custkey")
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "semi/anti tags swapped")


def test_mut_set1_swapped_tags(spark, oracle, sf_dir):
    name = "set1_union_intersect_except"
    _assert_green(spark, oracle, sf_dir, name, QR)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(urgent).withColumn("tag", F.lit("building_only"))
    only_b = building.exceptAll(urgent).withColumn("tag", F.lit("both"))
    mut = both.unionByName(only_b)
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "set-op tags swapped")


# --- shifted window frame / date arithmetic ----------------------------------


def test_mut_w2_shifted_frame(spark, oracle, sf_dir):
    """Running-sum frame shifted to exclude the current row — every
    running_value moves; rows/schema stay green, multiset goes red."""
    name = "w2_window_frames"
    _assert_green(spark, oracle, sf_dir, name, QR)
    ev = read_table(spark, "events", sf_dir).withColumn("t_us", micros("ts"))
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rows = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    hour_us = 3_600_000_000
    w_range = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(-hour_us, 0)
    mut = ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w_rows).cast("double").alias("running_value"),
        (F.col("t_us") - F.lag("t_us").over(w_ord)).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w_range)
        .cast("double")
        .alias("trailing_hour_value"),
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "ROWS frame excludes current")


def test_mut_f1_date_arith(spark, oracle, sf_dir):
    name = "f1_date_functions"
    _assert_green(spark, oracle, sf_dir, name, QR)
    mut = QR.f1_date_functions(spark, sf_dir).withColumn(
        "due_date",
        F.date_format(
            F.date_add(F.col("due_date").cast("date"), 1), "yyyy-MM-dd"
        ),
    )
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "date_add 30 -> 31")


def test_mut_a4_dropped_filter(spark, oracle, sf_dir):
    """Shipdate filter dropped from the Q1-shaped aggregate: group
    keys unchanged (rows green), every aggregate value moves."""
    name = "a4_pricing_summary"
    _assert_green(spark, oracle, sf_dir, name, QR)
    li = read_table(spark, "lineitem", sf_dir)
    price = dec("l_extendedprice", 2, 14)
    disc = dec("l_discount", 4, 6)
    tax = dec("l_tax", 4, 6)
    pct = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9)))
    mut = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
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
    _assert_red(spark, oracle, sf_dir, name, QR, mut, "shipdate filter dropped")


# --- changed operator constants (quantized dedup family) ---------------------


def test_mut_d2_constants(spark, oracle, sf_dir):
    """Jaccard threshold and shingle width perturbed — the twin SQL is
    generated from the SAME pinned constants, so divergence must go
    red.

    AUDIT FINDING (r9, kept on record): the synthetic documents
    corpus is BIMODAL — every shared-shingle pair scores >= 0.889
    (planted near-dups) or <= 0.069 (noise), nothing in between — so
    a small threshold drift (e.g. 0.3 -> 0.2) is UNDETECTABLE at any
    tested SF: the twin replicates the threshold exactly, but no row
    crosses it. The threshold mutation below therefore crosses the
    occupied region (0.3 -> 0.95); the shingle-width mutation is
    caught through the n_common/jaccard value columns on every
    surviving pair."""
    name = "d2_ngram_jaccard"
    _assert_green(spark, oracle, sf_dir, name, QD)
    docs = read_table(spark, "documents", sf_dir)
    mut_t = D.jaccard_pairs(docs, 0.95, k=QD.K)
    _assert_red(spark, oracle, sf_dir, name, QD, mut_t, "threshold 0.3 -> 0.95")
    mut_k = D.jaccard_pairs(docs, QD.JACCARD_T, k=QD.K + 1)
    _assert_red(spark, oracle, sf_dir, name, QD, mut_k, "shingle k + 1")


# --- extended.py twins (named in the r8 VERDICT as last passed r5) -----------


def test_mut_j7_wrong_left_filter(spark, oracle, sf_dir):
    """As-of join left side filtered to the wrong event type — a
    wrong-constant bug; the twin recomputes the backward as-of over
    the correct sides."""
    from lcmap_firebird_spark.operators.asof import asof_join_backward
    from lcmap_firebird_spark.queries import extended as QE

    name = "j7_asof_join"
    _assert_green(spark, oracle, sf_dir, name, QE)
    ev = read_table(spark, "events", sf_dir).withColumn("t_us", micros("ts"))
    errors = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "t_us", F.col("value").alias("signup_value")
    )
    mut = asof_join_backward(
        errors, signups, by=["user_id"], ts_col="t_us",
        right_value_cols=["signup_value"], order_cols=["event_id"],
    ).select("event_id", "user_id", "signup_value")
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "left filter error -> purchase")


def test_mut_j8_interval_offbyone(spark, oracle, sf_dir):
    """Range-join upper bound 30 -> 29 days: rows shipped exactly 30
    days after their order exist (2 at sf0.001), so group aggregates
    move."""
    from lcmap_firebird_spark.queries import extended as QE

    name = "j8_range_join"
    _assert_green(spark, oracle, sf_dir, name, QE)
    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 29 DAYS"))
    )
    mut = (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_shipped_30d"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "interval 30 -> 29 days")


def test_mut_a10_missing_pivot_value(spark, oracle, sf_dir):
    """A pivot-values list missing one event type — schema diverges.
    AUDIT FINDING (r9, kept on record): at sf0.001 every user has all
    5 event types, so dropping the COALESCE(0) null-fill is
    UNDETECTABLE there (no missing cell exists) — the detectable
    mutation class for this slot is the declared value list."""
    from lcmap_firebird_spark.queries import extended as QE

    name = "a10_pivot"
    _assert_green(spark, oracle, sf_dir, name, QE)
    ev = read_table(spark, "events", sf_dir)
    types = [t for t in QE.EVENT_TYPES if t != "view"]
    mut = ev.groupBy("user_id").pivot("event_type", types).count()
    mut = mut.select(
        "user_id", *[F.coalesce(t, F.lit(0)).alias(t) for t in types]
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "pivot values missing 'view'")


def test_mut_sql1_sql2_constants(spark, oracle, sf_dir):
    """Raw-SQL front door: shifted shipdate constant in Q3 and a
    wrong subquery priority constant in the correlated-subquery slot.

    AUDIT FINDING (r9, kept on record): Q3's LIMIT 10 narrows the
    twin's visibility to the top-10 revenue groups — a ONE-MONTH
    shipdate drift (72 affected lineitems at sf0.001) stayed GREEN
    because none of them belong to a top-10 order. Small predicate
    drift on heavily-limited outputs is a blind spot of the slot
    itself (both engines agree on the drifted query, so correctness
    is not at risk — but a regression confined to non-top rows would
    not surface through sql1). The mutation below drifts a full year
    to cross the visible region."""
    from lcmap_firebird_spark.catalog import register_views
    from lcmap_firebird_spark.queries import extended as QE

    for name in ("sql1_tpch_q3", "sql2_correlated_subquery"):
        _assert_green(spark, oracle, sf_dir, name, QE)
    register_views(spark, sf_dir, only=("customer", "orders", "lineitem"))
    mut1 = spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                   AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP_NTZ '1997-01-01'
          AND l_shipdate > TIMESTAMP_NTZ '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )
    _assert_red(
        spark, oracle, sf_dir, "sql1_tpch_q3", QE, mut1,
        "shipdate constant 1997 -> 1998",
    )
    mut2 = spark.sql(
        """
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders
                WHERE o_custkey = c_custkey) AS max_order,
               (SELECT COUNT(*) FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderpriority = '5-LOW') AS n_urgent
        FROM customer
        """
    )
    _assert_red(
        spark, oracle, sf_dir, "sql2_correlated_subquery", QE, mut2,
        "subquery priority 1-URGENT -> 5-LOW",
    )


def test_mut_x3_wrong_budget(spark, oracle, sf_dir):
    """The mixture slot's oracle is GENERATED from the pinned
    weights/budget constants — a Spark side composed under a
    different token budget must diverge (tests that the twin truly
    pins the constants rather than mirroring the call)."""
    from lcmap_firebird_spark.operators.mixture import compose_mixture
    from lcmap_firebird_spark.operators.sampling import train_val_test
    from lcmap_firebird_spark.operators.text import token_count
    from lcmap_firebird_spark.queries import extended as QE

    name = "x3_mixture_split"
    _assert_green(spark, oracle, sf_dir, name, QE)
    docs = read_table(spark, "documents", sf_dir)
    mixed = compose_mixture(
        docs, QE.MIX1_WEIGHTS, QE.MIX1_TOTAL_TOKENS * 2, domain_col="lang"
    )
    out = train_val_test(mixed, "doc_id", (0.8, 0.1, 0.1))
    mut = out.groupBy(
        F.col("lang").alias("domain"),
        F.col("epoch").cast("bigint").alias("epoch"),
        "split",
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("min_id"),
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "token budget x2")


# --- comparator dimensions, each proven independently -------------------------


def test_comparator_dimensions(spark, oracle, sf_dir):
    """Synthetic output-level perturbations on one green slot prove
    each compare dimension is independently live: row drop -> rows;
    column rename -> schema; single-value perturbation -> hash; and
    the multiset-preserving cross-row swap (every per-column multiset
    identical, rows misassembled) -> hash."""
    name = "j1_selective_read"
    base = QR.QUERIES[name](spark, sf_dir).toPandas()
    want = _want(oracle, name, QR)
    assert all(compare(base, want).values())

    v = compare(base.iloc[:-1], want)
    assert not v["rows_match"] and not v["hash_match"]

    v = compare(base.rename(columns={"l_quantity": "qty"}), want)
    assert not v["schema_match"] and v["rows_match"]

    bumped = base.copy()
    bumped.loc[0, "l_quantity"] = bumped.loc[0, "l_quantity"] + 1
    v = compare(bumped, want)
    assert v["rows_match"] and v["schema_match"] and not v["hash_match"]

    # cross-row swap in ONE column between rows with different values:
    # per-column multisets all unchanged — only row-wise tuples catch it
    swapped = base.copy()
    qs = swapped["l_quantity"]
    idx = qs[qs != qs.iloc[0]].index[0]
    a, b = swapped.loc[0, "l_quantity"], swapped.loc[idx, "l_quantity"]
    swapped.loc[0, "l_quantity"], swapped.loc[idx, "l_quantity"] = b, a
    # guard: the swap must actually change some row tuple
    assert not swapped.loc[[0, idx]].equals(base.loc[[0, idx]])
    v = compare(swapped, want)
    assert v["rows_match"] and v["schema_match"] and not v["hash_match"]


def test_driver_sim_imports_certified_comparator():
    """driver_sim.py must import canon/compare from oracle_compare —
    the mutation certification above is only evidence if the sim (and
    the habit of trusting its green) runs the same code."""
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "driver_sim.py",
        )
    ).read()
    assert "from oracle_compare import canon, compare" in src
