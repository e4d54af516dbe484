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

from .helpers import skip_unless_slow

skip_unless_slow("comparator mutation sweep over live queries (~115 s; synth twin stays in the default run)")


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


def test_mut_sql1_unlimited_closes_topk_blindness(spark, oracle, sf_dir):
    """Close the r9 audit's surviving mutation class OUTSIDE the
    registry (r9 VERDICT next-round #4): the registry slot keeps its
    LIMIT-10 driver contract, but this test compares the SAME Q3 plan
    and its DuckDB twin with the limit stripped — so predicate drift
    confined to non-top rows becomes catchable.

    The twin text derives from the registry's own oracle string
    (strip-LIMIT, not a re-typed copy), so it tracks any future slot
    edit. Proven: baseline green on the full result set, then the
    EXACT documented surviving mutation — a one-month shipdate shift
    (72 lineitems at sf0.001, none in a top-10 order) — turns RED."""
    from lcmap_firebird_spark.catalog import register_views
    from lcmap_firebird_spark.queries import extended as QE

    twin = QE.ORACLES["sql1_tpch_q3"]
    assert "LIMIT 10" in twin  # the slot's contract this test derives from
    twin_unlimited = twin.replace("LIMIT 10", "")

    def q3_spark(shipdate):
        register_views(spark, sf_dir, only=("customer", "orders", "lineitem"))
        return spark.sql(
            f"""
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                       AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP_NTZ '1997-01-01'
              AND l_shipdate > TIMESTAMP_NTZ '{shipdate}'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            """
        )

    want = oracle.execute(twin_unlimited).fetchdf()
    assert len(want) > 10, "unlimited twin must see past the top-10"
    base = compare(q3_spark("1997-01-01").toPandas(), want)
    assert all(base.values()), f"unlimited sql1 baseline not green: {base}"
    mut = compare(q3_spark("1997-02-01").toPandas(), want)
    assert not all(mut.values()), (
        "HOLE STILL OPEN: one-month shipdate drift stayed green even "
        "without the LIMIT — the full-result comparison must see it"
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


# --- quantized / iterative twins (r10 candidate #2, pulled into r9) ----------
# These twins are GENERATED from pinned constants, so a joint
# query+twin bug would most plausibly hide here: every mutation
# perturbs the SPARK-side constant while the oracle keeps the
# registry's, proving the twin truly pins it.


def test_mut_d3_shingle_and_threshold(spark, oracle, sf_dir):
    """MinHash-LSH verified pairs: shingle width changes every
    n_common/jaccard value; a threshold crossing the occupied score
    region changes the row set (same bimodal-corpus caveat as d2)."""
    name = "d3_minhash_lsh"
    _assert_green(spark, oracle, sf_dir, name, QD)
    docs = read_table(spark, "documents", sf_dir)
    mut_k = D.minhash_dedup(
        docs, threshold=QD.JACCARD_T, num_perm=QD.NUM_PERM,
        bands=QD.BANDS, rows=QD.ROWS, k=QD.K + 1,
    )
    _assert_red(spark, oracle, sf_dir, name, QD, mut_k, "shingle k + 1")
    mut_t = D.minhash_dedup(
        docs, threshold=0.95, num_perm=QD.NUM_PERM,
        bands=QD.BANDS, rows=QD.ROWS, k=QD.K,
    )
    _assert_red(spark, oracle, sf_dir, name, QD, mut_t, "threshold 0.3 -> 0.95")


def test_mut_d5_hamming_budget(spark, oracle, sf_dir):
    """SimHash blocked pairs: halving the Hamming budget drops every
    pair with distance in (10, 20] (thousands exist at sf0.001)."""
    name = "d5_simhash_pairs"
    _assert_green(spark, oracle, sf_dir, name, QD)
    mut = D.simhash_pairs(
        read_table(spark, "documents", sf_dir),
        max_hamming=QD.HAMMING_MAX - 10,
        bits=QD.SIMHASH_BITS,
        prefix_bits=QD.PREFIX_BITS,
    )
    _assert_red(spark, oracle, sf_dir, name, QD, mut, "max_hamming 20 -> 10")


def test_mut_d6_eps(spark, oracle, sf_dir):
    """SemDeDup: eps 0.6 -> 0.05 raises the drop threshold above the
    corpus's max within-cell cosine (~0.49), so the 18 dropped docs
    at sf0.001 all flip back to keepers."""
    from lcmap_firebird_spark.operators.semdedup import semdedup
    from lcmap_firebird_spark.queries.dedup import SEM_CELLS

    name = "d6_semdedup"
    _assert_green(spark, oracle, sf_dir, name, QD)
    mut = semdedup(
        read_table(spark, "embeddings", sf_dir), eps=0.05, num_cells=SEM_CELLS
    ).select("vec_id", "cell", F.col("rk").cast("int").alias("rk"), "is_keeper")
    _assert_red(spark, oracle, sf_dir, name, QD, mut, "eps 0.6 -> 0.05")


def test_mut_d7_threshold(spark, oracle, sf_dir):
    """Cluster + PageRank output under a pair-graph threshold that
    breaks near-dup edges apart: cluster ids and keeper flags move.
    (An ITERATION-count mutation would stay green here by structure:
    the registry corpus's components are cliques, where integer
    PageRank is stationary from round 1 — the known documented
    degeneracy; discrimination is pinned on a degree-asymmetric
    graph in tests/test_graph.py.)"""
    name = "d7_clusters_pagerank"
    _assert_green(spark, oracle, sf_dir, name, QD)
    mut = D.minhash_clusters(
        read_table(spark, "documents", sf_dir),
        threshold=0.95, num_perm=QD.NUM_PERM, bands=QD.BANDS,
        rows=QD.ROWS, k=QD.K, pagerank_iters=QD.PR_ITERS,
    )
    _assert_red(spark, oracle, sf_dir, name, QD, mut, "threshold 0.3 -> 0.95")


def test_mut_d8_span_k(spark, oracle, sf_dir):
    """Substring spans: k-gram width + 1 changes span boundaries (45
    spans exist at sf0.001)."""
    from lcmap_firebird_spark.operators import substring as SUB
    from lcmap_firebird_spark.queries.dedup import SPAN_K

    name = "d8_substring_spans"
    _assert_green(spark, oracle, sf_dir, name, QD)
    mut = SUB.duplicate_spans(
        read_table(spark, "documents", sf_dir), k=SPAN_K + 1
    ).select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        "n_grams",
    )
    _assert_red(spark, oracle, sf_dir, name, QD, mut, "span k 8 -> 9")


def test_mut_t_family_constants(spark, oracle, sf_dir):
    """BM25 k1, NB smoothing alpha, LM add-k each perturbed — the
    quantized integer scores must diverge from the twins generated
    under the pinned constants."""
    from lcmap_firebird_spark.operators import text as T
    from lcmap_firebird_spark.operators.classifier import nb_quantized
    from lcmap_firebird_spark.operators.perplexity import nll_quantized
    from lcmap_firebird_spark.operators.retrieval import bm25_quantized
    from lcmap_firebird_spark.queries import text as QT
    from lcmap_firebird_spark.queries.text import BM25_TERMS

    for name in ("t1_token_stats", "t2_lang_id_nb"):
        _assert_green(spark, oracle, sf_dir, name, QT)
    docs = read_table(spark, "documents", sf_dir)

    # t1: rebuild with k1 + 0.3 (496/500 docs hit a query term)
    toks = T.tokens("text")
    sum_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    bm25 = bm25_quantized(
        docs.select("doc_id", "text"), BM25_TERMS, k1=1.5
    ).select("doc_id", "bm25_q", "n_hit_terms")
    stats = docs.select(
        "doc_id",
        T.char_count("text").cast("bigint").alias("n_chars_m"),
        T.token_count("text").cast("bigint").alias("n_tokens"),
        T.distinct_token_count("text").cast("bigint").alias("n_distinct"),
        F.when(
            T.token_count("text") > 0,
            sum_len.cast("double") / T.token_count("text").cast("double"),
        ).otherwise(F.lit(0.0)).alias("avg_token_len"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        F.when(
            T.token_count("text") > 0,
            T.bpe_token_count("text").cast("double") / T.token_count("text"),
        ).otherwise(F.lit(0.0)).alias("tokens_per_word"),
    )
    _assert_red(
        spark, oracle, sf_dir, "t1_token_stats", QT,
        stats.join(bm25, "doc_id", "left"), "bm25 k1 + 0.3",
    )

    # t2: NB alpha 1.0 -> 2.0
    scored = nb_quantized(
        docs.select("doc_id", "lang", "text"),
        label_pred=F.col("lang") == "en",
        alpha=2.0,
    )
    mut2 = scored.select(
        "doc_id", "lang", T.language_id("text").alias("pred_lang"),
        "nb_q", (F.col("nb_q") >= 0).alias("nb_en"),
    )
    _assert_red(spark, oracle, sf_dir, "t2_lang_id_nb", QT, mut2, "NB alpha 2.0")

    # t3: LM add-k 0.1 -> 0.2 — rebuild only the nll leg, reuse the
    # registry query's quality-feature leg by swapping the join side
    _assert_green(spark, oracle, sf_dir, "t3_quality_fingerprint", QT)
    base = QT.QUERIES["t3_quality_fingerprint"](spark, sf_dir).drop(
        "lm_nll_q", "n_bigrams"
    )
    nll = nll_quantized(
        docs.select("doc_id", "text", "lang"),
        target_pred=F.col("lang") == "en",
        k=0.2,
    ).select("doc_id", "lm_nll_q", "n_bigrams")
    _assert_red(
        spark, oracle, sf_dir, "t3_quality_fingerprint", QT,
        base.join(nll, "doc_id", "left"), "LM add-k 0.2",
    )


def test_mut_similarity_constants(spark, oracle, sf_dir):
    """ANN family: top-k off-by-one (rows), plane count (bucket
    granularity), and IVF cell count (assignment granularity)."""
    from lcmap_firebird_spark.operators import similarity as S
    from lcmap_firebird_spark.queries import similarity as QS

    emb = read_table(spark, "embeddings", sf_dir)
    for name in ("s1_knn_bruteforce", "s3_knn_lsh", "s5_ivf_knn"):
        _assert_green(spark, oracle, sf_dir, name, QS)
    mut1 = S.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") < QS.N_QUERIES), QS.TOP_K - 1
    )
    _assert_red(spark, oracle, sf_dir, "s1_knn_bruteforce", QS, mut1, "k - 1")
    mut3 = S.knn_lsh(emb, QS.TOP_K, 12, QS.DIM)
    _assert_red(spark, oracle, sf_dir, "s3_knn_lsh", QS, mut3, "planes 8 -> 12")
    mut5 = S.knn_ivf(emb, QS.TOP_K, 128)
    _assert_red(spark, oracle, sf_dir, "s5_ivf_knn", QS, mut5, "cells 64 -> 128")


def test_mut_u3_u5_constants(spark, oracle, sf_dir):
    """Sessionization gap and the CCD kernel's exposed dials
    (min_obs) perturbed — the flagship family's twins must notice."""
    from lcmap_firebird_spark.functions.dates import EPOCH_ORDINAL
    from lcmap_firebird_spark.operators.segmentation import (
        ccd_segments,
        sessionize,
        threshold_segments,
    )
    from lcmap_firebird_spark.queries import timeseries as QTS

    for name in ("u3_sessionize_threshold", "u5_ccd_segments"):
        _assert_green(spark, oracle, sf_dir, name, QTS)

    ev = read_table(spark, "events", sf_dir)
    s = sessionize(ev, ["user_id"], "ts", 15, order_cols=["event_id"])
    sessions = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_obs"),
            micros(F.min("ts")).alias("start_us"),
            micros(F.max("ts")).alias("end_us"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("metric"),
        )
        .select(
            F.lit("session").alias("kind"),
            "user_id",
            F.col("session_id").cast("bigint").alias("seg_id"),
            "start_us", "end_us", "n_obs", "metric",
        )
    )
    ev_us = ev.withColumn("t_us", micros("ts"))
    segments = threshold_segments(
        ev_us, ["user_id"], "t_us", "value", QTS.LEVEL_T,
        order_cols=["event_id"],
    ).select(
        F.lit("threshold").alias("kind"),
        "user_id",
        F.col("segment_id").cast("bigint").alias("seg_id"),
        F.col("seg_start").alias("start_us"),
        F.col("seg_end").alias("end_us"),
        "n_obs",
        F.col("avg_value").alias("metric"),
    )
    _assert_red(
        spark, oracle, sf_dir, "u3_sessionize_threshold", QTS,
        sessions.unionByName(segments), "gap 30 -> 15 min (22 boundary gaps)",
    )

    evd = ev.select(
        "user_id",
        (
            (micros("ts") / F.lit(86_400_000_000)).cast("bigint")
            + F.lit(EPOCH_ORDINAL)
        ).alias("t"),
        F.col("value"),
    )
    daily = evd.groupBy("user_id", "t").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v")
    )
    seg = ccd_segments(daily, ["user_id"], "t", "v", min_obs=12, chi=3.0)
    mut5 = seg.select(
        "user_id", "sday", "eday", "bday", "sdate", "edate", "chprob",
        F.element_at("coef", 1).alias("c0"),
        "intercept", "rmse", "magnitude",
        F.col("n_obs").cast("bigint").alias("n_obs"),
    )
    _assert_red(spark, oracle, sf_dir, "u5_ccd_segments", QTS, mut5, "min_obs 6 -> 12")


def test_mut_ml1_artifact_drift(spark, oracle, sf_dir):
    """ml1: the twin is generated from models/ml1_rf.json — a drifted
    artifact (one root threshold nudged) scored on the Spark side
    must diverge from the oracle built from the checked-in one."""
    import copy as _copy

    from lcmap_firebird_spark.operators.rf_replay import classify, load_model
    from lcmap_firebird_spark.queries import ml as QM

    name = "ml1_rf_classify"
    _assert_green(spark, oracle, sf_dir, name, QM)
    drifted = _copy.deepcopy(load_model())

    def nudge(node):
        if "thr" in node:
            node["thr"] += 0.5
            return True
        return ("pred" not in node) and (nudge(node["left"]) or nudge(node["right"]))

    assert sum(nudge(t) for t in drifted["trees"]) == len(drifted["trees"])
    emb = read_table(spark, "embeddings", sf_dir)
    mut = classify(emb, drifted).select("vec_id", "predicted_label", "votes_top")
    _assert_red(spark, oracle, sf_dir, name, QM, mut, "all root thresholds + 0.5")


def test_mut_streaming_constants(spark, oracle, sf_dir):
    """Streaming slots: tumbling width, session gap (22 boundary gaps
    at sf0.001), dedup key set, and the join's event-type constant.
    AUDIT FINDING (r9): st4's 1-hour join window has NO boundary
    pair at sf0.001 (no purchase lands 30-60 min after a signup), so
    a window-width mutation is undetectable there — the committed
    mutation perturbs the event-type constant instead."""
    from lcmap_firebird_spark.queries import streaming as QST
    from lcmap_firebird_spark.streaming import events as ST

    for name in QST.QUERIES:
        _assert_green(spark, oracle, sf_dir, name, QST)
    stream = ST.stream_events(spark, sf_dir)
    mut1 = ST.run_available_now(
        ST.tumbling_counts(stream, "2 hours", QST.WATERMARK), spark,
        mode="complete",
    )
    _assert_red(spark, oracle, sf_dir, "st1_tumbling_counts", QST, mut1, "window 1h -> 2h")
    stream = ST.stream_events(spark, sf_dir)
    mut2 = ST.run_available_now(
        ST.session_counts(stream, "15 minutes", QST.WATERMARK), spark,
        mode="append",
    )
    _assert_red(spark, oracle, sf_dir, "st2_session_windows", QST, mut2, "gap 30 -> 15 min")
    stream = ST.stream_events(spark, sf_dir)
    mut3 = ST.run_available_now(
        ST.dedup_keys(stream, ["user_id"], QST.WATERMARK), spark, mode="append"
    )
    _assert_red(spark, oracle, sf_dir, "st3_stream_dedup", QST, mut3, "dedup keys drop event_type")
    stream = ST.stream_events(spark, sf_dir)
    # wrong-source-filter bug class: clicks relabeled as purchases
    # upstream of the join — a different (much larger) left side
    relabeled = stream.withColumn(
        "event_type",
        F.when(F.col("event_type") == "click", "purchase")
        .when(F.col("event_type") == "purchase", "click")
        .otherwise(F.col("event_type")),
    )
    mut4 = ST.run_available_now(
        ST.purchases_after_signup(relabeled, "1 hour", QST.WATERMARK),
        spark,
        mode="append",
    )
    _assert_red(spark, oracle, sf_dir, "st4_stream_stream_join", QST, mut4, "purchase <-> click swap")


# --- remaining slots: every registry query mutation-certified ----------------


def test_mut_p1_p5_projection(spark, oracle, sf_dir):
    """p1: dropped rename step -> schema red. p5: slice 3 -> 2 -> the
    posexploded row count shrinks."""
    from lcmap_firebird_spark.operators.vectors import dedensify, densify
    from lcmap_firebird_spark.queries import extended as QE

    name = "p1_conform_project"
    _assert_green(spark, oracle, sf_dir, name, QR)
    li = read_table(spark, "lineitem", sf_dir)
    extra = li.withColumn("extra", F.lit(1))
    out = R.conform(extra, ["l_orderkey", "l_linenumber", "l_quantity", "l_tax"])
    _assert_red(
        spark, oracle, sf_dir, name, QR, R.drop(out, "l_tax"),
        "rename l_quantity -> qty dropped",
    )
    name = "p5_array_ops"
    _assert_green(spark, oracle, sf_dir, name, QE)
    emb = read_table(spark, "embeddings", sf_dir)
    dense = densify(emb, ["embedding", "label"], "features", compat=True)
    back = dedensify(dense, "features", "farr")
    mut = back.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", -1).alias("last_val"),
        F.element_at("farr", 1).alias("f0"),
        F.element_at("farr", 2).alias("f1"),
        F.posexplode(F.slice("embedding", 1, 2)).alias("pos", "head_val"),
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "slice 3 -> 2")


def test_mut_a6_dropped_grouping_member(spark, oracle, sf_dir):
    """Multi-dim agg with the GROUPING SETS member dropped — a whole
    op family silently missing from the union."""
    name = "a6_multidim_agg"
    _assert_green(spark, oracle, sf_dir, name, QR)
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
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
    _assert_red(
        spark, oracle, sf_dir, name, QR, rollup.unionByName(cube),
        "GROUPING SETS member dropped",
    )


def test_mut_f5_f6_scalar_functions(spark, oracle, sf_dir):
    """Scalar-function slots: substring width off-by-one; JSON path
    pointed at a missing key."""
    from lcmap_firebird_spark.queries import extended as QE

    name = "f5_string_functions"
    _assert_green(spark, oracle, sf_dir, name, QE)
    mut = QE.QUERIES[name](spark, sf_dir).withColumn(
        "prefix8", F.substring(F.col("prefix8"), 1, 7)
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "substring 8 -> 7")
    name = "f6_semistructured"
    _assert_green(spark, oracle, sf_dir, name, QE)
    ev = read_table(spark, "events", sf_dir)
    base = QE.QUERIES[name](spark, sf_dir).drop("k_str")
    mut = base.join(
        ev.select(
            "event_id", F.get_json_object("props", "$.missing").alias("k_str")
        ),
        "event_id",
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "JSON path $.k -> $.missing")


def test_mut_j9_wrong_key(spark, oracle, sf_dir):
    from lcmap_firebird_spark.queries import extended as QE

    name = "j9_parts_suppliers"
    _assert_green(spark, oracle, sf_dir, name, QE)
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    mut = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_partkey % 100 == supp.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "supplier joined on wrong key")


def test_mut_m1_s4_kernels(spark, oracle, sf_dir):
    """Arrow-kernel slots: frame-sampling stride doubled; the
    external-fetch fake emitting one fewer row per id."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from lcmap_firebird_spark.operators import multimodal as M
    from lcmap_firebird_spark.queries import extended as QE
    from lcmap_firebird_spark.queries import multimodal as QM2
    from lcmap_firebird_spark.sources.external import fetch_explode

    name = "m1_media_pipeline"
    _assert_green(spark, oracle, sf_dir, name, QM2)
    docs = read_table(spark, "documents", sf_dir)
    media = M.to_media_table(docs)
    feats = M.extract_features(media).select("media_id", "n_bytes", "checksum")
    counts = (
        M.frame_sample(media, every_n_bytes=128)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_frames"))
    )
    mut = feats.join(counts, "media_id", "left").withColumn(
        "n_frames", F.coalesce("n_frames", F.lit(0).cast("bigint"))
    )
    _assert_red(spark, oracle, sf_dir, name, QM2, mut, "frame stride 64 -> 128")

    name = "s4_external_fetch"
    _assert_green(spark, oracle, sf_dir, name, QE)
    ids = read_table(spark, "nation", sf_dir).select("n_nationkey")

    def fake_fetch(row):
        k = row["n_nationkey"]
        return [{"n_nationkey": k, "i": i, "val": k * 100 + i} for i in range(3)]

    schema = StructType(
        [
            StructField("n_nationkey", IntegerType(), False),
            StructField("i", IntegerType(), False),
            StructField("val", LongType(), False),
        ]
    )
    mut = fetch_explode(ids, fake_fetch, schema, max_concurrency=2)
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "fetch explode 4 -> 3 rows/id")


def test_mut_x2_ordering_contract(spark, oracle, sf_dir):
    """The O2 array-ordering contract: assembling over NEGATED
    timestamps (descending order) re-pairs every position."""
    from lcmap_firebird_spark.operators.timeseries import assemble
    from lcmap_firebird_spark.queries import timeseries as QTS

    name = "x2_assemble_series"
    _assert_green(spark, oracle, sf_dir, name, QTS)
    ev = read_table(spark, "events", sf_dir).select(
        "user_id", (-micros("ts")).alias("t_us"), "value"
    )
    wide = assemble(ev, ["user_id"], "t_us", ["value"])
    mut = (
        wide.select(
            "user_id",
            F.size("t_uss").alias("n_obs"),
            F.posexplode(F.arrays_zip("t_uss", "values")).alias("pos", "z"),
        ).select(
            "user_id",
            "n_obs",
            "pos",
            (-F.col("z.t_uss")).alias("t_us"),
            F.col("z.values").alias("value"),
        )
    )
    _assert_red(spark, oracle, sf_dir, name, QTS, mut, "descending assembly order")


def test_mut_x4_fractions(spark, oracle, sf_dir):
    """Stratified-sample fractions perturbed (en 0.5 -> 0.4); the
    dsir leg rides unchanged from the registry query."""
    from lcmap_firebird_spark.operators.sampling import stratified_hash_sample
    from lcmap_firebird_spark.queries import extended as QE

    name = "x4_dsir_stratified"
    _assert_green(spark, oracle, sf_dir, name, QE)
    docs = read_table(spark, "documents", sf_dir)
    fracs = dict(QE.X4_FRACTIONS) | {"en": 0.4}
    strat = stratified_hash_sample(docs, "lang", "doc_id", fracs).select(
        F.lit("strat").alias("method"),
        "doc_id",
        "lang",
        F.lit(None).cast("bigint").alias("skey"),
    )
    dsir = QE.QUERIES[name](spark, sf_dir).filter(F.col("method") == "dsir")
    _assert_red(
        spark, oracle, sf_dir, name, QE, strat.unionByName(dsir),
        "en fraction 0.5 -> 0.4",
    )


def test_mut_x5_wrong_update_set(spark, oracle, sf_dir):
    """The transactional MERGE slot under a wrong update filter
    (MACHINERY instead of BUILDING) — different balances zeroed."""
    import atexit
    import shutil
    import tempfile

    from lcmap_firebird_spark.lakehouse import LakeTable
    from lcmap_firebird_spark.queries import extended as QE

    name = "x5_upsert"
    _assert_green(spark, oracle, sf_dir, name, QE)
    cust = read_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    updates = (
        cust.filter(F.col("c_mktsegment") == "MACHINERY")
        .withColumn("c_acctbal", F.lit(0.0))
        .unionByName(
            spark.createDataFrame(
                [
                    (1_000_001, "NEW Customer#1", "BUILDING", 1.0),
                    (1_000_002, "NEW Customer#2", "MACHINERY", 2.0),
                ],
                ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
            )
        )
    )
    root = tempfile.mkdtemp(prefix="x5_mut_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    table = LakeTable.create(spark, root, cust, key_cols=["c_custkey"])
    table.merge(updates)
    _assert_red(
        spark, oracle, sf_dir, name, QE, table.snapshot(),
        "update set BUILDING -> MACHINERY",
    )


def test_mut_z1_column_order(spark, oracle, sf_dir):
    """Morton interleave with the column order swapped — every zval
    with differing partkey/suppkey bits moves.
    AUDIT FINDING (r9, kept on record): a BIT-WIDTH mutation
    (16 -> 8) is UNDETECTABLE at sf0.001 — zvalue masks raw values
    and every key there fits in 8 bits, so the extra positions
    interleave zeros identically (first divergence needs a key
    >= 256, i.e. sf0.01's partkey range)."""
    from lcmap_firebird_spark.operators.zorder import zvalue
    from lcmap_firebird_spark.queries import extended as QE

    name = "z1_zorder"
    _assert_green(spark, oracle, sf_dir, name, QE)
    li = read_table(spark, "lineitem", sf_dir)
    z = zvalue(["l_suppkey", "l_partkey"], bits=16)
    mut = li.select(
        "l_orderkey",
        "l_linenumber",
        z.alias("zval"),
        F.shiftright(z, 24).alias("zbucket"),
    )
    _assert_red(spark, oracle, sf_dir, name, QE, mut, "interleave column order swapped")


def test_mut_d1_fingerprint_input(spark, oracle, sf_dir):
    """Exact dedup: fingerprint computed over case-folded text — a
    wrong-normalization bug; every fp value moves.
    AUDIT FINDING (r9, kept on record): the corpus has NO exact
    duplicates at sf0.001 (500/500 distinct texts), so d1's min-id
    KEEPER RULE is unobservable through this slot (every group has
    one member); the rule is pinned by operator tests instead."""
    from lcmap_firebird_spark.operators.text import fingerprint

    name = "d1_exact_dedup"
    _assert_green(spark, oracle, sf_dir, name, QD)
    docs = read_table(spark, "documents", sf_dir)
    mut = (
        docs.select("doc_id", fingerprint(F.upper("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )
    _assert_red(spark, oracle, sf_dir, name, QD, mut, "fingerprint over upper(text)")


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

    # r12: dtype-KIND drift with identical VALUES — the exact r5
    # failure class (DuckDB HUGEINT → float64 vs Spark int64; 5 ==
    # 5.0, so hash_match alone is blind to it, while the round
    # driver's schema check is not). kinds_match must go red alone.
    int_cols = [c for c in base.columns if base[c].dtype.kind == "i"]
    assert int_cols, "slot lost its integer column — pick another"
    drifted = base.copy()
    drifted[int_cols[0]] = drifted[int_cols[0]].astype("float64")
    v = compare(drifted, want)
    assert not v["kinds_match"], "int->float64 kind drift not caught"
    assert v["rows_match"] and v["schema_match"] and v["hash_match"], (
        "kind drift must be caught by kinds_match ALONE (values are "
        "equal by design)"
    )
    # representation-detail tolerance: a narrower int is the SAME kind
    narrowed = base.copy()
    narrowed[int_cols[0]] = narrowed[int_cols[0]].astype("int32")
    assert all(compare(narrowed, want).values())


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
