"""Bucketed-table co-location: same-key bucketed tables must join
with NO shuffle exchange — the plan-level proof of the engine's
fact⋈fact scale strategy (PLANS.md rule 1/7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    li = read_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = read_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ("l_orderkey",), 8, ("l_orderkey",))
    write_bucketed(orders, "b_orders", ("o_orderkey",), 8, ("o_orderkey",))
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # force the sort-merge path (broadcast would hide the property)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("b_lineitem")
        orders = spark.table("b_orders")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan[:2000]}"
        # and it still computes the right thing
        expected = (
            read_table(spark, "lineitem").select("l_orderkey")
            .join(
                read_table(spark, "orders").select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    # control: the same join over plain parquet requires exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_table(spark, "lineitem", sf_dir)
        orders = read_table(spark, "orders", sf_dir)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
