"""Salted join/agg: identical results to plain ops on skewed data,
with the salt actually spreading the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators.skew import salted_agg_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of hot key 1, a few of keys 2..5
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.createDataFrame(
        [(k, 0) for k in range(2, 6)], ["k", "v"]
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 6)], ["k", "name"]
    )
    plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
    salted = salted_join(skewed, dim, ["k"], salt=4).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = salted_join(skewed, dim, ["k"], salt=4, how="left")
    assert out.count() == skewed.count()
    nulls = out.filter(F.col("name").isNull()).select("k").distinct().collect()
    assert {r.k for r in nulls} == {2, 3, 4, 5}


def test_salted_agg_count_matches(spark, skewed):
    got = {r.k: r.n for r in salted_agg_count(skewed, ["k"], salt=4).collect()}
    want = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    assert got == want
