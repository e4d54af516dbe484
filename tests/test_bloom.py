"""Bloom semi-join pruning: exact equivalence to the plain semi-join,
no false negatives, bounded false-positive rate, and a shuffle-free
probe stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators import bloom as B


def _ids(spark, sf_dir):
    """A runtime-built id set: customers with an open order — the
    shape the optimizer's own runtime filter can't always see."""
    return (
        read_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )


def test_bloom_semi_join_equals_exact_semi_join(spark, sf_dir):
    cust = read_table(spark, "customer", sf_dir)
    ids = _ids(spark, sf_dir)
    got = sorted(
        r.c_custkey
        for r in B.bloom_semi_join(cust, ids, ["c_custkey"]).collect()
    )
    want = sorted(
        r.c_custkey for r in cust.join(ids, "c_custkey", "left_semi").collect()
    )
    assert got == want and len(want) > 0


def test_no_false_negatives_and_bounded_false_positives(spark, sf_dir):
    li = read_table(spark, "lineitem", sf_dir)
    ids = (
        read_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 200_000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
    )
    bitmap, m, k = B.bloom_build(ids, ["l_orderkey"], fpp=0.01)
    pruned = B.bloom_prune(li, bitmap, ["l_orderkey"], m, k)

    members = li.join(ids, "l_orderkey", "left_semi")
    n_rows, n_members = li.count(), members.count()
    n_pruned = pruned.count()
    # no false negatives: every member row survives the prune
    assert members.join(pruned, li.columns, "left_anti").count() == 0
    # false positives bounded: survivors beyond the members are at
    # most ~5x the 1% target of the non-member population (slack for
    # hash clustering at small m)
    assert n_pruned - n_members <= max(50, 0.05 * (n_rows - n_members))


def test_multi_column_key(spark, sf_dir):
    ps = read_table(spark, "part", sf_dir).select("p_partkey").limit(200)
    li = read_table(spark, "lineitem", sf_dir)
    ids = li.join(ps, li.l_partkey == ps.p_partkey, "left_semi").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    got = B.bloom_semi_join(li, ids, ["l_orderkey", "l_partkey"]).count()
    want = li.join(ids, ["l_orderkey", "l_partkey"], "left_semi").count()
    assert got == want > 0


def test_probe_stage_is_shuffle_free(spark, sf_dir):
    """The pruned scan must not shuffle the big side: the only
    exchange below the probe filter is the 1-row bitmap broadcast."""
    li = read_table(spark, "lineitem", sf_dir)
    ids = _ids(spark, sf_dir).select(F.col("c_custkey").alias("l_orderkey"))
    bitmap, m, k = B.bloom_build(ids, ["l_orderkey"], fpp=0.01)
    bitmap = bitmap.localCheckpoint(eager=True)  # isolate the probe plan
    plan = (
        B.bloom_prune(li, bitmap, ["l_orderkey"], m, k)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    shuffles = [
        ln for ln in plan.splitlines() if re.search(r"Exchange (hash|range)", ln)
    ]
    assert shuffles == [], shuffles


def test_bloom_no_false_negatives_across_int_widths(spark):
    """xxhash64 hashes a 4-byte int differently from the same value
    as bigint — without type canonicalization an ids frame typed int
    probed against a bigint big side loses true members silently."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from lcmap_firebird_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")  # bigint
    ids = spark.createDataFrame(
        [(i,) for i in range(0, 1000, 7)],
        StructType([StructField("doc_id", IntegerType())]),
    )
    got = bloom_semi_join(big, ids, ["doc_id"]).count()
    want = big.join(ids, "doc_id", "left_semi").count()
    assert got == want == len(range(0, 1000, 7))


def test_bloom_refuses_uncanonicalizable_key_mismatch(spark):
    """r11 review: int-vs-bigint widens away (test above), but a key
    pair whose CANONICAL hash types differ — string ids against a
    bigint big side — would hash true members to different positions:
    silent FALSE NEGATIVES, while the plain semi-join the operator
    promises row-identity with would have inserted an implicit cast.
    The operator must refuse loudly instead."""
    import pytest

    from lcmap_firebird_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 100).withColumnRenamed("id", "doc_id")  # bigint
    ids = spark.createDataFrame(
        [(str(i),) for i in range(0, 100, 7)], "doc_id string"
    )
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom_semi_join(big, ids, ["doc_id"])
    # casting one side explicitly restores the exact semantics
    fixed = bloom_semi_join(
        big, ids.selectExpr("CAST(doc_id AS BIGINT) AS doc_id"), ["doc_id"]
    ).count()
    assert fixed == len(range(0, 100, 7))


def test_bloom_missing_key_column_raises_descriptively(spark):
    """r12 (r11 ADVICE): a key column absent from a frame must raise
    the operator's descriptive ValueError naming the column and the
    frame, not a bare KeyError from the dtype lookup — the mismatch
    guard exists to be loud."""
    import pytest

    from lcmap_firebird_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    ids = spark.range(0, 5).withColumnRenamed("id", "other_id")
    with pytest.raises(ValueError, match="'doc_id' absent from ids"):
        bloom_semi_join(big, ids, ["doc_id"])
    with pytest.raises(ValueError, match="'nope' absent from big\\+ids"):
        bloom_semi_join(big, ids, ["nope"])
