"""Behavioral tests: as-of join semantics (tolerance, no-match
nulls, at-or-before boundary) and the external-fetch source's
throttle + explode contract."""

from __future__ import annotations

from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from lcmap_firebird_spark.operators.asof import asof_join_backward
from lcmap_firebird_spark.sources.external import fetch_explode


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 150, "c"), (3, 100, "d")],
        ["key", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (2, 160, 30.0)],
        ["key", "t", "quote"],
    )
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.quote
        for r in asof_join_backward(left, right, ["key"], "t", ["quote"]).collect()
    }
    assert out["a"] == 10.0  # exact-ts match counts ("at or before")
    assert out["b"] == 20.0  # latest of two predecessors
    assert out["c"] is None  # right row is AFTER left ts
    assert out["d"] is None  # key has no right rows


def test_asof_tolerance_bounds_lookback(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.quote
        for r in asof_join_backward(
            left, right, ["key"], "t", ["quote"], tolerance=4
        ).collect()
    }
    assert out["a"] == 10.0  # gap 0 <= 4
    assert out["b"] is None  # gap 5 > 4 → outside tolerance


def test_fetch_explode_shape_and_throttle(spark):
    ids = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("j", IntegerType(), False),
            StructField("payload", LongType(), False),
        ]
    )

    def fake(row):
        return [{"id": row["id"], "j": j, "payload": row["id"] * 10 + j} for j in range(3)]

    out = fetch_explode(ids, fake, schema, max_concurrency=2)
    # throttle: the fetch stage runs at exactly 2 concurrent partitions
    assert out.rdd.getNumPartitions() == 2
    rows = sorted((r.id, r.j, r.payload) for r in out.collect())
    assert len(rows) == 30  # 1 id → 3 records, exploded
    assert rows[0] == (0, 0, 0) and rows[-1] == (9, 2, 92)


def test_fetch_explode_widens_underpartitioned_ids(spark):
    """r12 stale-surface review: coalesce only REDUCES partitions, so
    a 1-partition ids frame (the typical collected id list) with
    max_concurrency=8 silently ran SERIAL — an 8x fetch-throughput
    loss nobody sees. The throttle must hold in both directions."""
    ids = spark.createDataFrame([(i,) for i in range(16)], ["id"]).coalesce(1)
    schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("j", IntegerType(), False),
        ]
    )

    def fake(row):
        return [{"id": row["id"], "j": j} for j in range(2)]

    out = fetch_explode(ids, fake, schema, max_concurrency=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 32

    import pytest

    with pytest.raises(ValueError, match="max_concurrency"):
        fetch_explode(ids, fake, schema, max_concurrency=0)


def test_asof_carries_whole_row_not_per_column(spark):
    """The newest right row wins AS A ROW: a genuinely-NULL value in
    it must be attached as NULL (not skipped for an older row's
    value), and multiple value columns must never stitch a chimera
    from different right rows."""
    from lcmap_firebird_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 12)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, 42.0, 0.0), (1, 10, None, None)],
        "k long, ts long, a double, b double",
    )
    out = asof_join_backward(
        left, right, by=["k"], ts_col="ts", right_value_cols=["a", "b"]
    ).collect()
    assert len(out) == 1
    # the ts=10 row is the match; its NULLs are the answer
    assert out[0]["a"] is None and out[0]["b"] is None
    # chimera check: ts=10 has a set, b NULL; ts=5 has both set —
    # output must be exactly the ts=10 row's values
    right2 = spark.createDataFrame(
        [(1, 5, 0.5, 5.0), (1, 10, 1.5, None)],
        "k long, ts long, a double, b double",
    )
    out2 = asof_join_backward(
        left, right2, by=["k"], ts_col="ts", right_value_cols=["a", "b"]
    ).collect()
    assert out2[0]["a"] == 1.5 and out2[0]["b"] is None
    # colliding value-column names are rejected loudly
    import pytest as _pytest

    left2 = left.withColumn("a", left["ts"] * 1.0)
    with _pytest.raises(ValueError, match="collide"):
        asof_join_backward(
            left2, right, by=["k"], ts_col="ts", right_value_cols=["a"]
        )
