"""Regressions from the round-7 review of sources/lake.py:

1. CDF reads spanning a drop_column + add_column of the SAME logical
   name must null-fill the reborn column for old change rows (match
   LakeTable.read_cdf's physical-identity matching) — never resurrect
   the dead column's bytes.
2. A failed FIRST write through format('lake') must leave the path
   fresh (no committed empty table pinned to the failed job's
   schema) so a corrected write can retry cleanly.
3. A typo'd option('keys', ...) naming an absent column must fail at
   plan time instead of freezing broken key_cols into entry 0.
"""

from __future__ import annotations

import os

import pytest

from lcmap_firebird_spark.lakehouse import LakeTable

SCHEMA = "id long, name string, val double"


@pytest.fixture()
def registered(spark):
    from lcmap_firebird_spark.sources.lake import LakeDataSource

    try:
        spark.dataSource.register(LakeDataSource)
    except Exception:
        pass
    return spark


def test_cdf_read_null_fills_reborn_column(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "reborn")
    t = LakeTable.create(
        spark,
        root,
        spark.createDataFrame([(i, f"n{i}", float(i)) for i in range(10)], SCHEMA),
        key_cols=["id"],
        enable_cdf=True,
    )
    # v1 stages a cdf file CARRYING logical column 'val' (double)
    t.delete_mor("id = 3")
    v_old = t.latest_version()
    # kill 'val', then re-add the SAME logical name as a new type —
    # a fresh physical identity; the old cdf file's 'val' is dead
    t.drop_column("val")
    t.add_column("val", "string")
    t.append(
        spark.createDataFrame(
            [(100, "new", "live-string")], "id long, name string, val string"
        )
    )

    got = (
        spark.read.format("lake")
        .option("path", root)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    old_rows = got.filter(f"_commit_version = {v_old}").collect()
    assert old_rows, "the old cdf commit must still stream its rows"
    # the reborn 'val' never existed when v_old committed: NULL — the
    # dead double column's bytes must NOT surface as strings
    assert all(r["val"] is None for r in old_rows)
    # and the library twin agrees when projecting into the SAME
    # (head) logical space — read_cdf(0, v_old) would instead target
    # v_old's schema, where the OLD 'val' legitimately carries 3.0
    lib = {
        (r["id"], r["val"])
        for r in t.read_cdf(0).filter(f"_commit_version = {v_old}").collect()
    }
    assert {(r["id"], r["val"]) for r in old_rows} == lib
    # new rows still carry the live string column
    new = got.filter("id = 100").collect()
    assert new and all(r["val"] == "live-string" for r in new)


def test_failed_first_write_leaves_path_retryable(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "poison")

    from pyspark.sql import functions as F

    @F.udf("long")
    def boom(x):
        raise RuntimeError("task failure")

    bad = spark.range(5).select(boom("id").alias("id"), F.lit("x").alias("name"))
    with pytest.raises(Exception):
        bad.write.format("lake").mode("append").save(root)
    # the failed job must NOT have committed a table at the path
    txn = os.path.join(root, "_txn")
    assert not os.path.isdir(txn) or not any(
        f.endswith(".json") for f in os.listdir(txn)
    ), "failed first write left a committed (empty) table behind"

    # retry with a CORRECTED (different) schema — must succeed, which
    # the old plan-time bootstrap made impossible
    good = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    good.write.format("lake").option("keys", "id").mode("append").save(root)
    t = LakeTable(spark, root)
    assert sorted(tuple(r) for r in t.snapshot().collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
    ]
    assert t._live()[1]["key_cols"] == ["id"]


def test_keys_option_validated_at_plan_time(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "badkeys")
    df = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    with pytest.raises(Exception, match="keys"):
        df.write.format("lake").option("keys", "idd").mode("append").save(root)
    # nothing committed — the path stays fresh for a corrected write
    assert not os.path.isdir(os.path.join(root, "_txn")) or not any(
        f.endswith(".json") for f in os.listdir(os.path.join(root, "_txn"))
    )
    df.write.format("lake").option("keys", "id").mode("append").save(root)
    assert LakeTable(spark, root).snapshot().count() == 1
