"""Column mapping (lakehouse.py rename_column / drop_column):
metadata-only renames and drops with stable physical names — Delta's
columnMapping design on the commit log. Verifies: no data file moves,
time travel keeps per-version names, dropped bytes never resurrect,
stats/bloom pruning track the physical identity, CDF and table_changes
line up across renames, and the DataSource read/write/pushdown paths
translate.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.lakehouse import ConstraintViolation, LakeTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(t):
    return {
        r["path"]
        for r in t._live()[0]
        if r.get("kind") != "dv"
    }


@pytest.fixture()
def table(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, f"name{i}", float(i)) for i in range(100)],
        "id long, name string, val double",
    ).repartition(4, "id")
    return LakeTable.create(
        spark, str(tmp_path / "tbl"), base, key_cols=["id"]
    )


def test_rename_is_metadata_only_and_reads_back(spark, table):
    files_before = _data_files(table)
    v = table.rename_column("val", "value")
    assert _data_files(table) == files_before  # no file touched
    snap = table.snapshot()
    assert snap.columns == ["id", "name", "value"]
    assert _rows(snap.select("id", "value")) == [
        (i, float(i)) for i in range(100)
    ]
    # time travel: the old version still reads under the OLD name
    old = table.snapshot(version=v - 1)
    assert old.columns == ["id", "name", "val"]
    # physical bytes in the files still carry the original name
    import pyarrow.parquet as pq

    f = sorted(files_before)[0]
    assert "val" in pq.read_schema(os.path.join(table.root, f)).names


def test_append_and_merge_after_rename(spark, table):
    table.rename_column("val", "value")
    table.append(
        spark.createDataFrame(
            [(200, "n200", 2.0)], "id long, name string, value double"
        )
    )
    # appending under the RETIRED logical name is rejected
    with pytest.raises(ValueError, match="val"):
        table.append(
            spark.createDataFrame(
                [(201, "x", 1.0)], "id long, name string, val double"
            )
        )
    src = spark.createDataFrame(
        [(5, "FIVE", -5.0), (300, "new", 1.0)],
        "id long, name string, value double",
    )
    table.merge(src)
    got = {r["id"]: r["value"] for r in table.snapshot().collect()}
    assert got[5] == -5.0 and got[300] == 1.0 and got[200] == 2.0
    assert len(got) == 102


def test_rename_key_column_keeps_merge_pruning(spark, table):
    table.rename_column("id", "pk")
    head = table._live()[1]
    assert head["key_cols"] == ["pk"]
    src = spark.createDataFrame(
        [(7, "SEVEN", -7.0)], "pk long, name string, val double"
    )
    before = _data_files(table)
    table.merge(src)
    # copy-on-write only rewrote the one file containing pk=7
    # (stats pruning still bites through the physical-name stats)
    after = _data_files(table)
    assert len(before - after) == 1
    assert {r["pk"]: r["name"] for r in table.snapshot().collect()}[7] == "SEVEN"


def test_drop_column_and_no_resurrection(spark, table):
    v_drop = table.drop_column("val")
    assert table.snapshot().columns == ["id", "name"]
    # time travel still reads the dropped column at old versions
    assert table.snapshot(version=v_drop - 1).columns == [
        "id", "name", "val",
    ]
    # re-adding the same logical name maps to a FRESH physical name:
    # the old bytes must read as NULL, not as the dead column's data
    table.add_column("val", "double")
    head = table._live()[1]
    assert head["column_mapping"]["val"] != "val"
    assert "val" in head["retired_cols"]
    got = table.snapshot()
    assert got.filter(F.col("val").isNotNull()).count() == 0
    # and new writes to the reborn column land + read back
    table.append(
        spark.createDataFrame(
            [(500, "n500", 99.0)], "id long, name string, val double"
        )
    )
    assert _rows(
        table.snapshot().filter("val is not null").select("id", "val")
    ) == [(500, 99.0)]


def test_rename_into_retired_logical_name(spark, table):
    """rename a->b then add a fresh 'a': the new 'a' must get a fresh
    physical name (the live physical 'val' belongs to 'value')."""
    table.rename_column("val", "value")
    table.add_column("val", "string")
    head = table._live()[1]
    assert head["column_mapping"]["value"] == "val"
    assert head["column_mapping"]["val"].startswith("val-")
    snap = table.snapshot()
    assert snap.filter(F.col("val").isNotNull()).count() == 0
    assert snap.filter(F.col("value").isNotNull()).count() == 100


def test_ddl_validation(spark, table):
    with pytest.raises(ValueError, match="no column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("val", "name")
    with pytest.raises(ValueError, match="key column"):
        table.drop_column("id")
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("nope")
    table.add_constraint("val_pos", "val >= 0")
    with pytest.raises(ValueError, match="val_pos"):
        table.rename_column("val", "value")
    with pytest.raises(ValueError, match="val_pos"):
        table.drop_column("val")
    # un-constrained columns still rename under an active constraint
    table.rename_column("name", "label")
    # and the constraint keeps enforcing after unrelated renames
    with pytest.raises(ConstraintViolation):
        table.append(
            spark.createDataFrame(
                [(900, "bad", -1.0)],
                "id long, label string, val double",
            )
        )


def test_scan_pruning_and_lookup_after_rename(spark, table):
    # re-cluster so per-file stats are tight, then rename the key
    table.cluster(["id"])
    table.rename_column("id", "pk")
    paths, total = table.pruned_paths({"pk": (0, 10)})
    assert 0 < len(paths) < total
    got = table.scan({"pk": (0, 10)})
    assert got.columns == ["pk", "name", "val"]
    assert got.count() == 11
    # bloom sidecars key on the physical name; lookup translates
    table.build_bloom_index()
    assert _rows(table.lookup(17).select("pk")) == [(17,)]


def test_bloom_built_before_rename_serves_after(spark, table):
    """Sidecars built under the ORIGINAL name must keep serving after
    a metadata-only rename: the stored key is the physical name,
    which the rename never touches (r5-verdict interaction probe)."""
    table.build_bloom_index()
    table.rename_column("id", "pk")
    assert _rows(table.lookup(23).select("pk")) == [(23,)]
    # and a bloom whose stored key does NOT match the current
    # physical key must be ignored (fail open to a stats-only scan),
    # never used to skip files — simulate the mismatch directly
    live, head = table._live()
    recs = [dict(r) for r in live if r.get("bloom")]
    assert recs, "expected bloom-carrying records"
    for r in recs:
        r["bloom"] = dict(r["bloom"]) | {"key": "some_future_key"}
    table._commit("bloom_index", recs, [], expected_head=None)
    assert _rows(table.lookup(23).select("pk")) == [(23,)]


def test_checkpoint_carries_mapping(spark, table):
    table.rename_column("val", "value")
    table.checkpoint_log()
    t2 = LakeTable(spark, table.root)
    snap = t2.snapshot()
    assert snap.columns == ["id", "name", "value"]
    assert snap.filter(F.col("value").isNotNull()).count() == 100
    # post-checkpoint DDL still works
    t2.drop_column("value")
    assert t2.snapshot().columns == ["id", "name"]


def test_table_changes_across_rename(spark, table):
    v0 = table.latest_version()
    table.rename_column("val", "value")
    table.merge(
        spark.createDataFrame(
            [(1, "ONE", -1.0)], "id long, name string, value double"
        )
    )
    ch = table.table_changes(v0)
    assert set(ch.columns) == {"id", "name", "value", "_change_type"}
    got = {
        r["_change_type"]: r["value"]
        for r in ch.filter("id = 1").collect()
    }
    assert got == {"update_preimage": 1.0, "update_postimage": -1.0}


@pytest.fixture()
def cdf_table(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, val double"
    )
    return LakeTable.create(
        spark, str(tmp_path / "cdf"), base, key_cols=["id"],
        enable_cdf=True,
    )


def test_read_cdf_across_rename(spark, cdf_table):
    t = cdf_table
    v_create = t.latest_version()
    t.merge(spark.createDataFrame([(1, -1.0)], "id long, val double"))
    t.rename_column("val", "value")
    t.merge(spark.createDataFrame([(2, -2.0)], "id long, value double"))
    # (v_create, head]: the two merges + the metadata-only rename;
    # reading from 0 would also surface the create's derived inserts
    ch = t.read_cdf(v_create)
    assert set(ch.columns) == {
        "id", "value", "_change_type", "_commit_version",
    }
    # the PRE-rename merge's change rows surface under the NEW name
    pre = {
        r["_change_type"]: r["value"]
        for r in ch.filter("id = 1").collect()
    }
    assert pre == {"update_preimage": 1.0, "update_postimage": -1.0}
    post = {
        r["_change_type"]: r["value"]
        for r in ch.filter("id = 2").collect()
    }
    assert post == {"update_preimage": 2.0, "update_postimage": -2.0}
    # DataSource batch CDF read agrees
    spark.dataSource.register(__import__(
        "lcmap_firebird_spark.sources.lake", fromlist=["LakeDataSource"]
    ).LakeDataSource)
    ds = (
        spark.read.format("lake")
        .option("path", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", v_create)
        .load()
    )
    assert _rows(ds.select(*ch.columns)) == _rows(ch)


def test_datasource_read_write_after_rename(spark, table):
    from lcmap_firebird_spark.sources.lake import LakeDataSource

    spark.dataSource.register(LakeDataSource)
    table.rename_column("val", "value")
    df = (
        spark.read.format("lake").option("path", table.root).load()
    )
    assert df.columns == ["id", "name", "value"]
    assert df.filter(F.col("value").isNotNull()).count() == 100
    # pushdown: stats are physical, filter is logical — still prunes
    table.cluster(["id"])
    pd_df = (
        spark.read.format("lake")
        .option("path", table.root)
        .option("pushdown", "true")
        .load()
    )
    assert pd_df.filter(F.col("id") <= 5).count() == 6
    # writer stages PHYSICAL names so LakeTable readers see the rows
    spark.createDataFrame(
        [(700, "n700", 7.0)], "id long, name string, value double"
    ).write.format("lake").mode("append").option(
        "path", table.root
    ).save()
    assert _rows(
        table.snapshot().filter("id = 700").select("id", "value")
    ) == [(700, 7.0)]
    import pyarrow.parquet as pq

    newest = max(
        _data_files(table),
        key=lambda p: os.path.getmtime(os.path.join(table.root, p)),
    )
    assert "val" in pq.read_schema(
        os.path.join(table.root, newest)
    ).names  # physical name in the staged file


def test_stream_fails_fast_on_renamed_plan(spark, table):
    """A stream planned under a logical name that was renamed away
    must fail at construction (non-additive change), not silently
    null-fill."""
    from pyspark.sql.types import StructType

    from lcmap_firebird_spark.sources.lake import _planned_col_map

    head = table._live()[1]
    planned = StructType.fromJson(json.loads(head["schema"]))
    table.rename_column("val", "value")
    with pytest.raises(ValueError, match="val"):
        _planned_col_map(table.root, planned)
    # the CURRENT schema resolves fine (and maps value -> val)
    head2 = table._live()[1]
    now = StructType.fromJson(json.loads(head2["schema"]))
    assert _planned_col_map(table.root, now) == (("value", "val"),)


def test_mor_deletes_and_compaction_across_rename(spark, table):
    table.rename_column("val", "value")
    table.delete_mor("value < 10")
    assert table.snapshot().count() == 90
    table.compact(target_rows=1000)
    snap = table.snapshot()
    assert snap.count() == 90
    assert snap.filter("value < 10").count() == 0
    # the compacted (post-rename) files STILL store physical names
    import pyarrow.parquet as pq

    for p in _data_files(table):
        names = pq.read_schema(os.path.join(table.root, p)).names
        assert "val" in names and "value" not in names


def test_restore_keeps_current_names(spark, table):
    v0 = table.latest_version()
    table.rename_column("val", "value")
    table.delete("value >= 50")
    table.restore(v0)
    # documented posture: restore keeps the NEWER schema (and thus
    # the newer logical names); the resurrected rows read under it
    snap = table.snapshot()
    assert snap.columns == ["id", "name", "value"]
    assert snap.count() == 100
