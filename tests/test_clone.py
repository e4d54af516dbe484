"""Shallow clone (LakeTable.clone): zero-copy table forks that
reference the source's live files by absolute path, with independent
logs afterwards. Verifies: snapshot identity, write independence in
both directions, deletion-vector transfer, COW materialization into
the clone's own data dir, column-mapping transfer, bloom reuse,
clone-of-clone, and vacuum isolation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.lakehouse import LakeTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _own_files(t):
    d = os.path.join(t.root, "data")
    return {f for f in os.listdir(d) if f.endswith(".parquet")}


@pytest.fixture()
def source(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)],
        "id long, name string, val double",
    ).repartition(4, "id")
    return LakeTable.create(
        spark, str(tmp_path / "src"), base, key_cols=["id"]
    )


def test_clone_is_zero_copy_and_identical(spark, source, tmp_path):
    c = source.clone(str(tmp_path / "c1"))
    assert _rows(c.snapshot()) == _rows(source.snapshot())
    assert _own_files(c) == set()  # ZERO data copied
    # every live reference is absolute into the source
    assert all(
        os.path.isabs(r["path"]) for r in c._live()[0]
    )


def test_writes_are_independent_both_ways(spark, source, tmp_path):
    c = source.clone(str(tmp_path / "c2"))
    c.append(
        spark.createDataFrame(
            [(500, "c500", 1.0)], "id long, name string, val double"
        )
    )
    source.append(
        spark.createDataFrame(
            [(600, "s600", 2.0)], "id long, name string, val double"
        )
    )
    assert c.snapshot().count() == 101
    assert source.snapshot().count() == 101
    assert c.snapshot().filter("id = 600").count() == 0
    assert source.snapshot().filter("id = 500").count() == 0
    # the clone's append landed in its OWN data dir
    assert len(_own_files(c)) >= 1
    # COW merge on the clone rewrites the hit file locally; the
    # source file stays live in the SOURCE's log
    src_live_before = {r["path"] for r in source._live()[0]}
    c.merge(
        spark.createDataFrame(
            [(7, "SEVEN", -7.0)], "id long, name string, val double"
        )
    )
    assert {r["path"] for r in source._live()[0]} == src_live_before
    assert {r["id"]: r["name"] for r in c.snapshot().collect()}[7] == "SEVEN"
    assert {r["id"]: r["name"] for r in source.snapshot().collect()}[7] == "n7"


def test_clone_carries_deletion_vectors(spark, source, tmp_path):
    source.delete_mor("id < 10")
    c = source.clone(str(tmp_path / "c3"))
    assert c.snapshot().count() == 90
    assert c.snapshot().filter("id < 10").count() == 0
    # materializing the MOR deletes on the clone writes LOCAL files
    # and drops the absolute references for the rewritten data
    c.compact(target_rows=1000)
    assert c.snapshot().count() == 90
    assert len(_own_files(c)) >= 1
    # source unaffected, still MOR
    assert source.snapshot().count() == 90


def test_clone_after_rename_carries_mapping(spark, source, tmp_path):
    source.rename_column("val", "value")
    c = source.clone(str(tmp_path / "c4"))
    snap = c.snapshot()
    assert snap.columns == ["id", "name", "value"]
    assert snap.filter(F.col("value").isNotNull()).count() == 100
    # and the clone can rename independently
    c.rename_column("value", "v2")
    assert c.snapshot().columns == ["id", "name", "v2"]
    assert source.snapshot().columns == ["id", "name", "value"]


def test_clone_reuses_bloom_sidecars(spark, source, tmp_path):
    source.build_bloom_index()
    c = source.clone(str(tmp_path / "c5"))
    got = _rows(c.lookup(17).select("id"))
    assert got == [(17,)]


def test_cow_delete_on_clone(spark, source, tmp_path):
    """COW delete must resolve cloned (absolute-path) records against
    the scan's data/<basename> hit keys — a path-equality compare
    silently no-ops."""
    c = source.clone(str(tmp_path / "c9"))
    src_files = _own_files(source)
    v = c.delete("id < 10")
    assert c.snapshot().count() == 90
    assert c.snapshot().filter("id < 10").count() == 0
    assert v == c.latest_version()
    # source untouched, clone's rewrite local
    assert source.snapshot().count() == 100
    assert _own_files(source) == src_files
    assert len(_own_files(c)) >= 1


def test_bloom_built_on_clone_stays_local(spark, source, tmp_path):
    """build_bloom_index on a clone must write sidecars into the
    CLONE's data dir, never into the source table's directory."""
    c = source.clone(str(tmp_path / "c10"))
    src_dir_before = set(os.listdir(os.path.join(source.root, "data")))
    c.build_bloom_index()
    assert set(
        os.listdir(os.path.join(source.root, "data"))
    ) == src_dir_before
    blooms = [
        f
        for f in os.listdir(os.path.join(c.root, "data"))
        if f.endswith(".bloom")
    ]
    assert blooms  # sidecars landed locally
    assert _rows(c.lookup(33).select("id")) == [(33,)]


def test_clone_of_clone_and_vacuum_isolation(spark, source, tmp_path):
    c1 = source.clone(str(tmp_path / "c6"))
    c2 = c1.clone(str(tmp_path / "c7"))
    assert _rows(c2.snapshot()) == _rows(source.snapshot())
    # aggressive vacuum on the clones sweeps nothing of the source
    src_files_before = _own_files(source)
    c1.vacuum(keep_last=1, retention_seconds=0)
    c2.vacuum(keep_last=1, retention_seconds=0)
    assert _own_files(source) == src_files_before
    assert _rows(c2.snapshot()) == _rows(source.snapshot())
    # constraints transferred: a violating append on the clone fails
    source2 = source  # clarity
    source2.add_constraint("id_pos", "id >= 0")
    c3 = source2.clone(str(tmp_path / "c8"))
    from lcmap_firebird_spark.lakehouse import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        c3.append(
            spark.createDataFrame(
                [(-5, "bad", 0.0)], "id long, name string, val double"
            )
        )
