"""Small-file compaction: file counts shrink to the plan, content is
byte-identical, and the partitionBy layout survives."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators import maintenance as M


def _content_hash(spark, path, cols):
    df = spark.read.parquet(path).select(*cols)
    return sorted(tuple(r) for r in df.collect())


def test_compact_unpartitioned(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li")
    li = read_table(spark, "lineitem", sf_dir)
    li.repartition(40).write.parquet(path)  # fragment: 40 tiny files
    cols = sorted(li.columns)
    before_files = len(M.dataset_files(path))
    before = _content_hash(spark, path, cols)
    assert before_files == 40

    n_after = M.compact(spark, path, target_bytes=256 * 1024 * 1024)
    assert n_after < before_files / 4  # bin-packed, not just renamed
    assert _content_hash(spark, path, cols) == before
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__old__")


def test_compact_preserves_partition_layout(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ev")
    ev = read_table(spark, "events", sf_dir).withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    ).drop("ts")
    ev.repartition(12).write.partitionBy("event_type").parquet(path)
    cols = sorted(c for c in ev.columns)
    dirs_before = {
        os.path.dirname(rel) for rel, _ in M.dataset_files(path)
    }
    before = _content_hash(spark, path, cols)
    # every partition directory was fragmented into ~12 files
    assert len(M.dataset_files(path)) >= 3 * len(dirs_before)

    M.compact(
        spark, path, target_bytes=256 * 1024 * 1024,
        partition_cols=("event_type",),
    )
    files_after = M.dataset_files(path)
    dirs_after = {os.path.dirname(rel) for rel, _ in files_after}
    assert dirs_after == dirs_before  # pruning layout preserved
    per_dir: dict[str, int] = {}
    for rel, _ in files_after:
        d = os.path.dirname(rel)
        per_dir[d] = per_dir.get(d, 0) + 1
    assert max(per_dir.values()) <= 2  # bin-packed per directory
    assert _content_hash(spark, path, cols) == before


def test_plan_compaction_reports_per_directory(spark, sf_dir, tmp_path):
    path = str(tmp_path / "docs")
    docs = read_table(spark, "documents", sf_dir)
    docs.repartition(8).write.parquet(path)
    plan = M.plan_compaction(path, target_bytes=10**9)
    assert plan == {"": 1}  # tiny dataset packs into one target file
