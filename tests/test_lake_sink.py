"""Streaming -> lakehouse sink: stream-of-chunks == one-shot batch,
replayed batches are idempotent, merge mode revises earlier rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.lakehouse import LakeTable
from lcmap_firebird_spark.streaming.lake_sink import (
    committed_batch_ids,
    make_batch_sink,
    stream_to_lake,
)

SCHEMA = "k long, v double"


def _write_chunk(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def _stream(spark, src_dir):
    return spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir + "/*")


def test_stream_append_equals_one_shot(spark, tmp_path):
    src = str(tmp_path / "src")
    for i in range(3):
        _write_chunk(
            spark, src, f"c{i}", [(10 * i + j, float(j)) for j in range(5)]
        )
    root = str(tmp_path / "lake")
    q = stream_to_lake(
        _stream(spark, src), root, ["k"], str(tmp_path / "ckpt"), "append"
    )
    q.awaitTermination()
    t = LakeTable(spark, root)
    got = sorted(tuple(r) for r in t.snapshot().collect())
    want = sorted(
        (10 * i + j, float(j)) for i in range(3) for j in range(5)
    )
    assert got == want
    # one commit per micro-batch, each stamped with its batch_id
    assert len(committed_batch_ids(t)) == 3


def test_replayed_batch_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "lake")
    sink = make_batch_sink(root, ["k"], "append")
    b0 = spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA)
    b1 = spark.createDataFrame([(3, 3.0)], SCHEMA)
    sink(b0, 0)
    sink(b1, 1)
    n = LakeTable(spark, root).snapshot().count()
    # crash-replay of both batches: no duplicates
    sink(b0, 0)
    sink(b1, 1)
    t = LakeTable(spark, root)
    assert t.snapshot().count() == n == 3
    assert committed_batch_ids(t) == {0, 1}


def test_merge_mode_revises_keys(spark, tmp_path):
    root = str(tmp_path / "lake")
    sink = make_batch_sink(root, ["k"], "merge")
    sink(spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA), 0)
    # batch 1 revises k=2 and inserts k=9 (late-data revision shape)
    sink(spark.createDataFrame([(2, 20.0), (9, 9.0)], SCHEMA), 1)
    got = {
        r["k"]: r["v"]
        for r in LakeTable(spark, root).snapshot().collect()
    }
    assert got == {1: 1.0, 2: 20.0, 9: 9.0}
    # replayed revision batch changes nothing
    sink(spark.createDataFrame([(2, 20.0), (9, 9.0)], SCHEMA), 1)
    assert LakeTable(spark, root).snapshot().count() == 3


def test_stop_resume_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "lake")
    _write_chunk(spark, src, "c0", [(1, 1.0)])
    q = stream_to_lake(_stream(spark, src), root, ["k"], ckpt, "append")
    q.awaitTermination()
    v1 = LakeTable(spark, root).latest_version()
    _write_chunk(spark, src, "c1", [(2, 2.0)])
    q = stream_to_lake(_stream(spark, src), root, ["k"], ckpt, "append")
    q.awaitTermination()
    t = LakeTable(spark, root)
    assert sorted(tuple(r) for r in t.snapshot().collect()) == [
        (1, 1.0),
        (2, 2.0),
    ]
    # resume added exactly the new chunk's commit
    assert t.latest_version() == v1 + 1


def test_signature_store_on_lakehouse_merge(spark, tmp_path):
    """Cross-module integration: the incremental-dedup signature
    store persisted as a lakehouse table. N transactional merges of
    per-batch signatures reproduce the one-shot signature table
    exactly (merge semantics == operators/incremental.merge_batch:
    re-ingested doc_ids refresh their state), with every batch an
    atomic, time-travelable commit."""
    from lcmap_firebird_spark.operators.incremental import signature_table

    docs = [
        (i, f"doc number {i} body " + " ".join(f"w{i}x{j}" for j in range(8)))
        for i in range(30)
    ]
    batches = [docs[:10], docs[10:20], docs[15:30]]  # overlap re-ingests
    root = str(tmp_path / "sigstore")
    t = None
    for b in batches:
        bdf = spark.createDataFrame(b, "doc_id long, text string")
        sigs = signature_table(bdf)
        if t is None:
            t = LakeTable.create(spark, root, sigs, key_cols=["doc_id"])
        else:
            t.merge(sigs)
    all_df = spark.createDataFrame(docs, "doc_id long, text string")
    one_shot = signature_table(all_df)
    cols = sorted(one_shot.columns)
    want = sorted(
        tuple(r[c] for c in cols) for r in one_shot.collect()
    )
    got = sorted(
        tuple(r[c] for c in cols) for r in t.snapshot().collect()
    )
    assert got == want
    # the store's history is per-batch time travel
    assert t.snapshot(version=1).count() == 10


def test_cdc_mode_applies_mixed_batches(spark, tmp_path):
    root = str(tmp_path / "cdclake")
    sink = make_batch_sink(root, ["k"], "cdc")
    cdc_schema = "k long, v double, _op string"
    sink(
        spark.createDataFrame(
            [(1, 1.0, "upsert"), (2, 2.0, "upsert"), (9, 0.0, "delete")],
            cdc_schema,
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(2, 22.0, "upsert"), (1, 0.0, "delete"), (3, 3.0, "upsert")],
            cdc_schema,
        ),
        1,
    )
    t = LakeTable(spark, root)
    got = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert got == {2: 22.0, 3: 3.0}
    # replay of batch 1 is a no-op
    sink(
        spark.createDataFrame(
            [(2, 22.0, "upsert"), (1, 0.0, "delete"), (3, 3.0, "upsert")],
            cdc_schema,
        ),
        1,
    )
    assert {r["k"]: r["v"] for r in t.snapshot().collect()} == got


def test_stream_read_from_lake_tails_commits(spark, tmp_path):
    """readStream.format('lake'): the first run delivers the whole
    table, a resumed run with the same checkpoint delivers ONLY the
    rows added by commits after the consumed offset."""
    from lcmap_firebird_spark.sources.lake import LakeDataSource

    try:
        spark.dataSource.register(LakeDataSource)
    except Exception:
        pass
    root = str(tmp_path / "srctbl")
    t = LakeTable.create(
        spark,
        root,
        spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA),
        key_cols=["k"],
    )
    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "out1")

    def drain(out_dir):
        q = (
            spark.readStream.format("lake")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            tuple(r) for r in spark.read.schema(SCHEMA).parquet(out_dir).collect()
        )

    assert drain(out1) == [(1, 1.0), (2, 2.0)]
    # two more commits while the stream is down
    t.append(spark.createDataFrame([(3, 3.0)], SCHEMA))
    t.append(spark.createDataFrame([(4, 4.0)], SCHEMA))
    got = drain(out1)
    # resumed run appended exactly the two new rows
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]


def test_cdc_sink_into_cdf_table_records_per_batch_changes(spark, tmp_path):
    """The change pipeline closes end to end: CDC micro-batches apply
    through the sink onto a CDF-enabled table, and read_cdf returns
    each batch's typed change rows with its own commit version."""
    root = str(tmp_path / "lake")
    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA)
    LakeTable.create(spark, root, base, key_cols=["k"], enable_cdf=True)
    sink = make_batch_sink(root, ["k"], "cdc")
    cdc_schema = "k long, v double, _op string"
    sink(spark.createDataFrame([(2, 20.0, "upsert"), (3, 3.0, "upsert")], cdc_schema), 0)
    v_b0 = LakeTable(spark, root).latest_version()
    sink(spark.createDataFrame([(1, None, "delete")], cdc_schema), 1)
    t = LakeTable(spark, root)
    cdf = t.read_cdf(0)
    by_v = {}
    for r in cdf.collect():
        by_v.setdefault(r["_commit_version"], set()).add(
            (r["_change_type"], r["k"])
        )
    assert by_v[v_b0] == {
        ("update_preimage", 2),
        ("update_postimage", 2),
        ("insert", 3),
    }
    assert by_v[t.latest_version()] == {("delete", 1)}
    # replay of batch 0 is a no-op: no extra CDF rows appear
    sink(spark.createDataFrame([(2, 20.0, "upsert"), (3, 3.0, "upsert")], cdc_schema), 0)
    assert t.read_cdf(0).count() == cdf.count()


def test_replay_detection_is_tail_scan(spark, tmp_path):
    """The sink's replay check stops at the NEWEST batch stamp (an
    O(1) backward scan, not a full log replay per micro-batch), and
    non-stream maintenance commits between batches don't confuse
    it."""
    from lcmap_firebird_spark.streaming.lake_sink import (
        last_committed_batch_id,
    )

    root = str(tmp_path / "lake")
    sink = make_batch_sink(root, ["k"], "append")
    sink(spark.createDataFrame([(1, 1.0)], SCHEMA), 0)
    sink(spark.createDataFrame([(2, 2.0)], SCHEMA), 1)
    t = LakeTable(spark, root)
    t.compact(target_rows=1_000)  # unstamped maintenance commit
    assert last_committed_batch_id(t) == 1
    n = t.snapshot().count()
    sink(spark.createDataFrame([(1, 1.0)], SCHEMA), 0)  # replays
    sink(spark.createDataFrame([(2, 2.0)], SCHEMA), 1)
    assert LakeTable(spark, root).snapshot().count() == n == 2
    sink(spark.createDataFrame([(3, 3.0)], SCHEMA), 2)  # new batch lands
    assert LakeTable(spark, root).snapshot().count() == 3
    assert last_committed_batch_id(LakeTable(spark, root)) == 2


def test_two_streams_one_table_need_app_ids(spark, tmp_path):
    """Stream identity (Delta's txnAppId): without it a second
    stream's early batch ids satisfy the first stream's high-water
    mark; with distinct app_ids both streams land every batch."""
    from lcmap_firebird_spark.streaming.lake_sink import (
        last_committed_batch_id,
    )

    root = str(tmp_path / "lake")
    a = make_batch_sink(root, ["k"], "append", app_id="streamA")
    b = make_batch_sink(root, ["k"], "append", app_id="streamB")
    a(spark.createDataFrame([(1, 1.0)], SCHEMA), 0)
    a(spark.createDataFrame([(2, 2.0)], SCHEMA), 1)
    # stream B starts fresh at batch 0 — must NOT be skipped
    b(spark.createDataFrame([(10, 10.0)], SCHEMA), 0)
    b(spark.createDataFrame([(11, 11.0)], SCHEMA), 1)
    t = LakeTable(spark, root)
    assert t.snapshot().count() == 4
    # per-stream high-water marks are independent
    assert last_committed_batch_id(t, "streamA") == 1
    assert last_committed_batch_id(t, "streamB") == 1
    assert last_committed_batch_id(t, None) is None
    # replays of each stream are still idempotent
    a(spark.createDataFrame([(1, 1.0)], SCHEMA), 0)
    b(spark.createDataFrame([(10, 10.0)], SCHEMA), 1)
    assert t.snapshot().count() == 4


def test_bootstrap_applies_mode_discipline(spark, tmp_path):
    # merge bootstrap dedupes keys like every later batch
    root_m = str(tmp_path / "m")
    sink_m = make_batch_sink(root_m, ["k"], "merge")
    sink_m(
        spark.createDataFrame([(1, 1.0), (1, 9.0), (2, 2.0)], SCHEMA), 0
    )
    assert LakeTable(spark, root_m).snapshot().count() == 2
    # cdc bootstrap validates _op (NULL/typo must raise, not drop)
    root_c = str(tmp_path / "c")
    sink_c = make_batch_sink(root_c, ["k"], "cdc")
    cdc_schema = "k long, v double, _op string"
    with pytest.raises(ValueError, match="_op"):
        sink_c(
            spark.createDataFrame([(1, 1.0, "upsrt")], cdc_schema), 0
        )
    with pytest.raises(ValueError, match="_op"):
        sink_c(
            spark.createDataFrame([(1, 1.0, None)], cdc_schema), 0
        )
    # duplicate bootstrap upserts are ambiguous, like apply_changes
    with pytest.raises(ValueError, match="duplicate"):
        sink_c(
            spark.createDataFrame(
                [(1, 1.0, "upsert"), (1, 2.0, "upsert")], cdc_schema
            ),
            0,
        )
    # ...and so is upsert+delete of ONE key (r7 review: the old check
    # ran after the delete filter, so batch 0 silently resolved the
    # ambiguity as upsert-wins where batch 1+ would raise)
    with pytest.raises(ValueError, match="duplicate"):
        sink_c(
            spark.createDataFrame(
                [(1, 1.0, "upsert"), (1, None, "delete")], cdc_schema
            ),
            0,
        )
    sink_c(
        spark.createDataFrame(
            [(1, 1.0, "upsert"), (9, 0.0, "delete")], cdc_schema
        ),
        0,
    )
    assert {
        r["k"] for r in LakeTable(spark, root_c).snapshot().collect()
    } == {1}
