"""Streaming incremental dedup: the foreachBatch runner reproduces
the one-shot batch pipeline exactly — streaming is an execution
strategy, not a different answer — including across a stop +
new-files + resume cycle (checkpoint processes only unseen files,
store snapshots advance idempotently by batch_id)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators.dedup import minhash_dedup
from lcmap_firebird_spark.streaming import dedup_stream as S

THRESH = 0.3


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["n_common"], round(r["jaccard"], 12))
        for r in df.collect()
    }


def _write_chunk(docs, i, path):
    docs.filter(F.col("doc_id") % 3 == i).toPandas().to_parquet(str(path))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, "documents", sf_dir).cache()


def test_streaming_equals_batch_with_resume(spark, docs, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    work = str(tmp_path / "work")

    # two ingest drops -> two micro-batches (maxFilesPerTrigger=1)
    _write_chunk(docs, 0, src / "chunk_0.parquet")
    _write_chunk(docs, 1, src / "chunk_1.parquet")
    S.continuous_dedup(spark, str(src), work, threshold=THRESH).awaitTermination()

    # stop + new file + resume: only the unseen file is processed
    _write_chunk(docs, 2, src / "chunk_2.parquet")
    S.continuous_dedup(spark, str(src), work, threshold=THRESH).awaitTermination()

    emitted = S.read_pairs(spark, work)
    batch_ids = sorted(
        r["batch_id"] for r in emitted.select("batch_id").distinct().collect()
    )
    assert batch_ids == [0, 1, 2]

    got = _pairs_set(emitted.drop("batch_id"))
    want = _pairs_set(minhash_dedup(docs, threshold=THRESH, exact_first=False))
    assert got == want and len(want) > 0

    # final store snapshot holds every document's signature exactly once
    store = spark.read.parquet(S._store_path(work, 3))
    assert store.count() == docs.count()
    assert store.select("doc_id").distinct().count() == docs.count()


def test_empty_store_first_batch(spark, docs, tmp_path):
    """Batch 0 against the empty store == batch-only dedup."""
    src = tmp_path / "in"
    src.mkdir()
    work = str(tmp_path / "work")
    _write_chunk(docs, 0, src / "only.parquet")
    S.continuous_dedup(spark, str(src), work, threshold=THRESH).awaitTermination()
    sub = docs.filter(F.col("doc_id") % 3 == 0)
    got = _pairs_set(S.read_pairs(spark, work).drop("batch_id"))
    assert got == _pairs_set(minhash_dedup(sub, threshold=THRESH, exact_first=False))


def test_partial_uncommitted_dirs_are_invisible(spark, tmp_path):
    """A crash mid-write leaves part-files without Spark's _SUCCESS
    marker: the store reader must treat such a snapshot as absent and
    read_pairs must skip the batch dir (partial data must never
    surface as committed — rollup's commit-marker discipline)."""
    import os

    from lcmap_firebird_spark.streaming.dedup_stream import (
        _read_store,
        _store_path,
        read_pairs,
        signature_schema,
    )

    work = str(tmp_path / "work")
    # fabricate a partial (uncommitted) store snapshot v3
    sigs = spark.createDataFrame([], signature_schema(16))
    p = _store_path(work, 3)
    sigs.write.mode("overwrite").parquet(p)
    os.remove(os.path.join(p, "_SUCCESS"))
    got = _read_store(spark, work, 3, 16)
    assert got.count() == 0  # falls back to the empty store
    # committed snapshot is read normally
    sigs.write.mode("overwrite").parquet(_store_path(work, 4))
    assert _read_store(spark, work, 4, 16).count() == 0
    # pairs: one committed dir, one partial — only committed is read
    pairs_schema = "a long, b long, sim double, batch_id long"
    spark.createDataFrame([(1, 2, 0.9, 0)], pairs_schema).write.mode(
        "overwrite"
    ).parquet(f"{work}/pairs/b000000")
    spark.createDataFrame([(3, 4, 0.8, 1)], pairs_schema).write.mode(
        "overwrite"
    ).parquet(f"{work}/pairs/b000001")
    os.remove(f"{work}/pairs/b000001/_SUCCESS")
    got = read_pairs(spark, work).collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 2)]
