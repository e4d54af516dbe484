"""Streaming incremental dedup — foreachBatch over a document stream.

Wires the Structured Streaming surface to the incremental-dedup
operator (operators/incremental.py). Each micro-batch of newly
ingested documents

  1. computes its signature table (content fingerprint + MinHash)
     ONCE,
  2. emits the near-dup pairs TOUCHING the batch (batch × corpus ∪
     batch × batch) to an append-style pairs sink,
  3. MERGEs the signatures into the persisted store the next batch
     will read.

This is the standing-corpus shape at 100 TB: per trigger the corpus
contributes one scan of ~150-byte signature rows (prunable to the
batch's band buckets when the store is partitioned by band), only the
batch pays shingle + hashing cost, and a full-corpus re-dedup never
runs. `foreachBatch` — not a stateful streaming operator — is the
right Spark primitive here because the state (the signature store)
must outlive the streaming checkpoint, stay queryable by batch jobs,
and be shared with the batch ladder; Spark's state store is private
to one streaming query and sized for per-key scalars, not a corpus
table.

Exactly-once without Delta: every batch's outputs are written to
directories derived from `batch_id` with mode("overwrite") —
  store:  <work>/store/v{batch_id+1}   (reads v{batch_id})
  pairs:  <work>/pairs/b{batch_id}
  corpus: <work>/corpus/b{batch_id}
so a replayed batch (restart after crash) deterministically rewrites
the same bytes instead of appending duplicates, and no directory is
ever rewritten while a lazy plan is reading it. Version-numbered
store snapshots also give Delta-style time travel for free; swap the
parquet dirs for Delta/Iceberg tables in production and `v{n}`
becomes table versions.

Invariant (tests/test_streaming_dedup.py): streaming the corpus in N
file-chunks and unioning the emitted pairs reproduces the one-shot
batch pipeline exactly — the operators/incremental.py determinism
argument carried through the streaming runner, including across a
stop + new-files + resume cycle (the checkpoint replays nothing and
processes only unseen files).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.incremental import (
    incremental_pairs,
    merge_batch,
    signature_table,
)


def documents_schema() -> StructType:
    """Static schema for the documents stream source (streams can't
    infer; matches /root/testdata documents.parquet)."""
    return StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
            StructField("source", StringType(), True),
            StructField("n_chars", LongType(), True),
        ]
    )


def signature_schema(num_perm: int = 16) -> StructType:
    """Schema of operators/incremental.signature_table — used to
    construct the empty store before the first batch."""
    return StructType(
        [StructField("doc_id", LongType(), True), StructField("fp", LongType(), True)]
        + [StructField(f"h{p}", LongType(), True) for p in range(num_perm)]
        + [StructField("n_sh", LongType(), True)]
    )


def stream_documents(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = 1,
    glob: str = "*.parquet",
) -> DataFrame:
    """File-source stream over a directory of document parquet files
    (one micro-batch per file at the default max_files_per_trigger=1
    — each ingest drop becomes one incremental-dedup batch)."""
    reader = spark.readStream.schema(documents_schema()).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def _store_path(work_dir: str, version: int) -> str:
    return f"{work_dir}/store/v{version:06d}"


def _read_store(
    spark: SparkSession, work_dir: str, version: int, num_perm: int
) -> DataFrame:
    """Store snapshot `version`, or the empty store for version 0 /
    a never-written or UNCOMMITTED path (first batch, a replay racing
    ahead of the snapshot its crashed predecessor didn't finish, or a
    crash mid-write that left part-files without the `_SUCCESS`
    marker — markers.is_committed, the package's one commit-marker
    predicate; a bare parquet read would silently return a partial
    store)."""
    from .markers import is_committed

    p = _store_path(work_dir, version)
    if version > 0 and is_committed(p):
        return spark.read.parquet(p)
    return spark.createDataFrame([], signature_schema(num_perm))


def continuous_dedup(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    rows: int = 4,
    k: int = 3,
    max_files_per_trigger: int | None = 1,
):
    """Start (available-now) the streaming incremental-dedup query.

    Returns the StreamingQuery; callers awaitTermination(). Restarts
    with the same `work_dir` resume from the checkpoint: already-seen
    source files are not reprocessed, and the store/pairs/corpus
    directories advance idempotently by batch_id (see module doc).
    """
    docs = stream_documents(spark, source_dir, max_files_per_trigger)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text").persist()
        # 1. corpus append (verification text source), idempotent dir
        batch.write.mode("overwrite").parquet(f"{work_dir}/corpus/b{batch_id:06d}")
        # 2. previous store snapshot + this batch's signatures (once)
        store = _read_store(spark, work_dir, batch_id, num_perm)
        sigs = signature_table(batch, num_perm, k).persist()
        # 3. pairs touching the batch — corpus side scans signatures,
        #    verification re-reads text for candidate docs only
        corpus = spark.read.parquet(f"{work_dir}/corpus/b*")
        pairs = incremental_pairs(
            corpus,
            store,
            batch,
            threshold=threshold,
            num_perm=num_perm,
            bands=bands,
            rows=rows,
            k=k,
            batch_sigs=sigs,
        )
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{work_dir}/pairs/b{batch_id:06d}")
        # 4. next snapshot: store ∪ batch (batch wins doc_id collisions)
        merge_batch(store, sigs).write.mode("overwrite").parquet(
            _store_path(work_dir, batch_id + 1)
        )
        sigs.unpersist()
        batch.unpersist()

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{work_dir}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def read_pairs(spark: SparkSession, work_dir: str) -> DataFrame:
    """All near-dup pairs emitted by COMMITTED batches so far.
    `_SUCCESS`-gated: this reader may run concurrently with the
    stream, and a batch crashed (or still in flight) mid-write must
    not surface a partial pair set as if it were complete."""
    import os as _os

    root = f"{work_dir}/pairs"
    all_dirs = sorted(
        _os.path.join(root, d)
        for d in (_os.listdir(root) if _os.path.isdir(root) else [])
        if d.startswith("b")
    )
    from .markers import is_committed

    dirs = [d for d in all_dirs if is_committed(d)]
    if dirs:
        return spark.read.parquet(*dirs)
    if all_dirs:
        # only UNCOMMITTED partials exist: the correct answer is the
        # EMPTY pair set (reading the bare glob would surface the
        # partial data the _SUCCESS gate exists to exclude); the
        # partial footers still provide the schema via limit(0)
        return spark.read.parquet(*all_dirs).limit(0)
    # nothing at all: preserve the historical error shape
    return spark.read.parquet(f"{root}/b*")


# driver-side foreachBatch closures reference this module; keep the
# foreign-cwd pickling contract uniform (CLAUDE.md invariant 2)
import pyspark  # noqa: E402

pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])
