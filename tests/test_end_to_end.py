"""Capstone: the full training-data pipeline composed end to end.

documents -> heuristic + learned quality gates -> dedup ladder ->
exact-substring cut -> token-budget mixture -> transactional lake
table (writer surface) -> streaming read -> chunk -> pack. Every
stage is an operator this repo ships; the assertions check the
invariants that survive composition (no duplicates, budget bound,
atomic table state, token conservation through packing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.lakehouse import LakeTable
from lcmap_firebird_spark.operators import text as T
from lcmap_firebird_spark.operators.classifier import train_log_odds
from lcmap_firebird_spark.operators.dedup import minhash_dedup
from lcmap_firebird_spark.operators.pipeline import (
    chunk_documents,
    pack_sequences,
)
from lcmap_firebird_spark.operators.substring import duplicate_spans
from lcmap_firebird_spark.plans import corpus as C


def test_full_pipeline_composes(spark, sf_dir, tmp_path):
    docs = read_table(spark, "documents", sf_dir)

    # learned gate self-trained from a cheap heuristic label
    labeled = docs.withColumn(
        "label", (T.token_count("text") >= 20).cast("int")
    )
    weights, bias = train_log_odds(labeled, n_buckets=512)

    prepared = C.prepare_corpus(
        docs,
        languages=("en", "fr"),
        jaccard_threshold=0.3,
        quality_model=(weights, bias, 0.4),
        substring_k=8,
        mixture={"src0": 2.0, "src1": 1.0, "src2": 1.0},
        mixture_tokens=6000,
    ).cache()
    n = prepared.count()
    assert n > 0

    # invariants: no surviving near-dups, no surviving cross-doc
    # spans, mixture budget per domain honored
    assert minhash_dedup(prepared, threshold=0.3, exact_first=False).count() == 0
    assert duplicate_spans(prepared, k=8).count() == 0
    toks = {
        r["source"]: r["t"]
        for r in prepared.groupBy("source")
        .agg(F.sum(T.token_count("text")).alias("t"))
        .collect()
    }
    budgets = {"src0": 3000, "src1": 1500, "src2": 1500}
    for dom, got in toks.items():
        assert got <= budgets[dom]

    # transactional landing zone through the writer surface
    from lcmap_firebird_spark.sources.lake import LakeDataSource

    try:
        spark.dataSource.register(LakeDataSource)
    except Exception:
        pass
    root = str(tmp_path / "corpus_lake")
    prepared.drop("epoch").write.format("lake").mode("append").option(
        "path", root
    ).option("keys", "doc_id").save()
    t = LakeTable(spark, root)
    assert t.snapshot().count() == n
    assert t.latest_version() == 1  # ONE atomic commit

    # stream the table out and feed the packing stage
    stream = (
        spark.readStream.format("lake").option("path", root).load()
    )
    name = "e2e_corpus_stream"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(name)
    assert streamed.count() == n

    chunks = chunk_documents(streamed, chunk_tokens=32, overlap=0)
    packs = pack_sequences(chunks, seq_len=128)
    # token conservation: every chunk token lands in exactly one pack
    total_chunk_tokens = chunks.agg(F.sum("n_tokens")).first()[0]
    total_pack_tokens = packs.agg(F.sum("n_tokens")).first()[0]
    assert total_pack_tokens == total_chunk_tokens
    assert packs.filter(F.col("n_tokens") > 128).count() == 0
    prepared.unpersist()
