"""Multimodal query registry — binary payload plumbing over the
documents table (text bytes standing in for media payloads; the
codec layer is import-gated, the Spark plumbing is real).

Round-2 consolidation: m1 (mapInPandas feature extraction) and m2
(explode-shaped frame sampling) are one pipeline over the same media
table. The frame count left-joins with COALESCE(0), so a zero-byte
payload — which yields no sampled frames — still reports n_frames=0,
matching the oracle's ceil(n_bytes/64) (ADVICE round 1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators import multimodal as M


def m1_media_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas feature extraction + frame sampling; n_bytes, md5
    checksum, and the per-item frame count are oracle-checkable
    (UTF-8 payload ≡ text), width/height are the deterministic stub."""
    docs = read_table(spark, "documents", sf)
    media = M.to_media_table(docs)
    feats = M.extract_features(media).select("media_id", "n_bytes", "checksum")
    counts = (
        M.frame_sample(media, every_n_bytes=64)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_frames"))
    )
    return feats.join(counts, "media_id", "left").withColumn(
        "n_frames", F.coalesce("n_frames", F.lit(0).cast("bigint"))
    )


QUERIES = {
    "m1_media_pipeline": m1_media_pipeline,
}

ORACLES = {
    "m1_media_pipeline": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
        FROM documents
    """,
}
