"""Multimodal query registry — binary payload plumbing over the
documents table (text bytes standing in for media payloads; the
codec layer is stubbed, the Spark plumbing is real)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators import multimodal as M


def m1_media_features(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas feature extraction; n_bytes + md5 checksum are
    oracle-checkable (UTF-8 payload ≡ text), width/height are the
    deterministic stub."""
    docs = read_table(spark, "documents", sf)
    media = M.to_media_table(docs)
    return M.extract_features(media).select("media_id", "n_bytes", "checksum")


def m2_frame_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Explode-shaped frame sampling: 1 payload → k byte-window
    'frames'; count per media item is oracle-checkable."""
    docs = read_table(spark, "documents", sf)
    media = M.to_media_table(docs)
    frames = M.frame_sample(media, every_n_bytes=64)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_frames"))


QUERIES = {
    "m1_media_features": m1_media_features,
    "m2_frame_counts": m2_frame_counts,
}

ORACLES = {
    "m1_media_features": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum
        FROM documents
    """,
    "m2_frame_counts": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
        FROM documents
    """,
}
