"""Similarity-search query registry (embeddings table).

Oracle parity relies on the quantized-integer cosine recipe (see
operators/similarity.py): dot products and norms are exact BIGINT
sums, so ranking and scores are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators import similarity as S

TOP_K = 5
N_QUERIES = 10  # query set: vec_id < 10
NUM_PLANES = 8
DIM = 64

# DuckDB fragments -----------------------------------------------------------

_QVEC = "[CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) FOR x IN embedding]"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i])) AS DOUBLE)"
    )


def _sql_cosine(a: str, b: str) -> str:
    # zero-norm guard mirrors operators/similarity.cosine_pre: a
    # vector that quantizes to all-zero scores 0.0 on BOTH engines
    # (unguarded, DuckDB emits NaN/inf where Spark's guard emits 0.0
    # — a latent value-hash break waiting for degenerate embeddings)
    denom = f"(sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"
    return (
        f"CASE WHEN {denom} = 0.0 THEN 0.0 "
        f"ELSE {_sql_dot(a, b)} / {denom} END"
    )


def _sql_plane_component(j: int) -> str:
    # i runs 1..DIM in SQL; the salt uses 0-based position (i-1) to
    # match operators.similarity._plane_component(j, i).
    return (
        f"(CAST(('0x' || substr(md5('plane:{j}:' || CAST(i - 1 AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % 2001 - 1000)"
    )


def _sql_bucket() -> str:
    terms = []
    for j in range(NUM_PLANES):
        proj = (
            f"list_sum(list_transform(generate_series(1, len(qv)),"
            f" i -> qv[i] * {_sql_plane_component(j)}))"
        )
        terms.append(
            f"CASE WHEN {proj} >= 0 THEN CAST({1 << j} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
    return " + ".join(terms)


# Queries ---------------------------------------------------------------------


def s1_knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_table(spark, "embeddings", sf)
    return S.knn_bruteforce(emb, emb.filter(F.col("vec_id") < N_QUERIES), TOP_K)


def s3_knn_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN (folds old s2: the bucket assignment is the
    first stage of this plan, and the oracle recomputes the identical
    md5-derived hyperplane buckets, so bucket parity is checked
    transitively through the k-NN output)."""
    return S.knn_lsh(read_table(spark, "embeddings", sf), TOP_K, NUM_PLANES, DIM)


def s5_ivf_knn(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN search (folds old s5_ivf_assign: the coarse-quantizer
    assignment is the first stage of this plan and the oracle
    recomputes the identical seed distances, so cell parity is
    checked transitively through the k-NN output)."""
    return S.knn_ivf(read_table(spark, "embeddings", sf), TOP_K, NUM_CELLS)


# pinned for oracle generation (operator default derives from corpus
# count); 64 keeps expected cell occupancy ~N/64 — the per-cell
# self-join volume drops 8× vs the old 8-cell demo layout
NUM_CELLS = 64


QUERIES = {
    "s1_knn_bruteforce": s1_knn_bruteforce,
    "s3_knn_lsh": s3_knn_lsh,
    "s5_ivf_knn": s5_ivf_knn,
}

ORACLES = {
    "s5_ivf_knn": f"""
        WITH seeds AS (SELECT vec_id AS seed_id, {_QVEC} AS sv
                       FROM embeddings WHERE vec_id < {NUM_CELLS}),
        corpus AS (SELECT vec_id, {_QVEC} AS qv FROM embeddings),
        assign_scored AS (
            SELECT vec_id, seed_id,
                   list_sum(list_transform(generate_series(1, len(qv)),
                       i -> (qv[i] - sv[i]) * (qv[i] - sv[i]))) AS dist
            FROM corpus, seeds
        ),
        assign_ranked AS (
            SELECT vec_id, seed_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, seed_id) AS rn
            FROM assign_scored
        ),
        e AS (
            SELECT c.vec_id, c.qv, a.cell
            FROM corpus c JOIN assign_ranked a
              ON a.vec_id = c.vec_id AND a.rn = 1
        ),
        scored AS (
            SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                   {_sql_cosine('a.qv', 'b.qv')} AS cosine
            FROM e a JOIN e b
              ON a.cell = b.cell AND a.vec_id != b.vec_id
        ),
        ranked AS (
            SELECT q_id, n_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rank
            FROM scored
        )
        SELECT q_id, n_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "s1_knn_bruteforce": f"""
        WITH q AS (SELECT vec_id AS q_id, {_QVEC} AS qv
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS n_id, {_QVEC} AS nv FROM embeddings),
        scored AS (
            SELECT q_id, n_id, {_sql_cosine('qv', 'nv')} AS cosine
            FROM c, q WHERE q_id != n_id
        ),
        ranked AS (
            SELECT q_id, n_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rank
            FROM scored
        )
        SELECT q_id, n_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "s3_knn_lsh": f"""
        WITH qe AS (SELECT vec_id, {_QVEC} AS qv FROM embeddings),
        bk AS (SELECT vec_id, qv, {_sql_bucket()} AS bucket FROM qe),
        scored AS (
            SELECT a.vec_id AS q_id, c.vec_id AS n_id,
                   {_sql_cosine('a.qv', 'c.qv')} AS cosine
            FROM bk a JOIN bk c
              ON a.bucket = c.bucket AND a.vec_id != c.vec_id
        ),
        ranked AS (
            SELECT q_id, n_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rank
            FROM scored
        )
        SELECT q_id, n_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
}
