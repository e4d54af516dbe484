"""Dedup query registry (documents table).

The MinHash/SimHash oracle SQL is generated from the same parameters
as the Spark operators (perm salts, band layout, bit counts), so both
engines compute the identical md5-derived hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators import dedup as D
from .text import TOK

NUM_PERM, BANDS, ROWS, K = 16, 4, 4, 3
JACCARD_T = 0.3
SIMHASH_BITS = 60
HAMMING_MAX = 20
PREFIX_BITS = 12


def d1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return D.exact_dedup(read_table(spark, "documents", sf))


def d2_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return D.jaccard_pairs(read_table(spark, "documents", sf), JACCARD_T, k=K)


def d3_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return D.minhash_dedup(
        read_table(spark, "documents", sf),
        threshold=JACCARD_T,
        num_perm=NUM_PERM,
        bands=BANDS,
        rows=ROWS,
        k=K,
    )


def d5_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash signature + blocked Hamming pairs (folds old d4: the
    oracle recomputes the identical signatures, so signature parity is
    checked transitively through the pair output)."""
    return D.simhash_pairs(
        read_table(spark, "documents", sf),
        max_hamming=HAMMING_MAX,
        bits=SIMHASH_BITS,
        prefix_bits=PREFIX_BITS,
    )


SEM_EPS = 0.6  # pinned for oracle bite on the synthetic embeddings
SEM_CELLS = 16  # deterministic id<16 seeds (s5 uses 8; 16 here
# keeps within-cell pair counts bounded at bench scale: occupancy
# ~31 at sf0.01 / ~312 at sf0.1 — the operator's default derives
# the cell count from the corpus, this pin exists for the oracle)


def d6_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup labels over the embeddings table (round-5
    consolidation: the semantic-dedup operator takes the old
    d6_embedding_neardup slot — a full labeled-corpus output replaces
    a 1-row pair list; LSH-blocked near-dup pairs keep driver
    coverage through s3_knn_lsh's identical bucket machinery, plus
    tests). eps is pinned demo-large because the synthetic embedding
    geometry is near-orthogonal (max within-cell cosine ≈ 0.49);
    real deployments run eps ≈ 0.03-0.05. The oracle replays the
    whole pipeline — quantized assignment, centroid-distance rank,
    order-based drop rule — in exact ints + identical double ops."""
    from ..operators.semdedup import semdedup

    return semdedup(
        read_table(spark, "embeddings", sf),
        eps=SEM_EPS,
        num_cells=SEM_CELLS,
    ).select(
        "vec_id", "cell", F.col("rk").cast("int").alias("rk"), "is_keeper"
    )


SPAN_K = 8


def d8_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact substring dedup: maximal k-token spans duplicated across
    documents (distributed form of Lee et al. 2022's suffix-array
    pass — see operators/substring.py). Integer-exact, full oracle."""
    from ..operators import substring as SUB

    spans = SUB.duplicate_spans(
        read_table(spark, "documents", sf), k=SPAN_K
    )
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        "n_grams",
    )


PR_ITERS = 6  # fixed — the iteration count is part of the semantics


def d7_clusters_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Production dedup output: connected components over the MinHash
    near-dup graph → (doc_id, cluster_id, is_keeper) for EVERY
    document (singletons keep themselves), PLUS `pr_q` — quantized
    integer PageRank centrality over the symmetrized rep pair graph
    (round-5 consolidation: the iterative graph family earns a driver
    oracle on d7's slot; fixed PR_ITERS-round (= 6) integer
    arithmetic, unrolled-CTE DuckDB twin). Iterative min-label propagation with
    pointer jumping on DataFrames; the oracle is a recursive CTE
    computing the same component minima.

    Runs `minhash_clusters` — CC over the REP graph plus the exact-
    group membership map — which is row-identical to clustering the
    expanded d3 pair set (asserted by test_dedup_unit) without ever
    materializing member-level pairs."""
    return D.minhash_clusters(
        read_table(spark, "documents", sf),
        threshold=JACCARD_T,
        num_perm=NUM_PERM,
        bands=BANDS,
        rows=ROWS,
        k=K,
        pagerank_iters=PR_ITERS,
    )


QUERIES = {
    "d1_exact_dedup": d1_exact_dedup,
    "d2_ngram_jaccard": d2_ngram_jaccard,
    "d3_minhash_lsh": d3_minhash_lsh,
    "d5_simhash_pairs": d5_simhash_pairs,
    "d6_semdedup": d6_semdedup,
    "d7_clusters_pagerank": d7_clusters_pagerank,
    "d8_substring_spans": d8_substring_spans,
}

# ---------------------------------------------------------------------------
# oracle SQL builders

_HASH60 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
# second 60-bit slice of the same md5 — operators/dedup.hash60_hi
_HASH60_HI = "CAST(('0x' || substr(md5({expr}), 16, 15)) AS BIGINT)"

_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, {TOK} AS t FROM documents),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, len(t) - {K - 1}),
        i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS s
    FROM toks WHERE len(t) >= {K}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""

_JACCARD_TAIL = f"""
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE)
           / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {JACCARD_T}
"""


def _minhash_sig_cte() -> str:
    from ..operators.dedup import MINHASH_PRIME, perm_params

    h32 = f"({_HASH60.format(expr='s')} & 4294967295)"
    mins = []
    for p in range(NUM_PERM):
        a, b = perm_params(p)
        mins.append(
            f"min((CAST({a} AS BIGINT) * {h32} + {b}) % {MINHASH_PRIME}) AS h{p}"
        )
    joined = ",\n           ".join(mins)
    return f"sig AS (\n    SELECT doc_id,\n           {joined}\n    FROM sh GROUP BY doc_id\n)"


def _bands_cte() -> str:
    parts = []
    for b in range(BANDS):
        cols = ", ".join(
            f"CAST(h{b * ROWS + r} AS VARCHAR)" for r in range(ROWS)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band_id,"
            f" md5(concat_ws(',', {cols})) AS band_key FROM sig"
        )
    return "bands AS (\n    " + "\n    UNION ALL\n    ".join(parts) + "\n)"


def _simhash_cte() -> str:
    h = _HASH60.format(expr="tk")
    sums = ",\n           ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
toks AS (SELECT doc_id, {TOK} AS t FROM documents),
tok AS (SELECT doc_id, unnest(list_distinct(t)) AS tk FROM toks),
per_bit AS (
    SELECT doc_id,
           {sums}
    FROM tok GROUP BY doc_id
),
sh_val AS (SELECT doc_id, {value} AS simhash FROM per_bit)
"""


ORACLES = {
    "d1_exact_dedup": f"""
        WITH toks AS (SELECT doc_id, {TOK} AS t FROM documents),
        fp AS (SELECT doc_id,
                      CASE WHEN t IS NULL THEN NULL
                           ELSE CAST(('0x' || substr(md5(
                                    coalesce(array_to_string(t, ' '), '')),
                                    1, 15)) AS BIGINT) END AS fp
               FROM toks)
        SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM fp GROUP BY fp
    """,
    "d2_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        {_JACCARD_TAIL}
    """,
    "d5_simhash_pairs": f"""
        WITH {_simhash_cte()},
        blocked AS (SELECT doc_id, simhash,
                           simhash >> {SIMHASH_BITS - PREFIX_BITS} AS blk
                    FROM sh_val)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """,
}

def _d6_oracle() -> str:
    """SemDeDup twin: identical quantized assignment (exact int L2,
    ties → smallest seed), identical centroid-distance rank order,
    identical drop rule with the SAME double cosine op sequence
    (dot/(sqrt(aa)*sqrt(bb)) with a = the earlier-ranked side), and
    the threshold literal printed from the same Python double."""
    from .similarity import _QVEC, _sql_cosine

    thr = repr(1.0 - SEM_EPS)
    return f"""
        WITH seeds AS (SELECT vec_id AS seed_id, {_QVEC} AS sv
                       FROM embeddings WHERE vec_id < {SEM_CELLS}),
        corpus AS (SELECT vec_id, {_QVEC} AS qv FROM embeddings),
        assign_scored AS (
            SELECT vec_id, seed_id,
                   list_sum(list_transform(generate_series(1, len(qv)),
                       i -> (qv[i] - sv[i]) * (qv[i] - sv[i]))) AS dist
            FROM corpus, seeds
        ),
        assign_ranked AS (
            SELECT vec_id, seed_id AS cell, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, seed_id) AS rn
            FROM assign_scored
        ),
        e AS (
            SELECT c.vec_id, c.qv, a.cell, a.dist
            FROM corpus c JOIN assign_ranked a
              ON a.vec_id = c.vec_id AND a.rn = 1
        ),
        ranked AS (
            SELECT vec_id, qv, cell, dist,
                   ROW_NUMBER() OVER (PARTITION BY cell
                                      ORDER BY dist DESC, vec_id) AS rk
            FROM e
        ),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM ranked a JOIN ranked b
              ON a.cell = b.cell AND a.rk < b.rk
            WHERE {_sql_cosine('a.qv', 'b.qv')} >= {thr}
        )
        SELECT r.vec_id, r.cell, CAST(r.rk AS INT) AS rk,
               r.vec_id NOT IN (SELECT vec_id FROM dropped) AS is_keeper
        FROM ranked r
    """


ORACLES["d6_semdedup"] = _d6_oracle()

def _d8_oracle() -> str:
    """Same k-gram inverted index + island merge, in DuckDB. The
    lockstep unnests produce (pos, 120-bit gram fingerprint — two
    60-bit slices of one md5, mirroring hash60/hash60_hi) per token
    position; all arithmetic is exact integers — no quantization."""
    k = SPAN_K
    gram = "concat_ws(' ', " + ", ".join(f"t[i+{j}]" for j in range(k)) + ")"
    gfp = _HASH60.format(expr=gram)
    gfp2 = _HASH60_HI.format(expr=gram)
    return f"""
    WITH toks AS (SELECT doc_id, {TOK} AS t FROM documents),
    gp AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(t) - {k - 1}), i -> i - 1)) AS pos,
               unnest(list_transform(
                   generate_series(1, len(t) - {k - 1}), i -> {gfp})) AS gfp,
               unnest(list_transform(
                   generate_series(1, len(t) - {k - 1}), i -> {gfp2})) AS gfp2
        FROM toks WHERE len(t) >= {k}
    ),
    flag AS (SELECT gfp, gfp2 FROM gp GROUP BY gfp, gfp2
             HAVING min(doc_id) <> max(doc_id)),
    dup AS (SELECT doc_id, pos FROM gp
            WHERE EXISTS (SELECT 1 FROM flag f
                          WHERE f.gfp = gp.gfp AND f.gfp2 = gp.gfp2)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(max(pos + {k}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM dup
    ),
    grp AS (
        SELECT doc_id, pos,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM isl
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {k} AS span_end,
           COUNT(*) AS n_grams
    FROM grp GROUP BY doc_id, island
    """


ORACLES["d8_substring_spans"] = _d8_oracle()

ORACLES["d3_minhash_lsh"] = f"""
    WITH {_SHINGLES_CTE},
    {_minhash_sig_cte()},
    {_bands_cte()},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, c.n_common,
           CAST(c.n_common AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE EXISTS (SELECT 1 FROM cand
                  WHERE cand.doc_a = c.doc_a AND cand.doc_b = c.doc_b)
      AND CAST(c.n_common AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE) >= {JACCARD_T}
"""

# Connected components over the d3 pair set: recursive label
# reachability, MIN(label) per doc = component minimum — the same
# cluster ids the Spark-side pointer-jumping loop converges to.
# Plus the quantized-PageRank twin: member pairs map onto REP pairs
# (rep = min doc_id per content-fingerprint group — identical shingle
# sets make the mapped pair set ≡ the Spark-side rep_pairs), then a
# fixed number of UNROLLED iterations in pure integer arithmetic
# (`//` division) reproduce graph.pagerank_quantized bit-for-bit.


def _d7_oracle(k_iters: int, scale: int = 10**12, d: int = 85) -> str:
    fp = (
        "CASE WHEN t IS NULL THEN NULL ELSE "
        "CAST(('0x' || substr(md5(coalesce(array_to_string(t, ' '), "
        "'')), 1, 15)) AS BIGINT) END"
    )
    steps = [
        f"""pr0 AS (
        SELECT node, CAST({scale} // nn.n AS BIGINT) AS r
        FROM nodes2, nn)"""
    ]
    for i in range(1, k_iters + 1):
        steps.append(f"""pr{i} AS (
        SELECT n2.node,
               CAST(({100 - d} * {scale}) // (100 * nn.n)
                    + ({d} * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes2 n2
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.r // dg.deg) AS s
            FROM pr{i - 1} p
            JOIN deg2 dg ON dg.src = p.node
            JOIN edges2 e ON e.src = p.node
            GROUP BY e.dst
        ) c ON c.node = n2.node, nn)""")
    iters = ",\n    ".join(steps)
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({ORACLES['d3_minhash_lsh']}) t),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id),
    cc AS (
        SELECT doc_id,
               MIN(label) AS cluster_id,
               doc_id = MIN(label) AS is_keeper
        FROM reach GROUP BY doc_id),
    toks7 AS (SELECT doc_id, {TOK} AS t FROM documents),
    fpm AS (SELECT doc_id, {fp} AS fp FROM toks7),
    repm AS (SELECT doc_id,
                    MIN(doc_id) OVER (PARTITION BY fp) AS rep
             FROM fpm),
    rpe AS (SELECT DISTINCT least(ra.rep, rb.rep) AS a,
                            greatest(ra.rep, rb.rep) AS b
            FROM pairs p
            JOIN repm ra ON ra.doc_id = p.doc_a
            JOIN repm rb ON rb.doc_id = p.doc_b
            WHERE ra.rep <> rb.rep),
    edges2 AS (SELECT a AS src, b AS dst FROM rpe
               UNION ALL
               SELECT b AS src, a AS dst FROM rpe),
    nodes2 AS (SELECT DISTINCT src AS node FROM edges2),
    deg2 AS (SELECT src, COUNT(*) AS deg FROM edges2 GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes2),
    {iters}
    SELECT cc.doc_id, cc.cluster_id, cc.is_keeper,
           pr{k_iters}.r AS pr_q
    FROM cc
    LEFT JOIN repm ON repm.doc_id = cc.doc_id
    LEFT JOIN pr{k_iters} ON pr{k_iters}.node = repm.rep
"""


ORACLES["d7_clusters_pagerank"] = _d7_oracle(PR_ITERS)
