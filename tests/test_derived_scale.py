"""End-to-end proof that the corpus-derived scale dials actually turn
(round-3 verdict item 7).

The pinned demo parameters in the query registry are oracle-checked;
these tests run the SAME operators with `prefix_bits=None` /
`num_planes=None` on synthetic skewed corpora large enough
(50k docs / 20k vectors) that the derivation picks values the demo
never uses — and then assert the two properties the derivation
exists to provide:

1. bounded block/bucket occupancy (the in-block quadratic stays
   ~target-sized even with a power-law family structure), and
2. recall against an EXACT baseline computed on the same corpus
   (all-intra-family Hamming for SimHash; brute-force cosine for
   LSH k-NN).

Everything is md5-derived — no RNG, so the measured recalls are
exact reproducible numbers, not statistical flakes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators import dedup as D
from lcmap_firebird_spark.operators import similarity as S

from .helpers import skip_unless_slow

skip_unless_slow("derived-parameter scale sweeps (~35 s)")

N_DOCS = 50_000
N_VECS = 20_000
DIM = 16


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """50k docs in a skewed family structure: 6,000 families of 8 +
    10 families of 200 (the blocking stress case). Family members
    share a 60-word core and differ in 2 unique words — tight
    near-dups (median intra-family Hamming 4 of 60 bits)."""
    base = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 48_000, F.col("id") % 6_000)
        .otherwise(6_000 + (F.col("id") - 48_000) / 200)
        .cast("bigint")
        .alias("fam"),
    )
    core = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit("c"), F.col("fam").cast("string"), j.cast("string")
                )
            ),
            1,
            6,
        ),
    )
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda j: F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit("u"), F.col("doc_id").cast("string"), j.cast("string")
                )
            ),
            1,
            6,
        ),
    )
    return base.select(
        "doc_id", "fam", F.array_join(F.concat(core, uniq), " ").alias("text")
    ).localCheckpoint(eager=True)


def test_simhash_derived_blocking_occupancy_and_recall(spark, skewed_docs):
    p = D.derive_prefix_bits(N_DOCS)
    assert p == 10  # a value the pinned demo (12) never uses

    sig = D.simhash(skewed_docs).localCheckpoint(eager=True)
    occ = (
        sig.select(F.shiftrightunsigned("simhash", 60 - p).alias("blk"))
        .groupBy("blk")
        .count()
    )
    mx, n_blocks, med = occ.agg(
        F.max("count"), F.count("*"), F.expr("percentile(count, 0.5)")
    ).collect()[0]
    # every 10-bit block materialized; the biggest block is the
    # 200-doc family (near-identical signatures MUST collapse — that
    # is how they get found) plus background, never a runaway
    assert n_blocks == 2**p
    assert mx <= 450
    assert med <= 3 * 64  # expected block ≈ n / 2^p ≈ 49

    # EXACT baseline: full intra-family Hamming (the only plausible
    # near-dup pairs; 367k pairs, computed exactly)
    ds = skewed_docs.select("doc_id", "fam")
    sa = sig.join(ds, "doc_id").select(
        F.col("doc_id").alias("doc_a"), "fam", F.col("simhash").alias("ha")
    )
    sb = sig.join(ds, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("fam").alias("f2"),
        F.col("simhash").alias("hb"),
    )
    truth = (
        sa.join(
            sb, (F.col("fam") == F.col("f2")) & (F.col("doc_a") < F.col("doc_b"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hd"),
        )
        .filter("hd <= 12")
        .localCheckpoint(eager=True)
    )
    n_truth = truth.count()
    assert n_truth > 300_000

    recalls = {}
    for rot in (1, 3):
        pairs = D.simhash_pairs(
            skewed_docs, max_hamming=12, prefix_bits=None, rotations=rot
        ).localCheckpoint(eager=True)
        hit = pairs.join(truth, ["doc_a", "doc_b"], "left_semi").count()
        recalls[rot] = hit / n_truth
    # multi-rotation strictly widens recall; 3 rotations recover the
    # bulk of the exact truth set (measured 0.414 → 0.867)
    assert recalls[1] < recalls[3]
    assert recalls[3] >= 0.8


def test_lsh_knn_derived_planes_occupancy_and_recall(spark):
    planes = S.derive_num_planes(N_VECS)
    assert planes == 9  # not the pinned demo default of 8

    # 2,000 clusters of 10: center ± small jitter, all md5-derived
    def h(expr, lo, hi):
        return (
            F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("bigint")
            % (hi - lo)
        ) + lo

    emb = (
        spark.range(N_VECS)
        .select(F.col("id").alias("vec_id"), (F.col("id") % 2_000).alias("c"))
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: (
                    h(
                        F.concat_ws(
                            ":", F.lit("ctr"), F.col("c").cast("string"),
                            d.cast("string"),
                        ),
                        -500,
                        500,
                    )
                    + h(
                        F.concat_ws(
                            ":", F.lit("jit"), F.col("vec_id").cast("string"),
                            d.cast("string"),
                        ),
                        -5,
                        5,
                    )
                ).cast("double"),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )

    occ = S.lsh_buckets(emb, num_planes=None, dim=DIM).groupBy("bucket").count()
    mx, n_buckets, med = occ.agg(
        F.max("count"), F.count("*"), F.expr("percentile(count, 0.5)")
    ).collect()[0]
    # hyperplane buckets are data-dependent (not all 2^9 fill), but
    # occupancy stays target-sized: no runaway bucket
    assert n_buckets >= 2 ** (planes - 2)
    assert mx <= 10 * 64
    assert med <= 3 * 64

    lsh = S.knn_lsh(
        emb, top_k=1, num_planes=None, dim=DIM, num_tables=3
    ).localCheckpoint(eager=True)
    # every vector has a same-cluster sibling in some shared bucket
    assert lsh.select("q_id").distinct().count() == N_VECS

    queries = emb.filter(F.col("vec_id") % 400 == 0)  # 50 spread queries
    bf = {
        r.q_id: r.n_id
        for r in S.knn_bruteforce(emb, queries, top_k=1).collect()
    }
    got = {
        r.q_id: r.n_id
        for r in lsh.join(
            queries.select(F.col("vec_id").alias("q_id")), "q_id", "left_semi"
        ).collect()
    }
    match = sum(1 for q, n in bf.items() if got.get(q) == n)
    # measured 50/50 on this deterministic corpus; keep headroom
    assert match / len(bf) >= 0.9


def test_substring_spans_at_50k_docs_exact_and_bounded(spark):
    """The k-gram inverted index at corpus scale: 1,000 of 50,000
    docs share a verbatim 16-token boilerplate passage (the licence-
    header shape substring dedup exists for). The flagged positions
    must be EXACTLY the planted spans — no quadratic pair structure
    exists anywhere in the plan, so a 20x hotter gram costs 20x rows,
    not 400x."""
    from lcmap_firebird_spark.operators.substring import duplicate_spans

    boiler = " ".join(f"lic{j}" for j in range(16))
    rows = []
    for i in range(50_000):
        body = " ".join(f"d{i}w{j}" for j in range(24))
        if i % 50 == 0:  # 1,000 docs carry the passage at offset 5
            toks = body.split(" ")
            text = " ".join(toks[:5]) + " " + boiler + " " + " ".join(toks[5:])
        else:
            text = body
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(docs, k=8).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    want = {(i, 5, 21) for i in range(0, 50_000, 50)}
    assert got == want
    # every span is the single maximal merge (16 tokens, 9 grams)
    assert {r.n_grams for r in spans} == {9}
