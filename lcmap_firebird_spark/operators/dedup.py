"""Deduplication operators — exact and near-dup, designed for 100 TB.

The reference's only dedup-shaped op is `select(keys).distinct()`
(ccdc/randomforest.py:67). A training-data pipeline needs the full
ladder, implemented here as pure DataFrame plans (no Python UDFs):

- exact dedup          hash-groupBy on content fingerprint
- n-gram Jaccard       shingle inverted-index join (exact pairs)
- MinHash + LSH        signature → banding → bucket join → verify
- SimHash              bitwise majority over token hashes

Scale design:
- Exact dedup is one shuffle on a 60-bit fingerprint (not the raw
  text), so the shuffle carries 8 bytes/doc, not documents.
- The Jaccard inverted-index join is quadratic per shingle bucket —
  correct at any scale only AFTER candidate pruning; that's what the
  MinHash/LSH path is for: candidates = band-bucket join (equi-join,
  shuffle on band key), verification joins only the candidate pairs.
- All hashing is md5-derived (engine-portable, seedless,
  deterministic) so results are reproducible across engines and
  re-runs — required both for the DuckDB oracle and for incremental
  dedup at scale (yesterday's signatures stay valid).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition to the session's default parallelism.

    Compact inputs (a few MB of documents) arrive as ONE parquet
    split, so explode/hash-heavy operators would run on a single
    core. The row shuffle is tiny relative to the downstream
    per-shingle work; at 100 TB inputs are already many splits and
    this becomes a cheap no-op-shaped rebalance.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in key_cols])


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (md5 hex → int).

    Portable across engines: Spark `conv(substr(md5(x),1,15),16,10)`
    ≡ DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def perm_params(p: int) -> tuple[int, int]:
    """Universal-hash coefficients for permutation p, md5-derived
    (deterministic, no RNG state). a is odd and 28-bit, so
    a·h32 + b < 2^61 — no BIGINT overflow on any engine."""
    import hashlib

    a = int(hashlib.md5(f"perm_a:{p}".encode()).hexdigest()[:7], 16) | 1
    b = int(hashlib.md5(f"perm_b:{p}".encode()).hexdigest()[:7], 16)
    return a, b


def shingles(col: str | Column = "text", k: int = 3) -> Column:
    """Distinct k-token shingles ('w1 w2 w3' strings)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(k)]  # noqa: E731
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    return F.when(F.size(toks) >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content fingerprint: one row per distinct
    content, keeping the minimum id (deterministic winner)."""
    from .text import fingerprint

    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Exploded (id, shingle) pairs — the inverted-index input."""
    df = spread(df, id_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(text_col, k)).alias("s"),
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    candidates: DataFrame | None = None,
    sh_precomputed: DataFrame | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard similarity >= threshold.

    Inverted-index join: docs sharing a shingle meet once per shared
    shingle; |A∩B| falls out of a groupBy, |A∪B| = |A|+|B|-|A∩B|.
    Jaccard is exact-integer division → bit-deterministic.

    `candidates` (doc_a, doc_b) restricts verification to LSH
    candidates — the scale path. Without it this is exact (and
    quadratic per hot shingle; fine below ~10M docs with a k large
    enough to keep buckets small).
    """
    sh = (sh_precomputed if sh_precomputed is not None
          else shingle_sets(df, id_col, text_col, k).cache())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pair_src = sh
    if candidates is not None:
        # Scale-critical ordering: restrict the shingle table to docs
        # that appear in ANY candidate pair BEFORE the self-join —
        # the quadratic enumeration then runs over the (tiny)
        # candidate universe, not the corpus.
        docs_in = (
            candidates.select(F.col("doc_a").alias("doc_id"))
            .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        pair_src = sh.join(F.broadcast(docs_in), "doc_id", "left_semi")
    a = pair_src.alias("a")
    b = pair_src.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    return out


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    k: int = 3,
    sh_precomputed: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: one column h0..h{P-1} per permutation.

    Permutation p's hash of shingle s is hash60(p || ':' || s) — a
    salted md5, so signatures are deterministic and engine-portable.
    One explode + one groupBy with P parallel min-aggregates: a
    single shuffle regardless of P.
    """
    sh = (sh_precomputed if sh_precomputed is not None
          else shingle_sets(df, id_col, text_col, k))
    # one md5 per shingle; permutations are a universal-hash family
    # (a·h32 + b) mod P — exact 63-bit integer arithmetic, so results
    # stay engine-portable while codegen shrinks ~16×.
    h32 = hash60(F.col("s")).bitwiseAND(F.lit(0xFFFFFFFF))
    tagged = sh.select("doc_id", h32.alias("_h32"))
    aggs = []
    for p in range(num_perm):
        a, b = perm_params(p)
        aggs.append(
            F.min((F.lit(a) * F.col("_h32") + F.lit(b)) % F.lit(MINHASH_PRIME))
            .alias(f"h{p}")
        )
    return tagged.groupBy("doc_id").agg(*aggs)


def lsh_candidates(
    signatures: DataFrame, bands: int = 4, rows: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on all `rows` hashes of any band
    become a candidate pair. One explode + one self-join on the band
    bucket — the join key is (band_id, md5-of-band), so the shuffle is
    tiny and uniform even when documents are skewed.
    """
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(",", *[F.col(f"h{b * rows + r}") for r in range(rows)])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    rows: int = 4,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band
    candidates → exact-Jaccard verification of candidates only.

    The shingle explode is computed ONCE and cached — signatures and
    verification both read it (the reference's persist-for-multi-
    consumer pattern, ccdc/core.py:68-72, applied to dedup)."""
    sh = shingle_sets(df, k=k).cache()
    sig = minhash_signature(df, num_perm=num_perm, k=k, sh_precomputed=sh)
    cand = lsh_candidates(sig, bands=bands, rows=rows)
    return jaccard_pairs(
        df, threshold, k=k, candidates=cand, sh_precomputed=sh
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """SimHash: per-bit majority vote over distinct-token hashes.

    60 bits (not 64) keeps the value positive in a signed BIGINT on
    every engine. One explode + one groupBy with `bits` conditional
    sums — still a single shuffle.
    """
    tok = spread(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("t"),
    )
    h = hash60(F.col("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    per_bit = tok.groupBy("doc_id").agg(*aggs)
    value = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
        range(bits),
        F.lit(0).cast("bigint"),
    )
    return per_bit.select("doc_id", value.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    bits: int = 60,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on the top
    `prefix_bits` so the self-join is per-block, not all-pairs.

    Blocking is a recall/cost dial: identical prefixes are guaranteed
    for hamming distance 0 within the prefix; production would union
    several rotated blockings. The XOR+bit_count verification is
    exact-integer → deterministic.
    """
    sh = simhash(df, bits=bits)
    blocked = sh.withColumn("blk", F.shiftright("simhash", bits - prefix_bits))
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
