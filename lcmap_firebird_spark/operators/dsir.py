"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) as DataFrame plans.

Select raw-corpus documents whose hashed-n-gram distribution looks
like a TARGET corpus (e.g. curated reference text):

1. features: unigrams + bigrams hashed into `n_buckets` counts
   (`hash60 % B` — md5-derived, engine-portable, uniform since
   2^60 ≡ 0 mod any power-of-two B);
2. fit bag-of-ngrams models on target and raw corpora — each model
   IS a (bucket, count) frame, one groupBy each, broadcastable;
3. per-doc importance weight
   log w(x) = Σ_b c_b(x)·(log p̂_target[b] − log p̂_raw[b])
   with add-k smoothing fixing both supports — one explode + one
   broadcast join + one per-doc sum;
4. sampling without replacement via Gumbel top-k: key =
   log w + g_i where g_i = −log(−log u_i) and u_i is a DETERMINISTIC
   md5-uniform of (salt, doc id) — reproducible across engines,
   layouts, and reruns, unlike RNG-state sampling. Top-k is Spark's
   TakeOrdered (per-partition heads + merge, never a full sort).

The reference has no analog; the recipe follows the public paper.
Everything is built-in expressions — zero UDFs, zero collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60
from .text import gram_array, tokens

DSIR_BUCKETS = 8192  # 2^13: hash60 % B is exactly uniform


def _doc_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per unigram/bigram occurrence, hashed.
    The gram column is staged once per row (HOF-inlining guard, same
    discipline as text.py's t3)."""
    toks = tokens(text_col)
    staged = df.select(
        F.col(id_col).alias("_id"),
        F.concat(gram_array(toks, 1), gram_array(toks, 2)).alias("_g"),
    )
    return staged.select(
        "_id", F.explode("_g").alias("_gram")
    ).select(
        "_id", (hash60(F.col("_gram")) % n_buckets).alias("bucket")
    )


def feature_counts(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, n) hashed-n-gram counts — the bag-of-ngrams 'model'
    is literally this broadcastable frame."""
    return (
        _doc_buckets(corpus, id_col, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def importance_weights(
    df: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame | None = None,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Input columns + `log_w` = Σ_b c_b(x)·(log p̂_t[b] − log p̂_r[b]),
    add-`smoothing` estimates over `n_buckets`. Documents with no
    grams get log_w = 0 (no evidence either way).

    `raw_counts=None` uses `df` itself as the raw model (the paper's
    standard setting) and SHARES one gram explode between the model
    counts and the per-doc scoring — an eager checkpoint of the
    (id, bucket) frame feeds both, halving the dominant cost."""
    import math

    k = float(smoothing)
    doc_bk = _doc_buckets(df, id_col, text_col, n_buckets)
    if raw_counts is None:
        # self-raw model: the exploded (id, bucket) frame feeds BOTH
        # the model counts and the scoring — eager checkpoint per
        # PLANS.md rule 15 (two concurrent first-readers otherwise)
        doc_bk = doc_bk.localCheckpoint(eager=True)
        raw_counts = doc_bk.groupBy("bucket").agg(
            F.count("*").alias("n")
        )
    # model totals: two 1-row aggregates (metadata-scale driver
    # actions, same posture as compose_mixture's domain counts)
    tot_t = target_counts.agg(F.sum("n")).first()[0] or 0
    tot_r = raw_counts.agg(F.sum("n")).first()[0] or 0
    # absent buckets score the smoothed floor log(k / (tot + k·B))
    floor_t = math.log(k / (tot_t + k * n_buckets))
    floor_r = math.log(k / (tot_r + k * n_buckets))

    def _logp(counts: DataFrame, tot: int, tag: str) -> DataFrame:
        return counts.select(
            "bucket",
            F.log(
                (F.col("n") + F.lit(k)) / F.lit(tot + k * n_buckets)
            ).alias(f"_lp_{tag}"),
        )

    ratios = (
        _logp(target_counts, tot_t, "t")
        .join(_logp(raw_counts, tot_r, "r"), "bucket", "full")
        .select(
            "bucket",
            (
                F.coalesce(F.col("_lp_t"), F.lit(floor_t))
                - F.coalesce(F.col("_lp_r"), F.lit(floor_r))
            ).alias("_ratio"),
        )
    )
    doc_w = (
        doc_bk
        .join(F.broadcast(ratios), "bucket", "left")
        .groupBy("_id")
        .agg(
            F.sum(
                F.coalesce(F.col("_ratio"), F.lit(floor_t - floor_r))
            ).alias("log_w")
        )
    )
    return df.join(
        doc_w.withColumnRenamed("_id", id_col), id_col, "left"
    ).select(
        *df.columns, F.coalesce("log_w", F.lit(0.0)).alias("log_w")
    )


def gumbel_key(id_col: Column | str, salt: str = "dsir") -> Column:
    """Deterministic standard-Gumbel 'noise' from an id: u =
    (hash60 + 0.5)/2^60 ∈ (0,1), g = −log(−log u). A pure hash
    function — the sampling-without-replacement membership is
    reproducible on any engine (same posture as sampling.py)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    u = (
        hash60(F.concat(F.lit(salt), c.cast("string"))).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    return -F.log(-F.log(u))


def dsir_sample(
    df: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame | None,
    k: int,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """The DSIR selection: k docs ~ importance weights, without
    replacement, via Gumbel top-k (key = log_w + Gumbel(id)). Returns
    the selected rows + log_w. Deterministic end to end; ties beyond
    the key cannot occur (distinct ids ⇒ distinct Gumbel keys a.s.,
    and the final orderBy includes the id as tiebreak anyway)."""
    w = importance_weights(
        df, target_counts, raw_counts, n_buckets, smoothing,
        id_col, text_col,
    )
    key = (F.col("log_w") + gumbel_key(id_col, salt)).alias("_key")
    return (
        w.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(int(k))
        .drop("_key")
    )
