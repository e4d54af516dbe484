"""Text retrieval over the corpus — TF-IDF / BM25 top-k.

No reference analog (the reference's tables are raster time series);
a training-data pipeline needs lexical retrieval for curation tasks:
pulling topical subsets, near-decontamination triage ("which corpus
docs score highest against this benchmark prompt"), and quality
auditing. Okapi BM25 is the standard public formula.

Spark-first shape — a distributed inverted index, no UDFs:

- postings: explode tokens once -> (doc_id, term, tf) via groupBy;
- document stats (length, avgdl, N) ride along as a 1-row broadcast;
- document frequency per term is a groupBy on the postings;
- the QUERY side (a handful of rows) is tokenized, exploded, and
  broadcast, so scoring is one equi-join on term against the
  postings — the corpus TEXT shuffles once to build postings and
  never again (the scoring join still carries the ~16-byte/doc
  length frame, metadata scale, not text);
- top-k per query is the standard rank-window over (query, score).

Scoring: score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl))
with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — the Robertson/
Sparck-Jones variant that stays positive.

At 100 TB the postings build is the dominant shuffle (terms are
Zipf-skewed; AQE skew splitting or salting the hottest terms applies
— see operators/skew.py); scoring traffic is bounded by
|query terms| × their posting lists, the classic inverted-index
bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

K1 = 1.2
B = 0.75


def postings(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) inverted index plus per-doc length dl."""
    toks = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def doc_lengths(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(text_col)).alias("dl"),
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """Top-k corpus docs per query by BM25.

    Returns (query_id, doc_id, score, rank), rank 1-based, ties
    broken by doc_id (deterministic). Query terms are deduplicated
    (standard bag-of-words query model: each distinct query term
    contributes once)."""
    # ONE tokenization pass: doc lengths and corpus stats derive
    # from the postings (sum of tf per doc == token count exactly),
    # not from re-running the tokenizer over the corpus two more
    # times. The left join from the id projection restores the
    # token-less docs the postings lack — empty text as dl=0 and
    # NULL text as dl=NULL, bit-identical to size(tokens(text)) —
    # so n_docs/avgdl (and therefore every idf and score) are
    # unchanged.
    post = postings(corpus, id_col, text_col).localCheckpoint(eager=True)
    sums = post.groupBy("doc_id").agg(F.sum("tf").alias("_dl"))
    ids = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).isNotNull().alias("_ht"),
    )
    dl = ids.join(sums, "doc_id", "left").select(
        "doc_id",
        F.coalesce(
            F.col("_dl"), F.when(F.col("_ht"), F.lit(0))
        ).alias("dl"),
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(query_text_col))).alias("term"),
    )

    # restrict the postings to query terms FIRST (broadcast semi-
    # join), then materialize once: document frequency and scoring
    # both read this small frame (bounded by the query terms' posting
    # lists), so the corpus is exploded exactly once and the df
    # aggregate never shuffles the full postings table (scale fix —
    # and rule 15: two concurrent consumers of a lazy frame would
    # each recompute the explode).
    rel = post.join(
        F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
    ).localCheckpoint(eager=True)
    dfreq = rel.groupBy("term").agg(
        F.count("*").alias("df")
    )  # one row per (doc, term) => count = doc frequency

    scored = (
        rel.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
