"""Exact substring deduplication — duplicated k-token spans.

The reference's dedup surface stops at whole-row `distinct()`
(/root/reference/ccdc/randomforest.py:67); training-data pipelines
also need SUB-document dedup: long token runs repeated verbatim
across documents (boilerplate, licenses, templated passages) inflate
memorization even when the documents as a whole are distinct
("Deduplicating Training Data Makes Language Models Better",
Lee et al., ACL 2022 — public paper; they build a monolithic suffix
array, which does not distribute).

Spark-first shape — a distributed k-gram inverted index instead of a
suffix array:

1. every k-token gram of every document, with its token position
   (posexplode over ``gram_array`` — zero UDFs);
2. grams are reduced to 60-bit md5 fingerprints BEFORE the shuffle,
   so the groupBy carries 8 bytes + (doc_id, pos), never text;
3. a gram is "duplicated" if it occurs in ≥2 distinct documents
   (min(doc_id) != max(doc_id) — exact, no count-distinct needed)
   or, with ``cross_doc_only=False``, ≥``min_count`` times anywhere
   (catches within-document repetition too);
4. flagged positions cover intervals [pos, pos+k); overlapping or
   adjacent intervals merge into maximal spans with one per-doc
   window pass (classic island detection — running max of interval
   end, new island when a gap appears);
5. span removal rebuilds the token stream with a positional
   ``filter`` lambda against the doc's (few) merged spans.

Scale notes:
- The only wide ops are one groupBy on the 8-byte fingerprint (with
  map-side partial min/max/count) and one equi-join of positions to
  flagged fingerprints — both shuffle fingerprints, never text.
- The span-merge window partitions by doc_id over ONLY duplicated
  positions (a small fraction of the corpus) — state is bounded by
  positions-per-doc, and no cross-doc ordering exists anywhere.
- Every stage is built-in/codegen; the lambda in span removal
  touches only lambda variables and joined ATTRIBUTES (no outer
  expression re-evaluation — PLANS.md rule 14).

All arithmetic is exact integers, so the DuckDB oracle
(queries/dedup.py d8) matches bit-for-bit with no quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60, hash60_hi
from .text import gram_array, tokens


def gram_positions(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, gfp, gfp2): the 120-bit fingerprint (two 60-bit
    slices of ONE md5) of the k-token gram starting at 0-based token
    position ``pos``. Documents shorter than k tokens contribute
    nothing. 120 bits matter here: gram-level keys are ~3 orders of
    magnitude more numerous than doc-level keys (~10^13 distinct
    grams at the 100 TB design point), where 60-bit birthday math
    expects ~4·10^7 collisions — each one silently deleting >= k
    real tokens from two unrelated docs. At 120 bits the expectation
    is ~4·10^-11.

    `spread` first: a compact corpus arrives as ONE parquet split and
    the explode+md5 pipeline would run on a single core (measured 3 s
    of d8's 3.7 s at sf0.1); well-parallel inputs pass through
    untouched, so at scale nothing reshuffles."""
    from .dedup import spread

    df = spread(df, id_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(gram_array(tokens(text_col), k)).alias("pos", "g"),
    ).select(
        "doc_id", "pos",
        hash60(F.col("g")).alias("gfp"),
        hash60_hi(F.col("g")).alias("gfp2"),
    )


def duplicated_positions(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    cross_doc_only: bool = True,
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, pos) of every gram occurrence whose fingerprint is
    duplicated — across documents (default: min(doc_id)!=max(doc_id),
    exact without a count-distinct) or anywhere (total occurrences
    >= min_count, within-document repeats included)."""
    # gp feeds the flag aggregate AND the semi-join probe side —
    # concurrent first readers of a lazy cache would each recompute
    # the explode+md5 subtree (PLANS.md rule 15), so materialize
    # exactly once
    gp = gram_positions(df, k=k, id_col=id_col, text_col=text_col)
    gp = gp.localCheckpoint(eager=True)
    grouped = gp.groupBy("gfp", "gfp2").agg(
        F.min("doc_id").alias("_mn"),
        F.max("doc_id").alias("_mx"),
        F.count("*").alias("_n"),
    )
    flagged = grouped.filter(
        (F.col("_mn") != F.col("_mx"))
        if cross_doc_only
        else (F.col("_n") >= min_count)
    ).select("gfp", "gfp2")
    return gp.join(
        flagged, ["gfp", "gfp2"], "left_semi"
    ).select("doc_id", "pos")


def duplicate_spans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    cross_doc_only: bool = True,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Each flagged gram covers token interval [pos, pos+k); overlapping
    or adjacent coverage merges, so every returned
    (doc_id, span_start, span_end) is a maximal run of tokens fully
    covered by duplicated grams. ``n_grams`` counts the flagged grams
    inside the span (== span length - k + 1 when the whole span is
    contiguous duplication, smaller never happens by construction).

    ALL occurrences are flagged — including the first: this is
    Lee et al.'s ExactSubstr posture (shared boilerplate is noise in
    every copy), NOT keep-one dedup. A corpus of fully identical
    docs would therefore strip to empty clean_text everywhere —
    which is why the corpus plan runs the DOC-level exact rung
    first: after it, no byte-identical documents remain, and what
    this pass flags is genuinely repeated boilerplate.
    """
    pos = duplicated_positions(
        df,
        k=k,
        id_col=id_col,
        text_col=text_col,
        cross_doc_only=cross_doc_only,
        min_count=min_count,
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = pos.withColumn(
        "_new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
    cross_doc_only: bool = True,
    min_count: int = 2,
) -> DataFrame:
    """Rewrite each document with its duplicated spans removed.

    Returns the input columns plus ``clean_text`` (tokens outside
    every span, space-joined) and ``n_dup_tokens`` (tokens dropped).
    Pass ``spans`` to reuse a precomputed `duplicate_spans` frame.

    The positional filter's lambda references only its own variables
    and the joined ``_spans`` attribute — attributes are cheap per
    element; no outer expression is re-evaluated (PLANS.md rule 14).
    """
    if spans is None:
        spans = duplicate_spans(
            df,
            k=k,
            id_col=id_col,
            text_col=text_col,
            cross_doc_only=cross_doc_only,
            min_count=min_count,
        )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = df.join(
        per_doc, df[id_col] == per_doc["doc_id"], "left"
    ).drop(per_doc["doc_id"])
    toks = tokens(text_col)
    empty = F.array().cast("array<struct<span_start:int,span_end:int>>")
    sp = F.coalesce(
        F.col("_spans").cast("array<struct<span_start:int,span_end:int>>"),
        empty,
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            sp, lambda s: (i >= s["span_start"]) & (i < s["span_end"])
        ),
    )
    return joined.select(
        *[F.col(c) for c in df.columns],
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(toks) - F.size(kept)).alias("n_dup_tokens"),
    )
