"""Text-analysis query registry (documents table).

DuckDB oracle twins are built from the same logical recipe as the
Spark expressions (identical tokenization, identical struct-argmax,
identical fixed-order double arithmetic) so values hash-match.

Round-2 consolidation (driver records only 50 registry entries):
- t5_bpe_token_count → t1_token_stats (same per-doc grain)
- t4_fingerprint     → t3_quality_fingerprint (rides the same scan)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators import text as T

# DuckDB fragment: tokenizer identical to operators.text.tokens()
TOK = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')"

# Pinned BM25 query-term set for t1's retrieval certification (mixed
# document frequencies in the synthetic vocabulary; pinned so the
# score is a pure function of the corpus, like t3's LM slice).
BM25_TERMS = ("spark", "query", "vector", "merge")


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"len(list_intersect(list_distinct(t), [{words}]))"


def t1_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace + BPE-ish token statistics per document (folds old
    t5: the regex-pretokenizer count and tokens-per-word ratio ride
    the same scan) + quantized BM25 against the pinned BM25_TERMS
    query (round-6 consolidation: the retrieval family joins the
    per-doc token slot — `bm25_q` is the integer-quantized Okapi
    score, `n_hit_terms` the matched-term count, both NULL for docs
    hitting no query term). Certifies retrieval.py's inverted-index
    tf/df/dl/idf pipeline end to end against DuckDB."""
    from ..operators.retrieval import bm25_quantized

    docs = read_table(spark, "documents", sf)
    toks = T.tokens("text")
    sum_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    bm25 = bm25_quantized(
        docs.select("doc_id", "text"), BM25_TERMS
    ).select("doc_id", "bm25_q", "n_hit_terms")
    stats = docs.select(
        "doc_id",
        T.char_count("text").cast("bigint").alias("n_chars_m"),
        T.token_count("text").cast("bigint").alias("n_tokens"),
        T.distinct_token_count("text").cast("bigint").alias("n_distinct"),
        # zero-token guard MIRRORED in the oracle: one empty or
        # whitespace-only doc in a regenerated testdata would abort
        # the query under Spark 4 ANSI (DIVIDE_BY_ZERO) and diverge
        # from DuckDB even with ANSI off
        F.when(
            T.token_count("text") > 0,
            sum_len.cast("double") / T.token_count("text").cast("double"),
        ).otherwise(F.lit(0.0)).alias("avg_token_len"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        F.when(
            T.token_count("text") > 0,
            T.bpe_token_count("text").cast("double")
            / T.token_count("text"),
        ).otherwise(F.lit(0.0)).alias("tokens_per_word"),
    )
    return stats.join(bm25, "doc_id", "left")


def t2_lang_id_nb(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID + the learned NB classifier in its
    oracle-exact quantized form (round-5 consolidation: the
    model-based classifier joins the language slot — `nb_q` is the
    integer-quantized NB log-odds score of a hashed-token classifier
    trained on THIS corpus to predict lang='en', `nb_en` its sign;
    NULL for token-less docs). Certifies classifier.py's closed-form
    train + broadcast-weight score end to end against DuckDB."""
    from ..operators.classifier import nb_quantized

    docs = read_table(spark, "documents", sf)
    scored = nb_quantized(
        docs.select("doc_id", "lang", "text"),
        label_pred=F.col("lang") == "en",
    )
    return scored.select(
        "doc_id",
        "lang",
        T.language_id("text").alias("pred_lang"),
        "nb_q",
        (F.col("nb_q") >= 0).alias("nb_en"),
    )


def t3_quality_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Quality heuristics + Gopher repetition signals + 60-bit content
    fingerprint in one scan (folds old t4) + the CCNet LM-perplexity
    signal in its oracle-exact quantized form (round-5 consolidation:
    perplexity joins the quality-signal slot it belongs to —
    `lm_nll_q` is the integer-quantized negative log likelihood under
    an add-k bigram LM trained on the corpus's 'en' slice, NULL for
    docs too short to have a bigram; perplexity =
    exp(lm_nll_q / (1e6 · n_bigrams)))."""
    from ..operators.perplexity import nll_quantized

    from ..operators.dedup import spread

    docs = read_table(spark, "documents", sf)
    # Materialize the grams ONCE per row: both fractions reference the
    # `_g2` attribute, and CollapseProject keeps a multiply-referenced
    # non-cheap projection output in its own stage (re-inlining the
    # gram build per consumer is what made the first cut ~50× slower).
    # spread(): the one-split compact scan otherwise runs the whole
    # gram/fraction chain on a single core (same d8 pathology).
    staged = spread(docs, "doc_id").select(
        "doc_id", "text", T.ngram_list("text", 2).alias("_g2")
    )
    qf = T.quality_features(
        staged,
        "text",
        extra_cols={
            "rep_2gram_frac": F.round(T.repeated_fraction_of(F.col("_g2")), 6),
            "top_2gram_frac": F.round(T.top_fraction_of(F.col("_g2")), 6),
            "fp": T.fingerprint("text"),
        },
    )
    nll = nll_quantized(
        docs.select("doc_id", "text", "lang"),
        target_pred=F.col("lang") == "en",
    ).select("doc_id", "lm_nll_q", "n_bigrams")
    return qf.join(nll, "doc_id", "left")


QUERIES = {
    "t1_token_stats": t1_token_stats,
    "t2_lang_id_nb": t2_lang_id_nb,
    "t3_quality_fingerprint": t3_quality_fingerprint,
}


def _lang_argmax() -> str:
    """Struct-argmax identical to operators.text.language_id: max over
    (score, prio, lang) structs, lexicographic — earlier LANG_ORDER
    languages carry higher prio so they win score ties."""
    n = len(T.LANG_ORDER)
    entries = ", ".join(
        f"{{'score': s_{lang}, 'prio': {n - idx}, 'lang': '{lang}'}}"
        for idx, lang in enumerate(T.LANG_ORDER)
    )
    return f"list_aggregate([{entries}], 'max')"


def _bm25_cte() -> str:
    from ..operators.retrieval import bm25_sql_twin

    return bm25_sql_twin(BM25_TERMS, tok_expr=TOK)


# BM25 twin notes (round-6 consolidation): the bm25 CTE replays
# tokenize → pinned-term tf/df → dl/avgdl → idf → per-term
# round(w·1e6) BEFORE the per-doc sum (the t3/x4 quantized-integer
# recipe applied to retrieval); float constants ride repr() strings
# through CAST(VARCHAR AS DOUBLE) so both engines run identical IEEE
# doubles, and SUM(BIGINT)→HUGEINT is re-cast to BIGINT.
ORACLES = {
    "t1_token_stats": f"""
        WITH {_bm25_cte()},
        toks AS (SELECT doc_id, text, length(text) AS n_chars_m, {TOK} AS t
                      FROM documents)
        SELECT doc_id,
               CAST(n_chars_m AS BIGINT) AS n_chars_m,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
               CASE WHEN len(t) > 0
                    THEN CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                         / CAST(len(t) AS DOUBLE)
                    ELSE 0.0 END AS avg_token_len,
               CAST(len(regexp_extract_all(text,
                   ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS INT)
                   AS n_bpe_tokens,
               CASE WHEN len(t) > 0
                    THEN CAST(len(regexp_extract_all(text,
                        ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS DOUBLE)
                         / len(t)
                    ELSE 0.0 END AS tokens_per_word,
               bm25.bm25_q AS bm25_q,
               bm25.n_hit_terms AS n_hit_terms
        FROM toks LEFT JOIN bm25 USING (doc_id)
    """,
    # NB twin notes: every inexact constant is CAST to DOUBLE
    # (integral-valued literals like 4096 are safe after the cast);
    # the per-bucket round(log-odds · 1e6) quantization BEFORE the
    # per-doc sum makes nb_q an order-independent exact integer —
    # the t3/x4 recipe. SUM(BIGINT) → HUGEINT is re-cast to BIGINT.
    "t2_lang_id_nb": f"""
        WITH toks AS (SELECT doc_id, lang, {TOK} AS t FROM documents),
        scores AS (SELECT doc_id, lang,
                          {_sql_stop_hits('en')} AS s_en,
                          {_sql_stop_hits('de')} AS s_de,
                          {_sql_stop_hits('es')} AS s_es,
                          {_sql_stop_hits('fr')} AS s_fr
                   FROM toks),
        best AS (SELECT doc_id, lang, {_lang_argmax()} AS b FROM scores),
        tb AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT)
                          % 4096 AS bucket
               FROM (SELECT doc_id, unnest(t) AS tk FROM toks)),
        lab AS (SELECT doc_id,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                FROM documents),
        tbl AS (SELECT tb.doc_id, bucket, y
                FROM tb JOIN lab USING (doc_id)),
        cnt AS (SELECT bucket,
                       CAST(SUM(y) AS BIGINT) AS pos,
                       CAST(SUM(1 - y) AS BIGINT) AS neg
                FROM tbl GROUP BY bucket),
        tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS tp,
                       CAST(SUM(neg) AS BIGINT) AS tn
                FROM cnt),
        w AS (SELECT bucket,
                     CAST(round(
                         (ln((CAST(pos AS DOUBLE) + CAST(1 AS DOUBLE))
                             / (CAST(tp AS DOUBLE) + CAST(4096 AS DOUBLE)))
                          - ln((CAST(neg AS DOUBLE) + CAST(1 AS DOUBLE))
                               / (CAST(tn AS DOUBLE) + CAST(4096 AS DOUBLE))))
                         * CAST(1000000 AS DOUBLE)) AS BIGINT) AS wq
              FROM cnt, tot),
        sc AS (SELECT doc_id, CAST(SUM(wq) AS BIGINT) AS nb_q
               FROM tbl JOIN w USING (bucket) GROUP BY doc_id)
        SELECT best.doc_id, best.lang,
               CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS pred_lang,
               sc.nb_q AS nb_q,
               sc.nb_q >= 0 AS nb_en
        FROM best LEFT JOIN sc ON sc.doc_id = best.doc_id
    """,
    # LM-NLL twin notes: DuckDB parses `0.1` as DECIMAL (exact), while
    # Spark's lit(0.1) is the IEEE double — every inexact constant is
    # CAST to DOUBLE so both engines run the identical float ops; the
    # per-token round(−ln p · 1e6) quantization then absorbs the only
    # residual (1-ulp ln differences), exactly like x4's DSIR twin.
    "t3_quality_fingerprint": f"""
        WITH toks AS (SELECT doc_id, text, lang,
                             length(text) AS n_chars_m, {TOK} AS t
                      FROM documents),
        bg AS (SELECT doc_id, lang,
                      unnest(list_transform(
                          generate_series(1, len(t) - 1),
                          i -> CAST(('0x' || substr(md5(t[i]), 1, 15))
                                    AS BIGINT))) AS w1,
                      unnest(list_transform(
                          generate_series(1, len(t) - 1),
                          i -> CAST(('0x' || substr(md5(t[i+1]), 1, 15))
                                    AS BIGINT))) AS w2
               FROM toks WHERE len(t) >= 2),
        uc AS (SELECT w1, COUNT(*) AS u FROM bg
               WHERE lang = 'en' GROUP BY w1),
        bc AS (SELECT w1, w2, COUNT(*) AS b FROM bg
               WHERE lang = 'en' GROUP BY w1, w2),
        vv AS (SELECT COUNT(DISTINCT w) + 1 AS V FROM (
                   SELECT w1 AS w FROM bg WHERE lang = 'en'
                   UNION ALL
                   SELECT w2 AS w FROM bg WHERE lang = 'en') uw),
        sc AS (SELECT bg.doc_id,
                      CASE WHEN uc.u IS NOT NULL
                           THEN ln((coalesce(bc.b, 0)
                                    + CAST(0.1 AS DOUBLE))
                                   / (uc.u
                                      + CAST(0.1 AS DOUBLE) * V))
                           ELSE ln(CAST(1.0 AS DOUBLE) / V) END AS logp
               FROM bg LEFT JOIN uc USING (w1)
                       LEFT JOIN bc USING (w1, w2), vv),
        nll AS (SELECT doc_id,
                       -- outer cast: DuckDB SUM(BIGINT) is HUGEINT,
                       -- which fetchdf() surfaces as float64 and the
                       -- driver would see as a schema mismatch
                       CAST(SUM(CAST(round(-logp * 1e6) AS BIGINT))
                            AS BIGINT) AS lm_nll_q,
                       COUNT(*) AS n_bigrams
                FROM sc GROUP BY doc_id),
        grams AS (SELECT doc_id,
                         CASE WHEN len(t) >= 2
                              THEN list_transform(
                                  generate_series(1, len(t) - 1),
                                  i -> concat_ws(' ', t[i], t[i+1]))
                              ELSE [] END AS g
                  FROM toks),
        reps AS (SELECT doc_id,
                        CASE WHEN len(g) > 0
                             THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                                      / CAST(len(g) AS DOUBLE)
                             ELSE 0.0 END AS rep_2gram_frac,
                        CASE WHEN len(g) > 0
                             THEN CAST(list_max(list_transform(list_distinct(g),
                                      d -> len(list_filter(g, x -> x = d))))
                                      AS DOUBLE) / CAST(len(g) AS DOUBLE)
                             ELSE 0.0 END AS top_2gram_frac
                 FROM grams),
        feats AS (SELECT doc_id, n_chars_m,
                         len(t) AS n_tokens,
                         len(list_distinct(t)) AS n_distinct,
                         length(text) - length(regexp_replace(text,
                             '[^\\w\\s]', '', 'g')) AS n_punct,
                         {_sql_stop_hits('en')} AS n_stop,
                         CASE WHEN t IS NULL THEN NULL
                           ELSE CAST(('0x' || substr(md5(
                                    coalesce(array_to_string(t, ' '), '')),
                                    1, 15)) AS BIGINT) END AS fp
                  FROM toks)
        SELECT f.doc_id, n_chars_m, n_tokens, n_distinct, n_punct,
               CASE WHEN n_tokens > 0
                    THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    ELSE 0.0 END AS diversity,
               round(
                 (CASE WHEN n_tokens > 0
                       THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                       ELSE 0.0 END) * 0.5
                 + (CASE WHEN n_tokens > 0
                         THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         ELSE 0.0 END) * 0.3
                 + (1.0 - CASE WHEN n_chars_m > 0
                               THEN CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE)
                               ELSE 0.0 END) * 0.2,
                 6) AS quality_score,
               round(r.rep_2gram_frac, 6) AS rep_2gram_frac,
               round(r.top_2gram_frac, 6) AS top_2gram_frac,
               fp,
               nll.lm_nll_q AS lm_nll_q,
               nll.n_bigrams AS n_bigrams
        FROM feats f JOIN reps r ON r.doc_id = f.doc_id
        LEFT JOIN nll ON nll.doc_id = f.doc_id
    """,
}
