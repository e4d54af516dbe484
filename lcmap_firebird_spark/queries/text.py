"""Text-analysis query registry (documents table).

DuckDB oracle twins are built from the same logical recipe as the
Spark expressions (identical tokenization, identical CASE chains,
identical fixed-order double arithmetic) so values hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators import text as T

# DuckDB fragment: tokenizer identical to operators.text.tokens()
TOK = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')"


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"len(list_intersect(list_distinct(t), [{words}]))"


def t1_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_table(spark, "documents", sf)
    toks = T.tokens("text")
    sum_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        T.char_count("text").cast("bigint").alias("n_chars_m"),
        T.token_count("text").cast("bigint").alias("n_tokens"),
        T.distinct_token_count("text").cast("bigint").alias("n_distinct"),
        (sum_len.cast("double") / T.token_count("text").cast("double")).alias(
            "avg_token_len"
        ),
    )


def t2_language_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_table(spark, "documents", sf)
    return docs.select("doc_id", "lang", T.language_id("text").alias("pred_lang"))


def t3_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_table(spark, "documents", sf)
    out = T.quality_features(docs, "text")
    # quality_features rounds the score; emit raw components as-is
    return out


def t4_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_table(spark, "documents", sf)
    return docs.select("doc_id", T.fingerprint("text").alias("fp"))


def t5_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_table(spark, "documents", sf)
    return docs.select(
        "doc_id",
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        (T.bpe_token_count("text").cast("double") / T.token_count("text"))
        .alias("tokens_per_word"),
    )


QUERIES = {
    "t1_token_stats": t1_token_stats,
    "t2_language_id": t2_language_id,
    "t3_quality_score": t3_quality_score,
    "t4_fingerprint": t4_fingerprint,
    "t5_bpe_token_count": t5_bpe_token_count,
}


def _lang_case() -> str:
    """CASE chain identical to operators.text.language_id."""
    s = {lang: f"s_{lang}" for lang in T.LANG_ORDER}
    clauses = []
    for idx, lang in enumerate(T.LANG_ORDER):
        conds = [f"{s[lang]} > 0"]
        for other in T.LANG_ORDER[:idx]:
            conds.append(f"{s[lang]} > {s[other]}")
        for other in T.LANG_ORDER[idx + 1 :]:
            conds.append(f"{s[lang]} >= {s[other]}")
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


ORACLES = {
    "t1_token_stats": f"""
        WITH toks AS (SELECT doc_id, length(text) AS n_chars_m, {TOK} AS t
                      FROM documents)
        SELECT doc_id,
               CAST(n_chars_m AS BIGINT) AS n_chars_m,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
               CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE) AS avg_token_len
        FROM toks
    """,
    "t2_language_id": f"""
        WITH toks AS (SELECT doc_id, lang, {TOK} AS t FROM documents),
        scores AS (SELECT doc_id, lang,
                          {_sql_stop_hits('en')} AS s_en,
                          {_sql_stop_hits('de')} AS s_de,
                          {_sql_stop_hits('es')} AS s_es,
                          {_sql_stop_hits('fr')} AS s_fr
                   FROM toks)
        SELECT doc_id, lang, {_lang_case()} AS pred_lang FROM scores
    """,
    "t3_quality_score": f"""
        WITH toks AS (SELECT doc_id, text, length(text) AS n_chars_m, {TOK} AS t
                      FROM documents),
        feats AS (SELECT doc_id, n_chars_m,
                         len(t) AS n_tokens,
                         len(list_distinct(t)) AS n_distinct,
                         length(text) - length(regexp_replace(text,
                             '[^\\w\\s]', '', 'g')) AS n_punct,
                         {_sql_stop_hits('en')} AS n_stop
                  FROM toks)
        SELECT doc_id, n_chars_m, n_tokens, n_distinct, n_punct,
               CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS diversity,
               round(
                 (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.5
                 + (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
                 + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE)) * 0.2,
                 6) AS quality_score
        FROM feats
    """,
    "t5_bpe_token_count": f"""
        WITH toks AS (
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS n_bpe,
                   len({TOK}) AS n_ws
            FROM documents)
        SELECT doc_id,
               CAST(n_bpe AS INT) AS n_bpe_tokens,
               CAST(n_bpe AS DOUBLE) / n_ws AS tokens_per_word
        FROM toks
    """,
    "t4_fingerprint": f"""
        WITH toks AS (SELECT doc_id, {TOK} AS t FROM documents)
        SELECT doc_id,
               CAST(('0x' || substr(md5(array_to_string(t, ' ')), 1, 15))
                    AS BIGINT) AS fp
        FROM toks
    """,
}
