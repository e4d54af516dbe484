"""Web-provenance curation — domain extraction, blocklists, caps.

The Common-Crawl-derived stages every public web-corpus recipe
applies before content filtering (C4, RefinedWeb, Gopher):

- `extract_domain`: registrable host from a URL column — one codegen
  regex, no UDF;
- `blocklist_gate`: drop documents whose domain (or any parent
  domain) is listed — the list collapses to ONE broadcast row
  (collect_set) and each doc tests `arrays_overlap(suffixes, list)`
  in place, so `ads.x.com` matches a listing of `x.com` with ZERO
  shuffle of the document side and no join keys at all (an earlier
  all-columns anti-join both shuffled full text and let any row with
  a NULL payload column bypass the list — equi-join NULL semantics);
- `domain_cap`: at most N documents per domain, membership a pure
  hash function (reuses the mixture bucket-threshold machinery with
  unit weights, so no per-domain window/sort exists anywhere — a
  1-billion-page domain costs one small aggregate row, not a sorted
  partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from .mixture import MIX_BUCKETS, mix_bucket

_DOMAIN_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)"


def extract_domain(url_col: str | Column = "url") -> Column:
    """Lower-cased host part of a URL (scheme/userinfo/port/path
    stripped). Pure codegen regex."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(c, _DOMAIN_RE, 1))


def _domain_suffixes(domain: Column) -> Column:
    """['a.b.c', 'b.c', 'c'] — every parent domain of the host, so a
    blocklist entry matches itself and all subdomains."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def blocklist_gate(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose domain or any parent domain appears in
    `blocklist` (one `domain` column).

    The list aggregates to a single collect_set row that broadcasts;
    each document row then evaluates
    `arrays_overlap(parent_suffixes(domain), blocked)` in place —
    the document side is never shuffled, no equi-join keys exist to
    trip over NULLs, and text never leaves its scan partition. Rows
    with a NULL/absent domain are KEPT (nothing to match). A
    pre-existing domain column is lower-cased before matching (the
    list side always is — a case mismatch would silently bypass the
    gate for crawler output that preserves host case).

    Cost model: ArraysOverlap iterates the LARGER array per row, so
    each document pays O(|blocklist|) probes — the zero-shuffle
    trade. That is the right shape for curated lists (10^2–10^5
    entries). For a truly corpus-scale list (millions+), prefer an
    explode+join: suffixes explode to ≤ depth rows/doc, semi-join
    the broadcast list for hit ids, anti-join back by id — O(1) per
    suffix but shuffles the doc ids."""
    dom = (
        F.lower(F.col(domain_col))
        if domain_col in df.columns
        else extract_domain(url_col)
    )
    blocked = blocklist.agg(
        F.collect_set(F.lower(F.col("domain"))).alias("_blocked")
    )
    hit = F.arrays_overlap(_domain_suffixes(dom), F.col("_blocked"))
    return (
        df.crossJoin(F.broadcast(blocked))  # 1-row side: a flag probe
        .filter(~F.coalesce(hit, F.lit(False)))
        .drop("_blocked")
    )


def domain_cap(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    domain_col: str = "domain",
    key_col: str = "doc_id",
    salt: str = "domcap",
) -> DataFrame:
    """At most ~max_docs documents per domain, chosen by
    deterministic hash bucket (mixture's bucket-threshold machinery
    with UNIT token counts — approached from below at bucket
    resolution, membership independent of partition layout, no
    per-domain sort or window anywhere)."""
    dom = (
        F.lower(F.col(domain_col))
        if domain_col in df.columns
        else extract_domain(url_col)
    )
    bucketed = df.withColumn("_dom", dom).withColumn(
        "_bkt", mix_bucket(key_col, salt)
    )
    per_bucket = bucketed.groupBy("_dom", "_bkt").agg(
        F.count("*").alias("_n")
    )
    # the cumsum window runs over the SMALL (domain x occupied-
    # bucket) aggregate — never the corpus (mixture's shape; a giant
    # domain is still at most MIX_BUCKETS rows here)
    w = Window.partitionBy("_dom").orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    thr = (
        per_bucket.withColumn("_cum", F.sum("_n").over(w))
        .groupBy("_dom")
        .agg(
            F.coalesce(
                F.max(
                    F.when(F.col("_cum") <= max_docs, F.col("_bkt") + 1)
                ),
                # giant domain: even its FIRST occupied bucket
                # overshoots the cap — keep exactly that bucket
                # (~n/MIX_BUCKETS docs, the cap at bucket
                # resolution) rather than dropping the domain
                # entirely, which is what an empty prefix filter
                # would silently do
                F.min("_bkt") + 1,
            ).alias("_thr")
        )
        .select(F.col("_dom").alias("_tdom"), "_thr")
    )
    # LEFT join + explicit NULL pass-through: a doc whose domain
    # could not be parsed has nothing to cap against and is KEPT —
    # the same NULL closure blocklist_gate documents (an inner join
    # would silently delete every NULL-domain row; PLANS.md rule 24).
    # NO broadcast hint: thr is one row per DISTINCT CORPUS DOMAIN —
    # unbounded (~10^8 registrable domains at Common-Crawl scale),
    # not a config-sized dimension like the mixture's budget frame.
    # AQE still broadcasts it when it measures small.
    out = bucketed.join(
        thr, bucketed["_dom"] == thr["_tdom"], "left"
    ).filter(
        F.col("_dom").isNull() | (F.col("_bkt") < F.col("_thr"))
    )
    return out.select(*df.columns)
