"""Web-provenance curation — domain extraction, blocklists, caps.

The Common-Crawl-derived stages every public web-corpus recipe
applies before content filtering (C4, RefinedWeb, Gopher):

- `extract_domain`: registrable host from a URL column — one codegen
  regex, no UDF;
- `blocklist_gate`: drop documents whose domain (or any parent
  domain) is listed — broadcast anti-join against the (small) list,
  parent matching via a posexploded suffix set so `ads.x.com`
  matches a listing of `x.com`;
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

from .mixture import MIX_BUCKETS
from .sampling import split_bucket

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
    `blocklist` (one `domain` column). The suffix explode is bounded
    by label count (~4/host); the list side broadcasts."""
    dom = (
        F.col(domain_col)
        if domain_col in df.columns
        else extract_domain(url_col)
    )
    with_sfx = df.withColumn(
        "_sfx", F.explode(_domain_suffixes(dom))
    )
    bad = blocklist.select(F.lower(F.col("domain")).alias("_sfx"))
    hit_ids = with_sfx.join(F.broadcast(bad), "_sfx", "left_semi")
    # a row explodes to several suffix rows — drop by provenance of
    # ANY hit, then collapse back to original rows via anti-join
    return df.join(
        hit_ids.select(*df.columns).distinct(),
        df.columns,
        "left_anti",
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
        F.col(domain_col)
        if domain_col in df.columns
        else extract_domain(url_col)
    )
    bucketed = df.withColumn("_dom", dom).withColumn(
        "_bkt", split_bucket(key_col, salt) % MIX_BUCKETS
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
        .filter(F.col("_cum") <= max_docs)
        .groupBy("_dom")
        .agg((F.max("_bkt") + 1).alias("_thr"))
        .select(F.col("_dom").alias("_tdom"), "_thr")
    )
    out = bucketed.join(
        F.broadcast(thr), bucketed["_dom"] == thr["_tdom"]
    ).filter(F.col("_bkt") < F.col("_thr"))
    return out.select(*df.columns)
