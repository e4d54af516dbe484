"""Web-provenance curation (operators/web.py): domain extraction,
subdomain-aware blocklists, deterministic per-domain caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators import web as W


def test_extract_domain_variants(spark):
    rows = [
        (1, "https://www.example.com/path?q=1"),
        (2, "http://user:pw@sub.site.org:8080/x"),
        (3, "ftp://Archive.Net/file"),
        (4, "bare.host.io/path"),
        (5, "https://example.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id", W.extract_domain("url").alias("d")
        ).collect()
    }
    assert got == {
        1: "www.example.com",
        2: "sub.site.org",
        3: "archive.net",
        4: "bare.host.io",
        5: "example.com",
    }


def test_blocklist_matches_subdomains(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://ads.tracker.com/x"),
            (2, "https://tracker.com/y"),
            (3, "https://nottracker.com/z"),
            (4, "https://fine.org/a"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("tracker.com",)], ["domain"])
    kept = {r.doc_id for r in W.blocklist_gate(docs, bl).collect()}
    # subdomain and exact match dropped; similarly-NAMED domain kept
    assert kept == {3, 4}
    plan = W.blocklist_gate(docs, bl)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_blocklist_null_payload_cannot_bypass(spark):
    # regression (round-4 ADVICE high): the old all-columns anti-join
    # let any blocklisted row with a NULL payload column survive,
    # because equi-join NULL semantics never match the row to its own
    # hit. The gate must key on the domain test alone.
    docs = spark.createDataFrame(
        [
            (1, "https://tracker.com/x", None),
            (2, "https://fine.org/a", None),
            (3, "https://tracker.com/y", "meta"),
        ],
        "doc_id long, url string, extra string",
    )
    bl = spark.createDataFrame([("tracker.com",)], ["domain"])
    kept = {r.doc_id for r in W.blocklist_gate(docs, bl).collect()}
    assert kept == {2}


def test_blocklist_null_domain_kept_and_empty_list(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "https://ok.org/a")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("tracker.com",)], ["domain"])
    kept = {r.doc_id for r in W.blocklist_gate(docs, bl).collect()}
    assert kept == {1, 2}  # NULL url: nothing to match, keep
    empty = bl.filter(F.lit(False))
    kept2 = {r.doc_id for r in W.blocklist_gate(docs, empty).collect()}
    assert kept2 == {1, 2}


def test_blocklist_plan_never_shuffles_documents(spark):
    # scale contract: the document side is filtered in place — the
    # only Exchange anywhere is the 1-row broadcast of the list.
    docs = spark.createDataFrame(
        [(1, "https://tracker.com/x", "t" * 50)],
        "doc_id long, url string, text string",
    )
    bl = spark.createDataFrame([("tracker.com",)], ["domain"])
    plan = (
        W.blocklist_gate(docs, bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            # broadcast of the 1-row list, or the list side's global
            # collect_set agg (SinglePartition) — both list-side and
            # metadata-scale. Any hash-partitioned exchange would mean
            # the documents themselves moved.
            assert "Broadcast" in line or "SinglePartition" in line, line
    assert "hashpartitioning" not in plan
    assert "EvalPython" not in plan


def test_domain_cap_deterministic_and_bounded(spark):
    rows = [
        (i, f"https://big.com/{i}") for i in range(500)
    ] + [(1000 + i, f"https://small.org/{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    capped = W.domain_cap(docs, max_docs=50)
    out = capped.collect()
    per_dom = {}
    for r in out:
        d = "big.com" if r.doc_id < 1000 else "small.org"
        per_dom[d] = per_dom.get(d, 0) + 1
    # cap honored from below; small domain survives whole
    assert per_dom["small.org"] == 5
    assert per_dom["big.com"] <= 50
    assert per_dom["big.com"] >= 30  # bucket resolution, not collapse
    # deterministic
    again = {r.doc_id for r in W.domain_cap(docs, max_docs=50).collect()}
    assert again == {r.doc_id for r in out}
    # monotone in the cap
    bigger = {r.doc_id for r in W.domain_cap(docs, max_docs=200).collect()}
    assert {r.doc_id for r in out} <= bigger


def test_domain_cap_giant_domain_never_vanishes(spark):
    """A domain whose FIRST occupied hash bucket alone exceeds the
    cap must keep ~that bucket, not silently drop every document
    (the Common-Crawl giant-domain case the cap exists for)."""
    from pyspark.sql import functions as F

    from lcmap_firebird_spark.operators.mixture import mix_bucket
    from lcmap_firebird_spark.operators.web import domain_cap

    cand = spark.createDataFrame(
        [(f"doc{i}", "https://giant.com/x", "giant.com") for i in range(2000)],
        "doc_id string, url string, domain string",
    )
    # find the most occupied bucket and take only ITS docs, so the
    # whole domain collapses into one bucket whose count > max_docs
    bucketed = cand.withColumn("_b", mix_bucket("doc_id", "domcap"))
    top_bucket, n_in_bucket = (
        bucketed.groupBy("_b")
        .count()
        .orderBy(F.desc("count"), "_b")
        .first()
    )
    assert n_in_bucket >= 2
    df = bucketed.filter(F.col("_b") == top_bucket).drop("_b")
    out = domain_cap(df, max_docs=1)
    # old behavior: 0 rows. fixed: exactly the one occupied bucket
    assert out.count() == n_in_bucket
    # and a domain that DOES fit a prefix is still capped from below
    ok = domain_cap(cand, max_docs=100)
    assert 0 < ok.count() <= 100


def test_domain_cap_null_domain_passes_through(spark):
    """An unparseable URL (domain NULL) has nothing to cap against
    and is KEPT — the same NULL closure blocklist_gate documents;
    an inner join on domain would silently delete these rows."""
    from pyspark.sql import functions as F

    from lcmap_firebird_spark.operators.web import domain_cap

    df = spark.createDataFrame(
        [("d1", "https://a.com/x", "a.com"),
         ("d2", "not a url", None),
         ("d3", "", None),
         ("d4", "https://a.com/y", "a.com")],
        "doc_id string, url string, domain string",
    )
    out = domain_cap(df, max_docs=100)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {"d1", "d2", "d3", "d4"}
    # NULL rows are exempt from the cap, not counted toward it
    tight = domain_cap(df, max_docs=1)
    kept2 = {r["doc_id"] for r in tight.collect()}
    assert {"d2", "d3"} <= kept2
