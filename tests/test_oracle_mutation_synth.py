"""Synthesized-corpus mutation certification — closing the r9 audit's
data-sensitivity holes.

test_oracle_mutation.py certified every registry slot against the
driver's parquet at sf0.001, and found five rules that corpus CANNOT
exercise (no exact duplicates, no threshold-adjacent jaccard pairs,
every user has every event type, every key fits in 8 bits, LIMIT-10
visibility). Here each such rule gets a TINY synthesized corpus
built to straddle exactly the boundary the shipped data misses: the
synthesized tables are registered into a fresh DuckDB connection
under the SAME view names, the registry's own ORACLES[...] strings
run verbatim against them (so the twin text itself is what's being
certified, not a re-derivation), baseline parity is asserted, and the
previously-undetectable mutation is proven RED.

(The sql1 LIMIT-10 blindness is not closed here: it is inherent to
top-k semantics — a change confined to non-top rows is invisible to
ANY faithful top-k oracle — so there is no rule left to certify.)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from oracle_compare import compare  # noqa: E402

from lcmap_firebird_spark.operators import dedup as D  # noqa: E402
from lcmap_firebird_spark.queries import dedup as QD  # noqa: E402
from lcmap_firebird_spark.queries import extended as QE  # noqa: E402


def _fresh_oracle(**tables: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, df in tables.items():
        con.register(name, df)
    return con


def _want(con, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetchdf()


def _green(got_df, con, sql):
    v = compare(got_df.toPandas(), _want(con, sql))
    assert all(v.values()), f"baseline not green on synth corpus: {v}"


def _red(got_df, con, sql, label):
    v = compare(got_df.toPandas(), _want(con, sql))
    assert not all(v.values()), f"mutation {label!r} stayed green on synth corpus"


def test_synth_d1_keeper_rule(spark):
    """Exact duplicates PRESENT: the min-id keeper rule becomes
    oracle-visible, and a max-id mutant goes red (undetectable on the
    shipped corpus, which has zero exact dups)."""
    rows = [(1, "alpha"), (2, "alpha"), (3, "beta"), (4, "beta"),
            (5, "beta"), (6, "gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = _fresh_oracle(documents=pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = QD.ORACLES["d1_exact_dedup"]
    _green(D.exact_dedup(docs), con, sql)
    from lcmap_firebird_spark.operators.text import fingerprint

    mut = (
        docs.select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.max("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )
    _red(mut, con, sql, "keeper min -> max")


def test_synth_d2_threshold_adjacent(spark):
    """A pair engineered to jaccard = 4/12 = 0.333 — just above the
    pinned 0.3 threshold. Baseline parity holds in the adjacent
    region the shipped bimodal corpus never populates, and a +0.05
    threshold drift (undetectable there) goes red here."""
    rows = [
        (1, "a b c d e f g h i j"),   # shingles: abc..hij (8)
        (2, "a b c d e f x y z w"),   # shares abc,bcd,cde,def (4); union 12
        (3, "completely different text entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = _fresh_oracle(documents=pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = QD.ORACLES["d2_ngram_jaccard"]
    base = D.jaccard_pairs(docs, QD.JACCARD_T, k=QD.K)
    assert base.count() == 1  # the engineered pair, nothing else
    _green(base, con, sql)
    _red(
        D.jaccard_pairs(docs, QD.JACCARD_T + 0.05, k=QD.K),
        con, sql, "threshold 0.3 -> 0.35",
    )


def test_synth_a10_missing_cell(spark):
    """A user MISSING event types: the COALESCE(0) null-fill becomes
    oracle-visible (DuckDB's COUNT FILTER yields 0, an un-coalesced
    pivot yields NULL) — undetectable on the shipped corpus where
    every user has all five types."""
    rows = [(1, "click"), (1, "click"), (2, "click"), (2, "error"),
            (2, "purchase"), (2, "signup"), (2, "view")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    con = _fresh_oracle(events=pd.DataFrame(rows, columns=["user_id", "event_type"]))
    sql = QE.ORACLES["a10_pivot"]
    base = ev.groupBy("user_id").pivot("event_type", QE.EVENT_TYPES).count()
    filled = base.select(
        "user_id", *[F.coalesce(t, F.lit(0)).alias(t) for t in QE.EVENT_TYPES]
    )
    _green(filled, con, sql)
    _red(
        base.select("user_id", *QE.EVENT_TYPES),
        con, sql, "COALESCE(0) dropped",
    )


def test_synth_z1_mask_width(spark):
    """Keys >= 256 make the interleave mask width observable: bits=16
    matches the twin, bits=8 wraps l_partkey=300 and goes red —
    undetectable at sf0.001 where every key fits in 8 bits."""
    from lcmap_firebird_spark.operators.zorder import zvalue

    rows = [(1, 1, 300, 7), (2, 1, 255, 9), (3, 2, 1023, 300)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long"
    )
    con = _fresh_oracle(
        lineitem=pd.DataFrame(
            rows, columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
        )
    )
    sql = QE.ORACLES["z1_zorder"]

    def q(bits):
        z = zvalue(["l_partkey", "l_suppkey"], bits=bits)
        return li.select(
            "l_orderkey", "l_linenumber", z.alias("zval"),
            F.shiftright(z, 24).alias("zbucket"),
        )

    _green(q(16), con, sql)
    _red(q(8), con, sql, "mask width 16 -> 8 with keys >= 256")


def test_synth_st4_join_window_boundary(spark, tmp_path):
    """A purchase exactly 45 min after a signup makes the stream-
    stream join's 1-hour window observable: the 30-minute mutant
    drops the pair — undetectable at sf0.001 where no purchase lands
    30-60 min after a signup. Runs the REAL streaming job over a
    synthesized events directory, oracle = the registry twin."""
    import datetime as dt

    from lcmap_firebird_spark.queries import streaming as QST
    from lcmap_firebird_spark.streaming import events as ST

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def us(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, 10, "signup", us(0), 1.0, "{}"),
        (2, 10, "purchase", us(45), 5.0, "{}"),   # inside 1h, outside 30m
        (3, 10, "purchase", us(200), 7.0, "{}"),  # outside both
        (4, 11, "signup", us(0), 1.0, "{}"),
        (5, 11, "purchase", us(10), 2.0, "{}"),   # inside both
        (6, 11, "view", us(500), 0.0, "{}"),      # advances the watermark
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value", "props"]
    )
    sf_dir = str(tmp_path / "synth_sf")
    os.makedirs(sf_dir)
    # ONE file named events.parquet in the driver's current physical
    # generation (timestamp[us] no-tz) — the stream source's
    # pathGlobFilter matches file names, so a Spark-written DIRECTORY
    # of part files would stream zero rows
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    ts_idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        ts_idx, "ts", tbl.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    con = _fresh_oracle(events=pdf)
    sql = QST.ORACLES["st4_stream_stream_join"]

    def run(within):
        stream = ST.stream_events(spark, sf_dir)
        return ST.run_available_now(
            ST.purchases_after_signup(stream, within, QST.WATERMARK),
            spark,
            mode="append",
        )

    base = run("1 hour")
    assert base.count() == 2  # both in-window pairs
    _green(base, con, sql)
    _red(run("30 minutes"), con, sql, "join window 1h -> 30m")
