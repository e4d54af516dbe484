"""Streaming incremental rollup (continuous aggregate) invariants:
chunked streaming == one-shot batch aggregate, late data revises old
buckets (no watermark loss), and a stop + new-files + resume cycle
stays exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.functions.dates import micros
from lcmap_firebird_spark.streaming import rollup as R


def _write_chunks(spark, sf_dir, out_dir, n_chunks=3, newest_first=True):
    """Split events into chunk files with long-µs ts (the stream
    source's declared physical type). newest_first makes every later
    chunk strictly LATE data for the earlier chunks' buckets."""
    ev = (
        read_table(spark, "events", sf_dir)
        .withColumn("ts", micros("ts"))
        .orderBy(F.col("ts").desc() if newest_first else F.col("ts").asc())
        .withColumn("rn", F.monotonically_increasing_id())
        .collect()
    )
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    size = (len(ev) + n_chunks - 1) // n_chunks
    import os
    import time

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_chunks):
        chunk = ev[i * size : (i + 1) * size]
        pdf = pd.DataFrame({c: [r[c] for r in chunk] for c in cols})
        p = f"{out_dir}/chunk{i}.parquet"
        pdf.to_parquet(p)  # single FILE — the stream source lists files
        paths.append(p)
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    return paths


def _one_shot(spark, sf_dir, width="1 hour"):
    """Batch ground truth through the same µs→LTZ conversion the
    stream applies. HLL estimates compare EXACTLY (register-max union
    is order-independent); KLL quantiles only to rank tolerance
    (compaction depends on the merge path), so they are checked
    separately in _kll_close."""
    ev = read_table(spark, "events", sf_dir).withColumn(
        "ts", F.timestamp_micros(micros("ts"))
    )
    return R.partial_rollup(ev, width).select(
        "win_start_us",
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.hll_sketch_estimate("users_hll").alias("approx_users"),
        F.kll_sketch_get_quantile_double("value_kll", F.lit(0.5)).alias(
            "p50_value"
        ),
    )


def _rows(df):
    return sorted(
        (r.win_start_us, r.event_type, r.n, round(r.sum_value or 0.0, 2), r.approx_users)
        for r in df.collect()
    )


def _kll_close(got_df, want_df):
    """Chunk-merged KLL medians within rank tolerance of one-shot:
    both sketches see the same data, so their p50s bracket the true
    median within ~2 KLL normalized rank errors (~1.7% total at the
    default k=200) — compare by value span of the per-bucket set."""
    g = {(r.win_start_us, r.event_type): r.p50_value for r in got_df.collect()}
    w = {(r.win_start_us, r.event_type): r.p50_value for r in want_df.collect()}
    assert g.keys() == w.keys()
    import math

    for key, gv in g.items():
        wv = w[key]
        if gv is None or wv is None:
            assert gv == wv
            continue
        # values in the testdata span ~[0, 1000]; rank error of a few
        # % translates to a bounded value gap on any smooth bucket
        assert math.isclose(gv, wv, rel_tol=0.25, abs_tol=50.0), (key, gv, wv)


def test_chunked_rollup_equals_one_shot_and_late_data_lands(
    spark, sf_dir, tmp_path
):
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    _write_chunks(spark, sf_dir, src, n_chunks=3, newest_first=True)

    q = R.continuous_rollup(spark, src, work, width="1 hour")
    q.awaitTermination()

    assert R.latest_version(work) == 3  # one snapshot per chunk
    got_df, want_df = R.read_rollup(spark, work), _one_shot(spark, sf_dir)
    assert _rows(got_df) == _rows(want_df)
    _kll_close(got_df, want_df)

    # HLL estimates track the true distinct-user counts (~1.6% rel
    # std err at default lgK=12; allow 10%)
    ev = read_table(spark, "events", sf_dir).withColumn(
        "ts", F.timestamp_micros(micros("ts"))
    )
    truth = {
        (r.w_us, r.event_type): r.nd
        for r in ev.groupBy(
            F.unix_micros(F.window("ts", "1 hour").start).alias("w_us"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    for r in got_df.collect():
        nd = truth[(r.win_start_us, r.event_type)]
        assert abs(r.approx_users - nd) <= max(2.0, 0.1 * nd)

    # late-data property: chunks streamed newest-first, so batches 2-3
    # carried only events OLDER than snapshot v1's buckets — v1 must
    # be a strict subset of the final aggregate (old buckets were
    # created/revised by later batches, never evicted).
    v1 = spark.read.parquet(R._snapshot_path(work, 1))
    assert v1.count() < want_df.count()


def test_bucket_retention_matches_exact_set_algebra(spark, sf_dir, tmp_path):
    """Theta-sketch retention vs exact per-bucket user sets: sketches
    stay in exact mode at these cardinalities, so the estimates equal
    the true intersection/difference sizes."""
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    _write_chunks(spark, sf_dir, src, n_chunks=2, newest_first=False)
    R.continuous_rollup(spark, src, work, width="1 hour").awaitTermination()

    got = {
        (r.win_start_us, r.event_type): (r.returning, r.new_users, r.churned)
        for r in R.bucket_retention(spark, work).collect()
        if r.returning is not None
    }
    assert got  # at least one bucket has a predecessor

    ev = read_table(spark, "events", sf_dir).withColumn(
        "ts", F.timestamp_micros(micros("ts"))
    )
    sets: dict = {}
    for r in ev.select(
        F.unix_micros(F.window("ts", "1 hour").start).alias("w_us"),
        "event_type",
        "user_id",
    ).collect():
        sets.setdefault((r.event_type, r.w_us), set()).add(r.user_id)
    for et_w, (ret, new, churn) in got.items():
        w_us, et = et_w
        prev_w = max(
            (w for (t, w) in sets if t == et and w < w_us), default=None
        )
        cur_s, prev_s = sets[(et, w_us)], sets[(et, prev_w)]
        assert (ret, new, churn) == (
            float(len(cur_s & prev_s)),
            float(len(cur_s - prev_s)),
            float(len(prev_s - cur_s)),
        ), et_w


def test_stop_resume_is_exactly_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    paths = _write_chunks(spark, sf_dir, src, n_chunks=3, newest_first=False)

    # first run sees only chunks 0-1 (hide chunk 2 by moving it away)
    import shutil

    hidden = str(tmp_path / "hidden")
    shutil.move(paths[2], hidden)
    R.continuous_rollup(spark, src, work).awaitTermination()
    v_mid = R.latest_version(work)
    assert v_mid == 2

    # resume with the third chunk present: the checkpoint replays
    # nothing (no double counting), processes only the unseen file
    shutil.move(hidden, paths[2])
    R.continuous_rollup(spark, src, work).awaitTermination()
    assert R.latest_version(work) == 3

    got_df, want_df = R.read_rollup(spark, work), _one_shot(spark, sf_dir)
    assert _rows(got_df) == _rows(want_df)
    _kll_close(got_df, want_df)


def test_uncommitted_snapshot_is_invisible(spark, sf_dir, tmp_path):
    """Round-3 advice: Spark creates the snapshot dir before commit,
    so an in-flight/crashed write (no _SUCCESS) must be invisible to
    latest_version()/read_rollup(), which instead serve the previous
    COMMITTED snapshot — never the empty store."""
    import os

    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    _write_chunks(spark, sf_dir, src, n_chunks=2, newest_first=False)
    R.continuous_rollup(spark, src, work).awaitTermination()
    committed = R.latest_version(work)
    assert committed == 2
    n_committed = R.read_rollup(spark, work).count()
    assert n_committed > 0

    # simulate a crash mid-write of the NEXT snapshot: dir exists,
    # maybe partial data, no _SUCCESS marker
    crashed = f"{work}/rollup/v{committed + 1:06d}"
    os.makedirs(crashed)
    with open(f"{crashed}/part-00000.parquet", "wb") as fh:
        fh.write(b"not parquet")

    assert R.latest_version(work) == committed
    assert R.read_rollup(spark, work).count() == n_committed


def test_merge_rollup_null_key_buckets_merge(spark):
    """A NULL event_type is one legitimate GROUP BY bucket: the
    store merge must be null-safe, or every micro-batch re-inserts a
    fresh (win, NULL) row instead of merging (chunked != one-shot)."""
    from lcmap_firebird_spark.streaming.rollup import (
        merge_rollup,
        partial_rollup,
    )

    def batch(ts_s, et, val):
        return spark.createDataFrame(
            [(1, ts_s, 7, et, val, "{}")],
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )

    import datetime as dt

    t = dt.datetime(2024, 1, 1, 9, 10)
    p1 = partial_rollup(batch(t, None, 1.0))
    p2 = partial_rollup(batch(t, None, 2.0))
    merged = merge_rollup(p1, p2)
    rows = merged.collect()
    assert len(rows) == 1  # ONE merged NULL bucket, not two rows
    assert rows[0]["n"] == 2
    assert float(rows[0]["sum_value"]) == 3.0
