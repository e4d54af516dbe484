"""Property-based tests (hypothesis) for the invariants that matter
most at scale: assembly round-trips, as-of join vs pandas
merge_asof, sessionization structure, and decimal-sum exactness."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators.asof import asof_join_backward
from lcmap_firebird_spark.operators.segmentation import sessionize
from lcmap_firebird_spark.operators.timeseries import assemble, explode_series

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

obs_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 1000),  # t
        st.integers(-10_000, 10_000),  # value (int: exact equality)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),  # one obs per (key, t)
)


@_slow
@given(rows=obs_strategy)
def test_assemble_explode_is_identity(spark, rows):
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    wide = assemble(df, ["k"], "t", ["v"])
    for r in wide.collect():
        assert list(r.ts) == sorted(r.ts)  # ordering contract
    back = explode_series(wide, ["k"], ["ts", "vs"], ["t", "v"])
    assert sorted(map(tuple, back.collect())) == sorted(rows)


@_slow
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),
        min_size=1, max_size=25, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(-99, 99)),
        min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(left, ["k", "t"])
    rdf = spark.createDataFrame(right, ["k", "t", "q"])
    got = {
        (r.k, r.t): r.q
        for r in asof_join_backward(ldf, rdf, ["k"], "t", ["q"]).collect()
    }
    lp = pd.DataFrame(left, columns=["k", "t"]).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(right, columns=["k", "t", "q"]).sort_values(
        "t", kind="mergesort"
    )
    want_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {
        (int(r.k), int(r.t)): (None if pd.isna(r.q) else int(r.q))
        for r in want_df.itertuples()
    }
    assert got == want


@_slow
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 10_000)),
        min_size=1, max_size=40, unique=True,
    ),
    gap=st.integers(1, 60),
)
def test_sessionize_invariants(spark, rows, gap):
    df = spark.createDataFrame(
        [(k, t * 1_000_000) for k, t in rows], ["k", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    out = sessionize(df, ["k"], "ts", gap_minutes=gap).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append((r.t_us, r.session_id))
    for series in by_key.values():
        series.sort()
        sid = 0
        for i, (t, s) in enumerate(series):
            if i == 0:
                assert s == 1  # sessions are 1-based per key
            else:
                prev_t, prev_s = series[i - 1]
                gap_exceeded = (t - prev_t) > gap * 60_000_000
                assert s == prev_s + (1 if gap_exceeded else 0)


@_slow
@given(
    vals=st.lists(
        st.decimals(
            min_value=-99_999, max_value=99_999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_sum_is_exact(spark, vals):
    from decimal import Decimal

    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    got = df.agg(
        F.sum(F.col("x").cast("decimal(18,2)")).alias("s")
    ).first().s
    want = sum(Decimal(str(float(v))).quantize(Decimal("0.01")) for v in vals)
    assert got == want
