"""Time-series query registry (events table).

u3 sessionize / threshold segmentation are fully SQL-expressible
(window algebra) and oracle-checked. u5 is the applyInPandas CCD
kernel — iterative refit per break, NOT expressible as plain SQL —
but since round 4 it still carries a full DuckDB oracle: a recursive
CTE replicates the sequential state machine step by step, and both
engines compute every windowed statistic as a sequential time-order
fold (kernel `_ssum` ↔ DuckDB `list_reduce`), making all doubles
bit-identical — exact hash parity for the flagship operator, no
quantization. Verified exact at sf0.001 and sf0.01.

Round-2 consolidation (driver records only 50 registry entries):
- u4_threshold_segments → u3_sessionize_threshold (tagged union)
- x2's assembled arrays are re-exploded with posexplode — the
  driver's pandas canonicalizer cannot sort list-typed cells, and
  the (pos ↔ sorted ts) pairing still proves the O2 array-ordering
  contract end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions.dates import micros
from ..operators.segmentation import ccd_segments, sessionize, threshold_segments
from ..operators.timeseries import assemble

GAP_MIN = 30
LEVEL_T = 200.0
from ..functions.dates import EPOCH_ORDINAL  # noqa: E402  (719163 = date(1970,1,1).toordinal(); single shared constant)


def u3_sessionize_threshold(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization and level-shift threshold segmentation
    over the same events scan, tagged by `kind` (folds old u3 + u4)."""
    ev = read_table(spark, "events", sf)
    s = sessionize(ev, ["user_id"], "ts", GAP_MIN, order_cols=["event_id"])
    sessions = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_obs"),
            micros(F.min("ts")).alias("start_us"),
            micros(F.max("ts")).alias("end_us"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("metric"),
        )
        .select(
            F.lit("session").alias("kind"),
            "user_id",
            F.col("session_id").cast("bigint").alias("seg_id"),
            "start_us",
            "end_us",
            "n_obs",
            "metric",
        )
    )
    ev_us = ev.withColumn("t_us", micros("ts"))
    segments = threshold_segments(
        ev_us, ["user_id"], "t_us", "value", LEVEL_T, order_cols=["event_id"]
    ).select(
        F.lit("threshold").alias("kind"),
        "user_id",
        F.col("segment_id").cast("bigint").alias("seg_id"),
        F.col("seg_start").alias("start_us"),
        F.col("seg_end").alias("end_us"),
        "n_obs",
        F.col("avg_value").alias("metric"),
    )
    return sessions.unionByName(segments)


def u5_ccd_segments(spark: SparkSession, sf: str) -> DataFrame:
    """CCD segments with a SCALAR-ONLY projection.

    The driver canonicalizes every query's output (rows-only entries
    included) with ``pandas.sort_values``, which dies on list cells —
    rounds 2 and 3 both lost the driver row to u5's ``coef:
    array<double>``. The kernel emits a 1-element coef today, so the
    registry projection replaces the array with ``element_at(coef, 1)
    AS c0``; the operator itself keeps its pyccd-shaped array schema
    (reference ccdc/pyccd.py:39-81) for in-plan consumers.
    """
    # epoch-day ordinals so ISO rendering is meaningful
    # Epoch-day via TRUNCATION toward zero on both engines: DuckDB's
    # integer `//` truncates (verified: -5 // 2 = -2, not -3), which
    # is exactly Spark's double-division + cast('bigint'). Pre-1970
    # (negative-µs) parity is pinned by the 1969 seed in
    # tests/test_ccd_cross_engine.py — do NOT "fix" either side to
    # floor without changing both.
    ev = read_table(spark, "events", sf).select(
        "user_id",
        (
            (micros("ts") / F.lit(86_400_000_000)).cast("bigint")
            + F.lit(EPOCH_ORDINAL)
        ).alias("t"),
        F.col("value"),
    )
    daily = ev.groupBy("user_id", "t").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v")
    )
    seg = ccd_segments(daily, ["user_id"], "t", "v", min_obs=6, chi=3.0)
    return seg.select(
        "user_id",
        "sday",
        "eday",
        "bday",
        "sdate",
        "edate",
        "chprob",
        F.element_at("coef", 1).alias("c0"),
        "intercept",
        "rmse",
        "magnitude",
        F.col("n_obs").cast("bigint").alias("n_obs"),
    )


def x2_assemble_series(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key series assembly with an explicit ordering contract
    (O2): sort_array(collect_list(struct)) inside `assemble`, then
    posexplode so position i provably holds the i-th (ts, value) in
    sorted order — scalar output for the driver's canonicalizer."""
    ev = read_table(spark, "events", sf).select(
        "user_id", micros("ts").alias("t_us"), "value"
    )
    wide = assemble(ev, ["user_id"], "t_us", ["value"])
    return wide.select(
        "user_id",
        F.size("t_uss").alias("n_obs"),
        F.posexplode(F.arrays_zip("t_uss", "values")).alias("pos", "z"),
    ).select(
        "user_id",
        "n_obs",
        "pos",
        F.col("z.t_uss").alias("t_us"),
        F.col("z.values").alias("value"),
    )


QUERIES = {
    "u3_sessionize_threshold": u3_sessionize_threshold,
    "u5_ccd_segments": u5_ccd_segments,
    "x2_assemble_series": x2_assemble_series,
}

ORACLES = {
    "u3_sessionize_threshold": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                             > {GAP_MIN} * 60000000
                         OR LAG(ts) OVER w IS NULL
                         OR ts IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        ev AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, value
               FROM events),
        tflag AS (
            SELECT user_id, event_id, t_us, value,
                   -- value IS NULL mirrors Spark's delta.isNull()
                   -- branch (a NULL current value also breaks);
                   -- without it a regenerated events table with one
                   -- NULL value diverges from that row onward
                   CASE WHEN ABS(CAST(value AS DOUBLE)
                                 - CAST(LAG(value) OVER w AS DOUBLE)) > {LEVEL_T}
                         OR LAG(value) OVER w IS NULL
                         OR value IS NULL
                        THEN 1 ELSE 0 END AS brk
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
        ),
        seg AS (
            SELECT user_id, t_us, value,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS segment_id
            FROM tflag
        )
        SELECT 'session' AS kind, user_id,
               CAST(session_id AS BIGINT) AS seg_id,
               epoch_us(MIN(ts)) AS start_us,
               epoch_us(MAX(ts)) AS end_us,
               COUNT(*) AS n_obs,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   AS metric
        FROM sessions GROUP BY user_id, session_id
        UNION ALL
        SELECT 'threshold' AS kind, user_id,
               CAST(segment_id AS BIGINT) AS seg_id,
               MIN(t_us) AS start_us, MAX(t_us) AS end_us,
               COUNT(*) AS n_obs,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS metric
        FROM seg GROUP BY user_id, segment_id
    """,
    # u5: a full DuckDB twin of the SEQUENTIAL CCD loop. The
    # recursive CTE is the per-user state machine (s = window start,
    # i = probe index, both 1-based; the kernel's 0-based while-loop
    # in operators/segmentation._detect); every windowed sum on both
    # engines is a sequential fold in time order (list_reduce here,
    # _ssum in the kernel), so all doubles — slope, intercept, rmse,
    # magnitude, and every break DECISION — are bit-identical
    # IEEE-754 op sequences: exact hash parity with no quantization.
    # Constants mirror the query: min_obs=6 (i starts at 7, break
    # restarts at i+6), peek=3, chi=3.0, rmse floor 1e-6, epoch
    # ordinal 719163.
    "u5_ccd_segments": """
        WITH RECURSIVE
        daily AS (
          SELECT user_id,
                 (epoch_us(ts) // 86400000000) + 719163 AS t,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
                      AS DOUBLE) AS v
          FROM events GROUP BY 1, 2
        ),
        ua AS (
          SELECT user_id,
                 list(CAST(t AS DOUBLE) ORDER BY t) AS lt,
                 list(v ORDER BY t) AS lv,
                 count(*) AS n
          FROM daily GROUP BY user_id
        ),
        st AS (
          SELECT user_id, CAST(1 AS BIGINT) AS s, CAST(7 AS BIGINT) AS i,
                 FALSE AS emitted,
                 CAST(NULL AS BIGINT) AS seg_s, CAST(NULL AS BIGINT) AS seg_i
          FROM ua
          UNION ALL
          SELECT q.user_id,
                 CASE WHEN q.broke THEN q.i ELSE q.s END AS s,
                 CASE WHEN q.broke THEN q.i + 6 ELSE q.i + 1 END AS i,
                 q.broke AS emitted, q.s AS seg_s, q.i AS seg_i
          FROM (
            SELECT st.user_id, st.s, st.i, ua.n,
                   st.i - st.s AS n2,
                   ua.lt[st.s : st.i - 1] AS wt,
                   ua.lv[st.s : st.i - 1] AS wv,
                   list_reduce(wt, (a,b) -> a + b) / n2 AS tm,
                   list_reduce(wv, (a,b) -> a + b) / n2 AS vm,
                   list_reduce(list_transform(generate_series(1, n2),
                       k -> (wt[k]-tm)*(wt[k]-tm)), (a,b)->a+b) AS den,
                   CASE WHEN den > 0 THEN
                       list_reduce(list_transform(generate_series(1, n2),
                           k -> (wt[k]-tm)*(wv[k]-vm)), (a,b)->a+b) / den
                   ELSE 0.0 END AS slope,
                   vm - slope * tm AS inter,
                   sqrt(list_reduce(list_transform(generate_series(1, n2),
                       k -> (wv[k]-(slope*wt[k]+inter))
                            *(wv[k]-(slope*wt[k]+inter))), (a,b)->a+b)
                        / greatest(n2-2, 1)) AS rmse,
                   (st.i + 2 <= ua.n) AND NOT list_contains(
                       list_transform(generate_series(0, 2),
                           k -> abs(ua.lv[st.i+k]
                                    -(slope*ua.lt[st.i+k]+inter))
                                > 3.0*greatest(rmse, 1e-6)),
                       FALSE) AS broke
            FROM st JOIN ua USING (user_id)
            WHERE st.i <= ua.n
          ) q
        ),
        seg_fit AS (
          SELECT st.user_id, st.seg_s AS s, st.seg_i AS e1, TRUE AS is_break
          FROM st WHERE st.emitted
          UNION ALL
          SELECT st.user_id, st.s, ua.n + 1 AS e1, FALSE
          FROM st JOIN ua USING (user_id) WHERE st.i > ua.n
        ),
        segs AS (
          SELECT f.user_id, f.is_break, f.e1, ua.lt,
                 f.e1 - f.s AS n2,
                 ua.lt[f.s : f.e1 - 1] AS wt,
                 ua.lv[f.s : f.e1 - 1] AS wv,
                 CASE WHEN n2 >= 2 THEN list_reduce(wt, (a,b)->a+b) / n2
                      ELSE 0.0 END AS tm,
                 CASE WHEN n2 >= 2 THEN list_reduce(wv, (a,b)->a+b) / n2
                      ELSE 0.0 END AS vm,
                 CASE WHEN n2 >= 2 THEN
                     list_reduce(list_transform(generate_series(1, n2),
                         k -> (wt[k]-tm)*(wt[k]-tm)), (a,b)->a+b)
                 ELSE 0.0 END AS den,
                 CASE WHEN n2 >= 2 AND den > 0 THEN
                     list_reduce(list_transform(generate_series(1, n2),
                         k -> (wt[k]-tm)*(wv[k]-vm)), (a,b)->a+b) / den
                 ELSE 0.0 END AS slope,
                 CASE WHEN n2 >= 2 THEN vm - slope * tm
                      ELSE wv[1] END AS inter,
                 CASE WHEN n2 >= 2 THEN
                     sqrt(list_reduce(list_transform(generate_series(1, n2),
                         k -> (wv[k]-(slope*wt[k]+inter))
                              *(wv[k]-(slope*wt[k]+inter))), (a,b)->a+b)
                          / greatest(n2-2, 1))
                 ELSE 0.0 END AS rmse,
                 CASE WHEN f.is_break THEN
                     list_reduce(list_transform(generate_series(0, 2),
                         k -> abs(ua.lv[f.e1+k]
                                  -(slope*ua.lt[f.e1+k]+inter))),
                         (a,b)->a+b) / 3.0
                 ELSE NULL END AS magnitude
          FROM seg_fit f JOIN ua USING (user_id)
        )
        SELECT user_id,
               CAST(wt[1] AS BIGINT) AS sday,
               CAST(wt[n2] AS BIGINT) AS eday,
               CASE WHEN is_break THEN CAST(lt[e1] AS BIGINT)
                    ELSE NULL END AS bday,
               CAST(DATE '0001-01-01'
                    + CAST(CAST(wt[1] AS BIGINT) - 1 AS INTEGER)
                    AS VARCHAR) AS sdate,
               CAST(DATE '0001-01-01'
                    + CAST(CAST(wt[n2] AS BIGINT) - 1 AS INTEGER)
                    AS VARCHAR) AS edate,
               CASE WHEN is_break THEN 1.0 ELSE 0.0 END AS chprob,
               slope AS c0,
               inter AS intercept,
               rmse,
               magnitude,
               CAST(n2 AS BIGINT) AS n_obs
        FROM segs
    """,
    "x2_assemble_series": """
        WITH s AS (
            SELECT user_id, epoch_us(ts) AS t_us, value,
                   -- NULLS FIRST mirrors Spark's struct sort
                   -- (sort_array puts a NULL value field smallest);
                   -- DuckDB's default NULLS LAST would swap pos for
                   -- NULL-value ties
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts),
                                               value NULLS FIRST) - 1 AS pos,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_obs
            FROM events)
        SELECT user_id, CAST(n_obs AS INT) AS n_obs, CAST(pos AS INT) AS pos,
               t_us, value
        FROM s
    """,
}
