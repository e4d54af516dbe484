"""Time-series query registry (events table).

u3 sessionize / u4 threshold segmentation are fully SQL-expressible
(window algebra) and oracle-checked; u5 is the applyInPandas CCD
kernel — genuinely non-SQL (iterative refit per break), so it's a
declared rows-only check (SURVEY §2.9 U3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators.segmentation import ccd_segments, sessionize, threshold_segments
from ..operators.timeseries import assemble

GAP_MIN = 30
LEVEL_T = 200.0
EPOCH_ORDINAL = 719_163  # date(1970,1,1).toordinal()


def u3_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, "events", sf)
    s = sessionize(ev, ["user_id"], "ts", GAP_MIN, order_cols=["event_id"])
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def u4_threshold_segments(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, "events", sf).withColumn("t_us", F.unix_micros("ts"))
    return threshold_segments(
        ev, ["user_id"], "t_us", "value", LEVEL_T, order_cols=["event_id"]
    )


def u5_ccd_segments(spark: SparkSession, sf: str) -> DataFrame:
    # epoch-day ordinals so ISO rendering is meaningful
    ev = read_table(spark, "events", sf).select(
        "user_id",
        (
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint")
            + F.lit(EPOCH_ORDINAL)
        ).alias("t"),
        F.col("value"),
    )
    daily = ev.groupBy("user_id", "t").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v")
    )
    return ccd_segments(daily, ["user_id"], "t", "v", min_obs=6, chi=3.0)


def x2_assemble_series(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, "events", sf).select(
        "user_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    wide = assemble(ev, ["user_id"], "t_us", ["value"])
    return wide.select(
        "user_id",
        F.col("t_uss").alias("t_list"),
        F.col("values").alias("v_list"),
    )


QUERIES = {
    "u3_sessionize": u3_sessionize,
    "u4_threshold_segments": u4_threshold_segments,
    "u5_ccd_segments": u5_ccd_segments,
    "x2_assemble_series": x2_assemble_series,
}

ORACLES = {
    "u3_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                             > {GAP_MIN} * 60000000
                         OR LAG(ts) OVER w IS NULL
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
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               epoch_us(MIN(ts)) AS start_us,
               epoch_us(MAX(ts)) AS end_us,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   AS sum_value
        FROM sessions GROUP BY user_id, session_id
    """,
    "u4_threshold_segments": f"""
        WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, value
                    FROM events),
        flagged AS (
            SELECT user_id, event_id, t_us, value,
                   CASE WHEN ABS(CAST(value AS DOUBLE)
                                 - CAST(LAG(value) OVER w AS DOUBLE)) > {LEVEL_T}
                         OR LAG(value) OVER w IS NULL
                        THEN 1 ELSE 0 END AS brk
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
        ),
        seg AS (
            SELECT user_id, t_us, value,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS segment_id
            FROM flagged
        )
        SELECT user_id, segment_id,
               MIN(t_us) AS seg_start, MAX(t_us) AS seg_end,
               COUNT(*) AS n_obs,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS avg_value
        FROM seg GROUP BY user_id, segment_id
    """,
    # u5_ccd_segments: applyInPandas kernel — declared rows-only.
    "x2_assemble_series": """
        SELECT user_id,
               list(epoch_us(ts) ORDER BY epoch_us(ts), value) AS t_list,
               list(value ORDER BY epoch_us(ts), value) AS v_list
        FROM events GROUP BY user_id
    """,
}
