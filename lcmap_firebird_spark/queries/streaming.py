"""Streaming query registry — each query runs a real Structured
Streaming job (file source → watermarked stateful op → memory sink,
availableNow trigger) and returns the materialized result, so the
DuckDB oracle checks streaming semantics against batch SQL:

- st1 complete-mode tumbling windows ≡ plain GROUP BY time bucket
- st2 append-mode session windows ≡ gap-sessionization with the
  final-watermark cutoff (end ≤ max(ts) − delay)
- st3 streaming dedup key set ≡ SELECT DISTINCT
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import events as ST

GAP_MIN = 30
WATERMARK = "2 hours"


def st1_tumbling_counts(spark: SparkSession, sf: str) -> DataFrame:
    stream = ST.stream_events(spark, sf)
    agg = ST.tumbling_counts(stream, "1 hour", WATERMARK)
    return ST.run_available_now(agg, spark, mode="complete")


def st2_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    stream = ST.stream_events(spark, sf)
    agg = ST.session_counts(stream, f"{GAP_MIN} minutes", WATERMARK)
    return ST.run_available_now(agg, spark, mode="append")


def st3_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    stream = ST.stream_events(spark, sf)
    deduped = ST.dedup_keys(stream, ["user_id", "event_type"], WATERMARK)
    # dedup emits first arrivals in their own batch — the trailing
    # no-data watermark round only evicts state (row-identity under
    # the skip pinned by test_streaming + the oracle)
    return ST.run_available_now(
        deduped, spark, mode="append", finalize_watermark=False
    )


def st4_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    stream = ST.stream_events(spark, sf)
    joined = ST.purchases_after_signup(stream, "1 hour", WATERMARK)
    # INNER join matches emit immediately — no emission hold, so the
    # trailing no-data round is pure state-eviction overhead
    return ST.run_available_now(
        joined, spark, mode="append", finalize_watermark=False
    )


QUERIES = {
    "st1_tumbling_counts": st1_tumbling_counts,
    "st2_session_windows": st2_session_windows,
    "st3_stream_dedup": st3_stream_dedup,
    "st4_stream_stream_join": st4_stream_stream_join,
}

ORACLES = {
    "st1_tumbling_counts": """
        SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
               event_type,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "st2_session_windows": f"""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                             > {GAP_MIN} * 60000000
                         OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        agg AS (
            SELECT user_id,
                   epoch_us(MIN(ts)) AS start_us,
                   epoch_us(MAX(ts)) + {GAP_MIN} * 60000000 AS end_us,
                   COUNT(*) AS n_events
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT user_id, start_us, end_us, n_events
        FROM agg
        WHERE end_us <= (SELECT MAX(epoch_us(ts)) FROM events)
                        - CAST(7200 AS BIGINT) * 1000000
    """,
    "st3_stream_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "st4_stream_stream_join": """
        SELECT p.event_id AS p_event_id,
               s.event_id AS s_event_id,
               p.user_id,
               p.value AS p_value
        FROM events p JOIN events s
          ON p.user_id = s.user_id
         AND p.event_type = 'purchase' AND s.event_type = 'signup'
         AND p.ts >= s.ts
         AND p.ts <= s.ts + INTERVAL 1 HOUR
    """,
}
