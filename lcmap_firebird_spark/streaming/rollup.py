"""Streaming incremental rollup — a continuous time-bucket aggregate
(the "hypertable rollup" shape) maintained by foreachBatch.

The watermarked window aggregations in streaming/events.py answer
"what closed recently": state is evicted once the watermark passes, so
an event older than the delay can never revise a bucket. A rollup
TABLE has the opposite contract — it is a long-lived queryable
aggregate over all history where arbitrarily late data must still
land in its (old) bucket. That contract can't live in Spark's state
store (private to one query, watermark-bounded, sized for per-key
scalars), so the right primitive is `foreachBatch` merging partial
aggregates into a persisted store — the same reasoning as the
incremental-dedup runner (streaming/dedup_stream.py).

Scale design:
- Each micro-batch computes its OWN partial aggregate first (count +
  decimal-exact sum per bucket) — a map-side-combinable groupBy whose
  output cardinality is buckets×types, not rows. Only those partials
  shuffle into the merge.
- The merge is `store ∪ partial → groupBy keys → sum` — count and
  decimal sums are associative+commutative, so merging partials is
  exact (no mean-of-means trap; derive averages at read time as
  sum/n). Store cost per trigger is one scan of the rollup table,
  which is aggregate-sized, not corpus-sized; partition the store by
  bucket date in production and the scan prunes to touched dates.
- Exactly-once without Delta: snapshots are written to directories
  derived from `batch_id` (`v{batch_id+1}`, reading `v{batch_id}`)
  with mode("overwrite"), so a crash-replayed batch deterministically
  rewrites the same bytes instead of double-counting — and no
  directory is rewritten while a lazy plan reads it. Swap the
  parquet snapshot dirs for a Delta/Iceberg MERGE in production.

Invariant (tests/test_streaming_rollup.py): streaming the events in
N file-chunks produces a final rollup identical to the one-shot batch
GROUP BY, including across a stop + new-files + resume cycle, and
late out-of-order chunks revise old buckets.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.errors import AnalysisException

from .events import stream_events


def rollup_schema() -> StructType:
    """Schema of the rollup store: time bucket × event_type partial
    aggregates. Sums are DECIMAL so merges are exact (associative,
    order-independent) — the same decimal-exact recipe as
    functions/exact.py. The binary columns are Datasketches state:
    HLL registers for distinct users and a KLL sketch for value
    quantiles — MERGEABLE aggregates, which is what lets a continuous
    aggregate answer COUNT(DISTINCT) and percentile queries that
    plain partial sums cannot (register-max / compaction merge
    replaces a full re-scan of history)."""
    return StructType(
        [
            StructField("win_start_us", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("n", LongType(), True),
            StructField("sum_value", DecimalType(28, 2), True),
            StructField("users_hll", BinaryType(), True),
            StructField("value_kll", BinaryType(), True),
            StructField("users_theta", BinaryType(), True),
        ]
    )


def partial_rollup(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """One batch's partial aggregate: (bucket, event_type) → count +
    exact decimal sum. Map-side combinable; output is
    aggregate-cardinality."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("sum_value"),
            F.hll_sketch_agg("user_id").alias("users_hll"),
            F.kll_sketch_agg_double("value").alias("value_kll"),
            # theta costs a little more than HLL but supports set
            # ALGEBRA (intersection/difference) — what powers the
            # new/returning/churned retention read below
            F.theta_sketch_agg("user_id").alias("users_theta"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
            "users_hll",
            "value_kll",
            "users_theta",
        )
    )


def merge_rollup(store: DataFrame, partial: DataFrame) -> DataFrame:
    """Merge one batch's partials into the store: a full-outer join
    on the bucket key (each side holds at most one row per key), with
    per-column combination — exact for count and decimal sums
    (associative + commutative), register-wise max for HLL (also
    order-independent, so chunked merges reproduce the one-shot
    sketch exactly), and KLL compaction merge with bounded rank error
    along any merge path. The sketch merges are binary scalar
    functions, which is why this is a join, not a union+groupBy.

    The key join is NULL-SAFE: a NULL event_type is a legitimate
    bucket (batch GROUP BY treats NULLs as one group), and a plain
    equi-join would never match it — the store would re-insert a
    fresh (win, NULL) row every micro-batch instead of merging,
    silently breaking chunked == one-shot."""
    s, p = store.alias("s"), partial.alias("p")
    keys = ["win_start_us", "event_type"]

    def _pair(col: str):
        return F.col(f"s.{col}"), F.col(f"p.{col}")

    def _merge(col: str, fn) -> F.Column:
        a, b = _pair(col)
        return (
            F.when(a.isNull(), b).when(b.isNull(), a).otherwise(fn(a, b))
        ).alias(col)

    cond = None
    for k in keys:
        term = F.col(f"s.{k}").eqNullSafe(F.col(f"p.{k}"))
        cond = term if cond is None else (cond & term)
    return s.join(p, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"s.{k}"), F.col(f"p.{k}")).alias(k)
            for k in keys
        ],
        _merge("n", lambda a, b: a + b),
        _merge(
            "sum_value", lambda a, b: (a + b).cast("decimal(28,2)")
        ),
        _merge("users_hll", F.hll_union),
        _merge("value_kll", F.kll_sketch_merge_double),
        _merge("users_theta", F.theta_union),
    )


def _snapshot_path(work_dir: str, version: int) -> str:
    return f"{work_dir}/rollup/v{version:06d}"


def _committed_versions(work_dir: str) -> list[int]:
    """Snapshot versions whose write COMMITTED (directory carries the
    `_SUCCESS` marker Spark's file committer writes last). Spark
    creates the version directory before any data lands, so a bare
    `v*` listing would count an in-flight or crashed write as a
    snapshot (round-3 advice) — markers.is_committed is the one
    commit-marker predicate, shared with dedup_stream's stores."""
    from .markers import is_committed

    root = f"{work_dir}/rollup"
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(root)
        if d.startswith("v")
        and d[1:].isdigit()
        and is_committed(os.path.join(root, d))
    )


def _read_snapshot(
    spark: SparkSession, work_dir: str, version: int
) -> DataFrame:
    """Highest COMMITTED snapshot ≤ `version`, or the empty rollup.

    Readers pass `latest_version()` (committed by construction);
    foreachBatch replay passes its exact batch_id, which is always
    committed under the protocol (version N is written and committed
    by batch N-1 before Spark ever delivers batch N). Stepping down
    to the previous committed version — instead of silently returning
    the EMPTY store — is the recovery behavior for a corrupted or
    concurrently-written store.

    Known replay window: a crash AFTER committing v{N+1} but BEFORE
    the checkpoint commit makes batch N replay and overwrite
    v{N+1}'s directory; a CONCURRENT reader that already resolved
    v{N+1} and got past the plan-time schema read can still hit
    FileNotFoundException at action time while the overwrite is
    mid-flight. The AnalysisException catch below covers only the
    plan-time race. This demo store accepts that single-writer ×
    concurrent-reader replay window; deployments needing read
    isolation during crash replay should use the lakehouse sink
    (streaming/lake_sink.py), whose commit-log snapshots are
    immutable by construction."""
    for v in reversed(_committed_versions(work_dir)):
        if v <= version:
            try:
                return spark.read.parquet(_snapshot_path(work_dir, v))
            except AnalysisException:
                continue
    return spark.createDataFrame([], rollup_schema())


def latest_version(work_dir: str) -> int:
    """Highest committed snapshot version (0 = empty store). Local-fs
    listing; a cluster deployment reads the table version from
    Delta/Iceberg metadata instead."""
    return max(_committed_versions(work_dir), default=0)


def read_rollup(spark: SparkSession, work_dir: str) -> DataFrame:
    """The current rollup table (latest committed snapshot), with the
    decimal sum rendered as double at the read edge (sum_value) and
    the exact mean derivable as sum/n."""
    snap = _read_snapshot(spark, work_dir, latest_version(work_dir))
    return snap.select(
        "win_start_us",
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.hll_sketch_estimate("users_hll").alias("approx_users"),
        F.kll_sketch_get_quantile_double("value_kll", F.lit(0.5)).alias(
            "p50_value"
        ),
    )


def bucket_retention(spark: SparkSession, work_dir: str) -> DataFrame:
    """Per-bucket user retention from the theta sketches: for each
    (event_type, bucket) vs the PREVIOUS bucket of the same type,
    estimate returning (intersection), new (difference current−prev)
    and churned (difference prev−current) users — set algebra no
    plain aggregate or HLL sketch can answer without re-scanning raw
    history. One window lag over the aggregate-sized store; theta
    estimates are exact while sketches stay in exact mode (distinct
    users per bucket below the nominal 4096 entries)."""
    from pyspark.sql.window import Window

    snap = _read_snapshot(spark, work_dir, latest_version(work_dir))
    w = Window.partitionBy("event_type").orderBy("win_start_us")
    cur, prev = F.col("users_theta"), F.lag("users_theta").over(w)
    return snap.select(
        "win_start_us",
        "event_type",
        F.theta_sketch_estimate("users_theta").alias("users"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.theta_sketch_estimate(F.theta_intersection(cur, prev)))
        .alias("returning"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.theta_sketch_estimate(F.theta_difference(cur, prev)))
        .alias("new_users"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.theta_sketch_estimate(F.theta_difference(prev, cur)))
        .alias("churned"),
    )


def continuous_rollup(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    width: str = "1 hour",
    max_files_per_trigger: int | None = 1,
):
    """Start (available-now) the streaming rollup maintenance query.

    Returns the StreamingQuery; callers awaitTermination(). Restarts
    with the same `work_dir` resume from the checkpoint — seen files
    are not reprocessed and snapshots advance idempotently by
    batch_id.
    """
    events = stream_events(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger,
        glob="*.parquet",
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        store = _read_snapshot(spark, work_dir, batch_id)
        partial = partial_rollup(batch_df, width)
        merge_rollup(store, partial).write.mode("overwrite").parquet(
            _snapshot_path(work_dir, batch_id + 1)
        )

    return (
        events.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{work_dir}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )


# driver-side foreachBatch closures reference this module; keep the
# foreign-cwd pickling contract uniform (CLAUDE.md invariant 2)
import pyspark  # noqa: E402

pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])
