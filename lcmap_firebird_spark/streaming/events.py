"""Streaming operators over the events stream.

The reference is batch-only (closed 'acquired' intervals,
ccdc/core.py:41-50); this module adds the Structured Streaming
equivalents a continuous-ingest deployment needs: watermarked
tumbling/sliding windows, session windows, and stateful dedup — all
built-ins, no custom state handling.

Scale notes:
- watermark delay bounds state size: tumbling/sliding state evicts
  once `ts < watermark`, session state once a session closes.
- `availableNow` triggers give deterministic batch-equivalent
  results over static files — which is what the oracle checks: the
  streaming plan must equal the batch aggregation of the same data.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def events_schema() -> StructType:
    """Static schema for the stream source (streams can't infer).
    ts is declared long so the reader hands back the raw int64
    regardless of the parquet logical annotation (NANOS in the
    round-1/2 testdata, MICROS-no-tz in round 3)."""
    return StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", LongType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events*.parquet",
) -> DataFrame:
    """File-source stream over the events table (one micro-batch per
    file with max_files_per_trigger=1 — used to exercise watermark
    advancement across batches)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(events_schema())
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    # Raw int64 may be nanos (legacy testdata) or micros (current);
    # decided once per dataset from the parquet footer of the first
    # matching file (catalog.ts_unit), with the per-row magnitude
    # sniff only as a no-stats fallback. timestamp_micros yields
    # TIMESTAMP (LTZ), whose internal value IS epoch µs — window()
    # alignment and unix_micros() on window bounds are timezone-free.
    from ..catalog import micros_expr, ts_unit

    unit = ts_unit(sf_dir, glob=glob)
    # STREAMING twist: the unit decision is baked into the plan, but
    # a live directory can accrete files of another generation after
    # the stream starts (exactly the regen hazard ts_unit exists
    # for). For a µs-pinned dataset, widen to the per-row magnitude
    # CASE: µs rows pass through unchanged (modern values are far
    # below the 1e17 cutoff) while a legacy ns file arriving
    # mid-stream is still divided correctly — the sniff's only blind
    # spot (pre-1973 ns rows) cannot occur in a µs-pinned dataset
    # gaining ns stragglers with modern data. A ns-pinned dataset
    # keeps the exact pinned conversion: µs rows are numerically
    # indistinguishable from pre-1973 ns there, so no per-row rule
    # could help (documented irreducible ambiguity).
    if unit == "us":
        unit = "sniff"
    return df.withColumn("ts", F.expr(f"timestamp_micros({micros_expr(unit)})"))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window aggregation (each event lands in
    width/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"), "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows: merge events within `gap`; state closes (and
    emits, in append mode) once the watermark passes session end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )


def dedup_keys(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Stateful streaming dedup: first arrival per key wins within
    the watermark horizon (state evicts after it). Only the keys are
    emitted — which row 'wins' per key is arrival-order dependent.

    HORIZON semantics, not global DISTINCT: a key whose state was
    evicted (watermark advanced past it between micro-batches) is
    emitted AGAIN on recurrence — that is what
    dropDuplicatesWithinWatermark means, and it is the bounded-state
    contract that survives 100 TB (global distinct needs unbounded
    state). The emitted key set equals SELECT DISTINCT only when the
    run is effectively single-batch (st3's registry query: one
    availableNow batch over the whole input — the oracle's DISTINCT
    twin is exact there). A multi-batch run over data spanning more
    than `watermark` of event time can legitimately emit duplicate
    key rows; consumers needing exact global dedup at scale use the
    batch/incremental dedup family (operators/dedup, incremental)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def purchases_after_signup(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join with a time-range condition: each
    purchase matched to every signup by the same user in the
    preceding `within` interval.

    Both sides carry watermarks; the range condition bounds the join
    state (signups evict once `p_ts > s_ts + within` is impossible
    under the watermark). Inner-join matches emit immediately — no
    emission hold — so availableNow output equals the batch join.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("s_event_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {within}"))
    )
    joined = purchases.join(signups, cond)
    return joined.select(
        "p_event_id",
        "s_event_id",
        F.col("p_user").alias("user_id"),
        "p_value",
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) carried across micro-batches — the escape
    hatch for stateful semantics the built-in windows can't express
    (SURVEY §2.11). State is one tiny tuple per key; at scale the
    state store shards by the group key like any keyed state.

    Emits the updated running totals for every user seen in each
    micro-batch (update semantics — the memory sink accumulates one
    row per (user, batch); take the max-n row per user for finals).
    """
    import pandas as pd

    def kernel(key, pdf_iter, state):
        (user_id,) = key
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n": [count], "total": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType="user_id long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on Spark 4's
    transformWithStateInPandas — the successor API to
    applyInPandasWithState, with typed state handles (ValueState
    here; List/Map state and timers available) backed by the RocksDB
    state store at scale.

    NOTE: this API requires a working `google.protobuf` install
    (the Python worker speaks protobuf to the JVM state server);
    environments without it should use `running_user_totals`
    (applyInPandasWithState), which is wire-protocol-free."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        TotalsProcessor(),
        outputStructType="user_id long, n long, total double",
        outputMode="Update",
        timeMode="None",
    )


_CKPT_ROOT: str | None = None
# Stateful ops allocate one state store per shuffle partition per
# operator; at local availableNow scale two stores per side measure
# faster than four (st4 1.8→1.6 s) and one loses scan parallelism.
LOCAL_STATE_PARTITIONS = 2


def streaming_conf() -> str:
    """One shared checkpoint ROOT per process (each query still gets
    its own subdirectory — checkpoints are per-query state, but the
    root is created/stat'd once). Returns the root path."""
    global _CKPT_ROOT
    if _CKPT_ROOT is None:
        import tempfile

        _CKPT_ROOT = tempfile.mkdtemp(prefix="firebird_stream_ckpt_")
    return _CKPT_ROOT


def run_available_now(
    stream_df: DataFrame,
    spark: SparkSession,
    mode: str = "append",
    finalize_watermark: bool = True,
) -> DataFrame:
    """Execute a streaming plan over everything currently available,
    collect via a memory sink, return the result as a static
    DataFrame.

    Mode choice decides the oracle semantics:
    - complete: every window/state row (batch-equivalent).
    - append: only state finalized below the final watermark
      (max event time − delay, advanced by the trailing no-data
      micro-batch) — late/open windows are withheld, exactly what a
      production append sink would see.

    `finalize_watermark=False` skips the trailing no-data micro-batch
    (`spark.sql.streaming.noDataMicroBatches.enabled=false`, captured
    into THIS query at start — conf-restore cannot leak it into a
    later query, verified by the r12 probe where a session-window run
    under the disabled conf emitted 0 rows). ONLY valid for operators
    whose emission never waits on the watermark — streaming dedup
    (first arrival emits in its own batch) and watermarked INNER
    stream-stream joins (matches emit immediately; the trailing batch
    only evicts state, which availableNow termination discards
    anyway). Row-identity under the skip is pinned by
    tests/test_streaming.py and the st3/st4 oracles. Append-mode
    AGGREGATIONS (session/tumbling windows) and outer joins MUST keep
    the default: their append emission happens precisely when the
    final watermark closes the state, so skipping the trailing batch
    withholds every final row (measured: st2 emits 0 rows). The
    trailing batch costs ~0.5-0.7 s per query at any scale — it is a
    fixed driver/state-store round, not data work."""
    name = f"st_{uuid.uuid4().hex[:12]}"
    # Stateful operators allocate one state store per shuffle
    # partition per operator; local availableNow runs over a few MB
    # don't need 32+ stores spun up and checkpointed —
    # LOCAL_STATE_PARTITIONS holds the measured choice. The partition
    # count is captured into the (fresh) checkpoint at start, so
    # scoping the conf around start() affects only this query. On a
    # real cluster you'd size this to throughput and keep it FIXED
    # for the checkpoint's lifetime.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    _ND = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_nd = spark.conf.get(_ND)
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(prev), LOCAL_STATE_PARTITIONS)),
        )
        if not finalize_watermark:
            spark.conf.set(_ND, "false")
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", os.path.join(streaming_conf(), name)
            )
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(_ND, prev_nd)
    q.awaitTermination()
    # detach the result from the memory sink so the per-query driver
    # state can be released: eager localCheckpoint materializes an
    # independent copy, after which the temp view and the per-query
    # checkpoint directory are dead weight — without this, every
    # invocation in a long-lived session leaked one full result set
    # on the driver plus one /tmp checkpoint tree
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    import shutil

    shutil.rmtree(os.path.join(streaming_conf(), name), ignore_errors=True)
    return out


# shipped to Python workers (pandas-UDF kernel in running_user_totals,
# StatefulProcessor in running_user_totals_tws) — CLAUDE.md rule 2;
# today both are function-local (cloudpickle falls back to by-value),
# but a hoist to module level must not start failing foreign-cwd runs
import sys  # noqa: E402

import pyspark  # noqa: E402

pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])
