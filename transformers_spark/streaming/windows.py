"""Structured Streaming operators (beyond-parity extension).

The reference has no streaming surface — its late-data story is batch
re-runs (SURVEY.md §2.B "Streaming operators: none"). A Spark-native
engine gets streaming nearly free, so the windowed-aggregation shape
of the batch engine is mirrored here: event-time tumbling windows with
watermarked late-data handling, plus a custom stateful sessionization
operator on ``applyInPandasWithState`` (the pattern for operators the
built-ins can't express).

Tested with file sources + ``availableNow`` triggers: identical code
runs against Kafka/rate sources on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterable
from contextlib import contextmanager
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "EVENT_SCHEMA",
    "streaming_event_counts",
    "streaming_distinct",
    "streaming_view_purchase_join",
    "streaming_static_enrichment",
    "streaming_running_totals",
    "sessionize",
    "run_available_now",
    "shuffle_partitions",
]


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily pin ``spark.sql.shuffle.partitions``. The conf is
    read at EXECUTION time, so the plan must actually run (a streaming
    drain, collect, or eager localCheckpoint) INSIDE this window for
    the width to apply — a lazily returned plan executes at the
    caller's width. Single-sourced here for the seven spec sites that
    size state-store / small-table shuffles to 8 (see
    q_streaming_hourly_counts' measurement note)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def streaming_event_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed counts over a file-streaming events source.
    Late rows beyond the watermark are dropped (state is bounded — the
    property that matters at scale). ``slide`` < ``window`` switches to
    HOPPING windows: each event lands in window/slide buckets and state
    grows by the same constant factor (still watermark-bounded)."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide or window).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal sum: exact regardless of micro-batch arrival order
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_distinct(
    spark: SparkSession,
    source_dir: str,
    cols: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str | None = None,
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: each distinct key is emitted once, on
    first arrival; state holds one entry per distinct key.

    Projecting to exactly the dedup keys makes the append output equal
    batch ``SELECT DISTINCT`` regardless of arrival order — which is
    what puts the stateful dedup operator itself under the oracle gate.

    ``watermark`` switches to ``dropDuplicatesWithinWatermark``: state
    is evicted once the watermark passes a key (bounded state, the
    100 TB shape) at the cost of re-emitting duplicates that arrive
    later than the watermark delay — so only the unbounded form is
    batch-equivalent and oracle-checkable.
    """
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    if watermark is not None:
        return (
            events.withWatermark(time_col, watermark)
            .select(*cols, time_col)
            .dropDuplicatesWithinWatermark(list(cols))
        )
    return events.select(*cols).dropDuplicates(list(cols))


def streaming_view_purchase_join(
    spark: SparkSession,
    source_dir: str,
    join_window: str = "1 hour",
    watermark: str = "35 days",
) -> DataFrame:
    """Watermarked stream-stream inner join: each view matched to the
    same user's purchases within ``join_window`` after it.

    The time-interval condition plus per-side watermarks is what makes
    the state BOUNDED: a view can only match purchases in
    ``[view_ts, view_ts + join_window]``, so once the global watermark
    passes that range the view is evicted from the join state. In
    production, set ``watermark`` to the real late-data tolerance
    (minutes/hours) so state stays small; the default here is wider
    than the test corpus's 30-day span so an ``availableNow`` drain is
    exactly batch-equivalent even if the files arrive out of
    time-order across micro-batches (eviction before a late match
    would silently drop pairs — correct streaming semantics, but not
    oracle-comparable).
    """
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return views.join(
        purchases,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + interval {join_window}"
        ),
    ).select(
        "view_id",
        F.col("v_user").alias("user_id"),
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000
SESSION_GAP_US = SESSION_GAP_MS * 1000


def _make_session_fn(timeout: str):
    def session_fn(key, batches, state):
        return _session_fn(key, batches, state, timeout)

    return session_fn


def _session_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState, timeout: str = "none"
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: emit a session when a user's event gap
    exceeds 30 minutes (or state times out). State carries three longs
    per user — constant-size regardless of stream length.

    Timestamps are kept at full microsecond precision (Spark's
    TimestampType fidelity) so the drained output is bit-equal to the
    batch/SQL twin; only the timeout registration rounds up to ms (the
    GroupState API is ms-granular), which can delay a close by <1ms of
    watermark but never changes session composition.

    Session composition assumes each user's events arrive time-ordered
    ACROSS micro-batches (within a batch they're sorted here). A
    within-watermark late event merges into the newest open session
    instead of re-splitting history — the bounded-state trade-off; feed
    time-ordered files (see specs._stream_flush_source_dir) when exact
    batch equivalence is required."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )
        return
    rows = []
    import numpy as np

    # drop NULL timestamps up front: NaT would otherwise become the
    # int64-min sentinel, sort first, and fabricate a bogus session
    # boundary (the watermarked path already drops them engine-side;
    # this keeps the timeout='none' path consistent)
    chunks = [batch["ts"].dropna().to_numpy().astype("datetime64[us]").astype("int64")
              for batch in batches]
    if not chunks:
        return
    ts_arr = np.sort(np.concatenate(chunks))
    if ts_arr.size == 0:
        return
    ts_list = ts_arr.tolist()
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = ts_list[0], ts_list[0], 0
    for t in ts_list:
        if t - last_us > SESSION_GAP_US:
            rows.append((user_id, start_us, last_us, n))
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1
    state.update((start_us, last_us, n))
    if timeout == "processing":
        state.setTimeoutDuration(SESSION_GAP_MS)
    elif timeout == "event":
        # close when the WATERMARK (data time, not wall clock) passes
        # the session's gap boundary — deterministic given the data.
        # GroupState timeouts are ms-granular: round UP so the timeout
        # never fires before the true us-precision gap boundary.
        # CLAMP to watermark+1: a within-watermark late event (legal —
        # the watermark delay exceeds the session gap) can leave
        # last_ts + gap BEHIND the current watermark, and registering
        # a timeout in the past kills the whole query with
        # INVALID_TIMEOUT_TIMESTAMP. The clamped session is already
        # closeable (the watermark passed its gap boundary), so
        # watermark+1 closes it at the next trigger — same output,
        # one batch later, instead of a crashed stream. (Found by the
        # r7 10x streaming soak's 34-batch layout.)
        boundary = -(-last_us // 1000) + SESSION_GAP_MS
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(boundary, wm + 1))
    if rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                "n_events": [r[3] for r in rows],
            }
        )


def streaming_static_enrichment(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    on_stream: str = "user_id",
    on_dim: str = "c_custkey",
    dim_cols: tuple = ("c_mktsegment",),
) -> DataFrame:
    """Stream-static dimension enrichment — the canonical lookup-join
    shape of a production pipeline (events stream x customer/account
    dimension table).

    STATELESS and append-mode: Spark re-plans the static side each
    micro-batch (picking up dimension updates between batches) and
    broadcasts it into a map-side hash join, so the stream is never
    shuffled and no state store exists. That is the plan that holds at
    100 TB-of-stream: per-batch cost is a scan of the batch plus a
    broadcast probe; dimension size is the only memory bound. The
    explicit ``F.broadcast`` pins the strategy even when the dimension
    is freshly re-read and has no stats.
    """
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    dim_side = F.broadcast(
        dim.select(F.col(on_dim).alias("__dim_key"), *[F.col(c) for c in dim_cols])
    )
    return (
        events.join(dim_side, events[on_stream] == F.col("__dim_key"), "left")
        .drop("__dim_key")
    )


def sessionize(
    spark: SparkSession,
    source_dir: str,
    timeout: str = "none",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Gap-based sessionization via applyInPandasWithState.

    ``timeout`` picks how idle sessions close:

    * ``"none"`` — bounded ``availableNow`` drains: open sessions stay
      in checkpointed state for the next run (resumable batch-over-
      stream semantics; no wall-clock spin).
    * ``"event"`` — the production default for event-time correctness:
      a session closes when the WATERMARK passes its last event +
      30 min. Deterministic given the data, independent of wall clock,
      and it fires during availableNow drains as later files advance
      the watermark.
    * ``"processing"`` — live streams only: wall-clock idle timeout.
      Do not combine with availableNow (timeout-driven empty
      micro-batches spin until the wall-clock gap elapses).
    """
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # project to exactly what the state function reads (key + ts)
    # BEFORE the stateful groupBy: every surviving column crosses the
    # JVM->Python Arrow boundary once per micro-batch
    events = reader.parquet(source_dir).select("user_id", "ts")
    conf = {
        "none": GroupStateTimeout.NoTimeout,
        "processing": GroupStateTimeout.ProcessingTimeTimeout,
        "event": GroupStateTimeout.EventTimeTimeout,
    }[timeout]
    if timeout == "event":
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(timeout),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )


def run_available_now(
    sdf: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain all available input into an in-memory table and return it
    (test/bench harness for streaming plans)."""
    query = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sdf.sparkSession.table(query_name)


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _running_totals_fn(key, batches, state) -> "Iterator[pd.DataFrame]":
    """Per-user running (count, min, max) — every emitted stat is
    ORDER-INDEPENDENT, so the drained final row per user equals the
    batch GROUP BY exactly regardless of micro-batch boundaries (a
    running double SUM would be arrival-order-dependent in its rounding
    and could never hash-match an oracle; min/max/count commute)."""
    (user_id,) = key
    cnt, mn, mx = state.get if state.exists else (0, None, None)
    saw = False
    for pdf in batches:
        if not len(pdf):
            continue
        saw = True
        cnt += len(pdf)
        # min/max over NON-NULL values only (SQL MIN/MAX semantics):
        # an all-null first batch would otherwise seed mn/mx with NaN,
        # and min(NaN, x) returns NaN forever — permanently poisoning
        # the stats vs the oracle's null-ignoring MIN/MAX
        vals = pdf["value"].dropna()
        if len(vals):
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
    if not saw:
        return
    state.update((int(cnt), mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [cnt],
            "min_value": [mn],
            "max_value": [mx],
        }
    )


def streaming_running_totals(spark: SparkSession, source_dir: str) -> DataFrame:
    """Update-mode stateful running aggregates per user via
    applyInPandasWithState: each micro-batch emits the user's totals so
    far; downstream consumers (dashboards, feature stores) read the
    latest row per key. State is three scalars per user — constant
    size however long the stream runs. NoTimeout: totals never expire
    (add an event-time timeout for windowed variants)."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir).select(
        "user_id", "value"
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
