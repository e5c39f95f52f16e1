"""Correctness-gate entry for the streaming path.

Structured Streaming's windowed aggregation, drained with an
``availableNow`` trigger over a file source, must equal the same
aggregation computed in batch — so the batch SQL IS the oracle. This
puts the streaming engine itself (micro-batching, state store, window
assignment) under the hash-compare gate.
"""

from __future__ import annotations

import hashlib
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .windows import (
    SESSION_GAP_US,
    run_available_now,
    shuffle_partitions,
    streaming_distinct,
    streaming_event_counts,
    streaming_running_totals,
    streaming_static_enrichment,
    streaming_view_purchase_join,
)

__all__ = [
    "q_streaming_hourly_counts",
    "q_streaming_distinct_pairs",
    "q_streaming_view_purchase_join",
    "q_streaming_running_totals",
    "q_streaming_static_enrichment",
    "ORACLE_STREAMING_HOURLY",
    "ORACLE_STREAMING_DISTINCT",
    "ORACLE_STREAMING_SS_JOIN",
    "ORACLE_STREAMING_RUNNING_TOTALS",
    "ORACLE_STREAMING_ENRICHMENT",
    "streaming_specs",
]

_STREAM_CACHE_ROOT = "/tmp/transformers_spark_stream"


def _stream_source_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a micros-precision multi-file streaming copy of the
    events table (the file streaming source wants a directory, and the
    raw table has been nano-precision in some testdata generations);
    one per (sf_dir, source mtime+size), reused across calls. Keying on
    the source file's identity — not just its path — keeps the cache
    from serving stale data when the driver regenerates testdata
    between rounds in the same container."""
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        ident = sf_dir
    # key = <sf_dir prefix>-<content suffix>: the prefix scopes pruning
    # to THIS sf_dir's superseded generations (other scale factors'
    # caches stay), the suffix invalidates on regeneration
    prefix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    key = f"{prefix}-{hashlib.md5(ident.encode()).hexdigest()[:10]}"
    out = os.path.join(_STREAM_CACHE_ROOT, key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        os.utime(out)  # prune grace tracks USE (see _prune_stale_cache)
    else:
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).coalesce(4).write.mode("overwrite").parquet(out)
        _prune_stale_cache(prefix=prefix, keep=key)
    return out


SENTINEL_USER = -1


def _stream_flush_source_dir(spark: SparkSession, sf_dir: str) -> str:
    """Time-ordered streaming copy of events plus watermark-flush
    sentinels, for queries whose drained output must EQUAL the batch
    answer (sessionization):

    * ``repartitionByRange`` + per-file mtime stamping makes each
      micro-batch a contiguous, ascending time range, so every user's
      events reach the stateful operator in time order across batches
      (the 3-long session state is exact only under in-order arrival);
    * two sentinel events for ``SENTINEL_USER`` sit far past the real
      data (beyond watermark delay + session gap + slack). Processing
      the second sentinel file happens under a watermark derived from
      the first, which exceeds every real session's timeout timestamp —
      all open sessions flush deterministically before the availableNow
      drain terminates, without relying on a trailing no-data
      micro-batch. Callers filter ``user_id != SENTINEL_USER``.
    """
    src = os.path.join(sf_dir, "events.parquet")
    # the key must cover every parameter that shapes the cached LAYOUT
    # (sentinel spacing, file count), not just the source bytes — a
    # code change to the gap/slack constants must invalidate the cache,
    # or stale sentinels could sit inside the new watermark and final
    # sessions would silently never flush
    layout = f"g{SESSION_GAP_US}:f2:slack4h"
    try:
        st = os.stat(src)
        ident = f"{sf_dir}:flush:{st.st_mtime_ns}:{st.st_size}:{layout}"
    except OSError:
        ident = f"{sf_dir}:flush:{layout}"
    prefix = hashlib.md5(f"{sf_dir}:flush".encode()).hexdigest()[:8]
    key = f"{prefix}-{hashlib.md5(ident.encode()).hexdigest()[:10]}"
    out = os.path.join(_STREAM_CACHE_ROOT, key)
    marker = os.path.join(out, "_FLUSH_READY")
    if os.path.exists(marker):
        # refresh mtime so the prune grace window tracks USE, not
        # creation — a long drain on a superseded key stays protected
        os.utime(out)
    else:
        import glob

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        # max BEFORE the write (identical rows either way): parquet
        # column stats serve it without re-reading the written copy.
        # The sentinel micros must be in the PARQUET storage frame:
        # TIMESTAMP_NTZ stores wall-clock micros (collect returns the
        # naive wall clock unchanged → pandas .value is exact), while
        # TIMESTAMP stores UTC micros but collect converts to the
        # DRIVER's local tz — so for that case the max is computed
        # Spark-side via unix_micros, immune to driver tz. n_files=2
        # keeps micro-batch count (and the ~1s-per-batch stateful-drain
        # overhead) minimal while still proving cross-batch state
        # carry; contiguous ascending time ranges are preserved at any
        # file count.
        from pyspark.sql.types import TimestampNTZType

        if isinstance(ev.schema["ts"].dataType, TimestampNTZType):
            import pandas as pd

            max_ts = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
            max_ts_us = (
                None if max_ts is None else pd.Timestamp(max_ts).value // 1000
            )
        else:
            max_ts_us = ev.agg(
                F.max(F.unix_micros(F.col("ts"))).alias("m")
            ).collect()[0]["m"]
        if max_ts_us is None:
            # zero events (or all-NULL ts): no real sessions can exist,
            # but the drain must still run and flush — anchor the
            # sentinels at epoch so the watermark math stays valid
            max_ts_us = 0
        n_files = 2
        (
            ev.repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(out)
        )
        # range-partition order == part-file name order; stamp strictly
        # increasing mtimes so the file source's (modTime, path) order
        # is the time order regardless of write timing
        parts = sorted(glob.glob(os.path.join(out, "part-*")))
        base = os.path.getmtime(parts[-1])
        for i, p in enumerate(parts):
            os.utime(p, (base + i, base + i))
        hour_us = 3_600_000_000
        s1_us = max_ts_us + 2 * hour_us + SESSION_GAP_US + 2 * hour_us
        s2_us = s1_us + hour_us
        # sentinels are 1-row files: write them with pyarrow directly
        # (two Spark write jobs here measurably dominate cold prep)
        import pyarrow as pa
        import pyarrow.parquet as pq

        for j, ts_us in enumerate((s1_us, s2_us)):
            table = pa.table(
                {
                    "event_id": pa.array([-1000 - j], pa.int64()),
                    "ts": pa.array([ts_us], pa.timestamp("us")),
                    "user_id": pa.array([SENTINEL_USER], pa.int64()),
                    "event_type": pa.array(["sentinel"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                }
            )
            dest = os.path.join(out, f"zz-sentinel-{j}.parquet")
            pq.write_table(table, dest)
            os.utime(dest, (base + 10 + j, base + 10 + j))
        with open(marker, "w") as fh:
            fh.write("ok")
        _prune_stale_cache(prefix=prefix, keep=key)
    return out


_PRUNE_MIN_AGE_S = 3600
_LEGACY_KEY_RE = re.compile(r"^[0-9a-f]{10}$")


def _prune_stale_cache(prefix: str, keep: str) -> None:
    """Superseded cache keys for the same sf_dir (old testdata
    generations) can never be requested again by NEW lookups — delete
    them so /tmp doesn't grow by one events copy per regeneration.
    Only entries untouched for an hour are removed: a concurrent
    process that resolved the old key may still be draining it
    (an availableNow drain finishes in minutes). Bare-hex names from
    the pre-prefix key format are legacy orphans — same rule."""
    import shutil
    import time

    try:
        entries = os.listdir(_STREAM_CACHE_ROOT)
    except OSError:
        return
    now = time.time()
    for name in entries:
        superseded = (
            name.startswith(f"{prefix}-") or _LEGACY_KEY_RE.fullmatch(name)
        ) and name != keep
        if not superseded:
            continue
        path = os.path.join(_STREAM_CACHE_ROOT, name)
        try:
            if now - os.path.getmtime(path) < _PRUNE_MIN_AGE_S:
                continue
        except OSError:
            continue
        shutil.rmtree(path, ignore_errors=True)


def q_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    source = _stream_source_dir(spark, sf_dir)
    # State partition count is fixed at the query's FIRST run and each
    # partition carries a state-store instance — size it to the state
    # (~few thousand window×type keys here), not to the CPU count:
    # 64 stores for 4k keys measured 2-8s of pure init/commit overhead
    # vs 1.3s at 8. Long-running production streams size this to
    # cluster cores × per-key state instead.
    with shuffle_partitions(spark, 8):
        sdf = streaming_event_counts(spark, source, window="1 hour", watermark="2 hours")
        name = "stream_hourly_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        return run_available_now(sdf, name, output_mode="complete")


ORACLE_STREAMING_HOURLY = """
SELECT
  date_trunc('hour', ts)                    AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR  AS window_end,
  event_type,
  COUNT(*)                                  AS n_events,
  CAST(SUM(TRY_CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
FROM events
-- Spark's window(ts, ...) assigns NULL event times to no bucket (the
-- row is dropped, matching the watermark contract); mirror that here
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""


def q_streaming_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) streaming windows — 1 h width, 30 min slide:
    each event contributes to exactly 2 windows; state is 2x the
    tumbling case and still watermark-bounded. Registered in
    expansion2_specs (round 5) so earlier catalog positions stay
    stable; the batch oracle is the same window arithmetic
    hopping_event_windows uses."""
    source = _stream_source_dir(spark, sf_dir)
    with shuffle_partitions(spark, 8):  # see hourly note
        sdf = streaming_event_counts(
            spark, source, window="1 hour", watermark="2 hours",
            slide="30 minutes",
        )
        name = "stream_hopping_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        return run_available_now(sdf, name, output_mode="complete")


ORACLE_STREAMING_HOPPING = """
WITH assigned AS (
  SELECT
    make_timestamp(epoch_us(ts) // 1800000000 * 1800000000
                   - k * 1800000000) AS window_start,
    event_type,
    TRY_CAST(value AS DECIMAL(12,4)) AS val
  FROM events, unnest([0, 1]) AS u(k)
  -- Spark's window(ts, ...) drops NULL ts rows; mirror that here
  WHERE ts IS NOT NULL
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(val) AS DOUBLE) AS total_value
FROM assigned
GROUP BY 1, 2, 3
"""


def q_streaming_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup drained with availableNow: the append
    output over exactly the dedup keys equals batch SELECT DISTINCT."""
    source = _stream_source_dir(spark, sf_dir)
    with shuffle_partitions(spark, 8):  # see hourly note
        sdf = streaming_distinct(spark, source)
        name = "stream_distinct_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        return run_available_now(sdf, name, output_mode="append")


ORACLE_STREAMING_DISTINCT = "SELECT DISTINCT user_id, event_type FROM events"


def q_streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join drained with
    availableNow: equals the batch self-join (the oracle) because the
    watermark exceeds the corpus's time span — see
    streaming_view_purchase_join's docstring for the production
    tighter-watermark shape."""
    source = _stream_source_dir(spark, sf_dir)
    with shuffle_partitions(spark, 8):  # see hourly note
        sdf = streaming_view_purchase_join(spark, source)
        name = "stream_ssjoin_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        return run_available_now(sdf, name, output_mode="append")


ORACLE_STREAMING_SS_JOIN = """
SELECT v.event_id AS view_id,
       v.user_id AS user_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND p.event_type = 'purchase'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-mode stateful running totals per user
    (streaming/windows.py:streaming_running_totals): every micro-batch
    emits the user's (count, min, max) so far; the drained final row
    per user — picked by max(struct(n_events, ...)), valid because the
    count is strictly monotone per key — must equal the batch GROUP BY
    exactly. All emitted stats commute across arrival order, which is
    what makes an exact oracle possible for an update-mode stream."""
    source = _stream_source_dir(spark, sf_dir)
    with shuffle_partitions(spark, 8):  # see hourly note
        sdf = streaming_running_totals(spark, source)
        name = "stream_totals_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        drained = run_available_now(sdf, name, output_mode="update")
    final = F.max(
        F.struct("n_events", "min_value", "max_value")
    ).alias("s")
    return drained.groupBy("user_id").agg(final).select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.min_value").alias("min_value"),
        F.col("s.max_value").alias("max_value"),
    )


ORACLE_STREAMING_RUNNING_TOTALS = """
SELECT user_id,
       COUNT(*)   AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY user_id
"""


def q_streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment
    (streaming/windows.py:streaming_static_enrichment): every streamed
    event picks up its user's market segment from the static customer
    dimension; stateless append drain equals the batch left join."""
    source = _stream_source_dir(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    with shuffle_partitions(spark, 8):  # see hourly note
        sdf = streaming_static_enrichment(spark, source, customer)
        name = "stream_enrich_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        return run_available_now(sdf, name, output_mode="append")


ORACLE_STREAMING_ENRICHMENT = """
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, c.c_mktsegment
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def streaming_specs() -> list:
    from ..queries import QuerySpec as QS

    return [
        QS(
            "streaming_hourly_counts",
            "Structured Streaming windowed aggregation (availableNow drain) vs batch oracle",
            q_streaming_hourly_counts,
            ORACLE_STREAMING_HOURLY,
        ),
        QS(
            "streaming_dedup_pairs",
            "Stateful streaming dropDuplicates (availableNow drain) vs batch DISTINCT",
            q_streaming_distinct_pairs,
            ORACLE_STREAMING_DISTINCT,
        ),
        QS(
            "streaming_view_purchase_join",
            "Watermarked stream-stream interval join (availableNow drain) vs batch self-join",
            q_streaming_view_purchase_join,
            ORACLE_STREAMING_SS_JOIN,
        ),
        QS(
            "streaming_running_totals",
            "Update-mode stateful running per-user totals vs batch GROUP BY",
            q_streaming_running_totals,
            ORACLE_STREAMING_RUNNING_TOTALS,
        ),
        QS(
            "streaming_static_enrichment",
            "Stateless stream-static broadcast dimension join vs batch left join",
            q_streaming_static_enrichment,
            ORACLE_STREAMING_ENRICHMENT,
        ),
    ]
