#!/usr/bin/env python
"""Streaming soak at 10x events (round-6 verdict ask 4).

Two measurements the batch soak (`tools/sf1_soak.py`) never made:

1. **Scale**: drain `streaming_sessionization` and
   `streaming_view_purchase_join` at 10x events (the sf1_soak
   dataset) and compare against their sf0.1 drain times — sub-linear
   or attributed.

2. **Batch sizing**: the round-6 cost split showed ~1 s/micro-batch
   FIXED cost (Python-worker + state-store round-trip), so production
   should prefer fewer, larger micro-batches — asserted then, measured
   here. At fixed 10x data we rebuild the time-ordered flush source
   with n_files in {2, 8, 32} real files (+2 sentinel files, one per
   micro-batch under maxFilesPerTrigger=1, preserving the
   watermark-flush contract), so batch count varies 4 -> 10 -> 34 at
   constant total work. Every variant's drained output is checked
   against the SAME batch oracle (DuckDB over the 10x events) — a
   variant that broke cross-batch state carry would fail loudly, not
   just run slower.

    python tools/streaming_soak.py --json STREAMSOAK_r07.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scratch


def _stage(p):
    import gatelib
    gatelib.stage_artifact(p)

import sf1_soak

SOAK = sf1_soak.DST  # <scratch>/sf1_soak
SF01 = "/root/testdata/sf0.1"


def build_events_100x() -> str:
    """100x events slice (round-8 verdict ask 4): same salted-copy
    technique as sf100_probe — event_id/user_id offset by a stride
    DERIVED from the data (max+1), so copies can never collide with
    originals. 100x users means 100x live sessionization state, which
    is the axis the state-store comparison needs."""
    import duckdb

    out = scratch.scratch_path("sf100_events")
    dst = os.path.join(out, "events.parquet")
    if os.path.exists(dst):
        return dst
    os.makedirs(out, exist_ok=True)
    src = os.path.join(SF01, "events.parquet")
    max_eid, max_uid = duckdb.sql(
        f"SELECT max(event_id), max(user_id) FROM read_parquet('{src}')"
    ).fetchone()
    e_stride, u_stride = int(max_eid) + 1, int(max_uid) + 1
    copies = " UNION ALL ".join(
        f"SELECT event_id + {i * e_stride} AS event_id, ts, "
        f"user_id + {i * u_stride} AS user_id, event_type, value "
        f"FROM read_parquet('{src}')"
        for i in range(100)
    )
    duckdb.sql(f"COPY ({copies}) TO '{dst}' (FORMAT PARQUET)")
    print("built 100x events", file=sys.stderr)
    return dst


def build_flush_variant(spark, events_parquet: str, n_files: int,
                        tag: str = "") -> str:
    """Time-ordered flush source (same contract as
    specs._stream_flush_source_dir) with a configurable real-file
    count; 2 sentinel files follow, mtime-ordered last."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from transformers_spark.streaming.specs import SENTINEL_USER
    from transformers_spark.streaming.windows import SESSION_GAP_US

    out = scratch.scratch_path(f"streamsoak_flush{tag}_f{n_files}")
    marker = os.path.join(out, "_FLUSH_READY")
    if os.path.exists(marker):
        return out
    ev = spark.read.parquet(events_parquet).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts_us = ev.agg(F.max(F.unix_micros(F.col("ts"))).alias("m")
                       ).collect()[0]["m"] or 0
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    base = os.path.getmtime(parts[-1])
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))
    hour_us = 3_600_000_000
    s1_us = max_ts_us + 2 * hour_us + SESSION_GAP_US + 2 * hour_us
    s2_us = s1_us + hour_us
    for j, ts_us in enumerate((s1_us, s2_us)):
        table = pa.table({
            "event_id": pa.array([-1000 - j], pa.int64()),
            "ts": pa.array([ts_us], pa.timestamp("us")),
            "user_id": pa.array([SENTINEL_USER], pa.int64()),
            "event_type": pa.array(["sentinel"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
        })
        dest = os.path.join(out, f"zz-sentinel-{j}.parquet")
        pq.write_table(table, dest)
        # sentinels must sort strictly AFTER every real file in the
        # (modTime, path) source order: base + n_files + slack, NOT a
        # fixed +10 (with 32 real files a +10 stamp lands mid-stream,
        # the watermark jumps to the sentinels early, and every later
        # real file's timeout registration dies with
        # INVALID_TIMEOUT_TIMESTAMP — found by this tool's first run)
        os.utime(dest, (base + n_files + 10 + j, base + n_files + 10 + j))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def oracle_session_counts(events_parquet: str) -> tuple[int, int]:
    """(n_sessions, n_multi_event_sessions) from the batch definition."""
    import duckdb

    row = duckdb.sql(f"""
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM read_parquet('{events_parquet}')
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid,
    ts
  FROM marked
)
SELECT COUNT(*) AS n,
       SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS multi
FROM (SELECT user_id, sid, COUNT(*) AS c
      FROM sessions GROUP BY user_id, sid)
""").fetchone()
    return int(row[0]), int(row[1])


def drain_sessionization(spark, source: str, name: str,
                         collect_state_metrics: bool = False) -> dict:
    from pyspark.sql import functions as F

    from transformers_spark.streaming.specs import SENTINEL_USER
    from transformers_spark.streaming.windows import (
        sessionize, shuffle_partitions,
    )

    t0 = time.perf_counter()
    with shuffle_partitions(spark, 8):
        sdf = sessionize(spark, source, timeout="event",
                         max_files_per_trigger=1)
        query = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        n_batches = len(query.recentProgress)
        add_batch_ms = sum(
            (p.durationMs or {}).get("addBatch", 0)
            for p in query.recentProgress
        )
        state = {}
        if collect_state_metrics:
            # peak state across micro-batches: the number a production
            # deployment sizes the store for
            for p in query.recentProgress:
                for op in p.stateOperators or []:
                    state["max_state_rows"] = max(
                        state.get("max_state_rows", 0), op.numRowsTotal
                    )
                    state["max_state_mem_mb"] = max(
                        state.get("max_state_mem_mb", 0),
                        round(op.memoryUsedBytes / 1e6, 1),
                    )
        out = spark.table(name).filter(F.col("user_id") != SENTINEL_USER)
        n_rows = out.count()
    secs = time.perf_counter() - t0
    return {
        "secs": round(secs, 2),
        "n_batches": n_batches,
        "add_batch_s": round(add_batch_ms / 1000, 2),
        "rows": n_rows,
        **state,
    }


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def state_store_compare(spark, ev10: str, expected, reps: int = 2,
                        tag: str = "") -> list[dict]:
    """Drain the arbitrary-state sessionization (the heaviest state op
    in the catalog) under the default HDFS-backed in-memory provider
    and under RocksDB, same data, same oracle (round-7 verdict ask 6):
    at 100 TB the state store is the first thing that pages, and this
    measures what switching costs/buys BEFORE a deployment finds out
    in production. One warmup + one measured drain per provider;
    output must bit-match the batch oracle under both."""
    src = build_flush_variant(spark, ev10, 8, tag=tag)
    default_provider = spark.conf.get(_PROVIDER_CONF)
    rows = []
    for label, provider in (
        ("default_hdfs", None),
        ("rocksdb", ROCKSDB_PROVIDER),
    ):
        if provider is not None:
            spark.conf.set(_PROVIDER_CONF, provider)
        try:
            meas = []
            for rep in range(reps):
                r = drain_sessionization(
                    spark, src, f"soak_ss{tag}_{label}_r{rep}",
                    collect_state_metrics=True,
                )
                meas.append(r)
                print(f"state-store{tag} {label} rep{rep}: {r}",
                      file=sys.stderr)
            row = {"provider": label, **meas[-1],
                   "cold_secs": meas[0]["secs"]}
            if expected is not None:
                row["rows_match_oracle"] = meas[-1]["rows"] == expected[0]
            rows.append(row)
        finally:
            spark.conf.set(_PROVIDER_CONF, default_provider)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-10x-oracle", action="store_true",
                    help="skip the DuckDB session-count oracle at 10x")
    ap.add_argument("--skip-scale", action="store_true",
                    help="skip the 1x-vs-10x query timings")
    ap.add_argument("--skip-batch-sizing", action="store_true",
                    help="skip the drain-vs-batch-count measurement")
    ap.add_argument("--state-store-compare", action="store_true",
                    help="drain sessionization under the default and "
                         "RocksDB state store providers (r8)")
    ap.add_argument("--state-store-100x", action="store_true",
                    help="same comparison on a 100x events slice "
                         "(100x users = 100x live state; r8 verdict "
                         "ask 4). One measured drain per provider.")
    args = ap.parse_args()

    sf1_soak.build_missing()

    from transformers_spark import cache
    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()

    result: dict = {"dataset": SOAK}

    # --- 1. stream-stream join + sessionization at 1x and 10x --------
    for qname in () if args.skip_scale else (
            "streaming_sessionization", "streaming_view_purchase_join"):
        rows = {}
        for label, sf in (("sf0.1", SF01), ("10x", SOAK)):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[qname].build(spark, sf).write.format("noop").mode(
                    "overwrite").save()
                times.append(round(time.perf_counter() - t0, 2))
                cache.release()
            warm = sorted(times[1:])[len(times[1:]) // 2]
            rows[label] = {"cold": times[0], "warm_median": warm,
                           "all": times}
            print(f"{qname} @ {label}: cold {times[0]}s "
                  f"warm {warm}s", file=sys.stderr)
        rows["warm_ratio_10x"] = round(
            rows["10x"]["warm_median"] / rows["sf0.1"]["warm_median"], 2)
        result[qname] = rows

    # --- 1b. state-store provider comparison at 10x (r8) -------------
    if args.state_store_compare:
        ev10 = os.path.join(SOAK, "events.parquet")
        expected = (None if args.skip_10x_oracle
                    else oracle_session_counts(ev10))
        result["state_store_10x"] = state_store_compare(
            spark, ev10, expected)

    # --- 1c. state-store comparison at 100x (r9) ---------------------
    if args.state_store_100x:
        ev100 = build_events_100x()
        expected = (None if args.skip_10x_oracle
                    else oracle_session_counts(ev100))
        if expected is not None:
            print(f"oracle sessions at 100x: {expected[0]}",
                  file=sys.stderr)
        result["state_store_100x"] = state_store_compare(
            spark, ev100, expected, reps=1, tag="100x")

    # --- 2. drain-time vs batch count at fixed 10x data --------------
    if args.skip_batch_sizing:
        print(json.dumps(result, indent=1))
        if args.json:
            with open(args.json, "w") as fh:
                json.dump(result, fh, indent=1)
            _stage(args.json)
        spark.stop()
        return

    ev10 = os.path.join(SOAK, "events.parquet")
    expected = None
    if not args.skip_10x_oracle:
        expected = oracle_session_counts(ev10)
        print(f"oracle sessions at 10x: {expected[0]}", file=sys.stderr)
    batch_rows = []
    for n_files in (32, 8, 2):
        src = build_flush_variant(spark, ev10, n_files)
        # one warmup drain then one measured drain per variant
        meas = []
        for rep in range(2):
            r = drain_sessionization(
                spark, src, f"soak_f{n_files}_r{rep}")
            meas.append(r)
            print(f"n_files={n_files} rep{rep}: {r}", file=sys.stderr)
        row = {"n_real_files": n_files, **meas[-1],
               "cold_secs": meas[0]["secs"]}
        if expected is not None:
            row["rows_match_oracle"] = meas[-1]["rows"] == expected[0]
        batch_rows.append(row)
    result["batch_sizing_10x"] = batch_rows

    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
