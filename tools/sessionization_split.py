#!/usr/bin/env python
"""Round-6 verdict ask 7: split streaming_sessionization's headline
cost into harness setup vs per-batch operator work, from the
StreamingQuery's own progress metrics (not guesswork).

Phases measured, over N repeats at the given sf (first repeat after a
JVM warmup, so every number is warm):

* source prep  — _stream_flush_source_dir (cache-hit path after run 1)
* drain        — start() + awaitTermination(), split via
                 recentProgress into addBatch (operator + sink) vs
                 everything else (stream setup, offset log, planning)
* readback     — the memory-table scan + sentinel filter + collect

    python tools/sessionization_split.py [--sf-dir /root/testdata/sf0.1] [--n 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--compare",
        action="store_true",
        help="run BOTH drain modes (file-at-a-time vs all-files-in-one-"
        "batch) and assert their drained outputs are row-identical "
        "(the r13 single-batch-drain equivalence evidence)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from transformers_spark.session import get_spark
    from transformers_spark.streaming.specs import (
        SENTINEL_USER,
        _stream_flush_source_dir,
    )
    from transformers_spark.streaming.windows import (
        sessionize,
        shuffle_partitions,
    )

    spark = get_spark(app_name="sessionization-split")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM warmup (same as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    rows = []
    collected: dict[str, list] = {}
    arms = [("onebatch", None), ("perfile", 1)] if args.compare else [
        ("perfile", 1)
    ]
    for i in range(args.n):
        t0 = time.perf_counter()
        source = _stream_flush_source_dir(spark, args.sf_dir)
        t_prep = time.perf_counter() - t0

        arm, mft = arms[i % len(arms)] if args.compare else arms[0]
        with shuffle_partitions(spark, 8):
            sdf = sessionize(
                spark, source, timeout="event", max_files_per_trigger=mft
            )
            name = (
                "sess_split_"
                + hashlib.md5(f"{args.sf_dir}:{i}".encode()).hexdigest()[:8]
            )
            t1 = time.perf_counter()
            query = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
            t_drain = time.perf_counter() - t1
            progress = [
                p if isinstance(p, dict) else json.loads(str(p))
                for p in query.recentProgress
            ]
            t2 = time.perf_counter()
            real = spark.table(name).filter(
                F.col("user_id") != SENTINEL_USER
            )
            if args.compare:
                got = sorted(map(tuple, real.collect()))
                collected.setdefault(arm, []).append(got)
                n_rows = len(got)
            else:
                n_rows = real.count()
            t_read = time.perf_counter() - t2

        add_batch_ms = sum(
            p.get("durationMs", {}).get("addBatch", 0) for p in progress
        )
        total_trigger_ms = sum(
            p.get("durationMs", {}).get("triggerExecution", 0)
            for p in progress
        )
        rows.append(
            {
                "run": i,
                "arm": arm,
                "prep_s": round(t_prep, 3),
                "drain_s": round(t_drain, 3),
                "addBatch_s": round(add_batch_ms / 1000, 3),
                "trigger_s": round(total_trigger_ms / 1000, 3),
                "stream_overhead_s": round(t_drain - add_batch_ms / 1000, 3),
                "readback_s": round(t_read, 3),
                "n_batches": len(progress),
                "rows": n_rows,
            }
        )
        print(rows[-1], file=sys.stderr)

    out = {"sf_dir": args.sf_dir, "runs": rows}
    if args.compare:
        sets = [g for arms_runs in collected.values() for g in arms_runs]
        identical = all(g == sets[0] for g in sets[1:])
        out["rows_identical_across_modes"] = identical
        if not identical:
            print("MISMATCH between drain modes", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
