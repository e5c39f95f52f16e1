#!/usr/bin/env python
"""Same-session A/B of the substring-dedup hash path (r11): the
oracle-portable md5 window hash (32-hex-char string keys) vs the
production xxhash64 path (8-byte LONG keys — `hasher='fast'`).

Runs remove_long_dup_substrings end-to-end at 1x (sf0.1) and on the
100x duplication-saturated corpus (sf100_probe's dataset), alternating
arms A/B/A/B within ONE session (the only instrument that beats the
~20-35% cross-session spread; medians reported). Asserts the two arms
agree on tokens_removed — a 64-bit collision at this corpus size is
astronomically unlikely, so a disagreement is a bug, not chance.

    python tools/spanhash_ab.py --json SPANHASH_r11.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import sf100_probe

MIN_RUN_TOKENS = 50
REPS = 3  # per arm per scale, interleaved


def shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    executors from the AppStatusStore — snapshot before/after a run
    and diff for per-run bytes (same surface stats.collect_job_stats
    harvests)."""
    store = spark._jsparkSession.sparkContext().statusStore()
    it = store.executorList(False).iterator()
    read = write = 0
    while it.hasNext():
        executor = it.next()
        read += executor.totalShuffleRead()
        write += executor.totalShuffleWrite()
    return int(read), int(write)


def run_once(spark, sf_dir: str, hasher: str) -> tuple[float, int, int, int]:
    from pyspark.sql import functions as F

    from transformers_spark.operators.text import (
        remove_long_dup_substrings,
    )
    from transformers_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = remove_long_dup_substrings(
        docs, span_len=8, min_run_tokens=MIN_RUN_TOKENS, hasher=hasher
    )
    r0, w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    row = out.agg(
        F.sum("n_tokens_removed").alias("tr"),
        F.sum(F.length("deduped_text")).alias("oc"),
    ).collect()[0]
    secs = round(time.perf_counter() - t0, 2)
    r1, w1 = shuffle_totals(spark)
    return secs, int(row["tr"]), r1 - r0, w1 - w0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sf100_probe.build_missing()

    from transformers_spark.session import get_spark

    spark = get_spark(app_name="spanhash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop"
    ).mode("overwrite").save()

    result: dict = {
        "operator": "remove_long_dup_substrings",
        "min_run_tokens": MIN_RUN_TOKENS,
        "reps_per_arm": REPS,
        "scales": {},
    }
    for label, d in (("1x", sf100_probe.SRC), ("100x", sf100_probe.DST)):
        walls = {"portable": [], "fast": []}
        sh_read = {"portable": [], "fast": []}
        sh_write = {"portable": [], "fast": []}
        removed = {}
        # warmup both arms once (JVM/codegen), then interleave
        for h in ("portable", "fast"):
            run_once(spark, d, h)
        for _ in range(REPS):
            for h in ("portable", "fast"):
                secs, tr, rb, wb = run_once(spark, d, h)
                walls[h].append(secs)
                sh_read[h].append(rb)
                sh_write[h].append(wb)
                removed[h] = tr
        assert removed["portable"] == removed["fast"], removed
        med_p = statistics.median(walls["portable"])
        med_f = statistics.median(walls["fast"])
        # shuffle bytes are a property of the plan, not the machine —
        # medians over reps smooth only AQE/statistics jitter. The
        # ratio is THE fast-hasher justification (r11 verdict ask 2):
        # the claimed win is smaller per-hash shuffle rows at cluster
        # scale, not local wall.
        wmed_p = statistics.median(sh_write["portable"])
        wmed_f = statistics.median(sh_write["fast"])
        rmed_p = statistics.median(sh_read["portable"])
        rmed_f = statistics.median(sh_read["fast"])
        result["scales"][label] = {
            "portable_secs": walls["portable"],
            "fast_secs": walls["fast"],
            "portable_median": med_p,
            "fast_median": med_f,
            "speedup": round(med_p / med_f, 2),
            "tokens_removed": removed["portable"],
            "portable_shuffle_write_bytes": sh_write["portable"],
            "fast_shuffle_write_bytes": sh_write["fast"],
            "portable_shuffle_read_bytes": sh_read["portable"],
            "fast_shuffle_read_bytes": sh_read["fast"],
            "shuffle_write_ratio": round(wmed_p / wmed_f, 2) if wmed_f else None,
            "shuffle_read_ratio": round(rmed_p / rmed_f, 2) if rmed_f else None,
        }
        print(f"{label}: portable {med_p}s fast {med_f}s "
              f"({med_p / med_f:.2f}x); shuffle write "
              f"{wmed_p / 1e6:.1f}MB vs {wmed_f / 1e6:.1f}MB "
              f"({(wmed_p / wmed_f) if wmed_f else 0:.2f}x)",
              file=sys.stderr)

    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        sf100_probe._stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
