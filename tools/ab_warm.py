#!/usr/bin/env python
"""Batched warm A/B for attributing per-query timing deltas
(round-6 verdict ask 2: dedup_simhash 1.47->2.55s and
streaming_hopping_counts 0.99->1.53s in the driver's warm column,
with no code change to either query).

Protocol (the one that settled rounds 3-4's variance): ONE process
per arm, JVM warmed, then per query BATCHES of N reps — medians per
batch, two batches per arm so within-session drift shows up as
batch1-vs-batch2 spread instead of corrupting the arm comparison.
Arms differ only in env (e.g. SPARK_GRAFT_DRIVER_MEM=1g|12g|24g:
r5 ran in Spark's 1g default, r6 pinned 12g, r7 derives ~24g).

    python tools/ab_warm.py --queries dedup_simhash,streaming_hopping_counts \
        --sf-dir /root/testdata/sf0.1 --reps 6 --batches 2 --json out.json

Run it once per arm with the arm's env; compare the per-batch medians
across the resulting JSONs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage(p):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gatelib
    gatelib.stage_artifact(p)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.queries.split(",")

    from transformers_spark import cache
    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="ab-warm")
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.conf.get("spark.driver.memory", "unset")

    # warmup identical to bench.py + one untimed pass of each query
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    for n in names:
        QUERIES[n].build(spark, args.sf_dir).write.format("noop").mode(
            "overwrite").save()
        cache.release()

    def median(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    out: dict[str, dict] = {}
    for b in range(args.batches):
        for n in names:
            reps = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                QUERIES[n].build(spark, args.sf_dir).write.format(
                    "noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 4))
                cache.release()
            row = out.setdefault(n, {"batch_medians": [], "all_reps": []})
            row["batch_medians"].append(round(median(reps), 4))
            row["all_reps"].append(reps)
            print(f"batch{b + 1} {n}: median {row['batch_medians'][-1]}s "
                  f"reps {reps}", file=sys.stderr)

    result = {
        "heap": heap,
        "sf_dir": args.sf_dir,
        "reps_per_batch": args.reps,
        "queries": out,
    }
    print(json.dumps({n: r["batch_medians"] for n, r in out.items()},
                     separators=(",", ":")))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
