#!/usr/bin/env python
"""100x probe of the A8 MERGE/CDC write path (round-9 verdict ask 5):
dedup_cdc_merge is fuzzed, plan-pinned, and crash-injected, but was
the only top-5-cost family without a measured 100x wall point.

Reuses the sf100_probe corpus (100 salted copies of sf0.1 documents,
~500k docs -> ~2M standing-index rows at the catalog band config) and
runs the exact dedup_cdc_merge fixture against it:

* standing index = older 80% of docs' LSH band-bucket rows PLUS a
  deliberately stale row per even-id new doc;
* MERGE upserts the new batch (matched UPDATE overwrites every stale
  row, not-matched INSERT adds the odd-id ones) through
  dml.execute_merge — the same staged-overwrite write path the
  reference's A8 samples exercise;
* INVARIANT: the post-merge table is bit-identical (two-sided
  exceptAll empty) to the fresh full-corpus index — the same equality
  the sf0.01 DuckDB oracle checks every round, now at 100x.

Records setup/merge/verify wall seconds + row counts.

    python tools/merge100_probe.py --json MERGE100_r10.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scratch
from sf100_probe import DST, SRC, build_missing


def _stage(p):
    import gatelib

    gatelib.stage_artifact(p)


def run(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from transformers_spark import cache
    from transformers_spark.dml import execute_merge
    from transformers_spark.expansion4 import _cdc_merge_setup
    from transformers_spark.operators.dedup import (
        DEMO_BANDS,
        DEMO_NUM_PERM,
        minhash_band_buckets,
    )

    t0 = time.perf_counter()
    cat, writer, stmt, fqn = _cdc_merge_setup(spark, sf_dir)
    pre_rows = cat.read(fqn).count()
    setup_secs = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    execute_merge(spark, cat, writer, stmt, fqn)
    merge_secs = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    merged = cat.read(fqn)
    post_rows = merged.count()
    fresh = (
        minhash_band_buckets(
            spark.table("documents"),
            num_perm=DEMO_NUM_PERM,
            bands=DEMO_BANDS,
        )
        .select("doc", F.col("band").cast("int").alias("band"), "bucket")
        .distinct()
    )
    missing = fresh.exceptAll(merged).count()
    extra = merged.exceptAll(fresh).count()
    verify_secs = round(time.perf_counter() - t0, 2)
    cache.release()

    return {
        "sf_dir": sf_dir,
        "pre_merge_rows": pre_rows,
        "post_merge_rows": post_rows,
        "rows_missing_vs_fresh": missing,
        "rows_extra_vs_fresh": extra,
        "state_matches_fresh_index": missing == 0 and extra == 0,
        "setup_secs": setup_secs,
        "merge_secs": merge_secs,
        "verify_secs": verify_secs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--skip-1x",
        action="store_true",
        help="probe only the 100x corpus (the 1x point exists in "
        "BENCH_FULL as dedup_cdc_merge)",
    )
    args = ap.parse_args()

    build_missing()

    from transformers_spark.session import get_spark

    spark = get_spark(app_name="merge100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    result: dict = {"dataset": DST, "base": SRC}
    points = [("100x", DST)] if args.skip_1x else [("1x", SRC), ("100x", DST)]
    for label, d in points:
        r = run(spark, d)
        result[label] = r
        print(f"merge @ {label}: {r}", file=sys.stderr)
        if not r["state_matches_fresh_index"]:
            result["invariant"] = "FAILED"
    if "invariant" not in result:
        result["invariant"] = "post-merge state equals fresh full-corpus index"
    if not args.skip_1x and result.get("1x", {}).get("merge_secs"):
        result["merge_wall_ratio"] = round(
            result["100x"]["merge_secs"] / result["1x"]["merge_secs"], 1
        )

    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
