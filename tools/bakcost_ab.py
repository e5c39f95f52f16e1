#!/usr/bin/env python
"""Same-session A/B attribution of the dedup_cdc_merge cost delta to
the mid-swap backup snapshot (r11 verdict ask 3): the r10->r11
committed bench moved 3.64 -> 4.22 s warm, and the suspected price is
the r11 crash-safety snapshot (loaders._create_backup — "one extra
write of the affected content"). This measures it directly.

Arms, interleaved A/B/A/B in ONE session (the only instrument that
beats the ~20-35% cross-session spread):

* backup   — the committed engine, snapshot on (the shipping path);
* nobackup — ``Writer._create_backup`` monkeypatched to return None,
  which disables exactly the snapshot (the ``bak is None`` branch
  skips restore/drop too) and nothing else — a faithful one-line
  backup-off arm without a worktree rebuild.

Each rep rebuilds the dedup_cdc_merge fixture (standing index + stale
rows + parsed MERGE) and times ``dml.execute_merge`` alone — the
component the snapshot rides in. Scales: 1x = sf0.1 (the bench
query's data) and the 100x saturated corpus (MERGE100's ~2M-row
standing index).

    python tools/bakcost_ab.py --json BAKCOST_r12.json
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

from sf100_probe import DST, SRC, build_missing

REPS = 3


def _stage(p):
    import gatelib

    gatelib.stage_artifact(p)


def run_once(spark, sf_dir: str, arm: str) -> tuple[float, float]:
    """(setup_secs, merge_secs) for one fixture rebuild + MERGE."""
    from transformers_spark.dml import execute_merge
    from transformers_spark.expansion4 import _cdc_merge_setup
    from transformers_spark.loaders import Writer

    orig = Writer._create_backup
    if arm == "nobackup":
        Writer._create_backup = lambda self, meta, affected_days: None
    try:
        t0 = time.perf_counter()
        cat, writer, stmt, fqn = _cdc_merge_setup(spark, sf_dir)
        cat.read(fqn).count()
        setup_secs = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        execute_merge(spark, cat, writer, stmt, fqn)
        merge_secs = round(time.perf_counter() - t0, 2)
        return setup_secs, merge_secs
    finally:
        Writer._create_backup = orig
        from transformers_spark import cache

        cache.release()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    build_missing()

    from transformers_spark.session import get_spark

    spark = get_spark(app_name="bakcost-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop"
    ).mode("overwrite").save()

    result: dict = {
        "operator": "dedup_cdc_merge (execute_merge component)",
        "reps_per_arm": REPS,
        "scales": {},
    }
    for label, d in (("1x", SRC), ("100x", DST)):
        merges = {"backup": [], "nobackup": []}
        # warmup both arms once, then interleave
        for arm in ("backup", "nobackup"):
            run_once(spark, d, arm)
        for _ in range(REPS):
            for arm in ("backup", "nobackup"):
                _, m = run_once(spark, d, arm)
                merges[arm].append(m)
        med_b = statistics.median(merges["backup"])
        med_n = statistics.median(merges["nobackup"])
        result["scales"][label] = {
            "backup_merge_secs": merges["backup"],
            "nobackup_merge_secs": merges["nobackup"],
            "backup_median": med_b,
            "nobackup_median": med_n,
            "snapshot_cost_secs": round(med_b - med_n, 2),
            "ratio": round(med_b / med_n, 2) if med_n else None,
        }
        print(
            f"{label}: backup {med_b}s nobackup {med_n}s "
            f"(snapshot cost {med_b - med_n:+.2f}s)",
            file=sys.stderr,
        )

    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
