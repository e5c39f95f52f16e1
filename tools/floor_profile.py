#!/usr/bin/env python
"""Build-vs-execute floor profile over the whole catalog (r12 ask:
"the per-query floor dominates the headline total — profile where it
goes"). For every catalog query, on a warm session, measure:

  - t_build: wall seconds in ``spec.build`` (driver-side plan
    construction + any eager actions the operator performs)
  - t_exec:  wall seconds in the noop write (analysis + optimization +
    codegen + job execution)
  - jobs_build / jobs_exec: Spark job-count deltas (how many actions
    each phase launches — the scheduling floor is per job)
  - task_ms_exec: executor task-time delta (statusStore) during the
    noop write; exec wall >> task_ms/cores means the time is NOT in
    tasks (i.e. driver analysis/scheduling floor)

One pass untimed (warmup, identical to bench.py), then one timed pass.

    python tools/floor_profile.py --sf-dir /root/testdata/sf0.1 \
        --json .scratch/floor_profile.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _counters(spark):
    jobs = task_ms = 0
    try:
        jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    except Exception:
        pass
    try:
        it = spark._jsparkSession.sparkContext().statusStore().executorList(False).iterator()
        while it.hasNext():
            task_ms += it.next().totalDuration()
    except Exception:
        pass
    return jobs, int(task_ms)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    ap.add_argument("--queries", default=None, help="comma list; default all")
    args = ap.parse_args()

    from transformers_spark import cache
    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    # retention high enough that job-count deltas over a 198-query
    # catalog never hit UI eviction (the default 1000 wraps mid-run)
    spark = get_spark(
        app_name="floor-profile",
        extra_conf={"spark.ui.retainedJobs": "200000",
                    "spark.ui.retainedStages": "200000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()

    names = args.queries.split(",") if args.queries else list(QUERIES)

    # untimed warmup pass (bench.py warm-pass parity)
    for n in names:
        spark.sparkContext.setJobDescription(f"warmup {n}")
        QUERIES[n].build(spark, args.sf_dir).write.format("noop").mode(
            "overwrite").save()
        cache.release()

    rows = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"floor {n}")
        j0, m0 = _counters(spark)
        t0 = time.perf_counter()
        df = QUERIES[n].build(spark, args.sf_dir)
        t1 = time.perf_counter()
        j1, m1 = _counters(spark)
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2, m2 = _counters(spark)
        cache.release()
        rows[n] = {
            "build_s": round(t1 - t0, 4),
            "exec_s": round(t2 - t1, 4),
            "jobs_build": j1 - j0,
            "jobs_exec": j2 - j1,
            "task_ms_build": m1 - m0,
            "task_ms_exec": m2 - m1,
        }
    spark.sparkContext.setJobDescription(None)

    total_build = round(sum(r["build_s"] for r in rows.values()), 2)
    total_exec = round(sum(r["exec_s"] for r in rows.values()), 2)
    out = {
        "sf_dir": args.sf_dir,
        "n_queries": len(rows),
        "total_build_s": total_build,
        "total_exec_s": total_exec,
        "total_jobs": sum(r["jobs_build"] + r["jobs_exec"] for r in rows.values()),
        "total_task_ms": sum(
            r["task_ms_build"] + r["task_ms_exec"] for r in rows.values()
        ),
        "queries": rows,
    }
    text = json.dumps(out, indent=1)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(text)
        print("wrote", args.json)
    print(json.dumps({k: out[k] for k in (
        "n_queries", "total_build_s", "total_exec_s", "total_jobs",
        "total_task_ms")}))
    top_build = sorted(rows.items(), key=lambda kv: -kv[1]["build_s"])[:15]
    print("top build_s:", [(n, r["build_s"]) for n, r in top_build])
    top_jobs = sorted(
        rows.items(), key=lambda kv: -(kv[1]["jobs_build"] + kv[1]["jobs_exec"])
    )[:15]
    print("top jobs:", [
        (n, r["jobs_build"] + r["jobs_exec"]) for n, r in top_jobs])
    spark.stop()


if __name__ == "__main__":
    main()
