#!/usr/bin/env python
"""Benchmark harness: runs the headline query catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full plan
execution, no driver-side collect bottleneck).

Methodology (round-4 verdict ask 5): the cold pass runs first in
catalog order and remains the headline ``value``/``queries`` (directly
comparable to BENCH_r01-r04). Then ``$SPARK_GRAFT_WARM_RUNS`` (default
3) additional passes run and the PER-QUERY MEDIAN of the warm passes
lands in ``queries_warm``/``warm_total`` — the stable signal for
round-over-round comparison, immune to the cold-start variance that
cost two verdict cycles in r3/r4. Set SPARK_GRAFT_WARM_RUNS=0 for the
fast single-pass mode while iterating.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _buffcache_mb() -> int | None:
    """Page-cache state (Buffers + Cached, MB) from /proc/meminfo —
    recorded in every bench artifact so a degraded epoch (e.g. a /tmp
    wipe dropping the page cache, BENCH_NOTES round 7) is machine-
    detectable instead of diary-detectable."""
    try:
        kb = 0
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith(("Buffers:", "Cached:")):
                    kb += int(line.split()[1])
        return kb // 1024
    except (OSError, ValueError, IndexError):
        # non-Linux, restricted /proc, or a malformed meminfo line —
        # optional telemetry must never abort a bench epoch.
        return None


def main() -> None:
    try:  # adopt driver-written round evidence (r10 verdict ask 1)
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        import gatelib

        gatelib.stage_round_artifacts()
    except Exception:  # noqa: BLE001 — staging must never block a bench
        pass
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    buffcache_start_mb = _buffcache_mb()
    match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else -1.0

    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="transformers-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first timed query isn't charged for
    # classloading; runs a scan+agg+write through the same machinery,
    # plus one tiny parquet read to initialize the file-source path
    # (footer reader, vectorized column readers).
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    region = os.path.join(sf_dir, "region.parquet")
    if os.path.exists(region):
        spark.read.parquet(region).write.format("noop").mode("overwrite").save()

    from transformers_spark import cache

    def one_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name, spec in QUERIES.items():
            start = time.perf_counter()
            df = spec.build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t[name] = round(time.perf_counter() - start, 4)
            cache.release()  # drop intermediates persisted by this query
        return t

    timings = one_pass()  # cold pass: the headline, comparable to r01-r04
    total = round(sum(timings.values()), 4)

    raw_warm = os.environ.get("SPARK_GRAFT_WARM_RUNS", "3")
    try:
        warm_runs = max(0, int(raw_warm))
    except ValueError:
        print(
            f"bench: SPARK_GRAFT_WARM_RUNS={raw_warm!r} is not an integer; "
            "using default 3",
            file=sys.stderr,
        )
        warm_runs = 3
    warm_passes = [one_pass() for _ in range(warm_runs)]
    warm: dict[str, float] = {}
    if warm_passes:
        for name in timings:
            vals = sorted(p[name] for p in warm_passes)
            mid = len(vals) // 2
            med = (
                vals[mid]
                if len(vals) % 2
                else (vals[mid - 1] + vals[mid]) / 2
            )
            warm[name] = round(med, 4)
    warm_total = round(sum(warm.values()), 4) if warm else None

    # Full 4-decimal map always lands on disk for the judge.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total": warm_total,
                "warm_runs": warm_runs,
                "sf": sf,
                "n_queries": len(timings),
                "buffcache_start_mb": buffcache_start_mb,
                "buffcache_end_mb": _buffcache_mb(),
            },
            fh,
            indent=1,
        )
    if sf == 0.1:
        # Stage the refreshed artifact immediately (r8 verdict ask 1) —
        # but ONLY for the canonical driver scale: a sf0.001 smoke run
        # also overwrites BENCH_FULL.json, and auto-staging that would
        # make accidentally committing a smoke map EASY instead of
        # hard (restore with `git checkout -- BENCH_FULL.json`).
        # Best-effort — staging must never fail a bench run.
        try:
            import subprocess

            subprocess.run(
                ["git", "-C", os.path.dirname(full_path), "add", "--",
                 full_path],
                check=False, capture_output=True, timeout=30,
            )
        except Exception:  # noqa: BLE001
            pass

    # The driver keeps only the LAST 2000 chars of stdout (measured from
    # BENCH_r01.json, where a 3.3KB line lost its opening brace and parsed
    # as null). Emit ONE compact line guaranteed to fit: keep the slowest
    # queries (the informative ones), drop the fastest until the line fits,
    # and record how many were omitted. Everything else goes to stderr.
    budget = 1900
    kept = dict(sorted(timings.items(), key=lambda kv: -kv[1]))

    def line_for(qs: dict[str, float], omitted: int) -> str:
        payload = {
            "metric": "headline_queries_total_time",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in qs.items()},
            "sf": sf,
            "n_queries": len(timings),
            "omitted_fastest": omitted,
            "full": "BENCH_FULL.json",
        }
        if warm_total is not None:
            payload["warm_total"] = warm_total
            payload["warm_runs"] = warm_runs
        if buffcache_start_mb is not None:
            payload["buffcache_start_mb"] = buffcache_start_mb
        return json.dumps(payload, separators=(",", ":"))

    while len(line_for(kept, len(timings) - len(kept))) > budget and kept:
        kept.pop(next(reversed(kept)))  # drop current fastest
    out = line_for(kept, len(timings) - len(kept))
    print(out, flush=True)
    print(f"bench: full per-query map written to {full_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
