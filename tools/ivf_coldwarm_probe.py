#!/usr/bin/env python
"""Attribute the cold-vs-warm gap on ivf_probe_recall_curve (round-9
verdict ask 4): the driver's headline bench reads ~8.5 s for this
query while the same BENCH_FULL's warm pass reads ~4 s — the worst
cold ratio in the top tier. Decompose the gap with fresh-JVM
subprocess sessions at the bench sf:

* arm "cold_first": fresh session, the query is the FIRST action —
  its wall includes JVM/codegen warmup, parquet footer reads, AND any
  per-run setup the query itself does (codebook collects).
* arm "generic_warmup_first": fresh session, a GENERIC warmup that
  never touches the query's operators (range->noop + a count over
  the embeddings scan) runs first, then the query. If this arm's
  query wall drops to ~warm, the gap is session warmup (JVM JIT +
  first scan), not per-run work inside the query.
* arm "codebook_only": fresh session, time ONLY the codebook
  collection step (the one driver-side job inside ivf_topk) cold and
  warm — bounds how much of the gap per-call codebook collects can
  explain.

Each arm also reports the in-session warm second/third runs.

    python tools/ivf_coldwarm_probe.py --json IVFCOLD_r10.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ARM_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from transformers_spark.session import get_spark
from transformers_spark import cache
from transformers_spark.queries import QUERIES

arm = {arm!r}
sf = {sf!r}
spark = get_spark(app_name="ivf-coldwarm-" + arm)
spark.sparkContext.setLogLevel("ERROR")
out = {{"arm": arm}}

def run_query():
    t0 = time.perf_counter()
    df = QUERIES["ivf_probe_recall_curve"].build(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    secs = round(time.perf_counter() - t0, 2)
    cache.release()
    return secs

if arm == "generic_warmup_first":
    t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop").mode("overwrite").save()
    spark.read.parquet(sf + "/embeddings.parquet").count()
    out["warmup_secs"] = round(time.perf_counter() - t0, 2)

if arm == "codebook_only":
    from pyspark.sql import functions as F
    from transformers_spark.operators.similarity import _collect_codebook
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centvec"))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _collect_codebook(cent)
        runs.append(round(time.perf_counter() - t0, 2))
    out["codebook_collect_secs"] = runs
else:
    out["query_secs"] = [run_query() for _ in range(3)]

spark.stop()
print("ARM_RESULT " + json.dumps(out))
"""


def run_arm(arm: str) -> dict:
    script = ARM_SCRIPT.format(repo=REPO, arm=arm, sf=SF)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ARM_RESULT "):
            return json.loads(line[len("ARM_RESULT "):])
    raise SystemExit(
        f"arm {arm} produced no result\nstdout:{proc.stdout[-2000:]}"
        f"\nstderr:{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    result = {"sf": SF, "arms": {}}
    for arm in ("cold_first", "generic_warmup_first", "codebook_only"):
        r = run_arm(arm)
        result["arms"][arm] = r
        print(f"{arm}: {r}", file=sys.stderr)

    cold = result["arms"]["cold_first"]["query_secs"]
    warmed = result["arms"]["generic_warmup_first"]["query_secs"]
    result["summary"] = {
        "cold_first_run": cold[0],
        "warm_steady": round(sum(cold[1:]) / len(cold[1:]), 2),
        "after_generic_warmup_first_run": warmed[0],
        "cold_gap": round(cold[0] - sum(cold[1:]) / len(cold[1:]), 2),
        "gap_explained_by_generic_warmup": round(
            cold[0] - warmed[0], 2
        ),
    }
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        import gatelib

        gatelib.stage_artifact(args.json)


if __name__ == "__main__":
    main()
