#!/usr/bin/env python
"""ANN soak at 10x embeddings (round-6 verdict ask 5).

The ANN family's scaling evidence was `similarity_ivf_kmeans` only
(r5, ~3.2x at 10x). This measures the other two production shapes at
10x embeddings (the sf1_soak jittered copies under tools/scratch.py's
root), with the MEASURED
workload unit alongside wall time (the lesson from dedup_lsh's
"12.6x wall is 109x pair-slots"):

* `similarity_pq_adc` — workload = ADC score slots (|codes| x |q|,
  grows 10x) + exact re-rank rows (|q| x 20, CONSTANT: the shortlist
  is the scale story — re-rank cost is independent of corpus size);
* `similarity_lsh_ann` — workload = bucket-join candidates actually
  scored (grows ~10x when buckets stay balanced; a skewed bucket
  would show here as super-linear candidates, not mystery wall time).

    python tools/ann_soak.py --json ANNSOAK_r07.json
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import sf1_soak

SOAK = sf1_soak.DST
SF01 = "/root/testdata/sf0.1"


def workload_units(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from transformers_spark.operators.similarity import (
        hyperplane_signature,
        hyperplane_weights,
    )
    from transformers_spark.operators.specs import N_QUERY_VECS

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_corpus = emb.filter(F.col("embedding").isNotNull()).count()
    n_query = emb.filter(
        (F.col("vec_id") < N_QUERY_VECS) & F.col("embedding").isNotNull()
    ).count()
    # same 8-plane/64-dim signature lsh_bucketed_topk uses
    weights = hyperplane_weights(8, 64)
    sigs = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        hyperplane_signature(F.col("embedding"), weights).alias("bucket"),
    )
    qs = sigs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), "bucket"
    )
    lsh_candidates = (
        qs.join(sigs, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .count()
    )
    return {
        "n_corpus": n_corpus,
        "n_query": n_query,
        "adc_score_slots": n_corpus * n_query,
        "rerank_rows": n_query * 20,
        "lsh_candidates": lsh_candidates,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf1_soak.build_missing()

    from transformers_spark import cache
    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="ann-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()

    result: dict = {"dataset": SOAK}
    units = {label: workload_units(spark, sf)
             for label, sf in (("sf0.1", SF01), ("10x", SOAK))}
    result["workload_units"] = units
    print(json.dumps(units, indent=1), file=sys.stderr)

    for qname in ("similarity_pq_adc", "similarity_lsh_ann"):
        rows = {}
        for label, sf in (("sf0.1", SF01), ("10x", SOAK)):
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                QUERIES[qname].build(spark, sf).write.format("noop").mode(
                    "overwrite").save()
                times.append(round(time.perf_counter() - t0, 2))
                cache.release()
            warm = sorted(times[1:])[len(times[1:]) // 2]
            rows[label] = {"cold": times[0], "warm_median": warm,
                           "all": times}
            print(f"{qname} @ {label}: cold {times[0]}s warm {warm}s",
                  file=sys.stderr)
        rows["warm_ratio_10x"] = round(
            rows["10x"]["warm_median"] / rows["sf0.1"]["warm_median"], 2)
        result[qname] = rows

    # per-unit cost: wall ratio vs workload ratio
    result["attribution"] = {
        "pq_adc_slots_ratio": round(
            units["10x"]["adc_score_slots"]
            / units["sf0.1"]["adc_score_slots"], 2),
        "lsh_candidates_ratio": round(
            units["10x"]["lsh_candidates"]
            / max(1, units["sf0.1"]["lsh_candidates"]), 2),
    }
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
