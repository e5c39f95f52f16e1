#!/usr/bin/env python
"""Run a set of queries (default: the newest catalog additions) across
every already-built robustness-wave dataset under the scratch root
(tools/scratch.py) — the incremental
companion to the full per-wave gates, so a mid-round catalog append
gets wave coverage without re-running 163 queries x 9 waves.

    python tools/newq_waves.py --json NEWQ_WAVES_r06.json q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scratch

import gatelib

WAVES = [
    ("null-w1", scratch.scratch_path("nulldata_sf0.001")),
    ("null-w2", scratch.scratch_path("nulldata_sf0.001-w2")),
    ("null-w3", scratch.scratch_path("nulldata_sf0.001-w3")),
    ("null-all", scratch.scratch_path("nulldata_sf0.001-w2-w3")),
    ("degentext", scratch.scratch_path("degentext_sf0.001")),
    ("badjson", scratch.scratch_path("badjson_sf0.001")),
    ("unicode", scratch.scratch_path("unicode_sf0.001")),
    ("extreme", scratch.scratch_path("extreme_sf0.001")),
    ("duprows", scratch.scratch_path("duprows_sf0.001")),
    ("skew", scratch.scratch_path("skew_sf0.001")),
]

DEFAULT_QUERIES = [
    # the round-9 additions (expansion6): the usual mid-round replay
    # targets until the next catalog append
    "similarity_hard_negatives", "split_leakage_exact",
    "dedup_token_savings", "source_language_gini",
    "dedup_quality_by_cluster_size", "curation_yield_report",
    "text_char_bigram_diversity", "lsh_scurve_calibration",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    import __spark_entry__ as entry_mod
    from gatelib import compare_queries, summarize

    from transformers_spark.session import get_spark

    qs = entry_mod.queries()
    spark = get_spark(app_name="newq-waves")
    spark.sparkContext.setLogLevel("ERROR")

    artifact: dict[str, dict] = {}
    bad = 0
    for label, dst in WAVES:
        if not os.path.isdir(dst):
            print(f"skip {label}: {dst} not built", file=sys.stderr)
            continue
        print(f"=== wave {label} ===", file=sys.stderr)
        results = compare_queries(spark, qs, names, dst)
        summ = summarize(results)
        artifact[label] = {"data": dst, **summ}
        bad += len(summ["mismatches"]) + len(summ["errors"])

    print("\n=== NEWQ-WAVES SUMMARY ===")
    for label, row in artifact.items():
        reds = row["mismatches"] + row["errors"]
        print(f"  {label}: {row['n_green']}/{row['n_checked']}"
              + (f"  RED: {reds}" if reds else ""))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"queries": names, "waves": artifact}, fh, indent=1)
        gatelib.stage_artifact(args.json)
        print(f"wrote {args.json}")
    spark.stop()


if __name__ == "__main__":
    main()
