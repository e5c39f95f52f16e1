#!/usr/bin/env python
"""100x probe of the removal-policy REWRITE end-to-end (round-10
verdict ask 6): remove_long_dup_substrings' claim that "text never
shuffles" gets its own wall + tokens-removed artifact on the
duplication-saturated corpus.

Reuses sf100_probe's 100x documents slice (every doc gains 99 copies
differing only in a trailing salt token, so cross-doc duplicated runs
cover essentially the whole corpus — the worst case for a removal
policy BY CONSTRUCTION: nearly every token is covered by a qualifying
run, the ranges join touches every doc, and every document is
rebuilt). The probe forces the full rewrite (counting output chars
forces the token filter + array_join on every row) and records rows,
tokens removed, and char savings at 1x and 100x.

    python tools/policy100_probe.py --json POLICY100_r11.json
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

import sf100_probe

MIN_RUN_TOKENS = 50  # the published crawl-dedup convention


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from transformers_spark.operators.text import (
        remove_long_dup_substrings,
    )
    from transformers_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    in_row = docs.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]

    out = remove_long_dup_substrings(
        docs, span_len=8, min_run_tokens=MIN_RUN_TOKENS
    )
    t0 = time.perf_counter()
    row = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens_removed").alias("tokens_removed"),
        F.sum(F.length("deduped_text")).alias("out_chars"),
    ).collect()[0]
    secs = round(time.perf_counter() - t0, 2)
    return {
        "rows": row["rows"],
        "input_chars": int(in_row["chars"]),
        "output_chars": int(row["out_chars"]),
        "tokens_removed": int(row["tokens_removed"]),
        "char_savings_frac": round(
            1.0 - row["out_chars"] / in_row["chars"], 4
        ),
        "rewrite_secs": secs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sf100_probe.build_missing()

    from transformers_spark.session import get_spark

    spark = get_spark(app_name="policy100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop"
    ).mode("overwrite").save()

    result: dict = {
        "operator": "remove_long_dup_substrings",
        "span_len": 8,
        "min_run_tokens": MIN_RUN_TOKENS,
        "dataset": sf100_probe.DST,
        "copies": sf100_probe.COPIES,
        "base": sf100_probe.SRC,
    }
    for label, d in (("1x", sf100_probe.SRC), ("100x", sf100_probe.DST)):
        result[label] = measure(spark, d)
        print(f"{label}: {result[label]}", file=sys.stderr)
    result["wall_ratio"] = round(
        result["100x"]["rewrite_secs"] / result["1x"]["rewrite_secs"], 1
    )

    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        sf100_probe._stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
