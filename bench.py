#!/usr/bin/env python
"""Benchmark harness: runs the headline query catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full plan
execution, no driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        start = time.perf_counter()
        df = spec.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
