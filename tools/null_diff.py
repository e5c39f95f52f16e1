#!/usr/bin/env python
"""Row-level diff of one catalog query vs its oracle on the
null-injected data built by tools/null_gate.py (triage helper)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scratch

DST = scratch.scratch_path("nulldata_sf0.001")


def main() -> None:
    global DST
    name = sys.argv[1]
    if len(sys.argv) > 2:
        DST = sys.argv[2]
    import __spark_entry__ as entry_mod

    from transformers_spark.canon import duckdb_connect_views, normalize_rows
    from transformers_spark.queries import oracle_for
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="null-diff")
    spark.sparkContext.setLogLevel("ERROR")
    sdf = entry_mod.queries()[name](spark, DST)
    spark_cols = [c.lower() for c in sdf.columns]
    srows = normalize_rows([tuple(r) for r in sdf.collect()], spark_cols)

    con = duckdb_connect_views(DST)
    res = con.execute(oracle_for(name, DST))
    duck_cols = [d[0].lower() for d in res.description]
    drows = normalize_rows(res.fetchall(), duck_cols)

    print(f"spark rows: {len(srows)}  duck rows: {len(drows)}  cols: {sorted(spark_cols)}")
    sset, dset = set(map(tuple, srows)), set(map(tuple, drows))
    only_s = sorted(sset - dset)[:8]
    only_d = sorted(dset - sset)[:8]
    for r in only_s:
        print("SPARK-ONLY:", r)
    for r in only_d:
        print("DUCK-ONLY :", r)
    spark.stop()


if __name__ == "__main__":
    main()
