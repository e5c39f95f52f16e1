#!/usr/bin/env python
"""Dump `.explain("formatted")` for named catalog queries into
plans/<round>/<query>_<tag>.txt — the judge-checkable evidence files
the optimization rounds cite (OPTIMIZATION_r12.md). Run from any
checkout (worktrees included) to capture before/after plan shapes:

    python tools/plan_dump.py --round r12 --tag after \
        --queries text_span_dedup,dedup_simhash [--out-root /root/repo]

`--out-root` lets a worktree at an old commit write its plans into the
main repo's plans/ dir (the worktree's own plans/ is a throwaway).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--round", default="r12")
    ap.add_argument("--tag", default="after")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out-root", default=REPO)
    args = ap.parse_args()

    from transformers_spark import cache
    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(args.out_root, "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    for name in args.queries.split(","):
        df = QUERIES[name].build(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        cache.release()
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
