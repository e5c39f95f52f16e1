#!/usr/bin/env python
"""sf1 soak harness (round-5 verdict ask 8, extended by round-6 ask 5).

/root/testdata has no sf1, so a bench-only 10× extension of sf0.1 is
built under the scratch root (tools/scratch.py) as sf1_soak:

* documents — 10 id-offset copies with per-copy salt tokens (so
  near-dup structure SCALES instead of collapsing into exact cliques);
* embeddings — 10 id-offset copies with deterministic per-copy jitter;
* lineitem — 10 order-key-offset copies (10× ORDERS, same basket-size
  distribution — the realistic growth axis for market-basket mining);
* events — 10 (event_id, user_id)-offset copies (10× users);
* everything else — a plain copy of sf0.1.

Tables already present in the output dir are NOT rebuilt (the r5 doc/
embedding variants stay byte-identical across rounds for
comparability). Then each named query runs --runs times and the warm
median (runs 2+) prints as a BENCH_NOTES-ready row.

    python tools/sf1_soak.py order_basket_pairs source_overlap_matrix \
        text_bm25_retrieval dedup_lsh_precision text_ngram_novelty
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scratch

SRC = "/root/testdata/sf0.1"
DST = scratch.scratch_path("sf1_soak")
COPIES = 10


def build_missing() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        src = os.path.join(SRC, fname)
        dst = os.path.join(DST, fname)
        if os.path.exists(dst):
            # r5's documents/embeddings variants (salted text / jittered
            # vectors) are kept as-is for round-over-round comparability
            continue
        if table == "documents":
            copies = " UNION ALL ".join(
                f"SELECT doc_id + {i} * 1000000 AS doc_id, "
                f"text || ' salt{i}tok' AS text, lang, source, "
                f"n_chars + {len(f' salt{i}tok')} AS n_chars "
                f"FROM read_parquet('{src}')"
                for i in range(COPIES)
            )
        elif table == "embeddings":
            copies = " UNION ALL ".join(
                "SELECT vec_id + {o} AS vec_id, "
                "list_transform(embedding, x -> x + {j}) AS embedding, "
                "label FROM read_parquet('{s}')".format(
                    o=i * 1000000, j=i * 1e-3, s=src
                )
                for i in range(COPIES)
            )
        elif table == "lineitem":
            copies = " UNION ALL ".join(
                f"SELECT l_orderkey + {i} * 100000000 AS l_orderkey, "
                f"l_partkey, l_suppkey, l_linenumber, l_quantity, "
                f"l_extendedprice, l_discount, l_tax, l_returnflag, "
                f"l_linestatus, l_shipdate FROM read_parquet('{src}')"
                for i in range(COPIES)
            )
        elif table == "events":
            copies = " UNION ALL ".join(
                f"SELECT event_id + {i} * 100000000 AS event_id, ts, "
                f"user_id + {i} * 1000000 AS user_id, event_type, value, "
                f"props FROM read_parquet('{src}')"
                for i in range(COPIES)
            )
        else:
            shutil.copyfile(src, dst)
            continue
        duckdb.sql(f"COPY ({copies}) TO '{dst}' (FORMAT PARQUET)")
        print(f"built 10x {table}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    build_missing()

    from transformers_spark import cache
    from transformers_spark.queries import QUERIES
    from transformers_spark.session import get_spark

    spark = get_spark(app_name="sf1-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.queries:
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name].build(spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            cache.release()
        warm = sorted(times[1:])[len(times[1:]) // 2] if len(times) > 1 else times[0]
        print(
            f"{name}: cold {times[0]:.2f}s, warm-median {warm:.2f}s "
            f"(all: {[round(t, 2) for t in times]})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
