#!/usr/bin/env python
"""One-shot 100x probe of the heaviest data-bound pipelines (round-7
verdict ask 8): the soak evidence is 10x, the brief's bar is 100x.

Builds a 100x slice of sf0.1 documents + embeddings (map-only salted
copies, same recipe as sf1_soak — text salt keeps exact-dedup from
collapsing copies; vector jitter keeps neighbors distinct) under the
scratch root, then:

* records the WORKLOAD UNIT at 1x and 100x via the standing audits —
  LSH pair slots (`lsh_band_bucket_skew`, the unit wall clock follows
  per the r6/r7 soaks) and ANN candidate counts;
* runs the probed pipelines ONCE each with wall clock.

The 100x corpus is deliberately duplication-heavy (every doc gains 99
near-identical copies): that is the regime a crawl-scale dedup
actually faces, and it exercises the max_bucket_size cap, the
candidate-pair join, and the distributed connected-components path
(>2M edges forces label propagation off the driver) all at once.

    python tools/sf100_probe.py --json SF100_r08.json
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

import scratch


def _stage(p):
    import gatelib
    gatelib.stage_artifact(p)

SRC = "/root/testdata/sf0.1"
DST = scratch.scratch_path("sf100_probe")
COPIES = 100


def build_missing() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    for table in ("documents", "embeddings"):
        src = os.path.join(SRC, f"{table}.parquet")
        dst = os.path.join(DST, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        # Copies are offset by a fixed 1e6 stride; a base corpus with ids
        # at or above the stride would silently collide with its copies
        # and corrupt the workload-unit measurements (r8 ADVICE).
        id_col = "doc_id" if table == "documents" else "vec_id"
        max_id = duckdb.sql(
            f"SELECT max({id_col}) FROM read_parquet('{src}')"
        ).fetchone()[0]
        if max_id is not None and max_id >= 1_000_000:
            raise SystemExit(
                f"{table}: max {id_col}={max_id} >= 1e6 stride; "
                "raise the copy stride before probing"
            )
        if table == "documents":
            copies = " UNION ALL ".join(
                f"SELECT doc_id + {i} * 1000000 AS doc_id, "
                f"text || ' salt{i}tok' AS text, lang, source, "
                f"n_chars + {len(f' salt{i}tok')} AS n_chars "
                f"FROM read_parquet('{src}')"
                for i in range(COPIES)
            )
        else:
            copies = " UNION ALL ".join(
                "SELECT vec_id + {o} AS vec_id, "
                "list_transform(embedding, x -> x + {j}) AS embedding, "
                "label FROM read_parquet('{s}')".format(
                    o=i * 1000000, j=i * 1e-4, s=src
                )
                for i in range(COPIES)
            )
        duckdb.sql(f"COPY ({copies}) TO '{dst}' (FORMAT PARQUET)")
        print(f"built 100x {table}", file=sys.stderr)
    # the probed pipelines read only documents/embeddings; symlink the
    # rest so register_tables finds a complete directory if ever needed
    for fname in sorted(os.listdir(SRC)):
        if fname.endswith(".parquet"):
            dst = os.path.join(DST, fname)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, fname), dst)


def timed(spark, qname: str, sf_dir: str) -> dict:
    from transformers_spark import cache
    from transformers_spark.queries import QUERIES

    t0 = time.perf_counter()
    df = QUERIES[qname].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    secs = round(time.perf_counter() - t0, 2)
    cache.release()
    return {"query": qname, "secs": secs}


def workload_units(spark, sf_dir: str) -> dict:
    """The standing audits AS instruments: total LSH pair slots and
    bucket profile over ``sf_dir``."""
    from transformers_spark import cache
    from transformers_spark.queries import QUERIES

    rows = QUERIES["lsh_band_bucket_skew"].build(spark, sf_dir).collect()
    cache.release()
    return {
        "pair_slots": sum(r["pair_slots"] for r in rows),
        "n_entries": sum(r["n_entries"] for r in rows),
        "max_bucket": max((r["max_sz"] for r in rows), default=0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--queries", default="dedup_pipeline,similarity_pq_adc")
    args = ap.parse_args()

    build_missing()

    from transformers_spark.session import get_spark

    spark = get_spark(app_name="sf100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()

    result: dict = {"dataset": DST, "copies": COPIES, "base": SRC}
    for label, d in (("1x", SRC), ("100x", DST)):
        t0 = time.perf_counter()
        result[f"workload_{label}"] = workload_units(spark, d)
        result[f"workload_{label}"]["audit_secs"] = round(
            time.perf_counter() - t0, 2)
        print(f"workload {label}: {result[f'workload_{label}']}",
              file=sys.stderr)

    probes = []
    for qname in args.queries.split(","):
        rows = {}
        for label, d in (("1x", SRC), ("100x", DST)):
            r = timed(spark, qname, d)
            rows[label] = r["secs"]
            print(f"{qname} @ {label}: {r['secs']}s", file=sys.stderr)
        rows["query"] = qname
        rows["wall_ratio"] = round(rows["100x"] / rows["1x"], 1)
        probes.append(rows)
    result["probes"] = probes

    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()


if __name__ == "__main__":
    main()
