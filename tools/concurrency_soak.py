#!/usr/bin/env python
"""A18 concurrency soak (round-8 verdict ask 6).

The engine maps a multi-day REPLACE to ONE dynamic-partition-overwrite
job, so intra-task CONCURRENCY is executor parallelism. What that
leaves unsoaked is ORCHESTRATOR-level concurrency: a scheduler
backfilling adjacent single-day windows runs N `transform()` calls at
once against the SAME destination table — racing the shared catalog
(DDL + refresh), the metastore, and the dynamic-overwrite staging
dirs that all live under one table root.

Isolation rule being proven: each concurrent transform runs on its
own ``spark.newSession()``. Session confs are session-global, not
thread-local — two threads toggling ``partitionOverwriteMode`` on one
session could flip a concurrent INSERT OVERWRITE into whole-table
truncate mode. ``newSession()`` gives each worker its own SQLConf
while sharing the SparkContext and catalog, which is exactly the
shared state the race needs to exercise.

Protocol, per iteration: serial baseline (8 adjacent-day REPLACE
loads, one engine, in order) → per-partition value snapshot → drop +
recreate the destination → concurrent run (8 threads, one day each,
engine-per-newSession, barrier start) → snapshot → bit-exact compare.
Source is the 10x events slice (tools/sf1_soak.py).

    python tools/concurrency_soak.py --json CONCSOAK_r09.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from datetime import date, datetime, timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import sf1_soak


def _stage(p):
    import gatelib
    gatelib.stage_artifact(p)

SRC_FQN = "g-project.playground.conc_events_src"
DEST_FQN = "g-project.playground.conc_replace_dest"
N_WORKERS = 8
DAY0 = datetime(2024, 1, 5)
EXEC_TIME = datetime(2024, 2, 1, 3, 0, 0)

TEMPLATE = f"""
select date(ts) as event_date, count(1) as n,
       cast(sum(cast(value as decimal(20,6))) as double) as sum_v
from `{SRC_FQN}`
where ts >= '{{{{ .DSTART }}}}' and ts < '{{{{ .DEND }}}}'
group by date(ts)
"""


def _cfg():
    from transformers_spark.config import LoadMethod, TaskConfig

    return TaskConfig(
        destination_project="g-project",
        destination_dataset="playground",
        destination_table_name="conc_replace_dest",
        load_method=LoadMethod.REPLACE,
        concurrency=N_WORKERS,
    )


def _setup_source(spark) -> None:
    from transformers_spark.catalog import Catalog

    cat = Catalog(spark)
    if spark.catalog.tableExists(cat.spark_name(SRC_FQN)):
        return
    cat.create_table(
        SRC_FQN,
        [
            ("event_id", "bigint"),
            ("ts", "timestamp"),
            ("user_id", "bigint"),
            ("event_type", "string"),
            ("value", "double"),
        ],
    )
    ev10 = os.path.join(sf1_soak.DST, "events.parquet")
    spark.read.parquet(ev10).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.insertInto(cat.spark_name(SRC_FQN))


def _recreate_dest(spark) -> None:
    from transformers_spark.catalog import (
        Catalog, PartitionKind, PartitionSpec,
    )

    cat = Catalog(spark)
    cat.drop_table(DEST_FQN)
    cat.create_table(
        DEST_FQN,
        [("event_date", "date"), ("n", "bigint"), ("sum_v", "double")],
        PartitionSpec(kind=PartitionKind.INGESTION_DAY),
    )


def _one_day_load(session, day: datetime) -> None:
    from transformers_spark.engine import Engine, compile_assets
    from transformers_spark.config import LoadMethod

    eng = Engine(session)
    sql = compile_assets(TEMPLATE, day, day + timedelta(days=1),
                         LoadMethod.REPLACE)
    eng.transform(_cfg(), sql, day, day + timedelta(days=1), EXEC_TIME)


def _snapshot(spark) -> dict[str, list]:
    """{dt: sorted rows} — full values, so the compare is bit-exact."""
    from transformers_spark.catalog import Catalog

    cat = Catalog(spark)
    rows = spark.table(cat.spark_name(DEST_FQN)).collect()
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(str(r["dt"]), []).append(
            (str(r["event_date"]), r["n"], repr(r["sum_v"]))
        )
    return {k: sorted(v) for k, v in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args()

    sf1_soak.build_missing()

    from transformers_spark.session import get_spark

    spark = get_spark(app_name="concurrency-soak")
    spark.sparkContext.setLogLevel("ERROR")
    _setup_source(spark)

    days = [DAY0 + timedelta(days=i) for i in range(N_WORKERS)]
    result: dict = {"n_workers": N_WORKERS, "days": [
        d.date().isoformat() for d in days], "iterations": []}

    for it in range(args.iterations):
        _recreate_dest(spark)
        t0 = time.perf_counter()
        for day in days:
            _one_day_load(spark, day)
        serial_secs = round(time.perf_counter() - t0, 2)
        serial = _snapshot(spark)
        assert len(serial) == N_WORKERS, (
            f"serial run produced {len(serial)} partitions: "
            f"{sorted(serial)}"
        )

        _recreate_dest(spark)
        barrier = threading.Barrier(N_WORKERS)
        errors: list[str] = []

        def work(day: datetime) -> None:
            try:
                session = spark.newSession()
                barrier.wait(timeout=120)
                _one_day_load(session, day)
            except Exception as err:  # noqa: BLE001 — soak reports all
                errors.append(f"{day.date()}: {err!r}")

        threads = [threading.Thread(target=work, args=(d,)) for d in days]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        conc_secs = round(time.perf_counter() - t0, 2)
        conc = _snapshot(spark)

        match = not errors and conc == serial
        row = {
            "iteration": it,
            "serial_secs": serial_secs,
            "concurrent_secs": conc_secs,
            "errors": errors,
            "partitions_match": conc == serial,
            "n_partitions": len(conc),
            "ok": match,
        }
        if not match:
            only_serial = {k: v for k, v in serial.items()
                           if conc.get(k) != v}
            row["mismatched_partitions"] = sorted(only_serial)
        result["iterations"].append(row)
        print(f"iter {it}: serial {serial_secs}s concurrent {conc_secs}s "
              f"ok={match} errors={len(errors)}", file=sys.stderr)

    result["all_ok"] = all(r["ok"] for r in result["iterations"])
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        _stage(args.json)
    spark.stop()
    if not result["all_ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
