#!/usr/bin/env python
"""100x probe of the mid-swap backup/restore path itself (r11 verdict
ask 5): the crash contract is fault-injected at test scale in
tests/test_crash_atomicity.py, but the RESTORE (_restore_from_backup
rewrites the covered content from the bak table) had no measured wall
or convergence point at data scale. This kills a real process
mid-swap on the MERGE100-scale standing index (~2M rows on the 100x
saturated corpus), then measures:

* restore wall — _restore_pending_backup at the next DML entry;
* bit-identical recovery — the restored table equals the recomputed
  pre-crash fixture content (two-sided exceptAll empty);
* re-run convergence — the re-run MERGE's post-state equals the
  fresh full-corpus index (same invariant as merge100_probe).

Three processes over one embedded Hive metastore in a scratch cwd:
(1) build fixture, patch the swap's insertInto to physically damage
the destination (delete its files — strictly worse than any real
partial swap) and os._exit(137) mid-swap, AFTER the bak committed;
(2) restore + verify bit-identity; (3) = (2) continues: re-run the
MERGE to convergence.

    python tools/bakrestore100_probe.py --json BAKRESTORE100_r12.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scratch
from sf100_probe import DST, build_missing

FQN = "g-project.playground.cdc_lsh_index"

_COMMON = """
import os, sys, time
sys.path.insert(0, {repo!r})
from transformers_spark.session import get_spark

spark = get_spark(
    app_name={app!r}, hive=True, warehouse_dir={wh!r},
    master="local[16]", shuffle_partitions=32,
    extra_conf={{
        "spark.ui.enabled": "false",
        "spark.driver.host": "127.0.0.1",
    }},
)
spark.sparkContext.setLogLevel("ERROR")
FQN = {fqn!r}
SF_DIR = {sf_dir!r}
"""

_CRASH = _COMMON + """
import glob, shutil
from transformers_spark.expansion4 import _cdc_merge_setup
from transformers_spark.dml import execute_merge

cat, writer, stmt, fqn = _cdc_merge_setup(spark, SF_DIR)
meta = cat.get_table(fqn)
pre_rows = spark.table(meta.spark_name).count()
print("PRE_ROWS", pre_rows, flush=True)
loc = next(
    r[1] for r in spark.sql(
        "DESCRIBE FORMATTED " + meta.spark_name).collect()
    if (r[0] or "").strip() == "Location"
).removeprefix("file:")

# the MERGE's swap is its first DataFrameWriter.insertInto (the stage
# and the bak both go through saveAsTable); damage the destination for
# real, then die — the bak is already committed at this point
from pyspark.sql.readwriter import DataFrameWriter
def _killed(self, *a, **k):
    for p in glob.glob(loc + "/*"):
        (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
    sys.stdout.write("DEST_DAMAGED\\n"); sys.stdout.flush()
    os._exit(137)
DataFrameWriter.insertInto = _killed

execute_merge(spark, cat, writer, stmt, fqn)
raise SystemExit("unreachable: the swap should have killed us")
"""

_RECOVER = _COMMON + """
from pyspark.sql import functions as F
from transformers_spark.catalog import Catalog
from transformers_spark.loaders import Writer
from transformers_spark.expansion4 import _cdc_fixture_frames, _cdc_merge_setup
from transformers_spark.dml import execute_merge
from transformers_spark.operators.dedup import (
    DEMO_BANDS, DEMO_NUM_PERM, minhash_band_buckets,
)

cat = Catalog(spark)
writer = Writer(spark, cat)
meta = cat.get_table(FQN)

t0 = time.time()
restored = writer._restore_pending_backup(meta)
restore_secs = round(time.time() - t0, 2)
assert restored, "no pending bak found — the crash arm did not commit one"
print("RESTORE_SECS", restore_secs, flush=True)

# bit-identical recovery: restored table == recomputed fixture content
expected, new_batch = _cdc_fixture_frames(spark, SF_DIR)
table = spark.table(meta.spark_name)
missing = expected.exceptAll(table).count()
extra = table.exceptAll(expected).count()
print("RESTORE_DIFF", missing, extra, flush=True)
assert missing == 0 and extra == 0, (missing, extra)

# re-run the load to convergence (rebuilds fixture + MERGE), then the
# merge100 invariant: post-state equals the fresh full-corpus index
t0 = time.time()
cat2, writer2, stmt, fqn = _cdc_merge_setup(spark, SF_DIR)
execute_merge(spark, cat2, writer2, stmt, fqn)
rerun_secs = round(time.time() - t0, 2)
merged = cat2.read(fqn)
fresh = (
    minhash_band_buckets(
        spark.table("documents"),
        num_perm=DEMO_NUM_PERM, bands=DEMO_BANDS,
    )
    .select("doc", F.col("band").cast("int").alias("band"), "bucket")
    .distinct()
)
m2 = fresh.exceptAll(merged).count()
e2 = merged.exceptAll(fresh).count()
print("RERUN", rerun_secs, m2, e2, flush=True)
assert m2 == 0 and e2 == 0, (m2, e2)
print("BAKRESTORE_OK", flush=True)
"""


def _run(script: str, cwd: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("TRANSFORMERS_SPARK_HIVE", None)
    return subprocess.run(
        [sys.executable, "-c", script], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=3000,
    )


def _grab(stdout: str, tag: str) -> list[str]:
    for ln in stdout.splitlines():
        if ln.startswith(tag + " "):
            return ln.split()[1:]
    raise RuntimeError(f"marker {tag} missing from:\n{stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    build_missing()
    cwd = scratch.scratch_path("bakrestore100")
    shutil.rmtree(cwd, ignore_errors=True)
    os.makedirs(cwd)
    wh = os.path.join(cwd, "warehouse")
    fmt = dict(repo=REPO, wh=wh, fqn=FQN, sf_dir=DST)

    crash = _run(_CRASH.format(app="bakrestore-crash", **fmt), cwd)
    if crash.returncode != 137 or "DEST_DAMAGED" not in crash.stdout:
        raise RuntimeError(
            f"crash arm rc={crash.returncode}\n"
            f"stdout: {crash.stdout[-2000:]}\nstderr: {crash.stderr[-3000:]}"
        )
    pre_rows = int(_grab(crash.stdout, "PRE_ROWS")[0])

    rec = _run(_RECOVER.format(app="bakrestore-recover", **fmt), cwd)
    if rec.returncode != 0 or "BAKRESTORE_OK" not in rec.stdout:
        raise RuntimeError(
            f"recover arm rc={rec.returncode}\n"
            f"stdout: {rec.stdout[-2000:]}\nstderr: {rec.stderr[-3000:]}"
        )
    restore_secs = float(_grab(rec.stdout, "RESTORE_SECS")[0])
    miss, extra = map(int, _grab(rec.stdout, "RESTORE_DIFF"))
    rerun_secs, m2, e2 = _grab(rec.stdout, "RERUN")

    result = {
        "dataset": DST,
        "table": FQN,
        "pre_crash_rows": pre_rows,
        "crash": "mid-swap kill with destination files deleted "
                 "(strictly worse than any real partial swap)",
        "restore_secs": restore_secs,
        "restore_missing_rows": miss,
        "restore_extra_rows": extra,
        "restore_bit_identical": miss == 0 and extra == 0,
        "rerun_secs": float(rerun_secs),
        "rerun_missing_vs_fresh": int(m2),
        "rerun_extra_vs_fresh": int(e2),
        "rerun_converged": int(m2) == 0 and int(e2) == 0,
    }
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        import gatelib

        gatelib.stage_artifact(args.json)
    shutil.rmtree(cwd, ignore_errors=True)


if __name__ == "__main__":
    main()
