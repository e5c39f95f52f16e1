#!/usr/bin/env python
"""100x probe of the whole-table mid-swap recovery path at data
scale (r11 verdict ask 5, updated for the r13 RENAME-SWAP protocol):
the crash contract is fault-injected at test scale in
tests/test_crash_atomicity.py; this re-proves it on the MERGE100-scale
standing index (~2M rows on the 100x saturated corpus). The MERGE's
swap is killed for real BETWEEN its two renames — the one window that
leaves the destination NAME absent (its files intact under
``__old_``) — then a second process measures:

* restore wall — ``Catalog.get_table`` adopting the ``__old_`` back
  (a zero-copy metastore rename; the r12 snapshot protocol needed a
  13.8 s full-table rewrite here, BAKRESTORE100_r12.json);
* bit-identical recovery — the adopted table equals the recomputed
  pre-crash fixture content (two-sided exceptAll empty) — trivially
  so, because they are the ORIGINAL files;
* re-run convergence — the re-run MERGE's post-state equals the
  fresh full-corpus index (same invariant as merge100_probe).

    python tools/bakrestore100_probe.py --json BAKRESTORE100_r13.json
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
# kill BETWEEN the rename-swap's two renames: the first rename runs
# for real (destination name absent, original files intact under
# __old_), then the process dies before the stage is renamed in —
# the exact window the adoption path exists for
from transformers_spark.loaders import Writer as _W
_orig_rename = _W._rename_table
def _killed(self, src, dst):
    _orig_rename(self, src, dst)
    sys.stdout.write("DEST_DAMAGED\\n"); sys.stdout.flush()
    os._exit(137)
_W._rename_table = _killed

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

# the destination NAME is absent after the crash; this lookup adopts
# the intact __old_ table back (zero-copy rename)
t0 = time.time()
meta = cat.get_table(FQN)
restore_secs = round(time.time() - t0, 2)
assert spark.catalog.tableExists(meta.spark_name), "adoption failed"
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
        "crash": "kill between the rename-swap's two renames "
                 "(destination name absent, files intact under __old_)",
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
