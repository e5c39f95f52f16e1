"""Shared dual-engine compare loop for the robustness gates.

Every gate (null waves, degenerate text, malformed JSON, unicode,
extreme values, empty-input, duplicate-row, adversarial-skew) runs the
same check: build a mutated copy of sf0.001, then run every catalog
query on BOTH engines over it and demand equality. This module holds
the one loop they all share so a fix lands everywhere at once.

A loud ERROR can be a contract (operators like ntiles_wide reject
null keys by design; codebook training rejects empty input) — gates
pass an ``expected_errors`` map {query: exception-name} to pin WHICH
queries legitimately error on a wave's data, and the loop greens them
only when the raised type matches the pin.
"""

from __future__ import annotations

import sys
import time
import traceback


def compare_queries(
    spark,
    qs: dict,
    names: list[str],
    dst: str,
    expected_errors: dict[str, str] | None = None,
) -> dict[str, dict]:
    """Run each query on Spark and its oracle on DuckDB over ``dst``;
    return {name: {"status", "secs", ...}}. status is one of
    green | green (expected <Exc>) | MISMATCH | ERROR (<Exc>)."""
    from transformers_spark import cache
    from transformers_spark.canon import (
        duckdb_connect_views,
        normalize_rows,
        pandas_canon,
    )
    from transformers_spark.queries import oracle_for

    expected_errors = expected_errors or {}
    out: dict[str, dict] = {}
    for i, name in enumerate(names):
        sdf = None
        t0 = time.perf_counter()
        try:
            oracle = oracle_for(name, dst)
            if oracle is None:
                continue
            # the expected_errors pin documents an ENGINE-side contract
            # (e.g. "empty training set"), so only the engine build +
            # collect may satisfy it — an exception of the same type
            # from the DuckDB oracle or the comparison below must stay
            # a loud ERROR, not a silent green
            try:
                sdf = qs[name](spark, dst).persist()
                spark_cols = [c.lower() for c in sdf.columns]
                spark_rows = [tuple(r) for r in sdf.collect()]
            except Exception as exc:
                exc_name = type(exc).__name__
                if expected_errors.get(name) == exc_name:
                    row = {
                        "status": f"green (expected {exc_name})",
                        "rows": None,
                    }
                    row["secs"] = round(time.perf_counter() - t0, 3)
                    out[name] = row
                    print(
                        f"[{i + 1}/{len(names)}] {name}: {row['status']}"
                        f" ({row['secs']}s)",
                        file=sys.stderr,
                    )
                    continue
                raise
            con = duckdb_connect_views(dst)
            res = con.execute(oracle)
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
            ok = (
                len(spark_rows) == len(duck_rows)
                and sorted(spark_cols) == sorted(duck_cols)
                and normalize_rows(spark_rows, spark_cols)
                == normalize_rows(duck_rows, duck_cols)
                and pandas_canon(sdf.toPandas())
                == pandas_canon(con.execute(oracle).fetch_df())
            )
            row = {
                "status": "green" if ok else "MISMATCH",
                "rows": len(spark_rows),
            }
        except Exception as exc:
            row = {
                "status": f"ERROR ({type(exc).__name__})",
                "rows": None,
                "traceback": traceback.format_exc(limit=3),
            }
        finally:
            if sdf is not None:
                sdf.unpersist()
            cache.release()
        row["secs"] = round(time.perf_counter() - t0, 3)
        out[name] = row
        print(
            f"[{i + 1}/{len(names)}] {name}: {row['status']}"
            f" ({row['secs']}s)",
            file=sys.stderr,
        )
    return out


def summarize(results: dict[str, dict]) -> dict:
    greens = [n for n, r in results.items() if r["status"].startswith("green")]
    mism = [n for n, r in results.items() if r["status"] == "MISMATCH"]
    errs = [n for n, r in results.items() if r["status"].startswith("ERROR")]
    return {
        "n_checked": len(results),
        "n_green": len(greens),
        "mismatches": mism,
        "errors": errs,
    }


def stage_round_artifacts() -> list[str]:
    """Stage every repo-root round-evidence JSON the DRIVER wrote after
    the previous round's last commit (round-10 verdict ask 1: six
    consecutive rounds tripped
    ``test_artifact_tracking.test_round_artifacts_are_git_tracked``
    because ``BENCH_r{N}.json`` / ``CORRECTNESS_r{N}.json`` land on
    disk untracked and staging relied on a human noticing at the next
    round's first pytest run). Builder-side writers already stage at
    their own write sites via :func:`stage_artifact`; this sweep
    closes the driver-side gap structurally — it is called at startup
    of the gate/bench entry points AND from a pytest session hook
    (``tests/conftest.py``), so the first thing ANY round does is
    adopt the previous round's evidence. Returns the staged names
    (best-effort: failures are swallowed, the tracking test stays the
    loud backstop)."""
    import glob
    import os
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pat = re.compile(r"^[A-Z][A-Z0-9_]*_r\d{2}[a-z0-9_]*\.json$")
    standing = {"BENCH_FULL.json", "BASELINE.json"}
    staged: list[str] = []
    try:
        tracked = set(
            subprocess.run(
                ["git", "-C", repo, "ls-files"],
                check=True, capture_output=True, text=True, timeout=30,
            ).stdout.splitlines()
        )
        for path in sorted(glob.glob(os.path.join(repo, "*.json"))):
            name = os.path.basename(path)
            if name in tracked or not (pat.match(name) or name in standing):
                continue
            subprocess.run(
                ["git", "-C", repo, "add", "--", path],
                check=False, capture_output=True, timeout=30,
            )
            staged.append(name)
    except Exception:  # noqa: BLE001 — never kill the run that swept
        pass
    return staged


def stage_artifact(path: str) -> None:
    """``git add`` a round-evidence artifact right where it is written
    (round-8 verdict ask 1: four consecutive rounds shipped untracked
    driver/gate artifacts because staging relied on a human noticing).
    Best-effort: staging must never fail the run that produced the
    evidence — the artifact-tracking test is the loud backstop."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            ["git", "-C", repo, "add", "--", os.path.abspath(path)],
            check=False, capture_output=True, timeout=30,
        )
    except Exception:  # noqa: BLE001 — never kill the evidence writer
        pass
