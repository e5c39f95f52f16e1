"""Pins for the bench-delta instrument (r10 verdict ask 5): the
drift-suspect flag and the worktree-control adjudication rule are
measurement PROTOCOL — a silent change to either invalidates how
BENCH_DELTA artifacts are read across rounds."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "tools", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_adjudication_rule():
    bc = _load()
    # control (old code, new epoch) reads like the inflated new
    # numbers: the machine drifted
    assert bc.adjudicate_control(100, 125, 124) == "machine-drift"
    # control reads like the old artifact: the slowdown is code
    assert bc.adjudicate_control(100, 125, 101) == "code-regression"
    # control near neither: ambiguous
    assert bc.adjudicate_control(100, 125, 112) == "ambiguous"
    # tiny deltas (control within 5% of both): ambiguous, not a
    # confident call either way
    assert bc.adjudicate_control(100, 102, 101) == "ambiguous"


def test_drift_suspect_flag_in_artifact(tmp_path):
    bc = _load()
    old = {"queries_warm": {"a": 1.0, "b": 2.0}}
    new = {"queries_warm": {"a": 1.2, "b": 2.4}}  # 1.2x shared total
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps(old))
    new_p.write_text(json.dumps(new))
    out_p = tmp_path / "delta.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
         str(old_p), str(new_p), "--json", str(out_p)],
        capture_output=True, text=True, check=True,
    )
    assert "DRIFT-SUSPECT" in proc.stdout
    delta = json.loads(out_p.read_text())
    assert delta["drift_suspect"] is True
    assert delta["control"] is None  # no --control given

    # clean pair: no flag
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
         str(old_p), str(old_p), "--json", str(out_p)],
        capture_output=True, text=True, check=True,
    )
    assert "DRIFT-SUSPECT" not in proc2.stdout
    assert json.loads(out_p.read_text())["drift_suspect"] is False
