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
    # control slower than BOTH artifacts: the epoch drifted and the
    # new code still beats the old code in the same epoch (r12)
    assert (bc.adjudicate_control(100, 125, 140)
            == "machine-drift-code-improved")
    assert (bc.adjudicate_control(207.5, 230.0, 277.1)
            == "machine-drift-code-improved")
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


def test_control_map_adjudicates_without_rebench(tmp_path):
    """--control-map (r12): adjudicate from an already-captured
    control BENCH_FULL map — no worktree re-bench — and record the
    map path in the artifact. The control here reads like the
    inflated new numbers, so the verdict must be machine-drift."""
    old = {"queries_warm": {"a": 1.0, "b": 2.0}}
    new = {"queries_warm": {"a": 1.2, "b": 2.4}}
    ctl = {"queries_warm": {"a": 1.19, "b": 2.41}}  # ≈ new
    old_p, new_p, ctl_p = (tmp_path / n for n in
                           ("old.json", "new.json", "ctl.json"))
    old_p.write_text(json.dumps(old))
    new_p.write_text(json.dumps(new))
    ctl_p.write_text(json.dumps(ctl))
    out_p = tmp_path / "delta.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
         str(old_p), str(new_p), "--json", str(out_p),
         "--control-map", str(ctl_p)],
        capture_output=True, text=True, check=True,
    )
    assert "machine-drift" in proc.stdout
    delta = json.loads(out_p.read_text())
    assert delta["control"]["verdict"] == "machine-drift"
    assert delta["control"]["map"] == str(ctl_p)
    assert delta["control"]["n_shared"] == 2
