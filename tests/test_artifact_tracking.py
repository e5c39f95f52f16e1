"""Round artifacts must be git-tracked (round-7 verdict ask 1).

Three consecutive rounds left driver-written evidence
(``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json``) untracked because
the driver writes them AFTER the round's last commit — so on a fresh
clone the staleness rotation behaved as if the round never ran. This
test makes the class structural: any round-evidence JSON present at
the repo root must be in ``git ls-files``. It fails loudly at the
NEXT round's first pytest run, which is exactly when the fix (one
``git add``) is cheap.

Scope: repo-root ``*_r{NN}*.json`` artifacts plus the standing
``BENCH_FULL.json``. Content drift is NOT checked — ``bench.py``
legitimately overwrites ``BENCH_FULL.json`` mid-session; what must
never happen is the file class existing on disk with no tracked
counterpart at all.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT_RE = re.compile(r"^[A-Z][A-Z0-9_]*_r\d{2}[a-z0-9_]*\.json$")
STANDING = ["BENCH_FULL.json", "BASELINE.json"]


def _tracked() -> set[str]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True,
    )
    return set(out.stdout.splitlines())


def test_round_artifacts_are_git_tracked():
    on_disk = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "*.json"))
        if ARTIFACT_RE.match(os.path.basename(p))
    ]
    assert on_disk, "no round artifacts at repo root — glob broke?"
    tracked = _tracked()
    untracked = sorted(set(on_disk) - tracked)
    assert not untracked, (
        f"round-evidence artifacts exist on disk but are not in git: "
        f"{untracked}. The driver writes these after the round's last "
        f"commit — `git add` them now (round-7 verdict ask 1)."
    )


def test_standing_artifacts_are_git_tracked():
    tracked = _tracked()
    missing = [
        f for f in STANDING
        if os.path.exists(os.path.join(REPO, f)) and f not in tracked
    ]
    assert not missing, f"standing artifacts untracked: {missing}"


def test_driver_rotation_staleness_ceiling():
    """Driver-row staleness ceiling (round-8 verdict ask 2): with a
    50-query driver cohort rotating not-green -> never-checked ->
    stalest-green, every catalog query must get a fresh driver row at
    least every ceil(N/50) rounds. Assert (a) no already-checked
    query's latest CORRECTNESS_r*.json row is older than 3 rounds
    behind the newest artifact, and (b) the catalog stays small enough
    (<= 4 cohorts) that the ceiling keeps holding as rounds advance.
    If (b) trips, grow the cohort logic before growing the catalog."""
    import json
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    rounds: dict[str, int] = {}
    latest_round = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        with open(path) as fh:
            data = json.load(fh)
        for key, row in data.items():
            if isinstance(row, dict):
                rounds[key] = max(rounds.get(key, 0), rnd)

    catalog = list(entry_mod.queries())
    assert latest_round >= 1 and rounds, "no driver artifacts parsed"

    checked = {n: rounds[n] for n in catalog if n in rounds}
    stale = sorted(
        n for n, rnd in checked.items() if latest_round - rnd > 3
    )
    assert not stale, (
        f"queries with latest driver row older than 3 rounds behind "
        f"r{latest_round:02d}: {stale}. The rotation tail grew past "
        "the ceiling — check _cohort_order or shrink per-round query "
        "additions."
    )

    import math

    assert math.ceil(len(catalog) / 50) <= 4, (
        f"catalog has {len(catalog)} queries: > 4 driver cohorts of "
        "50, so the 3-round staleness ceiling can no longer hold "
        "structurally. Raise the cohort size handling before adding "
        "more queries."
    )

    # never-checked queries must all fit in the NEXT driver cohort,
    # or they could starve behind each other indefinitely
    unchecked = [n for n in catalog if n not in rounds]
    assert len(unchecked) <= 50, (
        f"{len(unchecked)} never-driver-checked queries exceed one "
        "cohort — they cannot all be checked next round."
    )


def test_stage_artifact_stages_written_file(tmp_path):
    """gatelib.stage_artifact must leave a freshly-written repo-root
    artifact staged (the auto-staging flow every evidence writer now
    relies on), and must swallow failures for paths outside the repo
    rather than raise."""
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gatelib

    probe = os.path.join(REPO, "STAGETEST_r99_probe.json")
    try:
        with open(probe, "w") as fh:
            fh.write("{}")
        gatelib.stage_artifact(probe)
        staged = subprocess.run(
            ["git", "diff", "--cached", "--name-only"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        assert os.path.basename(probe) in staged
    finally:
        subprocess.run(["git", "reset", "-q", "--", probe], cwd=REPO,
                       check=False, capture_output=True)
        if os.path.exists(probe):
            os.remove(probe)

    # out-of-repo path: must not raise
    gatelib.stage_artifact(str(tmp_path / "elsewhere.json"))


def test_stage_round_artifacts_sweeps_untracked_driver_files():
    """The startup sweep (r10 verdict ask 1) must find an untracked
    driver-style round artifact at the repo root and stage it, must
    NOT re-add already-tracked artifacts, and must ignore files
    outside the round-evidence pattern."""
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gatelib

    probe = os.path.join(REPO, "SWEEPTEST_r98_probe.json")
    decoy = os.path.join(REPO, "sweeptest_not_an_artifact.json")
    try:
        for p in (probe, decoy):
            with open(p, "w") as fh:
                fh.write("{}")
        staged = gatelib.stage_round_artifacts()
        assert os.path.basename(probe) in staged
        assert os.path.basename(decoy) not in staged
        # already-tracked artifacts are not re-swept
        assert "CORRECTNESS_r01.json" not in staged
        in_index = subprocess.run(
            ["git", "diff", "--cached", "--name-only"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        assert os.path.basename(probe) in in_index
    finally:
        subprocess.run(["git", "reset", "-q", "--", probe], cwd=REPO,
                       check=False, capture_output=True)
        for p in (probe, decoy):
            if os.path.exists(p):
                os.remove(p)
