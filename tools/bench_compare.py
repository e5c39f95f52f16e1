#!/usr/bin/env python
"""Warm-regression triage (round-6 verdict ask 4): diff two
BENCH_FULL-style maps and make the comparison an ARTIFACT, so
round-over-round bench deltas stop being re-derived by hand (three
rounds spent judge/builder cycles on phantom cold-start regressions).

Prefers the ``queries_warm`` map (median of warm passes — the stable
signal) and falls back to the cold ``queries`` map when either side
lacks warm data. Regressions are >ratio AND >min-abs; each gets a
BENCH_NOTES-ready stub line in the JSON for attribution.

    python tools/bench_compare.py OLD.json NEW.json \
        [--min-abs 0.3] [--ratio 1.3] [--json BENCH_DELTA_r06.json] \
        [--control <commit>] [--control-sf-dir /root/testdata/sf0.1]

Machine-drift control (round-10 verdict ask 5): twice (r7, r10) a
degraded machine epoch produced dozens of phantom regressions and the
control was hand-run. Now the tool itself (a) flags shared-warm
inflation >10% as DRIFT-SUSPECT, and (b) with ``--control <commit>``
re-runs bench.py at that commit in a throwaway git worktree IN THE
CURRENT epoch and adjudicates: control ≈ new ⇒ the machine drifted
(same code, same slowdown); control ≈ old ⇒ the slowdown is real
code regression. The control run is recorded in the JSON artifact
(``control`` field) so the adjudication ships with the delta.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIFT_THRESHOLD = 1.10


def _qmap(path: str) -> tuple[dict[str, float], str]:
    data = json.load(open(path))
    warm = data.get("queries_warm")
    if warm:
        return warm, "warm"
    return data["queries"], "cold"


def run_control_bench(commit: str, sf_dir: str) -> dict:
    """Run ``bench.py`` at ``commit`` in a throwaway worktree under
    .scratch, in the CURRENT machine epoch, and return its parsed
    one-line JSON. The worktree has its own index, so bench.py's
    artifact staging cannot touch the main repo's."""
    wt = os.path.join(REPO, ".scratch", f"benchctl_{commit[:12]}")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", "--detach",
         wt, commit],
        check=True, capture_output=True, text=True,
    )
    try:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=wt, env=env,
            capture_output=True, text=True, timeout=5400,
        )
        # A failed control run must be loud, never adjudicated: a
        # partial bench that still printed a '{' line would masquerade
        # as a complete control result.
        if proc.returncode != 0:
            raise RuntimeError(
                f"control bench at {commit[:12]} exited "
                f"{proc.returncode}; stderr tail:\n"
                + "\n".join(proc.stderr.splitlines()[-15:])
            )
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"control bench at {commit[:12]} printed no JSON line; "
                f"stdout tail:\n"
                + "\n".join(proc.stdout.splitlines()[-15:])
            )
        # Prefer the worktree's full BENCH_FULL.json over the printed
        # line: the line is budgeted to ~1.9KB so its cold map keeps
        # only the slowest ~60 queries and drops `queries_warm`
        # entirely — adjudicating cold-control vs warm-old/new over a
        # 60-query subset is exactly the cold-vs-warm apples-to-oranges
        # the rest of this tool exists to avoid.
        full = os.path.join(wt, "BENCH_FULL.json")
        if os.path.exists(full):
            try:
                return json.load(open(full))
            except Exception:
                pass
        return json.loads(line)
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            check=False, capture_output=True,
        )


def adjudicate_control(
    t_old: float, t_new: float, t_ctl: float
) -> str:
    """control ran OLD CODE in the NEW epoch: if it reads like the new
    (inflated) numbers the machine drifted; if it reads like the old
    artifact the delta is code. Within ±5% of both (tiny deltas) or of
    neither: ambiguous — rerun on a quiet machine."""
    near_new = abs(t_ctl - t_new) <= 0.05 * t_new
    near_old = abs(t_ctl - t_old) <= 0.05 * t_old
    if near_new and not near_old:
        return "machine-drift"
    if near_old and not near_new:
        return "code-regression"
    if t_ctl > 1.05 * t_new and t_ctl > 1.05 * t_old:
        # old code in the new epoch reads slower than BOTH artifacts:
        # the epoch drifted (ctl vs old) AND the new code beats the
        # old code measured in the same epoch (new vs ctl) — the
        # drift+improvement composite (first seen r12, where a 1.34x
        # slow epoch hid a 0.83x same-epoch code win).
        return "machine-drift-code-improved"
    return "ambiguous"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-abs", type=float, default=0.3)
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--json", default=None,
                    help="write the delta artifact here")
    ap.add_argument("--control", default=None, metavar="COMMIT",
                    help="re-bench this commit in a worktree (current "
                         "epoch) and adjudicate drift vs regression")
    ap.add_argument("--control-map", default=None, metavar="JSON",
                    help="adjudicate from an already-captured control "
                         "BENCH_FULL-style map instead of re-running "
                         "the bench (use with --control to record "
                         "which commit the map came from)")
    ap.add_argument("--control-sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    old, old_kind = _qmap(args.old)
    new, new_kind = _qmap(args.new)
    shared = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    if shared and t_old > 0:
        print(
            f"shared {len(shared)} queries ({old_kind} vs {new_kind}): "
            f"{t_old:.1f}s -> {t_new:.1f}s ({t_new / t_old:.2f}x)"
        )
    else:
        # differently-keyed artifacts (or all-zero timings): nothing to
        # ratio — report the key mismatch instead of dividing by zero
        print(
            f"no comparable queries ({old_kind} vs {new_kind}): "
            f"{len(old)} old-only keys, {len(new)} new-only keys; "
            f"e.g. old={sorted(old)[:3]} new={sorted(new)[:3]}"
        )
    drift_suspect = bool(
        shared and t_old > 0 and t_new / t_old > DRIFT_THRESHOLD
    )
    if drift_suspect:
        print(
            f"DRIFT-SUSPECT: shared totals inflated "
            f"{t_new / t_old:.2f}x (> {DRIFT_THRESHOLD:.2f}x). Machine "
            "drift has twice (r7, r10) produced phantom regressions at "
            "this magnitude — run with --control <old-epoch-commit> to "
            "adjudicate before attributing per-query regressions."
        )
    control = None
    if args.control or args.control_map:
        if args.control_map:
            ctl_data = json.load(open(args.control_map))
        else:
            ctl_data = run_control_bench(args.control, args.control_sf_dir)
        ctl_map = ctl_data.get("queries_warm") or ctl_data["queries"]
        ctl_shared = sorted(set(ctl_map) & set(shared))
        t_ctl = sum(ctl_map[q] for q in ctl_shared)
        t_old_c = sum(old[q] for q in ctl_shared)
        t_new_c = sum(new[q] for q in ctl_shared)
        verdict = adjudicate_control(t_old_c, t_new_c, t_ctl)
        control = {
            "commit": args.control,
            "map": args.control_map,
            "sf_dir": args.control_sf_dir,
            "n_shared": len(ctl_shared),
            "shared_total_old": round(t_old_c, 2),
            "shared_total_new": round(t_new_c, 2),
            "shared_total_control": round(t_ctl, 2),
            "verdict": verdict,
        }
        ctl_label = (args.control or "map")[:12]
        print(
            f"CONTROL ({ctl_label} in current epoch): "
            f"{t_ctl:.1f}s vs old {t_old_c:.1f}s / new {t_new_c:.1f}s "
            f"on {len(ctl_shared)} shared queries -> {verdict}"
        )
    regs = [
        (q, old[q], new[q])
        for q in shared
        if new[q] > old[q] * args.ratio and new[q] - old[q] > args.min_abs
    ]
    regs.sort(key=lambda r: r[2] - r[1], reverse=True)
    for q, a, b in regs:
        print(f"REGRESSION {q}: {a:.2f} -> {b:.2f} (+{b - a:.2f}s, {b / a:.2f}x)")
    imps = [
        (q, old[q], new[q])
        for q in shared
        if old[q] > new[q] * args.ratio and old[q] - new[q] > args.min_abs
    ]
    imps.sort(key=lambda r: r[1] - r[2], reverse=True)
    for q, a, b in imps[:10]:
        print(f"improved   {q}: {a:.2f} -> {b:.2f} (-{a - b:.2f}s)")
    only_new = sorted(set(new) - set(old), key=lambda q: -new[q])
    if only_new:
        print(f"new-only ({len(only_new)}): " + ", ".join(
            f"{q}={new[q]:.2f}s" for q in only_new[:8]
        ))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(
                {
                    "old": args.old,
                    "new": args.new,
                    "kinds": {"old": old_kind, "new": new_kind},
                    "ratio_threshold": args.ratio,
                    "min_abs_threshold": args.min_abs,
                    "n_shared": len(shared),
                    "shared_total_old": round(t_old, 2),
                    "shared_total_new": round(t_new, 2),
                    "drift_suspect": drift_suspect,
                    "control": control,
                    "regressions": [
                        {
                            "query": q,
                            "old_secs": a,
                            "new_secs": b,
                            "note_stub": (
                                f"{q}: {a:.2f}s -> {b:.2f}s "
                                f"({b / a:.2f}x) — ATTRIBUTION NEEDED"
                            ),
                        }
                        for q, a, b in regs
                    ],
                    "improvements": [
                        {"query": q, "old_secs": a, "new_secs": b}
                        for q, a, b in imps
                    ],
                    "new_only": {q: new[q] for q in only_new},
                },
                fh,
                indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
