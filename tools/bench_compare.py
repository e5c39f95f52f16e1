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
        [--min-abs 0.3] [--ratio 1.3] [--json BENCH_DELTA_r06.json]
"""

from __future__ import annotations

import argparse
import json


def _qmap(path: str) -> tuple[dict[str, float], str]:
    data = json.load(open(path))
    warm = data.get("queries_warm")
    if warm:
        return warm, "warm"
    return data["queries"], "cold"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-abs", type=float, default=0.3)
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--json", default=None,
                    help="write the delta artifact here")
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
