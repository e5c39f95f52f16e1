#!/usr/bin/env python
"""Compare two BENCH_FULL-style per-query maps: totals over the shared
query set, plus per-query regressions above a threshold.

    python tools/bench_compare.py OLD.json NEW.json [--min-abs 0.3] [--ratio 1.3]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-abs", type=float, default=0.3)
    ap.add_argument("--ratio", type=float, default=1.3)
    args = ap.parse_args()
    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    shared = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(
        f"shared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s "
        f"({t_new / t_old:.2f}x)"
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


if __name__ == "__main__":
    main()
