"""Gauge-bracketed crawl_weak scaling samples (round-5 evidence protocol).

The box's CPU health swings 1.5-3x within hours (BENCH/gauge.py readings
13.9-24 s against a healthy ~8 s across rounds 4-5), which single-shot
efficiency numbers cannot survive. This harness therefore runs each
lo(local[N]) / hi(local[4N]) crawl_weak pair BRACKETED by gauge runs and
records all four numbers per sample, so every efficiency value carries its
own box-health context. The summary reports the all-sample median plus the
median over "stable" samples — pairs whose bracketing gauges stay within
15% of each other (no mid-sample degradation shift); a sample taken
entirely inside a degraded-but-steady window still measures relative
scaling, while a sample whose gauge moved mid-pair measures the box, not
the code.

Usage: python BENCH/run_scaling_tape.py [N=4] [pairs=5]
Appends the tape + medians to BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "BENCH"))
from run_scaling import CRAWL_WEAK_JOB, run  # noqa: E402


def gauge() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "gauge.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    m = re.search(r"GAUGE_SEC ([0-9.]+)", out.stderr)
    return float(m.group(1)) if m else float("nan")


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    if not n:
        return None
    return xs[n // 2] if n % 2 else round((xs[n // 2 - 1] + xs[n // 2]) / 2, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tape = []
    for i in range(pairs):
        g0 = gauge()
        lo = run(CRAWL_WEAK_JOB, n)
        hi = run(CRAWL_WEAK_JOB, 4 * n)
        g1 = gauge()
        eff = round(hi["throughput"] / (4 * lo["throughput"]), 3)
        stable = g0 == g0 and g1 == g1 and abs(g1 - g0) <= 0.15 * min(g0, g1)
        tape.append(
            {
                "gauge_before": g0,
                "low": lo,
                "high": hi,
                "gauge_after": g1,
                "efficiency": eff,
                "stable": stable,
            }
        )
        print(json.dumps(tape[-1]), file=sys.stderr, flush=True)

    all_eff = [t["efficiency"] for t in tape]
    stable_eff = [t["efficiency"] for t in tape if t["stable"]]
    summary = {
        "workload": "crawl_weak",
        "levels": [n, 4 * n],
        "pairs": len(tape),
        "median_efficiency": median(all_eff),
        "stable_pairs": len(stable_eff),
        "median_efficiency_stable": median(stable_eff),
        "gauges": [[t["gauge_before"], t["gauge_after"]] for t in tape],
    }

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    block = (
        f"\n## Gauge-bracketed crawl_weak scaling tape {stamp} "
        f"(local[{n}] vs local[{4*n}], sequential JVMs; healthy gauge ~8 s)\n\n"
        f"| # | gauge before | local[{n}] | local[{4*n}] | gauge after "
        f"| efficiency | stable |\n|---|---|---|---|---|---|---|\n"
    )
    for i, t in enumerate(tape):
        block += (
            f"| {i} | {t['gauge_before']}s | {t['low']['throughput']} "
            f"({t['low']['sec']}s) | {t['high']['throughput']} "
            f"({t['high']['sec']}s) | {t['gauge_after']}s "
            f"| **{t['efficiency']}** | {'y' if t['stable'] else 'N'} |\n"
        )
    block += (
        f"\nmedian efficiency: **{summary['median_efficiency']}** over all "
        f"{len(tape)} pairs; **{summary['median_efficiency_stable']}** over "
        f"the {len(stable_eff)} gauge-stable pairs.\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(block)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
