"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs bench.py at two parallelism levels — local[N] and local[4N] — in separate
processes on the same input, and reports throughput at both plus efficiency
    eff = (urls/s at 4N) / (4 x urls/s at N).
Appends a results table to BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [N] (default 8 -> compares 8 vs 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_bench(n, sf_dir)
    hi = run_bench(4 * n, sf_dir)
    eff = hi["value"] / (4 * lo["value"]) if lo["value"] else 0.0
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    block = f"""
## Scaling run {stamp} (sandbox evidence protocol)

Same job, same input ({sf_dir}), two parallelism levels in separate JVMs:

| cores | crawl urls/s | crawl sec | rounds | fetched |
|---|---|---|---|---|
| local[{n}] | {lo['value']} | {lo['crawl']['seconds']} | {lo['crawl']['rounds']} | {lo['crawl']['total_fetched']} |
| local[{4*n}] | {hi['value']} | {hi['crawl']['seconds']} | {hi['crawl']['rounds']} | {hi['crawl']['total_fetched']} |

Scaling efficiency (urls/s at {4*n}) / (4 x urls/s at {n}) = **{eff:.3f}**
(target >= 0.8 would require fixed-overhead-free rounds; see analysis in
BENCH/BASELINE.md prose).

Per-query seconds at local[{n}] vs local[{4*n}]:

| query | local[{n}] s | local[{4*n}] s |
|---|---|---|
"""
    for k in lo["queries"]:
        block += f"| {k} | {lo['queries'][k]} | {hi['queries'].get(k, '-')} |\n"
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(block)
    print(json.dumps({"low": lo, "high": hi, "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
