"""Per-stage execution profile of the crawl_weak workload at two core
levels (north-rule scaling-evidence protocol, the attribution half).

The criterion ("≥0.8 weak-scaling efficiency from N to 4N executors")
cannot be cleanly measured on a box whose CPU throttle binds harder the
more cores run (BENCH/BASELINE.md tapes). This harness produces the
attribution evidence instead: it re-runs the SAME crawl_weak job at
local[N] and local[4N] with Spark event logging on, then aggregates
per-stage task metrics from the event logs —

  * Executor Run Time   (wall occupancy of task slots)
  * Executor CPU Time   (on-CPU ns, INCLUDING memory-stall cycles)
  * JVM GC Time
  * shuffle bytes written / read, input bytes

Weak scaling holds per-core work constant, so under perfect hardware the
4N level shows ~4x the CPU time, ~4x the bytes, and EQUAL wall time. The
two failure signatures separate cleanly:

  * memory-bus / throttle bound — CPU time PER FETCHED URL inflates at
    4N (same instructions, more stall cycles billed to CPU time) while
    slot utilization (sum run time / (cores x wall)) stays high;
  * serial-phase / scheduling bound — CPU per url flat, but slot
    utilization collapses (cores idle between BSP rounds).

Usage: python BENCH/profile_stages.py [N=2] [pages_per_core=1000000]
Appends the comparison to BENCH/BASELINE.md and prints a JSON line.
Run on an otherwise-quiet box; each level is its own sequential JVM.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import textwrap
from collections import defaultdict
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import time, tempfile, json, sys, shutil
    from fs_crawler_spark.session import get_spark
    from fs_crawler_spark.sources.corpus import build_pages, doc_url
    from fs_crawler_spark.plans.crawl import run_crawl, CrawlConfig
    cores = int(sys.argv[1])
    per_core = int(sys.argv[2])
    evdir = sys.argv[3]
    spark = get_spark(cores=cores, shuffle_partitions=4 * cores,
                      extra_conf={"spark.eventLog.enabled": "true",
                                  "spark.eventLog.dir": "file://" + evdir,
                                  "spark.eventLog.compress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    N = per_core * cores
    pages = build_pages(spark, "/root/testdata/sf0.1", multiplier=N // 5000,
                        n_hosts=4096).repartition(4 * cores, "url").persist()
    pages.count()
    seeds = [doc_url(i, n_hosts=4096) for i in range(N // 4096)]
    d = tempfile.mkdtemp()
    t0 = time.monotonic()
    res = run_crawl(spark, pages, seeds, d,
                    CrawlConfig(max_rounds=60, host_budget=125_000 * cores,
                                n_shards=16, pages_url_partitioned=True))
    dt = time.monotonic() - t0
    print(json.dumps({"cores": cores, "pages": N, "rounds": res["rounds"],
                      "fetched": res["total_fetched"], "sec": round(dt, 1),
                      "throughput": round(res["total_fetched"] / dt, 1)}))
    spark.stop()
    shutil.rmtree(d, ignore_errors=True)
    """
)


def run_level(cores: int, per_core: int) -> dict:
    evdir = f"/tmp/spark-events-{cores}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    env = dict(os.environ, SPARK_DRIVER_MEM=f"{6 * cores}g")
    out = subprocess.run(
        [sys.executable, "-c", JOB, str(cores), str(per_core), evdir],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    logs = glob.glob(os.path.join(evdir, "*"))
    res["profile"] = parse_event_log(max(logs, key=os.path.getmtime))
    return res


def parse_event_log(path: str) -> dict:
    stages: dict[int, dict] = defaultdict(
        lambda: {"tasks": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                 "shuf_w": 0, "shuf_r": 0, "input": 0, "name": ""}
    )
    app_start = app_end = None
    if os.path.isdir(path):  # Spark 4 rolling layout: eventlog_v2_<app>/events_*
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        parts = [path]

    def lines():
        for p in parts:
            with open(p) as f:
                yield from f

    if True:
        for raw in lines():
            try:
                d = json.loads(raw)
            except json.JSONDecodeError:
                continue
            ev = d.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = d.get("Timestamp")
            elif ev == "SparkListenerApplicationEnd":
                app_end = d.get("Timestamp")
            elif ev == "SparkListenerStageCompleted":
                si = d["Stage Info"]
                stages[si["Stage ID"]]["name"] = si["Stage Name"]
            elif ev == "SparkListenerTaskEnd":
                m = d.get("Task Metrics")
                if not m:
                    continue
                s = stages[d["Stage ID"]]
                s["tasks"] += 1
                s["run_ms"] += m.get("Executor Run Time", 0)
                s["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                s["gc_ms"] += m.get("JVM GC Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                s["shuf_w"] += sw.get("Shuffle Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                s["shuf_r"] += sr.get("Local Bytes Read", 0) + sr.get(
                    "Remote Bytes Read", 0)
                im = m.get("Input Metrics") or {}
                s["input"] += im.get("Bytes Read", 0)
    tot = {k: sum(s[k] for s in stages.values())
           for k in ("tasks", "run_ms", "cpu_ms", "gc_ms", "shuf_w",
                     "shuf_r", "input")}
    tot["n_stages"] = len(stages)
    tot["app_ms"] = (app_end - app_start) if app_start and app_end else None
    top = sorted(stages.values(), key=lambda s: -s["run_ms"])[:8]
    tot["top_stages"] = [
        {"name": s["name"].split("\n")[0][:60], "tasks": s["tasks"],
         "run_ms": s["run_ms"], "cpu_ms": s["cpu_ms"],
         "shuf_w": s["shuf_w"], "shuf_r": s["shuf_r"]}
        for s in top
    ]
    return tot


def fmt_gb(b: int) -> str:
    return f"{b / 1e9:.2f}GB"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    per_core = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    lo = run_level(n, per_core)
    hi = run_level(4 * n, per_core)

    rows = []
    for res in (lo, hi):
        p = res["profile"]
        c = res["cores"]
        wall_ms = res["sec"] * 1000
        rows.append({
            "cores": c,
            "fetched": res["fetched"],
            "sec": res["sec"],
            "throughput": res["throughput"],
            "util": round(p["run_ms"] / (c * wall_ms), 3),
            "cpu_ms_per_kurl": round(p["cpu_ms"] / (res["fetched"] / 1000), 1),
            "run_ms_per_kurl": round(p["run_ms"] / (res["fetched"] / 1000), 1),
            "gc_pct_of_run": round(100 * p["gc_ms"] / max(p["run_ms"], 1), 1),
            "shuf_w_per_murl": fmt_gb(int(p["shuf_w"] / (res["fetched"] / 1e6))),
            "shuf_r_per_murl": fmt_gb(int(p["shuf_r"] / (res["fetched"] / 1e6))),
            "profile": p,
        })
    eff = round(hi["throughput"] / (4 * lo["throughput"]), 3)
    cpu_inflation = round(
        rows[1]["cpu_ms_per_kurl"] / max(rows[0]["cpu_ms_per_kurl"], 1e-9), 2)
    util_ratio = round(rows[1]["util"] / max(rows[0]["util"], 1e-9), 2)
    summary = {
        "workload": "crawl_weak_profiled",
        "levels": [n, 4 * n],
        "efficiency": eff,
        "cpu_ms_per_kurl": [rows[0]["cpu_ms_per_kurl"], rows[1]["cpu_ms_per_kurl"]],
        "cpu_inflation_hi_vs_lo": cpu_inflation,
        "slot_utilization": [rows[0]["util"], rows[1]["util"]],
        "util_ratio_hi_vs_lo": util_ratio,
        "shuffle_write_per_murl": [rows[0]["shuf_w_per_murl"], rows[1]["shuf_w_per_murl"]],
        "shuffle_read_per_murl": [rows[0]["shuf_r_per_murl"], rows[1]["shuf_r_per_murl"]],
        "gc_pct_of_run": [rows[0]["gc_pct_of_run"], rows[1]["gc_pct_of_run"]],
    }

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    block = (
        f"\n## Per-stage profile, crawl_weak local[{n}] vs local[{4*n}] "
        f"{stamp} (event-log task metrics, sequential JVMs)\n\n"
        f"| level | fetched | wall | urls/s | slot util | cpu ms/kurl "
        f"| run ms/kurl | gc % | shufW/Murl | shufR/Murl |\n"
        f"|---|---|---|---|---|---|---|---|---|---|\n"
    )
    for r in rows:
        block += (
            f"| local[{r['cores']}] | {r['fetched']} | {r['sec']}s "
            f"| {r['throughput']} | {r['util']} | {r['cpu_ms_per_kurl']} "
            f"| {r['run_ms_per_kurl']} | {r['gc_pct_of_run']} "
            f"| {r['shuf_w_per_murl']} | {r['shuf_r_per_murl']} |\n"
        )
    block += (
        f"\nefficiency {eff}; CPU-per-url inflation hi/lo **{cpu_inflation}x**"
        f"; slot-utilization ratio hi/lo **{util_ratio}**. Reading: equal "
        f"per-Murl shuffle bytes at both levels means the PLAN is "
        f"size-invariant (no super-linear shuffle); CPU-per-url inflation "
        f"with preserved utilization is the memory-bus/throttle signature "
        f"(stall cycles billed as CPU); utilization collapse instead would "
        f"indicate serial phases.\n\nTop stages by run time at local[{4*n}]:\n\n"
        f"| stage | tasks | run_ms | cpu_ms | shufW | shufR |\n"
        f"|---|---|---|---|---|---|\n"
    )
    for s in rows[1]["profile"]["top_stages"]:
        block += (
            f"| {s['name']} | {s['tasks']} | {s['run_ms']} | {s['cpu_ms']} "
            f"| {fmt_gb(s['shuf_w'])} | {fmt_gb(s['shuf_r'])} |\n"
        )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(block)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
