"""Rewrite-vs-delta frontier commit A/B (CrawlConfig.frontier_mode).

Delta mode exists for the budget-constrained regime where deferred ≫ batch:
a full-frontier rewrite re-copies the mostly-unchanged deferred rows every
round, so per-round durable writes are O(frontier) instead of O(new urls)
(plans/crawl.py frontier_mode notes). `auto` correctly never engages at the
unconstrained bench scale, so this is the dedicated evidence run: the SAME
crawl (corpus, seeds, tight per-host budget, rounds) in both modes in
sequential JVMs. Each job reports per-round wall seconds (the crawl_log
totals' duration column), the per-round frontier gauge, and order-insensitive
xxhash64 checksums of every committed table; the parent asserts the
checksums match exactly and appends the comparison to
BENCH/BASELINE.md.

Usage: python BENCH/run_frontier_modes.py [cores=16]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import time, tempfile, json, sys, shutil
    from pyspark.sql import functions as F
    from fs_crawler_spark.session import get_spark
    from fs_crawler_spark.sources.corpus import build_pages, doc_url
    from fs_crawler_spark.plans.crawl import (
        CrawlConfig, load_frontier, read_output, run_crawl,
    )
    mode, cores = sys.argv[1], int(sys.argv[2])
    spark = get_spark(cores=cores, shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    N = 1_000_000
    pages = build_pages(spark, "/root/testdata/sf0.1", multiplier=N // 5000,
                        n_hosts=4096).repartition(4 * cores, "url").persist()
    pages.count()
    # wide seeds + tight budget: the frontier balloons while the batch stays
    # capped at ~4096*budget, so deferred >> batch within a few rounds
    seeds = [doc_url(i, n_hosts=4096) for i in range(2048)]
    d = tempfile.mkdtemp()
    t0 = time.monotonic()
    res = run_crawl(spark, pages, seeds, d,
                    CrawlConfig(max_rounds=10, host_budget=25, n_shards=16,
                                pages_url_partitioned=True,
                                frontier_mode=mode))
    dt = time.monotonic() - t0

    def checksum(df):
        # order-insensitive digest over per-row xxhash64. A plain SUM admits
        # cancellation collisions (two compensating row differences keep the
        # sum equal), so the digest carries five independent facets: sum,
        # count, min/max of the row hashes, and a re-hashed per-bucket count
        # distribution (bucket = h mod 64; any row swap that preserves the
        # sum still moves a bucket count with probability ~63/64 per row).
        # (decimal sums: long would overflow under ANSI with millions of
        # hashes)
        h = F.xxhash64(*df.columns)
        row = df.agg(
            F.sum(h.cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
            F.min(h).alias("lo"),
            F.max(h).alias("hi"),
        ).collect()[0]
        dist = (
            df.groupBy(F.pmod(h, F.lit(64)).alias("_b"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.sum(F.xxhash64("_b", "_n").cast("decimal(38,0)")).alias("d"))
            .collect()[0]
        )
        return [str(row["h"] or 0), int(row["n"]),
                int(row["lo"] or 0), int(row["hi"] or 0),
                str(dist["d"] or 0)]

    sums = {t: checksum(read_output(spark, d, t))
            for t in ("vertices", "edges", "seen")}
    sums["frontier"] = checksum(load_frontier(spark, d))
    totals = (read_output(spark, d, "crawl_log")
              .filter(F.col("partition_id") == -1)
              .select("iteration", "duration", "frontier", "urls_in")
              .collect())
    rounds = sorted((r["iteration"], round(r["duration"], 2),
                     int(r["frontier"]), int(r["urls_in"])) for r in totals)
    print(json.dumps({"mode": mode, "cores": cores, "pages": N,
                      "fetched": res["total_fetched"], "sec": round(dt, 1),
                      "rounds": rounds, "checksums": sums}))
    shutil.rmtree(d, ignore_errors=True)
    """
)


def run(mode: str, cores: int) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="24g")
    out = subprocess.run(
        [sys.executable, "-c", JOB, mode, str(cores)],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rw = run("rewrite", cores)
    dl = run("delta", cores)
    assert rw["checksums"] == dl["checksums"], (
        f"mode outputs diverge: {rw['checksums']} vs {dl['checksums']}"
    )
    assert rw["fetched"] == dl["fetched"]

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    block = (
        f"\n## Frontier-mode A/B {stamp} (local[{cores}], 1M pages, 4096 hosts, "
        f"2048 seeds, host_budget=25 — deferred >> batch; all table checksums "
        f"identical across modes)\n\n"
        f"| round | batch -> next frontier | rewrite s | delta s |\n|---|---|---|---|\n"
    )
    dl_by_round = {r[0]: r for r in dl["rounds"]}
    for it, sec, frontier, batch_n in rw["rounds"]:
        d = dl_by_round.get(it)
        block += f"| {it} | {batch_n} -> {frontier} | {sec} | {d[1] if d else '-'} |\n"
    block += (
        f"\ntotal: rewrite {rw['sec']}s vs delta {dl['sec']}s "
        f"({rw['fetched']} urls fetched in both; outputs checksum-identical "
        f"by a five-facet order-insensitive xxhash64 digest — sum/count/min/"
        f"max/bucket-distribution — over every committed table + the "
        f"reconstructed frontier)\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(block)
    print(json.dumps({"rewrite": rw["sec"], "delta": dl["sec"],
                      "identical": True}))


if __name__ == "__main__":
    main()
