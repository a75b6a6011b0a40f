"""Extra benchmarks (optimization guide §1.4) — NOT the official bench.

Per-query wall timing with the same methodology as bench.py (a .count()
action per query, local[$SPARK_GRAFT_CPUS]), plus optional noop-sink timing
(full-row materialization) and .explain("formatted") capture for the plan
evidence committed under plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--mode count|noop|both] [--samples N]
                        [--plans OUTDIR] [--suffix before|after] [query ...]

Prints one JSON line: {"sf": ..., "mode": ..., "queries": {name: [sec, ...]}}.
The official numbers stay bench.py's; this file exists so individual
operators can be isolated and re-measured cheaply during the round.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

DEFAULT_QUERIES = [
    "tpch_q1",
    "nation_revenue",
    "link_edges",
    "politeness_window",
    "resolution_rule",
    "doc_stats",
    "doc_fingerprint",
    "repetition_stats",
    "token_jaccard",
    "minhash_lsh",
    "simhash",
    "simhash_near_dup",
    "ann_topk",
    "ann_lsh",
    "ann_ivf",
    "emb_near_dup",
    "emb_near_dup_lsh",
    "media_features",
    "events_last_per_user",
    "events_sessions",
    "validator_stats",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mode", default="count", choices=["count", "noop", "both"])
    ap.add_argument("--samples", type=int, default=1, help="0 = plan capture only, no execution")
    ap.add_argument("--plans", default=None, help="dir to write <query>_<suffix>.txt explains")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from fs_crawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="fs-crawler-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = args.queries or DEFAULT_QUERIES
    out: dict[str, dict[str, list[float]]] = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        rec: dict[str, list[float]] = {}
        modes = [] if args.samples == 0 else (
            ["count", "noop"] if args.mode == "both" else [args.mode]
        )
        for mode in modes:
            rec[mode] = []
            for s in range(args.samples):
                spark.sparkContext.setJobDescription(f"{name} [{mode} #{s}]")
                df = fn(spark, args.sf)
                t0 = time.monotonic()
                if mode == "count":
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                rec[mode].append(round(time.monotonic() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": args.sf, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
