"""Fixed machine-health gauge: run before trusting any absolute benchmark.

Synthesizes a 2M-page corpus and runs the extract+canonicalize+dedup kernel
on 8 cores — pure CPU + one shuffle, no caching, isolated from crawl-loop
state. Reference points (same box):

  round-3 sessions (healthy):  ~8 s   (implied by ops_weak 125k pages/s @4c)
  2026-08-17 (degraded):       16.6-18.1 s, plus erratic 100-330 s stalls
                               inside long-running crawl rounds

If the gauge reads >1.5x the healthy number, absolute throughputs are not
comparable across sessions — collect medians and A/B within the same day.

Usage: python BENCH/gauge.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fs_crawler_spark.functions.extract import extract_pages
from fs_crawler_spark.operators.frontier import as_frontier_rows, dedup_frontier
from fs_crawler_spark.session import get_spark
from fs_crawler_spark.sources.corpus import build_pages


def main() -> None:
    spark = get_spark(cores=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = build_pages(spark, "/root/testdata/sf0.1", multiplier=400)  # 2M
    t0 = time.monotonic()
    links = extract_pages(pages).select(F.explode("links").alias("url"))
    n = dedup_frontier(as_frontier_rows(links, 0)).count()
    print(
        f"GAUGE_SEC {round(time.monotonic() - t0, 1)} distinct {n}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
