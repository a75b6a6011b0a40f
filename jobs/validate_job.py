"""spark-submit validator: the ``validate-fs`` console entry analog
(fscrawler/validator.py:20-45 — parse args, load graph, print validation
stats, optionally save the valid graph).

Reads EITHER an engine checkpoint dir (parquet snapshots) or a reference-
style CSV family, prints one JSON line with the A5 counter row plus the
decade/iteration histograms, and optionally writes the validated/invalid
CSV exports (graph_validator.py:194-225):

    spark-submit --py-files dist/fs_crawler_spark.zip jobs/validate_job.py \
        --checkpoint /data/crawl_ckpt [--save-valid --out ./validated]
    spark-submit ... jobs/validate_job.py \
        --csv-dir ./output --basename my_crawl [--save-valid --out ./validated]

Exit status 0 always when the graph loads (validation FINDINGS are data, not
errors — same as the reference CLI).
"""

from __future__ import annotations

import argparse
import json

from pyspark.errors import AnalysisException
from pyspark.sql import SparkSession


def load_graph(spark: SparkSession, args):
    """-> (vertices, edges, frontier) from either input layout."""
    if args.checkpoint:
        from fs_crawler_spark.plans.crawl import load_frontier, read_output

        vertices = read_output(spark, args.checkpoint, "vertices")
        edges = read_output(spark, args.checkpoint, "edges")
        frontier = load_frontier(spark, args.checkpoint).select("url").withColumnRenamed(
            "url", "id"
        )
        return vertices, edges, frontier
    from fs_crawler_spark.sources.csv_compat import (
        read_edges_csv,
        read_frontier_vertices_csv,
        read_vertices_csv,
    )

    base = f"{args.csv_dir}/{args.basename}"
    vertices = read_vertices_csv(spark, f"{base}.vertices.csv")
    edges = read_edges_csv(spark, f"{base}.edges.csv")
    # the validator also sees spanning edges (graph_validator.py:84-92 loads
    # the whole graph); frontier-class edges have no fetched endpoint and
    # contribute nothing to child validation, matching the reference loader.
    # The spanning file is optional output — only a missing path is ignored.
    try:
        edges = edges.unionByName(read_edges_csv(spark, f"{base}.spanning.edges.csv"))
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
    frontier = read_frontier_vertices_csv(spark, f"{base}.frontier.vertices.csv")
    return vertices, edges, frontier


def validate(spark: SparkSession, vertices, edges, frontier) -> dict:
    from fs_crawler_spark.operators.graph import (
        invalid_birth_decade_histogram,
        invalid_by_iteration_histogram,
        validator_stats,
    )

    stats_row = validator_stats(edges, vertices, frontier).collect()[0]
    decade = {
        int(r["decade"]): int(r["n"])
        for r in invalid_birth_decade_histogram(edges, vertices).collect()
        if r["decade"] is not None
    }
    iteration = {
        int(r["iteration"]): int(r["n"])
        for r in invalid_by_iteration_histogram(edges, vertices).collect()
        if r["iteration"] is not None
    }
    return {
        # sum() over an empty invalid-set aggregates to NULL -> 0
        "stats": {k: int(v) if v is not None else 0 for k, v in stats_row.asDict().items()},
        "invalid_by_decade": decade,
        "invalid_by_iteration": iteration,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="engine snapshot checkpoint dir")
    src.add_argument("--csv-dir", help="reference CSV family dir")
    p.add_argument("--basename", default="graph")
    p.add_argument(
        "--save-valid",
        action="store_true",
        help="also write validated.vertices/edges + invalid.edges CSVs",
    )
    p.add_argument("--out", help="output dir for --save-valid")
    args = p.parse_args()
    if args.save_valid and not args.out:
        p.error("--save-valid requires --out")

    spark = SparkSession.builder.appName("fs-crawler-validate").getOrCreate()
    vertices, edges, frontier = load_graph(spark, args)
    result = validate(spark, vertices, edges, frontier)
    if args.save_valid:
        from fs_crawler_spark.sources.csv_compat import write_validated_csv

        result["written"] = write_validated_csv(
            vertices, edges, args.out, basename=args.basename
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
