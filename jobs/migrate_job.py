"""spark-submit migrator: legacy CSV crawl output -> parquet lake (S8).

The reference ships ``migrate_csv_to_db.py`` (408-line console entry point,
CSV -> SQLite with the "surname, given" name split, migrate_csv_to_db.py:163-180
parse_name / :33-58 file map). The Spark-native analog targets the engine's
parquet/Iceberg layout instead of SQLite — same inputs, same transforms:

    spark-submit --py-files dist/fs_crawler_spark.zip jobs/migrate_job.py \
        --csv-dir ./output --basename my_crawl --out /data/my_crawl_parquet

Reads  {csv-dir}/{basename}.vertices.csv, .edges.csv, .spanning.edges.csv,
       .frontier.edges.csv, .frontier.vertices.csv, .log.csv (optional)
Writes {out}/vertices, edges, spanning_edges, frontier_edges, frontier,
       crawl_log  (parquet each; edges indexed by partitioning on type —
       the analog of the reference's EDGE_TYPE_* SQLite indices).

Prints one JSON stats line (the reference's migration summary analog) and
verifies row counts read == rows written, aborting nonzero on mismatch.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def split_name(df):
    """parse_name (migrate_csv_to_db.py:163-180): 'surname, given' -> two
    trimmed fields; no comma -> whole string is the surname, given ''."""
    parts = F.split(F.col("name"), ",", 2)
    has = F.col("name").isNotNull() & (F.trim(F.col("name")) != "")
    return df.select(
        F.col("#external_id").alias("id"),
        F.col("color").cast("int").alias("color"),
        F.when(has, F.trim(parts.getItem(0))).otherwise(F.lit("")).alias("surname"),
        F.when(
            has & (F.size(parts) > 1), F.trim(parts.getItem(1))
        ).otherwise(F.lit("")).alias("given_name"),
        F.col("iteration").cast("int").alias("iteration"),
        F.col("lifespan"),
    )


def migrate(spark: SparkSession, csv_dir: str, basename: str, out: str) -> dict:
    """Run the full migration; returns {"stats": ..., "verified": bool}."""
    base = f"{csv_dir}/{basename}"

    def read_csv(path):
        return spark.read.option("header", True).csv(path)

    stats: dict[str, int] = {}

    vertices = split_name(read_csv(f"{base}.vertices.csv"))
    vertices.write.mode("overwrite").parquet(f"{out}/vertices")
    stats["vertices"] = vertices.count()

    def edge_form(df):
        return df.select(
            F.col("#source_vertex").alias("source"),
            F.col("destination_vertex").alias("destination"),
            F.col("relationship_type").alias("type"),
            F.col("relationship_id").alias("id"),
        )

    for name, fname in (
        ("edges", "edges.csv"),
        ("spanning_edges", "spanning.edges.csv"),
        ("frontier_edges", "frontier.edges.csv"),
    ):
        e = edge_form(read_csv(f"{base}.{fname}"))
        # type-partitioned layout = the reference's EDGE(type, ...) indices:
        # per-type scans prune to one partition directory
        e.write.mode("overwrite").partitionBy("type").parquet(f"{out}/{name}")
        stats[name] = e.count()

    fv = read_csv(f"{base}.frontier.vertices.csv").select(
        F.col("#external_id").alias("id")
    )
    fv.write.mode("overwrite").parquet(f"{out}/frontier")
    stats["frontier_vertices"] = fv.count()

    try:
        log = read_csv(f"{base}.log.csv").select(
            F.col("#iteration").cast("int").alias("iteration"),
            F.col("duration").cast("double").alias("duration"),
            F.col("vertices").cast("long").alias("vertices"),
            F.col("frontier").cast("long").alias("frontier"),
            F.col("edges").cast("long").alias("edges"),
            F.col("spanning_edges").cast("long").alias("spanning_edges"),
            F.col("frontier_edges").cast("long").alias("frontier_edges"),
        )
        log.write.mode("overwrite").parquet(f"{out}/crawl_log")
        stats["log_entries"] = log.count()
    except Exception:  # log.csv is optional (migrate_csv_to_db.py:21)
        stats["log_entries"] = 0

    # verification pass: written parquet row counts must equal source counts
    ok = True
    for name, n in stats.items():
        if name == "log_entries":
            continue
        path = {
            "vertices": "vertices",
            "edges": "edges",
            "spanning_edges": "spanning_edges",
            "frontier_edges": "frontier_edges",
            "frontier_vertices": "frontier",
        }[name]
        try:
            written = spark.read.parquet(f"{out}/{path}").count()
        except Exception:
            # a 0-row partitioned write leaves no readable footer — that is
            # consistent iff the source was empty too
            written = 0
        if written != n:
            ok = False
    return {"stats": stats, "verified": ok}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--csv-dir", required=True)
    p.add_argument("--basename", required=True)
    p.add_argument("--out", required=True, help="parquet output root")
    args = p.parse_args()
    spark = SparkSession.builder.appName("fs-crawler-migrate").getOrCreate()
    result = migrate(spark, args.csv_dir, args.basename, args.out)
    print(json.dumps(result))
    raise SystemExit(0 if result["verified"] else 1)


if __name__ == "__main__":
    main()
