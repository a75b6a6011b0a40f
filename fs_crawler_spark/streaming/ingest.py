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

Per-batch dedup cost is BOUNDED, not O(total ingested): the ingest maintains
(a) a compact shard-partitioned seen INDEX (url_hash, url) — never re-reads
the page payload table — and (b) the same executor-side bloom blob table the
batch crawl uses. Each micro-batch probes the blobs (constant-size work per
row), and only "maybe seen" rows run the exact anti-join, restricted by
partition pruning to the shards those rows hash into. A mostly-novel stream
therefore reads ~zero index shards per batch; exactness is preserved because
bloom false-positives fall through to the exact probe (round-1 re-read the
ENTIRE output table per batch — the O(ingested)-per-batch scale killer).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, url_hash, url_host
from ..operators.bloom import build_bloom_shards, merge_bloom_shards, bloom_prefilter
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
    n_shards: int = 32,
    bloom_expected_per_shard: int = 100_000,
):
    """Continuously append first-seen pages to ``out_dir``/pages, dropping
    urls already ingested.

    Within a micro-batch, first-write-wins by (priority: earliest warc_ts,
    then url) — the same deterministic dedup rule as the batch engine.

    Cross-batch dedup is bounded per batch:
      1. probe the bloom blob table (``out_dir``/bloom, executor-side
         cogroup) — rows flagged definitely-new skip the exact check;
      2. "maybe seen" rows anti-join the shard-partitioned seen index
         (``out_dir``/seen, (url_hash, url) only), pruned to exactly the
         shards those rows hash into;
      3. the fresh rows append to pages + seen index, and their bloom delta
         ORs into the blob table (staging dir + atomic rename, since the
         merge plan lazily reads the previous blobs).
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
        canon = (
            canon.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn(
                "shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
            )
        )

        bloom_path = f"{out_dir}/bloom"
        try:
            blobs = spark.read.parquet(bloom_path)
            blobs.schema  # force resolution now
        except Exception:
            blobs = None

        maybe_cached = None
        if blobs is None:
            fresh = canon  # cold start: nothing ingested yet
        else:
            flags = bloom_prefilter(canon, blobs, n_shards)
            flagged = canon.join(flags, on=["url_hash", "url"], how="inner")
            definite = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen").persist()
            maybe_cached = maybe
            # tiny driver list (<= n_shards ints) used ONLY as a partition-
            # pruning predicate — not a data collect
            shards_needed = [
                r["shard"] for r in maybe.select("shard").distinct().collect()
            ]
            if shards_needed:
                seen_idx = (
                    spark.read.parquet(f"{out_dir}/seen")
                    .filter(F.col("shard").isin(shards_needed))
                    .select("url_hash", "url")
                )
                maybe = maybe.join(seen_idx, on=["url_hash", "url"], how="left_anti")
            fresh = definite.unionByName(maybe)

        fresh = fresh.persist()
        fresh.drop("shard").write.mode("append").parquet(f"{out_dir}/pages")
        fresh.select("url_hash", "url", "shard").write.mode("append").partitionBy(
            "shard"
        ).parquet(f"{out_dir}/seen")

        delta = build_bloom_shards(fresh, n_shards, bloom_expected_per_shard)
        merged = delta if blobs is None else merge_bloom_shards(blobs, delta)
        staging = f"{out_dir}/_bloom_staging_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        old = f"{out_dir}/_bloom_old_{batch_id}"
        if os.path.exists(bloom_path):
            os.rename(bloom_path, old)
        os.rename(staging, bloom_path)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)
        fresh.unpersist()
        if maybe_cached is not None:
            maybe_cached.unpersist()

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
