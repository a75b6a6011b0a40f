"""Streaming ingest: micro-batch dedup-append shares batch dedup semantics."""

import pytest

from fs_crawler_spark.sources.corpus import build_pages
from fs_crawler_spark.streaming.ingest import read_pages_stream, start_dedup_ingest


@pytest.mark.slow
def test_stream_dedup_ingest(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = build_pages(spark, sf_dir, limit_docs=60)
    # two overlapping drops: 0-39, then 20-59 (20-39 are late duplicates)
    from pyspark.sql import functions as F

    doc = F.regexp_extract(F.col("url"), r"/doc/(\d+)$", 1).cast("long")
    pages.filter(doc < 40).write.mode("append").parquet(landing)

    q = start_dedup_ingest(read_pages_stream(spark, landing), out, ckpt)
    q.awaitTermination(120)

    pages.filter(doc >= 20).write.mode("append").parquet(landing)
    q2 = start_dedup_ingest(read_pages_stream(spark, landing), out, ckpt)
    q2.awaitTermination(120)

    ingested = spark.read.parquet(f"{out}/pages")
    assert ingested.count() == 60  # overlap deduplicated
    assert ingested.select("url").distinct().count() == 60

    # bounded-dedup state: compact shard-partitioned seen INDEX (2 columns,
    # never the page payloads) + the bloom blob table — per-batch dedup reads
    # these, not the whole output table
    import glob

    seen_idx = spark.read.parquet(f"{out}/seen")
    assert seen_idx.count() == 60
    assert set(seen_idx.columns) == {"url_hash", "url", "shard"}
    assert glob.glob(f"{out}/seen/shard=*")  # partition-pruned layout
    blobs = spark.read.parquet(f"{out}/bloom")
    assert blobs.count() > 0
    # every ingested url must probe maybe_seen (no false negatives) so a
    # re-drop of the same files would dedup to zero
    from fs_crawler_spark.operators.bloom import bloom_prefilter

    flags = bloom_prefilter(seen_idx, blobs, n_shards=32)
    assert flags.filter(~F.col("maybe_seen")).count() == 0
