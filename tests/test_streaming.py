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
