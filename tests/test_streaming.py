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


@pytest.mark.slow
def test_stateful_sessionization_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer: every CLOSED session emitted by
    the stream equals the batch events_sessions window algebra (same
    whole-microsecond gap rule); open sessions may remain in state at
    drain time and are excluded from the comparison."""
    import calendar

    from pyspark.sql import functions as F

    from fs_crawler_spark.streaming.sessions import sessionize_stream

    landing = str(tmp_path / "ev")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.coalesce(1).write.parquet(landing)  # one file -> one micro-batch

    stream = spark.readStream.schema(ev.schema).parquet(landing)
    out_rows = []
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def us_utc(dt):  # collected timestamps are session-tz (UTC) naive
        return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond

    got = {
        (r["user_id"], us_utc(r["session_start"]), r["n_events"]) for r in out_rows
    }
    assert got, "stream must close at least some sessions"

    # batch truth: (user_id, session_start_us, n_events) per session
    w_ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import Window

    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = micros - F.lag(micros).over(w)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    batch = (
        w_ev.withColumn("_new", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
        .withColumn("session_id", F.sum("_new").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(micros).alias("start_us"),
            F.count("*").alias("n_events"),
        )
    )
    truth = {
        (r["user_id"], r["start_us"], r["n_events"]) for r in batch.collect()
    }
    assert got <= truth  # every closed stream session is a true session
    # and the stream closed the overwhelming majority of them
    assert len(got) >= 0.5 * len(truth)
