"""Streaming ingest: micro-batch dedup-append shares batch dedup semantics."""

import pytest

from fs_crawler_spark.sources.corpus import build_pages
from fs_crawler_spark.streaming.ingest import (
    ingest_batch,
    load_bloom,
    read_ingested,
    read_pages_stream,
    start_dedup_ingest,
)


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

    ingested = read_ingested(spark, out)
    assert ingested.count() == 60  # overlap deduplicated
    assert ingested.select("url").distinct().count() == 60

    # bounded-dedup state: compact shard-partitioned seen INDEX (2 columns,
    # never the page payloads) + the bloom blob table — per-batch dedup reads
    # these, not the whole output table
    import glob

    seen_idx = read_ingested(spark, out, "seen")
    assert seen_idx.count() == 60
    assert {"url_hash", "url", "shard"} <= set(seen_idx.columns)
    # per-batch overwrite dirs with shard pruning inside (replay-idempotent)
    assert glob.glob(f"{out}/seen/batch=*/shard=*")
    blobs = load_bloom(spark, out)
    assert blobs is not None and blobs.count() > 0
    # every ingested url must probe maybe_seen (no false negatives) so a
    # re-drop of the same files would dedup to zero
    from fs_crawler_spark.operators.bloom import bloom_prefilter

    flags = bloom_prefilter(seen_idx.select("url_hash", "url"), blobs, n_shards=32)
    assert flags.filter(~F.col("maybe_seen")).count() == 0


@pytest.mark.slow
def test_ingest_batch_replay_idempotent(spark, sf_dir, tmp_path):
    """Crash/replay windows (round-2 advisory): a replayed batch — whether it
    fully committed (marker present) or crashed mid-commit (deltas written,
    marker absent) — never appends duplicate pages, and a missing bloom blob
    never disables dedup (rebuilt from the seen index)."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    out = str(tmp_path / "out")
    pages = build_pages(spark, sf_dir, limit_docs=60)
    doc = F.regexp_extract(F.col("url"), r"/doc/(\d+)$", 1).cast("long")
    first = pages.filter(doc < 40)

    ingest_batch(first, 0, out)
    assert read_ingested(spark, out).count() == 40

    # replay of a FULLY COMMITTED batch: marker names it -> no-op
    ingest_batch(first, 0, out)
    assert read_ingested(spark, out).count() == 40

    # crash-mid-commit replay: deltas written but marker rolled back
    marker_path = os.path.join(out, "_ingest_commit.json")
    with open(marker_path) as f:
        saved = json.load(f)
    os.remove(marker_path)
    ingest_batch(first, 0, out)  # re-runs batch 0, overwriting its own dirs
    assert read_ingested(spark, out).count() == 40
    assert read_ingested(spark, out).select("url").distinct().count() == 40

    # missing bloom must NOT disable dedup: batch 1 overlaps 20-59
    with open(marker_path) as f:
        saved = json.load(f)
    shutil.rmtree(os.path.join(out, "bloom"), ignore_errors=True)
    ingest_batch(pages.filter(doc >= 20), 1, out)
    assert read_ingested(spark, out).count() == 60
    assert read_ingested(spark, out).select("url").distinct().count() == 60
    # bloom was rebuilt and republished under the new marker
    assert load_bloom(spark, out) is not None
    # ...and the republished bloom must contain the REBUILT history, not just
    # batch 1's urls (round-3 advisory): a following batch overlapping the
    # pre-loss urls 0-39 must still dedup to zero via the bloom -> exact path
    ingest_batch(pages, 2, out)
    assert read_ingested(spark, out).count() == 60
    assert read_ingested(spark, out).select("url").distinct().count() == 60
    # GC retention-of-1: the version the previous marker named survives the
    # swap (a concurrent reader on the old marker keeps its blobs); older
    # versions are collected
    versions = sorted(os.listdir(os.path.join(out, "bloom")))
    assert versions == ["v1", "v2"]


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


@pytest.mark.slow
def test_sessionizer_out_of_order_multibatch(spark, tmp_path):
    """Late-but-within-watermark events in a LATER micro-batch must merge
    into the open session (start moves back to min) or split into their own
    earlier session when > gap before the open start (round-2 advisory)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from fs_crawler_spark.streaming.sessions import sessionize_stream

    landing = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("ts", TimestampType(), False),
        ]
    )

    def ts(sec):
        return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=sec)

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    out_rows = []

    def drain():
        q = (
            sessionize_stream(
                spark.readStream.schema(schema).parquet(landing),
                gap_s=600,
                watermark_delay_s=6000,  # absorb lateness > gap
            )
            .writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: open session [10000, 10010]
    drop([(1, ts(10000)), (1, ts(10010))])
    drain()
    # batch 2, all late but within watermark (wm = 10010 - 6000):
    #   9900 merges (start moves back), 10005 merges (inside),
    #   8000 splits (9900 - 8000 > 600) into its own closed session
    drop([(1, ts(9900)), (1, ts(8000)), (1, ts(10005))])
    drain()
    # batch 3: a far-future event closes the open session by gap proof
    drop([(1, ts(100000))])
    drain()

    def key(r):
        return (
            r["user_id"],
            r["session_start"].replace(tzinfo=None),
            r["session_end"].replace(tzinfo=None),
            r["n_events"],
        )

    got = {key(r) for r in out_rows}
    assert (1, ts(8000), ts(8000), 1) in got  # split earlier session
    assert (1, ts(9900), ts(10010), 4) in got  # merged, start moved to min
    # sealed emission: nothing emitted before the watermark proved it, so no
    # partial/retracted variants of these sessions appear
    starts = [k[1] for k in got]
    assert starts.count(ts(8000)) == 1 and starts.count(ts(9900)) == 1


@pytest.mark.slow
def test_sessionizer_late_bridge_not_split(spark, tmp_path):
    """Round-3 advisory: with watermark_delay_s > gap_s, a session that looks
    closed inside a batch must NOT emit until the watermark passes end + gap —
    a later in-watermark event can bridge the gap. gap=600, delay=6000:
    batch {0, 700} then batch {500} must yield ONE session (0, 700, 3),
    never (0,0,1) + (500,700,2)."""
    import datetime as dt

    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from fs_crawler_spark.streaming.sessions import sessionize_stream

    landing = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("ts", TimestampType(), False),
        ]
    )

    def ts(sec):
        return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=sec)

    out_rows = []

    def drop_and_drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            landing
        )
        q = (
            sessionize_stream(
                spark.readStream.schema(schema).parquet(landing),
                gap_s=600,
                watermark_delay_s=6000,
            )
            .writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drop_and_drain([(1, ts(0)), (1, ts(700))])
    assert out_rows == []  # 0..0 looks closed but is NOT sealed yet
    drop_and_drain([(1, ts(500))])  # late, in-watermark: bridges the gap
    drop_and_drain([(1, ts(100000))])  # advances the watermark past the seal

    got = {
        (
            r["user_id"],
            r["session_start"].replace(tzinfo=None),
            r["session_end"].replace(tzinfo=None),
            r["n_events"],
        )
        for r in out_rows
    }
    assert (1, ts(0), ts(700), 3) in got
    assert (1, ts(0), ts(0), 1) not in got
