"""Stateful streaming sessionization: cross-restart state continuity
(SURVEY §2.10 — the engine's custom stateful-operator surface)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "ts", "user_id"))

    # batch ground truth: sessions per user (same rule as q_sessionize)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    batch = {r.user_id: r.n for r in
             (ev.withColumn("s", F.when(gap.isNull() | (gap > 1800), 1)
                            .otherwise(0))
              .groupBy("user_id").agg(F.sum("s").alias("n")).collect())}

    # split by time into two file drops: first half now, second later
    mid = ev.approxQuantile("event_id", [0.5], 0)[0]
    events_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    (ev.filter(F.col("event_id") <= mid).coalesce(1)
     .write.mode("append").parquet(events_dir))

    from dygiepp_spark.streaming.sessionize import stream_sessionize
    q1 = stream_sessionize(spark, events_dir, out_dir, ckpt)
    q1.awaitTermination(180)

    # second drop arrives after the first run finished; state must be
    # restored from the checkpoint for sessions spanning the boundary
    (ev.filter(F.col("event_id") > mid).coalesce(1)
     .write.mode("append").parquet(events_dir))
    q2 = stream_sessionize(spark, events_dir, out_dir, ckpt)
    q2.awaitTermination(180)

    got = {r.user_id: r.n for r in
           (spark.read.parquet(out_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n")).collect())}
    assert got == batch, (
        "stateful streaming session counts != batch sessionization")
