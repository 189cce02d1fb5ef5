"""Stateful streaming sessionization: cross-restart state continuity
(SURVEY §2.10 — the engine's custom stateful-operator surface); and
event-time windowed aggregation with watermark late-data dropping."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Two file drops: the second carries one row inside the
    watermark (accepted into its window) and one beyond it
    (dropped). The batch path, with no watermark, counts all rows —
    proving the drop is watermark semantics, not a filter."""
    from dygiepp_spark.streaming.windows import (
        stream_windowed_page_counts, windowed_page_counts)

    def page(ts, lang, text):
        return (f"https://x/{ts}", datetime(2026, 1, 1, *ts),
                b"<p>x</p>", text, lang)

    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    batch_a = [page((10, 0, 30), "en", "aa bb"),
               page((10, 1, 0), "en", "cc"),
               page((10, 3, 30), "de", "dd ee ff")]
    # advances the watermark to 9:36 for the NEXT batch (the filter
    # uses the watermark committed one batch earlier)
    batch_b = [page((10, 6, 0), "en", "mid")]
    # 9:50 is within 30min of 10:06 (watermark 9:36) -> kept;
    # 9:00 is beyond it -> dropped by the streaming watermark
    batch_c = [page((9, 50, 10), "en", "late ok"),
               page((9, 0, 0), "fr", "too late")]

    pages_dir = str(tmp_path / "pages_in")
    os.makedirs(pages_dir)

    # the file stream source wants plain files in the dir — write via
    # a staging dir, then move the single part file in, with mtimes
    # forcing processing order a -> b -> c
    import glob as _glob
    import shutil
    now = 1_600_000_000
    for name, rows, age in (("a", batch_a, 200), ("b", batch_b, 100),
                            ("c", batch_c, 0)):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(pages_dir, f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (now - age, now - age))

    q = stream_windowed_page_counts(
        spark, pages_dir, str(tmp_path / "ckpt"),
        query_name="wtest", max_files_per_trigger=1)
    q.awaitTermination(180)

    rows = spark.sql("select * from wtest").collect()
    got = {}
    for r in rows:  # update mode re-emits; keep the latest count
        got[(r.win.start.hour, r.win.start.minute, r.lang)] = \
            max(r.n_pages,
                got.get((r.win.start.hour, r.win.start.minute,
                         r.lang), 0))
    assert got[(10, 0, "en")] == 2
    assert got[(10, 0, "de")] == 1
    assert got[(10, 5, "en")] == 1
    assert got[(9, 50, "en")] == 1          # late-but-in-watermark
    assert not any(lang == "fr" for _h, _m, lang in got), (
        "row beyond the watermark must be dropped")

    # batch path: same function, no watermark -> fr IS counted
    all_rows = spark.createDataFrame(batch_a + batch_b + batch_c,
                                     schema)
    b = {(r.win.start.hour, r.win.start.minute, r.lang): r.n_pages
         for r in windowed_page_counts(all_rows).collect()}
    assert b[(9, 0, "fr")] == 1


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


def test_stream_dedup_incremental_restart(spark, tmp_path):
    """Streaming crawl-dedup loop: batch 1 drops its in-batch
    near-pair; after a restart from the checkpoint, batch 2 is deduped
    against the band-signature state batch 1 left behind — a near-copy
    of an already-accepted doc is dropped, a fresh doc survives."""
    import glob as _glob
    import shutil

    from dygiepp_spark.streaming.dedup_stream import (
        stream_dedup_incremental)

    def text(tag, n=30):
        return " ".join(f"{tag}w{j}" for j in range(n))

    docs_dir = str(tmp_path / "docs_in")
    os.makedirs(docs_dir)
    schema = "doc_id bigint, text string"

    def drop_file(name, rows, age):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(docs_dir, f"{name}.parquet")
        shutil.copy(part, dst)
        now = 1_600_000_000
        os.utime(dst, (now - age, now - age))

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    drop_file("a", [(1, text("a")), (2, text("b")),
                    (3, text("a") + " tail"),   # in-batch near-dup of 1
                    (4, text("c"))], age=100)
    q = stream_dedup_incremental(spark, docs_dir, out, state, ckpt)
    q.awaitTermination(180)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2, 4}, got1

    # restart: new file, same checkpoint -> state from run 1 applies
    drop_file("b", [(10, text("a") + " extra"),  # near-copy of doc 1
                    (11, text("d"))], age=0)
    q = stream_dedup_incremental(spark, docs_dir, out, state, ckpt)
    q.awaitTermination(180)
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2, 4, 11}, got2


def test_stream_dedup_evidence_query(spark):
    """The registered driver-facing streaming query: 2 deterministic
    epochs, replayed batch-0 texts must all be dropped by the state
    join, and re-running gives identical counts (fresh scratch per
    call — the checkpoint can't short-circuit)."""
    from dygiepp_spark.plans.registry import QUERIES
    from tests.conftest import SF_SMOKE

    rows = {r.epoch: r for r in
            QUERIES["q_stream_dedup_evidence"](spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].n_survivors > 0 and rows[1].n_survivors > 0
    assert rows[0].n_replayed_kept == 0
    assert rows[1].n_replayed_kept == 0  # every replay deduped
    again = {r.epoch: r.n_survivors for r in
             QUERIES["q_stream_dedup_evidence"](spark, SF_SMOKE).collect()}
    assert again == {e: r.n_survivors for e, r in rows.items()}
