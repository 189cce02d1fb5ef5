"""Event-time windowed aggregation with a watermark — the Structured
Streaming late-data surface (task mandate: "watermarks + windowed
aggs for late data"; complements the stateful sessionizer).

The reference is batch-only (SURVEY §2.10), so this is an
engine-native extension: crawl pages carry `warc_ts` event time, and
a monitoring deployment wants per-window per-lang page/byte counts
that tolerate stragglers up to the watermark delay and DROP anything
later (bounded state — without the watermark the window state grows
with the crawl).

Scale: the windowed groupBy shards on (window, lang) — uniform keys;
state per key is one count row; watermark eviction keeps total state
~ (active windows × langs), independent of throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def windowed_page_counts(pages: DataFrame,
                         window_duration: str = "5 minutes",
                         watermark_delay: str = "30 minutes"
                         ) -> DataFrame:
    """pages (streaming or batch) -> per-(event-time window, lang)
    page counts + byte volume. On a streaming input the watermark
    bounds state and drops rows later than `watermark_delay` behind
    the max observed `warc_ts`."""
    if pages.isStreaming:
        pages = pages.withWatermark("warc_ts", watermark_delay)
    return (pages
            .groupBy(F.window("warc_ts", window_duration).alias("win"),
                     "lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pages"),
                 F.sum(F.length("text")).cast("bigint")
                 .alias("n_chars")))


def stream_windowed_page_counts(spark: SparkSession, pages_dir: str,
                                checkpoint_dir: str,
                                query_name: str = "page_windows",
                                window_duration: str = "5 minutes",
                                watermark_delay: str = "30 minutes",
                                max_files_per_trigger: int = 1):
    """File-source wrapper: in-memory sink, update output mode (each
    micro-batch emits changed windows; a row later than the watermark
    never appears). `max_files_per_trigger=1` makes the watermark
    advance between file drops — the late-data semantics a single
    mega-batch would mask. Note Spark's watermark commit lag: the
    value computed from batch N's max event time gates the filter
    from batch N+2 (one batch to commit, one to apply) — measured on
    Spark 4.1, see tests/test_streaming_state.py."""
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(pages_dir))
    agg = windowed_page_counts(stream, window_duration, watermark_delay)
    return (agg.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
