"""The `pages` source — Common-Crawl-style web-page table.

Authoritative shape per BASELINE.json input_hint (FIXTURES.md §1):
(url string, warc_ts timestamp, html binary, text string, lang string).

At real scale this is an Iceberg table read with
``spark.read.table("pages")`` and partition pruning on
bucket(url)/warc_ts (SURVEY.md §2.1 S1, §4.2). In the sandbox (no
Iceberg jar) we synthesize it deterministically from the driver's
``documents.parquet`` — ENTIRELY with JVM-side column expressions (no
Python), so synthesis is free at any scale and Catalyst can prune/push
down through it.

``partition_id`` is the stand-in WARC partition key driving the
checkpoint/resume + lineage mechanics (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dygiepp_spark import config as C

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z


def synth_pages(spark: SparkSession, sf_dir: str,
                n_partitions: int = C.N_WARC_PARTITIONS) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang,
    partition_id). Deterministic (FIXTURES.md §1 synthesis rules):
    html wraps text so extract_text(html) == text byte-identically."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("https://%s.example/%s/%d",
                        "source", "lang", "doc_id").alias("url"),
        F.timestamp_seconds(
            F.lit(EPOCH_2026) + F.col("doc_id") * 60).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"),
                     F.lit("</p></body></html>")),
            "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    ).withColumn(
        "partition_id",
        F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("int"),
    )
