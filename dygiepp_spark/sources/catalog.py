"""Table-format seam: Iceberg when available, parquet layout otherwise.

The north_star materializes nodes/edges/triples/lineage to Iceberg.
This sandbox has no Iceberg jar (pyspark_guide "Sources & sinks"), so
the engine writes the equivalent physical layout — parquet + partition
directories + the lineage commit-log — behind this seam. On a cluster
with `spark.sql.catalog.<name>` configured for Iceberg, the same calls
become real Iceberg tables with `overwritePartitions` semantics; the
resume/idempotence contract is identical (dynamic partition overwrite
here, REPLACE PARTITIONS there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") for k, _ in confs)


def write_table(df: DataFrame, target: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    """target: an Iceberg table identifier (catalog.db.table) when the
    catalog exists, else a filesystem path for partitioned parquet."""
    spark = df.sparkSession
    if iceberg_available(spark):  # pragma: no cover - no jar in sandbox
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite_partitions":
            writer.overwritePartitions()
        elif mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode("overwrite" if mode == "overwrite_partitions"
                      else mode)
    if partition_by:
        if mode == "overwrite_partitions":
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           "dynamic")
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark):  # pragma: no cover
        return spark.read.table(target)
    return spark.read.parquet(target)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 64,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table (Hive-style layout; Iceberg bucket
    transform on a real catalog): rows are hash-partitioned into
    `n_buckets` files per partition ON WRITE, so equi-joins and
    aggregations on `bucket_cols` between co-bucketed tables run with
    NO exchange — the shuffle is paid once at write time instead of
    per query. The pattern for fact/fact joins at crawl scale (e.g.
    triples ⋈ mentions on url), where neither side broadcasts.
    Requires saveAsTable (bucket metadata lives in the session
    catalog). On an Iceberg catalog this becomes the bucket()
    partition transform — same no-exchange co-located join contract,
    Iceberg's storage-partitioned-join path."""
    spark = df.sparkSession
    if iceberg_available(spark):  # pragma: no cover - no jar in sandbox
        from pyspark.sql import functions as F
        transforms = [F.bucket(n_buckets, F.col(bucket_cols[0]))] + \
            [F.col(c) for c in bucket_cols[1:]]
        writer = df.writeTo(table).partitionedBy(*transforms)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
