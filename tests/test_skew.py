"""Salted-aggregation / salted-join equivalence tests (SURVEY §4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark):
    # 90% of rows share one key — the pathological distribution
    return (spark.range(20000)
            .select(F.when(F.col("id") % 10 < 9, F.lit("HOT"))
                    .otherwise((F.col("id") % 7).cast("string"))
                    .alias("k"),
                    (F.col("id") % 100).cast("double").alias("v")))


def test_salted_aggregate_matches_plain(spark):
    from dygiepp_spark.operators.skew import salted_aggregate
    df = _skewed(spark)
    plain = {(r.k): (r.n, r.s, r.mn, r.mx) for r in
             df.groupBy("k").agg(
                 F.count("v").cast("bigint").alias("n"),
                 F.sum("v").alias("s"),
                 F.min("v").alias("mn"),
                 F.max("v").alias("mx")).collect()}
    salted = salted_aggregate(
        df, ["k"], {"v": "sum"}, n_salts=16).collect()
    salted_counts = salted_aggregate(
        df.withColumnRenamed("v", "c"), ["k"], {"c": "count"},
        n_salts=16).collect()
    for r in salted:
        assert abs(r.v - plain[r.k][1]) < 1e-6
    for r in salted_counts:
        assert r.n_c == plain[r.k][0]


def test_salted_broadcast_left_matches_plain(spark):
    from dygiepp_spark.operators.skew import salted_broadcast_left
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-label")] + [(str(i), f"l{i}") for i in range(7)],
        "k string, label string")
    plain = fact.join(dim, "k", "left")
    salted = salted_broadcast_left(fact, dim, "k", n_salts=8)
    key = ["k", "v", "label"]
    a = sorted(map(tuple, plain.select(*key).collect()))
    b = sorted(map(tuple, salted.select(*key).collect()))
    assert a == b
