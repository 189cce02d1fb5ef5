"""Approximate nearest-neighbor search over an embedding column.

Two tiers, same output contract (query_id, vec_id, cosine, rn):

- `brute_force_topk`: the correctness baseline — broadcast the query
  set, score every candidate with a JVM-side zip_with/aggregate dot
  product (narrow map over the candidate scan; per-query top-k is the
  only shuffle and it carries k rows per query).
- `lsh_topk`: the scale path — random-hyperplane LSH buckets both
  sides; candidates share a bucket in >= 1 of `n_tables` tables, then
  exact re-rank. Recall < 1 by construction; measured vs brute force
  in tests (tests/test_operators.py).

Hyperplanes are derived deterministically from a seed so executors
regenerate them instead of shipping matrices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _cosine(av: Column, bv: Column) -> Column:
    return _dot(av, bv) / (F.sqrt(_dot(av, av)) * F.sqrt(_dot(bv, bv)))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """queries: (query_id, qv array<float>). Exact cosine top-k."""
    scored = (emb.crossJoin(F.broadcast(queries))
              .filter(F.col("query_id") != F.col(id_col))
              .select("query_id", F.col(id_col).alias("vec_id"),
                      _cosine(F.col("qv"), F.col(vec_col)).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("vec_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id",
                    F.col("cos").alias("cosine"), "rn"))


def _hyperplanes(dim: int, n_tables: int, bits: int,
                 seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * bits, dim)).tolist()


def _bucket_udf(dim: int | None, n_tables: int, bits: int, seed: int):
    """Vectorized bucket computation: one Arrow-batch matmul
    [batch, dim] @ [dim, tables*bits] -> sign bits -> packed bucket
    ids. ~100x fewer expression evaluations than an unrolled JVM
    expression tree; hyperplanes regenerated from the seed inside the
    worker (nothing shipped).

    `dim=None` derives the dimensionality from each Arrow batch's own
    vectors: planes are a pure function of (seed, dim), so every batch
    on every executor regenerates the SAME planes — no driver action
    (first-row peek) needed anywhere. Cross-batch consistency is
    enforced PER TASK: Spark re-deserializes the UDF closure for each
    task, so the first batch a task sees pins the dim and any later
    batch in that task with a different width fails loudly. That
    catches within-partition raggedness only — a column whose widths
    differ BETWEEN partitions (uniform within each) still buckets
    under incompatible hash families with no error, because no task
    ever sees both widths. Pass `dim` explicitly whenever cross-
    partition uniformity isn't guaranteed upstream; it asserts every
    batch everywhere against the one declared width."""
    pinned: list[int] = []  # closure cell — scope is ONE task (see above)

    @F.pandas_udf("array<int>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        if dim is None:
            if not pinned:
                pinned.append(mat.shape[1])
            d = pinned[0]
        else:
            d = dim
        assert mat.shape[1] == d, (
            f"embedding dim {mat.shape[1]} != expected {d} "
            f"({'declared' if dim is not None else 'pinned from first batch'})")
        planes = np.asarray(_hyperplanes(d, n_tables, bits, seed),
                            dtype=np.float64)          # [T*B, dim]
        signs = (mat @ planes.T >= 0).astype(np.int64)  # [n, T*B]
        weights = (1 << np.arange(bits - 1, -1, -1))
        ids = (signs.reshape(len(mat), n_tables, bits) * weights).sum(2)
        return pd.Series([row.astype("int32").tolist() for row in ids])

    return buckets


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_tables: int = 8, bits: int = 6,
             seed: int = 42, dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH-blocked top-k. Candidate set = union of
    same-bucket vectors over n_tables tables; exact cosine re-rank.
    `dim` is optional: the bucket UDF derives it per Arrow batch (no
    driver action); passing it adds a shape assertion."""
    bucket_of = _bucket_udf(dim, n_tables, bits, seed)

    e_b = (emb.withColumn("buckets", bucket_of(F.col(vec_col)))
           .select(id_col,
                   F.posexplode("buckets").alias("table", "bucket")))
    q_b = (queries.withColumn("buckets", bucket_of(F.col("qv")))
           .select("query_id",
                   F.posexplode("buckets").alias("table", "bucket")))

    # dedup on the BARE (query_id, vec_id) pair first (16 bytes/row
    # through the distinct shuffle), then re-join both vector sides —
    # a pair sharing many buckets would otherwise drag qv + v (2*dim
    # doubles) per duplicate row through the exchange (same pattern as
    # dedup.embedding_near_dups_blocked)
    cand = (e_b.join(q_b, ["table", "bucket"])
            .filter(F.col("query_id") != F.col(id_col))
            .select("query_id", F.col(id_col).alias("vec_id"))
            .distinct())
    qv = queries.select("query_id", "qv")
    vv = emb.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).alias("v"))
    scored = (cand.join(qv, "query_id").join(vv, "vec_id")
              .select("query_id", "vec_id",
                      _cosine(F.col("qv"), F.col("v")).alias("cos"))
              # duplicate ids on either input (malformed but
              # tolerated) would fan the re-join back out and
              # double-count a neighbor; collapse to the DETERMINISTIC
              # best score per pair — scalar rows, map-side combined
              .groupBy("query_id", "vec_id")
              .agg(F.max("cos").alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("vec_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id",
                    F.col("cos").alias("cosine"), "rn"))


def _assign_udf(centroids: np.ndarray):
    """pandas UDF: nearest-centroid id per vector (one matmul per
    Arrow batch; centroids travel in the closure — n_centroids*dim
    floats, broadcast-sized)."""
    cent = centroids.astype(np.float64)
    c_norm2 = (cent * cent).sum(axis=1)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        # argmin ||x-c||^2 = argmin c·c - 2 x·c
        d = c_norm2[None, :] - 2.0 * (mat @ cent.T)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return assign


def train_ivf_centroids(emb: DataFrame, n_centroids: int = 32,
                        lloyd_iters: int = 2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        seed: int = 42) -> np.ndarray:
    """Deterministic k-means-lite coarse quantizer: init = the
    n_centroids rows with the smallest xxhash64(id) — a
    deterministic pseudo-random sample taken with orderBy+limit
    (TakeOrdered: per-partition top-k then a driver merge of k-row
    partials; the previous global row_number window funneled the
    WHOLE table through one task at scale). Each Lloyd iteration is
    one assign (narrow pandas UDF) + one groupBy-avg over exploded
    dimensions (the centroid update as a DataFrame aggregation — no
    per-iteration collect of the data, only of the tiny centroid
    table)."""
    init_rows = (emb.select(
        vec_col,
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
        .alias("_h"), F.col(id_col).alias("_id"))
        .orderBy("_h", "_id").limit(n_centroids)
        .select(vec_col).collect())
    centroids = np.vstack([np.asarray(r[0], dtype=np.float64)
                           for r in init_rows])[:n_centroids]

    for _ in range(lloyd_iters):
        assign = _assign_udf(centroids)
        assigned = emb.select(F.col(vec_col).alias("v"),
                              assign(F.col(vec_col)).alias("c"))
        upd = (assigned.select("c", F.posexplode("v").alias("pos", "x"))
               .groupBy("c", "pos").agg(F.avg("x").alias("m"))
               .collect())
        new = centroids.copy()
        for r in upd:
            new[r.c, r.pos] = r.m
        centroids = new
    return centroids


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 32, n_probe: int = 4,
             lloyd_iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into n_centroids
    inverted lists; each query probes its n_probe nearest lists and
    exact-re-ranks only those candidates. The candidate join is an
    equi-join on the (uniformly sized) list id — at 10^9 vectors the
    lists shard naturally and only ~n_probe/n_centroids of the corpus
    is scored per query."""
    centroids = train_ivf_centroids(emb, n_centroids, lloyd_iters,
                                    id_col, vec_col, seed)
    assign = _assign_udf(centroids)
    e_b = emb.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("v"),
                     assign(F.col(vec_col)).alias("c"))

    cent = centroids.astype(np.float64)
    c_norm2 = (cent * cent).sum(axis=1)

    @F.pandas_udf("array<int>")
    def probe(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = c_norm2[None, :] - 2.0 * (mat @ cent.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q_b = (queries.withColumn("probes", probe(F.col("qv")))
           .select("query_id", "qv",
                   F.explode("probes").alias("c")))

    scored = (e_b.join(q_b, "c")
              .filter(F.col("query_id") != F.col("vec_id"))
              .select("query_id", "vec_id",
                      _cosine(F.col("qv"), F.col("v")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("vec_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id",
                    F.col("cos").alias("cosine"), "rn"))
