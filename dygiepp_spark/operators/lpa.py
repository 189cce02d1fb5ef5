"""Synchronous label propagation (community detection) as a bounded
DataFrame loop — the GraphFrames `labelPropagation` analogue
(ref: BASELINE.json north_star "GraphFrames-style label propagation").

Where connected components (operators/cc.py) answers "which nodes are
REACHABLE from each other", LPA answers "which nodes are DENSELY
linked" — near-dup communities inside a weakly-connected blob, entity
neighborhoods worth canonicalizing together.

Semantics (deterministic by construction, unlike the async/random
variants): label_0(v) = v; each round every node adopts the most
frequent label among its neighbors, ties broken by the SMALLEST label
(GraphFrames uses hash-mod tie-breaks, which are partition-stable but
opaque; min-label is equally stable and portable to a SQL oracle).
Isolated nodes keep their own label. Fixed `iters` rounds — the
standard operating point, and a static job shape for AQE.

Scale design:
- each round is ONE shuffle pair: edges ⋈ labels (sharded on the
  node id) → (node, neighbor_label) counts via map-side-combined
  groupBy → rank-1 window on the aggregated (node, label, cnt) table
  (a few rows per node, never the raw adjacency);
- `localCheckpoint` per round truncates lineage (same pattern as
  cc.py / pagerank.py);
- hub skew: the count groupBy pre-aggregates per (node, label), so a
  10^7-degree hub contributes rows proportional to its DISTINCT
  neighbor labels, which shrinks every round as the community forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iters: int = 4,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """edges: UNDIRECTED pairs (each edge counted once per direction —
    pass a symmetrized table, or this symmetrizes internally).
    Returns (node, label) after `iters` synchronous rounds."""
    e0 = edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
    # symmetrize + dedup: every neighbor votes once per round
    e = (e0.unionByName(e0.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
         .filter(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node")).distinct()
             .localCheckpoint(eager=True))
    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(),
                                           F.col("label").asc())
    for _ in range(iters):
        votes = (e.join(labels.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        labels = (votes.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") == 1)
                  .select("node", "label")
                  .localCheckpoint(eager=True))
    return labels
