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
    Returns (node, label) after `iters` synchronous rounds — one row
    for EVERY node appearing in the input, including nodes whose only
    edge is a self-loop (they keep their own label; self-loops never
    vote). Callers like bench.py pass CC's edge set, whose explicit
    (gid, gid) rows exist precisely to keep singletons alive — LPA
    must not silently drop them."""
    e0 = edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
    # node set BEFORE the self-loop filter: self-loop-only nodes stay
    nodes = (e0.select(F.col("src").alias("node"))
             .unionByName(e0.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    # symmetrize + dedup: every neighbor votes once per round
    e = (e0.unionByName(e0.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
         .filter(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=True))
    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(),
                                           F.col("label").asc())
    for _ in range(iters):
        votes = (e.join(labels.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        winners = (votes.withColumn("rk", F.row_number().over(w))
                   .filter(F.col("rk") == 1)
                   .select("node", F.col("label").alias("win")))
        # left join: a node with no (non-self) neighbors keeps its own
        # label — the isolated-node contract
        labels = (nodes.join(winners, "node", "left")
                  .select("node", F.coalesce("win", F.col("node"))
                          .alias("label"))
                  .localCheckpoint(eager=True))
    return labels
