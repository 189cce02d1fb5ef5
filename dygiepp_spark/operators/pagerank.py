"""PageRank over a KG / similarity graph — iterative DataFrame joins.

Beyond-reference graph analytics for the materialized nodes/edges
tables (SURVEY.md §2 "beyond" mandate; the canonical companion to
connected components in `operators/cc.py`): rank entities by link
structure, e.g. to prioritize canonicalization review or weight
entity importance in downstream retrieval.

Spark-first shape: the classic power iteration as joins/aggregations —
  pr_{t+1}(v) = (1-d)/N + d * Σ_{u->v} pr_t(u) / outdeg(u)
with dangling-node mass redistributed uniformly (the standard
stochastic-matrix fix — without it rank mass leaks and the vector no
longer sums to 1).

Scale design:
- edges are (src, dst) with ONE shuffle-partitioning reused across
  iterations: `ranks` is re-joined to a static, pre-aggregated
  `outdeg` table each round; both sides shard on the node id.
- per-iteration lineage is cut with localCheckpoint (same pattern as
  cc.py) so the plan doesn't grow unboundedly over T iterations.
- the dangling-mass term is a 1-row aggregate folded back in via
  crossJoin(broadcast(...)), so each iteration is ONE job (the eager
  localCheckpoint) — no separate collect-the-scalar pass over the
  node table per round (job count asserted in tests/test_graph.py).
- convergence: fixed `iters` (deterministic, resumable) rather than a
  driver-side delta loop; 10–20 iterations is the standard operating
  point and keeps the job shape static for AQE.

Verified against a dense numpy power iteration on the same graph
(tests/test_graph.py) to ~1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             iters: int = 10,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """edges: directed (src, dst) pairs (duplicates = multi-edges,
    each carries weight 1/outdeg share). Returns (node, rank) with
    Σ rank = 1. Nodes = every id appearing as src OR dst."""
    # checkpoint the EDGE set first: every iteration is a separate
    # action, and an un-checkpointed edge lineage (e.g. an LSH
    # self-join upstream) would recompute per iteration
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = (e.groupBy("src")
              .agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
              .localCheckpoint(eager=True))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (ranks.join(outdeg,
                              ranks["node"] == outdeg["src"], "inner")
                   .select(outdeg["src"].alias("src"),
                           (ranks["rank"] / outdeg["outdeg"])
                           .alias("share"))
                   .join(e, "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum("share").alias("inflow")))
        # dangling mass: rank held by nodes with no outgoing edges,
        # redistributed uniformly. Kept as a 1-ROW DATAFRAME and
        # folded in via crossJoin(broadcast(...)) so the aggregate
        # runs inside the SAME job as the rank update — a driver
        # .collect() here would launch one extra full pass over the
        # node-sized ranks table per iteration.
        dangling = (ranks.join(outdeg,
                               ranks["node"] == outdeg["src"],
                               "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dangling")))
        ranks = (nodes.join(contrib, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce("inflow", F.lit(0.0))
                             + F.col("dangling") / n)).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks
