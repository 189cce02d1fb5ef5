"""Connected components as a bounded DataFrame loop.

SURVEY.md §4.3: no GraphFrames jar in the sandbox, so canonicalization
runs min-label propagation over the edge list — each iteration is one
shuffle (join + min-agg), `localCheckpoint()` truncates lineage so the
plan doesn't grow, and the loop exits on convergence (0 label changes)
or `CC_MAX_ITERS`.

Convergence: labels start as node ids and monotonically decrease to
the component minimum; iterations needed = graph diameter. Entity-
linking graphs here are star-ish (exact-text groups + LSH pair edges),
so diameter is small. At 10^12-node scale the same loop upgrades to
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") which contracts paths doubly-exponentially; the
seam is this one function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dygiepp_spark.config import CC_MAX_ITERS


def connected_components(edges: DataFrame,
                         max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """edges: (src bigint, dst bigint), undirected, self-loops ok.
    Returns (node bigint, component bigint) for every node that
    appears in `edges`; component == min node id reachable."""
    e = (edges.select(F.col("src").cast("bigint").alias("src"),
                      F.col("dst").cast("bigint").alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    # symmetrize once; dedup to keep the per-iteration join small
    sym = (e.select("src", "dst")
            .unionByName(e.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
            .distinct()
            .localCheckpoint(eager=True))

    # size the loop's partitioning to the graph, not to the session
    # default — a small graph on 32 shuffle partitions pays ~32 empty
    # tasks per iteration in pure scheduler overhead. At real scale
    # n_parts grows with the edge count.
    n_edges = sym.count()
    n_parts = max(1, min(int(n_edges // 500_000) + 1, 2048))
    sym = sym.repartition(n_parts, "dst").localCheckpoint(eager=True)

    labels = (sym.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("component", F.col("node"))
              .repartition(n_parts, "node"))

    for _ in range(max_iters):
        # candidate label for each node: min over neighbors' labels
        nbr_min = (sym.join(labels,
                            sym.dst == labels.node, "inner")
                   .groupBy(sym.src.alias("node"))
                   .agg(F.min("component").alias("nbr_component")))
        new_labels = (labels.join(nbr_min, "node", "left")
                      .select("node",
                              F.least("component",
                                      F.coalesce("nbr_component",
                                                 "component"))
                              .alias("component")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") < F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels
