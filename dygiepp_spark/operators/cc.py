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


LOCAL_SOLVE_MAX_EDGES = 2_000_000


def _local_union_find(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Driver-side union-find with min-root canonicalization — exact
    same contract as the distributed loop."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in parent)


def connected_components(edges: DataFrame,
                         max_iters: int = CC_MAX_ITERS,
                         local_solve_max_edges: int = LOCAL_SOLVE_MAX_EDGES
                         ) -> DataFrame:
    """edges: (src bigint, dst bigint), undirected, self-loops ok.
    Returns (node bigint, component bigint) for every node that
    appears in `edges`; component == min node id reachable.

    Scale-adaptive: below `local_solve_max_edges` the deduped edge
    list is solved with a driver-side union-find (bounded memory, and
    strictly faster than any shuffle round-trip); above it, the
    distributed min-label-propagation + pointer-jump loop runs. Both
    paths produce identical output (tested against each other)."""
    e = (edges.select(F.col("src").cast("bigint").alias("src"),
                      F.col("dst").cast("bigint").alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         # materialize once: the edge list is consumed by at least two
         # actions (size probe + solve); without this the upstream DAG
         # (LSH blocking over all mentions) recomputes per action.
         .localCheckpoint(eager=True))

    # Local fast path decides on the RAW edge count (an upper bound of
    # the deduped count) and collects raw pairs — union-find dedups and
    # symmetrizes implicitly, so the shuffle-heavy distinct/symmetrize
    # below is skipped entirely for small graphs.
    n_raw = e.count()
    if n_raw <= local_solve_max_edges:
        spark = edges.sparkSession
        pairs = [(r.src, r.dst) for r in e.collect()]
        return spark.createDataFrame(_local_union_find(pairs),
                                     "node bigint, component bigint")

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
        # pointer-jump: component <- label(component). Contracts chains
        # doubly fast (the large-star idea), so rounds ~ log2(diameter).
        jump = new_labels.select(F.col("node").alias("jnode"),
                                 F.col("component").alias("jcomp"))
        new_labels = (new_labels
                      .join(jump, new_labels.component == jump.jnode,
                            "left")
                      .select("node",
                              F.least("component",
                                      F.coalesce("jcomp", "component"))
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
