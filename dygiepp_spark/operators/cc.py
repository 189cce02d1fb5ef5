"""Connected components as a bounded DataFrame loop.

SURVEY.md §4.3: no GraphFrames jar in the sandbox, so canonicalization
runs min-label propagation over the edge list — each iteration is one
shuffle (join + min-agg), `localCheckpoint()` truncates lineage so the
plan doesn't grow, and the loop exits on convergence (0 label changes)
or `CC_MAX_ITERS`.

Two paths, identical output (tested against each other and a
reference union-find):

- small graphs (<= `local_solve_max_edges` raw edges): driver-side
  union-find — bounded memory, strictly faster than any shuffle
  round-trip;
- large graphs: alternating large-star / small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — the GraphFrames-style algorithm), two shuffle passes per
  round, converging in O(log n) rounds independent of graph diameter
  (plain label propagation needs diameter rounds).
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
                         local_solve_max_edges: int = LOCAL_SOLVE_MAX_EDGES,
                         stats: dict | None = None) -> DataFrame:
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
    if stats is not None:
        stats["n_raw_edges"] = n_raw
    if n_raw <= local_solve_max_edges:
        import pandas as pd
        spark = edges.sparkSession
        # toPandas/createDataFrame(pandas) ride Arrow — an order of
        # magnitude cheaper than row-wise pickling at this size
        epdf = e.toPandas()
        pairs = list(zip(epdf["src"].astype("int64"),
                         epdf["dst"].astype("int64")))
        solved = _local_union_find(pairs)
        out = pd.DataFrame(solved, columns=["node", "component"],
                           dtype="int64")
        if stats is not None:
            stats["path"] = "local_union_find"
        # explicit schema: pandas inference rejects the empty-graph
        # case (0 edges -> 0 rows), which is a legal input here
        return spark.createDataFrame(out,
                                     "node bigint, component bigint")

    if stats is not None:
        stats["path"] = "star_contraction"
    return _star_contraction(e, max_iters, stats=stats)


def cc_incremental(assign: DataFrame, new_edges: DataFrame,
                   max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """Merge a NEW batch of edges into an existing component
    assignment — the steady-state crawl shape for entity
    canonicalization (a fresh batch of mentions/near-dup edges arrives;
    recomputing CC over the full corpus graph would be O(log n) shuffle
    rounds over ALL edges, this is O(batch) + two corpus passes).

    assign: (node bigint, component bigint) with component == min node
    id reachable — exactly connected_components' output for the edges
    seen so far. new_edges: (src, dst), undirected. Returns the same
    contract over the UNION of old and new edges (invariant tested:
    == connected_components(all edges), and oracle-twinned against the
    recursive-CTE transitive closure in q_cc_incremental).

    Plan shape at scale:
    1. the batch's endpoint set (batch-sized, distinct) looks up its
       existing components with ONE join against corpus-scale `assign`
       (AQE broadcasts the batch side); unseen nodes stand for
       themselves.
    2. new edges are mapped endpoint->component via the batch-sized
       lookup (broadcast), giving a COMPONENT-level edge list of size
       O(batch); connected_components solves it (the small-graph
       union-find path in the common case).
    3. the relabel map (old component -> merged root, only where they
       differ — at most 2x batch rows) is broadcast into ONE pass over
       `assign`. Nothing corpus-scale is ever shuffled.
    Component ids stay min-node-ids: the merged root is the min of the
    merged components' ids, each of which is its component's min."""
    a = assign.select(F.col("node").cast("bigint").alias("node"),
                      F.col("component").cast("bigint")
                      .alias("component"))
    e = (new_edges.select(F.col("src").cast("bigint").alias("src"),
                          F.col("dst").cast("bigint").alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()))

    ends = (e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct())
    touched = (ends.join(a, "node", "left")
               .select("node", F.coalesce("component", "node")
                       .alias("component"))
               .localCheckpoint(eager=True))

    comp_edges = (
        e.join(F.broadcast(touched.select(
            F.col("node").alias("src"), F.col("component").alias("cs"))),
            "src")
        .join(F.broadcast(touched.select(
            F.col("node").alias("dst"), F.col("component").alias("cd"))),
            "dst")
        .select(F.col("cs").alias("src"), F.col("cd").alias("dst")))
    merged = connected_components(comp_edges, max_iters=max_iters)
    relabel = (merged.filter(F.col("node") != F.col("component"))
               .select(F.col("node").alias("component"),
                       F.col("component").alias("new_comp")))

    # full pre-merge assignment: the corpus rows + first-seen nodes
    base = a.unionByName(
        touched.join(a, "node", "left_anti")
        .select("node", F.col("node").alias("component")))
    return (base.join(F.broadcast(relabel), "component", "left")
            .select("node", F.coalesce("new_comp", "component")
                    .alias("component")))


def _star_contraction(e: DataFrame, max_rounds: int,
                      stats: dict | None = None) -> DataFrame:
    """Distributed CC via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14 — public algorithm). Each round is two
    (groupBy-min + join) passes; the edge set converges to disjoint
    stars whose centers are the component minima in O(log n) rounds —
    independent of graph diameter, unlike plain label propagation.

    large-star(u): link every neighbor v > u to m = min(N(u) ∪ {u})
    small-star(u): operate on edges oriented v ≤ u; link every such
                   neighbor (and u) to m.
    """
    spark = e.sparkSession
    # node inventory up front (contraction loses isolated self-loops)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))

    edges = (e.filter(F.col("src") != F.col("dst"))
             .select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
             .distinct())

    n_edges = edges.count()
    # 500k edges/partition sizes the top end for memory; do NOT floor
    # it at cluster parallelism for small graphs — measured on the
    # sf0.1 mention graph (193k edges), forcing 32 partitions through
    # the round loop was 3x SLOWER (80s vs 27s): each round became
    # dozens of overhead-dominated micro-tasks that AQE's coalescing
    # was already sizing correctly. At real scale the quotient itself
    # exceeds any cluster's parallelism, so the floor would be inert
    # exactly where it is safe and harmful exactly where it binds.
    n_parts = max(1, min(int(n_edges // 500_000) + 1, 2048))
    edges = edges.repartition(n_parts, "a").localCheckpoint(eager=True)

    def _min_star(df: DataFrame, center: str, nbr: str,
                  keep_gt: bool) -> DataFrame:
        """One star phase. df has undirected pairs (a<=b as (a,b));
        center/nbr select the orientation. Emits (neighbor, m)."""
        # neighborhood view: center u with neighbors v (both directions)
        nbrs = (df.select(F.col("a").alias("u"), F.col("b").alias("v"))
                .unionByName(df.select(F.col("b").alias("u"),
                                       F.col("a").alias("v"))))
        mins = (nbrs.groupBy("u")
                .agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", F.col("u")).alias("m")))
        j = nbrs.join(mins, "u")
        if keep_gt:     # large-star: relink neighbors larger than u
            j = j.filter(F.col("v") > F.col("u"))
            out = j.select(F.col("v").alias("x"), F.col("m").alias("y"))
        else:           # small-star: relink neighbors <= u, plus u
            smaller = (j.filter(F.col("v") <= F.col("u"))
                       .select(F.col("v").alias("x"),
                               F.col("m").alias("y")))
            self_link = mins.select(F.col("u").alias("x"),
                                    F.col("m").alias("y"))
            out = smaller.unionByName(self_link)
        return (out.filter(F.col("x") != F.col("y"))
                .select(F.least("x", "y").alias("a"),
                        F.greatest("x", "y").alias("b"))
                .distinct())

    converged = False
    rounds = 0
    n_prev = n_edges
    for rounds in range(1, max_rounds + 1):
        after_large = _min_star(edges, "a", "b", keep_gt=True)
        after_small = _min_star(after_large, "a", "b", keep_gt=False)
        after_small = (after_small.repartition(n_parts, "a")
                       .localCheckpoint(eager=True))
        # Convergence = the canonical (distinct, a<=b) edge set is
        # unchanged. The exact check is a symmetric-difference shuffle
        # over BOTH sets — corpus-scale in early rounds — but equal
        # cardinality is a necessary condition, and counting the
        # just-checkpointed set is a shuffle-free job. So gate the
        # exact check on count equality: early rounds (counts still
        # moving) skip the expensive job entirely; exactness is
        # preserved because the delta check still decides convergence.
        n_cur = after_small.count()
        if n_cur == n_prev:
            delta = (after_small.unionByName(edges)
                     .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
                     .filter(F.col("c") == 1).limit(1).count())
            if delta == 0:
                converged = True
        edges = after_small
        n_prev = n_cur
        if converged:
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        # deriving labels from an unconverged edge set can mislabel
        # components on adversarial/deep graphs — never do it silently
        import warnings
        warnings.warn(
            f"connected_components: star contraction did NOT converge "
            f"within max_rounds={max_rounds}; component labels may be "
            f"incorrect — raise CC_MAX_ITERS (O(log n) rounds expected)",
            RuntimeWarning, stacklevel=2)

    # stars: every edge (a,b) with a = component min of b
    membership = (edges.select(F.col("b").alias("node"),
                               F.col("a").alias("component")))
    # nodes may appear with several stars mid-convergence; take min
    labels = (membership.groupBy("node")
              .agg(F.min("component").alias("component")))
    return (nodes.join(labels, "node", "left")
            .select("node",
                    F.coalesce("component", F.col("node"))
                    .alias("component")))
