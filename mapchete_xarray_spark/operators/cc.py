"""Connected components over near-duplicate pair graphs — the
clustering stage a real dedup pipeline needs AFTER pair generation
(you don't ship a pair list; you pick one survivor per cluster).

Algorithm: the alternating large-star / small-star method of Kiveris
et al., "Connected Components in MapReduce and Beyond" (SoCC 2014) —
the published shuffle-bounded CC algorithm for exactly this setting
(edge sets too big for any single machine, O(log^2 n) rounds in the
worst case, 2-3 rounds on the clique-heavy graphs near-dup pairs
actually produce).  Label-propagation-until-fixpoint would take
O(diameter) rounds with a full edge shuffle each; GraphFrames is a
jar this sandbox (and many clusters) don't carry.  Both star
operations are pure DataFrame ops:

    large-star: every node links its LARGER neighbors to the min of
        its neighborhood (incl. itself) — breaks high-degree nodes
        into stars without ever growing the min side;
    small-star: every node links its SMALLER-or-equal neighbors (and
        itself) to its min neighbor.

At a fixpoint every edge is (node → component-min): the component id
IS the minimum member id, a deterministic, join-free canonical label.

Scale notes (10^12 edges): each half-round is one hash aggregation
(partial-aggregable ``min`` — a hot node's partial mins combine
map-side, so degree skew never assembles a neighborhood in memory,
unlike ``collect_list`` formulations) plus one equi-join on the node
id and one ``distinct()``; all three hash-partition on the node id,
and AQE's skew-join splitting handles the residual hot-node join.
Per-round ``localCheckpoint`` truncates the logical plan — without it
the iteration re-derives every prior round (exponential plan growth),
the classic iterative-DataFrame trap.  On a real cluster prefer
``spark.sparkContext.setCheckpointDir`` + reliable ``checkpoint``;
localCheckpoint keeps blocks on executors, which is the right
trade-off for a single-app job and the only option on local[*].
KNOWN BOUND: PySpark exposes no API to free a localCheckpoint's
blocks early, so superseded rounds' edge copies stay in executor
storage until the driver GC + ContextCleaner collect them — worst
case O(rounds × edges) transient storage (edge counts shrink per
round toward n_nodes, so in practice ~2× the input).  A reliable
checkpoint dir sidesteps this entirely at cluster scale.

Reference analog: none in mapchete_xarray (the reference has no graph
stage); this is part of the training-data-pipeline surface, with
DuckDB recursive-CTE oracles in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dedup_edges(e: DataFrame) -> DataFrame:
    """Canonical undirected edge list: (u, v) with u < v, no dups, no
    self-loops."""
    return (
        e.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) undirected → for each node, link larger neighbors to the
    neighborhood min.  Works on the symmetric view so every node sees
    its full neighborhood."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = m.select("u", F.least("u", "mv").alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """(u,v) directed larger→smaller → for each node, link its
    smaller-or-equal neighbors and itself to its min neighbor."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    link_neighbors = d.join(m, "u").select(F.col("v").alias("u"), "m")
    link_self = m.select(F.col("u"), "m")
    return (
        link_neighbors.unionByName(link_self)
        .where(F.col("u") != F.col("m"))
        .select("u", F.col("m").alias("v"))
    )


def _edge_digest(e: DataFrame):
    """(count, order-independent xor-hash) — the convergence check.
    One aggregation job; xor over a 64-bit hash makes set equality a
    two-long compare (collision probability ~2^-64 per round)."""
    row = e.agg(
        F.count("*").alias("n"),
        # bit_xor is partial-aggregable (map-side combine), so the
        # digest never assembles the edge set anywhere
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return row.n, row.h


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """→ (id, component): every node of ``edges``, labeled with the
    MINIMUM node id of its connected component (a deterministic
    canonical label — no tie-breaking policy to document).

    Nodes not present in any edge are absent from the result (the
    caller left-joins its node universe and coalesces to self — see
    ``queries.near_dup_components``).  Raises if the alternating
    iteration hasn't converged after ``max_iterations`` rounds
    (log^2-bounded; 25 covers any graph this engine can hold)."""
    e = _dedup_edges(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)
    prev = _edge_digest(e)
    for _ in range(max_iterations):
        e_next = _dedup_edges(_small_star(_large_star(e))).localCheckpoint(
            eager=True
        )
        cur = _edge_digest(e_next)
        e = e_next
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # fixpoint edges, canonicalized by _dedup_edges to (u=min, v=max),
    # are (component-min, member) stars: the root is the u side.  Roots
    # appear only as u — add their self-labels.
    members = e.select(F.col("v").alias("id"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.unionByName(roots)
