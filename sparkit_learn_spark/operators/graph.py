"""Iterative graph algorithms on DataFrames (round 6): PageRank.

Complements operators/components.py (connected components via
min-label propagation) with the other canonical iterative-join
algorithm. Same execution discipline: each iteration is one
(edges ⋈ ranks) shuffle + one aggregation, the loop runs a FIXED
number of plan-bounded iterations, superseded localCheckpoints are
unpersisted (the operators/ids.py pattern), and per-iteration driver
involvement is zero.

Scale: the rank table is node-grain, the join shuffles edge-grain —
exactly the web-scale PageRank shape; at 100 TB pre-partition edges
and ranks by src so every iteration reuses the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, n_iter: int = 10,
             checkpoint_every: int = 3) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge contributes
    both directions, so no dangling nodes exist among edge-touched
    nodes — isolated nodes are out of scope by construction).

    Returns (node, rank) with ranks summing to ~1. Deterministic:
    initialization and updates are pure aggregations.
    """
    # materialize the symmetric edge list ONCE: every iteration joins
    # it, and without this the (possibly expensive) upstream lineage —
    # e.g. the exact-Jaccard candidate-verify pipeline — would re-run
    # per iteration (measured: 17.7 s -> 2.5 s at sf0.1 for the
    # near-dup graph). Released before return.
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint(eager=True)
    nodes = both.select(F.col("a").alias("node")).distinct()
    n = nodes.count()  # one scalar to the driver; node table stays distributed
    out_deg = both.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    prev = None
    base = (1.0 - damping) / n
    for i in range(n_iter):
        contribs = (
            both.join(ranks, both.a == ranks.node)
            .join(out_deg, ranks.node == out_deg.node)
            .select(F.col("b").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + damping * F.coalesce("inflow", F.lit(0.0)))
            .alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            prev, ranks = ranks, new_ranks.localCheckpoint(eager=True)
            prev.unpersist()  # keep ONE checkpoint pinned, not n_iter/3
        else:
            ranks = new_ranks
    both.unpersist()  # final ranks are checkpointed; edge blocks free
    return ranks
