"""Distributed connected components — the pairs→clusters step that
finishes every dedup funnel (near-dup PAIRS are only half the job;
keep/drop decisions need CLUSTERS and a canonical representative).

Algorithm: iterative min-label propagation over the symmetrized edge
list. Each round every node adopts the smallest component id among
itself and its neighbors (one join + one min-aggregate — both
shuffle-partitioned by node, no driver state beyond the convergence
flag). Rounds needed = graph diameter, which for dedup graphs is tiny
(near-dup clusters are dense blobs, not chains). Lineage is truncated
every round with an eager localCheckpoint — without it the plan
doubles per iteration and the job graph explodes by round ~15.

At extreme diameters (10⁸-node chain graphs) the alternating
small-star/large-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") converges in O(log² n) rounds
with the same join+min primitive; this module keeps plain propagation
because dedup-cluster diameters are small and each round is cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, *, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """Component labels (node, comp) for the undirected graph given as
    an edge list; comp = the smallest node id in the component.

    Nodes are those appearing in ≥1 edge (callers union in singletons
    if they need every entity labeled). Raises RuntimeError if not
    converged within ``max_iter`` rounds (diameter > max_iter).
    """
    # checkpoint the symmetrized edges ONCE: the edge list may carry an
    # arbitrarily expensive upstream lineage (e.g. a whole dedup
    # pipeline) that would otherwise re-execute on EVERY propagation
    # round's join
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        ).distinct().localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
        )
        new_labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"not converged in {max_iter} rounds (diameter too large); "
                       "raise max_iter or switch to small-star/large-star")


def dedup_clusters(pairs: DataFrame, *, left: str = "doc_a",
                   right: str = "doc_b") -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, is_canonical): each doc
    labeled with its cluster's smallest doc id; the canonical doc (the
    one a keep-one-per-cluster policy retains) is the minimum itself."""
    comp = connected_components(pairs, src=left, dst=right)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
