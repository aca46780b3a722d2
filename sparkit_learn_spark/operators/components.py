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

At extreme diameters (chain-shaped graphs) plain propagation needs
diameter rounds; when it fails to converge within ``max_iter`` the
module automatically switches to the alternating small-star /
large-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which converges in O(log² n) rounds using the
same join+min primitives. Plain propagation stays the default fast
path because dedup-cluster diameters are small and each of its rounds
is cheaper (one join instead of two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(edges: DataFrame, *, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """Component labels (node, comp) for the undirected graph given as
    an edge list; comp = the smallest node id in the component.

    Nodes are those appearing in ≥1 edge (callers union in singletons
    if they need every entity labeled). If propagation has not
    converged after ``max_iter`` rounds (diameter > max_iter, i.e. a
    chain-shaped graph), automatically falls back to the small-star/
    large-star algorithm, which needs O(log² n) rounds regardless of
    diameter.
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
    # convergence via sum(comp): min-label propagation is MONOTONE
    # (a node's label can only decrease), so the label-sum strictly
    # decreases until the fixed point — an unchanged sum IS
    # convergence. One aggregate job per round instead of the
    # join-and-compare the first implementation used (~40% of each
    # round's cost on small graphs).
    # decimal(38,0) accumulation: a long sum could wrap at ~10^9
    # nodes x 10^9-sized ids and a wrapped sum could alias an
    # unchanged one; decimal keeps the monotone-sum test exact
    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
        )
        labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        new_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    # Diameter exceeded max_iter: the graph is chain-shaped, where
    # per-round propagation moves labels only one hop. Fall back to
    # the O(log² n)-round star algorithm instead of failing.
    return _star_components(sym)


def _star_components(sym: DataFrame, *, max_rounds: int = 50) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., MR-CC): each round is two join+min-aggregate passes that
    re-point every node at the minimum of its neighborhood, halving
    tree heights geometrically — O(log² n) rounds for ANY diameter.

    Edges are kept normalized child > parent. No collect_set / no
    per-node adjacency materialization: neighborhood minima come from
    a groupBy aggregate, so a high-degree hub costs one skewed-but-
    combinable min, never a giant array.
    """

    def large_star(e: DataFrame) -> DataFrame:
        # Γ(u) over BOTH directions; link larger neighbors v>u to
        # m = min(Γ(u) ∪ {u})
        both = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (both.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m")))
        return (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # edges already child>parent; link all smaller neighbors and u
        # itself to m = min(parents ∪ {u})
        mins = (e.groupBy("u").agg(F.min("v").alias("m")))
        relink = (
            e.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = mins.select("u", F.col("m").alias("v"))
        return (
            relink.union(self_edge)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    edges = (
        sym.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        stable = (
            new_edges.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(new_edges).limit(1).count() == 0
        )
        edges = new_edges
        if stable:
            break
    else:
        raise RuntimeError(f"star algorithm not converged in {max_rounds} rounds")
    # converged: every edge points a node directly at its component
    # minimum; re-add the roots (and any isolated original nodes,
    # which only ever appear as their own root) as self-labeled
    children = edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    roots = (
        sym.select(F.col("a").alias("node")).distinct()
        .join(children.select("node"), "node", "left_anti")
        .withColumn("comp", F.col("node"))
    )
    return children.union(roots)


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


def connected_components_bounded(edges: DataFrame, *, src: str = "src",
                                 dst: str = "dst",
                                 limit: int = 200_000) -> DataFrame:
    """Driver-side union-find for DIMENSION-BOUNDED graphs — graphs
    whose size is bounded by a value domain (grid cells, categories,
    calendar buckets), not by the fact-row count. The iterative
    min-label loop needs diameter rounds (a 100-cell-wide grid blob =
    100 rounds, then the O(log² n) star fallback); union-find closes
    the same graph in one bounded collect + O(E·α) driver work and a
    single createDataFrame back. Raises if the edge list exceeds
    ``limit`` — the guard that keeps this operator off fact-sized
    graphs, where :func:`connected_components` is the right tool.

    Labels match connected_components exactly: comp = the smallest
    node id in the component.
    """
    rows = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct().collect()
    if len(rows) > limit:
        raise ValueError(
            f"connected_components_bounded: {len(rows)} edges exceeds the "
            f"declared bound {limit}; use connected_components instead"
        )
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["a"], r["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in parent}
    spark = edges.sparkSession
    # Explicit schema (node type = the input's src type): an empty
    # edge list must return an empty (node, comp) frame like
    # connected_components does, and createDataFrame cannot infer a
    # schema from zero rows (ADVICE r6).
    node_type = edges.schema[src].dataType
    schema = T.StructType([
        T.StructField("node", node_type),
        T.StructField("comp", node_type),
    ])
    return spark.createDataFrame(
        [(n, c) for n, c in comp.items()], schema
    )
