"""twin_quotient (operators/graph.py) and the analytic triangle
expansion (queries/graph_q._twin_triangle_counts) against brute force
on constructed graphs — including the duplicate-clique shape the scale
fixture manufactures, which is exactly where the raw edge-edge join
blows up.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from sparkit_learn_spark.operators.graph import twin_quotient
from sparkit_learn_spark.queries.graph_q import _twin_triangle_counts


def _spark_edges(spark, edges):
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    return spark.createDataFrame(sorted(set(sym)), "src long, dst long")


def _brute_triangles(edges):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for u in adj:
        t = sum(1 for v, w in combinations(sorted(adj[u]), 2)
                if w in adj[v])
        out[u] = t
    return out


def _rewrite_triangles(spark, edges):
    sym = _spark_edges(spark, edges)
    member, sizes, qedges = twin_quotient(sym)
    tri = _twin_triangle_counts(sizes, qedges)
    rows = member.join(tri, "gid").select("node", "t").collect()
    return {r["node"]: r["t"] for r in rows}


CASES = {
    # two 4-cliques bridged by one edge + a pendant node
    "bridged_cliques": (
        [(a, b) for a, b in combinations([0, 1, 2, 3], 2)]
        + [(a, b) for a, b in combinations([10, 11, 12, 13], 2)]
        + [(3, 10), (13, 20)]
    ),
    # replica-clique shape: 3 "documents", each duplicated 4x; dup
    # groups of near-dup docs fully cross-connected (the sf10 shape)
    "replica_cliques": (
        [(a, b) for a, b in combinations(range(0, 4), 2)]
        + [(a, b) for a, b in combinations(range(10, 14), 2)]
        + [(a, b) for a, b in combinations(range(20, 24), 2)]
        + [(a, b) for a in range(0, 4) for b in range(10, 14)]
        + [(a, b) for a in range(10, 14) for b in range(20, 24)]
    ),
    # path + square: no twins at all (quotient == original)
    "twinless": [(0, 1), (1, 2), (2, 3), (3, 4), (4, 1)],
    "single_clique": [(a, b) for a, b in combinations(range(6), 2)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_twin_triangles_match_brute_force(spark, name):
    edges = CASES[name]
    assert _rewrite_triangles(spark, edges) == _brute_triangles(edges)


def test_twin_quotient_collapses_exactly_the_true_twins(spark):
    edges = CASES["replica_cliques"]
    member, sizes, qedges = twin_quotient(_spark_edges(spark, edges))
    groups = {}
    for r in member.collect():
        groups.setdefault(r["gid"], set()).add(r["node"])
    # docs 0-3 are mutual twins; 20-23 likewise; 10-13 likewise
    assert set(map(frozenset, groups.values())) == {
        frozenset(range(0, 4)), frozenset(range(10, 14)),
        frozenset(range(20, 24))}
    # quotient: path of 3 groups, 2 symmetric edges
    assert qedges.count() == 4
    # twinless graphs collapse to nothing
    m2, s2, q2 = twin_quotient(_spark_edges(spark, CASES["twinless"]))
    assert s2.filter(F.col("gsz") > 1).count() == 0


def _brute_degrees(edges):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {u: len(vs) for u, vs in adj.items()}


@pytest.mark.parametrize("name", sorted(CASES))
def test_twin_degrees_match_brute_force(spark, name):
    from sparkit_learn_spark.operators.graph import twin_degrees

    edges = CASES[name]
    sym = _spark_edges(spark, edges)
    member, sizes, qedges = twin_quotient(sym)
    rows = member.join(twin_degrees(sizes, qedges), "gid") \
        .select("node", "degree").collect()
    assert {r["node"]: r["degree"] for r in rows} == _brute_degrees(edges)


@pytest.mark.parametrize("name", sorted(CASES))
def test_quotient_assortativity_moments_match_brute_force(spark, name):
    """The quotient-grain Pearson moment expansion used by
    q_graph_assortativity (wave30) equals the raw sym-edge sums."""
    from sparkit_learn_spark.operators.graph import twin_degrees

    edges = CASES[name]
    deg = _brute_degrees(edges)
    sym_pairs = sorted(set(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges]))
    want = (
        len(sym_pairs),
        sum(deg[a] for a, _ in sym_pairs),
        sum(deg[a] * deg[b] for a, b in sym_pairs),
        sum(deg[a] * deg[a] for a, _ in sym_pairs),
    )
    sym = _spark_edges(spark, edges)
    _member, sizes, qedges = twin_quotient(sym)
    degg = twin_degrees(sizes, qedges)
    intra = degg.select(
        (F.col("gsz") * (F.col("gsz") - 1)).cast("long").alias("w"),
        F.col("degree").alias("x"), F.col("degree").alias("y"))
    da = degg.select(F.col("gid").alias("src"), F.col("gsz").alias("sza"),
                     F.col("degree").alias("dxa"))
    db = degg.select(F.col("gid").alias("dst"), F.col("gsz").alias("szb"),
                     F.col("degree").alias("dyb"))
    cross = (qedges.join(da, "src").join(db, "dst")
             .select((F.col("sza") * F.col("szb")).cast("long").alias("w"),
                     F.col("dxa").alias("x"), F.col("dyb").alias("y")))
    m = intra.unionAll(cross).agg(
        F.sum("w").alias("m2"),
        F.sum(F.col("w") * F.col("x")).alias("sx"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]
    assert (m["m2"], m["sx"], m["sxy"], m["sxx"]) == want
