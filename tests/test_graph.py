"""PageRank numpy-oracle parity + degree sanity for the graph wave."""

from __future__ import annotations

import numpy as np

from sparkit_learn_spark.registry import all_queries


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    """operators/graph.pagerank == explicit numpy power iteration on
    the same (deterministic, exact-Jaccard) edge set."""
    pairs = all_queries()["q_llm_ngram_jaccard"](spark, sf_dir).toPandas()
    edges = set()
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        edges.add((int(a), int(b)))
        edges.add((int(b), int(a)))
    nodes = sorted({a for a, _ in edges})
    assert nodes, "fixture must contain near-dup pairs"
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in edges:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        inflow = np.zeros(n)
        for a, b in edges:
            inflow[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1 - 0.85) / n + 0.85 * inflow

    got = all_queries()["q_graph_pagerank"](spark, sf_dir).toPandas()
    assert len(got) == n
    for doc, rank in zip(got["doc_id"], got["rank"]):
        assert abs(rank - r[idx[int(doc)]]) < 1e-6, doc
    # ranks form a distribution
    assert abs(got["rank"].sum() - 1.0) < 1e-3


def test_degree_consistent_with_pairs(spark, sf_dir):
    pairs = all_queries()["q_llm_ngram_jaccard"](spark, sf_dir).toPandas()
    deg = all_queries()["q_graph_degree"](spark, sf_dir).toPandas()
    assert deg["degree"].sum() == 2 * len(pairs)


def test_kcore_is_fixpoint_and_nested(spark, sf_dir):
    """The 8-round peel q_graph_kcore reports is a true fixpoint on
    the fixture graph (a python reference peel converges in < 8
    rounds to the same core sizes), and the 3-core nests inside the
    2-core."""
    pairs = all_queries()["q_llm_ngram_jaccard"](spark, sf_dir).toPandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))

    def peel(k: int) -> set[int]:
        alive = set(adj)
        rounds = 0
        while True:
            nxt = {u for u in alive if len(adj[u] & alive) >= k}
            rounds += 1
            if nxt == alive:
                break
            alive = nxt
        assert rounds <= 8, f"peel needed {rounds} rounds (> unroll bound)"
        return alive

    got = (
        all_queries()["q_graph_kcore"](spark, sf_dir)
        .toPandas()
        .set_index("k")
    )
    cores = {k: peel(k) for k in (2, 3)}
    assert cores[3] <= cores[2]
    for k in (2, 3):
        assert got.loc[k, "n_nodes"] == len(cores[k])
        n_edges = sum(len(adj[u] & cores[k]) for u in cores[k]) // 2
        assert got.loc[k, "n_edges"] == n_edges


def test_bounded_union_find_matches_distributed_cc(spark, sf_dir):
    """connected_components_bounded (driver union-find for
    dimension-bounded graphs) must label exactly like the distributed
    min-label operator on the same edge list."""
    from pyspark.sql import functions as F

    from sparkit_learn_spark.operators.components import (
        connected_components,
        connected_components_bounded,
    )
    from sparkit_learn_spark.queries.llm_pipeline2 import q_llm_ngram_jaccard

    pairs = q_llm_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    a = {(r["node"], r["comp"]) for r in connected_components(pairs).collect()}
    b = {(r["node"], r["comp"])
         for r in connected_components_bounded(pairs).collect()}
    assert a == b and len(a) > 0


def test_bounded_union_find_rejects_oversize(spark):
    import pytest as _pytest

    from sparkit_learn_spark.operators.components import (
        connected_components_bounded,
    )

    edges = spark.range(10).selectExpr("id AS src", "id + 1 AS dst")
    with _pytest.raises(ValueError):
        connected_components_bounded(edges, limit=5)


def test_bounded_union_find_empty_graph(spark):
    """An empty edge list must return an empty (node, comp) frame —
    matching connected_components — not crash on schema inference
    (ADVICE r6: createDataFrame([]) cannot infer a schema)."""
    from pyspark.sql import functions as F

    from sparkit_learn_spark.operators.components import (
        connected_components_bounded,
    )

    empty = spark.range(0).select(
        F.col("id").alias("src"), F.col("id").alias("dst")
    )
    out = connected_components_bounded(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "comp"]
