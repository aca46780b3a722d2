"""HITS numpy-oracle parity (wave 134's float fixpoint, the same
contract pagerank carries in test_graph.py): operators/graph.hits on
the bipartite customer→part purchase graph must match an explicit
numpy replica of the max-normalized mutual-reinforcement iteration.
"""

from __future__ import annotations

import numpy as np

from sparkit_learn_spark.operators.graph import hits
from sparkit_learn_spark.registry import all_queries


def _purchase_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from sparkit_learn_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"),
                F.col("l_partkey").alias("dst"))
        .distinct()
    )


def test_hits_matches_numpy(spark, sf_dir):
    edges_df = _purchase_edges(spark, sf_dir)
    pdf = edges_df.toPandas()
    edges = list(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    assert edges
    hubs = sorted({s for s, _ in edges})
    auths = sorted({d for _, d in edges})
    hi = {n: i for i, n in enumerate(hubs)}
    ai = {n: i for i, n in enumerate(auths)}

    # replicate the operator's scheme exactly: NO per-iteration
    # normalization, one max-normalization per side at the end
    h = np.ones(len(hubs))
    a = np.zeros(len(auths))
    for _ in range(5):
        a[:] = 0.0
        for s, d in edges:
            a[ai[d]] += h[hi[s]]
        h[:] = 0.0
        for s, d in edges:
            h[hi[s]] += a[ai[d]]
    a /= a.max()
    h /= h.max()

    got = hits(edges_df, n_iter=5).toPandas()
    got_h = got[got["side"] == "hub"].set_index("node")["score"]
    got_a = got[got["side"] == "auth"].set_index("node")["score"]
    assert len(got_h) == len(hubs) and len(got_a) == len(auths)
    for n in hubs:
        assert abs(got_h[n] - h[hi[n]]) < 1e-9, ("hub", n)
    for n in auths:
        assert abs(got_a[n] - a[ai[n]]) < 1e-9, ("auth", n)
    # max-normalization contract: each side tops out at exactly 1.0
    assert abs(got_h.max() - 1.0) < 1e-12
    assert abs(got_a.max() - 1.0) < 1e-12


def test_hits_query_is_top_authorities(spark, sf_dir):
    got = all_queries()["q_graph_hits"](spark, sf_dir).toPandas()
    assert 1 <= len(got) <= 15
    assert list(got.columns) == ["part_id", "authority"]
    # descending, and the strongest authority is the normalized max
    assert (got["authority"].values[:-1] >= got["authority"].values[1:]).all()
    assert abs(got["authority"].iloc[0] - 1.0) < 1e-9
