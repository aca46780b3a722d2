"""Round-8 property tests (hypothesis): the new distributed operators
— global row numbering, label propagation, HITS — obey their local
oracles on RANDOM graphs/tables, not just the fixtures. Same example
budget discipline as test_properties.py.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    n_parts=st.integers(1, 6),
)
def test_global_row_number_matches_window(spark, vals, n_parts):
    """Distributed two-pass ranking == SinglePartition window on any
    total order (id tiebreak makes duplicated vals a total order)."""
    from sparkit_learn_spark.operators.ranking import global_row_number

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = global_row_number(
        df, ["v", "id"], name="rn", num_partitions=n_parts
    ).toPandas().sort_values("id")
    exp = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))
    ).toPandas().sort_values("id")
    assert list(got["rn"]) == list(exp["rn"])


def _lp_local(edges: list[tuple[int, int]], n_iter: int) -> dict[int, int]:
    """Synchronous mode-label propagation, min tiebreak."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[lbl[m]] = counts.get(lbl[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lbl = new
    return lbl


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25))
        .filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=35,
    ),
    n_iter=st.integers(1, 3),
)
def test_label_propagation_matches_local(spark, edges, n_iter):
    from sparkit_learn_spark.operators.graph import label_propagation

    # symmetric, deduplicated edge list (multi-edges would change the
    # neighbor-label counts; the operator contract is a simple graph)
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    df = spark.createDataFrame(sorted(sym), "src long, dst long")
    got = {r["node"]: r["lbl"]
           for r in label_propagation(df, n_iter=n_iter).collect()}
    assert got == _lp_local(sorted(sym), n_iter)


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(100, 112)),
        min_size=1,
        max_size=30,
    ),
)
def test_hits_matches_numpy_on_random_bipartite(spark, edges):
    from sparkit_learn_spark.operators.graph import hits

    dedup = sorted(set(edges))
    df = spark.createDataFrame(dedup, "src long, dst long")
    hubs = sorted({s for s, _ in dedup})
    auths = sorted({d for _, d in dedup})
    hi = {n: i for i, n in enumerate(hubs)}
    ai = {n: i for i, n in enumerate(auths)}
    h = np.ones(len(hubs))
    a = np.zeros(len(auths))
    for _ in range(3):
        a[:] = 0.0
        for s, d in dedup:
            a[ai[d]] += h[hi[s]]
        h[:] = 0.0
        for s, d in dedup:
            h[hi[s]] += a[ai[d]]
    a /= a.max()
    h /= h.max()

    got = hits(df, n_iter=3, checkpoint_every=3).toPandas()
    gh = got[got["side"] == "hub"].set_index("node")["score"]
    ga = got[got["side"] == "auth"].set_index("node")["score"]
    for n in hubs:
        assert abs(gh[n] - h[hi[n]]) < 1e-9
    for n in auths:
        assert abs(ga[n] - a[ai[n]]) < 1e-9
