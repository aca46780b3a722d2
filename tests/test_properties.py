"""Property-based tests (hypothesis): distributed operators obey the
same laws as trivial local oracles on RANDOM inputs, not just the
fixtures. Spark jobs are slow per example, so example counts are
deliberately small — the value is input-shape diversity (adversarial
small cases: empty, singletons, duplicates, chains), not volume.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# -- connected components vs local union-find ---------------------

def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from sparkit_learn_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_star_components_matches_union_find(spark, edges):
    """The fallback path must satisfy the same law as the fast path —
    exercised directly, not just when propagation times out."""
    from sparkit_learn_spark.operators.components import _star_components

    df = spark.createDataFrame(edges, "a long, b long")
    sym = df.union(df.select(F.col("b").alias("a"), F.col("a").alias("b")))
    got = {r["node"]: r["comp"] for r in _star_components(sym).collect()}
    assert got == _union_find_components(edges)


# -- sequence packing vs numpy prefix sum -------------------------

@SLOW
@given(
    weights=st.lists(st.integers(0, 600), min_size=1, max_size=60),
    budget=st.sampled_from([1, 7, 512]),
    n_parts=st.sampled_from([1, 3, 17]),
)
def test_pack_sequences_matches_numpy(spark, weights, budget, n_parts):
    from sparkit_learn_spark.operators.packing import pack_sequences

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(n_parts)
    got = (
        pack_sequences(df, budget=budget)
        .orderBy("doc_id")
        .toPandas()
    )
    w = np.array(weights, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(w)[:-1]])
    np.testing.assert_array_equal(got["start_offset"].to_numpy(), starts)
    np.testing.assert_array_equal(
        got["bin_id"].to_numpy(), np.floor_divide(starts, budget)
    )
    np.testing.assert_array_equal(
        got["bin_end"].to_numpy(), np.floor_divide(starts + w - 1, budget)
    )


# -- SparseTable laws vs numpy ------------------------------------

@SLOW
@given(
    data=st.data(),
    n=st.integers(1, 12),
    d=st.integers(1, 8),
    k=st.integers(1, 4),
)
def test_sparse_table_dot_and_sums(spark, data, n, d, k):
    from sparkit_learn_spark.compat import SparseTable

    X = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.sampled_from([0.0, 0.0, 1.0, -2.5, 3.25]),
                    min_size=d, max_size=d,
                ),
                min_size=n, max_size=n,
            )
        )
    )
    A = np.arange(d * k, dtype=np.float64).reshape(d, k) - d * k / 2
    st_ = SparseTable.from_dense(spark, X)
    if not np.count_nonzero(X):
        assert st_.nnz() == 0 and st_.sum() == 0.0
        return
    np.testing.assert_allclose(st_.sum(), X.sum())
    cols = st_.sum(axis=0)
    np.testing.assert_allclose(cols, X[:, : len(cols)].sum(axis=0))
    pdf = st_.dot(A).df.orderBy("row").toPandas()
    got = np.array([np.asarray(v) for v in pdf["features"]])
    rows_present = sorted({int(r) for r in pdf["row"]})
    np.testing.assert_allclose(got, (X @ A)[rows_present], rtol=1e-9)


# -- hash-deterministic resampling --------------------------------

@SLOW
@given(seed_docs=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True))
def test_fingerprint_uniformity_determinism(spark, seed_docs):
    """The md5-derived uniform used by resampling/sharding is a pure
    function of the id: same ids -> same u, any partitioning."""
    rows = [(i,) for i in seed_docs]
    u_expr = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
              .cast("long") / F.lit(65536.0))
    a = (spark.createDataFrame(rows, "doc_id long").repartition(1)
         .select("doc_id", u_expr.alias("u")).orderBy("doc_id").collect())
    b = (spark.createDataFrame(rows, "doc_id long").repartition(7)
         .select("doc_id", u_expr.alias("u")).orderBy("doc_id").collect())
    assert a == b
    assert all(0.0 <= r["u"] < 1.0 for r in a)
