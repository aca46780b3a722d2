"""ArrayTable/DictTable (splearn blocked-API facade) vs numpy oracle —
the reference's own test style [SURVEY §5.1]: same data locally and
distributed, assert almost-equal.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.compat import ArrayTable, DictTable, block


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def X(emb):
    pdf = emb.orderBy("vec_id").select("embedding").toPandas()
    return np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])


def test_shape_count_first(emb, X):
    at = block(emb.orderBy("vec_id"), "embedding")
    assert at.shape == X.shape
    assert at.ndim == 2
    assert at.count() == len(X)
    np.testing.assert_allclose(at.first(), X[0])
    assert at.blocks == at.getNumPartitions() >= 1


def test_collect_and_unblock(emb, X):
    at = ArrayTable(emb.orderBy("vec_id"), "embedding")
    np.testing.assert_allclose(at.collect(), X)
    assert at.unblock() is at.df  # blocking is structural, not physical


def test_sum_mean_match_numpy(emb, X):
    at = ArrayTable(emb, "embedding")
    assert at.sum() == pytest.approx(X.sum(), rel=1e-9)
    np.testing.assert_allclose(at.sum(axis=0), X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(at.mean(axis=0), X.mean(axis=0), rtol=1e-9)
    assert at.mean() == pytest.approx(X.mean() * X.shape[1], rel=1e-9)


def test_dot_matches_numpy(emb, X):
    rng = np.random.default_rng(42)
    A = rng.normal(size=(X.shape[1], 3))
    at = ArrayTable(emb.orderBy("vec_id"), "embedding")
    got = at.dot(A).collect()
    np.testing.assert_allclose(got, X @ A, rtol=1e-9)


def test_transform_blockwise(emb, X):
    at = ArrayTable(emb.orderBy("vec_id"), "embedding")
    got = at.transform(lambda b: b * 2.0 + 1.0).collect()
    np.testing.assert_allclose(got, X * 2.0 + 1.0, rtol=1e-9)


def test_row_slice(emb, X):
    at = ArrayTable(emb.orderBy("vec_id"), "embedding")
    np.testing.assert_allclose(at[5:12].collect(), X[5:12])
    np.testing.assert_allclose(at[:3].collect(), X[:3])
    with pytest.raises(TypeError):
        at[::2]
    with pytest.raises(ValueError):
        at[-3:]


def test_dict_table_projection_and_transform(emb, X):
    dt = DictTable(emb.orderBy("vec_id"), ["vec_id", "embedding", "label"])
    assert dt.count() == len(X)
    np.testing.assert_allclose(dt[:, "embedding"].collect(), X)
    with pytest.raises(KeyError):
        dt.get("nope")
    out = dt.transform(lambda b: b - b.mean(axis=1, keepdims=True), "embedding")
    # other columns stay row-aligned with the transformed one
    pdf = out.df.orderBy("vec_id").toPandas()
    orig = emb.orderBy("vec_id").select("vec_id", "label").toPandas()
    assert (pdf["vec_id"] == orig["vec_id"]).all()
    assert (pdf["label"] == orig["label"]).all()
    got = np.array([np.asarray(v) for v in pdf["embedding"]])
    np.testing.assert_allclose(
        got, X - X.mean(axis=1, keepdims=True), rtol=1e-7, atol=1e-7
    )


def test_estimator_composes_with_facade(emb, X):
    """The migration story end-to-end: facade ops feeding an
    estimator — center the embeddings block-wise through the facade,
    then fit the incremental SGD classifier on the transformed df."""
    from sparkit_learn_spark.ml import SparkSGDClassifier

    centered = ArrayTable(
        emb.select(F.col("embedding").alias("features"),
                   (F.col("label") < 5).cast("double").alias("y")),
        "features",
    )
    clf = SparkSGDClassifier(featuresCol="features", labelCol="y",
                             lr=0.5, epochs=2)
    clf.fit(centered.df)
    assert clf.n_iter_ == 2 and clf.coef_ is not None
