"""sklearn-style estimator API tests (the splearn migration surface):
fit/transform contract, fitted attributes, and numeric agreement with
the relationally-verified query forms."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.ml import (
    SparkCountVectorizer,
    SparkGaussianNB,
    SparkGridSearchCV,
    SparkKMeans,
    SparkLogisticRegression,
    SparkPipeline,
    SparkStandardScaler,
    SparkTfidfTransformer,
    SparkPCA,
    SparkTruncatedSVD,
    SparkVarianceThreshold,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def vec(emb):
    return emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        (F.col("label") < 5).cast("double").alias("binlabel"),
    )


def test_count_vectorizer_and_params(docs):
    cv = SparkCountVectorizer()
    assert cv.get_params() == {"inputCol": "text", "idCol": "doc_id"}
    out = cv.fit(docs).transform(docs)
    vocab_size = cv.vocabulary_.count()
    assert out.select("term_id").distinct().count() <= vocab_size
    total_tf = out.agg(F.sum("tf")).first()[0]
    n_tokens = docs.select(F.explode(F.split("text", " "))).count()
    assert total_tf == n_tokens
    cv.set_params(inputCol="text")
    with pytest.raises(ValueError):
        cv.set_params(bogus=1)


def test_tfidf_pipeline_matches_query(spark, sf_dir, docs):
    from sparkit_learn_spark.registry import all_queries

    pipe = SparkPipeline([
        ("cv", SparkCountVectorizer()),
        ("tfidf", SparkTfidfTransformer()),
    ])
    got = (
        pipe.fit(docs).transform(docs)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"))
        .toPandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    expect = (
        all_queries()["q_ml_tfidf"](spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    assert (got["tfidf"] - expect["tfidf"]).abs().max() < 1e-6


def test_gaussian_nb_fit_predict(emb):
    nb = SparkGaussianNB()
    pred = nb.fit(emb).predict(emb)
    assert pred.count() == emb.count()
    # on its own training data a 10-class GNB should beat chance
    acc = (
        pred.join(emb, "vec_id")
        .filter(F.col("prediction") == F.col("label"))
        .count()
        / emb.count()
    )
    assert acc > 0.2


def test_logreg_coef_and_accuracy(vec):
    lr = SparkLogisticRegression(labelCol="binlabel", maxIter=50, regParam=0.01)
    pred = lr.fit(vec).predict(vec)
    assert lr.coef_.shape == (64,)
    acc = pred.filter(F.col("prediction") == F.col("binlabel")).count() / vec.count()
    assert acc >= 0.5


def test_kmeans_centers(vec):
    km = SparkKMeans(n_clusters=5)
    km.fit(vec)
    assert km.cluster_centers_.shape == (5, 64)


def test_truncated_svd_matches_numpy(emb):
    svd = SparkTruncatedSVD(n_components=4)
    svd.fit(emb)
    X = np.array([np.asarray(r["embedding"], np.float64) for r in emb.collect()])
    expect = np.linalg.svd(X, compute_uv=False)[:4]
    np.testing.assert_allclose(svd.singular_values_, expect, rtol=1e-6)
    proj = svd.transform(emb).first()["projection"]
    assert len(proj) == 4


def test_variance_threshold_support(emb):
    vt = SparkVarianceThreshold(threshold=0.015)
    support = vt.fit(emb).get_support()
    X = np.array([np.asarray(r["embedding"], np.float64) for r in emb.collect()])
    expect = sorted(np.where(X.var(axis=0, ddof=1) > 0.015)[0])
    assert support == [int(x) for x in expect]


def test_standard_scaler(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sc = SparkStandardScaler(inputCol="value")
    out = sc.fit(ev).transform(ev)
    row = out.agg(
        F.round(F.avg("value_scaled"), 6).alias("mu"),
        F.round(F.stddev_samp("value_scaled"), 6).alias("sigma"),
    ).first()
    assert abs(row["mu"]) < 1e-6
    assert abs(row["sigma"] - 1.0) < 1e-6


def test_grid_search_cv(vec):
    from pyspark.ml.classification import LogisticRegression

    gs = SparkGridSearchCV(
        estimator=LogisticRegression(featuresCol="features", labelCol="binlabel", maxIter=20),
        param_grid={"regParam": [0.01, 0.5]},
        evaluator=BinaryClassificationEvaluator(labelCol="binlabel"),
        numFolds=3,
    )
    gs.fit(vec)
    assert gs.best_params_["regParam"] in (0.01, 0.5)
    assert len(gs.cv_results_) == 2
    # best_params_ must agree with the model MLlib selected (argmax
    # here — AUC is larger-better); loss metrics take the argmin branch
    assert gs.best_params_["regParam"] == gs.model_.bestModel.getRegParam()


def test_grid_search_cv_loss_metric(spark, sf_dir):
    """RegressionEvaluator/RMSE is smaller-better: best_params_ must
    pick the argmin grid point, matching model.bestModel."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.regression import LinearRegression

    ev = load_table(spark, sf_dir, "events").limit(400)
    from pyspark.ml.feature import VectorAssembler

    data = VectorAssembler(
        inputCols=["user_id"], outputCol="features"
    ).transform(ev.select("user_id", F.col("value").alias("label")))
    gs = SparkGridSearchCV(
        estimator=LinearRegression(maxIter=10),
        param_grid={"regParam": [0.0, 100.0]},
        evaluator=RegressionEvaluator(metricName="rmse"),
        numFolds=2,
    )
    gs.fit(data)
    assert gs.best_params_["regParam"] == gs.model_.bestModel.getRegParam()
    # and it is the grid point with the SMALLER rmse
    best_rmse = dict((p["regParam"], m) for p, m in gs.cv_results_)
    assert best_rmse[gs.best_params_["regParam"]] == min(best_rmse.values())


def test_dict_vectorizer_on_props(spark, sf_dir):
    from pyspark.sql.types import IntegerType, MapType, StringType

    from sparkit_learn_spark.ml import SparkDictVectorizer

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.from_json("props", MapType(StringType(), IntegerType())).alias("props"),
    )
    dv = SparkDictVectorizer()
    out = dv.fit(ev).transform(ev)
    assert out.count() == ev.count()  # one 'k' entry per event
    assert dv.feature_names_.count() == 1
    assert out.filter(F.col("feature") != "k").count() == 0


def test_feature_union_joins_columns(docs):
    from sparkit_learn_spark.ml import (
        SparkFeatureUnion,
        SparkHashingVectorizer,
    )

    fu = SparkFeatureUnion(
        [("h1", SparkHashingVectorizer(n_features=64)),
         ("h2", SparkHashingVectorizer(n_features=128))],
        idCol="doc_id",
    )
    out = fu.fit(docs).transform(docs)
    cols = set(out.columns)
    assert {"doc_id", "h1__bucket", "h1__tf", "h2__bucket", "h2__tf"} <= cols


def test_bernoulli_nb_runs(vec):
    from pyspark.ml.feature import Binarizer
    from pyspark.ml.functions import vector_to_array

    from sparkit_learn_spark.ml import SparkBernoulliNB

    # binarize the embedding (sign) for a bernoulli model
    binf = vec.select(
        "vec_id",
        array_to_vector(
            F.transform(
                vector_to_array("features"), lambda x: (x > 0).cast("double")
            )
        ).alias("features"),
        F.col("binlabel").alias("label"),
    )
    nb = SparkBernoulliNB()
    pred = nb.fit(binf).predict(binf)
    acc = pred.filter(F.col("prediction") == F.col("label")).count() / binf.count()
    assert acc >= 0.5


def test_sgd_partial_fit_matches_numpy_replica(emb):
    """SparkSGDClassifier is deterministic full-batch GD: its state
    after N partial_fit calls must match a numpy replica of the same
    updates to float-summation tolerance (sklearn-oracle style; exact
    formula, no solver freedom)."""
    from sparkit_learn_spark.ml import SparkSGDClassifier

    data = emb.select(
        F.col("embedding").alias("features"),
        (F.col("label") < 5).cast("double").alias("y"),
    )
    pdf = data.toPandas()
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["features"]])
    y = pdf["y"].to_numpy(dtype=np.float64)

    lr, reg, epochs = 0.5, 0.01, 5
    w, b = np.zeros(X.shape[1]), 0.0
    for _ in range(epochs):
        resid = 1.0 / (1.0 + np.exp(-(X @ w + b))) - y
        w = w - lr * (X.T @ resid / len(y) + reg * w)
        b = b - lr * resid.mean()

    clf = SparkSGDClassifier(featuresCol="features", labelCol="y",
                             lr=lr, reg=reg, epochs=epochs)
    clf.fit(data)
    assert clf.n_iter_ == epochs
    np.testing.assert_allclose(clf.coef_, w, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(clf.intercept_, b, rtol=1e-8, atol=1e-10)


def test_sgd_partial_fit_is_incremental(emb):
    """State must carry across partial_fit calls on DIFFERENT blocks
    (the splearn per-block contract): two blocks streamed sequentially
    equal the same numpy sequence, and differ from fitting either
    block alone."""
    from sparkit_learn_spark.ml import SparkSGDClassifier

    data = emb.select(
        "vec_id",
        F.col("embedding").alias("features"),
        (F.col("label") < 5).cast("double").alias("y"),
    )
    lo = data.filter(F.col("vec_id") % 2 == 0)
    hi = data.filter(F.col("vec_id") % 2 == 1)

    def np_block(df):
        pdf = df.toPandas()
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["features"]])
        return X, pdf["y"].to_numpy(dtype=np.float64)

    (Xa, ya), (Xb, yb) = np_block(lo), np_block(hi)
    w, b = np.zeros(Xa.shape[1]), 0.0
    for X, y in ((Xa, ya), (Xb, yb), (Xa, ya)):
        resid = 1.0 / (1.0 + np.exp(-(X @ w + b))) - y
        w = w - 0.5 * (X.T @ resid / len(y))
        b = b - 0.5 * resid.mean()

    clf = SparkSGDClassifier(featuresCol="features", labelCol="y", lr=0.5)
    clf.partial_fit(lo).partial_fit(hi).partial_fit(lo)
    assert clf.n_iter_ == 3
    np.testing.assert_allclose(clf.coef_, w, rtol=1e-8, atol=1e-10)

    solo = SparkSGDClassifier(featuresCol="features", labelCol="y", lr=0.5)
    solo.partial_fit(lo)
    assert not np.allclose(solo.coef_, clf.coef_)


def test_sgd_predict_accuracy(emb):
    from sparkit_learn_spark.ml import SparkSGDClassifier

    data = emb.select(
        F.col("embedding").alias("features"),
        (F.col("label") < 5).cast("double").alias("y"),
    )
    clf = SparkSGDClassifier(featuresCol="features", labelCol="y",
                             lr=1.0, epochs=30)
    pred = clf.fit(data).predict(data)
    acc = pred.filter(F.col("prediction") == F.col("y")).count() / data.count()
    assert acc >= 0.6


def test_pca_matches_numpy(emb):
    """Local oracle: PCA == SVD of the centered matrix (sklearn's own
    definition — explained_variance = S²/(n−1), scores = Xc·Vᵀ)."""
    pca = SparkPCA(n_components=4).fit(emb)
    rows = emb.collect()
    X = np.array([np.asarray(r["embedding"], np.float64) for r in rows])
    Xc = X - X.mean(axis=0)
    _, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    n = len(X)
    ref_var = S**2 / (n - 1)
    np.testing.assert_allclose(pca.explained_variance_, ref_var[:4], rtol=1e-8)
    np.testing.assert_allclose(
        pca.explained_variance_ratio_, ref_var[:4] / ref_var.sum(), rtol=1e-8
    )
    # eigenvector sign is arbitrary: align each component before comparing
    signs = np.sign(np.sum(pca.components_ * Vt[:4], axis=1))
    np.testing.assert_allclose(
        pca.components_ * signs[:, None], Vt[:4], atol=1e-8
    )
    # scores: distributed transform vs local projection, sign-aligned
    got = {r["vec_id"]: np.asarray(r["scores"]) for r in pca.transform(emb).collect()}
    ids = [r["vec_id"] for r in rows]
    S_got = np.array([got[i] for i in ids]) * signs
    np.testing.assert_allclose(S_got, Xc @ Vt[:4].T, atol=1e-6)
