"""Refit-parity sweep over the full estimator surface (VERDICT r6
next-steps #9): for EVERY estimator class, ``fit(A)`` followed by
``fit(B)`` on the same instance must leave exactly the state a fresh
instance gets from ``fit(B)`` — sklearn's refit contract (``fit``
resets; incremental accumulation is ``partial_fit``'s job, opted into
via ``warm_start``). The sweep caught SparkSGDClassifier silently
continuing from the previous fit's weights (fixed r7: fit() now
resets unless warm_start=True).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.ml import (
    SparkBernoulliNB,
    SparkCountVectorizer,
    SparkDictVectorizer,
    SparkFeatureUnion,
    SparkGaussianNB,
    SparkGridSearchCV,
    SparkHashingVectorizer,
    SparkKMeans,
    SparkLinearRegression,
    SparkLinearSVC,
    SparkLogisticRegression,
    SparkMultinomialNB,
    SparkPCA,
    SparkPipeline,
    SparkSGDClassifier,
    SparkStandardScaler,
    SparkTfidfTransformer,
    SparkTruncatedSVD,
    SparkVarianceThreshold,
)
from sparkit_learn_spark.testing import normalize


@pytest.fixture(scope="module")
def docs_ab(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (d.filter(F.col("doc_id") % 2 == 0).cache(),
            d.filter(F.col("doc_id") % 2 == 1).cache())


@pytest.fixture(scope="module")
def emb_ab(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return (e.filter(F.col("vec_id") % 2 == 0).cache(),
            e.filter(F.col("vec_id") % 2 == 1).cache())


@pytest.fixture(scope="module")
def vec_ab(emb_ab):
    def to_vec(e):
        return e.select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>"))
            .alias("features"),
            (F.col("label") < 5).cast("double").alias("label"),
            F.col("label").cast("double").alias("reg_label"),
        )
    a, b = emb_ab
    return to_vec(a).cache(), to_vec(b).cache()


@pytest.fixture(scope="module")
def events_map_ab(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.from_json("props", "map<string,double>").alias("props"),
    )
    return (ev.filter(F.col("event_id") % 2 == 0).cache(),
            ev.filter(F.col("event_id") % 2 == 1).cache())


def frames_equal(df1, df2):
    a, b = normalize(df1.toPandas()), normalize(df2.toPandas())
    assert a == b


# ------------------------------------------------------------- text

def test_refit_count_vectorizer(docs_ab):
    a, b = docs_ab
    refit = SparkCountVectorizer().fit(a).fit(b)
    fresh = SparkCountVectorizer().fit(b)
    frames_equal(refit.vocabulary_, fresh.vocabulary_)


def test_refit_hashing_vectorizer(docs_ab):
    a, b = docs_ab
    refit = SparkHashingVectorizer().fit(a).fit(b)
    fresh = SparkHashingVectorizer().fit(b)
    frames_equal(refit.transform(b), fresh.transform(b))


def test_refit_tfidf(docs_ab):
    a, b = docs_ab
    cv = SparkCountVectorizer()
    tfa = cv.fit(a).transform(a).cache()
    tfb = cv.fit(b).transform(b).cache()
    refit = SparkTfidfTransformer().fit(tfa).fit(tfb)
    fresh = SparkTfidfTransformer().fit(tfb)
    frames_equal(
        refit.idf_.select("term", F.round("idf", 9).alias("idf")),
        fresh.idf_.select("term", F.round("idf", 9).alias("idf")),
    )


def test_refit_dict_vectorizer(events_map_ab):
    a, b = events_map_ab
    refit = SparkDictVectorizer().fit(a).fit(b)
    fresh = SparkDictVectorizer().fit(b)
    frames_equal(refit.feature_names_, fresh.feature_names_)


# -------------------------------------------------------------- bayes

def _nonneg(e):
    # multinomial NB requires non-negative features; |embedding| keeps
    # the same shape deterministically
    return e.select(
        "vec_id",
        array_to_vector(
            F.transform(F.col("embedding"),
                        lambda x: F.abs(x).cast("double"))
        ).alias("features"),
        (F.col("label") < 5).cast("double").alias("label"),
    )


def test_refit_multinomial_nb(emb_ab):
    a, b = emb_ab
    a, b = _nonneg(a), _nonneg(b)
    refit = SparkMultinomialNB().fit(a).fit(b)
    fresh = SparkMultinomialNB().fit(b)
    np.testing.assert_allclose(
        refit.model_.theta.toArray(), fresh.model_.theta.toArray())
    np.testing.assert_allclose(
        refit.model_.pi.toArray(), fresh.model_.pi.toArray())


def test_refit_bernoulli_nb(emb_ab):
    a, b = emb_ab

    def binarize(e):
        return e.select(
            "vec_id",
            array_to_vector(
                F.transform(
                    F.col("embedding"),
                    lambda x: (x > 0).cast("double"),
                )
            ).alias("features"),
            (F.col("label") < 5).cast("double").alias("label"),
        )

    refit = SparkBernoulliNB().fit(binarize(a)).fit(binarize(b))
    fresh = SparkBernoulliNB().fit(binarize(b))
    np.testing.assert_allclose(
        refit.model_.theta.toArray(), fresh.model_.theta.toArray())


def test_refit_gaussian_nb(emb_ab):
    a, b = emb_ab
    refit = SparkGaussianNB().fit(a).fit(b)
    fresh = SparkGaussianNB().fit(b)
    r6 = lambda c: F.round(c, 9)  # noqa: E731
    frames_equal(
        refit.stats_.select("label", "dim", r6(F.col("mu")).alias("mu"),
                            r6(F.col("var")).alias("var")),
        fresh.stats_.select("label", "dim", r6(F.col("mu")).alias("mu"),
                            r6(F.col("var")).alias("var")),
    )
    frames_equal(
        refit.priors_.select("label", r6(F.col("log_prior")).alias("p")),
        fresh.priors_.select("label", r6(F.col("log_prior")).alias("p")),
    )


# ------------------------------------------------------------- linear

@pytest.mark.parametrize("cls,labelcol", [
    (SparkLinearRegression, "reg_label"),
    (SparkLogisticRegression, "label"),
    (SparkLinearSVC, "label"),
])
def test_refit_mllib_linear(vec_ab, cls, labelcol):
    a, b = vec_ab
    refit = cls(labelCol=labelcol, maxIter=20).fit(a).fit(b)
    fresh = cls(labelCol=labelcol, maxIter=20).fit(b)
    np.testing.assert_allclose(refit.coef_, fresh.coef_, rtol=1e-8)
    np.testing.assert_allclose(refit.intercept_, fresh.intercept_, rtol=1e-8)


@pytest.fixture(scope="module")
def sgd_ab(emb_ab):
    # SGD consumes a plain array<double> features column
    def prep(e):
        return e.select(
            F.col("embedding").cast("array<double>").alias("features"),
            (F.col("label") < 5).cast("double").alias("label"),
        )
    a, b = emb_ab
    return prep(a).cache(), prep(b).cache()


def test_refit_sgd_resets_state(sgd_ab):
    """THE warm-start contract: a second fit() must NOT continue from
    the first fit's weights (that is partial_fit / warm_start=True)."""
    a, b = sgd_ab
    refit = SparkSGDClassifier(epochs=3).fit(a).fit(b)
    fresh = SparkSGDClassifier(epochs=3).fit(b)
    np.testing.assert_allclose(refit.coef_, fresh.coef_)
    np.testing.assert_allclose(refit.intercept_, fresh.intercept_)
    assert refit.n_iter_ == fresh.n_iter_ == 3


def test_sgd_warm_start_continues(sgd_ab):
    """warm_start=True opts back INTO continuation: fit(A) then fit(B)
    must equal fit(A) followed by epochs x partial_fit(B)."""
    a, b = sgd_ab
    warm = SparkSGDClassifier(epochs=3, warm_start=True).fit(a).fit(b)
    manual = SparkSGDClassifier(epochs=3).fit(a)
    for _ in range(3):
        manual.partial_fit(b)
    np.testing.assert_allclose(warm.coef_, manual.coef_)
    assert warm.n_iter_ == manual.n_iter_ == 6


# ---------------------------------------------------------- unsupervised

def test_refit_kmeans(vec_ab):
    a, b = vec_ab
    refit = SparkKMeans(n_clusters=4, seed=7).fit(a).fit(b)
    fresh = SparkKMeans(n_clusters=4, seed=7).fit(b)
    np.testing.assert_allclose(
        refit.cluster_centers_, fresh.cluster_centers_)


def test_refit_truncated_svd(emb_ab):
    a, b = emb_ab
    refit = SparkTruncatedSVD(n_components=4).fit(a).fit(b)
    fresh = SparkTruncatedSVD(n_components=4).fit(b)
    np.testing.assert_allclose(
        refit.singular_values_, fresh.singular_values_, rtol=1e-9)
    np.testing.assert_allclose(
        np.abs(refit.components_), np.abs(fresh.components_), rtol=1e-7)


def test_refit_pca(emb_ab):
    a, b = emb_ab
    refit = SparkPCA(n_components=4).fit(a).fit(b)
    fresh = SparkPCA(n_components=4).fit(b)
    np.testing.assert_allclose(
        np.abs(refit.components_), np.abs(fresh.components_), rtol=1e-7)


def test_refit_variance_threshold(emb_ab):
    a, b = emb_ab
    refit = SparkVarianceThreshold(threshold=0.001).fit(a).fit(b)
    fresh = SparkVarianceThreshold(threshold=0.001).fit(b)
    assert refit.get_support() == fresh.get_support()


def test_refit_standard_scaler(docs_ab):
    a, b = docs_ab
    refit = SparkStandardScaler(inputCol="n_chars").fit(a).fit(b)
    fresh = SparkStandardScaler(inputCol="n_chars").fit(b)
    assert refit.mean_ == fresh.mean_
    assert refit.std_ == fresh.std_


# ---------------------------------------------------------- composition

def test_refit_pipeline(docs_ab):
    a, b = docs_ab
    refit = SparkPipeline([
        ("cv", SparkCountVectorizer()),
        ("tfidf", SparkTfidfTransformer()),
    ]).fit(a).fit(b)
    fresh = SparkPipeline([
        ("cv", SparkCountVectorizer()),
        ("tfidf", SparkTfidfTransformer()),
    ]).fit(b)
    r = lambda df: df.select(  # noqa: E731
        "doc_id", "term", F.round("tfidf", 9).alias("tfidf"))
    frames_equal(r(refit.transform(b)), r(fresh.transform(b)))


def test_refit_feature_union(docs_ab):
    a, b = docs_ab
    mk = lambda: SparkFeatureUnion(  # noqa: E731
        [("cv", SparkCountVectorizer()),
         ("hv", SparkHashingVectorizer(n_features=64))],
        idCol="doc_id",
    )
    refit = mk().fit(a).fit(b)
    fresh = mk().fit(b)
    frames_equal(refit.transform(b), fresh.transform(b))


def test_refit_grid_search(vec_ab):
    a, b = vec_ab
    from pyspark.ml.classification import LogisticRegression as MlLogReg

    mk = lambda: SparkGridSearchCV(  # noqa: E731
        MlLogReg(labelCol="label", maxIter=10),
        {"regParam": [0.0, 0.1]},
        BinaryClassificationEvaluator(labelCol="label"),
        numFolds=2, seed=11,
    )
    refit = mk().fit(a).fit(b)
    fresh = mk().fit(b)
    assert refit.best_params_ == fresh.best_params_
    got = dict((tuple(sorted(p.items())), m) for p, m in refit.cv_results_)
    exp = dict((tuple(sorted(p.items())), m) for p, m in fresh.cv_results_)
    assert got.keys() == exp.keys()
    for k in got:
        np.testing.assert_allclose(got[k], exp[k], rtol=1e-9)
