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


# ------------------------------------------------- partial_fit parity

def test_multinomial_nb_partial_fit_matches_numpy(emb_ab):
    """partial_fit(A) then partial_fit(B) must equal the numpy replica
    of multinomial NB fit on A+B (sklearn's formulas: theta_c =
    log((fc+alpha)/(sum fc+alpha*d)), prior = log(n_c/n)) — NB
    sufficient stats are exact under addition."""
    a, b = emb_ab
    sa, sb = _nonneg(a), _nonneg(b)
    nb = SparkMultinomialNB(alpha=1.0)
    nb.partial_fit(sa).partial_fit(sb)
    from pyspark.ml.functions import vector_to_array

    def xy(df):
        p = df.select(vector_to_array("features").alias("x"), "label").toPandas()
        return (np.array([np.asarray(v) for v in p["x"]]),
                p["label"].to_numpy())

    Xa, ya = xy(sa)
    Xb, yb = xy(sb)
    X, y = np.vstack([Xa, Xb]), np.concatenate([ya, yb])
    for cls in np.unique(y):
        fc = X[y == cls].sum(0)
        sm = fc + 1.0
        np.testing.assert_allclose(
            nb.feature_log_prob_[cls], np.log(sm / sm.sum()), rtol=1e-9)
        np.testing.assert_allclose(
            nb.class_log_prior_[cls],
            np.log((y == cls).sum() / len(y)), rtol=1e-12)
    # predictions: argmax of prior + x . log theta, numpy replica
    classes = sorted(np.unique(y))
    W = np.array([np.log((X[y == c].sum(0) + 1.0)
                         / (X[y == c].sum(0) + 1.0).sum()) for c in classes])
    pri = np.array([np.log((y == c).sum() / len(y)) for c in classes])
    exp_pred = np.array(classes)[(Xb @ W.T + pri).argmax(1)]
    pred = nb.predict(sb).select("vec_id", "prediction").toPandas()
    ids = sb.select("vec_id").toPandas()["vec_id"].to_numpy()
    got = pred.sort_values("vec_id")["prediction"].to_numpy()
    agree = (got == exp_pred[np.argsort(ids)]).mean()
    assert agree >= 0.98  # float-sum tie rows only


def test_bernoulli_nb_partial_fit_matches_numpy(emb_ab):
    """Bernoulli partial_fit chain vs the numpy replica (theta_c =
    (doc_count+alpha)/(n_c+2alpha); likelihood uses presence AND
    absence terms)."""
    a, b = emb_ab

    def binarize(e):
        return e.select(
            "vec_id",
            array_to_vector(
                F.transform(F.col("embedding"),
                            lambda x: (x > 0).cast("double"))
            ).alias("features"),
            (F.col("label") < 5).cast("double").alias("label"),
        )

    sa, sb = binarize(a), binarize(b)
    nb = SparkBernoulliNB(alpha=1.0)
    nb.partial_fit(sa).partial_fit(sb)
    from pyspark.ml.functions import vector_to_array

    def xy(df):
        p = df.select(vector_to_array("features").alias("x"), "label").toPandas()
        return (np.array([np.asarray(v) for v in p["x"]]),
                p["label"].to_numpy())

    Xa, ya = xy(sa)
    Xb, yb = xy(sb)
    X, y = np.vstack([Xa, Xb]), np.concatenate([ya, yb])
    classes = sorted(np.unique(y))
    for cls in classes:
        n_c = (y == cls).sum()
        theta = (X[y == cls].sum(0) + 1.0) / (n_c + 2.0)
        np.testing.assert_allclose(
            nb.feature_log_prob_[cls], np.log(theta), rtol=1e-9)
    # prediction replica
    TH = np.array([(X[y == c].sum(0) + 1.0) / ((y == c).sum() + 2.0)
                   for c in classes])
    pri = np.array([np.log((y == c).sum() / len(y)) for c in classes])
    LL = (Xb @ (np.log(TH) - np.log1p(-TH)).T
          + np.log1p(-TH).sum(1)[None, :] + pri[None, :])
    exp_pred = np.array(classes)[LL.argmax(1)]
    pred = nb.predict(sb).select("vec_id", "prediction").toPandas()
    ids = sb.select("vec_id").toPandas()["vec_id"].to_numpy()
    got = pred.sort_values("vec_id")["prediction"].to_numpy()
    assert (got == exp_pred[np.argsort(ids)]).mean() >= 0.98


def test_gaussian_nb_partial_fit_matches_full_fit(emb_ab):
    """partial_fit(A) + partial_fit(B) must equal fit(A union B) on
    the learned per-class (mu, var) table — Gaussian sufficient stats
    merge exactly; fit-vs-merged differ only in float summation
    order."""
    a, b = emb_ab
    inc = SparkGaussianNB().partial_fit(a).partial_fit(b)
    full = SparkGaussianNB().fit(a.unionAll(b))
    gi = inc.stats_.toPandas().sort_values(["label", "dim"]).reset_index(drop=True)
    gf = full.stats_.toPandas().sort_values(["label", "dim"]).reset_index(drop=True)
    np.testing.assert_allclose(gi["mu"], gf["mu"], rtol=1e-9)
    np.testing.assert_allclose(gi["var"], gf["var"], rtol=1e-6)
    pi = inc.priors_.toPandas().sort_values("label")
    pf = full.priors_.toPandas().sort_values("label")
    np.testing.assert_allclose(pi["log_prior"], pf["log_prior"], rtol=1e-12)


def test_standard_scaler_partial_fit_matches_full_fit(docs_ab):
    a, b = docs_ab
    inc = (SparkStandardScaler(inputCol="n_chars")
           .partial_fit(a).partial_fit(b))
    full = SparkStandardScaler(inputCol="n_chars").fit(a.unionAll(b))
    np.testing.assert_allclose(inc.mean_, full.mean_, rtol=1e-12)
    np.testing.assert_allclose(inc.std_, full.std_, rtol=1e-9)


def test_variance_threshold_partial_fit_matches_full_fit(emb_ab):
    """partial_fit(A) then partial_fit(B) must equal fit(A+B): the
    per-dim (n, sumx, sumxsq) sufficient statistics are exact under
    addition, so the chained sample variances match var_samp on the
    concatenation to float tolerance."""
    a, b = emb_ab
    inc = (SparkVarianceThreshold(threshold=0.001)
           .partial_fit(a).partial_fit(b))
    full = SparkVarianceThreshold(threshold=0.001).fit(a.unionAll(b))
    vi = inc.variances_.toPandas().sort_values("dim")
    vf = full.variances_.toPandas().sort_values("dim")
    np.testing.assert_allclose(vi["var"], vf["var"], rtol=1e-9)
    assert inc.get_support() == full.get_support()


def test_variance_threshold_partial_fit_after_fit_raises(emb_ab):
    a, b = emb_ab
    vt = SparkVarianceThreshold().fit(a)
    with pytest.raises(RuntimeError, match="partial_fit after fit"):
        vt.partial_fit(b)


def test_nb_partial_fit_after_fit_raises(emb_ab):
    """fit() trains sparse-aware MLlib NB without mergeable stats, so
    a subsequent partial_fit would silently train on the new batch
    only (ADVICE r7) — it must raise instead."""
    a, b = emb_ab
    sa, sb = _nonneg(a), _nonneg(b)
    nb = SparkMultinomialNB().fit(sa)
    with pytest.raises(RuntimeError, match="partial_fit after fit"):
        nb.partial_fit(sb)


def test_gaussian_nb_partial_fit_dim_mismatch_raises(emb_ab):
    a, b = emb_ab
    g = SparkGaussianNB()
    g.partial_fit(a)
    narrower = b.withColumn("embedding", F.slice("embedding", 1, 4))
    with pytest.raises(ValueError, match="dimensionality"):
        g.partial_fit(narrower)


def test_kmeans_partial_fit_matches_numpy_replica(vec_ab):
    """Mini-batch KMeans: a partial_fit chain from explicit init
    centers must match the numpy replica of the same streaming
    updates (assign to nearest center via the identical
    -2XC^T + |c|^2 argmin, then c' = (c*n_old + sum_batch)/(n_old +
    n_batch)) — deterministic given the init."""
    from pyspark.ml.functions import vector_to_array

    a, b = vec_ab

    def xmat(df):
        p = df.select(vector_to_array("features").alias("x"),
                      "vec_id").toPandas().sort_values("vec_id")
        return np.array([np.asarray(v, np.float64) for v in p["x"]])

    Xa, Xb = xmat(a), xmat(b)
    k = 4
    init = Xa[:k].copy()  # explicit init: the replica's starting point

    km = SparkKMeans(n_clusters=k, init_centers=init)
    km.partial_fit(a).partial_fit(b)

    C = init.copy()
    n = np.zeros(k)
    for X in (Xa, Xb):
        c2 = (C ** 2).sum(1)
        lab = (-2.0 * (X @ C.T) + c2[None, :]).argmin(1)
        for cid in range(k):
            sel = X[lab == cid]
            if len(sel):
                C[cid] = (C[cid] * n[cid] + sel.sum(0)) / (n[cid] + len(sel))
                n[cid] += len(sel)
    np.testing.assert_allclose(km.centers_, C, rtol=1e-9)
    np.testing.assert_allclose(km.counts_, n)

    # predict agrees with the replica's nearest-center assignment
    c2 = (C ** 2).sum(1)
    exp = (-2.0 * (Xb @ C.T) + c2[None, :]).argmin(1)
    got = (km.predict(b).select("vec_id", "prediction").toPandas()
           .sort_values("vec_id")["prediction"].to_numpy())
    assert (got == exp).mean() >= 0.99  # float-tie rows only


def test_kmeans_partial_fit_continues_from_fit(vec_ab):
    """fit() then partial_fit(B): MLlib's training summary provides
    per-cluster sizes, so the incremental update continues from fit's
    centers with correct weighting — asserted against the numpy
    replica seeded from the fitted state."""
    from pyspark.ml.functions import vector_to_array

    a, b = vec_ab
    km = SparkKMeans(n_clusters=4, seed=7).fit(a)
    C0 = np.array(km.model_.clusterCenters())
    n0 = np.array(km.model_.summary.clusterSizes, dtype=np.float64)
    km.partial_fit(b)

    p = b.select(vector_to_array("features").alias("x"),
                 "vec_id").toPandas().sort_values("vec_id")
    Xb = np.array([np.asarray(v, np.float64) for v in p["x"]])
    C = C0.copy()
    n = n0.copy()
    c2 = (C ** 2).sum(1)
    lab = (-2.0 * (Xb @ C.T) + c2[None, :]).argmin(1)
    for cid in range(4):
        sel = Xb[lab == cid]
        if len(sel):
            C[cid] = (C[cid] * n[cid] + sel.sum(0)) / (n[cid] + len(sel))
            n[cid] += len(sel)
    np.testing.assert_allclose(km.centers_, C, rtol=1e-9)
    np.testing.assert_allclose(km.counts_, n)


def test_truncated_svd_partial_fit_equals_fit_on_concat(emb_ab):
    """r9 (VERDICT r8 #6): the Gram matrix is exact under addition, so
    partial_fit(A); partial_fit(B) must equal fit(A+B) EXACTLY (same
    eigh on a bit-identical-up-to-fp-addition d×d matrix) — tighter
    than sklearn IncrementalPCA's low-rank approximation contract."""
    a, b = emb_ab
    inc = SparkTruncatedSVD(n_components=4).partial_fit(a).partial_fit(b)
    full = SparkTruncatedSVD(n_components=4).fit(a.unionAll(b))
    np.testing.assert_allclose(inc.singular_values_, full.singular_values_,
                               rtol=1e-9)
    # eigenvector sign is arbitrary: compare |cos| per component
    for vi, vf in zip(inc.components_, full.components_):
        assert abs(np.dot(vi, vf) / (np.linalg.norm(vi) * np.linalg.norm(vf))) \
            > 1 - 1e-9


def test_pca_partial_fit_equals_fit_on_concat(emb_ab):
    """r9: (n, Σx, XᵀX) accumulate exactly, so the incremental chain
    reproduces fit-on-concatenation: mean, explained variance, and
    components (up to sign) all match; ALSO cross-checked against
    sklearn PCA on the concatenated local matrix."""
    a, b = emb_ab
    inc = SparkPCA(n_components=4).partial_fit(a).partial_fit(b)
    full = SparkPCA(n_components=4).fit(a.unionAll(b))
    np.testing.assert_allclose(inc.mean_, full.mean_, rtol=1e-9)
    np.testing.assert_allclose(inc.explained_variance_,
                               full.explained_variance_, rtol=1e-9)
    for vi, vf in zip(inc.components_, full.components_):
        assert abs(np.dot(vi, vf)) > 1 - 1e-9

    # local numpy replica of sklearn.decomposition.PCA (covariance
    # eigh with 1/(n-1) normalization) on the concatenated matrix —
    # sklearn itself is absent from this env (import-gated elsewhere)
    X = np.array([np.asarray(v, np.float64) for v in
                  a.unionAll(b).select("embedding").toPandas()["embedding"]])
    Xc = X - X.mean(0)
    vals, vecs = np.linalg.eigh(Xc.T @ Xc / (len(X) - 1.0))
    order = np.argsort(vals)[::-1][:4]
    np.testing.assert_allclose(inc.explained_variance_, vals[order],
                               rtol=1e-6)
    for vi, vs in zip(inc.components_, vecs[:, order].T):
        assert abs(np.dot(vi, vs)) > 1 - 1e-6


def test_decomposition_partial_fit_guards(emb_ab):
    """fit() keeps no mergeable state: partial_fit after fit raises;
    fit() after partial_fit resets the accumulator (refit contract)."""
    a, b = emb_ab
    svd = SparkTruncatedSVD(n_components=4).fit(a)
    with pytest.raises(RuntimeError, match="partial_fit after fit"):
        svd.partial_fit(b)
    pca = SparkPCA(n_components=4).fit(a)
    with pytest.raises(RuntimeError, match="partial_fit after fit"):
        pca.partial_fit(b)
    # refit resets: partial_fit -> fit -> state equals fresh fit
    inc = SparkPCA(n_components=4).partial_fit(a).fit(b)
    fresh = SparkPCA(n_components=4).fit(b)
    np.testing.assert_allclose(inc.mean_, fresh.mean_, rtol=1e-12)
    np.testing.assert_allclose(inc.explained_variance_,
                               fresh.explained_variance_, rtol=1e-12)
