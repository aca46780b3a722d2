"""DataFrame-native estimators with the reference's sklearn-flavored
API [ref: splearn public surface, SURVEY §2A].

Design rules:
  * fit() runs distributed DataFrame jobs; fitted state is either a
    small DataFrame (broadcast-joined at transform time) or a plain
    Python attribute (suffix ``_``, sklearn convention) — never an
    unbounded driver collection.
  * transform()/predict() extend the input DataFrame lazily; nothing
    executes until the caller acts.
  * Columns play the role of the reference's DictRDD keys: text goes
    in ``inputCol``, vectors in ``featuresCol``, targets in
    ``labelCol`` — the MLlib convention (SURVEY §1.3).
"""

from __future__ import annotations

import numpy as np

from pyspark.ml import Pipeline as _MlPipeline
from pyspark.ml.classification import LinearSVC as _LinearSVC
from pyspark.ml.classification import LogisticRegression as _LogReg
from pyspark.ml.classification import NaiveBayes as _NaiveBayes
from pyspark.ml.clustering import KMeans as _KMeans
from pyspark.ml.feature import HashingTF as _HashingTF
from pyspark.ml.feature import IDF as _IDF
from pyspark.ml.regression import LinearRegression as _LinReg
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens as _tokens


class SparkBaseEstimator:
    """get_params/set_params over __init__ kwargs (sklearn contract,
    mirroring the reference's SparkBaseEstimator [ref: splearn/base.py
    · C:H])."""

    def get_params(self) -> dict:
        return {
            k: v for k, v in vars(self).items()
            if not k.endswith("_") and not k.startswith("_")
        }

    def set_params(self, **params) -> "SparkBaseEstimator":
        for k, v in params.items():
            if k not in self.get_params():
                raise ValueError(f"unknown param {k!r} for {type(self).__name__}")
            setattr(self, k, v)
        return self

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


# ---------------------------------------------------------------- text

class SparkCountVectorizer(SparkBaseEstimator):
    """[ref: splearn SparkCountVectorizer · C:H] — fit builds the
    vocabulary as a DISTRIBUTED DataFrame (distinct + window ids), not
    a driver set-union; transform emits the long-form (id, term, tf)
    matrix, broadcast-joined against the vocab."""

    def __init__(self, inputCol: str = "text", idCol: str = "doc_id"):
        self.inputCol = inputCol
        self.idCol = idCol
        self.vocabulary_: DataFrame | None = None

    def _terms(self, df: DataFrame) -> DataFrame:
        return df.select(
            self.idCol, F.explode(_tokens(self.inputCol)).alias("term")
        )

    def fit(self, df: DataFrame) -> "SparkCountVectorizer":
        # distributed stable ids (range partition + offset repair), not
        # a single-task Window.orderBy: vocabularies reach 10⁸+ terms
        from ..operators.ids import stable_sorted_ids

        self.vocabulary_ = stable_sorted_ids(
            self._terms(df).select("term").distinct(), "term", id_col="term_id"
        )
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.vocabulary_ is None:
            raise RuntimeError("fit first")
        tf = (
            self._terms(df)
            .groupBy(self.idCol, "term")
            .agg(F.count("*").alias("tf"))
        )
        return tf.join(F.broadcast(self.vocabulary_), "term").select(
            self.idCol, "term", "term_id", "tf"
        )


class SparkHashingVectorizer(SparkBaseEstimator):
    """[ref: splearn SparkHashingVectorizer · C:H] — stateless: fit is
    a no-op; buckets are pmod(murmur3(term), n_features)."""

    def __init__(self, n_features: int = 1024, inputCol: str = "text",
                 idCol: str = "doc_id"):
        self.n_features = n_features
        self.inputCol = inputCol
        self.idCol = idCol

    def fit(self, df: DataFrame) -> "SparkHashingVectorizer":
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        return (
            df.select(self.idCol, F.explode(_tokens(self.inputCol)).alias("term"))
            .select(
                self.idCol,
                F.pmod(F.hash("term"), F.lit(self.n_features)).cast("long").alias("bucket"),
            )
            .groupBy(self.idCol, "bucket")
            .agg(F.count("*").alias("tf"))
        )


class SparkTfidfTransformer(SparkBaseEstimator):
    """[ref: splearn SparkTfidfTransformer · C:H] — smooth idf
    (sklearn formula ln((1+N)/(1+df)) + 1). Input: long-form
    (idCol, term, tf); ``idf_`` is a vocab-sized DataFrame."""

    def __init__(self, idCol: str = "doc_id", termCol: str = "term",
                 tfCol: str = "tf"):
        self.idCol = idCol
        self.termCol = termCol
        self.tfCol = tfCol
        self.idf_: DataFrame | None = None

    def fit(self, tf_df: DataFrame) -> "SparkTfidfTransformer":
        n_docs = tf_df.select(self.idCol).distinct().count()
        df = tf_df.groupBy(self.termCol).agg(
            F.countDistinct(self.idCol).alias("df")
        )
        self.idf_ = df.select(
            self.termCol,
            (F.log((1.0 + n_docs) / (1 + F.col("df"))) + 1).alias("idf"),
        )
        return self

    def transform(self, tf_df: DataFrame) -> DataFrame:
        if self.idf_ is None:
            raise RuntimeError("fit first")
        return tf_df.join(F.broadcast(self.idf_), self.termCol).select(
            self.idCol,
            self.termCol,
            (F.col(self.tfCol) * F.col("idf")).alias("tfidf"),
        )


# ------------------------------------------------------------ bayesian

class SparkMultinomialNB(SparkBaseEstimator):
    """[ref: splearn SparkMultinomialNB · C:H] — MLlib NaiveBayes
    (multinomial) over a features vector column; sufficient statistics
    merge distributedly exactly as the reference's reduce(add).

    ``partial_fit`` (r7) implements the reference's TRUE per-block
    incremental contract: each call aggregates the batch's class and
    feature counts distributedly (one bounded classes×dims collect)
    and MERGES them into persistent driver state — NB's sufficient
    statistics are exact under addition, so a partial_fit chain equals
    one fit on the concatenation (asserted vs sklearn in
    tests/test_estimators.py). After partial_fit, prediction scores
    via a pure-JVM dot against the broadcast log-probability literals
    (no MLlib model object needed)."""

    _model_type = "multinomial"

    def __init__(self, alpha: float = 1.0, featuresCol: str = "features",
                 labelCol: str = "label"):
        self.alpha = alpha
        self.featuresCol = featuresCol
        self.labelCol = labelCol
        self.model_ = None
        self.class_count_: dict | None = None   # label -> n rows
        self.feature_count_: dict | None = None  # label -> ndarray(d)

    def fit(self, df: DataFrame) -> "SparkMultinomialNB":
        self.class_count_ = self.feature_count_ = None  # refit contract
        self.model_ = _NaiveBayes(
            smoothing=self.alpha, modelType=self._model_type,
            featuresCol=self.featuresCol, labelCol=self.labelCol,
        ).fit(df)
        return self

    def partial_fit(self, df: DataFrame) -> "SparkMultinomialNB":
        from pyspark.ml.functions import vector_to_array

        if self.class_count_ is None:
            if self.model_ is not None:
                # fit() trained an MLlib model but kept no sufficient
                # statistics (the sparse-aware path); continuing from
                # it would silently discard fit's data (ADVICE r7).
                raise RuntimeError(
                    "partial_fit after fit() is not supported: fit() "
                    "keeps no mergeable sufficient statistics. Train "
                    "incrementally with partial_fit from the start, or "
                    "call fit() on the full data."
                )
            self.class_count_, self.feature_count_ = {}, {}
            self.model_ = None  # stats path takes over scoring
        rows = (
            df.select(F.col(self.labelCol).alias("_y"),
                      vector_to_array(self.featuresCol).alias("_x"))
            .select("_y", F.posexplode("_x").alias("_d", "_v"))
            .groupBy("_y", "_d")
            .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()  # bounded: classes × dims rows
        )
        if not rows:
            raise ValueError("partial_fit called with an empty batch")
        per_label_n: dict = {}
        for r in rows:
            y = r["_y"]
            if y not in self.feature_count_:
                d = 1 + max(rr["_d"] for rr in rows)
                self.feature_count_[y] = np.zeros(d)
                self.class_count_[y] = 0
            self.feature_count_[y][r["_d"]] += r["_s"]
            per_label_n[y] = r["_n"]  # same for every dim of the label
        for y, n in per_label_n.items():
            self.class_count_[y] += n
        return self

    @property
    def class_log_prior_(self) -> dict:
        tot = sum(self.class_count_.values())
        return {y: float(np.log(n / tot)) for y, n in self.class_count_.items()}

    @property
    def feature_log_prob_(self) -> dict:
        out = {}
        for y, fc in self.feature_count_.items():
            sm = fc + self.alpha
            out[y] = np.log(sm / sm.sum())
        return out

    def _stats_score_exprs(self, arr):
        """Per-class JVM log-likelihood expressions over an
        array<double> column (multinomial: x · log θ + log prior)."""
        exprs = {}
        lp = self.class_log_prior_
        for y, logtheta in self.feature_log_prob_.items():
            wlit = F.array(*[F.lit(float(v)) for v in logtheta])
            exprs[y] = F.lit(lp[y]) + F.aggregate(
                F.zip_with(arr, wlit, lambda x, w: x * w),
                F.lit(0.0), lambda acc, v: acc + v)
        return exprs

    def predict(self, df: DataFrame) -> DataFrame:
        if self.model_ is not None:
            return self.model_.transform(df)
        if not self.class_count_:
            raise RuntimeError("fit or partial_fit first")
        from pyspark.ml.functions import vector_to_array

        arr = vector_to_array(self.featuresCol)
        scores = self._stats_score_exprs(arr)
        # argmax with deterministic label-order tie-break
        best = None
        for y in sorted(scores):
            cond = F.lit(True)
            for z in sorted(scores):
                if z == y:
                    continue
                cond = cond & (
                    (scores[y] > scores[z])
                    | ((scores[y] == scores[z]) & F.lit(y < z))
                )
            best = F.when(cond, F.lit(float(y))) if best is None \
                else best.when(cond, F.lit(float(y)))
        return df.withColumn("prediction", best)

    transform = predict


class SparkGaussianNB(SparkBaseEstimator):
    """[ref: splearn SparkGaussianNB · C:H] — per-class mean/var
    sufficient statistics as ONE distributed aggregate (Chan-merge
    inside var_pop); scoring via broadcast of the (class × dim) stats."""

    def __init__(self, vecCol: str = "embedding", labelCol: str = "label",
                 var_smoothing: float = 1e-9):
        self.vecCol = vecCol
        self.labelCol = labelCol
        self.var_smoothing = var_smoothing
        self.stats_: DataFrame | None = None
        self.priors_: DataFrame | None = None
        self._acc: dict | None = None  # label -> (n, sum(d), sumsq(d))

    def partial_fit(self, df: DataFrame) -> "SparkGaussianNB":
        """Per-block incremental fit (the reference's contract): each
        batch contributes exact (n, Σx, Σx²) sufficient statistics per
        (class, dim), merged additively into driver state — a
        partial_fit chain equals one fit on the concatenation (up to
        float summation order; asserted vs sklearn). stats_/priors_
        are rebuilt as small local DataFrames after every call, so
        predict() is identical for both fit paths."""
        rows = (
            df.select(F.col(self.labelCol).alias("_y"),
                      F.posexplode(self.vecCol).alias("_d", "_v"))
            .withColumn("_v", F.col("_v").cast("double"))
            .groupBy("_y", "_d")
            .agg(F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_s"),
                 F.sum(F.col("_v") * F.col("_v")).alias("_s2"))
            .collect()  # bounded: classes × dims
        )
        if not rows:
            raise ValueError("partial_fit called with an empty batch")
        if self._acc is None:
            self._acc = {}
        d = 1 + max(r["_d"] for r in rows)
        if self._acc:
            # every batch must match the accumulated dimensionality —
            # a narrower batch would silently truncate accumulated
            # dims and a wider one would IndexError mid-merge (ADVICE
            # r7); fail loudly before touching state
            d_acc = len(next(iter(self._acc.values()))[1])
            if d != d_acc:
                raise ValueError(
                    f"partial_fit batch dimensionality {d} != "
                    f"accumulated {d_acc}"
                )
        for r in rows:
            y = r["_y"]
            if y not in self._acc:
                self._acc[y] = [0, np.zeros(d), np.zeros(d)]
            a = self._acc[y]
            a[1][r["_d"]] += r["_s"]
            a[2][r["_d"]] += r["_s2"]
            if r["_d"] == 0:
                a[0] += r["_n"]
        spark = df.sparkSession
        total = sum(a[0] for a in self._acc.values())
        stat_rows, prior_rows = [], []
        for y, (n, s, s2) in self._acc.items():
            mu = s / n
            var = s2 / n - mu * mu + self.var_smoothing
            for dim in range(len(s)):
                stat_rows.append((float(y), dim, float(mu[dim]), float(var[dim])))
            prior_rows.append((float(y), float(np.log(n / total))))
        self.stats_ = spark.createDataFrame(
            stat_rows, f"{self.labelCol} double, dim int, mu double, var double")
        self.priors_ = spark.createDataFrame(
            prior_rows, f"{self.labelCol} double, log_prior double")
        return self

    def fit(self, df: DataFrame) -> "SparkGaussianNB":
        self._acc = None  # refit contract: fit starts from scratch
        dims = df.select(
            self.labelCol, F.posexplode(self.vecCol).alias("dim", "val")
        ).withColumn("val", F.col("val").cast("double"))
        self.stats_ = dims.groupBy(self.labelCol, "dim").agg(
            F.avg("val").alias("mu"),
            (F.var_pop("val") + self.var_smoothing).alias("var"),
        )
        total = df.count()
        self.priors_ = df.groupBy(self.labelCol).agg(
            F.log(F.count("*") / float(total)).alias("log_prior")
        )
        return self

    def predict(self, df: DataFrame, idCol: str = "vec_id") -> DataFrame:
        if self.stats_ is None:
            raise RuntimeError("fit first")
        lbl = self.labelCol
        dims = df.select(
            idCol, F.posexplode(self.vecCol).alias("dim", "val")
        ).withColumn("val", F.col("val").cast("double"))
        ll = (
            dims.join(F.broadcast(self.stats_), "dim")
            .groupBy(idCol, lbl)
            .agg(
                F.sum(
                    -0.5 * F.log(2 * np.pi * F.col("var"))
                    - (F.col("val") - F.col("mu")) ** 2 / (2 * F.col("var"))
                ).alias("loglik")
            )
            .join(F.broadcast(self.priors_), lbl)
            .select(idCol, lbl, (F.col("loglik") + F.col("log_prior")).alias("score"))
        )
        w = Window.partitionBy(idCol).orderBy(F.col("score").desc(), lbl)
        return (
            ll.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(idCol, F.col(lbl).alias("prediction"), "score")
        )


# ---------------------------------------------------------- linear/mllib

class _MllibWrapper(SparkBaseEstimator):
    _cls = None
    _extra: dict = {}

    def __init__(self, featuresCol: str = "features", labelCol: str = "label",
                 maxIter: int = 50, regParam: float = 0.0):
        self.featuresCol = featuresCol
        self.labelCol = labelCol
        self.maxIter = maxIter
        self.regParam = regParam
        self.model_ = None

    def fit(self, df: DataFrame):
        est = self._cls(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            maxIter=self.maxIter, regParam=self.regParam, **self._extra,
        )
        self.model_ = est.fit(df)
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        return self.model_.transform(df)

    transform = predict

    @property
    def coef_(self) -> np.ndarray:
        return np.asarray(self.model_.coefficients)

    @property
    def intercept_(self) -> float:
        return float(self.model_.intercept)


class SparkLinearRegression(_MllibWrapper):
    """[ref: splearn SparkLinearRegression · C:H] — exact distributed
    solver (WLS/L-BFGS) instead of per-partition OLS averaging."""
    _cls = _LinReg


class SparkLogisticRegression(_MllibWrapper):
    """[ref: splearn SparkLogisticRegression · C:H] — L-BFGS instead
    of parameter averaging."""
    _cls = _LogReg


class SparkLinearSVC(_MllibWrapper):
    """[ref: splearn SparkLinearSVC · C:H] — OWLQN hinge-loss solver."""
    _cls = _LinearSVC


class SparkKMeans(SparkBaseEstimator):
    """[ref: splearn SparkKMeans · C:H] — delegates to MLlib KMeans
    (k-means‖ init), as the reference did.

    ``partial_fit`` (r8) adds the mini-batch incremental contract in
    MLlib StreamingKMeans style (decay 1.0, i.e. pure cumulative):
    each batch is assigned to the nearest current centers in ONE
    distributed pass (per-cluster count + per-dim sum, collected at
    the bounded k×d grain), then centers move to the weighted mean
    c' = (c·n_old + Σx_batch) / (n_old + n_batch). A partial_fit
    chain is deterministic given the init centers and is asserted
    equal to a numpy replica of the same updates in
    tests/test_refit_parity.py. Continuation AFTER fit() is supported:
    MLlib's training summary provides the per-cluster sizes that seed
    the incremental counts."""

    def __init__(self, n_clusters: int = 8, seed: int = 42,
                 featuresCol: str = "features",
                 init_centers: "np.ndarray | None" = None):
        self.n_clusters = n_clusters
        self.seed = seed
        self.featuresCol = featuresCol
        self.model_ = None
        self.centers_: np.ndarray | None = (
            None if init_centers is None
            # np.array (not asarray): always copy, so in-place center
            # updates never mutate the caller's array
            else np.array(init_centers, dtype=np.float64)
        )
        self.counts_: np.ndarray | None = (
            None if init_centers is None
            else np.zeros(len(init_centers), dtype=np.int64)
        )

    def fit(self, df: DataFrame) -> "SparkKMeans":
        self.centers_ = self.counts_ = None  # refit contract
        self.model_ = _KMeans(
            k=self.n_clusters, seed=self.seed, featuresCol=self.featuresCol
        ).fit(df)
        return self

    def _batch_stats(self, df: DataFrame) -> list:
        """One distributed pass: nearest-center assignment + per-
        cluster sufficient stats, reduced to k×(d+1) rows."""
        import pandas as pd
        from pyspark.ml.functions import vector_to_array

        b_centers = df.sparkSession.sparkContext.broadcast(self.centers_)

        def stats(batches):
            C = b_centers.value
            c2 = (C ** 2).sum(1)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([np.asarray(v, np.float64) for v in pdf["_x"]])
                lab = (-2.0 * (X @ C.T) + c2[None, :]).argmin(1)
                rows = []
                for cid in np.unique(lab):
                    sel = X[lab == cid]
                    rows.append((int(cid), -1, float(len(sel))))
                    for dim, s in enumerate(sel.sum(0)):
                        rows.append((int(cid), dim, float(s)))
                yield pd.DataFrame(rows, columns=["cid", "dim", "s"])

        arr = df.select(vector_to_array(self.featuresCol).alias("_x"))
        return (
            arr.mapInPandas(stats, schema="cid int, dim int, s double")
            .groupBy("cid", "dim").agg(F.sum("s").alias("s"))
            .collect()  # bounded: k × (d+1)
        )

    def partial_fit(self, df: DataFrame) -> "SparkKMeans":
        if self.centers_ is None:
            if self.model_ is not None:
                # continue from fit(): centers + summary cluster sizes
                self.centers_ = np.array(self.model_.clusterCenters())
                self.counts_ = np.array(
                    self.model_.summary.clusterSizes, dtype=np.int64
                )
                self.model_ = None  # incremental path takes over
            else:
                self._init_centers(df)
        rows = self._batch_stats(df)
        if not rows:
            raise ValueError("partial_fit called with an empty batch")
        k, d = self.centers_.shape
        n_new = np.zeros(k)
        s_new = np.zeros((k, d))
        for r in rows:
            if r["dim"] == -1:
                n_new[r["cid"]] = r["s"]
            else:
                s_new[r["cid"], r["dim"]] = r["s"]
        moved = n_new > 0
        tot = self.counts_ + n_new
        self.centers_[moved] = (
            self.centers_[moved] * self.counts_[moved, None]
            + s_new[moved]
        ) / tot[moved, None]
        self.counts_ = tot.astype(np.int64)
        return self

    def _init_centers(self, df: DataFrame) -> None:
        """Seeded k-means++ on a bounded driver-side sample of the
        first batch (the same bounded-sample discipline as the IVF
        coarse quantizer — driver state stays O(k·d))."""
        from pyspark.ml.functions import vector_to_array

        sample = (
            df.select(vector_to_array(self.featuresCol).alias("_x"))
            .limit(4096).toPandas()["_x"]
        )
        X = np.array([np.asarray(v, np.float64) for v in sample])
        rng = np.random.RandomState(self.seed)
        k = self.n_clusters
        centers = [X[rng.randint(len(X))]]
        for _ in range(1, k):
            d2 = np.min(
                [((X - c) ** 2).sum(1) for c in centers], axis=0
            )
            p = d2 / d2.sum() if d2.sum() > 0 else None
            centers.append(X[rng.choice(len(X), p=p)])
        self.centers_ = np.array(centers)
        self.counts_ = np.zeros(k, dtype=np.int64)

    def predict(self, df: DataFrame) -> DataFrame:
        if self.model_ is not None:
            return self.model_.transform(df)
        if self.centers_ is None:
            raise RuntimeError("fit or partial_fit first")
        from pyspark.ml.functions import vector_to_array
        from pyspark.sql.functions import pandas_udf

        b_centers = df.sparkSession.sparkContext.broadcast(self.centers_)

        @pandas_udf("int")
        def nearest(s):
            import pandas as pd
            C = b_centers.value
            c2 = (C ** 2).sum(1)
            X = np.array([np.asarray(v, np.float64) for v in s])
            if len(X) == 0:
                return pd.Series([], dtype="int32")
            lab = (-2.0 * (X @ C.T) + c2[None, :]).argmin(1)
            return pd.Series(lab.astype("int32"))

        return df.withColumn(
            "prediction", nearest(vector_to_array(self.featuresCol))
        )

    @property
    def cluster_centers_(self) -> np.ndarray:
        if self.centers_ is not None:
            return self.centers_
        return np.array(self.model_.clusterCenters())


def _distributed_gram(df: DataFrame, col: str) -> np.ndarray:
    """d×d Gram matrix XᵀX of an array column, summed distributedly
    in long form (one Arrow pass, d² keys) — only the d×d result
    reaches the driver. Raises on an empty input."""
    import pandas as pd

    def partial_gram(batches):
        for pdf in batches:
            X = np.asarray([np.asarray(v, np.float64) for v in pdf[col]])
            if len(X) == 0:
                continue
            G = X.T @ X
            d = G.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame({"i": ii.ravel(), "j": jj.ravel(), "g": G.ravel()})

    gl = (
        df.select(col)
        .mapInPandas(partial_gram, schema="i int, j int, g double")
        .groupBy("i", "j").agg(F.sum("g").alias("g"))
        .toPandas()
    )
    if len(gl) == 0:
        raise ValueError("empty input: no vectors to aggregate")
    d = int(gl["i"].max()) + 1
    G = np.zeros((d, d))
    G[gl["i"], gl["j"]] = gl["g"]
    return G


class SparkTruncatedSVD(SparkBaseEstimator):
    """[ref: splearn SparkTruncatedSVD · C:M] — Gram matrix via
    Arrow-batched partial XᵀX (distributed sum), local eigh on the
    driver's d×d result. Driver state is O(d²), independent of rows.

    ``partial_fit`` (r9) closes the reference family's last
    incremental rung: the Gram matrix is exact under addition, so
    accumulating per-block XᵀX and re-decomposing gives a partial_fit
    chain EQUAL to one fit on the concatenation — no low-rank
    approximation drift (stronger than sklearn IncrementalPCA's
    contract; asserted in tests/test_refit_parity.py)."""

    def __init__(self, n_components: int = 8, vecCol: str = "embedding"):
        self.n_components = n_components
        self.vecCol = vecCol
        self.singular_values_: np.ndarray | None = None
        self.components_: np.ndarray | None = None
        self._gram: np.ndarray | None = None  # partial_fit accumulator

    def _decompose(self, G: np.ndarray) -> None:
        vals, vecs = np.linalg.eigh(G)
        order = np.argsort(vals)[::-1][: self.n_components]
        self.singular_values_ = np.sqrt(np.clip(vals[order], 0, None))
        self.components_ = vecs[:, order].T

    def fit(self, df: DataFrame) -> "SparkTruncatedSVD":
        self._gram = None  # refit contract
        self._decompose(_distributed_gram(df, self.vecCol))
        return self

    def partial_fit(self, df: DataFrame) -> "SparkTruncatedSVD":
        if self._gram is None and self.components_ is not None:
            raise RuntimeError(
                "partial_fit after fit() is not supported: feed every "
                "block incrementally with partial_fit from the start, "
                "or refit with fit()"
            )
        G = _distributed_gram(df, self.vecCol)
        if self._gram is None:
            self._gram = G
        elif self._gram.shape != G.shape:
            raise ValueError(
                f"partial_fit batch dimensionality {G.shape[0]} != "
                f"accumulated {self._gram.shape[0]}"
            )
        else:
            self._gram += G
        self._decompose(self._gram)
        return self

    def transform(self, df: DataFrame, idCol: str = "vec_id") -> DataFrame:
        """Project rows onto the fitted components (X · Vᵀ) via a
        broadcast components matrix inside an Arrow batch transform."""
        import pandas as pd

        if self.components_ is None:
            raise RuntimeError("fit first")
        comp = df.sparkSession.sparkContext.broadcast(self.components_)
        col, k = self.vecCol, self.n_components

        def project(batches):
            V = comp.value
            for pdf in batches:
                X = np.asarray([np.asarray(v, np.float64) for v in pdf[col]])
                P = X @ V.T if len(X) else np.zeros((0, k))
                yield pd.DataFrame({"vec_id": pdf[idCol], "projection": list(map(list, P))})

        return df.select(idCol, col).mapInPandas(
            project, schema="vec_id long, projection array<double>"
        )


class SparkPCA(SparkBaseEstimator):
    """PCA via the distributed covariance matrix: ONE Arrow-batched
    pass emits partial XᵀX, column sums, and counts; partials are
    summed distributedly in long form and only the d×d result reaches
    the driver (centered there: XcᵀXc = G − n·μμᵀ) for a local eigh.
    Driver state is O(d²), independent of rows — same blocked-matrix
    scaling story as SparkTruncatedSVD, plus mean-centering.

    Matches sklearn.decomposition.PCA up to per-component sign
    (eigenvector sign is arbitrary); explained_variance_ uses the
    same 1/(n−1) normalization.

    ``partial_fit`` (r9): the (n, Σx, XᵀX) triple is exact under
    addition, so accumulating it per block and re-centering on the
    driver gives a partial_fit chain EQUAL to one fit on the
    concatenation — no IncrementalPCA-style low-rank drift (asserted
    against both fit() and sklearn in tests/test_refit_parity.py)."""

    def __init__(self, n_components: int = 4, vecCol: str = "embedding"):
        self.n_components = n_components
        self.vecCol = vecCol
        self.mean_: np.ndarray | None = None
        self.components_: np.ndarray | None = None
        self.explained_variance_: np.ndarray | None = None
        self.explained_variance_ratio_: np.ndarray | None = None
        self._acc: list | None = None  # [n, sums(d), gram(d,d)]

    @staticmethod
    def _moments(df: DataFrame, col: str) -> tuple[float, np.ndarray, np.ndarray]:
        """(n, column sums, XᵀX) in ONE Arrow-batched distributed
        pass: i=-1,j=-1 carries the row count; j=-1 carries column
        sums; i,j>=0 carry the gram entries — one shuffled long table,
        d²+d+1 keys total."""
        import pandas as pd

        def partials(batches):
            for pdf in batches:
                X = np.asarray([np.asarray(v, np.float64) for v in pdf[col]])
                if len(X) == 0:
                    continue
                G = X.T @ X
                d = G.shape[0]
                ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
                yield pd.DataFrame({
                    "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                    "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                    "g": np.concatenate([G.ravel(), X.sum(axis=0), [float(len(X))]]),
                })

        pl = (
            df.select(col)
            .mapInPandas(partials, schema="i int, j int, g double")
            .groupBy("i", "j").agg(F.sum("g").alias("g"))
            .toPandas()
        )
        if len(pl) == 0:
            raise ValueError("empty input: no vectors to aggregate")
        n = float(pl.loc[(pl["i"] == -1) & (pl["j"] == -1), "g"].iloc[0])
        sums = pl[(pl["i"] >= 0) & (pl["j"] == -1)].sort_values("i")["g"].to_numpy()
        d = len(sums)
        gram = pl[pl["j"] >= 0]
        G = np.zeros((d, d))
        G[gram["i"], gram["j"]] = gram["g"]
        return n, sums, G

    def _finalize(self, n: float, sums: np.ndarray, G: np.ndarray) -> None:
        mu = sums / n
        C = (G - n * np.outer(mu, mu)) / (n - 1.0)
        vals, vecs = np.linalg.eigh(C)
        order = np.argsort(vals)[::-1][: self.n_components]
        self.mean_ = mu
        self.components_ = vecs[:, order].T
        self.explained_variance_ = np.clip(vals[order], 0, None)
        self.explained_variance_ratio_ = self.explained_variance_ / np.clip(
            vals, 0, None
        ).sum()

    def fit(self, df: DataFrame) -> "SparkPCA":
        self._acc = None  # refit contract
        self._finalize(*self._moments(df, self.vecCol))
        return self

    def partial_fit(self, df: DataFrame) -> "SparkPCA":
        if self._acc is None and self.components_ is not None:
            raise RuntimeError(
                "partial_fit after fit() is not supported: feed every "
                "block incrementally with partial_fit from the start, "
                "or refit with fit()"
            )
        n, sums, G = self._moments(df, self.vecCol)
        if self._acc is None:
            self._acc = [n, sums, G]
        elif self._acc[2].shape != G.shape:
            raise ValueError(
                f"partial_fit batch dimensionality {G.shape[0]} != "
                f"accumulated {self._acc[2].shape[0]}"
            )
        else:
            self._acc[0] += n
            self._acc[1] += sums
            self._acc[2] += G
        self._finalize(*self._acc)
        return self

    def transform(self, df: DataFrame, idCol: str = "vec_id") -> DataFrame:
        """(X − μ) · Vᵀ via broadcast mean/components inside an Arrow
        batch transform — model-sized broadcast, row-local compute."""
        import pandas as pd

        if self.components_ is None:
            raise RuntimeError("fit first")
        sc = df.sparkSession.sparkContext
        model = sc.broadcast((self.mean_, self.components_))
        col, k = self.vecCol, self.n_components

        def project(batches):
            mu, V = model.value
            for pdf in batches:
                X = np.asarray([np.asarray(v, np.float64) for v in pdf[col]])
                P = (X - mu) @ V.T if len(X) else np.zeros((0, k))
                yield pd.DataFrame({"vec_id": pdf[idCol], "scores": list(map(list, P))})

        return df.select(idCol, col).mapInPandas(
            project, schema="vec_id long, scores array<double>"
        )


class SparkVarianceThreshold(SparkBaseEstimator):
    """[ref: splearn SparkVarianceThreshold · C:M] — per-dim variance
    in one aggregate; keeps dims with var > threshold.

    ``partial_fit`` (r8) implements the reference's per-block
    incremental contract: each batch contributes exact per-dim
    (n, Σx, Σx²) sufficient statistics, merged additively into driver
    state (bounded by d), so a partial_fit chain equals one fit on the
    concatenation — sample variance, matching fit's var_samp
    (asserted in tests/test_refit_parity.py)."""

    def __init__(self, threshold: float = 0.0, vecCol: str = "embedding"):
        self.threshold = threshold
        self.vecCol = vecCol
        self.variances_: DataFrame | None = None
        self._acc: list | None = None  # [n, sum(d), sumsq(d)]

    def fit(self, df: DataFrame) -> "SparkVarianceThreshold":
        self._acc = None  # refit contract
        dims = df.select(F.posexplode(self.vecCol).alias("dim", "val"))
        self.variances_ = dims.groupBy("dim").agg(
            F.var_samp(F.col("val").cast("double")).alias("var")
        )
        return self

    def partial_fit(self, df: DataFrame) -> "SparkVarianceThreshold":
        rows = (
            df.select(F.posexplode(self.vecCol).alias("_d", "_v"))
            .withColumn("_v", F.col("_v").cast("double"))
            .groupBy("_d")
            .agg(F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_s"),
                 F.sum(F.col("_v") * F.col("_v")).alias("_s2"))
            .collect()  # bounded: d rows
        )
        if not rows:
            raise ValueError("partial_fit called with an empty batch")
        d = 1 + max(r["_d"] for r in rows)
        if self._acc is None:
            if self.variances_ is not None:
                raise RuntimeError(
                    "partial_fit after fit() is not supported: fit() "
                    "keeps no mergeable sufficient statistics"
                )
            self._acc = [0, np.zeros(d), np.zeros(d)]
        if len(self._acc[1]) != d:
            raise ValueError(
                f"partial_fit batch dimensionality {d} != "
                f"accumulated {len(self._acc[1])}"
            )
        for r in rows:
            self._acc[1][r["_d"]] += r["_s"]
            self._acc[2][r["_d"]] += r["_s2"]
        self._acc[0] += rows[0]["_n"]  # every dim sees every row
        n, s, s2 = self._acc
        var = (s2 - s * s / n) / (n - 1) if n > 1 else np.full(d, np.nan)
        self.variances_ = df.sparkSession.createDataFrame(
            [(i, float(var[i])) for i in range(d)], "dim int, var double"
        )
        return self

    def get_support(self) -> list[int]:
        if self.variances_ is None:
            raise RuntimeError("fit first")
        kept = (
            self.variances_.filter(F.col("var") > self.threshold)
            .select("dim").toPandas()["dim"]  # ≤ d values — bounded
        )
        return sorted(int(x) for x in kept)


class SparkStandardScaler(SparkBaseEstimator):
    """StandardScaler over a scalar column: mean/std in one aggregate,
    broadcast back (no window over unpartitioned data)."""

    def __init__(self, inputCol: str = "value", outputCol: str = "value_scaled"):
        self.inputCol = inputCol
        self.outputCol = outputCol
        self.mean_: float | None = None
        self.std_: float | None = None
        self._acc: list | None = None  # [n, sum, sumsq]

    def partial_fit(self, df: DataFrame) -> "SparkStandardScaler":
        """Per-block incremental fit: exact (n, Σx, Σx²) merge; the
        chain equals one fit on the concatenation (sample stddev,
        matching fit's stddev_samp)."""
        row = df.agg(
            F.count(self.inputCol).alias("n"),
            F.sum(F.col(self.inputCol).cast("double")).alias("s"),
            F.sum(F.col(self.inputCol).cast("double") ** 2).alias("s2"),
        ).first()
        if not row["n"]:
            raise ValueError("partial_fit called with an empty batch")
        if self._acc is None:
            self._acc = [0, 0.0, 0.0]
        self._acc[0] += row["n"]
        self._acc[1] += row["s"]
        self._acc[2] += row["s2"]
        n, s, s2 = self._acc
        self.mean_ = s / n
        # n == 1: sample stddev is undefined — NaN, matching fit's
        # stddev_samp (NULL) semantics, not 0.0 (ADVICE r7: the two
        # paths must agree and transform must not divide by zero)
        self.std_ = (
            float(np.sqrt((s2 - s * s / n) / (n - 1))) if n > 1
            else float("nan")
        )
        return self

    def fit(self, df: DataFrame) -> "SparkStandardScaler":
        self._acc = None  # refit contract
        row = df.agg(
            F.avg(self.inputCol).alias("mu"),
            F.stddev_samp(self.inputCol).alias("sigma"),
        ).first()
        self.mean_ = float(row["mu"])
        self.std_ = float(row["sigma"]) if row["sigma"] is not None else float("nan")
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.mean_ is None:
            raise RuntimeError("fit first")
        return df.withColumn(
            self.outputCol, (F.col(self.inputCol) - self.mean_) / self.std_
        )


# -------------------------------------------------------- composition

class SparkPipeline(SparkBaseEstimator):
    """[ref: splearn SparkPipeline · C:H] — sequential fit→transform
    chaining of SparkBaseEstimator steps over ONE DataFrame (the
    DictRDD of the reference is just named columns here)."""

    def __init__(self, steps: list[tuple[str, SparkBaseEstimator]]):
        self.steps = steps

    def fit(self, df: DataFrame) -> "SparkPipeline":
        cur = df
        for _, est in self.steps[:-1]:
            cur = est.fit(cur).transform(cur)
        self.steps[-1][1].fit(cur)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        cur = df
        for _, est in self.steps:
            cur = est.transform(cur)
        return cur

    def predict(self, df: DataFrame) -> DataFrame:
        cur = df
        for _, est in self.steps[:-1]:
            cur = est.transform(cur)
        last = self.steps[-1][1]
        return last.predict(cur)


class SparkGridSearchCV(SparkBaseEstimator):
    """[ref: splearn SparkGridSearchCV · C:H] — MLlib CrossValidator
    over a param grid; folds and candidate fits run distributed."""

    def __init__(self, estimator, param_grid: dict, evaluator, numFolds: int = 3,
                 seed: int = 42, parallelism: int = 2):
        self.estimator = estimator
        self.param_grid = param_grid
        self.evaluator = evaluator
        self.numFolds = numFolds
        self.seed = seed
        self.parallelism = parallelism
        self.best_params_: dict | None = None
        self.cv_results_: list | None = None

    def fit(self, df: DataFrame) -> "SparkGridSearchCV":
        builder = ParamGridBuilder()
        for pname, values in self.param_grid.items():
            builder = builder.addGrid(getattr(self.estimator, pname), values)
        grid = builder.build()
        cv = CrossValidator(
            estimator=self.estimator, estimatorParamMaps=grid,
            evaluator=self.evaluator, numFolds=self.numFolds,
            seed=self.seed, parallelism=self.parallelism,
        )
        model = cv.fit(df)
        self.model_ = model
        self.cv_results_ = [
            ({p.name: v for p, v in g.items()}, float(m))
            for g, m in zip(grid, model.avgMetrics)
        ]
        # MLlib minimizes when isLargerBetter() is False (e.g. RMSE):
        # best_params_ must agree with model.bestModel that predict() uses
        if self.evaluator.isLargerBetter():
            best_idx = int(np.argmax(model.avgMetrics))
        else:
            best_idx = int(np.argmin(model.avgMetrics))
        self.best_params_ = self.cv_results_[best_idx][0]
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        return self.model_.transform(df)


# Kept for API discoverability: the ML pipeline composition used by
# q_ml_pipeline (Tokenizer→HashingTF→IDF→LogReg) via native pyspark.ml
def make_text_classification_pipeline(numFeatures: int = 1024,
                                      labelCol: str = "binlabel") -> _MlPipeline:
    from pyspark.ml.feature import Tokenizer

    return _MlPipeline(stages=[
        Tokenizer(inputCol="text", outputCol="toks"),
        _HashingTF(inputCol="toks", outputCol="rawtf", numFeatures=numFeatures),
        _IDF(inputCol="rawtf", outputCol="features"),
        _LogReg(labelCol=labelCol, maxIter=30, regParam=0.01),
    ])


class SparkSGDClassifier(SparkBaseEstimator):
    """Incremental binary logistic regression with TRUE ``partial_fit``
    semantics — the reference's per-block partial_fit + merge contract
    [ref: splearn/linear_model/stochastic_gradient.py · C:H], expressed
    Spark-first instead of averaging per-partition sklearn fits.

    Each ``partial_fit(df)`` call performs one full-batch gradient step
    of logistic loss over THAT batch, updating persistent driver state
    (``coef_``, ``intercept_``) — so streaming new blocks through
    repeated partial_fit calls is genuine incremental learning, and
    ``fit`` is just ``epochs`` passes over one block.

    The gradient is computed as a DataFrame aggregation in the
    treeAggregate map/merge shape: per-row residuals via codegen'd
    zip_with/aggregate (no Python in the row path), then posexplode +
    groupBy(pos) produces per-partition partial sums merged into a
    (dim+1)-vector — the ONLY thing that ever reaches the driver.
    Deterministic given the input (full-batch, no sampling), so tests
    assert near-exact agreement with a numpy replica (float summation
    order is the only divergence).
    """

    def __init__(self, featuresCol: str = "features", labelCol: str = "label",
                 lr: float = 0.5, reg: float = 0.0, epochs: int = 10,
                 warm_start: bool = False):
        self.featuresCol = featuresCol
        self.labelCol = labelCol
        self.lr = lr
        self.reg = reg
        self.epochs = epochs
        self.warm_start = warm_start
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self.n_iter_: int = 0

    def _margin(self, w: np.ndarray, b: float):
        wlit = F.array(*[F.lit(float(x)) for x in w])
        return F.lit(float(b)) + F.aggregate(
            F.zip_with(F.col(self.featuresCol).cast("array<double>"), wlit,
                       lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def partial_fit(self, df: DataFrame) -> "SparkSGDClassifier":
        if self.coef_ is None:
            dim = len(df.select(self.featuresCol).first()[0])
            self.coef_ = np.zeros(dim, dtype=np.float64)
        w, b = self.coef_, self.intercept_
        # resid = sigmoid(margin) - y, then one aggregation job emits
        # intercept (pos 0) + all coefficient partial sums + the row
        # count (pos -1) — a single pass over the batch
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-self._margin(w, b)))
                 - F.col(self.labelCol).cast("double"))
        ex = df.select(
            resid.alias("r"),
            F.concat(F.array(F.lit(1.0)),
                     F.col(self.featuresCol).cast("array<double>")).alias("x"),
        ).select("r", F.posexplode("x").alias("pos", "v"))
        rows = (
            ex.groupBy("pos")
            .agg(F.sum(F.col("r") * F.col("v")).alias("g"), F.count("*").alias("c"))
            .collect()
        )
        if not rows:
            raise ValueError("partial_fit called with an empty batch")
        g = np.zeros(len(w) + 1)
        # pos 0 is the intercept column, present in every row, so its
        # count IS the batch size; per-pos counts can differ if feature
        # arrays are ragged, which we reject rather than average over.
        n = None
        counts = set()
        for r in rows:
            g[r["pos"]] = r["g"]
            counts.add(r["c"])
            if r["pos"] == 0:
                n = r["c"]
        if len(counts) > 1:
            raise ValueError(
                f"inconsistent feature dimensions in batch: per-position "
                f"row counts {sorted(counts)} differ (ragged or null arrays)"
            )
        grad = g[1:] / n + self.reg * w
        self.coef_ = w - self.lr * grad
        self.intercept_ = b - self.lr * (g[0] / n)
        self.n_iter_ += 1
        return self

    def fit(self, df: DataFrame) -> "SparkSGDClassifier":
        # sklearn refit contract: fit() starts from scratch unless
        # warm_start=True (r7 — previously a second fit() silently
        # continued from the first fit's weights, which is
        # partial_fit's job, not fit's; caught by the refit-parity
        # sweep in tests/test_refit_parity.py)
        if not self.warm_start:
            self.coef_ = None
            self.intercept_ = 0.0
            self.n_iter_ = 0
        # one cached projection feeds every epoch; released on exit
        proj = df.select(self.featuresCol, self.labelCol).persist()
        try:
            proj.count()  # materialize once, not per epoch
            for _ in range(self.epochs):
                self.partial_fit(proj)
        finally:
            proj.unpersist()
        return self

    def decision_function(self, df: DataFrame) -> DataFrame:
        return df.withColumn("margin", self._margin(self.coef_, self.intercept_))

    def predict(self, df: DataFrame) -> DataFrame:
        return self.decision_function(df).withColumn(
            "prediction", (F.col("margin") > 0).cast("double")
        )


class SparkBernoulliNB(SparkMultinomialNB):
    """[ref: splearn SparkBernoulliNB · C:M] — MLlib NaiveBayes with
    bernoulli model type (features must be binary; pair with
    HashingTF(binary=True) or a binarized count vector). Inherits the
    r7 ``partial_fit`` sufficient-statistics contract; the stats
    scoring uses the bernoulli likelihood (both presence AND absence
    terms) with θ_c = (doc_count_c + α)/(n_c + 2α)."""

    _model_type = "bernoulli"

    @property
    def feature_log_prob_(self) -> dict:
        out = {}
        for y, fc in self.feature_count_.items():
            theta = (fc + self.alpha) / (self.class_count_[y] + 2 * self.alpha)
            out[y] = np.log(theta)
        return out

    def _stats_score_exprs(self, arr):
        exprs = {}
        lp = self.class_log_prior_
        for y, fc in self.feature_count_.items():
            theta = (fc + self.alpha) / (self.class_count_[y] + 2 * self.alpha)
            w = np.log(theta) - np.log1p(-theta)  # per-dim presence weight
            const = lp[y] + float(np.log1p(-theta).sum())
            wlit = F.array(*[F.lit(float(v)) for v in w])
            exprs[y] = F.lit(const) + F.aggregate(
                F.zip_with(arr, wlit, lambda x, ww: x * ww),
                F.lit(0.0), lambda acc, v: acc + v)
        return exprs


class SparkDictVectorizer(SparkBaseEstimator):
    """[ref: splearn SparkDictVectorizer · C:M] — map-typed feature
    dicts -> long-form (id, feature, value) with stable feature ids.
    Input column must be MapType(string, numeric) (use from_json for
    JSON props, e.g. the events.props fixture)."""

    def __init__(self, inputCol: str = "props", idCol: str = "event_id"):
        self.inputCol = inputCol
        self.idCol = idCol
        self.feature_names_: DataFrame | None = None

    def _entries(self, df: DataFrame) -> DataFrame:
        return df.select(
            self.idCol, F.explode(self.inputCol).alias("feature", "value")
        )

    def fit(self, df: DataFrame) -> "SparkDictVectorizer":
        from ..operators.ids import stable_sorted_ids

        self.feature_names_ = stable_sorted_ids(
            self._entries(df).select("feature").distinct(),
            "feature", id_col="feature_id",
        )
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.feature_names_ is None:
            raise RuntimeError("fit first")
        return self._entries(df).join(
            F.broadcast(self.feature_names_), "feature"
        ).select(self.idCol, "feature", "feature_id",
                 F.col("value").cast("double").alias("value"))


class SparkFeatureUnion(SparkBaseEstimator):
    """[ref: splearn SparkFeatureUnion · C:M] — horizontal concat of
    several transformers' outputs, joined on the shared id column
    (the DataFrame-native form of per-block hstack)."""

    def __init__(self, transformer_list: list[tuple[str, SparkBaseEstimator]],
                 idCol: str = "doc_id"):
        self.transformer_list = transformer_list
        self.idCol = idCol

    def fit(self, df: DataFrame) -> "SparkFeatureUnion":
        for _, t in self.transformer_list:
            t.fit(df)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        out = None
        for name, t in self.transformer_list:
            part = t.transform(df)
            renamed = part.select(
                self.idCol,
                *[F.col(c).alias(f"{name}__{c}") for c in part.columns if c != self.idCol],
            )
            out = renamed if out is None else out.join(renamed, self.idCol, "outer")
        return out
