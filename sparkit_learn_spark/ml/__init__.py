"""sklearn-style estimator API over DataFrames — the migration surface
for users of the reference (splearn).

Name-for-name counterparts of the reference's public estimators
[SURVEY §2A.2–2A.5], each re-based on DataFrames + MLlib instead of
blocked RDDs + averaged sklearn fits. The fit/transform/predict and
``get_params``/``set_params`` contract is preserved; the data model
is a DataFrame with named columns instead of a DictRDD ('X','y').
"""

from .estimators import (  # noqa: F401
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
