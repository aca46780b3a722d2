"""ALS value checks (wave 137's rows-only MLlib factorization): the
fitted model must beat the global-mean baseline on training RMSE, and
the query's recommendations must be well-formed (unpurchased items,
3 per user, rank-ordered).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.registry import all_queries


def _ratings(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.avg("l_quantity").cast("float").alias("rating"))
    )


def test_als_beats_global_mean_baseline(spark, sf_dir):
    from pyspark.ml.recommendation import ALS

    ratings = _ratings(spark, sf_dir).cache()
    als = ALS(rank=8, maxIter=5, seed=42, regParam=0.1,
              userCol="user", itemCol="item", ratingCol="rating",
              coldStartStrategy="drop")
    model = als.fit(ratings)
    pred = model.transform(ratings).toPandas()
    resid = pred["rating"] - pred["prediction"]
    rmse = float(np.sqrt((resid ** 2).mean()))

    pdf = ratings.toPandas()
    base_rmse = float(pdf["rating"].std(ddof=0))
    assert rmse < base_rmse, (rmse, base_rmse)

    # factor shapes: rank-8 vectors for every user/item seen
    uf = model.userFactors.toPandas()
    itf = model.itemFactors.toPandas()
    assert set(map(len, uf["features"])) == {8}
    assert set(map(len, itf["features"])) == {8}
    assert len(uf) == pdf["user"].nunique()
    assert len(itf) == pdf["item"].nunique()
    ratings.unpersist()


def test_als_query_recommends_unpurchased(spark, sf_dir):
    got = all_queries()["q_ml_als"](spark, sf_dir).toPandas()
    assert len(got) > 0
    assert list(got.columns) == ["c_custkey", "rk", "l_partkey", "score"]
    # exactly ranks 1..3 per customer, no repeats
    for _, grp in got.groupby("c_custkey"):
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))
        assert grp["l_partkey"].is_unique
        assert (grp["score"].values[:-1] >= grp["score"].values[1:]).all()
    # none of the recommendations were already purchased
    purchased = _ratings(spark, sf_dir).toPandas()
    seen = set(zip(purchased["user"].astype(int),
                   purchased["item"].astype(int)))
    hits = set(zip(got["c_custkey"].astype(int),
                   got["l_partkey"].astype(int))) & seen
    assert not hits, hits
