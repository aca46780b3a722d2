"""Round-8 wave 137: repeated-span extraction (the span-merging step
of Lee et al. 2022 exact-substring dedup — wave 132 found duplicated
windows; this merges consecutive duplicated offsets into maximal
spans, the actual cut points a span-level deduper removes),
k-anonymity audit (the data-governance check run before releasing a
quasi-identified table), and MLlib ALS collaborative filtering (the
big MLlib surface the recommender queries hadn't exercised;
rows-only + error-bound pytest, the q_ml_kmeans contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import shingles, tokens
from ..registry import register
from .wave132 import WIN


@register(
    "q_llm_substring_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    w AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             array_to_string(toks[CAST(i AS INT):CAST(i AS INT)
                                  + {WIN - 1}], ' ') AS win
      FROM t, unnest(range(1, len(toks) - {WIN} + 2)) AS u(i)
      WHERE len(toks) >= {WIN}),
    dupw AS (
      SELECT win FROM w GROUP BY win
      HAVING COUNT(DISTINCT doc_id) > 1),
    d AS (SELECT w.doc_id, w.i FROM w JOIN dupw USING (win)),
    isl AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS run
      FROM (SELECT doc_id,
                   i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i)
                       AS g
            FROM d)
      GROUP BY doc_id, g),
    per AS (
      SELECT doc_id,
             CAST(MAX(run) + {WIN - 1} AS BIGINT) AS longest_span_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(run + {WIN - 1}) AS BIGINT) AS span_tokens_total
      FROM isl GROUP BY doc_id)
    SELECT doc_id, longest_span_tokens, n_spans, span_tokens_total
    FROM per
    ORDER BY longest_span_tokens DESC, doc_id LIMIT 15
    """,
)
def q_llm_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal repeated spans (Lee et al. 2022's span merging):
    consecutive duplicated {WIN}-token window offsets merged into
    islands — a run of r consecutive duplicated offsets is one
    verbatim span of r+{WIN}−1 tokens shared with another document.
    Reports the 15 docs with the longest copied span, plus their span
    count and total span tokens — exactly the per-doc cut list a
    span-level deduper would remove (vs wave 132's per-window rate,
    which can't tell one 100-token copy from ten scattered 10-token
    ones).

    Scale: windows are per-doc (no shuffle to build), the duplicated-
    window set is one hash aggregate, and the island merge is a
    per-doc window over that doc's duplicated offsets — partitioned by
    doc_id, never global."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks")).where(
        F.size("toks") >= WIN
    )
    w = t.select(
        "doc_id",
        F.posexplode(shingles(F.col("toks"), k=WIN)).alias("p", "win"),
    ).select("doc_id", (F.col("p") + 1).cast("long").alias("i"), "win")
    # duplicated-window detection in ONE pass: COUNT(DISTINCT doc_id)>1
    # over a window group ⟺ min(doc_id) ≠ max(doc_id) over the same
    # group, and min/max ARE window functions — so the window table is
    # built once and shuffled once by win, instead of aggregated (2
    # exchanges for the distinct) and then joined back against a second
    # full build of itself (guide §2.4: remove shuffles outright).
    wwin = Window.partitionBy("win")
    dup = (
        w.select(
            "doc_id", "i",
            F.min("doc_id").over(wwin).alias("mn"),
            F.max("doc_id").over(wwin).alias("mx"),
        )
        .where(F.col("mn") != F.col("mx"))
        .select("doc_id", "i")
    )
    isl = (
        dup.withColumn(
            "g",
            F.col("i")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("i")),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    per = isl.groupBy("doc_id").agg(
        (F.max("run") + (WIN - 1)).cast("long").alias("longest_span_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("run") + (WIN - 1)).cast("long")
        .alias("span_tokens_total"),
    )
    return per.orderBy(
        F.col("longest_span_tokens").desc(), "doc_id"
    ).limit(15)


@register(
    "q_dq_k_anonymity",
    oracle="""
    WITH qi AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
               COUNT(*) AS k
        FROM customer GROUP BY 1, 2, 3),
    b AS (
        SELECT CASE WHEN k >= 10 THEN 10 ELSE k END AS k_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(k) AS BIGINT) AS n_rows
        FROM qi GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM b)
    SELECT CAST(k_bucket AS BIGINT) AS k_bucket, n_classes, n_rows,
           ROUND(CAST(n_rows AS DOUBLE) / tot.t, 6) AS row_share,
           CASE WHEN k_bucket < 5 THEN 1 ELSE 0 END AS reident_risk
    FROM b CROSS JOIN tot
    ORDER BY k_bucket
    """,
)
def q_dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) of the customer table under
    the quasi-identifier (nation, market segment, account-balance
    band): equivalence-class size distribution, bucketed at 10+, with
    each bucket's row share and a re-identification-risk flag for
    classes below k=5 — the release-gate table a privacy review reads
    before publishing quasi-identified data.

    Scale: one hash aggregate to QI grain, one to bucket grain; the
    audit never materializes anything bigger than the class list."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    b = qi.groupBy(
        F.when(F.col("k") >= 10, 10).otherwise(F.col("k")).alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows"),
    )
    tot = b.agg(F.sum("n_rows").alias("t"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            F.col("k_bucket").cast("long").alias("k_bucket"),
            "n_classes",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("t"), 6)
            .alias("row_share"),
            F.when(F.col("k_bucket") < 5, 1).otherwise(0)
            .alias("reident_risk"),
        )
        .orderBy("k_bucket")
    )


@register("q_ml_als")  # rows-only: iterative MLlib factorization — error-bound pytest
def q_ml_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS collaborative filtering (MLlib's distributed matrix
    factorization — the one major MLlib block the recommender queries
    hadn't exercised): implicit-style ratings from purchase quantities
    (customer × part, mean l_quantity), rank-8 / 5-iteration ALS with
    a fixed seed, reporting each of the 10 most active customers' top
    3 recommendations among UNPURCHASED parts — the production recsys
    shape (train on interactions, recommend the complement).
    Float fixpoint + blocked factorization -> rows-only oracle class;
    tests/test_als.py bounds training RMSE beneath the global-mean
    baseline and checks factor shapes.

    Scale: MLlib ALS blocks users×items into a grid so each iteration
    is a pair of block-local least-squares sweeps — the canonical
    100 TB factorization; recommendForUserSubset bounds the scoring
    fan-out to the requested users."""
    from pyspark.ml.recommendation import ALS

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    ratings = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.avg("l_quantity").cast("float").alias("rating"))
        # r11 (guide §5): three consumers — als.fit, the top-10 active
        # users aggregate, and the purchased anti-join side — each
        # re-ran the orders⋈lineitem join + groupBy. Persist the
        # (user,item,rating) frame once; fit materializes it.
        .persist()
    )
    als = ALS(
        rank=8, maxIter=5, seed=42, regParam=0.1,
        userCol="user", itemCol="item", ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    top_users = (
        ratings.groupBy("user").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user").limit(10).select("user")
    )
    recs = model.recommendForUserSubset(top_users, 20)
    flat = recs.select(
        "user", F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        F.col("user").cast("long").alias("c_custkey"),
        F.col("rec.item").cast("long").alias("l_partkey"),
        F.col("rec.rating").alias("score"),
    )
    purchased = ratings.select(
        F.col("user").cast("long").alias("c_custkey"),
        F.col("item").cast("long").alias("l_partkey"),
    )
    unseen = flat.join(purchased, ["c_custkey", "l_partkey"], "left_anti")
    ranked = unseen.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("c_custkey")
            .orderBy(F.col("score").desc(), "l_partkey")
        ),
    ).where(F.col("rk") <= 3)
    return ranked.select(
        "c_custkey", F.col("rk").cast("long").alias("rk"), "l_partkey",
        F.round("score", 6).alias("score"),
    ).orderBy("c_custkey", "rk")
