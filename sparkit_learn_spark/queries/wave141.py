"""Round-8 wave 141: the remaining MLlib blocks + a classic alignment
distance — FPGrowth frequent itemsets (EXACTLY oracled: with TPC-H
basket sizes ≤7 a bounded SQL enumeration reproduces the full answer,
so the MLlib miner is value-verified, not just row-counted), dynamic
time warping between national revenue curves (integer DP — rows-only
with a numpy replica pytest), and Gaussian mixture clustering over
the embedding table (seeded EM — rows-only with a label-recovery
pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: FPGrowth minimum support (fraction of baskets).
MIN_SUPPORT = 0.001

#: itemsets larger than this are impossible above MIN_SUPPORT on the
#: fixture (verified: the SQL enumeration finds no size-3 itemsets at
#: the support floor — baskets are ≤7 random parts, pair support is
#: already rare co-occurrence).
MAX_SET = 3

#: item universe compression: bucket parts so itemsets repeat.
ITEM_MOD = 50


@register(
    "q_ml_fpgrowth",
    oracle=f"""
    WITH baskets AS MATERIALIZED (
        -- MATERIALIZED is load-bearing (r9): DuckDB 1.0 inlines the
        -- CTE three times into the size-3 self-join and, with only
        -- parquet-level stats, can pick an inequality-first join
        -- order (b x c on item< alone ~ 3e9 rows) that spills past
        -- any temp cap. Materializing pins real cardinalities and
        -- the basket-equality hash join (hang -> 0.07 s at sf0.01).
        SELECT l_orderkey AS basket,
               l_partkey % {ITEM_MOD} AS item
        FROM lineitem GROUP BY 1, 2),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM baskets),
    one AS (
        SELECT CAST(item AS VARCHAR) AS itemset,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM baskets GROUP BY item),
    two AS (
        SELECT CAST(a.item AS VARCHAR) || ',' || CAST(b.item AS VARCHAR)
                   AS itemset,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM baskets a JOIN baskets b
          ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1),
    three AS (
        SELECT CAST(a.item AS VARCHAR) || ',' || CAST(b.item AS VARCHAR)
                   || ',' || CAST(c.item AS VARCHAR) AS itemset,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM baskets a
        JOIN baskets b ON b.basket = a.basket AND a.item < b.item
        JOIN baskets c ON c.basket = a.basket AND b.item < c.item
        GROUP BY 1),
    allsets AS (
        SELECT * FROM one UNION ALL SELECT * FROM two
        UNION ALL SELECT * FROM three)
    SELECT itemset, freq,
           ROUND(CAST(freq AS DOUBLE) / nb.n, 6) AS support
    FROM allsets CROSS JOIN nb
    WHERE freq >= CEIL({MIN_SUPPORT} * nb.n)
    ORDER BY freq DESC, itemset LIMIT 25
    """,
)
def q_ml_fpgrowth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FPGrowth frequent itemsets over order baskets (items =
    part-key buckets mod {ITEM_MOD} so co-occurrence repeats), min
    support {MIN_SUPPORT}; top 25 itemsets. EXACTLY oracled: FPGrowth
    is an exact algorithm and TPC-H baskets hold ≤7 items, so a
    bounded size-≤{MAX_SET} SQL enumeration reproduces the complete
    answer — the itemset strings (items sorted ascending, joined by
    ',') hash-match across engines.

    Scale: FPGrowth is the distributed miner built FOR this shape
    (conditional FP-trees sharded by item suffix); the SQL
    enumeration is the VERIFIER, quadratic-in-basket only because
    baskets are bounded."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(
            F.col("l_orderkey").alias("basket"),
            (F.col("l_partkey") % ITEM_MOD).alias("item"),
        )
        .distinct()
        .groupBy("basket")
        .agg(F.collect_set("item").alias("items"))
        # pinned: the scalar count AND FPGrowth.fit both consume this
        # lineitem-scale lineage — without it the fact scans twice
        .localCheckpoint(eager=True)
    )
    nb = baskets.count()
    fp = FPGrowth(itemsCol="items", minSupport=MIN_SUPPORT)
    model = fp.fit(baskets)
    # The oracle enumerates itemsets only up to MAX_SET; larger
    # frequent itemsets DO exist above the support floor (size-5 at
    # sf0.001) but can never reach the top-25 because every superset
    # has freq ≤ its subsets. Guard the actual invariant: the best
    # >MAX_SET itemset must sit STRICTLY below the 25th-ranked
    # size-≤MAX_SET freq, else the oracle's truncated enumeration
    # would diverge — fail here with a clear message instead of as an
    # opaque driver hash mismatch (ADVICE r8).
    fi = model.freqItemsets.withColumn("sz", F.size("items"))
    fi = fi.localCheckpoint(eager=True)
    cutoff_rows = (fi.filter(F.col("sz") <= MAX_SET)
                   .orderBy(F.col("freq").desc()).limit(25)
                   .agg(F.min("freq"), F.count("*")).collect()[0])
    cutoff, n_small = cutoff_rows[0], cutoff_rows[1]
    large_max = (fi.filter(F.col("sz") > MAX_SET)
                 .agg(F.max("freq")).collect()[0][0])
    if large_max is not None and (n_small < 25 or large_max >= cutoff):
        raise AssertionError(
            f"q_ml_fpgrowth: a frequent itemset larger than "
            f"MAX_SET={MAX_SET} (freq {large_max}) would enter the "
            f"top-25 (cutoff {cutoff}, {n_small} small sets) — extend "
            "the oracle's enumeration bound to match the fixture")
    return (
        fi
        .select(
            F.array_join(F.array_sort("items"), ",").alias("itemset"),
            F.col("freq").cast("long").alias("freq"),
            F.round(F.col("freq").cast("double") / nb, 6).alias("support"),
        )
        .orderBy(F.col("freq").desc(), "itemset")
        .limit(25)
    )


@register("q_ts_dtw")  # rows-only: O(n*m) DP — numpy-oracled in tests/test_dtw_gmm.py
def q_ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping distance between each nation's monthly
    revenue curve and the corpus-wide curve — the alignment-tolerant
    similarity ranking (a nation whose cycle lags the global one by a
    month still scores close, where Euclidean distance would not).
    Series aggregate to integer cents per month; the z-scaling and DP
    run in float64 inside one bounded Arrow batch (months² work), so
    this is the rows-only float class — the numpy replica pytest
    pins the values, not a SQL oracle.
    Output: nations ranked by DTW distance to the global curve.

    Scale: the fact aggregates distributed to (nation, month) grain;
    the DP is months² per nation — constant in corpus size, the
    matrix-profile convention."""
    import numpy as np
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("cents"))
    )
    glob = m.groupBy("month").agg(F.sum("cents").alias("cents")).withColumn(
        "nation", F.lit(-1).cast("int"))
    both = m.unionByName(glob.select("nation", "month", "cents"))

    out_schema = "nation int, n_months long, dtw double"

    def dtw_all(pdf: pd.DataFrame) -> pd.DataFrame:
        # one bounded batch: months-grain for every nation + global
        def series(g: pd.DataFrame) -> np.ndarray:
            g = g.sort_values("month")
            v = g["cents"].to_numpy(dtype=np.float64)
            mu, sd = v.mean(), v.std()
            return (v - mu) / sd if sd > 0 else v * 0.0

        ref = series(pdf[pdf["nation"] == -1])
        rows = []
        for nat, g in pdf[pdf["nation"] != -1].groupby("nation"):
            s = series(g)
            n_, m_ = len(s), len(ref)
            D = np.full((n_ + 1, m_ + 1), np.inf)
            D[0, 0] = 0.0
            for i in range(1, n_ + 1):
                for j in range(1, m_ + 1):
                    cost = abs(s[i - 1] - ref[j - 1])
                    D[i, j] = cost + min(D[i - 1, j], D[i, j - 1],
                                         D[i - 1, j - 1])
            rows.append((int(nat), n_, float(D[n_, m_])))
        return pd.DataFrame(rows, columns=["nation", "n_months", "dtw"])

    return (
        both.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: dtw_all(pdf), schema=out_schema)
        .select("nation", "n_months", F.round("dtw", 6).alias("dtw"))
        .orderBy("dtw", "nation")
    )


@register("q_ml_gmm")  # rows-only: seeded EM — label-recovery pytest in tests/test_dtw_gmm.py
def q_ml_gmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib GaussianMixture over the embedding table (seeded EM,
    k = number of label values): soft clustering where KMeans' hard
    spherical assumption breaks. Emits per-component size, weight,
    and the dominant true label with its purity — the audit table a
    clustering run ships with. The fixture's labels are only weakly
    planted, so the pytest contract (tests/test_dtw_gmm.py) is
    mixture quality: weights a distribution, components populated,
    and train log-likelihood strictly above a single-Gaussian fit.

    Scale: EM per iteration is one distributed E-step aggregation
    (responsibilities × sufficient stats, map-side combinable) at
    k×d² driver state — MLlib's GMM is built on exactly that loop."""
    from pyspark.ml.clustering import GaussianMixture
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    k = e.agg(F.count_distinct("label")).collect()[0][0]
    # project to the leading 8 dims: full-width covariance over unit
    # vectors is near-singular and trips breeze's symmetry check
    # inside MLlib's EM (MatrixNotSymmetricException at sf0.01); GMM
    # in high-d needs a reduction step anyway
    data = e.select(
        "vec_id", "label",
        array_to_vector(F.slice("embedding", 1, 8)).alias("features"),
    )
    gmm = GaussianMixture(k=int(k), seed=7, maxIter=30, tol=1e-4)
    model = gmm.fit(data)
    pred = model.transform(data).select("vec_id", "label", "prediction")
    dom = (
        pred.groupBy("prediction", "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("prediction")
        .agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).cast("long")
                           .alias("nl"))).alias("m"),
            F.sum("c").alias("n"),
        )
        .select(
            F.col("prediction").cast("long").alias("component"),
            F.col("n").alias("n_points"),
            (-F.col("m.nl")).alias("dominant_label"),
            F.round(F.col("m.c").cast("double") / F.col("n"), 6)
            .alias("purity"),
        )
    )
    w = spark.createDataFrame(
        [(i, float(wt)) for i, wt in enumerate(model.weights)],
        "component long, weight double",
    ).select("component", F.round("weight", 6).alias("weight"))
    return dom.join(w, "component").orderBy("component")
