"""Round-8 wave 142: the rest of the privacy-release battery —
l-diversity and t-closeness (Machanavajjhala 2007 / Li 2007), the two
audits run after k-anonymity (wave 137) because k-anonymous classes
can still leak: every row of a class sharing one sensitive value
(l-diversity's target) or a class's sensitive distribution diverging
from the table's (t-closeness's). Both exactly DuckDB-oracled in
integer space over the same customer quasi-identifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: the quasi-identifier of wave 137's k-anonymity audit.
_QI_SQL = "c_nationkey, c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS BIGINT)"


def _qi_cols():
    return [
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ]


@register(
    "q_dq_l_diversity",
    oracle=f"""
    WITH cls AS (
        SELECT {_QI_SQL} AS bal_band,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(COUNT(DISTINCT c_custkey % 7) AS BIGINT) AS l
        FROM customer
        GROUP BY 1, 2, 3),
    b AS (
        SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(k) AS BIGINT) AS n_rows
        FROM cls GROUP BY l),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM b)
    SELECT l, n_classes, n_rows,
           ROUND(CAST(n_rows AS DOUBLE) / tot.t, 6) AS row_share,
           CASE WHEN l < 3 THEN 1 ELSE 0 END AS homogeneity_risk
    FROM b CROSS JOIN tot ORDER BY l
    """,
)
def q_dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): per
    equivalence class of the wave-137 quasi-identifier, the count of
    DISTINCT sensitive values (here the synthetic 7-valued sensitive
    attribute c_custkey % 7) — a k-anonymous class with l=1 leaks the
    sensitive value of every member (the homogeneity attack), so the
    release gate reads this distribution next to the k one. Rows:
    class count and row share per distinct-sensitive-count l, with a
    risk flag below l=3.

    Scale: one hash aggregate to QI grain (distinct count inside),
    one to l grain — same funnel as the k-anonymity audit."""
    c = load_table(spark, sf_dir, "customer")
    cls = c.groupBy(*_qi_cols()).agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct(F.col("c_custkey") % 7).alias("l"),
    )
    b = cls.groupBy("l").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows"),
    )
    tot = b.agg(F.sum("n_rows").alias("t"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            F.col("l").cast("long").alias("l"),
            "n_classes", "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("t"), 6)
            .alias("row_share"),
            F.when(F.col("l") < 3, 1).otherwise(0)
            .alias("homogeneity_risk"),
        )
        .orderBy("l")
    )


@register(
    "q_dq_t_closeness",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
               CAST(c_custkey % 7 AS BIGINT) AS s
        FROM customer),
    gdist AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS gc FROM cust GROUP BY s),
    gtot AS (SELECT CAST(SUM(gc) AS BIGINT) AS gt FROM gdist),
    cls AS (
        SELECT c_nationkey, c_mktsegment, bal_band, s,
               CAST(COUNT(*) AS BIGINT) AS cc
        FROM cust GROUP BY 1, 2, 3, 4),
    ctot AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               CAST(SUM(cc) AS BIGINT) AS ct
        FROM cls GROUP BY 1, 2, 3),
    -- 1-D earth-mover distance over the ORDERED sensitive domain =
    -- mean |running cumsum difference|; kept exact with integer
    -- cross-multiplied cumsums (cum_c * gt - cum_g * ct)
    full_grid AS (
        SELECT t.c_nationkey, t.c_mktsegment, t.bal_band, t.ct,
               g.s, g.gc, COALESCE(c.cc, 0) AS cc
        FROM ctot t CROSS JOIN gdist g
        LEFT JOIN cls c ON c.c_nationkey = t.c_nationkey
                       AND c.c_mktsegment = t.c_mktsegment
                       AND c.bal_band = t.bal_band AND c.s = g.s),
    cums AS (
        SELECT c_nationkey, c_mktsegment, bal_band, ct, s,
               SUM(cc) OVER w AS cum_c,
               SUM(gc) OVER w AS cum_g
        FROM full_grid CROSS JOIN gtot
        WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment, bal_band
                     ORDER BY s ROWS UNBOUNDED PRECEDING)),
    emd AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               ANY_VALUE(ct) AS k,
               CAST(SUM(ABS(cum_c * gtot.gt - cum_g * ct)) AS BIGINT)
                   AS rawint
        FROM cums CROSS JOIN gtot
        GROUP BY c_nationkey, c_mktsegment, bal_band),
    scored AS (
        SELECT k, rawint,
               CASE WHEN rawint * 5 > 7 * k * (SELECT gt FROM gtot)
                    THEN 1 ELSE 0 END AS over_t,
               CAST(ROUND(CAST(rawint AS DOUBLE)
                          / (7.0 * k * (SELECT gt FROM gtot))
                          * 1000000000) AS BIGINT) AS q
        FROM emd)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(over_t) AS BIGINT) AS classes_over_t,
           ROUND(CAST(MAX(q) AS DOUBLE) / 1000000000, 6) AS max_emd,
           ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000000, 6)
               AS mean_emd
    FROM scored
    """,
)
def q_dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007): for every equivalence
    class, the earth-mover distance between its sensitive-value
    distribution (c_custkey % 7, ordered domain) and the whole
    table's — a class can be k-anonymous AND l-diverse yet still
    reveal that its members skew toward particular sensitive values.
    1-D EMD = mean absolute cumulative-difference, kept EXACT with
    integer cross-multiplied cumsums normalized only at the end.
    One summary row: classes, count exceeding t=0.2, max and mean EMD.

    Scale: class×sensitive grid is |classes|·7 rows (metadata-sized
    next to the table); the cumsum window partitions by class."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        (F.col("c_custkey") % 7).cast("long").alias("s"),
    )
    glob = c.groupBy("s").agg(F.count(F.lit(1)).alias("gc"))
    gt = c.count()
    cls = c.groupBy("c_nationkey", "c_mktsegment", "bal_band", "s").agg(
        F.count(F.lit(1)).alias("cc"))
    ctot = cls.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.sum("cc").alias("ct"))
    grid = (
        ctot.crossJoin(F.broadcast(glob))
        .join(cls, ["c_nationkey", "c_mktsegment", "bal_band", "s"], "left")
        .select(
            "c_nationkey", "c_mktsegment", "bal_band", "ct", "s", "gc",
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment", "bal_band")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.select(
        "c_nationkey", "c_mktsegment", "bal_band", "ct",
        F.sum("cc").over(w).alias("cum_c"),
        F.sum("gc").over(w).alias("cum_g"),
    )
    emd = cums.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.any_value("ct").alias("k"),
        F.sum(F.abs(F.col("cum_c") * gt - F.col("cum_g") * F.col("ct")))
        .alias("rawint"),
    )
    giga = 1_000_000_000
    scored = emd.select(
        F.when(F.col("rawint") * 5 > 7 * F.col("k") * gt, 1)
        .otherwise(0).alias("over_t"),
        F.round(
            F.col("rawint").cast("double") / (7.0 * F.col("k") * gt) * giga
        ).cast("long").alias("q"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("over_t").alias("classes_over_t"),
        F.round(F.max("q").cast("double") / giga, 6).alias("max_emd"),
        F.round(
            F.sum("q").cast("double") / F.count(F.lit(1)) / giga, 6
        ).alias("mean_emd"),
    )
