"""Round-6 wave 130: information gain ratio (C4.5's split criterion
as a feature-ranking audit), SMA golden-cross regimes (exact integer
cross-multiplied comparison), and preferential-attachment link
scores (completing the link-prediction quartet). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle



def _ig_sql(bin_expr: str, name: str) -> str:
    return f"""
    SELECT '{name}' AS feature,
           SUM(hy_term) AS hy, SUM(hxy_term) AS hxy, SUM(hx_term) AS hx
    FROM (
        WITH b AS (
            SELECT {bin_expr} AS x,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM b),
        hy AS (
            SELECT SUM(-(c / n.n) * LN(c / n.n)) AS v
            FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM b GROUP BY y)
                 CROSS JOIN n),
        hx AS (
            SELECT SUM(-(c / n.n) * LN(c / n.n)) AS v
            FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM b GROUP BY x)
                 CROSS JOIN n),
        hxy AS (
            SELECT SUM(-(c / n.n) * LN(c / n.n)) AS v
            FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM b GROUP BY x, y)
                 CROSS JOIN n)
        SELECT hy.v AS hy_term, hxy.v AS hxy_term, hx.v AS hx_term
        FROM hy CROSS JOIN hxy CROSS JOIN hx)
    """


@register(
    "q_ml_info_gain_ratio",
    oracle=f"""
    WITH feats AS (
        {_ig_sql("LEAST(CAST(n_chars AS BIGINT) // 200, 4)", "length_bin")}
        UNION ALL
        {_ig_sql("source", "source")}
        UNION ALL
        {_ig_sql("CAST(n_chars AS BIGINT) % 2", "length_parity")}
    )
    SELECT feature,
           ROUND(hy + hx - hxy, 6) AS info_gain,
           ROUND(CASE WHEN hx > 0 THEN (hy + hx - hxy) / hx ELSE 0 END, 6)
               AS gain_ratio
    FROM feats ORDER BY feature
    """,
)
def q_ml_info_gain_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain ratio (C4.5's split criterion) for three
    candidate features against the English label: IG = H(Y) + H(X) −
    H(X,Y), normalized by the feature's own entropy — the
    normalization that stops high-cardinality features (source, 20
    values) from winning on raw IG purely by fragmenting the data;
    length_parity is the planted null feature that must score ≈ 0.
    All probabilities are exact count ratios; entropies follow the
    bounded-group float-sum contract.

    Scale: three (feature × label)-grain contingency passes —
    feature ranking as pure aggregates, the same shape C4.5 runs per
    split but evaluated corpus-wide in one shot."""
    docs = load_table(spark, sf_dir, "documents")

    def ig(bin_col, name: str) -> DataFrame:
        b = docs.select(bin_col.alias("x"), F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"))
        n = b.count()

        def h(groups) -> float:
            import math

            cs = [r["c"] for r in b.groupBy(*groups).agg(F.count(F.lit(1)).alias("c")).collect()]
            return -sum((c / n) * math.log(c / n) for c in cs)

        hy, hx, hxy = h(["y"]), h(["x"]), h(["x", "y"])
        ig_v = hy + hx - hxy
        return spark.createDataFrame(
            [(name, round(ig_v, 6), round(ig_v / hx if hx > 0 else 0.0, 6))],
            ["feature", "info_gain", "gain_ratio"],
        )

    out = (
        ig(F.least(F.expr("CAST(n_chars AS BIGINT) div 200"), F.lit(4)), "length_bin")
        .unionAll(ig(F.expr("CAST(n_chars AS BIGINT) % 2"), "length_parity"))
        .unionAll(ig(F.col("source"), "source"))
    )
    return out.orderBy("feature")


@register(
    "q_ts_sma_crossover",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    f AS (
        SELECT day,
               SUM(v) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                            AND CURRENT ROW) AS s7,
               SUM(v) OVER (ORDER BY day ROWS BETWEEN 27 PRECEDING
                            AND CURRENT ROW) AS s28,
               CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 27 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS n28
        FROM d),
    r AS (
        SELECT day,
               CASE WHEN 4 * s7 > s28 THEN 1 ELSE 0 END AS fast_above
        FROM f WHERE n28 = 28),
    fl AS (
        SELECT fast_above,
               LAG(fast_above) OVER (ORDER BY day) AS prev
        FROM r)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN prev = 0 AND fast_above = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS golden_crosses,
           CAST(SUM(CASE WHEN prev = 1 AND fast_above = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS death_crosses,
           ROUND(CAST(SUM(fast_above) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS share_fast_above
    FROM fl
    """,
)
def q_ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMA crossover regimes: 7-day vs 28-day simple moving averages
    of daily revenue, counting golden crosses (fast crosses above
    slow — momentum turning up) and death crosses — the oldest regime
    signal in technical analysis. Because 28 = 4×7, the comparison
    sma7 > sma28 cross-multiplies to the EXACT INTEGER test
    4·sum7 > sum28 — no float division anywhere, so regime membership
    and every cross count are bit-exact.

    Scale: two frame sums in one day-grain window pass + one lag —
    regime detection at the cost of a rolling sum."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    w28 = Window.orderBy("day").rowsBetween(-27, 0)
    f = d.select(
        "day",
        F.sum("v").over(w7).alias("s7"),
        F.sum("v").over(w28).alias("s28"),
        F.count(F.lit(1)).over(w28).alias("n28"),
    )
    r = f.filter(F.col("n28") == 28).select(
        "day", F.when(4 * F.col("s7") > F.col("s28"), 1).otherwise(0).alias("fast_above")
    )
    fl = r.select(
        "fast_above", F.lag("fast_above").over(Window.orderBy("day")).alias("prev")
    )
    return fl.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when((F.col("prev") == 0) & (F.col("fast_above") == 1), 1).otherwise(0)).alias(
            "golden_crosses"
        ),
        F.sum(F.when((F.col("prev") == 1) & (F.col("fast_above") == 0), 1).otherwise(0)).alias(
            "death_crosses"
        ),
        F.round(F.sum("fast_above").cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
            "share_fast_above"
        ),
    )


@register("q_graph_pref_attachment")
def q_graph_pref_attachment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preferential-attachment link prediction on the co-purchase
    graph: non-adjacent wedge pairs scored by deg(a)·deg(b) — the
    hubs-connect-to-hubs prior, completing the classic quartet beside
    common-neighbors, Adamic-Adar, and neighbor-Jaccard (four priors,
    four different failure modes; serious link prediction ensembles
    all of them). Exact integer degree products, top-15 with
    deterministic tie-breaks. (r7: moved from the near-dup document
    graph, a clique-union with zero non-adjacent wedges — see
    queries/_copurchase.py.)

    Scale: wedge candidates (never all-pairs) + broadcast degree
    lookups — identical budget to the other three predictors."""
    from ._copurchase import copurchase_sym_edges

    sym = copurchase_sym_edges(spark, sf_dir)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("v"))
    e2 = sym.select(F.col("src").alias("v2"), F.col("dst").alias("b"))
    wedges = (
        e1.join(e2, (F.col("v") == F.col("v2")) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    adj = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(1).alias("is_edge")
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    return (
        wedges.join(adj, ["a", "b"], "left")
        .filter(F.col("is_edge").isNull())
        .join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            (F.col("deg_a") * F.col("deg_b")).alias("pa_score"),
        )
        .orderBy(F.desc("pa_score"), "part_a", "part_b")
        .limit(15)
    )


from ._copurchase import COPURCHASE_SQL as _COP_SQL  # noqa: E402

set_oracle("q_graph_pref_attachment", f"""
WITH cop AS ({_COP_SQL}),
edges AS (
  SELECT part_a AS src, part_b AS dst FROM cop
  UNION ALL SELECT part_b, part_a FROM cop
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
wedges AS (
  SELECT DISTINCT e1.src AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src AND e1.src < e2.dst),
nonadj AS (
  SELECT w.a, w.b
  FROM wedges w LEFT JOIN edges e ON e.src = w.a AND e.dst = w.b
  WHERE e.src IS NULL)
SELECT n.a AS part_a, n.b AS part_b,
       CAST(da.deg * db.deg AS BIGINT) AS pa_score
FROM nonadj n JOIN deg da ON da.src = n.a JOIN deg db ON db.src = n.b
ORDER BY pa_score DESC, part_a, part_b LIMIT 15
""")
