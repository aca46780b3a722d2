"""Round-6 wave 92: S-stemmer vocabulary normalization (the
rule-based plural stemmer, applied identically in both engines),
neighbor-set Jaccard link prediction (completing the
common-neighbors / Adamic-Adar family), and the Matthews correlation
coefficient with a full confusion matrix for a fixed-threshold
classifier. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle



@register(
    "q_llm_stem_tokens",
    oracle=r"""
    WITH tok AS (
        SELECT LOWER(UNNEST(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+'))) AS w
        FROM documents),
    st AS (
        SELECT CASE
                 WHEN w LIKE '%sses' THEN
                     SUBSTR(w, 1, LENGTH(w) - 2)
                 WHEN w LIKE '%ies' AND LENGTH(w) > 4 THEN
                     SUBSTR(w, 1, LENGTH(w) - 3) || 'y'
                 WHEN w LIKE '%ss' THEN w
                 WHEN w LIKE '%us' THEN w
                 WHEN w LIKE '%s' AND LENGTH(w) > 3 THEN
                     SUBSTR(w, 1, LENGTH(w) - 1)
                 ELSE w
               END AS stem,
               w
        FROM tok),
    g AS (
        SELECT stem, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_surface_forms
        FROM st GROUP BY stem),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS stems,
                 (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM st)
                     AS surface_vocab
          FROM g)
    SELECT g.stem, g.n_tokens, g.n_surface_forms,
           v.surface_vocab, v.stems AS stemmed_vocab
    FROM g CROSS JOIN v
    ORDER BY g.n_tokens DESC, g.stem LIMIT 25
    """,
)
def q_llm_stem_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-stemmer (Harman's rule-based plural stripper: -sses→-ss,
    -ies→-y, keep -ss/-us, else drop trailing -s) over the corpus
    vocabulary — the cheap conflation step classic IR pipelines run
    before indexing, reported as the top-25 stems with their token
    mass and how many surface forms each absorbs, plus the
    vocabulary-compression headline (surface vocab vs stemmed vocab).
    The rules are pure string conditionals applied identically in
    both engines, so the stem table is exactly oracled.

    Scale: tokenize-explode is fact-grain but fully map-side; both
    aggregates are vocabulary-bounded with map-side combine; top-25
    is TakeOrdered. The stemmer adds zero shuffles to a token-count
    pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.expr(r"regexp_extract_all(text, '[A-Za-z]+', 0)")).alias("w0")
    ).select(F.lower("w0").alias("w"))
    L = F.length("w")
    stem = (
        F.when(F.col("w").endswith("sses"), F.expr("substr(w, 1, length(w) - 2)"))
        .when(F.col("w").endswith("ies") & (L > 4), F.concat(F.expr("substr(w, 1, length(w) - 3)"), F.lit("y")))
        .when(F.col("w").endswith("ss"), F.col("w"))
        .when(F.col("w").endswith("us"), F.col("w"))
        .when(F.col("w").endswith("s") & (L > 3), F.expr("substr(w, 1, length(w) - 1)"))
        .otherwise(F.col("w"))
    )
    st = tok.select(stem.alias("stem"), "w").persist()
    g = st.groupBy("stem").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_surface_forms"),
    )
    v = g.agg(F.count(F.lit(1)).alias("stems")).crossJoin(
        st.agg(F.countDistinct("w").alias("surface_vocab"))
    )
    return (
        g.crossJoin(F.broadcast(v))
        .select(
            "stem",
            "n_tokens",
            "n_surface_forms",
            "surface_vocab",
            F.col("stems").alias("stemmed_vocab"),
        )
        .orderBy(F.desc("n_tokens"), "stem")
        .limit(25)
    )


@register("q_graph_jaccard_neighbors")
def q_graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard link prediction on the co-purchase graph:
    for non-adjacent node pairs sharing ≥1 neighbor, score
    |N(a)∩N(b)| / |N(a)∪N(b)| — the normalized variant of
    common-neighbors (and the third member of the classic link-
    prediction trio beside it and Adamic-Adar). Intersections come
    from a wedge join through shared neighbors; union sizes from
    exact integer degrees (deg_a + deg_b − common), so the score is
    one exact-integer division, top-15 by (score, pair). (r7: moved
    from the near-dup document graph, a clique-union with zero
    non-adjacent wedges — see queries/_copurchase.py.)

    Scale: the wedge join is Σ deg(v)² over neighbors — the standard
    triangle/wedge budget, bounded by the support-filtered edge
    list's small degrees; degrees broadcast; never all-pairs."""
    from ._copurchase import copurchase_sym_edges

    sym = copurchase_sym_edges(spark, sf_dir)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("v"))
    e2 = sym.select(F.col("src").alias("v2"), F.col("dst").alias("b"))
    wedges = (
        e1.join(e2, (F.col("v") == F.col("v2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
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
            F.col("common").alias("common_neighbors"),
            F.round(
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(15)
    )


from ._copurchase import COPURCHASE_SQL as _COP_SQL  # noqa: E402

set_oracle("q_graph_jaccard_neighbors", f"""
WITH cop AS ({_COP_SQL}),
edges AS (
  SELECT part_a AS src, part_b AS dst FROM cop
  UNION ALL SELECT part_b, part_a FROM cop
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
wedges AS (
  SELECT e1.src AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS common
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src AND e1.src < e2.dst
  GROUP BY 1, 2),
nonadj AS (
  SELECT w.a, w.b, w.common
  FROM wedges w LEFT JOIN edges e ON e.src = w.a AND e.dst = w.b
  WHERE e.src IS NULL)
SELECT n.a AS part_a, n.b AS part_b, n.common AS common_neighbors,
       ROUND(CAST(n.common AS DOUBLE)
             / CAST(da.deg + db.deg - n.common AS DOUBLE), 6) AS jaccard
FROM nonadj n JOIN deg da ON da.src = n.a JOIN deg db ON db.src = n.b
ORDER BY jaccard DESC, part_a, part_b LIMIT 15
""")


@register(
    "q_ml_mcc",
    oracle="""
    WITH p AS (
        SELECT (n_chars >= 300) AS pred, (lang = 'en') AS gold
        FROM documents),
    c AS (
        SELECT CAST(SUM(CASE WHEN pred AND gold THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN pred AND NOT gold THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN NOT pred AND gold THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN NOT pred AND NOT gold THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM p)
    SELECT tp, fp, fn, tn,
           ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                  - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                 / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)),
                 6) AS mcc,
           ROUND(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE),
                 6) AS accuracy,
           ROUND(2 * CAST(tp AS DOUBLE)
                 / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
    FROM c
    """,
)
def q_ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient for the length≥300 English
    detector, beside its full confusion matrix, accuracy, and F1.
    MCC is the single-number classifier metric that stays honest
    under class imbalance (it is the Pearson correlation of the
    binary confusion table) — the reason it is the default headline
    metric in bioinformatics benchmarks. Four integer cells + two
    closed-form doubles, exactly oracled.

    Scale: one conditional-count pass, constant-size output — the
    cheapest possible evaluation shape, safe to compute per data
    shard and merge by summing cells."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        (F.col("n_chars") >= 300).alias("pred"), (F.col("lang") == "en").alias("gold")
    )
    c = p.agg(
        F.sum(F.when(F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("gold"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("gold"), 1).otherwise(0)).alias("tn"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (d("tp") * d("tn") - d("fp") * d("fn"))
            / F.sqrt(
                (F.col("tp") + F.col("fp")).cast("double")
                * (F.col("tp") + F.col("fn")).cast("double")
                * (F.col("tn") + F.col("fp")).cast("double")
                * (F.col("tn") + F.col("fn")).cast("double")
            ),
            6,
        ).alias("mcc"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).cast("double"),
            6,
        ).alias("accuracy"),
        F.round(
            2 * d("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"), 6
        ).alias("f1"),
    )
