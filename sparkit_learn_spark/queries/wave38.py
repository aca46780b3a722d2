"""Round-6 wave 38: Wald–Wolfowitz runs test (series randomness),
Cohen's kappa over the lang-ID confusion matrix (chance-corrected
agreement, oracle embeds the eval CTE), and cross-source n-gram
novelty rates. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle
from .llm_pipeline6 import q_llm_lang_id_eval


@register(
    "q_stat_runs_test",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    med AS (
        SELECT rev AS m FROM (
            SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn,
                   COUNT(*) OVER () AS n
            FROM day)
        WHERE rn = (n + 1) // 2),
    signed AS (
        SELECT d, CASE WHEN rev > m THEN 1 ELSE 0 END AS s
        FROM day CROSS JOIN med WHERE rev <> m),
    runs AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                         OR LAG(s) OVER (ORDER BY d) <> s
                    THEN 1 ELSE 0 END AS new_run
        FROM signed),
    agg AS (
        SELECT CAST(SUM(s) AS BIGINT) AS n1,
               CAST(SUM(1 - s) AS BIGINT) AS n2,
               CAST(SUM(new_run) AS BIGINT) AS r
        FROM runs)
    SELECT n1, n2, r,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z
    FROM agg
    """,
)
def q_stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test: is the daily-revenue series random
    around its median, or does it trend/oscillate — the count of
    above/below-median runs vs its null distribution, z-scored. The
    median selects deterministically (row at rank (n+1)/2), median
    ties drop (the standard treatment), run counting is one LAG pass,
    and every moment is an exact integer until the single z step.
    Completes the nonparametric battery beside Mann-Whitney and KS.

    Scale: the test runs at day grain (series-sized) after one
    map-side-combining aggregate; the median rank is a window over
    the series, not the fact table."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    wr = Window.orderBy("rev")
    med = (
        day.select(
            "rev",
            F.row_number().over(wr).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("rev").alias("m"))
    )
    signed = (
        day.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select(
            "d", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    lag_s = F.lag("s").over(Window.orderBy("d"))
    runs = signed.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
        F.sum("new_run").alias("r"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1
    sigma = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
        / (n.cast("double") * n * (n - 1))
    )
    return agg.select(
        "n1", "n2", "r", F.round((F.col("r") - mu) / sigma, 6).alias("z")
    )


@register("q_stat_cohens_kappa")
def q_stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the language-ID classifier: chance-corrected
    agreement between predicted and gold labels, computed from the
    exact confusion matrix as the integer rational
    (N·Σdiag − Σ row·col) / (N² − Σ row·col) with ONE double division
    at the end — the summary the confusion matrix
    (q_llm_lang_id_eval) lacks, robust to skewed label marginals
    where raw accuracy flatters.

    Scale: everything after the classifier runs at label-pair grain
    (the confusion matrix — a handful of rows); marginals and the
    diagonal are sums over that tiny table."""
    conf = q_llm_lang_id_eval(spark, sf_dir)
    tot = conf.agg(
        F.sum("n").alias("N"),
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n"))
            .otherwise(0)
        ).alias("diag"),
    )
    rows = conf.groupBy("true_lang").agg(F.sum("n").alias("row_n"))
    cols = conf.groupBy("pred_lang").agg(F.sum("n").alias("col_n"))
    pe = (
        rows.join(cols, rows.true_lang == cols.pred_lang)
        .agg(F.sum(F.col("row_n") * F.col("col_n")).alias("pe_num"))
    )
    j = tot.crossJoin(F.broadcast(pe))
    return j.select(
        F.col("N").alias("n_docs"),
        F.col("diag").alias("n_agree"),
        F.round(F.col("diag") / F.col("N").cast("double"), 6).alias(
            "accuracy"
        ),
        F.round(
            (F.col("N") * F.col("diag") - F.col("pe_num"))
            / (F.col("N") * F.col("N") - F.col("pe_num")).cast("double"),
            6,
        ).alias("kappa"),
    )


set_oracle(
    "q_stat_cohens_kappa",
    f"""
    WITH conf AS ({ORACLES["q_llm_lang_id_eval"]}),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS N,
               CAST(SUM(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
                    AS BIGINT) AS diag
        FROM conf),
    r AS (SELECT true_lang AS l, CAST(SUM(n) AS BIGINT) AS row_n
          FROM conf GROUP BY 1),
    c AS (SELECT pred_lang AS l, CAST(SUM(n) AS BIGINT) AS col_n
          FROM conf GROUP BY 1),
    pe AS (SELECT CAST(SUM(r.row_n * c.col_n) AS BIGINT) AS pe_num
           FROM r JOIN c USING (l))
    SELECT t.N AS n_docs, t.diag AS n_agree,
           ROUND(t.diag / CAST(t.N AS DOUBLE), 6) AS accuracy,
           ROUND((t.N * t.diag - p.pe_num)
                 / CAST(t.N * t.N - p.pe_num AS DOUBLE), 6) AS kappa
    FROM tot t CROSS JOIN pe p
    """,
)


@register(
    "q_llm_source_novelty",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    s AS (
      SELECT DISTINCT source,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
                 AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5),
    spread AS (
      SELECT sh, CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM s GROUP BY sh)
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_rate
    FROM s JOIN spread sp USING (sh)
    GROUP BY s.source
    """,
)
def q_llm_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content novelty: per source, the share of its
    distinct 5-gram shingles that appear in NO other source — high
    novelty marks original feeds worth upweighting in the mix, low
    novelty marks mirrors/aggregators the dedup ladder should eat.
    The source-grain complement of the pairwise overlap matrix
    (q_llm_source_overlap). Exact integers until the final rate.

    Scale: distinct (source, shingle) pairs aggregate map-side, the
    spread count is one shuffle at shingle grain (digests, not
    text), and the novelty join fans back by shingle — the inverted-
    index profile, never pairwise."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    s = (
        d.select("source", toks.alias("toks"))
        .filter(F.size("toks") >= 5)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 4), i -> "
                    "array_join(slice(toks, i, 5), ' '))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    spread = s.groupBy("sh").agg(F.count("*").alias("n_sources"))
    return (
        s.join(spread, "sh")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("n_sources") == 1, 1).otherwise(0)
            ).alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
    )
