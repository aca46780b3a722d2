"""Round-6 wave 21: per-source distinctive terms (smoothed log-lift
over exact counts) and an end-to-end A/B experiment readout —
deterministic hash assignment, sample-ratio-mismatch chi-square,
metric lift, and Welch t — all from exact integer sufficient
statistics, exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_distinctive_terms",
    oracle="""
    WITH tok AS (
        SELECT source, t.tok,
               CAST(COUNT(*) AS BIGINT) AS k_st
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE t.tok <> '' GROUP BY 1, 2),
    per_src AS (SELECT source, SUM(k_st) AS n_s FROM tok GROUP BY source),
    per_tok AS (SELECT tok, SUM(k_st) AS k_t FROM tok GROUP BY tok),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
                 SUM(k_t) AS n_total FROM per_tok),
    s AS (
        SELECT tok.source, tok.tok,
               ROUND(LN(((tok.k_st + 1) / CAST(ps.n_s + v.vocab AS DOUBLE))
                        / ((pt.k_t + 1)
                           / CAST(v.n_total + v.vocab AS DOUBLE))), 6)
                   AS log_lift
        FROM tok
        JOIN per_src ps ON ps.source = tok.source
        JOIN per_tok pt ON pt.tok = tok.tok
        CROSS JOIN v),
    r AS (
        SELECT source, tok, log_lift,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY log_lift DESC, tok) AS rn
        FROM s)
    SELECT source, tok AS term, log_lift, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 3
    """,
)
def q_llm_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per corpus source: add-one-smoothed
    log-lift of each term's in-source rate over its corpus-wide rate,
    top-3 per source — the 'what makes this feed different' report
    that guides source weighting (cf. q_llm_domain_kl for the
    distribution-level view). Every ratio is exact-integer-derived,
    log-lift is rounded BEFORE ranking with a term tie-break, so the
    cut is engine-deterministic.

    Scale: (source, token)-grain counts via map-side combine; the
    marginals are vocabulary-grain; the rank window partitions by
    source over its vocabulary slice — no fact-grain window, no
    cross join beyond a 1-row totals broadcast."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("k_st"))
    )
    per_src = tok.groupBy("source").agg(F.sum("k_st").alias("n_s"))
    per_tok = tok.groupBy("tok").agg(F.sum("k_st").alias("k_t"))
    v = per_tok.agg(
        F.count("*").alias("vocab"), F.sum("k_t").alias("n_total")
    )
    s = (
        tok.join(F.broadcast(per_src), "source")
        .join(per_tok, "tok")
        .crossJoin(F.broadcast(v))
        .select(
            "source",
            "tok",
            F.round(
                F.log(
                    ((F.col("k_st") + 1) / (F.col("n_s") + F.col("vocab")).cast("double"))
                    / (
                        (F.col("k_t") + 1)
                        / (F.col("n_total") + F.col("vocab")).cast("double")
                    )
                ),
                6,
            ).alias("log_lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("log_lift").desc(), "tok")
    r = s.select(
        "source", "tok", "log_lift", F.row_number().over(w).alias("rn")
    )
    return r.filter(F.col("rn") <= 3).select(
        "source",
        F.col("tok").alias("term"),
        "log_lift",
        F.col("rn").cast("long").alias("rn"),
    )


@register(
    "q_stat_ab_test",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               (user_id * 2654435761) % 4294967296 % 2 AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchases
        FROM events GROUP BY user_id),
    s AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(purchases) AS sx,
               SUM(purchases * purchases) AS sxx
        FROM assign GROUP BY arm),
    w AS (
        SELECT MIN(CASE WHEN arm = 0 THEN n END) AS na,
               MIN(CASE WHEN arm = 1 THEN n END) AS nb,
               MIN(CASE WHEN arm = 0 THEN sx END) AS sa,
               MIN(CASE WHEN arm = 1 THEN sx END) AS sb,
               MIN(CASE WHEN arm = 0 THEN sxx END) AS sa2,
               MIN(CASE WHEN arm = 1 THEN sxx END) AS sb2
        FROM s),
    m AS (
        SELECT na, nb, sa, sb,
               CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
               (CAST(sa2 AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
                   / (na - 1) / na AS va_n,
               (CAST(sb2 AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb)
                   / (nb - 1) / nb AS vb_n
        FROM w)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND((CAST(na AS DOUBLE) - nb) * (CAST(na AS DOUBLE) - nb)
                 / (CAST(na AS DOUBLE) + nb), 6) AS srm_chi2,
           ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND(mb / ma - 1, 6) AS lift,
           ROUND((mb - ma) / SQRT(va_n + vb_n), 6) AS welch_t
    FROM m
    """,
)
def q_stat_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end A/B experiment readout: users deterministically
    assigned to two arms by a portable multiplicative hash (replayable
    across engines and runs — the property real bucketing systems
    need), then a sample-ratio-mismatch chi-square (the guardrail that
    catches broken assignment before anyone reads the metric), the
    purchases-per-user lift, and a Welch t statistic. Every input is
    an exact integer sum, so all four statistics are bit-identical
    before rounding.

    Scale: one user-grain aggregate (map-side combine) then a 2-row
    pivot — the experimentation-platform readout shape regardless of
    fact size; the hash assignment is row-local arithmetic, no
    assignment table to join."""
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchases"
        )
    ).select(
        ((F.col("user_id") * 2654435761) % 4294967296 % 2).alias("arm"),
        "purchases",
    )
    s = assign.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("purchases").alias("sx"),
        F.sum(F.col("purchases") * F.col("purchases")).alias("sxx"),
    )
    w = s.agg(
        F.min(F.when(F.col("arm") == 0, F.col("n"))).alias("na"),
        F.min(F.when(F.col("arm") == 1, F.col("n"))).alias("nb"),
        F.min(F.when(F.col("arm") == 0, F.col("sx"))).alias("sa"),
        F.min(F.when(F.col("arm") == 1, F.col("sx"))).alias("sb"),
        F.min(F.when(F.col("arm") == 0, F.col("sxx"))).alias("sa2"),
        F.min(F.when(F.col("arm") == 1, F.col("sxx"))).alias("sb2"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb = F.col("sa"), F.col("sb")
    ma = sa.cast("double") / na
    mb = sb.cast("double") / nb
    va_n = (F.col("sa2").cast("double") - sa.cast("double") * sa / na) / (
        na - 1
    ) / na
    vb_n = (F.col("sb2").cast("double") - sb.cast("double") * sb / nb) / (
        nb - 1
    ) / nb
    return w.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(
            (na.cast("double") - nb) * (na.cast("double") - nb)
            / (na.cast("double") + nb),
            6,
        ).alias("srm_chi2"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(mb / ma - 1, 6).alias("lift"),
        F.round((mb - ma) / F.sqrt(va_n + vb_n), 6).alias("welch_t"),
    )
