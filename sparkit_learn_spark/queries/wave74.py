"""Round-6 wave 74: exactly-oracled isotonic calibration (decile-
grain max-min formula — the PAV result without the sequential
algorithm), an exponential-decay engagement score (literal decay
table, exact integer sums), and per-language tokenizer fertility.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_N_BINS = 10


@register(
    "q_ml_isotonic_decile",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS activity,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    binned AS (
        SELECT NTILE({_N_BINS}) OVER (ORDER BY activity, user_id) AS b,
               conv
        FROM per_user),
    h AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS s
        FROM binned GROUP BY b),
    pfx AS (
        SELECT b, n, s,
               SUM(n) OVER (ORDER BY b) AS cn,
               SUM(s) OVER (ORDER BY b) AS cs
        FROM h),
    spans AS (
        SELECT j.b AS j, k.b AS k,
               CAST(k.cs - j.cs + j.s AS DOUBLE)
               / (k.cn - j.cn + j.n) AS rate
        FROM pfx j JOIN pfx k ON j.b <= k.b),
    inner_min AS (
        SELECT i.b AS i, sp.j,
               MIN(sp.rate) AS mn
        FROM pfx i JOIN spans sp ON sp.j <= i.b AND sp.k >= i.b
        GROUP BY i.b, sp.j),
    fit AS (
        SELECT i, MAX(mn) AS iso FROM inner_min GROUP BY i)
    SELECT h.b AS decile, h.n AS n_users,
           ROUND(CAST(h.s AS DOUBLE) / h.n, 6) AS raw_rate,
           ROUND(f.iso + 0.0, 6) AS iso_rate
    FROM h JOIN fit f ON f.i = h.b
    ORDER BY h.b
    """,
)
def q_ml_isotonic_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of conversion
    rate against user-activity decile, computed by the exact max-min
    identity fit(i) = max_{j≤i} min_{k≥i} avg(y[j..k]) over prefix
    sums — the pool-adjacent-violators RESULT without PAV's
    sequential pooling loop, so it distributes and oracles exactly.
    This is the calibration step behind monotone score→probability
    mappings (and pyspark.ml's IsotonicRegression at bin grain).

    Scale: the fact collapses to user grain, then to 10 decile rows;
    the max-min search is a constant 10×55 span enumeration. NTILE
    runs over user grain with a fully deterministic (activity,
    user_id) order; span rates are single divisions of exact integer
    prefix sums, and min/max over doubles is order-free.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    binned = per_user.select(
        F.ntile(_N_BINS).over(Window.orderBy("activity", "user_id")).alias("b"),
        "conv",
    )
    h = binned.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("s")
    )
    wp = Window.orderBy("b")
    pfx = h.select(
        "b",
        "n",
        "s",
        F.sum("n").over(wp).alias("cn"),
        F.sum("s").over(wp).alias("cs"),
    )
    j = pfx.select(
        F.col("b").alias("j"),
        F.col("n").alias("jn"),
        F.col("s").alias("js"),
        F.col("cn").alias("jcn"),
        F.col("cs").alias("jcs"),
    )
    k = pfx.select(
        F.col("b").alias("k"), F.col("cn").alias("kcn"), F.col("cs").alias("kcs")
    )
    spans = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (
                (F.col("kcs") - F.col("jcs") + F.col("js")).cast("double")
                / (F.col("kcn") - F.col("jcn") + F.col("jn"))
            ).alias("rate"),
        )
    )
    i = pfx.select(F.col("b").alias("i"))
    inner_min = (
        i.join(
            F.broadcast(spans),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("rate").alias("mn"))
    )
    fit = inner_min.groupBy("i").agg(F.max("mn").alias("iso"))
    return (
        h.join(F.broadcast(fit), h.b == fit.i)
        .select(
            F.col("b").alias("decile"),
            F.col("n").alias("n_users"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
        .orderBy("decile")
    )


_LAMBDA = 0.9
_MAX_DELTA = 40
_DECAY = [(d, round(_LAMBDA**d * 1_000_000)) for d in range(_MAX_DELTA + 1)]
_DECAY_VALUES = ", ".join(f"({d}, {f})" for d, f in _DECAY)


@register(
    "q_evt_decay_score",
    oracle=f"""
    WITH decay AS (
        SELECT CAST(delta AS BIGINT) AS delta,
               CAST(fmicro AS BIGINT) AS fmicro
        FROM (VALUES {_DECAY_VALUES}) t(delta, fmicro)),
    mx AS (SELECT MAX(CAST(ts AS DATE)) AS d_max FROM events),
    per_day AS (
        SELECT user_id,
               CAST(DATEDIFF('day', CAST(ts AS DATE), m.d_max) AS BIGINT)
                   AS delta,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents
        FROM events CROSS JOIN mx m
        GROUP BY user_id, CAST(ts AS DATE), m.d_max),
    scored AS (
        SELECT p.user_id,
               CAST(SUM(p.cents * COALESCE(d.fmicro, 0)) AS BIGINT)
                   AS score_micro
        FROM per_day p LEFT JOIN decay d ON d.delta = p.delta
        GROUP BY p.user_id)
    SELECT user_id,
           score_micro,
           ROUND(score_micro / 100000000.0, 6) AS decayed_spend
    FROM scored
    ORDER BY score_micro DESC, user_id
    LIMIT 10
    """,
)
def q_evt_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score: each user's purchase cents
    per day, discounted by 0.9^days-ago — the feature-store recency
    feature behind churn/propensity models. The decay factors are a
    41-entry LITERAL micro-unit table (generated once, identical in
    both engines — no runtime POWER, whose last-ulp may differ across
    libm implementations), so per-user scores are exact integer sums
    and the top-10 ranking cannot flip.

    Scale: one hash aggregate to user-day grain, a broadcast join
    against the 41-row decay dimension, one user-grain aggregate, and
    a TakeOrdered top-10. Nothing driver-side; adding history depth
    grows only the literal table.
    """
    ev = load_table(spark, sf_dir, "events")
    decay = F.broadcast(
        spark.createDataFrame(_DECAY, "delta: long, fmicro: long")
    )
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("d_max"))
    per_day = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "d_max",
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("cents")
        )
        .select(
            "user_id",
            F.datediff("d_max", "day").cast("long").alias("delta"),
            "cents",
        )
    )
    scored = (
        per_day.join(decay, "delta", "left")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("cents") * F.coalesce(F.col("fmicro"), F.lit(0))
            ).alias("score_micro")
        )
    )
    return (
        scored.orderBy(F.col("score_micro").desc(), "user_id")
        .limit(10)
        .select(
            "user_id",
            "score_micro",
            F.round(F.col("score_micro") / 100000000.0, 6).alias(
                "decayed_spend"
            ),
        )
    )


@register(
    "q_llm_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')))
                AS BIGINT) AS n_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')))
                      AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE)
                 / SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))), 6)
               AS chars_per_token
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens-per-word and
    chars-per-token ratios by lang — the standard multilingual
    tokenizer-efficiency readout (high fertility means a language
    pays more sequence length per word, the metric driving vocabulary
    allocation in multilingual tokenizer training). Uses the same
    BPE-proxy regex as q_llm_token_count, aggregated corpus-level
    from exact integer counts.

    Scale: row-local regexp counts, one hash aggregate to language
    grain — embarrassingly parallel, ratios divide exact sums once.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0))
    words = F.size(F.split("text", " "))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("long").alias("n_tokens"),
            F.sum(words).cast("long").alias("n_words"),
            F.round(
                F.sum(toks).cast("double") / F.sum(words), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum(toks), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )
