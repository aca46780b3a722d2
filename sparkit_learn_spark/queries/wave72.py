"""Round-6 wave 72: a deterministic permutation test (portable-hash
label reshuffles, p-value decided by EXACT cross-multiplied integer
comparisons) and a two-round gradient-boosted stump learner (the
residual-refit loop every distributed GBDT reduces to, with
micro-quantized leaf means so round-2 targets are exact integers).
Both exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_N_PERM = 32
_PHASH = (
    "((user_id * 2654435761 + r * 2246822519 + 12345) % 4294967296) % 2"
)


@register(
    "q_stat_permutation_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY user_id),
    obs AS (
        SELECT CAST(SUM(CASE WHEN user_id % 2 = 1 THEN x END)
                    AS DECIMAL(38, 0)) AS s1,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 END)
                    AS DECIMAL(38, 0)) AS n1,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN x END)
                    AS DECIMAL(38, 0)) AS s0,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 END)
                    AS DECIMAL(38, 0)) AS n0,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM per_user),
    reps AS (SELECT CAST(r AS BIGINT) AS r FROM range({_N_PERM}) t(r)),
    perm AS (
        SELECT r,
               CAST(SUM(CASE WHEN {_PHASH} = 1 THEN x END)
                    AS DECIMAL(38, 0)) AS s1,
               CAST(SUM(CASE WHEN {_PHASH} = 1 THEN 1 END)
                    AS DECIMAL(38, 0)) AS n1,
               CAST(SUM(CASE WHEN {_PHASH} = 0 THEN x END)
                    AS DECIMAL(38, 0)) AS s0,
               CAST(SUM(CASE WHEN {_PHASH} = 0 THEN 1 END)
                    AS DECIMAL(38, 0)) AS n0
        FROM per_user CROSS JOIN reps GROUP BY r),
    flags AS (
        SELECT p.r,
               CASE WHEN ABS(p.s1 * p.n0 - p.s0 * p.n1) * (o.n1 * o.n0)
                         >= ABS(o.s1 * o.n0 - o.s0 * o.n1)
                            * (p.n1 * p.n0)
                    THEN 1 ELSE 0 END AS extreme
        FROM perm p CROSS JOIN obs o)
    SELECT o.n_users,
           ROUND((CAST(o.s1 AS DOUBLE) / CAST(o.n1 AS DOUBLE)
                  - CAST(o.s0 AS DOUBLE) / CAST(o.n0 AS DOUBLE))
                 / 100.0 + 0.0, 6) AS obs_diff,
           CAST({_N_PERM} AS BIGINT) AS n_perms,
           ROUND((1.0 + (SELECT SUM(extreme) FROM flags))
                 / ({_N_PERM} + 1.0), 6) AS p_value
    FROM obs o
    """,
)
def q_stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the difference in mean per-user purchase
    spend between odd/even user-id groups: 32 deterministic label
    reshuffles (portable affine hash over (user, replicate) — no RNG,
    reproducible on any cluster), p-value = share of permuted |mean
    diff| at least as extreme as observed. The at-least-as-extreme
    decision is made by cross-multiplied EXACT integer comparison
    (|s1·n0 − s0·n1| against the observed on a common denominator in
    DECIMAL(38,0)), so no float rounding can flip a flag.

    Scale: one aggregate to user grain, then a users × 32 expansion
    that immediately re-aggregates map-side to 32 replicate rows —
    the same shape as the Poisson bootstrap; no shuffle grows with
    replicates, no driver loop.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("x")
    )
    dec = "decimal(38,0)"
    obs = per_user.agg(
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("x")))
        .cast(dec)
        .alias("s1"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1)).cast(dec).alias("n1"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("x")))
        .cast(dec)
        .alias("s0"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1)).cast(dec).alias("n0"),
        F.count(F.lit(1)).alias("n_users"),
    )
    reps = spark.range(_N_PERM).select(F.col("id").alias("r"))
    g = (
        (F.col("user_id") * 2654435761 + F.col("r") * 2246822519 + 12345)
        % 4294967296
    ) % 2
    perm = (
        per_user.crossJoin(reps)
        .groupBy("r")
        .agg(
            F.sum(F.when(g == 1, F.col("x"))).cast(dec).alias("s1"),
            F.sum(F.when(g == 1, 1)).cast(dec).alias("n1"),
            F.sum(F.when(g == 0, F.col("x"))).cast(dec).alias("s0"),
            F.sum(F.when(g == 0, 1)).cast(dec).alias("n0"),
        )
    )
    flags = perm.crossJoin(F.broadcast(obs.select(
        F.col("s1").alias("os1"), F.col("n1").alias("on1"),
        F.col("s0").alias("os0"), F.col("n0").alias("on0"),
    ))).select(
        F.when(
            F.abs(F.col("s1") * F.col("n0") - F.col("s0") * F.col("n1"))
            * (F.col("on1") * F.col("on0"))
            >= F.abs(F.col("os1") * F.col("on0") - F.col("os0") * F.col("on1"))
            * (F.col("n1") * F.col("n0")),
            1,
        )
        .otherwise(0)
        .alias("extreme")
    )
    n_extreme = flags.agg(F.sum("extreme").alias("n_extreme"))
    return obs.crossJoin(F.broadcast(n_extreme)).select(
        "n_users",
        F.round(
            (
                F.col("s1").cast("double") / F.col("n1").cast("double")
                - F.col("s0").cast("double") / F.col("n0").cast("double")
            )
            / 100.0,
            6,
        ).alias("obs_diff"),
        F.lit(_N_PERM).cast("long").alias("n_perms"),
        F.round(
            (1.0 + F.col("n_extreme")) / (_N_PERM + 1.0), 6
        ).alias("p_value"),
    )


@register(
    "q_ml_gbm_stumps",
    oracle="""
    WITH y AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(MONTH(l_shipdate) AS BIGINT) AS m,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000 AS ym
        FROM lineitem),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ym) AS DECIMAL(38, 0)) AS s,
               SUM(CAST(ym AS DECIMAL(38, 0)) * CAST(ym AS DECIMAL(38, 0)))
                   AS s2
        FROM y),
    h1 AS (
        SELECT q, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ym) AS BIGINT) AS s
        FROM y GROUP BY q),
    c1 AS (
        SELECT q, SUM(n) OVER (ORDER BY q) AS nl,
               SUM(s) OVER (ORDER BY q) AS sl,
               SUM(n) OVER () AS nt, SUM(s) OVER () AS st
        FROM h1),
    split1 AS (
        SELECT q AS t1, nl, nt - nl AS nr, sl, st - sl AS sr,
               CAST(sl AS DOUBLE) * sl / nl
               + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl) AS score
        FROM c1 WHERE nl < nt
        ORDER BY score DESC, q LIMIT 1),
    leaf AS (
        SELECT t1,
               CAST(ROUND(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS ml,
               CAST(ROUND(CAST(sr AS DOUBLE) / nr) AS BIGINT) AS mr,
               CAST(sl AS DOUBLE) * sl / nl
               + CAST(sr AS DOUBLE) * sr / nr AS score1
        FROM split1),
    resid AS (
        SELECT y.m, y.ym - CASE WHEN y.q <= l.t1 THEN l.ml ELSE l.mr END AS r
        FROM y CROSS JOIN leaf l),
    h2 AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS s
        FROM resid GROUP BY m),
    c2 AS (
        SELECT m, SUM(n) OVER (ORDER BY m) AS nl,
               SUM(s) OVER (ORDER BY m) AS sl,
               SUM(n) OVER () AS nt, SUM(s) OVER () AS st
        FROM h2),
    split2 AS (
        SELECT m AS t2,
               CAST(sl AS DOUBLE) * sl / nl
               + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)
               - CAST(st AS DOUBLE) * st / nt AS gain2
        FROM c2 WHERE nl < nt
        ORDER BY gain2 DESC, m LIMIT 1)
    SELECT l.t1,
           ROUND(l.ml / 1000000.0, 6) AS mean_left,
           ROUND(l.mr / 1000000.0, 6) AS mean_right,
           s2.t2,
           ROUND((l.score1 - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n)
                 / (CAST(t.s2 AS DOUBLE)
                    - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n), 6)
               AS var_explained_1,
           ROUND(s2.gain2
                 / (CAST(t.s2 AS DOUBLE)
                    - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n), 6)
               AS var_explained_2
    FROM leaf l, split2 s2, tot t
    """,
)
def q_ml_gbm_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of gradient boosting with regression stumps: round
    1 finds the best quantity split for extended price by maximum
    between-group sum-of-squares (the SSE-argmin identity), fits leaf
    means micro-quantized to exact integers, and round 2 refits a
    ship-month stump on the EXACT integer residuals — the
    histogram-split + residual-refit loop that every distributed GBDT
    (XGBoost/LightGBM-style) runs per feature per node. Reports both
    splits, leaf means, and the variance explained by each round.

    Scale: each round is one map-side histogram (50 / 12 bins) plus a
    bounded-domain window split search; the residual pass is a
    broadcast of the 1-row split descriptor, never a collect. Scores
    are identical closed-form doubles over exact integer sufficient
    statistics (squares in DECIMAL(38,0)), so neither argmax can flip
    across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # y feeds three consumers (tot, the round-1 histogram, and the
    # residual pass) — persist the 3-column projection so the fact is
    # scanned once instead of three times.
    y = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.month("l_shipdate").cast("long").alias("m"),
        (F.round(F.col("l_extendedprice") * 100).cast("long") * 10000).alias(
            "ym"
        ),
    ).persist()
    dec = "decimal(38,0)"
    tot = y.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ym").cast(dec).alias("s"),
        F.sum(F.col("ym").cast(dec) * F.col("ym").cast(dec)).alias("s2"),
    )

    def split(df: DataFrame, feat: str, tname: str) -> DataFrame:
        h = df.groupBy(feat).agg(
            F.count(F.lit(1)).alias("n"), F.sum("tgt").alias("s")
        )
        wc = Window.orderBy(feat)
        wt = Window.partitionBy()
        c = h.select(
            feat,
            F.sum("n").over(wc).alias("nl"),
            F.sum("s").over(wc).alias("sl"),
            F.sum("n").over(wt).alias("nt"),
            F.sum("s").over(wt).alias("st"),
        )
        nl, sl = F.col("nl"), F.col("sl")
        nt, st = F.col("nt"), F.col("st")
        score = sl.cast("double") * sl / nl + (st - sl).cast("double") * (
            st - sl
        ) / (nt - nl)
        return (
            c.filter(nl < nt)
            .select(
                F.col(feat).alias(tname),
                nl.alias("nl"),
                (nt - nl).alias("nr"),
                sl.alias("sl"),
                (st - sl).alias("sr"),
                st.alias("st"),
                nt.alias("nt"),
                score.alias("score"),
            )
            .orderBy(F.col("score").desc(), tname)
            .limit(1)
        )

    s1 = split(y.select("q", F.col("ym").alias("tgt")), "q", "t1")
    # leaf (1 row) feeds both the residual pass and the final select —
    # persist so the round-1 split search doesn't run twice
    leaf = s1.select(
        "t1",
        F.round(F.col("sl").cast("double") / F.col("nl"))
        .cast("long")
        .alias("ml"),
        F.round(F.col("sr").cast("double") / F.col("nr"))
        .cast("long")
        .alias("mr"),
        (
            F.col("sl").cast("double") * F.col("sl") / F.col("nl")
            + F.col("sr").cast("double") * F.col("sr") / F.col("nr")
        ).alias("score1"),
    ).persist()
    resid = y.crossJoin(F.broadcast(leaf)).select(
        "m",
        (
            F.col("ym")
            - F.when(F.col("q") <= F.col("t1"), F.col("ml")).otherwise(
                F.col("mr")
            )
        ).alias("tgt"),
    )
    s2 = split(resid, "m", "t2").select(
        "t2",
        (
            F.col("score")
            - F.col("st").cast("double") * F.col("st") / F.col("nt")
        ).alias("gain2"),
    )
    tss = (
        F.col("s2d").cast("double")
        - F.col("sd").cast("double") * F.col("sd").cast("double") / F.col("nd")
    )
    return (
        leaf.crossJoin(F.broadcast(s2))
        .crossJoin(
            F.broadcast(
                tot.select(
                    F.col("n").alias("nd"),
                    F.col("s").alias("sd"),
                    F.col("s2").alias("s2d"),
                )
            )
        )
        .select(
            "t1",
            F.round(F.col("ml") / 1000000.0, 6).alias("mean_left"),
            F.round(F.col("mr") / 1000000.0, 6).alias("mean_right"),
            "t2",
            F.round(
                (
                    F.col("score1")
                    - F.col("sd").cast("double")
                    * F.col("sd").cast("double")
                    / F.col("nd")
                )
                / tss,
                6,
            ).alias("var_explained_1"),
            F.round(F.col("gain2") / tss, 6).alias("var_explained_2"),
        )
    )
