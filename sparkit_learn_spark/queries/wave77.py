"""Round-6 wave 77: uplift decile analysis with a Qini curve (the
incremental-effect evaluation behind targeting models), split-
conformal prediction intervals (distribution-free error bars from a
calibration quantile), and an HdrHistogram-style log2 latency
profile (exact power-of-two bucketing via binary-string length, no
IEEE log2). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_uplift_qini",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS treated,
               CAST(COUNT(*) AS BIGINT) AS activity,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    banded AS (
        SELECT treated, conv,
               NTILE(10) OVER (ORDER BY activity DESC, user_id) AS band
        FROM per_user),
    h AS (
        SELECT band,
               CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN treated = 1 THEN conv ELSE 0 END)
                    AS BIGINT) AS c_t,
               CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN treated = 0 THEN conv ELSE 0 END)
                    AS BIGINT) AS c_c
        FROM banded GROUP BY band),
    cum AS (
        SELECT band, n_t, c_t, n_c, c_c,
               SUM(n_t) OVER (ORDER BY band) AS cnt,
               SUM(c_t) OVER (ORDER BY band) AS cct,
               SUM(n_c) OVER (ORDER BY band) AS cnc,
               SUM(c_c) OVER (ORDER BY band) AS ccc
        FROM h)
    SELECT band, n_t, n_c,
           ROUND(CASE WHEN n_t > 0 THEN CAST(c_t AS DOUBLE) / n_t
                      ELSE 0.0 END
                 - CASE WHEN n_c > 0 THEN CAST(c_c AS DOUBLE) / n_c
                        ELSE 0.0 END + 0.0, 6) AS band_uplift,
           ROUND(cct - CASE WHEN cnc > 0
                            THEN CAST(ccc AS DOUBLE) * cnt / cnc
                            ELSE 0.0 END + 0.0, 6) AS qini
    FROM cum
    ORDER BY band
    """,
)
def q_ml_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift decile analysis + Qini curve: users split by a portable
    hash into treated/control, banded into activity deciles (the
    stand-in for a targeting-model score), then each band's
    incremental conversion rate and the cumulative Qini value
    Q(k) = convs_t(≤k) − convs_c(≤k)·N_t(≤k)/N_c(≤k) — the curve
    whose area separates a useful targeting model from random
    targeting. Deterministic NTILE order, exact integer counts,
    one division per readout cell.

    Scale: one fact pass to user grain, a user-grain NTILE (the
    documented single-pass global sort at score grain — at 100 TB
    the histogram-banding rewrite the gains/lift table uses applies
    verbatim), then 10-row arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    banded = per_user.select(
        "treated",
        "conv",
        F.ntile(10)
        .over(Window.orderBy(F.col("activity").desc(), "user_id"))
        .alias("band"),
    )
    t1 = F.col("treated") == 1
    h = banded.groupBy("band").agg(
        F.sum(F.when(t1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(t1, F.col("conv")).otherwise(0)).alias("c_t"),
        F.sum(F.when(~t1, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(~t1, F.col("conv")).otherwise(0)).alias("c_c"),
    )
    wc = Window.orderBy("band")
    cum = h.select(
        "band",
        "n_t",
        "c_t",
        "n_c",
        "c_c",
        F.sum("n_t").over(wc).alias("cnt"),
        F.sum("c_t").over(wc).alias("cct"),
        F.sum("n_c").over(wc).alias("cnc"),
        F.sum("c_c").over(wc).alias("ccc"),
    )
    return cum.select(
        "band",
        "n_t",
        "n_c",
        F.round(
            F.when(
                F.col("n_t") > 0, F.col("c_t").cast("double") / F.col("n_t")
            ).otherwise(0.0)
            - F.when(
                F.col("n_c") > 0, F.col("c_c").cast("double") / F.col("n_c")
            ).otherwise(0.0),
            6,
        ).alias("band_uplift"),
        F.round(
            F.col("cct")
            - F.when(
                F.col("cnc") > 0,
                F.col("ccc").cast("double") * F.col("cnt") / F.col("cnc"),
            ).otherwise(0.0),
            6,
        ).alias("qini"),
    ).orderBy("band")


@register(
    "q_ml_conformal",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS fold
        FROM orders),
    fit AS (
        SELECT o_orderpriority,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM base WHERE fold = 0 GROUP BY o_orderpriority),
    cal AS (
        SELECT CAST(ROUND(ABS(b.cents - CAST(f.s AS DOUBLE) / f.n))
                    AS BIGINT) AS resid
        FROM base b JOIN fit f USING (o_orderpriority)
        WHERE b.fold = 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cal),
    h AS (SELECT resid, CAST(COUNT(*) AS BIGINT) AS c
          FROM cal GROUP BY resid),
    cum AS (
        SELECT resid,
               SUM(c) OVER (ORDER BY resid) AS cc
        FROM h),
    q AS (
        SELECT MIN(resid) AS q90
        FROM cum CROSS JOIN nn
        WHERE cc >= (9 * nn.n + 9) // 10),
    cov AS (
        SELECT CAST(SUM(CASE WHEN cal.resid <= q.q90 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_in
        FROM cal CROSS JOIN q)
    SELECT nn.n AS n_calibration,
           q.q90 AS q90_resid_cents,
           ROUND(q.q90 / 100.0, 6) AS interval_halfwidth,
           ROUND(CAST(cov.n_in AS DOUBLE) / nn.n, 6) AS empirical_coverage,
           CAST(cov.n_in * 10 >= nn.n * 9 AS BIGINT) AS coverage_ok
    FROM nn CROSS JOIN q CROSS JOIN cov
    """,
)
def q_ml_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval: a per-priority mean model
    is fit on even order keys, absolute residuals on the odd-key
    calibration half are quantized to exact integer cents, and the
    90% conformal half-width is the calibration residuals' ceil(0.9n)
    order statistic — found by the histogram cumulative-crossing
    idiom, never a global sort. The distribution-free error bar
    (valid regardless of model quality) every production prediction
    service should ship alongside point estimates; the coverage
    proof bit re-checks ≥90% containment in pure integer arithmetic.

    Scale: two hash aggregates (fit at priority grain, residual
    histogram at distinct-residual grain) and a broadcast of the
    5-row model — nothing fact-grain shuffles twice; the quantile is
    a window over the bounded residual-value domain.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("fold"),
    )
    fit = (
        base.filter(F.col("fold") == 0)
        .groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    cal = (
        base.filter(F.col("fold") == 1)
        .join(F.broadcast(fit), "o_orderpriority")
        .select(
            F.round(
                F.abs(
                    F.col("cents") - F.col("s").cast("double") / F.col("n")
                )
            )
            .cast("long")
            .alias("resid")
        )
    )
    cal = cal.persist()
    nn = cal.agg(F.count(F.lit(1)).alias("n"))
    h = cal.groupBy("resid").agg(F.count(F.lit(1)).alias("c"))
    cum = h.select(
        "resid", F.sum("c").over(Window.orderBy("resid")).alias("cc")
    )
    q = (
        cum.crossJoin(F.broadcast(nn))
        .filter(F.col("cc") >= F.expr("(9 * n + 9) div 10"))
        .agg(F.min("resid").alias("q90"))
    )
    cov = cal.crossJoin(F.broadcast(q)).agg(
        F.sum(
            F.when(F.col("resid") <= F.col("q90"), 1).otherwise(0)
        ).alias("n_in")
    )
    return (
        nn.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(cov))
        .select(
            F.col("n").alias("n_calibration"),
            F.col("q90").alias("q90_resid_cents"),
            F.round(F.col("q90") / 100.0, 6).alias("interval_halfwidth"),
            F.round(F.col("n_in").cast("double") / F.col("n"), 6).alias(
                "empirical_coverage"
            ),
            (F.col("n_in") * 10 >= F.col("n") * 9)
            .cast("long")
            .alias("coverage_ok"),
        )
    )


@register(
    "q_evt_latency_hdr",
    oracle="""
    WITH gaps AS (
        SELECT CAST(DATEDIFF('microsecond',
                    LAG(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id), ts)
                    AS BIGINT) AS gap_us
        FROM events),
    pos AS (SELECT gap_us FROM gaps WHERE gap_us > 0),
    b AS (
        SELECT LENGTH(BIN(gap_us)) AS bucket, gap_us FROM pos),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pos)
    SELECT CAST(b.bucket AS BIGINT) AS bucket,
           CAST(2 ** (b.bucket - 1) AS BIGINT) AS lo_us,
           CAST(2 ** b.bucket - 1 AS BIGINT) AS hi_us,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MAX(b.gap_us) AS BIGINT) AS max_in_bucket,
           ROUND(COUNT(*) / CAST(n.n AS DOUBLE), 6) AS share
    FROM b CROSS JOIN n
    GROUP BY b.bucket, n.n
    ORDER BY bucket
    """,
)
def q_evt_latency_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HdrHistogram-style latency profile: per-user inter-event gaps
    in exact integer microseconds, bucketed by power of two via the
    BINARY-STRING length (LENGTH(BIN(gap)) — the same no-IEEE-log2
    trick as the HLL sketch; FLOOR(LOG2(x)) misbuckets exactly at
    power-of-two boundaries where libm rounds differently). The
    log-scaled histogram that latency SLO dashboards (HdrHistogram,
    Prometheus le-buckets) are built on.

    Scale: one keyed LAG pass, then a map-side-combining aggregate at
    bucket grain (≤ 64 buckets) — the profile is constant-size
    regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (us - F.unix_micros(F.lag("ts").over(w).cast("timestamp_ltz"))).alias(
            "gap_us"
        )
    ).filter(F.col("gap_us") > 0)
    b = gaps.select(
        F.length(F.bin("gap_us")).cast("long").alias("bucket"), "gap_us"
    )
    n = gaps.agg(F.count(F.lit(1)).alias("n"))
    return (
        b.crossJoin(F.broadcast(n))
        .groupBy("bucket", "n")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.max("gap_us").alias("max_in_bucket"),
        )
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket") - 1).cast("long").alias("lo_us"),
            (F.pow(F.lit(2.0), F.col("bucket")).cast("long") - 1).alias(
                "hi_us"
            ),
            "n_gaps",
            "max_in_bucket",
            F.round(F.col("n_gaps") / F.col("n").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy("bucket")
    )
