"""Round-6 statistics battery: the classical-inference surface an
analytics engine needs for experiment readouts and data-drift checks —
Welch's t-test, chi-square independence, two-sample Kolmogorov-Smirnov
(computed with a two-phase distributed prefix sum, no global window),
lag-k autocorrelation, an integer-space CUSUM changepoint locator, IQR
outlier fencing, and a Kaplan-Meier survival curve with right
censoring. Every query is exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_welch_ttest",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               AVG("value") AS m,
               VAR_SAMP("value") AS s2
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY event_type),
    w AS (
        SELECT MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
               MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
               MAX(CASE WHEN event_type = 'purchase' THEN m END) AS m1,
               MAX(CASE WHEN event_type = 'click' THEN m END) AS m2,
               MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS v1,
               MAX(CASE WHEN event_type = 'click' THEN s2 END) AS v2
        FROM g)
    SELECT n1, n2,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(POW(v1 / n1 + v2 / n2, 2)
                 / (POW(v1 / n1, 2) / (n1 - 1)
                    + POW(v2 / n2, 2) / (n2 - 1)), 6) AS df_welch
    FROM w
    """,
)
def q_stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test comparing purchase
    vs click event values: per-group (n, mean, sample variance) from
    ONE hash aggregate, then the t statistic and Welch-Satterthwaite
    degrees of freedom in closed form on the two-row result.

    Scale: a 100 TB A/B readout is exactly this shape — one
    map-side-combined aggregate per arm, O(1) driver math. No shuffle
    beyond the 2-group agg."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("s2"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("event_type") == t, F.col(c))).alias(a)
            for t, c, a in [
                ("purchase", "n", "n1"), ("click", "n", "n2"),
                ("purchase", "m", "m1"), ("click", "m", "m2"),
                ("purchase", "s2", "v1"), ("click", "s2", "v2"),
            ]
        ]
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return w.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, F.lit(2))
            / (
                F.pow(F.col("v1") / F.col("n1"), F.lit(2)) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), F.lit(2)) / (F.col("n2") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


@register(
    "q_stat_chi2",
    oracle="""
    WITH cell AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p,
               CAST(COUNT(*) AS DOUBLE) AS obs
        FROM orders GROUP BY 1, 2),
    rt AS (SELECT s, SUM(obs) AS row_tot FROM cell GROUP BY s),
    ct AS (SELECT p, SUM(obs) AS col_tot FROM cell GROUP BY p),
    n AS (SELECT SUM(obs) AS grand FROM cell)
    SELECT CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
           * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
           ROUND(SUM(POW(obs - row_tot * col_tot / grand, 2)
                     / (row_tot * col_tot / grand)), 6) AS chi2
    FROM cell JOIN rt USING (s) JOIN ct USING (p) CROSS JOIN n
    """,
)
def q_stat_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence on the order-status x
    order-priority contingency table: observed counts from one hash
    aggregate, expected = row_total*col_total/grand joined back in
    (row/col marginals are category-cardinality-sized, so both joins
    broadcast), chi2 = sum (O-E)^2/E. Counts are exact integers, so
    cross-engine determinism holds up to the final 6dp round.

    Scale: one shuffle over the 100 TB fact (to ~R*C cells), then
    cell-count-sized arithmetic — the canonical drift detector."""
    cell = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
        )
        .agg(F.count("*").cast("double").alias("obs"))
    )
    rt = cell.groupBy("s").agg(F.sum("obs").alias("row_tot"))
    ct = cell.groupBy("p").agg(F.sum("obs").alias("col_tot"))
    grand = cell.agg(F.sum("obs").alias("grand"))
    dof = (
        rt.count() - 1
    ) * (ct.count() - 1)  # category cardinalities: tiny, two O(1) jobs
    e = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    return (
        cell.join(F.broadcast(rt), "s")
        .join(F.broadcast(ct), "p")
        .crossJoin(F.broadcast(grand))
        .agg(
            F.lit(dof).cast("long").alias("dof"),
            F.round(F.sum(F.pow(F.col("obs") - e, F.lit(2)) / e), 6).alias("chi2"),
        )
    )


@register(
    "q_stat_ks_2samp",
    oracle="""
    WITH s AS (
        SELECT "value" AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
        FROM events WHERE event_type IN ('purchase', 'click')),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                   CAST(SUM(b) AS BIGINT) AS nb FROM s),
    g AS (SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM s GROUP BY v),
    c AS (SELECT SUM(ca) OVER (ORDER BY v) AS cuma,
                 SUM(cb) OVER (ORDER BY v) AS cumb
          FROM g)
    SELECT na, nb,
           ROUND(MAX(ABS(cuma / CAST(na AS DOUBLE)
                         - cumb / CAST(nb AS DOUBLE))), 6) AS ks_d
    FROM c CROSS JOIN tot GROUP BY na, nb
    """,
)
def q_stat_ks_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the purchase
    and click value distributions: D = max_v |F1(v) - F2(v)|, with both
    ECDFs evaluated at every distinct observed value.

    Scale: the cumulative counts are a distributed two-phase prefix
    sum (range-repartition on value -> per-partition window + one
    O(partitions) offset collect, the operators/packing.py pattern) —
    NO single-partition global window anywhere, so the ECDF sweep
    scales to 100 TB value columns. D itself is then a plain max-agg."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    s = e.select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("b"),
    )
    g = (
        s.groupBy("v")
        .agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
        .repartitionByRange(F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        part_rows = sorted(
            g.groupBy("_pid")
            .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
            .collect(),
            key=lambda r: r["_pid"],
        )
        offs, ra, rb = [], 0, 0
        for r in part_rows:  # O(partitions) driver loop, not O(rows)
            offs.append((r["_pid"], ra, rb))
            ra += r["ta"]
            rb += r["tb"]
        na, nb = ra, rb
        off_df = g.sparkSession.createDataFrame(
            offs, schema="_pid int, oa long, ob long"
        )
        w = Window.partitionBy("_pid").orderBy("v")
        cum = g.join(F.broadcast(off_df), "_pid").select(
            (F.col("oa") + F.sum("ca").over(w)).alias("cuma"),
            (F.col("ob") + F.sum("cb").over(w)).alias("cumb"),
        )
        out = cum.agg(
            F.lit(na).cast("long").alias("na"),
            F.lit(nb).cast("long").alias("nb"),
            F.round(
                F.max(
                    F.abs(
                        F.col("cuma") / F.lit(float(na))
                        - F.col("cumb") / F.lit(float(nb))
                    )
                ),
                6,
            ).alias("ks_d"),
        ).localCheckpoint(eager=True)
    finally:
        g.unpersist()
    return out


@register(
    "q_ts_autocorr",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1),
    l AS (
        SELECT rev,
               LAG(rev, 1) OVER (ORDER BY day) AS rev_1,
               LAG(rev, 7) OVER (ORDER BY day) AS rev_7
        FROM d)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CORR(rev, rev_1), 6) AS acf_1,
           ROUND(CORR(rev, rev_7), 6) AS acf_7
    FROM l
    """,
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily-revenue series —
    the stationarity / weekly-seasonality probe. CORR ignores rows
    where the lag is NULL, so each ACF uses exactly the overlapping
    pairs (scipy convention for acf without detrending).

    Scale: the 100 TB fact collapses to one row per day BEFORE the
    window; the unpartitioned lag then runs over a
    calendar-bounded (~2.4k rows here) series — the same
    post-aggregation-shrink contract as q_llm_zipf."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("day")  # post-shrink: one row per calendar day
    lagged = d.select(
        "rev",
        F.lag("rev", 1).over(w).alias("rev_1"),
        F.lag("rev", 7).over(w).alias("rev_7"),
    )
    return lagged.agg(
        F.count("*").alias("n_days"),
        F.round(F.corr("rev", "rev_1"), 6).alias("acf_1"),
        F.round(F.corr("rev", "rev_7"), 6).alias("acf_7"),
    )


@register(
    "q_ts_cusum",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
        FROM orders GROUP BY 1),
    p AS (
        SELECT day, rev_c,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_days,
               SUM(rev_c) OVER () AS tot_c,
               SUM(rev_c) OVER (ORDER BY day) AS cum_c,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
        FROM d),
    s AS (
        SELECT day, n_days,
               n_days * cum_c - i * tot_c AS cusum_scaled
        FROM p)
    SELECT day AS changepoint_day,
           ROUND(ABS(cusum_scaled) / (n_days * 100.0), 2) AS max_abs_cusum
    FROM s
    ORDER BY ABS(cusum_scaled) DESC, day ASC LIMIT 1
    """,
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator on daily revenue: the day maximising
    |sum_{t<=i}(rev_t - mean)|. Computed ENTIRELY in integer cents
    scaled by n_days (cusum_i * n = n*cum_i - i*total), so the argmax
    is bit-exact across engines — no float summation-order hazard in
    the ordering (workflow rule: thresholds/argmax in integer space).
    Magnitudes: cents * n_days * days fits int64 through sf100.

    Scale: per-day shrink first; the ordered window then spans only
    the calendar-sized series."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("rev_c")
        )
    )
    w = Window.orderBy("day")  # post-shrink calendar series
    p = d.select(
        "day",
        F.count("*").over(Window.partitionBy()).alias("n_days"),
        F.sum("rev_c").over(Window.partitionBy()).alias("tot_c"),
        F.sum("rev_c").over(w).alias("cum_c"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    s = p.select(
        "day",
        "n_days",
        (F.col("n_days") * F.col("cum_c") - F.col("i") * F.col("tot_c")).alias(
            "cusum_scaled"
        ),
    )
    return (
        s.orderBy(F.abs(F.col("cusum_scaled")).desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.round(
                F.abs(F.col("cusum_scaled")) / (F.col("n_days") * F.lit(100.0)), 2
            ).alias("max_abs_cusum"),
        )
    )


@register(
    "q_dq_iqr_outliers",
    oracle="""
    WITH f AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY 1)
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           ROUND(MAX(CASE WHEN o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                          THEN o.o_totalprice END), 2) AS max_outlier,
           ROUND(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS hi_fence
    FROM orders o JOIN f USING (o_orderpriority)
    GROUP BY o.o_orderpriority, f.q1, f.q3
    ORDER BY o.o_orderpriority
    """,
)
def q_dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per priority class: exact interpolated
    quartiles (percentile_cont semantics, parity proven by
    q_agg_percentile), high fence = Q3 + 1.5*IQR, then a second pass
    counts and bounds the violators. (TPC-H totalprice has no low-side
    outliers by construction, so the audit reports the high side.)

    Scale: pass 1 is a per-group exact percentile (memory-bound per
    group — the approx-quantile variant is the looser 100 TB path);
    the fences table is category-sized and broadcast back, so pass 2
    is a scan + broadcast join, no fact shuffle."""
    o = load_table(spark, sf_dir, "orders")
    f = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    out = F.col("o_totalprice") > hi
    return (
        o.join(F.broadcast(f), "o_orderpriority")
        .groupBy("o_orderpriority", "q1", "q3")
        .agg(
            F.count("*").alias("n"),
            F.sum(out.cast("long")).alias("n_high"),
            F.round(F.max(F.when(out, F.col("o_totalprice"))), 2).alias(
                "max_outlier"
            ),
            F.round(F.max(hi), 6).alias("hi_fence"),
        )
        .drop("q1", "q3")
        .orderBy("o_orderpriority")
    )
