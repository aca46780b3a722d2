"""Round-8 wave 138: execution-strategy queries — salted two-phase
aggregation over a skewed key (the standard hot-key mitigation,
proven algebraically equal to the direct aggregate), the NOT IN
vs NOT EXISTS null-semantics trap (three-valued logic audit), and a
deterministic-sample AQP estimate with its error accounting against
the exact answer. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: salt fan-out for the two-phase aggregate.
SALTS = 8

#: AQP sampling: keep rows whose portable 16-bit hash falls below
#: ``FRAC_NUM``/65536 (~10%).
FRAC_NUM = 6554


@register(
    "q_agg_salted_hot_keys",
    oracle="""
    WITH salted AS (
        SELECT l_returnflag, l_orderkey % 8 AS salt,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS q100
        FROM lineitem GROUP BY 1, 2),
    combined AS (
        SELECT l_returnflag, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(q100) AS BIGINT) AS q100,
               CAST(COUNT(*) AS BIGINT) AS n_salt_parts
        FROM salted GROUP BY 1),
    direct AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS q100
        FROM lineitem GROUP BY 1)
    SELECT c.l_returnflag, c.n AS n_rows, c.q100 AS quantity_x100,
           c.n_salt_parts,
           CASE WHEN c.n = d.n AND c.q100 = d.q100 THEN 1 ELSE 0 END
               AS salted_equals_direct
    FROM combined c JOIN direct d ON d.l_returnflag = c.l_returnflag
    ORDER BY c.l_returnflag
    """,
)
def q_agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: the 3-value l_returnflag key is
    maximally hot (every reducer key holds ~1/3 of a 100 TB fact), so
    phase 1 aggregates on (key, salt) — 8-way fan-out, load spread —
    and phase 2 combines the partials on the bare key. Emits the
    combined aggregate plus a per-key proof bit against the direct
    single-phase groupBy: the salting is pure monoid algebra, so the
    bit can never flip. Deterministic salt (orderkey % 8) keeps the
    oracle exact; production would use a round-robin salt, same
    algebra.

    Scale: phase 1 shuffles to 3×8 = 24 reducer keys instead of 3;
    phase 2 moves 24 partial rows. The proof join is broadcast-size."""
    li = load_table(spark, sf_dir, "lineitem")
    q100 = F.round(F.col("l_quantity") * 100).cast("long")
    salted = li.groupBy(
        "l_returnflag", (F.col("l_orderkey") % SALTS).alias("salt")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(q100).alias("q100"))
    combined = salted.groupBy("l_returnflag").agg(
        F.sum("n").alias("n"),
        F.sum("q100").alias("q100"),
        F.count(F.lit(1)).alias("n_salt_parts"),
    )
    direct = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("dn"), F.sum(q100).alias("dq100")
    )
    return (
        combined.join(direct, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n").alias("n_rows"),
            F.col("q100").alias("quantity_x100"),
            "n_salt_parts",
            F.when(
                (F.col("n") == F.col("dn")) & (F.col("q100") == F.col("dq100")),
                1,
            ).otherwise(0).alias("salted_equals_direct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_sql_not_in_nulls",
    oracle="""
    WITH probe AS (
        SELECT c_custkey FROM customer),
    keys_with_null AS (
        SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                    ELSE o_custkey END AS k
        FROM orders),
    not_in_naive AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe
        WHERE c_custkey NOT IN (SELECT k FROM keys_with_null)),
    not_in_filtered AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe
        WHERE c_custkey NOT IN (SELECT k FROM keys_with_null
                                WHERE k IS NOT NULL)),
    not_exists AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe p
        WHERE NOT EXISTS (SELECT 1 FROM keys_with_null x
                          WHERE x.k = p.c_custkey))
    SELECT ni.n AS not_in_naive,
           nf.n AS not_in_null_filtered,
           ne.n AS not_exists,
           CASE WHEN ni.n = 0 AND ne.n > 0 THEN 1 ELSE 0 END
               AS null_trap_sprung,
           CASE WHEN nf.n = ne.n THEN 1 ELSE 0 END AS filtered_matches
    FROM not_in_naive ni, not_in_filtered nf, not_exists ne
    """,
)
def q_sql_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic audit: NOT IN against a key set containing a
    NULL returns UNKNOWN for every probe row (so zero rows survive —
    the classic silent-wrong-answer trap), while NOT EXISTS and the
    null-filtered NOT IN return the true anti-join count. One row with
    all three counts and two proof bits: the trap fired, and filtering
    nulls restores NOT EXISTS semantics. Both engines implement ANSI
    three-valued logic, so the oracle is exact — this query exists
    because a migration that 'optimizes' NOT EXISTS into NOT IN
    corrupts results only when a null sneaks into the subquery.

    Scale: two anti joins and one null-poisoned aggregate — all
    broadcast-able; the point is semantics, not volume."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 1000 == 0, None)
        .otherwise(F.col("o_custkey")).alias("k")
    )
    c.createOrReplaceTempView("w138_probe")
    o.createOrReplaceTempView("w138_keys")
    return spark.sql("""
        WITH not_in_naive AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w138_probe
            WHERE c_custkey NOT IN (SELECT k FROM w138_keys)),
        not_in_filtered AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w138_probe
            WHERE c_custkey NOT IN (SELECT k FROM w138_keys
                                    WHERE k IS NOT NULL)),
        not_exists AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w138_probe p
            WHERE NOT EXISTS (SELECT 1 FROM w138_keys x
                              WHERE x.k = p.c_custkey))
        SELECT ni.n AS not_in_naive,
               nf.n AS not_in_null_filtered,
               ne.n AS not_exists,
               CASE WHEN ni.n = 0 AND ne.n > 0 THEN 1 ELSE 0 END
                   AS null_trap_sprung,
               CASE WHEN nf.n = ne.n THEN 1 ELSE 0 END AS filtered_matches
        FROM not_in_naive ni, not_in_filtered nf, not_exists ne
    """)


@register(
    "q_agg_aqp_estimate",
    oracle=f"""
    WITH s AS (
        SELECT o_totalprice,
               CASE WHEN CAST(concat('0x', substr(
                        md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                        AS BIGINT) < {FRAC_NUM} THEN 1 ELSE 0 END AS keep
        FROM orders),
    est AS (
        SELECT CAST(SUM(keep) AS BIGINT) AS n_sample,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(keep * CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sample_cents
        FROM s),
    exact AS (
        SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS exact_cents
        FROM orders)
    SELECT n_sample, n_total,
           ROUND(sample_cents * (65536.0 / {FRAC_NUM}) / 100, 6)
               AS est_revenue,
           ROUND(exact_cents / 100.0, 6) AS exact_revenue,
           ROUND(ABS(sample_cents * (65536.0 / {FRAC_NUM})
                     - exact_cents) / exact_cents, 6) AS rel_error
    FROM est CROSS JOIN exact
    """,
)
def q_agg_aqp_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with error accounting: a
    deterministic ~10% hash sample (portable md5 16-bit prefix, the
    sampling waves' convention) scaled by the inverse sampling rate
    estimates total order revenue; reported beside the exact answer
    and the realized relative error — the measurement that licenses
    answering dashboards from a sample at 100 TB. Hash sampling (not
    Bernoulli RNG) keeps the estimate reproducible AND oracle-exact.

    Scale: the sample flag is a row-local expression evaluated inside
    the scan stage (a hash of the key cannot reach parquet footers —
    production would PARTITION BY a hash bucket column to get true
    scan pruning); the estimate is one map-side-combinable aggregate,
    and the exact twin here exists only for the error accounting."""
    o = load_table(spark, sf_dir, "orders")
    keep = F.when(
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4),
            16, 10,
        ).cast("long") < FRAC_NUM,
        1,
    ).otherwise(0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    est = o.select(keep.alias("keep"), cents.alias("cents")).agg(
        F.sum("keep").alias("n_sample"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("keep") * F.col("cents")).alias("sample_cents"),
    )
    exact = o.agg(F.sum(cents).alias("exact_cents"))
    scale = 65536.0 / FRAC_NUM
    return est.crossJoin(F.broadcast(exact)).select(
        "n_sample", "n_total",
        F.round(F.col("sample_cents") * scale / 100, 6).alias("est_revenue"),
        F.round(F.col("exact_cents") / 100.0, 6).alias("exact_revenue"),
        F.round(
            F.abs(F.col("sample_cents") * scale - F.col("exact_cents"))
            / F.col("exact_cents"),
            6,
        ).alias("rel_error"),
    )
