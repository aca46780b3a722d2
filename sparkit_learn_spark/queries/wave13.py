"""Round-6 wave 13: Z-order (Morton) clustering codes for
multi-dimensional data layout, a 2D skyline (Pareto-front) operator,
and funnel step-timing percentiles (discrete quantiles over exact
microsecond delays). All exactly DuckDB-oracled in pure integer
space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_Z_BITS = 16


def _morton_expr_spark(x, y):
    """Bit-interleave two 16-bit ints (x even bits, y odd bits) with
    shift/mask arithmetic — exact integers, so Spark and the DuckDB
    oracle (same arithmetic with >>/&) agree bit-for-bit."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _morton_expr_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "q_sort_zorder",
    oracle=f"""
    WITH k AS (
        SELECT o_orderkey,
               CAST(o_custkey % 65536 AS BIGINT) AS ck16,
               CAST(DATE_DIFF('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
        FROM orders)
    SELECT o_orderkey, ck16, day_num,
           CAST({_morton_expr_sql("ck16", "day_num")} AS BIGINT) AS zcode
    FROM k
    ORDER BY zcode, o_orderkey
    LIMIT 100
    """,
)
def q_sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering codes: interleave the bits of
    customer key and order day into one locality-preserving sort key —
    the layout trick behind multi-dimensional data skipping (rows close
    in (customer, date) land in the same file, so min/max zone maps
    prune BOTH predicates). Emits the first 100 rows of the z-ordered
    layout; pure shift/mask integer arithmetic, so the DuckDB oracle
    matches bit-for-bit.

    Scale: the code is a row-local expression (no shuffle to compute);
    the global sort here stands in for the repartitionByRange(zcode)
    write a 100 TB table would do once at layout time, and the top-100
    compiles to TakeOrderedAndProject — no full sort materializes."""
    o = load_table(spark, sf_dir, "orders")
    k = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("long").alias("ck16"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("day_num"),
    )
    return (
        k.select(
            "o_orderkey",
            "ck16",
            "day_num",
            _morton_expr_spark(F.col("ck16"), F.col("day_num")).alias("zcode"),
        )
        .orderBy("zcode", "o_orderkey")
        .limit(100)
    )


@register(
    "q_agg_skyline",
    oracle="""
    WITH g AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
               MAX(CAST(o_orderdate AS DATE)) AS d
        FROM orders GROUP BY 1),
    w AS (
        SELECT price_c, d,
               MAX(d) OVER (ORDER BY price_c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS best_d
        FROM g)
    SELECT price_c, ROUND(price_c / 100.0, 2) AS price, d AS orderdate
    FROM w WHERE best_d IS NULL OR d > best_d
    """,
)
def q_agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto front): orders not dominated on (lower
    price, more recent date) — the classic 'cheapest recent offers'
    operator. Reduce to per-price max date (hash agg), sort by price,
    keep rows whose date beats the running max of every cheaper price.
    Exact integer cents and date comparisons — no float can move the
    front.

    Scale: skyline is DECOMPOSABLE — the per-price max-date hash
    aggregate runs distributed with map-side combine and shrinks the
    fact to distinct-price grain; only that (bounded-domain) histogram
    enters the single ordered pass, the same histogram-then-scan shape
    as q_agg_weighted_median. A 100 TB variant would add a coarse
    price-bucket pre-skyline per partition to cut the histogram
    further; the final pass is inherently sequential in price order."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c")
    ).agg(F.max(F.col("o_orderdate").cast("date")).alias("d"))
    w = g.select(
        "price_c",
        "d",
        F.max("d")
        .over(
            Window.orderBy("price_c").rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("best_d"),
    )
    return w.filter(F.col("best_d").isNull() | (F.col("d") > F.col("best_d"))).select(
        "price_c",
        F.round(F.col("price_c") / 100.0, 2).alias("price"),
        F.col("d").alias("orderdate"),
    )


@register(
    "q_evt_funnel_timing",
    oracle="""
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(epoch_us(e.ts) - epoch_us(su.t0)) AS delay_us
        FROM events e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id),
    h AS (SELECT delay_us, CAST(COUNT(*) AS BIGINT) AS cnt FROM pu GROUP BY 1),
    c AS (
        SELECT delay_us, cnt,
               SUM(cnt) OVER (ORDER BY delay_us) AS cum,
               SUM(cnt) OVER () AS n
        FROM h)
    SELECT CAST(MIN(n) AS BIGINT) AS n_converted,
           ROUND(MIN(delay_us) FILTER (WHERE cum * 2 >= n) / 6e7, 6)
               AS median_minutes,
           ROUND(MIN(delay_us) FILTER (WHERE cum * 10 >= 9 * n) / 6e7, 6)
               AS p90_minutes
    FROM c
    """,
)
def q_evt_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step timing: per user, the delay from first signup to
    first subsequent purchase; report converted-user count plus the
    exact discrete median and p90 delay in minutes. Delays are exact
    microsecond integers, quantiles use the histogram + integer
    cumulative-crossing pattern (smallest delay with 2·cum >= n /
    10·cum >= 9·n) — quantile_disc semantics with no engine
    interpolation variance.

    Scale: two keyed aggregations (user grain) and one bounded-domain
    histogram pass — the delay histogram, not users, enters the global
    window; at 100 TB you would additionally bucket delays (e.g. to
    seconds) to cap the histogram, trading exactness knowingly."""
    e = load_table(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                - F.unix_micros(F.col("t0").cast("timestamp_ltz"))
            ).alias("delay_us")
        )
    )
    h = pu.groupBy("delay_us").agg(F.count("*").alias("cnt"))
    c = h.select(
        "delay_us",
        F.sum("cnt").over(Window.orderBy("delay_us")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    return c.agg(
        F.min("n").alias("n_converted"),
        F.round(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("delay_us")))
            / 6e7,
            6,
        ).alias("median_minutes"),
        F.round(
            F.min(F.when(F.col("cum") * 10 >= 9 * F.col("n"), F.col("delay_us")))
            / 6e7,
            6,
        ).alias("p90_minutes"),
    )
