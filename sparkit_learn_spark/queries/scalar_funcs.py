"""Scalar function library (q_str_*, q_date_*, q_math_*, q_cond_*).

All built-in pyspark.sql.functions — JVM-side, codegen'd, never UDFs
(SURVEY §4: "UDFs are the slow path"). Engine-parity notes per
function are inline where Spark and DuckDB semantics diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                       AS name_lower,
           upper(c_mktsegment)                 AS seg_upper,
           substr(c_name, 1, 8)                AS name_prefix,
           CAST(length(c_name) AS BIGINT)      AS name_len,
           trim(concat('  ', c_name, '  '))    AS name_trim,
           concat(c_name, '/', c_mktsegment)   AS name_seg,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/substr/length/trim/concat/lpad."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@register(
    "q_str_split_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           string_split(p_name, ' ')[1]                   AS first_word,
           regexp_extract(p_brand, '#(\\d+)', 1)          AS brand_num,
           replace(p_type, ' ', '_')                      AS type_snake
    FROM part
    """,
)
def q_str_split_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / regexp_extract / replace. (DuckDB lists are 1-indexed,
    Spark arrays 0-indexed via getItem — element_at is 1-based in both.)"""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)        AS yr,
           CAST(month(o_orderdate) AS INT)       AS mo,
           CAST(quarter(o_orderdate) AS INT)     AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           date_trunc('month', o_orderdate)      AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/quarter/dayofweek/date_trunc/datediff/date_add.

    Parity: Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday —
    oracle adds 1. Spark datediff(end, start) ≡ DuckDB
    datediff('day', start, end).
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(d.cast("date"), 30).alias("due_date"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                     AS price_r1,
           ROUND(abs(l_extendedprice - 30000), 6)        AS abs_dev,
           CAST(ceil(l_quantity) AS BIGINT)              AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
           ROUND(sqrt(l_extendedprice), 6)               AS price_sqrt,
           ROUND(ln(l_extendedprice + 1), 6)             AS price_ln,
           ROUND(log10(l_extendedprice + 1), 6)          AS price_log10,
           ROUND(pow(l_discount, 2), 6)                  AS disc_sq,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT)    AS key_mod7
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/log10/pow/pmod. Spark pmod ≡
    DuckDB ((a % b) + b) % b; Spark ceil/floor return LONG (cast in
    oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("price_r1"),
        F.round(F.abs(price - 30000), 6).alias("abs_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1), 6).alias("price_ln"),
        F.round(F.log10(price + 1), 6).alias("price_log10"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
    )


@register(
    "q_cond_funcs",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           ROUND(GREATEST(c_acctbal, 0.0), 6)  AS bal_pos,
           ROUND(LEAST(c_acctbal, 5000.0), 6)  AS bal_capped,
           CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing
    FROM customer
    """,
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least / case."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 6).alias("bal_pos"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 6).alias("bal_capped"),
        F.when(F.col("c_acctbal") < 0, "debt").otherwise("credit").alias("standing"),
    )


#: Calendar-spine window for the gap-fill query (one fixture month).
SPINE_LO, SPINE_HI = "1996-02-01", "1996-02-29"


@register(
    "q_date_spine_fill",
    oracle=f"""
    WITH spine AS (
      SELECT unnest(generate_series(DATE '{SPINE_LO}',
                                    DATE '{SPINE_HI}',
                                    INTERVAL 1 DAY))::TIMESTAMP AS day
    ),
    daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{SPINE_LO}'
        AND o_orderdate <  TIMESTAMP '{SPINE_HI}' + INTERVAL 1 DAY
      GROUP BY 1
    )
    SELECT spine.day,
           COALESCE(daily.n_orders, 0) AS n_orders,
           COALESCE(daily.revenue, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    ORDER BY spine.day
    """,
)
def q_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: a generated contiguous day series LEFT
    JOINed to daily order aggregates so days with NO orders appear as
    explicit zero rows — the pattern every time-series report needs
    (a bare GROUP BY day silently drops empty days).

    Scale: the spine is F.sequence + explode on a 1-row relation —
    generated, never stored, and broadcast into the join (a calendar
    is always tiny); the daily aggregate is the only fact-sized work
    (one partial+final agg with the date filter pushed to the scan)."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(SPINE_LO).cast("timestamp_ntz"),
                F.lit(SPINE_HI).cast("timestamp_ntz"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(SPINE_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate")
           < F.date_add(F.lit(SPINE_HI).cast("timestamp_ntz"), 1))
    )
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("dday"))
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    return (
        F.broadcast(spine)
        .join(daily, spine.day == F.col("dday"), "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("day")
    )
