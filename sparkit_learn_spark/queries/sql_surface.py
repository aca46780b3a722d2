"""SQL-entry surface (round 6): the registry is DataFrame-first, but a
migrating user's first queries arrive as SQL TEXT — these pin the
spark.sql path: views + CTE + window SQL, parameterized SQL (Spark 4
named-parameter binding), ANSI try_* error-safe expressions, and the
distributed stable-ID assignment operator as an oracled query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_sql_cte_window",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day, ROUND(rev, 6) AS rev,
           ROUND(AVG(rev) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS rev_7d
    FROM daily
    """,
)
def q_sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure SQL-text entry path: a temp view + CTE + moving-average
    window executed via spark.sql — proving the migration story 'paste
    your warehouse SQL in' (Spark SQL is ANSI enough that the DuckDB
    oracle below is nearly the same string).

    Scale: identical plan to the DataFrame form — spark.sql and the
    DataFrame API hit the same Catalyst pipeline; nothing is lost by
    arriving as text."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        WITH daily AS (
          SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                 SUM(o_totalprice) AS rev
          FROM orders_v GROUP BY 1
        )
        SELECT day, ROUND(rev, 6) AS rev,
               ROUND(AVG(rev) OVER (ORDER BY day
                                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                 AS rev_7d
        FROM daily
    """)


@register(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 6) AS rev
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_totalprice > 1000.0
    GROUP BY o_orderpriority
    """,
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): values
    arrive as BOUND PARAMETERS, not string interpolation — the
    injection-safe form a query service must use. The plan is
    identical to the literal form (parameters fold to literals before
    optimization, so pushdown still works)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 6) AS rev
        FROM orders_v
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1996-01-01", "min_price": 1000.0},
    ).withColumn("n", F.col("n").cast("long"))


@register(
    "q_cond_try",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount = 0 THEN NULL
                         ELSE CAST(FLOOR(l_extendedprice / NULLIF(l_discount, 0))
                                   AS BIGINT) END) AS BIGINT) AS sum_ratio,
           CAST(COUNT(*) FILTER (WHERE l_discount = 0) AS BIGINT)
             AS n_zero_div,
           CAST(SUM(TRY_CAST(l_returnflag AS BIGINT)) AS BIGINT)
             AS bad_casts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_cond_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe expressions: try_divide (NULL instead of a
    division-by-zero job failure) and try_cast (NULL instead of a
    parse error) — the difference between a 100 TB job dying at hour
    three on one malformed row and it finishing with accountable
    NULLs. The truncating BIGINT cast of the ratio keeps the sum
    integer-exact for the oracle hash."""
    li = load_table(spark, sf_dir, "lineitem")
    # FLOOR before the integer cast: Spark's double->bigint cast
    # truncates while DuckDB's rounds — floor is identical in both
    ratio = F.expr(
        "CAST(FLOOR(try_divide(l_extendedprice, nullif(l_discount, 0))) AS BIGINT)"
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(ratio).cast("long").alias("sum_ratio"),
        F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_zero_div"),
        F.sum(F.try_to_number("l_returnflag", F.lit("999"))).cast("long")
         .alias("bad_casts"),
    )


@register(
    "q_ids_stable",
    oracle="""
    SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY term) - 1 AS BIGINT)
             AS term_id
    FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS term
          FROM documents)
    """,
)
def q_ids_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed dense-ID assignment (operators/ids.py): contiguous
    0..n−1 ids over the sorted distinct vocabulary WITHOUT a
    single-partition window — range-repartition, per-partition local
    ranks, O(partitions) offset repair. Oracled against the naive
    global ROW_NUMBER, proving the distributed form exact.

    Scale: the single-partition ROW_NUMBER this replaces is the
    classic 10⁸-vocabulary driver-choke; this plan's only global step
    is a partition-count-sized offset collect."""
    from ..operators.ids import stable_sorted_ids

    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term")).distinct()
    return stable_sorted_ids(terms, "term", id_col="term_id").select(
        "term", F.col("term_id").cast("long")
    )


@register(
    "q_sql_lateral",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM orders o, LATERAL (
      SELECT l_linenumber, l_extendedprice FROM lineitem
      WHERE l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
    ) l
    """,
)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY LIMIT — the
    SQL-text spelling of top-k-per-group. Catalyst decorrelates it
    into a window/rank plan (same physical shape as q_win_topk_group),
    so the 'subquery per outer row' the text describes never executes
    row-at-a-time.

    Scale: after decorrelation this is one shuffle on the join key —
    verify with .explain that no nested-loop per-row execution
    appears; the deterministic tiebreak (linenumber) keeps the LIMIT
    stable."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
      SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
      FROM orders_v o, LATERAL (
        SELECT l_linenumber, l_extendedprice FROM lineitem_v
        WHERE l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
      ) l
    """)
