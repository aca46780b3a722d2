"""Sort / limit / top-k and set operators (q_sort_*, q_topk,
q_limit_offset, q_set_*).

Global sorts use Spark's range-partitioned sort (sampled boundaries —
scales linearly); top-k compiles to TakeOrderedAndProject (per
-partition heap + driver merge of k, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey ASC)
                AS BIGINT) AS pos
    FROM orders
    WHERE o_totalprice > 350000
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (date desc, key asc). The hash check is
    order-insensitive, so the sort position is materialized as a
    column to pin the semantics. Note: a global row_number is
    inherently a single-reducer step — the filter first shrinks the
    input so the window sees only the selected rows."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    w = Window.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("pos", F.row_number().over(w).cast("long"))
        .select("o_orderkey", "o_orderdate", "o_totalprice", "pos")
    )


@register(
    "q_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS revenue
    FROM lineitem
    ORDER BY l_extendedprice * (1 - l_discount) DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 revenue lineitems: orderBy().limit() compiles to
    TakeOrderedAndProject — each partition keeps a 20-row heap, the
    driver merges heaps; no global sort, no full shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.orderBy(rev.desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", F.round(rev, 6).alias("revenue"))
    )


@register(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset+limit page over a deterministic order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_set_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-preserving union (no shuffle — partitions concatenate)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return (
        o.filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_totalprice")
        .unionByName(
            o.filter(F.col("o_orderstatus") == "P").select("o_orderkey", "o_totalprice")
        )
    )


@register(
    "q_set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
    UNION
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union then hash-distinct (one shuffle)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return (
        o.filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_totalprice")
        .union(
            o.filter(F.col("o_orderstatus") == "P").select("o_orderkey", "o_totalprice")
        )
        .distinct()
    )


@register(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): custkeys having both open and finished
    orders. Planned as a left-semi join on all columns."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


@register(
    "q_set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers minus 2001 buyers (left-anti join
    plan). Minus ALL buyers was empty below sf0.1 (every fixture
    customer buys eventually), making the driver's sf0.01 check
    trivially green; the recency restriction yields rows at every
    SF."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


@register(
    "q_sort_nulls",
    oracle="""
    SELECT doc_id, k,
           CAST(row_number() OVER (ORDER BY k ASC NULLS FIRST, doc_id)
                AS BIGINT) AS pos_nf,
           CAST(row_number() OVER (ORDER BY k DESC NULLS LAST, doc_id)
                AS BIGINT) AS pos_nl
    FROM (SELECT doc_id, NULLIF(lang, 'de') AS k FROM documents)
    WHERE doc_id < 200
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY (NULLS FIRST on ASC, NULLS
    LAST on DESC) — engines DISAGREE on the default (Spark sorts nulls
    first ascending, DuckDB last), so portable queries must pin it;
    both orderings materialize as row_number so the order-insensitive
    hash still checks them.

    Scale: a window over the full set with no PARTITION BY is a
    single-reducer sort — fine here only because the fixture filter
    bounds the input; at 100 TB pin a partition key or use the
    distributed sort + zipWithIndex-style id assignment instead."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    k = F.nullif(F.col("lang"), F.lit("de"))
    base = d.select("doc_id", k.alias("k"))
    from pyspark.sql import Window
    w_nf = Window.orderBy(F.col("k").asc_nulls_first(), "doc_id")
    w_nl = Window.orderBy(F.col("k").desc_nulls_last(), "doc_id")
    return base.select(
        "doc_id", "k",
        F.row_number().over(w_nf).cast("long").alias("pos_nf"),
        F.row_number().over(w_nl).cast("long").alias("pos_nl"),
    )


@register(
    "q_set_except_all",
    oracle="""
    SELECT k FROM (
      SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ) t
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiset) difference: each key survives
    max(0, count_left − count_right) times, unlike set EXCEPT which
    collapses to 0/1. The duplicate multiplicity IS the semantics, so
    the order-insensitive hash still pins it exactly.

    Scale: Spark plans exceptAll as per-side counted aggregation +
    sum-of-signed-counts + generate (replicate k, n times) — one
    shuffle per side on the value, never a join; skew-safe because
    counts combine map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("k"))
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k"))
    return a.exceptAll(r)


@register(
    "q_set_intersect_all",
    oracle="""
    SELECT k FROM (
      SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ) t
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection: each key appears
    min(count_left, count_right) times (q_set_intersect is the 0/1
    set form). Same counted-aggregate execution shape as EXCEPT ALL.

    Scale: identical to except_all — per-side counted agg, min of
    counts, generate; no join, map-side combine."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("k"))
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k"))
    return a.intersectAll(r)
