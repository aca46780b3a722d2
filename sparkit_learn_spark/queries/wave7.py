"""Round-6 closing wave: the last built-in-function gaps — nth_value
windows and the edit/translate string family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_win_nth_value",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           NTH_VALUE(o_orderkey, 3) OVER w AS third_key,
           ROUND(NTH_VALUE(o_totalprice, 3) OVER w, 6) AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the FULL frame (3rd-highest order per priority)
    — the positional lookup first/last can't express. The full-frame
    spec matters: with the default frame nth_value answers 'third of
    the rows so far', a different (and usually unintended) question.
    Deterministic via the orderkey tiebreak; DISTINCT collapses the
    per-row repetition to one row per priority.

    Scale: one window pass per partition; the DISTINCT is a
    partition-count-sized aggregate."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        o.select(
            "o_orderpriority",
            F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
            F.round(F.nth_value("o_totalprice", 3).over(w), 6)
             .alias("third_price"),
        )
        .distinct()
    )


@register(
    "q_str_edit_funcs",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(levenshtein(lower(c_name), c_mktsegment)) AS BIGINT)
             AS sum_edit,
           CAST(SUM(length(translate(c_name, 'aeiou', ''))) AS BIGINT)
             AS sum_consonant_len,
           MIN(reverse(c_name))               AS min_reversed,
           MAX(repeat(left(c_name, 2), 2))    AS max_repeated,
           MIN(right(c_name, 3))              AS min_suffix
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_str_edit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit/translate string battery: levenshtein, translate (vowel
    strip), reverse, repeat, left/right — the remaining built-ins the
    first battery skipped, aggregated per segment so the result stays
    report-sized. All JVM codegen (no Python).

    Scale: row-local expressions — scale-free; levenshtein cost is
    O(len²) per row, so at 100 TB gate it behind cheap length/prefix
    filters as the edit-distance dedup operator does."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.sum(F.levenshtein(F.lower("c_name"), F.col("c_mktsegment")))
         .cast("long").alias("sum_edit"),
        F.sum(F.length(F.translate("c_name", "aeiou", "")))
         .cast("long").alias("sum_consonant_len"),
        F.min(F.reverse("c_name")).alias("min_reversed"),
        F.max(F.repeat(F.substring("c_name", 1, 2), 2)).alias("max_repeated"),
        F.min(F.substring("c_name", -3, 3)).alias("min_suffix"),
    )
