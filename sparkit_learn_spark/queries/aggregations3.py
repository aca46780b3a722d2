"""Aggregate surface, wave 3 (round 6): mergeable HLL sketches,
cumulative-distinct windows, and deterministic mode — the remaining
approximate/exotic aggregate shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register("q_agg_hll_sketch")  # rows-only: DataSketches HLL internals are
# engine-specific; accuracy (±5% vs exact) asserted in pytest
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-type
    user sketches PLUS their union re-estimated — the two-level
    rollup that makes sketches the 100 TB answer: per-partition
    sketches merge associatively map-side, and a stored sketch column
    lets later queries union WITHOUT rescanning the fact table
    (impossible with exact COUNT(DISTINCT)).

    Output: one row per event_type with its estimate, plus a 'total'
    row whose estimate comes from UNIONING the per-type sketches, not
    from re-scanning."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
    )
    total = per_type.agg(
        F.hll_union_agg("sk").alias("u")
    ).select(
        F.lit("__total__").alias("event_type"),
        F.hll_sketch_estimate("u").cast("long").alias("est_users"),
    )
    return typed.unionAll(total)


@register(
    "q_win_cume_distinct",
    oracle="""
    WITH firsts AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM events
    ),
    daily AS (
      SELECT day, CAST(SUM(is_first) AS BIGINT) AS new_users
      FROM firsts GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def q_win_cume_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over time — COUNT(DISTINCT) OVER a
    running frame, which neither engine supports directly. The
    scalable rewrite: mark each user's FIRST event (row_number = 1),
    sum firsts per day, prefix-sum the days. Two window passes, both
    keyed sensibly: the first partitions by user (parallel), the
    second orders a day-count table (tiny).

    Scale: the naive collect_set-over-window holds every user id in
    every frame — O(users) state per row. This form's state is one
    bit per row then one running long; the global day-ordered window
    runs over #days rows, not #events."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.when(F.row_number().over(wu) == 1, 1).otherwise(0).alias("is_first"),
    )
    daily = firsts.groupBy("day").agg(
        F.sum("is_first").cast("long").alias("new_users")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "new_users",
        F.sum("new_users").over(wd).cast("long").alias("cum_users"),
    )


@register(
    "q_agg_mode",
    oracle="""
    SELECT l_linestatus, l_returnflag AS mode_flag,
           CAST(cnt AS BIGINT) AS n
    FROM (
      SELECT l_linestatus, l_returnflag, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY l_linestatus
                                ORDER BY COUNT(*) DESC, l_returnflag) AS rn
      FROM lineitem GROUP BY l_linestatus, l_returnflag
    ) WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value, lowest-value
    tiebreak). Built-in mode() leaves ties engine-defined, so the
    contract form is count + argmax — here as min(struct(-cnt, val)),
    ONE aggregation after the count instead of a window over the
    grouped table (no second shuffle; the struct-min merges
    map-side).

    Scale: two hash aggregations on progressively smaller data; no
    windows, no sort."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_linestatus", "l_returnflag").agg(
        F.count("*").alias("cnt")
    )
    best = counts.groupBy("l_linestatus").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"),
                       F.col("l_returnflag").alias("f"))).alias("b")
    )
    return best.select(
        "l_linestatus",
        F.col("b.f").alias("mode_flag"),
        (-F.col("b.neg")).cast("long").alias("n"),
    )


@register(
    "q_agg_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>')  AS rf,
           COALESCE(l_linestatus, '<all>')  AS ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT)                  AS gid,
           CAST(COUNT(*) AS BIGINT)         AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() disambiguation: a NULL key cell can mean
    'subtotal row' or 'the data really was NULL' — grouping() is the
    only correct discriminator, and the composed gid makes each
    aggregation level addressable (0=detail, 1=per-flag, 3=grand).

    Scale: same expand-then-aggregate as q_agg_rollup; the grouping id
    is metadata, free at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "gid", "n",
        )
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via bitmap aggregation (Spark 3.5+ bitmap
    functions): ids bucket into 32k-bit bitmaps
    (bitmap_bucket_number / bitmap_construct_agg), per-bucket bitmaps
    OR-merge associatively, and bitmap_count sums to the exact
    distinct — the middle ground between COUNT(DISTINCT)'s
    expand-shuffle and HLL's approximation. Because it is EXACT, the
    oracle is plain COUNT(DISTINCT): the whole bitmap machinery must
    reproduce it bit-for-bit.

    Scale: a stored bitmap column rolls up across partitions/days
    without rescanning (like sketches, q_agg_hll_sketch) but with no
    error; memory is |id-range|/8 bytes per group — the trade to know."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users")
    )
