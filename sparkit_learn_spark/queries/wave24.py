"""Round-6 wave 24: item-item collaborative filtering (cosine over
co-purchase counts), maximum drawdown of the cumulative revenue curve
(running-max window composition), and a truncation-loss budget (token
mass lost at a fixed context cut). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_item_cf",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        FROM lineitem),
    deg AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM op GROUP BY pk),
    co AS (
        SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(COUNT(*) AS BIGINT) AS co
        FROM op a JOIN op b ON a.okey = b.okey AND a.pk < b.pk
        GROUP BY 1, 2),
    s AS (
        SELECT pk_a, pk_b, co,
               ROUND(co / SQRT(CAST(da.n AS DOUBLE) * db.n), 6) AS cosine
        FROM co JOIN deg da ON da.pk = co.pk_a
        JOIN deg db ON db.pk = co.pk_b
        WHERE co >= 2)
    SELECT pk_a, pk_b, co, cosine
    FROM s ORDER BY cosine DESC, pk_a, pk_b LIMIT 20
    """,
)
def q_ml_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: parts that co-occur in the
    same orders, scored by cosine over co-purchase counts
    (co/√(n_a·n_b)) — the classic neighborhood recommender signal.
    Candidates come from a within-order self-join (bounded: ≤C(items
    per order, 2) pairs per order, never cross-order), a co >= 2
    support floor prunes noise pairs before scoring, and the top-20
    cut orders on the ROUNDED score with a full pair tie-break.

    Scale: pair generation is fact-grain with per-key bounded fan-out;
    degree joins are item-grain. At 100 TB the co-matrix is the
    shuffle — the support floor (applied AT aggregation) and an
    optional frequent-item cap (cf. the MinHash df cap) keep it
    sparse; top-20 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    # materialize the distinct (order, part) set ONCE: four consumers
    # (self-join both sides, degree table, via deg twice) would each
    # re-run the scan+distinct otherwise, and the un-checkpointed
    # self-join broadcasts the fact-sized side (measured 20.8 s ->
    # 2.9 s at sf0.1). Same pattern as q_llm_ngram_jaccard's index.
    op = (
        li.select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = op.groupBy("pk").agg(F.count("*").alias("n"))
    a, b = op.alias("a"), op.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pk_a"), F.col("b.pk").alias("pk_b"))
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= 2)
    )
    da = deg.select(F.col("pk").alias("pk_a"), F.col("n").alias("na"))
    db = deg.select(F.col("pk").alias("pk_b"), F.col("n").alias("nb"))
    return (
        co.join(da, "pk_a")
        .join(db, "pk_b")
        .select(
            "pk_a",
            "pk_b",
            "co",
            F.round(
                F.col("co") / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "pk_a", "pk_b")
        .limit(20)
    )


@register(
    "q_ts_max_drawdown",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1),
    c AS (
        SELECT day,
               SUM(rev_c - 1500000000) OVER (ORDER BY day) AS equity_c
        FROM d),
    p AS (
        SELECT day, equity_c,
               MAX(equity_c) OVER (ORDER BY day) AS peak_c
        FROM c),
    dd AS (SELECT day, peak_c - equity_c AS draw_c FROM p)
    SELECT ROUND(MAX(draw_c) / 100.0, 2) AS max_drawdown,
           MIN(day) FILTER (WHERE draw_c = (SELECT MAX(draw_c) FROM dd))
               AS trough_day
    FROM dd
    """,
)
def q_ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative net-revenue curve (daily
    revenue minus a fixed 15M-cent burn baseline, so the equity curve
    actually falls sometimes): the largest peak-to-trough drop, found
    by composing a running sum with a running max — two ordered passes
    over the day series, no pairwise (peak, trough) join. Exact cents;
    the earliest trough day breaks ties.

    Scale: day-grain windows after a map-side fact collapse; the
    naive form is a quadratic self-join over (earlier, later) day
    pairs — running-max composition is the O(n) rewrite, the same
    prefix-scan family as q_ts_changepoint and q_evt_concurrency."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    wd = Window.orderBy("day")
    c = d.select(
        "day",
        F.sum(F.col("rev_c") - 1500000000).over(wd).alias("equity_c"),
    )
    p = c.select(
        "day", "equity_c", F.max("equity_c").over(wd).alias("peak_c")
    )
    dd = p.select("day", (F.col("peak_c") - F.col("equity_c")).alias("draw_c"))
    mx = dd.agg(F.max("draw_c").alias("mx"))
    return (
        dd.join(F.broadcast(mx), dd.draw_c == mx.mx)
        .groupBy("mx")
        .agg(F.min("day").alias("trough_day"))
        .select(
            F.round(F.col("mx") / 100.0, 2).alias("max_drawdown"),
            "trough_day",
        )
    )


@register(
    "q_llm_truncation_loss",
    oracle="""
    WITH t AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tok > 40 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_truncated,
           CAST(SUM(GREATEST(n_tok - 40, 0)) AS BIGINT) AS tokens_lost,
           ROUND(SUM(GREATEST(n_tok - 40, 0))
                 / CAST(SUM(n_tok) AS DOUBLE), 6) AS loss_share
    FROM t GROUP BY source
    """,
)
def q_llm_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-loss budget: per corpus source, how many documents a
    40-token context cut would clip and what share of total token mass
    is lost — the measurement that arbitrates context length vs
    packing efficiency (cf. q_llm_pack_sequences) before committing a
    training config. Exact integers end-to-end.

    Scale: token counts are row-local array lengths (no explode, no
    shuffle of tokens); one source-grain aggregate with map-side
    combine — a metadata-cost query even at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    lost = F.greatest(n_tok - 40, F.lit(0).cast("long"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.sum(F.when(n_tok > 40, 1).otherwise(0)).alias("docs_truncated"),
        F.sum(lost).alias("tokens_lost"),
        F.round(F.sum(lost) / F.sum(n_tok).cast("double"), 6).alias(
            "loss_share"
        ),
    )
