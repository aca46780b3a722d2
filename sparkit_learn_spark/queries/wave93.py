"""Round-6 wave 93: LSH bucket-skew audit (band-bucket size
distribution and candidate-pair cost of a portable md5 MinHash,
exactly oracled — the "will the LSH self-join blow up?" preflight),
rolling 30-day beta (windowed OLS slope between two event series),
and local-maxima peak detection with a z-score floor. All exactly
DuckDB-oracled via exact-integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_lsh_bucket_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')
                   AS s
        FROM t, UNNEST(RANGE(1, LEN(toks) - 2)) u(i)
        WHERE LEN(toks) >= 4),
    sig AS (
        SELECT doc_id, g.j,
               MIN(MD5(CAST(g.j AS VARCHAR) || '|' || s)) AS sig
        FROM sh CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS j) g
        GROUP BY doc_id, g.j),
    band AS (
        SELECT doc_id, j // 2 AS band_id,
               STRING_AGG(sig, '|' ORDER BY j) AS key
        FROM sig GROUP BY doc_id, j // 2),
    bucket AS (
        SELECT band_id, key, CAST(COUNT(*) AS BIGINT) AS s
        FROM band GROUP BY band_id, key)
    SELECT CAST(band_id AS BIGINT) AS band_id,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(s) AS BIGINT) AS max_bucket,
           CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS candidate_pairs,
           ROUND(CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS singleton_share
    FROM bucket GROUP BY band_id ORDER BY band_id
    """,
)
def q_llm_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-skew audit: build a portable 8-hash MinHash over
    4-token shingles (md5-keyed, so both engines derive the identical
    signature), band it 4×2, and report per band the bucket count,
    the LARGEST bucket, the candidate-pair cost Σ s(s−1)/2, and the
    singleton share. This is the preflight every banded-LSH dedup
    needs at 100 TB: candidate_pairs IS the exact row count of the
    band self-join, and one boilerplate-heavy bucket turns the join
    quadratic — measure it before running it.

    Scale: shingle explode is fact-grain map-side; signatures are a
    (doc × 8)-grain min-aggregate with map-side combine; everything
    after is bucket-grain. The audit costs one aggregate pass more
    than the dedup itself — negligible insurance."""
    from ..catalog import spread_scan

    # r11 (guide §2.2): spread the single-row-group fixture scan —
    # the tokenize+shingle+8×md5 map otherwise runs on ONE core
    # (signature aggregate 1.90 s -> 0.89 s at sf0.1, measured).
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"),
    )
    # r11 note: dropping this .distinct() was TRIED (min over multiset
    # == min over set, so it is semantically free) and benched SLOWER
    # at sf0.1 (1.53 -> 1.77/2.78 s warm): the fixture's duplicate
    # (doc, shingle) pairs make the 8 md5s per surviving duplicate cost
    # more than the one string shuffle the distinct spends removing
    # them. Kept — a dup-light corpus at scale may prefer the reverse;
    # measure there (guide §1.1).
    sh = (
        t.filter(F.size("toks") >= 4)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 3),"
                    " i -> array_join(slice(toks, i, 4), ' '))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    # all 8 signature mins in ONE aggregation pass (no position explode,
    # no (doc, j)-grain shuffle — 8x less aggregate input than the
    # first formulation)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(str(j)), F.lit("|"), F.col("s")))).alias(f"s{j}")
            for j in range(8)
        ]
    )
    band = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band_id"),
                        F.concat(F.col(f"s{2 * b}"), F.lit("|"), F.col(f"s{2 * b + 1}")).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band_id").alias("band_id"), F.col("bk.key").alias("key"))
    bucket = band.groupBy("band_id", "key").agg(F.count(F.lit(1)).alias("s"))
    return (
        bucket.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("s").alias("max_bucket"),
            F.sum(F.expr("s * (s - 1) div 2")).alias("candidate_pairs"),
            F.round(
                F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("singleton_share"),
        )
        .orderBy("band_id")
    )


@register(
    "q_ts_rolling_beta",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'view'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY 1),
    w AS (
        SELECT day,
               CAST(COUNT(*) OVER f AS BIGINT) AS n,
               SUM(x) OVER f AS sx, SUM(y) OVER f AS sy,
               SUM(CAST(x * x AS DECIMAL(38, 0))) OVER f AS sxx,
               SUM(CAST(x * y AS DECIMAL(38, 0))) OVER f AS sxy
        FROM d
        WINDOW f AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
    SELECT day,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS beta_30d
    FROM w WHERE n = 30 ORDER BY day
    """,
)
def q_ts_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day beta of purchase value on view value: the
    windowed OLS slope — "how many purchase cents move per view
    cent, lately" — the finance-style exposure estimate applied to a
    product funnel. Every frame statistic (Σx, Σy, Σxy, Σx², n) is an
    exact integer accumulated by ONE window pass, so the slope is a
    closed-form double both engines compute identically; frames with
    fewer than 30 observed days are excluded exactly.

    Scale: the fact collapses to day grain first; the frame runs
    over the day-grain series (single partition over ~2.4k rows —
    dimension-sized, the documented day-grain window contract), and
    the rolling moments come from the frame itself, not a self-join."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).alias("y"),
    )
    f = Window.orderBy("day").rowsBetween(-29, 0)
    dec = "decimal(38,0)"
    w = d.select(
        "day",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).over(f).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).over(f).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return (
        w.filter(F.col("n") == 30)
        .select(
            "day",
            F.round(
                (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
                / (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")),
                6,
            ).alias("beta_30d"),
        )
        .orderBy("day")
    )


@register(
    "q_ts_peaks",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s,
               SQRT(CAST(COUNT(*) AS DOUBLE)
                    * CAST(SUM(CAST(v * v AS DECIMAL(38, 0))) AS DOUBLE)
                    - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE))
                   AS t_unit
        FROM d),
    w AS (
        SELECT day, v,
               MAX(v) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmax,
               MAX(v) OVER (ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmax,
               CAST(COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
                   AS nbrs
        FROM d)
    SELECT w.day, CAST(w.v AS BIGINT) AS revenue,
           ROUND(CAST(w.v * m.n - m.s AS DOUBLE) / m.t_unit, 6) AS zscore
    FROM w CROSS JOIN m
    WHERE w.nbrs = 7 AND w.v > w.lmax AND w.v > w.rmax
      AND CAST(w.v * m.n - m.s AS DOUBLE) > m.t_unit
    ORDER BY w.day
    """,
)
def q_ts_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection on daily revenue: days that strictly dominate
    their ±3-day neighborhood AND sit more than one standard
    deviation above the global mean — local-maxima spike mining with
    a significance floor (the ±3 window kills plateau noise, the z
    floor kills peaks of quiet weeks). The z comparison uses the same
    exact-integer trick as the SAX symbolizer — v·n − S compared to
    √(n·Σv² − S²) — so peak membership cannot flip on float noise
    and the peak list is exactly oracled.

    Scale: day-grain windows (dimension-sized) + three broadcast
    scalars; the neighborhood test is two bounded row frames, not a
    self-join."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sqrt(
            F.count(F.lit(1)).cast("double")
            * F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).cast("double")
            - F.sum("v").cast("double") * F.sum("v").cast("double")
        ).alias("t_unit"),
    )
    wl = Window.orderBy("day").rowsBetween(-3, -1)
    wr = Window.orderBy("day").rowsBetween(1, 3)
    wc = Window.orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "day",
        "v",
        F.max("v").over(wl).alias("lmax"),
        F.max("v").over(wr).alias("rmax"),
        F.count(F.lit(1)).over(wc).alias("nbrs"),
    )
    c = (F.col("v") * F.col("n") - F.col("s")).cast("double")
    return (
        w.crossJoin(F.broadcast(m))
        .filter(
            (F.col("nbrs") == 7)
            & (F.col("v") > F.col("lmax"))
            & (F.col("v") > F.col("rmax"))
            & (c > F.col("t_unit"))
        )
        .select("day", F.col("v").alias("revenue"), F.round(c / F.col("t_unit"), 6).alias("zscore"))
        .orderBy("day")
    )
