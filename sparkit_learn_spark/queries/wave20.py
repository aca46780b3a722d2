"""Round-6 wave 20: point-in-time-correct feature extraction (the
leakage-safe feature-store read), int8 embedding quantization with
reconstruction error, and trimmed means from histogram crossing.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_evt_pit_features",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, event_type,
               COUNT(*) OVER pw - 1 AS n_prior,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER pw
                 - CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS n_prior_errors,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER pw
                 - CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                   AS n_prior_views
        FROM events
        WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING))
    SELECT event_id, user_id,
           CAST(n_prior AS BIGINT) AS n_prior,
           CAST(n_prior_errors AS BIGINT) AS n_prior_errors,
           CAST(n_prior_views AS BIGINT) AS n_prior_views
    FROM w WHERE event_type = 'purchase'
    """,
)
def q_evt_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature extraction: for every purchase,
    the user's STRICTLY-PRIOR event count, error count, and view count
    — cumulative windows over the (ts, event_id)-ordered stream minus
    the current row, so no feature ever sees the label's own moment or
    the future. This is the leakage rule a feature store enforces when
    materializing training rows.

    Scale: one user-keyed cumulative window (bounded partitions, one
    ordered pass) computes ALL features — no per-feature as-of
    self-joins (the naive form is one range join per feature). The
    label filter prunes after the window, exactly as a training-set
    builder scans once and emits only label rows."""
    e = load_table(spark, sf_dir, "events")
    pw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    w = e.select(
        "event_id",
        "user_id",
        "event_type",
        (F.count("*").over(pw) - 1).alias("n_prior"),
        (F.sum(is_err).over(pw) - is_err).alias("n_prior_errors"),
        (F.sum(is_view).over(pw) - is_view).alias("n_prior_views"),
    )
    return w.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "n_prior", "n_prior_errors", "n_prior_views"
    )


@register(
    "q_ml_embed_quantize",
    oracle="""
    WITH dims AS (
        SELECT e.vec_id, r.i AS dim,
               CAST(e.embedding[CAST(r.i AS INT)] AS DOUBLE) AS x
        FROM embeddings e,
             unnest(range(1, len(e.embedding) + 1)) AS r(i)),
    rng AS (
        SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY dim),
    q AS (
        SELECT dims.vec_id, dims.dim, dims.x, rng.mn,
               (rng.mx - rng.mn) / 255.0 AS scale,
               LEAST(FLOOR((dims.x - rng.mn) / ((rng.mx - rng.mn) / 255.0)),
                     255) AS code
        FROM dims JOIN rng ON rng.dim = dims.dim
        WHERE rng.mx > rng.mn),
    err AS (
        SELECT vec_id,
               SUM((x - (mn + (code + 0.5) * scale))
                   * (x - (mn + (code + 0.5) * scale))) AS sq_err,
               CAST(COUNT(*) AS BIGINT) AS n_dims
        FROM q GROUP BY vec_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(n_dims) AS BIGINT) AS n_dims,
           ROUND(SUM(sq_err) / SUM(n_dims), 9) AS mse
    FROM err
    """,
)
def q_ml_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding table: per-dimension
    min/max ranges, 256-level codes (floor arithmetic, clamped), and
    the reconstruction MSE of midpoint dequantization — the 4×
    storage/bandwidth cut every large ANN index takes, with its
    accuracy cost measured. Codes are integer-deterministic given
    identical doubles; per-vector squared errors fold in dimension
    order in both engines before the global mean.

    Scale: per-dim ranges are one aggregate over (dim grain, 64
    rows); quantization is row-local arithmetic against the broadcast
    range table. In production the codes would WRITE as int8 columns
    (cf. q_llm_ann_ivfpq, which shuffles 8-byte PQ codes for the same
    reason); here the audit keeps everything in one read-only pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    rng = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    scale = (F.col("mx") - F.col("mn")) / 255.0
    code = F.least(
        F.floor((F.col("x") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 255.0)),
        F.lit(255),
    )
    q = (
        dims.join(F.broadcast(rng), "dim")
        .filter(F.col("mx") > F.col("mn"))
        .select(
            "vec_id",
            "x",
            "mn",
            scale.alias("scale"),
            code.alias("code"),
        )
    )
    recon = F.col("mn") + (F.col("code") + 0.5) * F.col("scale")
    err = q.groupBy("vec_id").agg(
        F.sum((F.col("x") - recon) * (F.col("x") - recon)).alias("sq_err"),
        F.count("*").alias("n_dims"),
    )
    return err.agg(
        F.count("*").alias("n_vecs"),
        F.min("n_dims").alias("n_dims"),
        F.round(F.sum("sq_err") / F.sum("n_dims"), 9).alias("mse"),
    )


@register(
    "q_agg_trimmed_mean",
    oracle="""
    WITH h AS (
        SELECT l_returnflag AS rf,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1, 2),
    c AS (
        SELECT rf, v, cnt,
               SUM(cnt) OVER (PARTITION BY rf ORDER BY v) AS cum,
               SUM(cnt) OVER (PARTITION BY rf) AS n
        FROM h),
    b AS (
        SELECT rf, MIN(v) FILTER (WHERE cum * 20 >= n) AS lo,
               MIN(v) FILTER (WHERE cum * 20 >= 19 * n) AS hi
        FROM c GROUP BY rf),
    t AS (
        SELECT h.rf, SUM(h.v * h.cnt) AS s, SUM(h.cnt) AS n_kept
        FROM h JOIN b ON b.rf = h.rf
        WHERE h.v >= b.lo AND h.v <= b.hi
        GROUP BY h.rf)
    SELECT t.rf AS l_returnflag, CAST(t.n_kept AS BIGINT) AS n_kept,
           ROUND(b.lo / 100.0, 2) AS p5_price,
           ROUND(b.hi / 100.0, 2) AS p95_price,
           ROUND(CAST(t.s AS DOUBLE) / t.n_kept / 100.0, 6) AS trimmed_mean
    FROM t JOIN b ON b.rf = t.rf
    """,
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of extended price per return flag: discrete
    p5/p95 fences from the price histogram's integer cumulative
    crossing, then the mean of everything inside the fences — the
    robust location estimate that survives fat tails where AVG does
    not. Sums stay exact integer cents until the final division.

    Scale: two passes over the HISTOGRAM (bounded price domain), zero
    passes over raw rows beyond the initial map-side-combining
    collapse — the same histogram-then-scan shape as the weighted
    median and the lift table."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    ).agg(F.count("*").alias("cnt"))
    c = h.select(
        "rf",
        "v",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("rf").orderBy("v")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("rf")).alias("n"),
    )
    b = c.groupBy("rf").agg(
        F.min(F.when(F.col("cum") * 20 >= F.col("n"), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") * 20 >= 19 * F.col("n"), F.col("v"))).alias(
            "hi"
        ),
    )
    t = (
        h.join(F.broadcast(b), "rf")
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .groupBy("rf")
        .agg(
            F.sum(F.col("v") * F.col("cnt")).alias("s"),
            F.sum("cnt").alias("n_kept"),
        )
    )
    return t.join(F.broadcast(b), "rf").select(
        F.col("rf").alias("l_returnflag"),
        F.col("n_kept"),
        F.round(F.col("lo") / 100.0, 2).alias("p5_price"),
        F.round(F.col("hi") / 100.0, 2).alias("p95_price"),
        F.round(
            F.col("s").cast("double") / F.col("n_kept") / 100.0, 6
        ).alias("trimmed_mean"),
    )
