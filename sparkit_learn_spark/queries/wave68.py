"""Round-6 wave 68: deterministic Poisson bootstrap (the web-scale
resampling pattern, with a portable cross-engine hash standing in for
the RNG), a model-calibration reliability table with ECE, and a
bounded-round k-core peel of the near-dup graph. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard

_Z975 = "1.959964"
# Poisson(1) CDF thresholds (inverse-CDF lookup; identical literals
# in both engines).
_POIS_CDF = (
    "0.367879441", "0.735758882", "0.919698603", "0.981011843",
    "0.996340153", "0.999405815", "0.999916758",
)
_N_REP = 32
# portable 2D affine hash -> uniform in [0,1) with 2^-32 granularity
_UHASH = (
    "((user_id * 2654435761 + r * 2246822519 + 40503) % 4294967296)"
    " / 4294967296.0"
)


@register(
    "q_stat_bootstrap_ci",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY user_id),
    reps AS (SELECT CAST(r AS BIGINT) AS r FROM range({_N_REP}) t(r)),
    weighted AS (
        SELECT r,
               ({" + ".join(f"CASE WHEN {_UHASH} >= {t} THEN 1 ELSE 0 END"
                            for t in _POIS_CDF)}) AS w,
               x
        FROM per_user CROSS JOIN reps),
    rep_means AS (
        SELECT r,
               ROUND(CAST(SUM(CAST(w AS HUGEINT) * x) AS DOUBLE)
                     / SUM(w), 6) AS m
        FROM weighted GROUP BY r),
    boot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rep,
               SUM(m) AS sm, SUM(m * m) AS smm,
               MIN(m) AS rep_min, MAX(m) AS rep_max
        FROM rep_means),
    pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE)
                     / COUNT(*), 6) AS point_est
        FROM per_user)
    SELECT p.n_users, p.point_est,
           ROUND(SQRT((b.smm - b.sm * b.sm / b.n_rep)
                      / (b.n_rep - 1)), 6) AS boot_se,
           ROUND(p.point_est - {_Z975}
                 * SQRT((b.smm - b.sm * b.sm / b.n_rep)
                        / (b.n_rep - 1)), 6) AS ci_lo,
           ROUND(p.point_est + {_Z975}
                 * SQRT((b.smm - b.sm * b.sm / b.n_rep)
                        / (b.n_rep - 1)), 6) AS ci_hi,
           b.rep_min, b.rep_max
    FROM pt p, boot b
    """,
)
def q_stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean per-user purchase spend: 32
    resampling replicates where each user's multiplicity is a
    Poisson(1) draw — the streaming-friendly bootstrap (independent
    per-row weights, no global n needed mid-stream) that replaces
    sampling-with-replacement at web scale. The 'RNG' is a portable
    affine hash of (user_id, replicate) pushed through the inlined
    Poisson(1) inverse-CDF thresholds, so both engines draw
    bit-identical weights; replicate means use exact 128-bit
    weighted sums, and the bootstrap SE / normal CI come from the
    6dp-rounded replicate means.

    Scale: user-grain aggregate, then a 32× fan-out of the (tiny)
    per-user metric table — at 100 TB the fan-out rides the same
    map-side-combining aggregate (weights are computed inline, no
    resampled copy is ever materialized); replicate-grain algebra is
    constant-size."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        )
        .cast("long")
        .alias("x")
    )
    reps = spark.range(_N_REP).select(F.col("id").alias("r"))
    u = F.expr(_UHASH)
    w = sum(
        F.when(u >= float(t), 1).otherwise(0) for t in _POIS_CDF
    ).alias("w")
    weighted = per_user.crossJoin(F.broadcast(reps)).select("r", w, "x")
    rep_means = weighted.groupBy("r").agg(
        F.round(
            F.sum((F.col("w") * F.col("x")).cast("decimal(38,0)"))
            .cast("double")
            / F.sum("w"),
            6,
        ).alias("m")
    )
    boot = rep_means.agg(
        F.count("*").alias("n_rep"),
        F.sum("m").alias("sm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.min("m").alias("rep_min"),
        F.max("m").alias("rep_max"),
    )
    pt = per_user.agg(
        F.count("*").alias("n_users"),
        F.round(
            F.sum(F.col("x").cast("decimal(38,0)")).cast("double")
            / F.count("*"),
            6,
        ).alias("point_est"),
    )
    se = F.sqrt(
        (F.col("smm") - F.col("sm") * F.col("sm") / F.col("n_rep"))
        / (F.col("n_rep") - 1)
    )
    z = float(_Z975)
    return pt.crossJoin(F.broadcast(boot)).select(
        "n_users",
        "point_est",
        F.round(se, 6).alias("boot_se"),
        F.round(F.col("point_est") - z * se, 6).alias("ci_lo"),
        F.round(F.col("point_est") + z * se, 6).alias("ci_hi"),
        "rep_min",
        "rep_max",
    )


@register(
    "q_ml_calibration",
    oracle="""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS v,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS y
        FROM events GROUP BY user_id, CAST(ts AS DATE)),
    scored AS (
        SELECT y,
               ROUND(1.0 / (1.0 + EXP(-(-1.5 + 0.8 * v))), 6) AS p
        FROM ud),
    binned AS (
        SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, y
        FROM scored),
    per_bin AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(p), 6) AS avg_pred,
               ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS obs_rate
        FROM binned GROUP BY bin)
    SELECT bin, n, avg_pred, obs_rate,
           ROUND(ABS(obs_rate - avg_pred), 6) AS abs_gap,
           ROUND(SUM(n * ABS(obs_rate - avg_pred)) OVER ()
                 / SUM(n) OVER (), 6) AS ece
    FROM per_bin
    ORDER BY bin
    """,
)
def q_ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability table for a fixed scoring rule
    (literal-coefficient logistic over daily view count, predicting
    a same-day purchase at user-day grain): per predicted-probability
    decile, the mean prediction vs the observed positive rate, the
    per-bin gap, and the expected calibration error (ECE) — the audit
    that catches a model whose ranking is fine (AUC) but whose
    probabilities are lies (which silently corrupts any downstream
    expected-value bidding/budgeting). Scores are 6dp-rounded before
    binning so both engines bin identically; ECE is computed from the
    rounded per-bin aggregates.

    Scale: (user, day)-grain aggregate, then a 10-row bin table; the
    ECE window runs over bins, not data rows."""
    e = load_table(spark, sf_dir, "events")
    ud = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("v"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    p = F.round(1.0 / (1.0 + F.exp(-(-1.5 + 0.8 * F.col("v")))), 6)
    binned = ud.select(
        F.least(F.floor(p * 10).cast("long"), F.lit(9)).alias("bin"),
        p.alias("p"),
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.avg("p"), 6).alias("avg_pred"),
        F.round(F.sum("y").cast("double") / F.count("*"), 6).alias(
            "obs_rate"
        ),
    )
    wall = Window.partitionBy()
    gap = F.abs(F.col("obs_rate") - F.col("avg_pred"))
    return per_bin.select(
        "bin",
        "n",
        "avg_pred",
        "obs_rate",
        F.round(gap, 6).alias("abs_gap"),
        F.round(
            F.sum(F.col("n") * gap).over(wall) / F.sum("n").over(wall), 6
        ).alias("ece"),
    ).orderBy("bin")


_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    """Unrolled bounded-round peel (identical rounds in both engines;
    standard recursive CTEs allow only one self-reference, and the
    degree test needs the alive set on both edge endpoints, so the
    rounds are generated as chained plain CTEs instead). Every CTE is
    MATERIALIZED: each round references its predecessor twice, so
    DuckDB's default CTE inlining would expand the plan to 2^rounds
    copies of the parquet-scanning pair pipeline (observed as an
    EMFILE blowup), the exact dual of the Spark side's
    localCheckpoint lineage truncation."""
    parts = [f"pairs AS MATERIALIZED ({ORACLES['q_llm_ngram_jaccard']})"]
    parts.append(
        "edges AS MATERIALIZED ("
        "SELECT doc_a AS a, doc_b AS b FROM pairs"
        " UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs)"
    )
    per_k = []
    for k in (2, 3):
        prev = "(SELECT DISTINCT a AS node FROM edges)"
        for i in range(_KCORE_ROUNDS):
            name = f"k{k}_r{i}"
            parts.append(
                f"{name} AS MATERIALIZED (SELECT e.a AS node FROM edges e"
                f" JOIN {prev} s1 ON s1.node = e.a"
                f" JOIN {prev} s2 ON s2.node = e.b"
                f" GROUP BY e.a HAVING COUNT(*) >= {k})"
            )
            prev = name
        per_k.append(
            f"SELECT {k} AS k,"
            f" CAST((SELECT COUNT(*) FROM {prev}) AS BIGINT) AS n_nodes,"
            f" CAST((SELECT COUNT(*) / 2 FROM edges e"
            f"       JOIN {prev} s1 ON s1.node = e.a"
            f"       JOIN {prev} s2 ON s2.node = e.b) AS BIGINT)"
            f" AS n_edges"
        )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + " UNION ALL ".join(per_k)
        + " ORDER BY k"
    )


@register("q_graph_kcore")
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel of the near-dup graph (k = 2, 3): iteratively
    discard nodes with fewer than k surviving neighbors, reporting
    the core's node and edge counts — the dense-subgraph primitive
    that separates genuine duplicate CLUSTERS (mutually-linked
    template families, which survive the peel) from incidental
    pairwise matches (chains and stars, which dissolve). Both engines
    run the SAME fixed 8 peel rounds (unrolled CTEs in the oracle),
    so parity is deterministic; the peel is a fixpoint in practice on
    this graph (verified round-7 == round-8 in pytest).

    Scale: each round is one edge-grain semi-join + degree count —
    node-grain state, no all-pairs anywhere; bounded rounds make the
    job a fixed-length DAG (the production fixpoint variant adds a
    cheap per-round count check)."""
    pairs = q_llm_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    # eager lineage truncation: each peel round references `alive`
    # twice (both edge endpoints), so without it the logical plan
    # doubles per round — 2^rounds tree growth OOMs the driver.
    edges = pairs.selectExpr("doc_a AS a", "doc_b AS b").unionByName(
        pairs.selectExpr("doc_b AS a", "doc_a AS b")
    ).localCheckpoint(eager=True)
    out = []
    for k in (2, 3):
        alive = edges.select(F.col("a").alias("node")).distinct()
        for _ in range(_KCORE_ROUNDS):
            alive = (
                edges.join(alive.withColumnRenamed("node", "a"), "a")
                .join(
                    alive.selectExpr("node AS b"), "b"
                )
                .groupBy("a")
                .agg(F.count("*").alias("deg"))
                .filter(F.col("deg") >= k)
                .select(F.col("a").alias("node"))
                .localCheckpoint(eager=True)
            )
        core_edges = (
            edges.join(alive.withColumnRenamed("node", "a"), "a")
            .join(alive.selectExpr("node AS b"), "b")
        )
        out.append(
            alive.agg(
                F.lit(k).cast("long").alias("k"),
                F.count("*").cast("long").alias("n_nodes"),
            ).crossJoin(
                core_edges.agg(
                    (F.count("*") / 2).cast("long").alias("n_edges")
                )
            )
        )
    res = out[0].unionByName(out[1]).orderBy("k")
    return res


set_oracle("q_graph_kcore", _kcore_oracle())
