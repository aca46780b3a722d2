"""Round-6 wave 52: the exactly-oracled sketch battery, part 2 —
portable integer-keyed MinHash (estimated vs exact Jaccard between
event-type audiences), a KMV (bottom-k / theta) sketch with
set-intersection estimation, and HLL mergeability (per-source
registers max-merged into the global estimate). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# k=16 affine hash family (a, b) over the 32-bit ring
_MH = [
    (2654435761, 1), (40503, 7), (2246822519, 13), (3266489917, 19),
    (668265263, 29), (374761393, 37), (3141592653, 43), (2718281829, 53),
    (1597334677, 61), (2869860233, 71), (3987654323, 79), (1234567891, 89),
    (2147483629, 97), (1073741827, 101), (536870923, 107), (268435459, 113),
]
_MH_SQL = " UNION ALL ".join(
    f"SELECT {j} AS j, {a} AS a, {b} AS b" for j, (a, b) in enumerate(_MH)
)


@register(
    "q_sketch_minhash_portable",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type AS t, user_id AS x FROM events),
    h AS ({_MH_SQL}),
    sigs AS (
        SELECT t, h.j,
               MIN(((x * h.a + h.b) % 4294967296)) AS sig
        FROM du CROSS JOIN h GROUP BY t, h.j),
    est AS (
        SELECT a.t AS type_a, b.t AS type_b,
               CAST(SUM(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match
        FROM sigs a JOIN sigs b ON b.j = a.j AND a.t < b.t
        GROUP BY a.t, b.t),
    sizes AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY t),
    inter AS (
        SELECT a.t AS type_a, b.t AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM du a JOIN du b ON b.x = a.x AND a.t < b.t
        GROUP BY a.t, b.t)
    SELECT e.type_a, e.type_b,
           ROUND(e.n_match / 16.0, 6) AS est_jaccard,
           ROUND(i.n_common
                 / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 6)
               AS exact_jaccard
    FROM est e
    JOIN inter i ON i.type_a = e.type_a AND i.type_b = e.type_b
    JOIN sizes sa ON sa.t = e.type_a
    JOIN sizes sb ON sb.t = e.type_b
    """,
)
def q_sketch_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-verified MinHash: each event type's audience
    (distinct user set) is sketched by 16 affine-hash minima, and the
    signature-match fraction between every type pair is reported
    beside the EXACT audience Jaccard it estimates. Integer keys +
    portable hashes make both engines build identical signatures —
    construction-level verification the string-keyed production
    MinHash (xxhash64, rows-only) can't have — and the est-vs-exact
    gap IS the k=16 estimator error, measured.

    Scale: signatures are a (set, hash)-grain MIN aggregate
    (map-side combining; MIN merge is the MinHash union law);
    the exact side exists only as the oracle's measurement and is
    the thing the sketch replaces at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.col("event_type").alias("t"), F.col("user_id").alias("x")
    ).distinct()
    fam = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(_MH)], "j int, a long, b long"
    )
    sigs = (
        du.crossJoin(F.broadcast(fam))
        .groupBy("t", "j")
        .agg(
            F.min(
                (F.col("x") * F.col("a") + F.col("b")) % 4294967296
            ).alias("sig")
        )
    )
    sa = sigs.select(
        F.col("t").alias("type_a"), "j", F.col("sig").alias("sig_a")
    )
    sb = sigs.select(
        F.col("t").alias("type_b"), "j", F.col("sig").alias("sig_b")
    )
    est = (
        sa.join(sb, ["j"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0)
            ).alias("n_match")
        )
    )
    sizes = du.groupBy("t").agg(F.count("*").alias("n"))
    ia = du.select(F.col("t").alias("type_a"), "x")
    ib = du.select(F.col("t").alias("type_b"), F.col("x").alias("xb"))
    inter = (
        ia.join(ib, (F.col("xb") == F.col("x")))
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        est.join(inter, ["type_a", "type_b"])
        .join(
            sizes.select(F.col("t").alias("type_a"), F.col("n").alias("na")),
            "type_a",
        )
        .join(
            sizes.select(F.col("t").alias("type_b"), F.col("n").alias("nb")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.round(F.col("n_match") / 16.0, 6).alias("est_jaccard"),
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("exact_jaccard"),
        )
    )


@register(
    "q_sketch_kmv_theta",
    oracle="""
    WITH va AS (
        SELECT DISTINCT user_id AS x FROM events
        WHERE event_type = 'view'),
    vb AS (
        SELECT DISTINCT user_id AS x FROM events
        WHERE event_type = 'purchase'),
    ha AS (
        SELECT x, (x * 2654435761) % 4294967296 AS h,
               ROW_NUMBER() OVER (ORDER BY (x * 2654435761) % 4294967296,
                                  x) AS rn
        FROM va),
    hb AS (
        SELECT x, (x * 2654435761) % 4294967296 AS h,
               ROW_NUMBER() OVER (ORDER BY (x * 2654435761) % 4294967296,
                                  x) AS rn
        FROM vb),
    ka AS (SELECT x, h FROM ha WHERE rn <= 64),
    kb AS (SELECT x, h FROM hb WHERE rn <= 64),
    uni AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h, x) AS rn
        FROM (SELECT DISTINCT x, h FROM
              (SELECT * FROM ka UNION ALL SELECT * FROM kb))),
    theta AS (SELECT MAX(h) AS th FROM uni WHERE rn <= 64),
    common AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS rho
        FROM ka JOIN kb USING (x, h) CROSS JOIN theta t
        WHERE ka.h <= t.th),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM va JOIN vb USING (x))
    SELECT c.rho,
           CAST(ROUND(c.rho * 4294967296.0 * 64
                / (SELECT MAX(th) FROM theta)
                / 64.0) AS BIGINT) AS est_intersection,
           e.n_inter AS exact_intersection
    FROM common c CROSS JOIN exact e
    """,
)
def q_sketch_kmv_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta sketch set intersection: each audience keeps its 64
    smallest portable hash values; the union sketch's 64th minimum is
    θ, and the members below θ present in BOTH sketches (ρ) give the
    intersection estimate ρ/θ (hash space normalized) — the
    distinct-intersection estimator warehouses use where exact
    COUNT(DISTINCT a ∩ b) across huge sets is unaffordable. Reported
    beside the exact intersection it estimates. Bottom-k selection is
    an integer rank with id tie-break — identical in both engines.

    Scale: each sketch is a bottom-k aggregate (TakeOrdered-shaped,
    mergeable by re-taking the k smallest of a union); the exact side
    is the oracle's measurement, not the production path."""
    e = load_table(spark, sf_dir, "events")

    def sketch(t):
        s = (
            e.filter(F.col("event_type") == t)
            .select(F.col("user_id").alias("x"))
            .distinct()
            .select("x", ((F.col("x") * 2654435761) % 4294967296).alias("h"))
        )
        w = Window.orderBy("h", "x")
        return s.select(
            "x", "h", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") <= 64).drop("rn")

    ka, kb = sketch("view"), sketch("purchase")
    uni = (
        ka.unionAll(kb)
        .distinct()
        .select(
            "h",
            F.row_number().over(Window.orderBy("h", "x")).alias("rn"),
        )
    )
    theta = uni.filter(F.col("rn") <= 64).agg(F.max("h").alias("th"))
    common = (
        ka.join(kb, ["x", "h"])
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("th"))
        .agg(F.count("*").alias("rho"), F.max("th").alias("th"))
    )
    va = e.filter(F.col("event_type") == "view").select("user_id").distinct()
    vb = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    exact = va.join(vb, "user_id").agg(F.count("*").alias("n_inter"))
    return common.crossJoin(F.broadcast(exact)).select(
        "rho",
        F.round(
            F.col("rho") * 4294967296.0 * 64 / F.col("th") / 64.0
        )
        .cast("long")
        .alias("est_intersection"),
        F.col("n_inter").alias("exact_intersection"),
    )


@register(
    "q_sketch_hll_merge",
    oracle="""
    WITH hashed AS (
        SELECT source,
               ((doc_id * 2654435761) % 4294967296) // 4194304 AS bucket,
               ((doc_id * 2654435761) % 4294967296) % 4194304 AS rem
        FROM documents),
    per_source AS (
        SELECT source, bucket,
               MAX(CASE WHEN rem = 0 THEN 23
                        ELSE 22 - length(bin(CAST(rem AS BIGINT))) + 1
                   END) AS rho
        FROM hashed GROUP BY source, bucket),
    merged AS (
        SELECT bucket, MAX(rho) AS rho
        FROM per_source GROUP BY bucket),
    est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nonzero,
               SUM(POWER(2.0, -rho)) AS harm
        FROM merged),
    n AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_d,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents)
    SELECT n.n_sources, e.n_nonzero,
           CAST(ROUND(0.7213 / (1 + 1.079 / 1024) * 1024 * 1024
                / (e.harm + (1024 - e.n_nonzero))) AS BIGINT)
               AS merged_estimate,
           n.exact_d
    FROM est e CROSS JOIN n
    """,
)
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability: each source builds its own 1024-register
    sketch over its document ids, the per-source registers MAX-merge
    into one global sketch, and the merged estimate is reported
    beside the exact corpus-wide distinct — the commutative register
    union that makes HLL the distributed cardinality structure (merge
    per partition, per source, per day; never recount). Same
    portable-hash / binary-length construction as
    q_sketch_hll_portable, so both engines agree register-for-
    register.

    Scale: per-source registers are a (source × 1024)-grain MAX
    aggregate; the merge is a second tiny MAX at register grain —
    this IS the two-level combine a 1000-executor HLL union
    executes."""
    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * 2654435761) % 4294967296
    hashed = d.select(
        "source",
        (h / 4194304).cast("long").alias("bucket"),
        (h % 4194304).alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, 23).otherwise(
        22 - F.length(F.expr("bin(rem)")) + 1
    )
    per_source = hashed.groupBy("source", "bucket").agg(
        F.max(rho).alias("rho")
    )
    merged = per_source.groupBy("bucket").agg(F.max("rho").alias("rho"))
    est = merged.agg(
        F.count("*").alias("n_nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("harm"),
    )
    n = d.agg(
        F.countDistinct("doc_id").alias("exact_d"),
        F.countDistinct("source").alias("n_sources"),
    )
    raw = (
        0.7213
        / (1 + 1.079 / 1024)
        * 1024
        * 1024
        / (F.col("harm") + (1024 - F.col("n_nonzero")))
    )
    return est.crossJoin(F.broadcast(n)).select(
        "n_sources",
        "n_nonzero",
        F.round(raw).cast("long").alias("merged_estimate"),
        "exact_d",
    )
