"""Graph queries over the near-dup document graph (round 6): degree
centrality (exactly oracled by reusing the exact-Jaccard pair SQL as
a CTE) and PageRank (iterative; rows-only with a numpy-oracle pytest,
tests/test_graph.py). The graph's edges are the exact shingle-Jaccard
near-dup pairs — deterministic in both engines, unlike the
xxhash-based MinHash candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register("q_graph_degree")
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree centrality of the near-dup graph: how many documents
    each document is near-duplicate to — the fan-out statistic that
    finds template/boilerplate clusters (high degree = one text
    duplicated everywhere).

    Scale (r10 rewrite): the raw explode+count is quadratic in the
    duplication factor — the 100×-replicated sf10 fixture's pair
    OUTPUT OOM'd a 48 GB JVM materializing through one aggregation.
    Rewritten on the true-twin quotient (the triangle/harmonic
    discipline): degree(u∈A) = (|A|−1) + Σ_{B∈N(A)} |B| expands
    analytically from group sizes (operators/graph.twin_degrees), so
    the only edge-grain work left is the quotient construction
    itself. Exact — the DuckDB oracle is unchanged."""
    from ..operators.graph import twin_degrees, twin_quotient

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # pin the symmetric edge list BEFORE the quotient (wave90
    # discipline): twin_quotient consumes it three times, and
    # un-pinned each consumer re-runs the candidate-verify pipeline
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    member, sizes, qedges = twin_quotient(sym)
    return (
        member.join(twin_degrees(sizes, qedges), "gid")
        .select(F.col("node").alias("doc_id"), "degree")
    )


set_oracle("q_graph_degree", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]})
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
FROM (SELECT doc_a AS doc_id FROM pairs
      UNION ALL SELECT doc_b AS doc_id FROM pairs)
GROUP BY doc_id
""")


@register("q_graph_pagerank")  # rows-only: float fixpoint — numpy-oracled in pytest
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup graph (damping 0.85, 10
    iterations): ranks the CANONICAL document inside each duplicate
    cluster higher than its satellites — a principled keep-choice for
    dedup (keep the highest-rank member), vs keep-min-id's arbitrary
    one. Iterative edges⋈ranks aggregation per iteration
    (operators/graph.py); numpy power-iteration parity asserted in
    tests/test_graph.py.

    Scale: node-grain state, edge-grain shuffle per iteration, fixed
    iteration count, one pinned checkpoint — the web-scale shape."""
    from ..operators.graph import pagerank

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    ranks = pagerank(pairs.select(F.col("doc_a").alias("src"),
                                  F.col("doc_b").alias("dst")))
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round("rank", 8).alias("rank"),
    )


@register("q_graph_components")
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the EXACT-Jaccard near-dup graph —
    the first iterative-algorithm query with an EXACT SQL oracle: the
    DuckDB side computes the same labels via a recursive CTE
    (transitive reachability, min label per node), so the distributed
    min-label propagation (operators/components.py, with its
    small-star/large-star fallback) is value-verified, not just
    row-counted.

    Scale: propagation is join+min per round, diameter-bounded;
    the recursive-CTE oracle is exponential in cluster size and only
    viable because dedup clusters are small — the oracle validates,
    the operator scales."""
    from ..operators.components import connected_components

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return comp.select(F.col("node").alias("doc_id"),
                       F.col("comp").cast("long").alias("comp"))


set_oracle("q_graph_components", f"""
WITH RECURSIVE pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS comp
FROM reach GROUP BY node
""")


@register("q_graph_keep_best")
def q_graph_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principled dedup keep-choice: within each near-dup cluster keep
    the LONGEST document (n_chars, doc_id tiebreak) — composed from
    components + a per-cluster argmax (min(struct(-len, id)), one
    aggregation, no window). Returns one row per cluster with its
    size and the kept doc.

    Scale: cluster table is node-grain; the argmax merges map-side."""
    from ..catalog import load_table
    from ..operators.components import connected_components

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = comp.join(docs, comp.node == docs.doc_id)
    best = labeled.groupBy("comp").agg(
        F.count("*").alias("cluster_size"),
        F.min(F.struct((-F.col("n_chars")).alias("neg"),
                       F.col("doc_id").alias("id"))).alias("b"),
    )
    return best.select(
        F.col("comp").cast("long"),
        F.col("cluster_size"),
        F.col("b.id").alias("keep_doc"),
        (-F.col("b.neg")).cast("long").alias("keep_len"),
    )


set_oracle("q_graph_keep_best", f"""
WITH RECURSIVE pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node),
labeled AS (
  SELECT c.comp, d.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.comp
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
sizes AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n FROM labeled GROUP BY comp)
SELECT CAST(l.comp AS BIGINT) AS comp,
       s.n AS cluster_size,
       l.doc_id AS keep_doc,
       CAST(l.n_chars AS BIGINT) AS keep_len
FROM labeled l JOIN sizes s USING (comp) WHERE l.rn = 1
""")


@register("q_graph_triangles")
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation in the near-dup graph —
    the clustering-coefficient numerator: a document in many triangles
    sits inside a dense duplicate CLIQUE (template boilerplate), not
    just a chain of pairwise matches; degree alone can't tell the two
    apart. Edges are canonically oriented (doc_a < doc_b), so each
    triangle x<y<z is enumerated exactly once by the two-hop join
    e(x,y) ⋈ e(y,z) ⋈ e(x,z).

    Scale (r9 rewrite): duplicate cliques make the raw edge-edge
    triangle join CUBIC in the duplication factor — the 100×-
    replicated sf10 fixture (every doc a ~100-clique of true twins,
    C(100,3) ≈ 161k triangles per group) GC-killed a 48 GB JVM. The
    rewrite collapses true twins first (operators/graph.twin_quotient,
    the q_graph_harmonic discipline) and counts analytically: for
    node u in group A with quotient neighbors N(A),

      T(u) = C(|A|−1, 2)                      two twins of u
           + Σ_{B∈N(A)} (|A|−1)·|B| + C(|B|,2)  twin+neighbor / two
                                                same-group neighbors
           + Σ_{B,C∈N(A), B~C} |B|·|C|          quotient triangles

    so the only enumeration left is quotient-grain. Exact — the
    DuckDB oracle is unchanged. At true scale, orient quotient edges
    by (degree, id) — same plan with skew moved off hubs."""
    from ..operators.graph import twin_quotient

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # pin the symmetric edge list BEFORE the quotient: twin_quotient
    # consumes it three times (neighborhood agg + two membership
    # joins), and without the checkpoint each consumer re-runs the
    # whole candidate-verify pair pipeline fused into one oversized
    # codegen stage (the wave90 discipline; un-pinned, the sf10 run
    # heap-OOMs inside the fused aggregation)
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    member, sizes, qedges = twin_quotient(sym)
    tri_g = _twin_triangle_counts(sizes, qedges)
    return (
        member.join(tri_g, "gid")
        .filter(F.col("t") > 0)
        .select(F.col("node").alias("doc_id"),
                F.col("t").alias("n_triangles"))
    )


def _twin_triangle_counts(sizes: DataFrame, qedges: DataFrame) -> DataFrame:
    """(gid, t): triangles containing each member of group gid, from
    quotient-grain structure only (see q_graph_triangles formula)."""
    nb = (
        qedges.join(sizes.select(F.col("gid").alias("dst"),
                                 F.col("gsz").alias("bsz")), "dst")
        .groupBy(F.col("src").alias("gid"))
        .agg(F.sum("bsz").alias("nbr_sz"),
             F.sum((F.col("bsz") * (F.col("bsz") - 1)) / 2)
             .cast("long").alias("nbr_c2"))
    )
    # quotient triangles via the canonical x<y<z edge-edge join
    qe = qedges.filter(F.col("src") < F.col("dst")).localCheckpoint(True)
    q1, q2, q3 = qe.alias("q1"), qe.alias("q2"), qe.alias("q3")
    tq = (
        q1.join(q2, F.col("q1.dst") == F.col("q2.src"))
        .join(q3, (F.col("q3.src") == F.col("q1.src"))
              & (F.col("q3.dst") == F.col("q2.dst")))
        .select(F.col("q1.src").alias("x"), F.col("q1.dst").alias("y"),
                F.col("q2.dst").alias("z"))
    )
    sx = sizes.select(F.col("gid").alias("x"), F.col("gsz").alias("szx"))
    sy = sizes.select(F.col("gid").alias("y"), F.col("gsz").alias("szy"))
    sz_ = sizes.select(F.col("gid").alias("z"), F.col("gsz").alias("szz"))
    tq = tq.join(sx, "x").join(sy, "y").join(sz_, "z")
    t3 = (
        tq.select(F.col("x").alias("gid"),
                  (F.col("szy") * F.col("szz")).alias("c"))
        .unionAll(tq.select(F.col("y"), F.col("szx") * F.col("szz")))
        .unionAll(tq.select(F.col("z"), F.col("szx") * F.col("szy")))
        .groupBy("gid").agg(F.sum("c").alias("t3"))
    )
    return (
        sizes.join(nb, "gid", "left").join(t3, "gid", "left")
        .select(
            "gid",
            (
                ((F.col("gsz") - 1) * (F.col("gsz") - 2) / 2).cast("long")
                + (F.col("gsz") - 1) * F.coalesce("nbr_sz", F.lit(0))
                + F.coalesce("nbr_c2", F.lit(0))
                + F.coalesce("t3", F.lit(0))
            ).cast("long").alias("t"),
        )
    )


set_oracle("q_graph_triangles", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS doc_id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY doc_id
""")


@register("q_graph_clustering_coeff")
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient 2T/(d(d-1)) per document (d >= 2):
    1.0 means the doc's near-dup neighborhood is a closed clique (one
    template, safe to keep a single canonical copy); near 0 means
    chained pairwise matches (transitive false positives — exactly
    where aggressive dedup destroys distinct documents). Degree and
    triangle counts both derive from ONE checkpointed edge list, so
    the pair-verify lineage runs once.

    Scale (r9 rewrite): same true-twin quotient as q_graph_triangles
    — both the degree and the triangle count expand analytically per
    group (deg(u∈A) = |A|−1 + Σ_{B∈N(A)} |B|), so nothing touches
    node-pair grain and duplicate cliques cost quotient work only.
    Exact; oracle unchanged."""
    from ..operators.graph import twin_quotient

    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # pin the symmetric edge list BEFORE the quotient: twin_quotient
    # consumes it three times (neighborhood agg + two membership
    # joins), and without the checkpoint each consumer re-runs the
    # whole candidate-verify pair pipeline fused into one oversized
    # codegen stage (the wave90 discipline; un-pinned, the sf10 run
    # heap-OOMs inside the fused aggregation)
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    member, sizes, qedges = twin_quotient(sym)
    tri_g = _twin_triangle_counts(sizes, qedges)
    nbr = (
        qedges.join(sizes.select(F.col("gid").alias("dst"),
                                 F.col("gsz").alias("bsz")), "dst")
        .groupBy(F.col("src").alias("gid"))
        .agg(F.sum("bsz").alias("nbr_sz"))
    )
    deg_g = (
        sizes.join(nbr, "gid", "left")
        .select("gid",
                (F.col("gsz") - 1 + F.coalesce("nbr_sz", F.lit(0)))
                .cast("long").alias("degree"))
    )
    return (
        member.join(deg_g, "gid").join(tri_g, "gid")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("node").alias("doc_id"),
            "degree",
            F.round(
                2.0 * F.col("t")
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


set_oracle("q_graph_clustering_coeff", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id, COUNT(*) AS n_tri FROM (
    SELECT e1.a AS doc_id FROM e e1 JOIN e e2 ON e1.b = e2.a
           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    UNION ALL
    SELECT e1.b FROM e e1 JOIN e e2 ON e1.b = e2.a
           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    UNION ALL
    SELECT e2.b FROM e e1 JOIN e e2 ON e1.b = e2.a
           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
  ) GROUP BY doc_id
)
SELECT deg.doc_id, deg.degree,
       ROUND(2.0 * COALESCE(tri.n_tri, 0)
             / (deg.degree * (deg.degree - 1)), 6) AS clustering_coeff
FROM deg LEFT JOIN tri ON deg.doc_id = tri.doc_id
WHERE deg.degree >= 2
""")


@register("q_graph_cluster_sizes")
def q_graph_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report: the cluster-size histogram of the near-dup
    graph (how many duplicate clusters of each size, plus the docs
    they absorb) — the number a pipeline owner quotes ('dedup removes
    X% of the corpus in clusters of size >= s'). Composed from the
    exactly-oracled connected components.

    Scale: label-grain aggregates after CC — two tiny shuffles."""
    comp = q_graph_components(spark, sf_dir)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            (F.count("*") * F.col("cluster_size")).cast("long")
             .alias("docs_absorbed"),
        )
        .orderBy("cluster_size")
    )


set_oracle("q_graph_cluster_sizes", f"""
WITH comp AS ({ORACLES["q_graph_components"]}),
sizes AS (
  SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY comp
)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) * cluster_size AS BIGINT) AS docs_absorbed
FROM sizes GROUP BY cluster_size
""")
