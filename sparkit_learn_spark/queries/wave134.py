"""Round-8 wave 134: graph depth on the co-purchase graph — label
propagation communities (the integer-exact iterative algorithm, so
the unrolled SQL oracle is EXACT, like q_graph_components and unlike
the float fixpoints), local bridges (edges whose endpoints share no
neighbor — the weak-tie detector), and bipartite HITS
hubs/authorities over the customer→part purchase graph (float
fixpoint -> rows-only + numpy parity in tests/test_graph_hits.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._copurchase import COPURCHASE_SQL, copurchase_edges, copurchase_sym_edges

#: fixed label-propagation rounds (unrolled in the oracle).
LP_ROUNDS = 3


def _lp_oracle() -> str:
    """Unroll LP_ROUNDS of synchronous min-tiebreak label propagation
    as chained CTEs — each round one join + grouped mode."""
    ctes = [
        f"cop AS ({COPURCHASE_SQL})",
        """edges AS (
        SELECT part_a AS src, part_b AS dst FROM cop
        UNION ALL SELECT part_b, part_a FROM cop)""",
        "l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)",
    ]
    for k in range(1, LP_ROUNDS + 1):
        ctes.append(f"""l{k} AS (
        SELECT node, lbl FROM (
            SELECT e.src AS node, l.lbl,
                   ROW_NUMBER() OVER (PARTITION BY e.src
                                      ORDER BY COUNT(*) DESC, l.lbl ASC)
                       AS rn
            FROM edges e JOIN l{k - 1} l ON l.node = e.dst
            GROUP BY e.src, l.lbl)
        WHERE rn = 1)""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS size,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM l{LP_ROUNDS}
    GROUP BY lbl ORDER BY size DESC, community LIMIT 15
    """


@register("q_graph_label_prop", oracle=_lp_oracle())
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (Raghavan et al. 2007) on the
    co-purchase graph: {LP_ROUNDS} synchronous rounds of
    adopt-the-modal-neighbor-label (ties to the smallest label),
    reported as the 15 largest communities. Integer-exact, so the
    unrolled SQL oracle checks VALUES — the first community-detection
    query with an exact oracle (modularity/components check structure,
    not an iterative mode).

    Scale: per round one edges⋈labels shuffle + a two-level
    aggregation whose mode is max(struct(count, −label)) — an
    aggregation, never a window over edges; rounds are fixed so plan
    depth is constant."""
    from ..operators.graph import label_propagation

    lab = label_propagation(
        copurchase_sym_edges(spark, sf_dir), n_iter=LP_ROUNDS
    )
    return (
        lab.groupBy(F.col("lbl").cast("long").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.min("node").cast("long").alias("min_node"),
        )
        .orderBy(F.col("size").desc(), "community")
        .limit(15)
    )


@register(
    "q_graph_local_bridges",
    oracle=f"""
    WITH cop AS ({COPURCHASE_SQL}),
    edges AS (
        SELECT part_a AS src, part_b AS dst FROM cop
        UNION ALL SELECT part_b, part_a FROM cop),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    common AS (
        SELECT DISTINCT e1.src AS a, e2.src AS b
        FROM edges e1 JOIN edges e2
          ON e1.dst = e2.dst AND e1.src < e2.src),
    bridges AS (
        SELECT part_a, part_b FROM cop
        ANTI JOIN common ON common.a = cop.part_a
                        AND common.b = cop.part_b)
    SELECT CAST(b.part_a AS BIGINT) AS part_a,
           CAST(b.part_b AS BIGINT) AS part_b,
           da.d AS deg_a, db.d AS deg_b
    FROM bridges b
    JOIN deg da ON da.node = b.part_a
    JOIN deg db ON db.node = b.part_b
    ORDER BY da.d + db.d DESC, b.part_a, b.part_b LIMIT 15
    """,
)
def q_graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local bridges (Granovetter's weak ties): co-purchase edges
    whose endpoints have NO common neighbor — deleting one lengthens
    the shortest path between its endpoints beyond 2, so these are the
    ties that alone connect otherwise-separate purchase neighborhoods.
    Top 15 by combined endpoint degree (busiest weak ties first).

    Scale: the common-neighbor table is one self-join of the sparse
    edge list on the shared endpoint (wedge enumeration, bounded by
    degree like the link-prediction quartet) and the bridge test is a
    broadcast-able anti join — never all-pairs."""
    cop = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    edges = cop.select(F.col("part_a").alias("src"),
                       F.col("part_b").alias("dst")).unionAll(
        cop.select(F.col("part_b").alias("src"),
                   F.col("part_a").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("w2"))
    common = (
        e1.join(e2, (F.col("w") == F.col("w2")) & (F.col("a") < F.col("b")))
        .select("a", "b").distinct()
    )
    bridges = cop.join(
        common,
        (cop.part_a == common.a) & (cop.part_b == common.b),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("node").alias("node_b"), F.col("d").alias("deg_b"))
    return (
        bridges.join(da, bridges.part_a == da.node_a)
        .join(db, bridges.part_b == db.node_b)
        .select(
            F.col("part_a").cast("long").alias("part_a"),
            F.col("part_b").cast("long").alias("part_b"),
            "deg_a", "deg_b",
        )
        .orderBy((F.col("deg_a") + F.col("deg_b")).desc(), "part_a", "part_b")
        .limit(15)
    )


@register("q_graph_hits")  # rows-only: float fixpoint — numpy-oracled in pytest
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) on the bipartite
    customer→part purchase graph (an edge when a customer's order
    contains the part): authorities are the parts that well-connected
    customers buy, hubs the customers whose baskets concentrate on
    authoritative parts — the mutual-reinforcement ranking behind
    'influential item' tables. 5 max-normalized iterations
    (operators/graph.py:hits); numpy parity in tests/test_graph_hits.py.
    Returns the 15 strongest authorities.

    Scale: node-grain state, edge-grain shuffle per iteration, one
    scalar (the max) to the driver per normalization — the pagerank
    discipline on a directed graph."""
    from ..operators.graph import hits

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"),
                F.col("l_partkey").alias("dst"))
        .distinct()
    )
    # 5 iterations is shallow enough for ONE pipelined plan — skipping
    # the mid-loop checkpoint saves the blocking materializations
    # (measured 9.1 s -> 6.8 s warm build at sf0.1); deeper runs keep
    # the default cadence
    scores = hits(edges, n_iter=5, checkpoint_every=5)
    return (
        scores.where(F.col("side") == "auth")
        .select(F.col("node").cast("long").alias("part_id"),
                F.round("score", 8).alias("authority"))
        .orderBy(F.col("authority").desc(), "part_id")
        .limit(15)
    )
