"""Iterative graph algorithms on DataFrames (round 6): PageRank.

Complements operators/components.py (connected components via
min-label propagation) with the other canonical iterative-join
algorithm. Same execution discipline: each iteration is one
(edges ⋈ ranks) shuffle + one aggregation, the loop runs a FIXED
number of plan-bounded iterations, superseded localCheckpoints are
unpersisted (the operators/ids.py pattern), and per-iteration driver
involvement is zero.

Scale: the rank table is node-grain, the join shuffles edge-grain —
exactly the web-scale PageRank shape; at 100 TB pre-partition edges
and ranks by src so every iteration reuses the partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Iteration count beyond which hits() rescales at every checkpoint.
#: 16 half-step pairs of Σdeg growth is far inside double range for
#: any graph whose degree sums fit in a double to begin with.
RESCALE_AFTER = 16


def hits(edges: DataFrame, *, src: str = "src", dst: str = "dst",
         n_iter: int = 5, checkpoint_every: int = 2) -> DataFrame:
    """HITS (Kleinberg 1999) over a DIRECTED edge list: hub scores on
    source nodes, authority scores on destination nodes (for a
    bipartite purchase graph: customers are hubs, parts authorities).
    Each iteration is the canonical pair of edge-grain aggregations
    auth = Σ_in hub, hub = Σ_out auth; both sides are max-normalized
    ONCE at the end (per-iteration rescaling only fixes the scale, and
    deferring it removes two driver round-trips per iteration —
    measured 13.4 s -> 5.6 s build at sf0.1). Magnitudes grow like
    (Σdeg)^n_iter, safe in doubles for shallow iteration counts; when
    ``n_iter > RESCALE_AFTER`` each checkpoint ALSO rescales hubs by a
    POWER OF TWO near the max — exact in binary floating point, so
    scores stay bit-reproducible while deep runs can no longer
    overflow to inf/NaN (one extra driver round-trip per checkpoint,
    paid only on deep runs).

    Returns (node, side, score) with side ∈ {'hub', 'auth'} and each
    side's max score = 1.0. Float fixpoint -> rows-only oracle class;
    value-checked against a numpy replica in tests/test_graph_hits.py.

    Scale: state is node-grain and BROADCAST onto the pinned edge
    list (no edge shuffle per iteration); at web scale where the rank
    table outgrows the broadcast limit, swap the hint for edges
    pre-partitioned by src/dst so every iteration reuses one
    partitioning, the :func:`pagerank` shape.
    """
    if n_iter < 1:
        raise ValueError(f"hits: n_iter must be >= 1, got {n_iter}")
    if checkpoint_every < 1:
        raise ValueError(
            f"hits: checkpoint_every must be >= 1, got {checkpoint_every}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
        .distinct().localCheckpoint(eager=True)
    hubs = e.select(F.col("s").alias("node")).distinct() \
        .withColumn("h", F.lit(1.0))
    auths = None
    pinned: list[DataFrame] = []
    for i in range(n_iter):
        auths = (
            e.join(F.broadcast(hubs), e.s == hubs.node)
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        hubs = (
            e.join(F.broadcast(auths), e.d == auths.node)
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        # bound plan depth without forcing a driver sync every step
        if (i + 1) % checkpoint_every == 0 and i < n_iter - 1:
            hubs = hubs.localCheckpoint(eager=True)
            if n_iter > RESCALE_AFTER:
                # deep run: scores grow like (Σdeg)^i — rescale by a
                # power of two near the current max (exact in binary
                # FP, bit-identical final normalized scores) so the
                # fixpoint can't overflow doubles to inf/NaN.
                cur = hubs.agg(F.max("h")).collect()[0][0]
                if cur is not None and not math.isfinite(cur):
                    # already overflowed/NaN between checkpoints:
                    # log2(inf) would make scale 0.0 and silently zero
                    # every score — fail loudly instead (r9 ADVICE)
                    raise ArithmeticError(
                        f"hits: hub scores became non-finite ({cur}) "
                        f"at iteration {i + 1}; lower checkpoint_every "
                        "so the rescale runs before overflow")
                if cur and cur > 0:
                    scale = 2.0 ** -math.floor(math.log2(cur))
                    if scale != 1.0:
                        hubs = hubs.withColumn(
                            "h", F.col("h") * F.lit(scale)
                        ).localCheckpoint(eager=True)
            for p in pinned:
                p.unpersist()
            pinned = [hubs]
    auths = auths.localCheckpoint(eager=True)
    hubs = hubs.localCheckpoint(eager=True)
    amax = auths.agg(F.max("a")).collect()[0][0]
    hmax = hubs.agg(F.max("h")).collect()[0][0]
    out = hubs.select(
        "node", F.lit("hub").alias("side"),
        (F.col("h") / F.lit(hmax)).alias("score"),
    ).unionAll(
        auths.select(
            "node", F.lit("auth").alias("side"),
            (F.col("a") / F.lit(amax)).alias("score"),
        )
    ).localCheckpoint(eager=True)
    for p in pinned:
        p.unpersist()
    auths.unpersist()
    hubs.unpersist()
    e.unpersist()
    return out


def label_propagation(edges_sym: DataFrame, *, src: str = "src",
                      dst: str = "dst", n_iter: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over a
    SYMMETRIC edge list: every node starts labeled with its own id;
    each round it adopts the most frequent label among its neighbors,
    ties broken toward the SMALLEST label. Integer-exact semantics
    (counts + min tiebreak, no floats), so a fixed iteration count is
    exactly SQL-oracle-able by unrolling — unlike pagerank/HITS.

    Returns (node, lbl) after ``n_iter`` rounds.

    Scale: one edges⋈labels shuffle + one two-level aggregation per
    round — the mode is max(struct(count, -label)), an aggregation,
    NOT a window over the edge list."""
    e = edges_sym.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
        .localCheckpoint(eager=True)
    lab = e.select(F.col("s").alias("node")).distinct() \
        .withColumn("lbl", F.col("node"))
    for _ in range(n_iter):
        cnt = (
            e.join(lab, e.d == lab.node)
            .groupBy(F.col("s"), F.col("lbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            cnt.groupBy("s")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("nl")))
                 .alias("m"))
            .select(F.col("s").alias("node"), (-F.col("m.nl")).alias("lbl"))
        )
    out = lab.localCheckpoint(eager=True)
    e.unpersist()
    return out


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, n_iter: int = 10,
             checkpoint_every: int = 3) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge contributes
    both directions, so no dangling nodes exist among edge-touched
    nodes — isolated nodes are out of scope by construction).

    Returns (node, rank) with ranks summing to ~1. Deterministic:
    initialization and updates are pure aggregations.
    """
    # materialize the symmetric edge list ONCE: every iteration joins
    # it, and without this the (possibly expensive) upstream lineage —
    # e.g. the exact-Jaccard candidate-verify pipeline — would re-run
    # per iteration (measured: 17.7 s -> 2.5 s at sf0.1 for the
    # near-dup graph). Released before return.
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint(eager=True)
    nodes = both.select(F.col("a").alias("node")).distinct()
    n = nodes.count()  # one scalar to the driver; node table stays distributed
    out_deg = both.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    prev = None
    base = (1.0 - damping) / n
    for i in range(n_iter):
        contribs = (
            both.join(ranks, both.a == ranks.node)
            .join(out_deg, ranks.node == out_deg.node)
            .select(F.col("b").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + damping * F.coalesce("inflow", F.lit(0.0)))
            .alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            prev, ranks = ranks, new_ranks.localCheckpoint(eager=True)
            prev.unpersist()  # keep ONE checkpoint pinned, not n_iter/3
        else:
            ranks = new_ranks
    both.unpersist()  # final ranks are checkpointed; edge blocks free
    return ranks


def twin_quotient(sym: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Collapse TRUE TWINS — nodes with identical CLOSED neighborhoods
    (mutually adjacent, same neighbors) — into quotient groups.

    Returns ``(member, sizes, qedges)``:
      member  (node, gid)   gid = min node id of the group
      sizes   (gid, gsz)
      qedges  (src, dst)    SYMMETRIC quotient adjacency, self-loop
                            free (intra-group adjacency is implied:
                            true twins are mutually adjacent)

    Why it exists (r9): duplicate-heavy corpora — boilerplate at
    100 TB, the 100×-replicated scale fixture — turn every document
    into a clique of true twins, and any node-pair-grain graph
    algorithm (k-hop closures, triangle joins) goes quadratic/cubic
    in the duplication factor. True-twin quotients preserve
    inter-group distances and adjacency EXACTLY (all cross pairs of
    adjacent groups are edges; twins are interchangeable on any
    path), so closures/counts run at quotient grain and expand
    analytically per node. Exactness is pinned by the DuckDB oracles
    of every query built on this (harmonic, triangles, clustering).

    ``sym`` must be a SYMMETRIC edge list with columns (src, dst).
    Cost: one edge-grain aggregate (closed-neighborhood arrays), one
    array-equality group, two membership joins — all linear in edges.
    """
    closed = sym.groupBy(F.col("src").alias("node")).agg(
        F.sort_array(
            F.array_union(F.collect_set("dst"),
                          F.array(F.col("src")))).alias("cn"))
    grp = closed.groupBy("cn").agg(F.min("node").alias("gid"))
    member = closed.join(grp, "cn").select("node", "gid") \
        .localCheckpoint(eager=True)
    sizes = member.groupBy("gid").agg(F.count("*").alias("gsz"))
    ms = member.select(F.col("node").alias("src"), F.col("gid").alias("ga"))
    md = member.select(F.col("node").alias("dst"), F.col("gid").alias("gb"))
    qedges = (
        sym.join(ms, "src").join(md, "dst")
        .filter(F.col("ga") != F.col("gb"))
        .select(F.col("ga").alias("src"), F.col("gb").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return member, sizes, qedges


def twin_degrees(sizes: DataFrame, qedges: DataFrame) -> DataFrame:
    """(gid, gsz, degree): the EXACT degree of every member of group
    gid, from quotient-grain structure only.

    True twins with equal closed neighborhoods are mutually adjacent,
    and quotient-adjacent groups are completely bipartite (any edge
    between members of A and B implies all |A|·|B| edges — twins are
    interchangeable), so

        degree(u ∈ A) = (|A| − 1) + Σ_{B ∈ N(A)} |B|

    Why it exists (r10): q_graph_degree at the raw pair grain OOM'd
    the sf10 probe — the duplication factor makes the explode+count
    quadratic in the replicated-edge OUTPUT, while this expansion is
    one broadcast-sized join over quotient edges. Exact; the DuckDB
    oracle of every query built on it is unchanged.
    """
    nbr = (
        qedges.join(sizes.select(F.col("gid").alias("dst"),
                                 F.col("gsz").alias("bsz")), "dst")
        .groupBy(F.col("src").alias("gid"))
        .agg(F.sum("bsz").alias("nbr_sz"))
    )
    return (
        sizes.join(nbr, "gid", "left")
        .select(
            "gid", "gsz",
            (F.col("gsz") - 1 + F.coalesce("nbr_sz", F.lit(0)))
            .cast("long").alias("degree"),
        )
    )
