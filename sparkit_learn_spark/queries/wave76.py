"""Round-6 wave 76: expected steps-to-conversion (absorbing-chain
hitting time, 16 bounded integer-micro-unit iterations), Adamic-Adar
link prediction (inverse-log-degree common-neighbor weighting,
per-term micro-quantized so sums are exact), and a G-test
(likelihood-ratio chi-square) of independence. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

_N_STEPS = 16


def _step(prev: str, new: str) -> str:
    return (
        f"{new} AS MATERIALIZED (SELECT t.j AS s, "
        f"CAST(SUM(p.pu * t.tu) // 1000000 AS BIGINT) AS pu "
        f"FROM {prev} p JOIN tm2 t ON t.i = p.s GROUP BY t.j)"
    )


_TMAT_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM {events}),
    firstp AS (
        SELECT user_id, MIN(rn) AS prn
        FROM seq WHERE event_type = 'purchase' GROUP BY user_id),
    trunc AS (
        SELECT s.user_id, s.event_type, s.rn
        FROM seq s LEFT JOIN firstp f ON f.user_id = s.user_id
        WHERE f.prn IS NULL OR s.rn <= f.prn),
    pairs AS (
        SELECT user_id, event_type AS cur, rn,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY rn) AS nxt
        FROM trunc),
    edges AS (
        SELECT 'start' AS cur,
               CASE WHEN cur = 'purchase' THEN 'conv' ELSE cur END AS nxt
        FROM pairs WHERE rn = 1
        UNION ALL
        SELECT cur,
               CASE WHEN nxt = 'purchase' THEN 'conv'
                    ELSE COALESCE(nxt, 'null') END
        FROM pairs WHERE cur <> 'purchase'),
    cnt AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
            FROM edges GROUP BY cur, nxt),
    tot AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY cur),
    tmat AS (
        SELECT cnt.cur AS i, cnt.nxt AS j,
               CAST((cnt.c * 1000000) // tot.t AS BIGINT) AS tu
        FROM cnt JOIN tot ON tot.cur = cnt.cur)
    SELECT i, j, tu FROM tmat
    UNION ALL SELECT 'conv', 'conv', CAST(1000000 AS BIGINT)
    UNION ALL SELECT 'null', 'null', CAST(1000000 AS BIGINT)
"""

_EXPECTED_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM {events}),
    firstp AS (
        SELECT user_id, MIN(rn) AS prn
        FROM seq WHERE event_type = 'purchase' GROUP BY user_id),
    trunc AS (
        SELECT s.user_id, s.event_type, s.rn
        FROM seq s LEFT JOIN firstp f ON f.user_id = s.user_id
        WHERE f.prn IS NULL OR s.rn <= f.prn),
    pairs AS (
        SELECT user_id, event_type AS cur, rn,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY rn) AS nxt
        FROM trunc),
    edges AS (
        SELECT 'start' AS cur,
               CASE WHEN cur = 'purchase' THEN 'conv' ELSE cur END AS nxt
        FROM pairs WHERE rn = 1
        UNION ALL
        SELECT cur,
               CASE WHEN nxt = 'purchase' THEN 'conv'
                    ELSE COALESCE(nxt, 'null') END
        FROM pairs WHERE cur <> 'purchase'),
    cnt AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
            FROM edges GROUP BY cur, nxt),
    tot AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY cur),
    tmat AS (
        SELECT cnt.cur AS i, cnt.nxt AS j,
               CAST((cnt.c * 1000000) // tot.t AS BIGINT) AS tu
        FROM cnt JOIN tot ON tot.cur = cnt.cur),
    tm2 AS MATERIALIZED (
        SELECT i, j, tu FROM tmat
        UNION ALL SELECT 'conv', 'conv', CAST(1000000 AS BIGINT)
        UNION ALL SELECT 'null', 'null', CAST(1000000 AS BIGINT)),
    p0 AS (SELECT 'start' AS s, CAST(1000000 AS BIGINT) AS pu),
    {steps},
    conv_at AS (
        {conv_at}),
    diffs AS (
        SELECT t, pu - COALESCE(LAG(pu) OVER (ORDER BY t), 0) AS a
        FROM conv_at),
    agg AS (
        SELECT CAST(SUM(t * a) AS BIGINT) AS num,
               CAST(SUM(a) AS BIGINT) AS den
        FROM diffs)
    SELECT CAST(den AS BIGINT) AS conv_mass_micro,
           ROUND(den / 1e6, 6) AS conv_prob_16,
           ROUND(num / CAST(den AS DOUBLE), 6) AS expected_steps
    FROM agg
"""


def _expected_sql(events: str) -> str:
    steps = ", ".join(_step(f"p{k-1}", f"p{k}") for k in range(1, _N_STEPS + 1))
    conv_at = "\n        UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS t, "
        f"COALESCE((SELECT pu FROM p{k} WHERE s = 'conv'), 0) AS pu"
        for k in range(1, _N_STEPS + 1)
    )
    return _EXPECTED_SQL.format(events=events, steps=steps, conv_at=conv_at)


@register("q_evt_expected_steps", oracle=_expected_sql("events"))
def q_evt_expected_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to conversion (absorbing-chain hitting time):
    the journey Markov chain of q_evt_markov_removal iterated 16
    steps from the start state, recording the probability mass newly
    absorbed at conv each step; E[T | converted within 16] =
    Σ t·a_t / Σ a_t — the funnel-length statistic behind "how many
    touches does a conversion take". All chain arithmetic is exact
    floor-division integer micro-units, so the per-step absorbed
    series is engine-identical.

    Scale: one fact-grain LEAD pass, then 16 joins over a k² matrix
    (k = event types + 3) — dimension-sized; the step series and
    final expectation are constant-size arithmetic.
    """
    from pyspark.sql import Window

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_hitting_v"
    )
    tm2 = spark.sql(
        _TMAT_SQL.format(events="events_hitting_v").replace(
            "// tot.t", "div tot.t"
        )
    ).localCheckpoint(eager=True)
    p = spark.createDataFrame([("start", 1000000)], "s: string, pu: long")
    conv_rows = []
    for t in range(1, _N_STEPS + 1):
        p = (
            p.alias("p")
            .join(tm2.alias("t"), F.col("t.i") == F.col("p.s"))
            .groupBy(F.col("t.j").alias("s"))
            .agg(
                F.expr("CAST(SUM(p.pu * t.tu) div 1000000 AS BIGINT)").alias(
                    "pu"
                )
            )
            .localCheckpoint(eager=True)
        )
        conv_rows.append(
            p.filter(F.col("s") == "conv").select(
                F.lit(t).cast("long").alias("t"), F.col("pu")
            )
        )
    conv_at = conv_rows[0]
    for df in conv_rows[1:]:
        conv_at = conv_at.unionAll(df)
    w = Window.orderBy("t")
    diffs = conv_at.select(
        "t",
        (F.col("pu") - F.coalesce(F.lag("pu").over(w), F.lit(0))).alias("a"),
    )
    agg = diffs.agg(
        F.sum(F.col("t") * F.col("a")).alias("num"),
        F.sum("a").alias("den"),
    )
    return agg.select(
        F.col("den").cast("long").alias("conv_mass_micro"),
        F.round(F.col("den") / 1000000.0, 6).alias("conv_prob_16"),
        F.round(F.col("num") / F.col("den").cast("double"), 6).alias(
            "expected_steps"
        ),
    )


@register("q_graph_adamic_adar")
def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-purchase graph: non-
    adjacent pairs scored by Σ 1/ln(deg(shared neighbor)) — common
    neighbors discounted by how promiscuous they are, the standard
    upgrade over raw common-neighbor counts (a hub that neighbors
    everything carries almost no evidence). Per-neighbor weights are
    micro-quantized BEFORE summation (ROUND(10⁶/ln deg)), so pair
    scores are exact integer sums and the top-10 cannot flip on
    float order; the weight table keeps only degree ≥ 2 nodes (a
    shared neighbor always is; degree-1 nodes would hit ln(1) = 0
    in ANSI mode even though they can never be mid-nodes). (r7:
    moved from the near-dup document graph, a clique-union with zero
    non-adjacent wedges — see queries/_copurchase.py.)

    Scale: a degree aggregate plus the same 2-hop edge-grain
    self-join as q_graph_common_neighbors, grouped at pair grain and
    anti-joined against the edge list — sparse-edge shuffles, never
    all-pairs; top-10 is TakeOrderedAndProject.
    """
    from ._copurchase import copurchase_sym_edges

    edges = copurchase_sym_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    wdeg = deg.filter(F.col("deg") >= 2).select(
        "node",
        F.round(1000000.0 / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("w"),
    )
    x, y = edges.alias("x"), edges.alias("y")
    two_hop = (
        x.join(
            y,
            (F.col("x.dst") == F.col("y.src"))
            & (F.col("x.src") < F.col("y.dst")),
        )
        .join(F.broadcast(wdeg), F.col("x.dst") == F.col("node"))
        .groupBy(F.col("x.src").alias("part_a"), F.col("y.dst").alias("part_b"))
        .agg(
            F.sum("w").alias("aa_micro"),
            F.count(F.lit(1)).alias("common_neighbors"),
        )
    )
    adj = edges.select(F.col("src").alias("part_a"), F.col("dst").alias("part_b"))
    return (
        two_hop.join(adj, ["part_a", "part_b"], "left_anti")
        .select(
            "part_a",
            "part_b",
            "common_neighbors",
            "aa_micro",
            F.round(F.col("aa_micro") / 1000000.0, 6).alias("adamic_adar"),
        )
        .orderBy(F.col("aa_micro").desc(), "part_a", "part_b")
        .limit(10)
    )


from ._copurchase import COPURCHASE_SQL as _COP_SQL  # noqa: E402

set_oracle(
    "q_graph_adamic_adar",
    f"""
WITH cop AS ({_COP_SQL}),
e AS (SELECT part_a AS src, part_b AS dst FROM cop
      UNION ALL SELECT part_b, part_a FROM cop),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e GROUP BY src),
wdeg AS (SELECT node,
                CAST(ROUND(1000000.0 / LN(CAST(deg AS DOUBLE)))
                     AS BIGINT) AS w
         FROM deg WHERE deg >= 2),
th AS (
    SELECT x.src AS part_a, y.dst AS part_b,
           CAST(SUM(wd.w) AS BIGINT) AS aa_micro,
           CAST(COUNT(*) AS BIGINT) AS common_neighbors
    FROM e x JOIN e y ON x.dst = y.src AND x.src < y.dst
    JOIN wdeg wd ON wd.node = x.dst
    GROUP BY x.src, y.dst),
nonadj AS (
    SELECT th.* FROM th
    ANTI JOIN e ON e.src = th.part_a AND e.dst = th.part_b)
SELECT part_a, part_b, common_neighbors, aa_micro,
       ROUND(aa_micro / 1000000.0, 6) AS adamic_adar
FROM nonadj ORDER BY aa_micro DESC, part_a, part_b LIMIT 10
""",
)


_GTEST_SQL = """
    WITH base AS (
        SELECT event_type AS et,
               CASE WHEN {dow} >= 6 THEN 1 ELSE 0 END AS wknd
        FROM {events}),
    o AS (SELECT et, wknd, CAST(COUNT(*) AS BIGINT) AS o
          FROM base GROUP BY et, wknd),
    r AS (SELECT et, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY et),
    c AS (SELECT wknd, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY wknd),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
    terms AS (
        SELECT o.et, o.wknd,
               CAST(ROUND(o.o * LN(CAST(o.o AS DOUBLE) * n.n
                                   / (CAST(r.r AS DOUBLE) * c.c))
                          * 1000000) AS BIGINT) AS t_micro
        FROM o JOIN r ON r.et = o.et
               JOIN c ON c.wknd = o.wknd
               CROSS JOIN n),
    g AS (SELECT CAST(SUM(t_micro) AS BIGINT) AS g_micro,
                 CAST(COUNT(*) AS BIGINT) AS n_cells
          FROM terms)
    SELECT ROUND(2.0 * CAST(g.g_micro AS DOUBLE) / 1000000.0, 6)
               AS g_stat,
           CAST((SELECT COUNT(*) FROM r) - 1 AS BIGINT)
           * CAST((SELECT COUNT(*) FROM c) - 1 AS BIGINT) AS df,
           g.n_cells,
           n.n AS n_events
    FROM g CROSS JOIN n
"""


@register(
    "q_stat_g_test",
    oracle=_GTEST_SQL.format(
        events="events", dow="isodow(CAST(ts AS DATE))"
    ),
)
def q_stat_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence between
    event type and weekend/weekday: G = 2·Σ O·ln(O·N / (R·C)) over
    the contingency cells — the information-theoretic twin of the
    Pearson chi-square already registered (G = 2N·MI in nats).
    Per-cell terms are micro-quantized BEFORE the sum, so the
    10-cell reduction is exact integer arithmetic with no
    summation-order hazard; the ln arguments are ratios of exact
    integer counts, identical doubles in both engines.

    Scale: one hash aggregate to contingency-cell grain, broadcast
    row/column margins, constant-size arithmetic after.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_gtest_v"
    )
    return spark.sql(
        _GTEST_SQL.format(events="events_gtest_v", dow="weekday(ts) + 1")
    )
