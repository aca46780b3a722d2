"""Round-6 wave 73: Markov removal-effect attribution (absorbing-
chain conversion probability with each channel knocked out, bounded
8-step vector iteration in exact integer micro-units) and exact
Shapley-value attribution over channel coalitions (the 4-player game
solved in closed form with factorial-weight literals). Completes the
attribution ladder (last-touch → U-shaped → Markov → Shapley). Both
exactly DuckDB-oracled via a shared SQL template (`//` floor-division
swapped for Spark's `div`, the q_evt_markov_stationary trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from ..catalog import load_table
from ..registry import register


def _pstep(prev: str, new: str) -> str:
    return (
        f"{new} AS (SELECT p.scn, t.j AS s, "
        f"CAST(SUM(p.pu * t.tu) // 1000000 AS BIGINT) AS pu "
        f"FROM {prev} p JOIN tm2 t ON t.scn = p.scn AND t.i = p.s "
        f"GROUP BY p.scn, t.j)"
    )


_REMOVAL_SQL = """
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
    scen AS (
        SELECT DISTINCT event_type AS scn FROM {events}
        WHERE event_type <> 'purchase'
        UNION ALL SELECT 'base'),
    tm AS (
        SELECT s.scn, t.i,
               CASE WHEN t.j = s.scn THEN 'null' ELSE t.j END AS j,
               CAST(SUM(t.tu) AS BIGINT) AS tu
        FROM tmat t CROSS JOIN scen s
        GROUP BY s.scn, t.i, CASE WHEN t.j = s.scn THEN 'null' ELSE t.j END),
    tm2 AS (
        SELECT scn, i, j, tu FROM tm
        UNION ALL SELECT scn, 'conv', 'conv', CAST(1000000 AS BIGINT)
        FROM scen
        UNION ALL SELECT scn, 'null', 'null', CAST(1000000 AS BIGINT)
        FROM scen),
    p0 AS (SELECT scn, 'start' AS s, CAST(1000000 AS BIGINT) AS pu
           FROM scen),
    {p1}, {p2}, {p3}, {p4}, {p5}, {p6}, {p7}, {p8},
    res AS (SELECT scn, pu FROM p8 WHERE s = 'conv'),
    base AS (SELECT pu AS bpu FROM res WHERE scn = 'base'),
    eff AS (
        SELECT r.scn, b.bpu, r.pu, b.bpu - r.pu AS d
        FROM res r CROSS JOIN base b WHERE r.scn <> 'base'),
    teff AS (SELECT CAST(SUM(d) AS BIGINT) AS td FROM eff)
    SELECT e.scn AS channel,
           ROUND(e.bpu / 1e6, 6) AS base_conv_prob,
           ROUND(e.pu / 1e6, 6) AS conv_prob_removed,
           ROUND(e.d / CAST(e.bpu AS DOUBLE), 6) AS removal_effect,
           ROUND(e.d / CAST(t.td AS DOUBLE), 6) AS attribution_share
    FROM eff e CROSS JOIN teff t
    ORDER BY channel
"""


def _removal_sql(events: str) -> str:
    return _REMOVAL_SQL.format(
        events=events,
        **{f"p{k}": _pstep(f"p{k-1}", f"p{k}") for k in range(1, 9)},
    )


@register("q_evt_markov_removal", oracle=_removal_sql("events"))
def q_evt_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: per-user journeys truncated
    at first purchase become an absorbing chain (conv/null absorbing,
    transition mass in integer micro-units); conversion probability
    within 8 steps is computed from the start state for the full
    chain AND once per channel with that channel knocked out
    (transitions into it redirected to null). A channel's removal
    effect (base − removed)/base, normalized across channels, is its
    attribution share — the standard data-driven alternative to
    positional attribution. All chain arithmetic is exact floor-
    division integer math, so both engines agree bit-for-bit.

    Scale: one fact-grain LEAD pass builds transition counts; every
    iteration then operates on scenarios × k² matrix rows (k = event
    types + 3) — the 8-step vector iteration is 8 joins over a
    dimension-sized table. Adding channels grows the matrix, never
    the fact passes.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_attrib_v"
    )
    sql = _removal_sql("events_attrib_v").replace("// 1000000", "div 1000000").replace(
        "// tot.t", "div tot.t"
    )
    return spark.sql(sql)


_SHAPLEY_HEAD = """
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM {events}),
    firstp AS (
        SELECT user_id, MIN(rn) AS prn
        FROM seq WHERE event_type = 'purchase' GROUP BY user_id),
    touches AS (
        SELECT s.user_id,
               CAST(MAX(CASE WHEN s.event_type = 'click'
                             AND s.rn < COALESCE(f.prn, s.rn + 1)
                             THEN 1 ELSE 0 END)
                    + 2 * MAX(CASE WHEN s.event_type = 'error'
                              AND s.rn < COALESCE(f.prn, s.rn + 1)
                              THEN 1 ELSE 0 END)
                    + 4 * MAX(CASE WHEN s.event_type = 'signup'
                              AND s.rn < COALESCE(f.prn, s.rn + 1)
                              THEN 1 ELSE 0 END)
                    + 8 * MAX(CASE WHEN s.event_type = 'view'
                              AND s.rn < COALESCE(f.prn, s.rn + 1)
                              THEN 1 ELSE 0 END) AS BIGINT) AS mask,
               MAX(CASE WHEN f.prn IS NOT NULL THEN 1 ELSE 0 END) AS conv
        FROM seq s LEFT JOIN firstp f ON f.user_id = s.user_id
        GROUP BY s.user_id),
    subsets AS (
        SELECT CAST(s AS BIGINT) AS s,
               CAST((s % 2) + ((s // 2) % 2) + ((s // 4) % 2)
                    + ((s // 8) % 2) AS BIGINT) AS pc
        FROM {range16}),
    v AS (
        SELECT sub.s, sub.pc,
               CAST(COALESCE(SUM(t.conv), 0) AS BIGINT) AS convs,
               CAST(COUNT(t.user_id) AS BIGINT) AS users
        FROM subsets sub LEFT JOIN touches t
          ON (t.mask & sub.s) = t.mask
        GROUP BY sub.s, sub.pc)"""

_SHAPLEY_TAIL = """
    {w} channels AS (
        SELECT 'click' AS channel, CAST(1 AS BIGINT) AS bit
        UNION ALL SELECT 'error', CAST(2 AS BIGINT)
        UNION ALL SELECT 'signup', CAST(4 AS BIGINT)
        UNION ALL SELECT 'view', CAST(8 AS BIGINT)),
    terms AS (
        SELECT c.channel,
               CAST(CASE WHEN vs.pc = 0 OR vs.pc = 3 THEN 3 ELSE 1 END
                    * (vi.convs - vs.convs) AS BIGINT) AS t12
        FROM channels c
        JOIN {v} vs ON (vs.s & c.bit) = 0
        JOIN {v} vi ON vi.s = vs.s + c.bit),
    shap AS (
        SELECT channel, CAST(SUM(t12) AS BIGINT) AS phi12
        FROM terms GROUP BY channel),
    tot AS (SELECT CAST(SUM(phi12) AS BIGINT) AS tphi12 FROM shap)
    SELECT s.channel,
           ROUND(CAST(s.phi12 AS DOUBLE) / 12.0 + 0.0, 6)
               AS shapley_value,
           ROUND(s.phi12 / CAST(t.tphi12 AS DOUBLE) + 0.0, 6)
               AS shapley_share
    FROM shap s CROSS JOIN tot t
    ORDER BY s.channel
"""

# single-source template: the oracle runs HEAD+TAIL as one statement
# (TAIL continues the CTE list, v referenced by name); the Spark path
# materializes the 16-row v once and runs TAIL standalone against it.
_SHAPLEY_SQL = _SHAPLEY_HEAD + _SHAPLEY_TAIL


@register(
    "q_evt_shapley_attribution",
    oracle=_SHAPLEY_SQL.format(events="events", range16="range(16) r(s)",
                               w=",", v="v"),
)
def q_evt_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over the 4-channel coalition
    game: each user's pre-conversion touch set is a 4-bit mask, the
    coalition value v(S) is the conversion rate among users whose
    touch set is contained in S, and each channel's Shapley value is
    the closed-form factorial-weighted sum of its marginal
    contributions over all 8 coalitions not containing it (weights
    1/4, 1/12, 1/12, 1/4 by coalition size — literals, no factorial
    at runtime). The game-theoretically fair attribution that Markov
    removal approximates.

    Scale: one fact pass to user-grain masks, then a users × 16
    subset-containment join that re-aggregates map-side to 16 rows —
    everything after is constant-size. Marginals are differences of
    exact integer conversion counts (count-valued games stay
    non-degenerate when every user converts, unlike rate-valued
    ones) held in twelfths (the common denominator of the factorial
    weights), so the 8-term Shapley sums are EXACT integers — no
    float summation-order hazard.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_shapley_v"
    )
    # Materialize the 16-row coalition table v ONCE: the terms CTE
    # references it twice (vs and vi), and with plain CTE inlining the
    # whole fact pipeline (seq window + firstp join + touches agg) ran
    # once per reference — plus again for each of shap's two consumers
    # (54 exchanges in the before-plan).
    #
    # r11: persist() here was a silent NO-OP — CacheManager never
    # substitutes a cached plan that contains WithCTE when the view is
    # re-referenced (each view expansion analyzes to fresh CTE ids, so
    # the canonicalized lookup misses; verified: the tail's plan had
    # zero InMemoryRelation nodes and 0 persistent RDDs after exec, so
    # the fact pipeline still ran once PER REFERENCE). An eager
    # localCheckpoint of the 16-row v genuinely truncates the lineage:
    # the fact work runs exactly once per call, and the tail is
    # constant-size (tail exec 4.2 s -> ~0.1 s fresh-JVM; the one fact
    # pass moves to build where the other checkpoint pipelines already
    # account it).
    head_sql = (
        _SHAPLEY_HEAD.format(
            events="events_shapley_v", range16="range(16) AS r(s)"
        ).replace("(s // 2)", "(s div 2)")
        .replace("(s // 4)", "(s div 4)")
        .replace("(s // 8)", "(s div 8)")
        + "\n    SELECT s, pc, convs, users FROM v"
    )
    v_df = spark.sql(head_sql).localCheckpoint(eager=True)
    v_df.createOrReplaceTempView("shapley_v_mat")
    return spark.sql(_SHAPLEY_TAIL.format(w="WITH", v="shapley_v_mat"))
