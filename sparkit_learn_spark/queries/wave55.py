"""Round-6 wave 55: Markov stationary distribution by recursive-CTE
power iteration (integer-quantized probabilities, deterministic in
both engines), KV-cache prefix-reuse estimation (shared token
prefixes), and greedy bigram acceptance rate (the speculative-
decoding analog). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

def _sq_sql(prev: str, new: str) -> str:
    return (
        f"{new} AS (SELECT a.i, b.j, "
        f"CAST(SUM(a.tu * b.tu) // 1000000 AS BIGINT) AS tu "
        f"FROM {prev} a JOIN {prev} b ON b.i = a.j GROUP BY a.i, b.j)"
    )


_MARKOV_SQL = """
    WITH tr AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT user_id, event_type AS cur,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM {events})
        WHERE nxt IS NOT NULL
        GROUP BY cur, nxt),
    tot AS (
        SELECT cur, CAST(SUM(cnt) AS BIGINT) AS tot
        FROM tr GROUP BY cur),
    t0 AS (
        SELECT tr.cur AS i, tr.nxt AS j,
               CAST((tr.cnt * 1000000) // tot.tot AS BIGINT) AS tu
        FROM tr JOIN tot ON tot.cur = tr.cur),
    {sq1}, {sq2}, {sq3}, {sq4}, {sq5},
    states AS (SELECT DISTINCT i AS s FROM t0),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
    p0 AS (
        SELECT s, CAST(1000000 // k.k AS BIGINT) AS pu
        FROM states CROSS JOIN k),
    pfin AS (
        SELECT t.j AS state,
               CAST(SUM(p0.pu * t.tu) // 1000000 AS BIGINT) AS pu
        FROM p0 JOIN t5 t ON t.i = p0.s
        GROUP BY t.j)
    SELECT state, pu AS prob_microunits,
           ROUND(pu / 1e6, 6) AS stationary_prob
    FROM pfin
"""


@register(
    "q_evt_markov_stationary",
    oracle=_MARKOV_SQL.format(
        events="events",
        sq1=_sq_sql("t0", "t1"), sq2=_sq_sql("t1", "t2"),
        sq3=_sq_sql("t2", "t3"), sq4=_sq_sql("t3", "t4"),
        sq5=_sq_sql("t4", "t5"),
    ),
)
def q_evt_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: the
    empirical transition matrix (per-user LEAD pairs) raised to the
    32nd power by REPEATED SQUARING — five k²-grain join-aggregate
    squarings instead of 32 sequential steps — then applied to the
    uniform start. Transition mass is carried as integer MICRO-units
    with floor division, so every squaring is exact integer
    arithmetic and both engines agree bit-for-bit (float power
    iteration would diverge in summation order); the ~1e-5 floor
    bias is far below the 6dp display and identical across engines.

    Scale: after the one fact-grain LEAD pass, everything operates on
    the k×k matrix (k = event types) — five joins over ≤k² rows;
    log-step squaring is how distributed linear-algebra loops cut
    iteration counts (5 shuffles instead of 32)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_markov_v"
    )
    sql = _MARKOV_SQL.format(
        events="events_markov_v",
        sq1=_sq_sql("t0", "t1"), sq2=_sq_sql("t1", "t2"),
        sq3=_sq_sql("t2", "t3"), sq4=_sq_sql("t3", "t4"),
        sq5=_sq_sql("t4", "t5"),
    ).replace("// 1000000", "div 1000000").replace(
        "// k.k", "div k.k"
    ).replace("// tot.tot", "div tot.tot")
    return spark.sql(sql)


@register(
    "q_llm_prefix_cache",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pfx AS (
        SELECT doc_id,
               LEAST(len(toks), 16) AS plen,
               array_to_string(toks[1:16], ' ') AS prefix
        FROM t),
    g AS (
        SELECT prefix, plen,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pfx GROUP BY prefix, plen),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_prefixes,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END)
                    AS BIGINT) AS docs_in_shared,
               CAST(SUM(CASE WHEN n_docs > 1
                             THEN (n_docs - 1) * plen ELSE 0 END)
                    AS BIGINT) AS tokens_reusable
        FROM g)
    SELECT n_prefixes, n_docs, docs_in_shared, tokens_reusable,
           ROUND(docs_in_shared / CAST(n_docs AS DOUBLE), 6)
               AS shared_doc_rate
    FROM agg
    """,
)
def q_llm_prefix_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-cache prefix-reuse estimate: documents grouped by their
    first-16-token prefix; every duplicate occupant of a prefix group
    could reuse a cached prefix computation, so (copies−1)·prefix_len
    tokens of prefill are avoidable — the measurement behind
    prefix-caching / prompt-caching capacity planning for LLM
    serving (shared system prompts and templates dominate real
    workloads). Exact integers until the final rate.

    Scale: the prefix is a row-local slice; grouping shuffles the
    bounded prefix string (hash it at 100 TB, as exact-dedup does) —
    one aggregate at prefix grain plus a constant-size rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pfx = d.select(
        F.least(F.size(toks), F.lit(16)).alias("plen"),
        F.array_join(F.slice(toks, 1, 16), " ").alias("prefix"),
    )
    g = pfx.groupBy("prefix", "plen").agg(F.count("*").alias("n_docs"))
    agg = g.agg(
        F.count("*").alias("n_prefixes"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(
            F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(0)
        ).alias("docs_in_shared"),
        F.sum(
            F.when(
                F.col("n_docs") > 1,
                (F.col("n_docs") - 1) * F.col("plen"),
            ).otherwise(0)
        ).alias("tokens_reusable"),
    )
    return agg.select(
        "n_prefixes",
        "n_docs",
        "docs_in_shared",
        "tokens_reusable",
        F.round(
            F.col("docs_in_shared") / F.col("n_docs").cast("double"), 6
        ).alias("shared_doc_rate"),
    )


@register(
    "q_llm_greedy_acceptance",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    bg AS (
        SELECT toks[CAST(i - 1 AS INT)] AS w1,
               toks[CAST(i AS INT)] AS w2
        FROM t, unnest(range(2, len(toks) + 1)) AS u(i)
        WHERE len(toks) >= 2),
    c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM bg GROUP BY 1, 2),
    best AS (
        SELECT w1, w2 AS pred
        FROM (SELECT w1, w2, ROW_NUMBER() OVER (
                  PARTITION BY w1 ORDER BY cnt DESC, w2) AS rn
              FROM c)
        WHERE rn = 1),
    scored AS (
        SELECT CAST(SUM(CASE WHEN b.pred = bg.w2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_accepted,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams
        FROM bg JOIN best b ON b.w1 = bg.w1)
    SELECT n_bigrams, n_accepted,
           ROUND(n_accepted / CAST(n_bigrams AS DOUBLE), 6)
               AS greedy_acceptance_rate
    FROM scored
    """,
)
def q_llm_greedy_acceptance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy bigram acceptance rate: train the corpus's own bigram
    table, predict each token as the ARGMAX continuation of its
    predecessor (count-desc, token tie-break), and measure the hit
    rate over the corpus — the draft-acceptance analog behind
    speculative decoding: a high rate means a tiny n-gram draft
    model would be accepted often, quantifying how predictable the
    corpus is token-to-token. Exact counts; argmax is deterministic.

    Scale: bigram counts are a (w1,w2)-grain map-side aggregate; the
    argmax is a per-w1 window at vocabulary-pair grain; scoring joins
    the corpus's bigram stream to the w1-keyed prediction dictionary
    (broadcastable) — linear end to end."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), i -> "
                "named_struct('w1', toks[i - 1], 'w2', toks[i]))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c = bg.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    wb = Window.partitionBy("w1").orderBy(F.col("cnt").desc(), "w2")
    best = (
        c.select("w1", "w2", F.row_number().over(wb).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("w1", F.col("w2").alias("pred"))
    )
    scored = bg.join(F.broadcast(best), "w1").agg(
        F.sum(
            F.when(F.col("pred") == F.col("w2"), 1).otherwise(0)
        ).alias("n_accepted"),
        F.count("*").alias("n_bigrams"),
    )
    return scored.select(
        "n_bigrams",
        "n_accepted",
        F.round(
            F.col("n_accepted") / F.col("n_bigrams").cast("double"), 6
        ).alias("greedy_acceptance_rate"),
    )
