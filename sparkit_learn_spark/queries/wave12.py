"""Round-6 wave 12: PPJoin-style prefix-filtered set-similarity join
(exact shingle Jaccard >= 0.5 with candidate pruning by global-rarity
prefixes), seasonal-naive forecast backtest (MAPE / bias / RMSE),
population-stability-index drift report, and Pareto 80/20 revenue
concentration. All exactly DuckDB-oracled; thresholds and crossings
are tested in exact integer space so no engine float-order can flip a
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_setjoin_prefix",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY doc_id),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cands c
      JOIN s a ON a.doc_id = c.doc_a
      JOIN s b ON b.doc_id = c.doc_b AND b.sh = a.sh
      GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b, i.n_common,
           sa.n + sb.n - i.n_common AS n_union,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE 3 * i.n_common >= sa.n + sb.n
    """,
)
def q_llm_setjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join with PPJoin prefix filtering: pairs of
    documents whose 5-gram shingle sets have Jaccard >= 0.5, where
    candidates are generated ONLY from each document's rarity-ordered
    PREFIX (the first n − ⌈τ·n⌉ + 1 shingles under a global
    (document-frequency, shingle) order). The prefix filter is lossless
    for the threshold — two sets with Jaccard >= τ must share a prefix
    element — so the output equals the brute shared-shingle oracle's.
    The >= 0.5 test runs in exact integers (3·|∩| >= |A|+|B|).

    Scale: this is the candidate-pruning strategy that survives when
    the inverted index does not — candidate cost is Σ(prefix-bucket)²,
    and prefixes hold only each document's RAREST shingles, so hot
    buckets never enter the join. The df table joins back shingle-
    grain (shuffle on shingle), the per-doc rank is a bounded window
    (shingles-per-doc), and verification touches candidate pairs only.

    vs q_llm_ngram_jaccard (inverted index + df cap at the SAME
    semantics family): same exactness, different pruning — the cap
    bounds bucket size, the prefix bounds which elements may seed a
    candidate at all."""
    from ..catalog import spread_scan
    from ..operators.dedup import shingle_index

    d = load_table(spark, sf_dir, "documents")
    # r12: capped spread ahead of the checkpoint — see the
    # q_llm_ngram_jaccard note (parallel tokenize + 8-partition index
    # for the ~5 downstream consumers; full-32 spread measured LOSING
    # in r11).
    s = shingle_index(spread_scan(d, cap=8), k=5).localCheckpoint(eager=True)
    df = s.groupBy("sh").agg(F.count("*").alias("df"))
    sized = s.join(df, "sh")
    w_rank = Window.partitionBy("doc_id").orderBy("df", "sh")
    w_n = Window.partitionBy("doc_id")
    ranked = sized.select(
        "doc_id",
        "sh",
        F.row_number().over(w_rank).alias("rnk"),
        F.count("*").over(w_n).alias("n"),
    )
    # tau = 0.5: prefix length p = n - ceil(n/2) + 1 = n div 2 + 1.
    # rnk/n ride along for the POSITIONAL filter below (r12).
    prefix = ranked.filter(
        F.col("rnk") <= F.floor(F.col("n") / 2) + 1
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # Positional-prefix upper bound (r12, VERDICT r11 #4 — the PPJoin
    # positional filter): the rank order is GLOBAL ((df, sh) ties by
    # sh), so for a shared shingle at in-document positions (i, j) any
    # OTHER common shingle sits before it in both docs or after it in
    # both, giving the exact bound
    #     overlap <= min(i-1, j-1) + 1 + min(n_a - i, n_b - j).
    # A pair can only reach Jaccard >= 0.5 (3*overlap >= n_a + n_b) if
    # SOME shared prefix row's bound passes, and every shared row's
    # bound >= the true overlap — so filtering join rows by the bound
    # BEFORE the pair distinct is lossless and prunes candidates that
    # the verification join would otherwise count shingle-by-shingle
    # (the bound also subsumes the 2*min(n_a,n_b) >= max length
    # filter, since bound <= min(n_a, n_b)). n_a/n_b ride through the
    # distinct, so the old per-side size re-join is gone too.
    ub = (
        F.least(F.col("a.rnk"), F.col("b.rnk"))
        + F.least(F.col("a.n") - F.col("a.rnk"), F.col("b.n") - F.col("b.rnk"))
    )
    cands = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(3 * ub >= F.col("a.n") + F.col("b.n"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"), F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("sh"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("sh"))
    inter = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("n_common"))
    )
    union = F.col("na") + F.col("nb") - F.col("n_common")
    return (
        inter
        .filter(3 * F.col("n_common") >= F.col("na") + F.col("nb"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            union.alias("n_union"),
            F.round(F.col("n_common").cast("double") / union, 6).alias("jaccard"),
        )
    )


@register(
    "q_ts_forecast_eval",
    oracle="""
    WITH m AS (
        SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1, 2),
    f AS (
        SELECT y, m, rev_c,
               LAG(rev_c, 12) OVER (ORDER BY y, m) AS fc_c
        FROM m)
    SELECT y, CAST(COUNT(*) AS BIGINT) AS n_months,
           ROUND(AVG(ABS(rev_c - fc_c) / CAST(rev_c AS DOUBLE)), 6) AS mape,
           ROUND((SUM(fc_c) - SUM(rev_c)) / CAST(SUM(rev_c) AS DOUBLE), 6)
               AS bias_pct,
           ROUND(SQRT(CAST(SUM(CAST(rev_c - fc_c AS DECIMAL(19, 0))
                               * CAST(rev_c - fc_c AS DECIMAL(19, 0)))
                           AS DOUBLE)
                      / COUNT(*)) / 100.0, 6) AS rmse
    FROM f WHERE fc_c IS NOT NULL
    GROUP BY y
    """,
)
def q_ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest of the seasonal-naive model (forecast a month
    with the same month last year): per-year MAPE, aggregate bias, and
    RMSE. Errors are exact cent integers; the squared-error sum runs in
    DECIMAL(38,0) (a cent error squared exceeds int64 headroom beyond
    ~sf1), so every metric divides bit-identical operands in both
    engines.

    Scale: the fact collapses map-side to month grain; the backtest
    itself is window + aggregate over ~80 rows — the standard shape
    for evaluating ANY per-series forecaster distributedly (partition
    by series, window by time)."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"))
    f = m.select(
        "y",
        "rev_c",
        F.lag("rev_c", 12).over(Window.orderBy("y", "m")).alias("fc_c"),
    ).filter(F.col("fc_c").isNotNull())
    err_dec = (F.col("rev_c") - F.col("fc_c")).cast("decimal(19,0)")
    return f.groupBy("y").agg(
        F.count("*").alias("n_months"),
        F.round(
            F.avg(
                F.abs(F.col("rev_c") - F.col("fc_c"))
                / F.col("rev_c").cast("double")
            ),
            6,
        ).alias("mape"),
        F.round(
            (F.sum("fc_c") - F.sum("rev_c")) / F.sum("rev_c").cast("double"), 6
        ).alias("bias_pct"),
        F.round(
            F.sqrt(F.sum(err_dec * err_dec).cast("double") / F.count("*")) / 100.0,
            6,
        ).alias("rmse"),
    )


@register(
    "q_dq_drift",
    oracle="""
    WITH b AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-04-01' THEN 'ref'
                    ELSE 'cur' END AS period,
               LEAST(CAST(FLOOR(o_totalprice / 60000.0) AS BIGINT), 9) AS bin
        FROM orders),
    c AS (
        SELECT bin,
               SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM b GROUP BY bin),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM c)
    SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(((n_cur + 1) / CAST(t_cur + 10 AS DOUBLE)
                  - (n_ref + 1) / CAST(t_ref + 10 AS DOUBLE))
                 * LN(((n_cur + 1) / CAST(t_cur + 10 AS DOUBLE))
                      / ((n_ref + 1) / CAST(t_ref + 10 AS DOUBLE))), 6)
               AS psi_term
    FROM c CROSS JOIN tot
    """,
)
def q_dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report (population stability index): order
    totals binned into 10 fixed-width buckets, compared between a
    reference period (pre-1998-04, the data midpoint) and the current
    period; each bin emits
    its Laplace-smoothed PSI term (p−q)·ln(p/q). Counts are exact
    integers and the smoothing makes every ratio a ratio of exact
    integers, so both engines feed identical doubles into ln.

    Scale: one scan, one 10-bucket aggregate with map-side combine —
    the monitoring query a 100 TB ingest runs per column per batch;
    fixed-width bins avoid the quantile pass a decile-PSI needs (that
    exact-quantile path exists separately in q_agg_percentile)."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.when(F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"), "ref")
        .otherwise("cur")
        .alias("period"),
        F.least(
            F.floor(F.col("o_totalprice") / 60000.0).cast("long"), F.lit(9)
        ).alias("bin"),
    )
    c = b.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    tot = c.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_cur = (F.col("n_cur") + 1) / (F.col("t_cur") + 10).cast("double")
    p_ref = (F.col("n_ref") + 1) / (F.col("t_ref") + 10).cast("double")
    return c.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


@register(
    "q_agg_pareto",
    oracle="""
    WITH cr AS (
        SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    r AS (
        SELECT nk, rev_c,
               ROW_NUMBER() OVER (PARTITION BY nk
                                  ORDER BY rev_c DESC, ck) AS rn,
               SUM(rev_c) OVER (PARTITION BY nk
                                ORDER BY rev_c DESC, ck
                                ROWS UNBOUNDED PRECEDING) AS cum_c,
               SUM(rev_c) OVER (PARTITION BY nk) AS tot_c,
               COUNT(*) OVER (PARTITION BY nk) AS n_cust
        FROM cr)
    SELECT nk AS c_nationkey,
           CAST(MIN(n_cust) AS BIGINT) AS n_customers,
           CAST(MIN(rn) FILTER (WHERE 5 * cum_c >= 4 * tot_c) AS BIGINT)
               AS n_top80,
           ROUND(MIN(rn) FILTER (WHERE 5 * cum_c >= 4 * tot_c)
                 / CAST(MIN(n_cust) AS DOUBLE), 6) AS top80_share
    FROM r GROUP BY nk
    """,
)
def q_agg_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto 80/20 concentration per nation: the smallest number of
    customers (by descending revenue, custkey tie-break) whose
    cumulative revenue reaches 80% of the nation's total. Revenue is
    exact integer cents and the 80% crossing is the integer test
    5·cum >= 4·tot — no float ordering can move the cut.

    Scale: fact → (nation, customer) grain via one map-side-combining
    aggregate; the ranking window then runs at customer grain
    partitioned by nation — the distributed top-contributor pattern
    (same shape at 100 TB, keyed windows never globalize)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
        )
    )
    ws = Window.partitionBy("nk").orderBy(F.col("rev_c").desc(), "ck")
    wp = Window.partitionBy("nk")
    r = cr.select(
        "nk",
        F.row_number().over(ws).alias("rn"),
        F.sum("rev_c").over(ws.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_c"
        ),
        F.sum("rev_c").over(wp).alias("tot_c"),
        F.count("*").over(wp).alias("n_cust"),
    )
    crossed = F.min(
        F.when(5 * F.col("cum_c") >= 4 * F.col("tot_c"), F.col("rn"))
    )
    return r.groupBy(F.col("nk").alias("c_nationkey")).agg(
        F.min("n_cust").alias("n_customers"),
        crossed.alias("n_top80"),
        F.round(crossed / F.min("n_cust").cast("double"), 6).alias("top80_share"),
    )
