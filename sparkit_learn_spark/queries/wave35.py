"""Round-6 wave 35: corpus dataset card (the release-readiness
summary), CCNet-style perplexity bucketing (head/middle/tail quality
bands), and NEAR(k) proximity search over the positional index. All
exactly DuckDB-oracled; the bucketing oracle embeds the perplexity
oracle as a CTE (set_oracle reuse pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle
from .llm_pipeline6 import q_llm_perplexity


@register(
    "q_llm_dataset_card",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, lang, n_chars,
               len(string_split(text, ' ')) AS n_toks,
               sha256(lower(trim(text))) AS sha
        FROM documents),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT sha) AS BIGINT) AS n_unique_texts
        FROM t)
    SELECT metric, value FROM (
        SELECT 1 AS ord, 'n_docs' AS metric,
               CAST(n_docs AS DOUBLE) AS value FROM base
        UNION ALL SELECT 2, 'n_sources', CAST(n_sources AS DOUBLE) FROM base
        UNION ALL SELECT 3, 'n_langs', CAST(n_langs AS DOUBLE) FROM base
        UNION ALL SELECT 4, 'total_chars', CAST(total_chars AS DOUBLE) FROM base
        UNION ALL SELECT 5, 'total_tokens', CAST(total_tokens AS DOUBLE) FROM base
        UNION ALL SELECT 6, 'n_exact_dup_docs',
                          CAST(n_docs - n_unique_texts AS DOUBLE) FROM base
        UNION ALL SELECT 7, 'exact_dup_rate',
                          ROUND((n_docs - n_unique_texts)
                                / CAST(n_docs AS DOUBLE), 6) FROM base
        UNION ALL SELECT 8, 'mean_doc_tokens',
                          ROUND(total_tokens / CAST(n_docs AS DOUBLE), 6)
                          FROM base)
    """,
)
def q_llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the one-screen corpus summary every dataset
    release ships — document/source/language counts, exact char and
    whitespace-token mass, exact-duplicate count and rate (sha256 of
    normalized text), and mean document length — as (metric, value)
    rows so downstream tooling diffs cards across corpus versions.
    All metrics exact integers until the two final ratios.

    Scale: ONE pass over the corpus computing row-local features,
    then one global aggregate (distinct counts shuffle 32-byte
    digests / small dimension values, never text); the card costs no
    more than exact dedup itself."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_toks"),
        F.sha2(F.lower(F.trim("text")), 256).alias("sha"),
    )
    base = t.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_toks").alias("total_tokens"),
        F.countDistinct("sha").alias("n_unique_texts"),
    )
    rows = [
        ("n_docs", F.col("n_docs").cast("double")),
        ("n_sources", F.col("n_sources").cast("double")),
        ("n_langs", F.col("n_langs").cast("double")),
        ("total_chars", F.col("total_chars").cast("double")),
        ("total_tokens", F.col("total_tokens").cast("double")),
        (
            "n_exact_dup_docs",
            (F.col("n_docs") - F.col("n_unique_texts")).cast("double"),
        ),
        (
            "exact_dup_rate",
            F.round(
                (F.col("n_docs") - F.col("n_unique_texts"))
                / F.col("n_docs").cast("double"),
                6,
            ),
        ),
        (
            "mean_doc_tokens",
            F.round(
                F.col("total_tokens") / F.col("n_docs").cast("double"), 6
            ),
        ),
    ]
    card = None
    for name, expr in rows:
        row = base.select(F.lit(name).alias("metric"), expr.alias("value"))
        card = row if card is None else card.unionByName(row)
    return card


@register("q_llm_ppl_buckets")
def q_llm_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: documents ranked by their
    bigram-LM negative log-likelihood (q_llm_perplexity, rounded
    before ranking) and cut into equal-count head/middle/tail bands —
    the quality gating CCNet applies before sampling pretraining
    data (head = most corpus-like). Reports per (band, source) doc
    counts and char mass, exposing which sources concentrate in the
    noisy tail.

    Scale: reuses the perplexity pass (profile self-join + lookup
    join, corpus-linear); the banding is one global ntile over the
    scored docs — at 100 TB swap the exact tertile for histogram
    banding over avg_nll, the same trade as every other global rank
    here."""
    ppl = q_llm_perplexity(spark, sf_dir).select("doc_id", "avg_nll")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    band = F.ntile(3).over(Window.orderBy("avg_nll", "doc_id"))
    banded = ppl.select(
        "doc_id",
        F.when(band == 1, "head")
        .when(band == 2, "middle")
        .otherwise("tail")
        .alias("band"),
    )
    return (
        banded.join(d, "doc_id")
        .groupBy("band", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
    )


set_oracle(
    "q_llm_ppl_buckets",
    f"""
    WITH ppl AS ({ORACLES["q_llm_perplexity"]}),
    banded AS (
        SELECT doc_id,
               CASE NTILE(3) OVER (ORDER BY avg_nll, doc_id)
                    WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS band
        FROM ppl)
    SELECT b.band, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars
    FROM banded b JOIN documents d ON d.doc_id = b.doc_id
    GROUP BY b.band, d.source
    """,
)


@register(
    "q_llm_near_search",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    p1 AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS p
        FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
        WHERE toks[CAST(u.i AS INT)] = 'hash'),
    p2 AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS p
        FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
        WHERE toks[CAST(u.i AS INT)] = 'scan'),
    hits AS (
        SELECT p1.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(ABS(p2.p - p1.p)) AS BIGINT) AS min_gap
        FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
                       AND ABS(p2.p - p1.p) <= 3
        GROUP BY p1.doc_id)
    SELECT doc_id, n_pairs, min_gap FROM hits
    """,
)
def q_llm_near_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search NEAR('hash', 'scan', k=3): documents where the
    two terms occur within 3 token positions in either order, with
    the co-occurrence pair count and tightest gap — the unordered
    proximity operator search engines expose beside quoted phrases
    (q_llm_phrase_search is the ordered, gap=1 special case).

    Scale: postings-list pruning — positions materialize only for the
    two query terms, the join key is doc_id with a band predicate on
    the position delta; per-doc cost is the product of the two terms'
    occurrence counts (bounded, both filtered), never the token
    stream."""
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    p1 = pos.filter(F.col("tok") == "hash").select(
        "doc_id", F.col("p").alias("pa")
    )
    p2 = pos.filter(F.col("tok") == "scan").select(
        F.col("doc_id").alias("doc_id2"), F.col("p").alias("pb")
    )
    gap = F.abs(F.col("pb") - F.col("pa"))
    return (
        p1.join(
            p2,
            (F.col("doc_id2") == F.col("doc_id")) & (gap <= 3),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(gap).alias("min_gap"),
        )
    )
