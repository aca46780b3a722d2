"""LLM-pipeline wave 6: model-quality measurement — per-document
perplexity under the corpus bigram LM (the CCNet-style quality
signal) and a confusion-matrix evaluation of the language-ID
classifier against gold labels. Both exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ..registry import ORACLES, register, set_oracle


@register(
    "q_llm_perplexity",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    bg AS (
      SELECT doc_id, toks[CAST(i - 1 AS INT)] AS w1, toks[CAST(i AS INT)] AS w2
      FROM t, unnest(range(2, len(toks) + 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    uni AS (SELECT COUNT(DISTINCT tok) AS v
            FROM (SELECT unnest(toks) AS tok FROM t)),
    c AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
    cw AS (SELECT w1, w2, cnt,
                  SUM(cnt) OVER (PARTITION BY w1) AS cnt_w1
           FROM c)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-ln((cw.cnt + 1.0) / (cw.cnt_w1 + (SELECT v FROM uni)))), 6)
             AS avg_nll,
           ROUND(exp(AVG(-ln((cw.cnt + 1.0) / (cw.cnt_w1 + (SELECT v FROM uni))))), 4)
             AS ppl
    FROM bg b JOIN cw ON b.w1 = cw.w1 AND b.w2 = cw.w2
    GROUP BY b.doc_id
    """,
)
def q_llm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus's own add-one-smoothed
    bigram LM: avg negative log-prob of the doc's bigrams and its exp
    (ppl) — the classical quality-filter signal (low-ppl docs read
    like the corpus; high-ppl docs are noise/boilerplate/other-lang).

    Scale: the profile is built ONCE from the same bigram extraction
    the docs are scored with (self-join on (w1,w2) — both sides
    shuffle-partitioned by the pair, co-partitioned by AQE); the
    follower-mass window partitions by w1 (vocabulary fan-out, not
    corpus size); V broadcasts as one row. Scoring is a map-side
    lookup join + one aggregate per doc."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> named_struct('w1', toks[i - 1], 'w2', toks[i]))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c = bg.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    cw = c.withColumn("cnt_w1", F.sum("cnt").over(Window.partitionBy("w1")))
    v = t.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    nll = -F.log((F.col("cnt") + F.lit(1.0)) / (F.col("cnt_w1") + F.col("v")))
    return (
        bg.join(cw, ["w1", "w2"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
            F.round(F.exp(F.avg(nll)), 4).alias("ppl"),
        )
    )


@register(
    "q_llm_lang_id_eval",
    # the classifier's full oracle is embedded as a CTE so this eval's
    # oracle stays exactly the oracled classifier + a gold join
    oracle=None,  # set below after module import resolves lang_id
)
def q_llm_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the NB language-ID classifier against the
    documents table's gold ``lang`` labels: (true_lang, pred_lang, n)
    — the evaluation loop a corpus-curation pipeline runs before
    trusting a filter model.

    Scale: the classifier's own plan (vocab×lang grid, bounded by
    vocabulary not corpus) plus one join back to gold labels on
    doc_id and a count over a lang² key space."""
    from .llm_pipeline2 import q_llm_lang_id

    pred = q_llm_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    gold = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    return (
        pred.join(gold, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


# register the eval oracle by wrapping the classifier's registered
# oracle as a CTE (kept textually identical so the two can never
# drift apart); ORACLES is read directly because this module imports
# while the queries package itself is still loading
set_oracle(
    "q_llm_lang_id_eval",
    f"""
    WITH pred AS ({ORACLES["q_llm_lang_id"]})
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY 1, 2
    """,
)


@register(
    "q_llm_bpe_pairs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    w AS (SELECT unnest(toks) AS word FROM t),
    chars AS (
      SELECT word, string_split(word, '') AS cs
      FROM w WHERE len(word) >= 2
    ),
    pairs AS (
      SELECT cs[CAST(i AS INT)] || cs[CAST(i + 1 AS INT)] AS pair
      FROM chars, unnest(range(1, len(cs))) AS u(i)
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 50
    """,
)
def q_llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent character-pair counts over the corpus — the
    statistic one BPE merge iteration is chosen from (tokenizer
    training's inner loop; iterating = re-running over the merged
    vocabulary). Count-then-lexicographic ordering, deterministic
    cross-engine.

    Scale: per-word character pairs come from one generator expression
    (split + transform/sequence — no shuffle until the count); the
    aggregation key space is bounded by alphabet², so the shuffle is
    tiny regardless of corpus size and combines map-side. The
    full-merge-loop variant would checkpoint the re-tokenized corpus
    per iteration, same plan per step."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(tokens("text")).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(50)
    )


@register("q_llm_bpe_learn")  # rows-only: iterative trainer, not SQL-expressible;
                              # merge-sequence parity vs a pure-Python reference
                              # trainer asserted in tests/test_bpe.py
def q_llm_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 BPE merges learned from the corpus — the tokenizer-
    TRAINING loop itself (q_llm_bpe_pairs is one iteration's
    statistic; this runs the whole greedy loop). One corpus pass
    builds the word-frequency table; every iteration after that is
    vocab-sized: pair-count aggregation → single-row argmax to the
    driver → JVM array-fold merge application, re-checkpointed so the
    plan stays constant-depth. Deterministic: count-desc +
    lexicographic tiebreak (see operators/bpe.py)."""
    from ..operators.bpe import learn_bpe_merges

    return learn_bpe_merges(load_table(spark, sf_dir, "documents"), n_merges=10)
