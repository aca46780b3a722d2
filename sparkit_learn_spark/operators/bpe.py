"""BPE tokenizer training: iterative merge learning over the corpus.

The classic (Sennrich) trainer loop, distributed Spark-style:

  1. ONE corpus pass reduces the text to the word-frequency table —
     everything after that is vocab-sized, not corpus-sized (the
     standard trick that makes BPE training tractable at any corpus
     size: a 100 TB corpus still has a ~10⁷-word vocabulary).
  2. Each iteration: count adjacent symbol pairs weighted by word
     frequency (one aggregation), pull the single best pair to the
     driver (ONE row — count-desc, then lexicographic tiebreak, so
     the merge sequence is deterministic), and apply the merge to
     every word's symbol array with a JVM-side fold (F.aggregate) —
     greedy left-to-right, exactly the reference semantics
     (verified against a pure-Python trainer in tests/test_bpe.py).
  3. The vocab table is localCheckpointed per iteration to keep the
     plan depth constant (n_merges stacked array-folds would
     otherwise grow the plan linearly).

Driver state: the merge list itself (n_merges rows). Everything else
stays distributed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: Word-end marker appended to every word's symbol sequence (Sennrich
#: BPE) so merges distinguish word-final from word-internal pairs.
END_MARKER = "</w>"


def _apply_merge(syms_col, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs via a JVM array fold. F.get (0-based, null-safe) guards the
    empty-accumulator probe — ANSI mode would throw on element_at."""
    ll, rr = F.lit(left), F.lit(right)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == ll)
            & (x == rr),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(ll, rr))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(docs: DataFrame, *, n_merges: int = 10,
                     text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns a driver-built DataFrame (rank, left, right, merged,
    pair_count) — the merge table a BPE tokenizer ships. Deterministic:
    ties in pair count break lexicographically on (left, right).
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    syms = words.select(
        "cnt",
        F.concat(
            F.filter(F.split("word", ""), lambda c: c != ""),
            F.array(F.lit(END_MARKER)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple] = []
    prev = None  # superseded checkpoint, unpersisted once replaced
    for rank in range(n_merges):
        pairs = syms.filter(F.size("syms") >= 2).select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, left, right, left + right, cnt))
        prev, syms = syms, syms.select(
            "cnt", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
        # the new eager checkpoint has materialized; release the
        # superseded one so the loop pins ONE copy in executor
        # storage, not n_merges (same pattern as operators/ids.py)
        prev.unpersist()

    syms.unpersist()  # merge table is driver-built; index no longer needed
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, pair_count long"
    )


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]], *,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge sequence to a corpus: (id, bpe_tokens
    array<string>) — the tokenizer's ENCODE side, one chained JVM fold
    per merge over per-word character arrays. For long merge lists
    prefer batching via mapInPandas; this form is exact and plan-bound
    for the short lists the trainer above produces."""
    out = docs.select(
        id_col,
        F.transform(
            tokens(text_col),
            lambda w: F.concat(
                F.filter(F.split(w, ""), lambda c: c != ""),
                F.array(F.lit(END_MARKER)),
            ),
        ).alias("wsyms"),
    )
    col = F.col("wsyms")
    for left, right in merges:
        ll, rr = F.lit(left), F.lit(right)
        col = F.transform(
            col,
            lambda syms: F.aggregate(
                syms,
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.get(acc, F.size(acc) - 1) == ll)
                    & (x == rr),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(F.concat(ll, rr))),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        )
    return out.select(id_col, F.flatten(col).alias("bpe_tokens"))


def bpe_segment_batched(docs: DataFrame, merges: list[tuple[str, str]], *,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched ENCODE — same output as :func:`bpe_segment`
    (parity asserted in tests/test_bpe.py) but each merge is a plain
    Python scan memoized per UNIQUE word, so cost tracks the batch's
    vocabulary, not its token count. Use this for real merge lists:
    the plan-bound JVM fold's expression tree grows with every merge
    (30 s for 8 merges over sf0.1; this path does it in ~2 s) and
    Zipf's law makes the word cache hit almost always.

    Scale: embarrassingly parallel mapInPandas, no shuffle; the cache
    is per-worker-batch and bounded by batch vocabulary."""
    from ..session import ensure_pkg_on_workers

    ensure_pkg_on_workers(docs.sparkSession)
    merge_list = list(merges)

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is None:
            syms = list(word) + [END_MARKER]
            for left, right in merge_list:
                out, i, n = [], 0, len(syms)
                while i < n:
                    if (i + 1 < n and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            got = cache[word] = syms
        return got

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                doc: list[str] = []
                for w in text.split(" "):
                    doc.extend(encode_word(w, cache))
                toks.append(doc)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "bpe_tokens": toks})

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, bpe_tokens array<string>"
    )
