"""BPE merge learning vs a pure-Python reference trainer."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.functions.text import tokens
from sparkit_learn_spark.operators.bpe import END_MARKER, bpe_segment, learn_bpe_merges


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference (Sennrich-style) trainer on a local word-count dict:
    greedy left-to-right merge application, count-desc +
    lexicographic tie ordering."""
    vocab: dict[tuple, int] = {}
    for w, c in word_counts.items():
        key = tuple(list(w) + [END_MARKER])
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for rank in range(n_merges):
        pc: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, l + r, c))
        new: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + cnt
        vocab = new
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wc = {
        r["word"]: r["cnt"]
        for r in docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt")).collect()
    }
    expected = _ref_bpe(wc, 6)
    got = [tuple(r) for r in learn_bpe_merges(docs, n_merges=6).collect()]
    assert got == expected


def test_bpe_segment_round_trip(spark):
    """Encoding with the learned merges reproduces the reference
    greedy segmentation, and concatenating tokens restores the text
    (merge application never loses characters)."""
    rows = [(1, "low lower lowest low low"), (2, "new newer newest new"),
            (3, "widest wide wider low new")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merge_df = learn_bpe_merges(docs, n_merges=8)
    merges = [(r["left"], r["right"]) for r in merge_df.collect()]
    seg = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_segment(docs, merges).collect()}
    for doc_id, text in rows:
        joined = "".join(seg[doc_id]).replace(END_MARKER, " ").rstrip()
        assert joined == text
    # at least one multi-char merge must have been learned on this
    # repetitive fixture, and it must appear in the segmentation
    learned = [l + r for l, r in merges]
    assert any(len(t) > 1 for t in learned)
    flat = [t for toks in seg.values() for t in toks]
    assert any(t in flat for t in learned)


def test_bpe_segment_reconstructs_corpus(spark, sf_dir):
    """ENCODE is lossless: per doc, concatenating bpe_tokens and
    dropping end markers reproduces the original text's characters
    (whitespace removed) — merges only group symbols, never drop."""
    from sparkit_learn_spark.catalog import load_table
    from sparkit_learn_spark.operators.bpe import (END_MARKER, bpe_segment,
                                                   learn_bpe_merges)

    d = load_table(spark, sf_dir, "documents").limit(30)
    merges = [(r["left"], r["right"])
              for r in learn_bpe_merges(d, n_merges=6).collect()]
    assert len(merges) > 0
    seg = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_segment(d, merges).collect()}
    for r in d.select("doc_id", "text").collect():
        joined = "".join(seg[r["doc_id"]]).replace(END_MARKER, "")
        assert joined == r["text"].replace(" ", ""), r["doc_id"]


def test_bpe_segment_query_deterministic(spark, sf_dir):
    from sparkit_learn_spark.registry import all_queries

    q = all_queries()["q_llm_bpe_segment"]
    a = q(spark, sf_dir).toPandas()
    b = q(spark, sf_dir).toPandas()
    assert len(a) > 0 and a.equals(b)
    assert (a["freq"].to_numpy()[:-1] >= a["freq"].to_numpy()[1:]).all()


def test_bpe_segment_batched_parity(spark, sf_dir):
    """The Arrow-batched encoder produces EXACTLY the JVM fold's
    output on the same merges (the two paths must be swappable)."""
    from sparkit_learn_spark.catalog import load_table
    from sparkit_learn_spark.operators.bpe import (bpe_segment,
                                                   bpe_segment_batched,
                                                   learn_bpe_merges)

    d = load_table(spark, sf_dir, "documents").limit(40)
    merges = [(r["left"], r["right"])
              for r in learn_bpe_merges(d, n_merges=6).collect()]
    a = {r["doc_id"]: list(r["bpe_tokens"])
         for r in bpe_segment(d, merges).collect()}
    b = {r["doc_id"]: list(r["bpe_tokens"])
         for r in bpe_segment_batched(d, merges).collect()}
    assert a == b
