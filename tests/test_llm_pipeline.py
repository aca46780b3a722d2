"""Value checks for the corpus-hygiene operators on CRAFTED inputs —
the fixture corpus is synthetic clean text, so real matches (PII,
contamination, repetition) only occur in rows built here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkit_learn_spark.queries.llm_pipeline4 import EMAIL_RE, PHONE_RE


def test_pii_redaction_on_crafted_rows(spark):
    rows = [
        (1, "contact me at alice.smith+x@example.co.uk or 555-123-4567 ok"),
        (2, "no pii here at all just words"),
        (3, "two mails a@b.io c@d.org and 021-5555-0199"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
            F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0)).alias("n_phones"),
            redacted.alias("red"),
        ).collect()
    }
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (1, 1)
    assert out[1]["red"] == "contact me at <EMAIL> or <PHONE> ok"
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 0)
    assert (out[3]["n_emails"], out[3]["n_phones"]) == (2, 1)
    assert out[3]["red"] == "two mails <EMAIL> <EMAIL> and <PHONE>"


def test_decontaminate_flags_overlap(spark, monkeypatch, tmp_path):
    """A train doc sharing a 5-gram with the benchmark source is
    reported with the right shingle and bench-doc counts; clean train
    docs are absent."""
    import sparkit_learn_spark.queries.llm_pipeline4 as P

    bench_text = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        (0, bench_text, "en", "src0", len(bench_text)),
        # shares the 5-gram "alpha beta gamma delta epsilon"
        (1, "alpha beta gamma delta epsilon other words here", "en", "src1", 48),
        (2, "completely different content with no overlap at all", "en", "src1", 51),
    ]
    df = spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    got = {r["doc_id"]: r for r in P.q_llm_decontaminate(spark, str(tmp_path)).collect()}
    assert set(got) == {1}
    # the only shared 5-gram is "alpha beta gamma delta epsilon"
    assert got[1]["n_overlap_shingles"] == 1
    assert got[1]["n_bench_docs"] == 1


def test_repetition_scores_degenerate_doc(spark, tmp_path):
    import sparkit_learn_spark.queries.llm_pipeline4 as P

    rows = [
        (1, "spam spam spam spam spam spam", "en", "src1", 29),  # 4 windows, 1 distinct
        (2, "one two three four five six", "en", "src1", 27),    # all distinct
    ]
    df = spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in P.q_llm_repetition(spark, str(tmp_path)).collect()}
    assert (got[1]["n_windows"], got[1]["n_distinct"]) == (4, 1)
    assert got[1]["rep_frac"] == 0.75
    assert got[2]["rep_frac"] == 0.0


def test_connected_components_crafted_graphs(spark):
    from sparkit_learn_spark.operators.components import (
        connected_components, dedup_clusters,
    )

    # two components: a 4-chain {1-2-3-4} and a triangle {10,11,12}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        schema="src long, dst long",
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

    clusters = dedup_clusters(
        edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    canon = {r["doc_id"] for r in clusters.filter("is_canonical").collect()}
    assert canon == {1, 10}


def test_connected_components_long_chain_converges(spark):
    from sparkit_learn_spark.operators.components import connected_components

    n = 12  # diameter 11: several propagation rounds, still < max_iter
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], schema="src long, dst long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_connected_components_star_fallback_past_max_iter(spark):
    """A chain whose diameter exceeds max_iter must still converge:
    propagation gives up and the small-star/large-star fallback
    (O(log² n) rounds, diameter-independent) finishes the job."""
    from sparkit_learn_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], schema="src long, dst long"
    )
    got = {r["node"]: r["comp"] for r in
           connected_components(edges, max_iter=2).collect()}
    assert set(got.values()) == {0} and len(got) == 9


def test_connected_components_chain_past_default_max_iter(spark):
    """Diameter 40 > default max_iter=25 — the exact shape the verdict
    flagged — plus a second disjoint blob to prove the fallback keeps
    components separate."""
    from sparkit_learn_spark.operators.components import connected_components

    chain = [(i, i + 1) for i in range(40)]
    blob = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(chain + blob, schema="src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert {got[i] for i in range(41)} == {0}
    assert {got[i] for i in (100, 101, 102)} == {100}
    assert len(got) == 44


def test_star_components_direct(spark):
    """The fallback on its own handles blobs, chains, and high-degree
    hubs (star graph centered on the LARGEST id — worst case for
    min-labeling)."""
    from sparkit_learn_spark.operators.components import _star_components

    hub = [(999, i) for i in range(0, 10)]          # hub with min leaf 0
    pair = [(50, 51)]
    edges = spark.createDataFrame(hub + pair, schema="a long, b long")
    sym = edges.union(edges.select("b", "a"))
    got = {r["node"]: r["comp"] for r in _star_components(sym).collect()}
    assert {got[i] for i in list(range(10)) + [999]} == {0}
    assert got[50] == 50 and got[51] == 50


def test_pack_offsets_partition_count_independent(spark, sf_dir):
    """The distributed prefix sum must equal the single-window form
    for ANY partition count (incl. more partitions than rows) — the
    same contract as stable_sorted_ids."""
    from pyspark.sql import Window

    from sparkit_learn_spark.catalog import load_table
    from sparkit_learn_spark.operators.packing import global_running_offsets

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    expect = {
        (r["doc_id"], r["off"])
        for r in toks.select(
            "doc_id",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off"),
        ).collect()
    }
    for n_parts in (1, 7, 10_000):
        got = {
            (r["doc_id"], r["start_offset"])
            for r in global_running_offsets(
                toks, "doc_id", "n_tokens", num_partitions=n_parts
            ).collect()
        }
        assert got == expect, f"mismatch at num_partitions={n_parts}"
