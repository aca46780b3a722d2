"""Plan-shape guardrails (SURVEY §4): the optimizations we rely on at
100 TB must actually appear in the physical plan at any scale —
pushdown reaching the parquet scan, dimension joins broadcast, top-k
as TakeOrderedAndProject, aggregation partial+final, and no Python
eval in JVM-only queries.
"""

from __future__ import annotations

import pytest

from sparkit_learn_spark.plans.inspect import explain_str
from sparkit_learn_spark.registry import all_queries

Q = all_queries()


@pytest.fixture(autouse=True, scope="module")
def _cache_free_session(spark):
    """Plan-shape assertions need a cache-free session: frames
    persisted by earlier test modules can be substituted into these
    plans as InMemoryTableScan, hiding PushedFilters/scan shapes and
    making the assertions order-dependent."""
    spark.catalog.clearCache()
    yield


def test_scan_pruned_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = explain_str(Q["q_scan_pruned"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # ReadSchema carries only the 4 projected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_shipdate" in read_schema


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = explain_str(Q["q_join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = explain_str(Q["q_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_final_agg_no_python(spark, sf_dir):
    plan = explain_str(Q["q_agg_q1"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filter_like_pushdown(spark, sf_dir):
    plan = explain_str(Q["q_filter_like"](spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "StringStartsWith" in pushed


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in explain_str(Q["q_join_semi"](spark, sf_dir))
    assert "LeftAnti" in explain_str(Q["q_join_anti"](spark, sf_dir))


def test_embed_cosine_dedup_no_nl_join(spark, sf_dir):
    """The semantic near-dup operator must run candidates-then-verify
    (LSH bucket join + exact-dot verify), never a broadcast nested-loop
    all-pairs join — the O(n²) shape is dead at 100 TB."""
    plan = explain_str(Q["q_llm_embed_cosine_dedup"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_has_no_single_partition_window(spark, sf_dir):
    """Vocabulary id assignment must stay distributed: no Window at
    all in the plan (stable_sorted_ids uses range partition + offset
    repair, the zipWithIndex shape)."""
    plan = explain_str(Q["q_ml_vocab"](spark, sf_dir))
    assert "Window" not in plan


def test_edit_distance_text_join_not_forced_broadcast(spark, sf_dir):
    """Document TEXT must not be force-broadcast (a 100 TB documents
    table never fits an executor): the query builds plain joins and
    lets size-based planning decide. Guarded at the source level —
    the physical plan legitimately picks broadcast for the tiny
    fixture, which is exactly the point of not forcing it."""
    import inspect

    from sparkit_learn_spark.queries import llm_pipeline2

    src = inspect.getsource(llm_pipeline2.q_llm_edit_distance)
    assert "F.broadcast" not in src


def test_whole_stage_codegen_on_flagship(spark, sf_dir):
    # AQE's formatted plan hides codegen spans pre-execution; the
    # codegen explain mode lists the compiled subtrees directly.
    plan = explain_str(Q["q_agg_q1"](spark, sf_dir), mode="codegen")
    assert "WholeStageCodegen" in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The bucketed-table join (pre-shuffled at write time) must run
    join AND per-key aggregate with ZERO Exchange — the amortized
    co-located join strategy for repeated 100 TB fact joins."""
    df = Q["q_join_bucketed"](spark, sf_dir)
    df.collect()  # executedPlan only final after an action under AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_tpch_q10_broadcasts_nation_only(spark, sf_dir):
    """Q10: the 25-row nation dim broadcasts; the fact-side joins stay
    shuffle joins (at 100 TB neither orders/lineitem nor customer may
    broadcast) — and both scan filters reach the parquet reader."""
    plan = explain_str(Q["q_tpch_q10"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan  # returnflag filter pushed to scan


def test_funnel_single_user_shuffle_no_python(spark, sf_dir):
    """The funnel is one conditional-min aggregate pass: no Python
    eval, no join chain (one per-stage join would be 4 shuffles)."""
    plan = explain_str(Q["q_evt_funnel"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_transitions_window_is_user_partitioned(spark, sf_dir):
    """The lead() window must partition by user_id — a global window
    here would funnel the whole event stream through one task."""
    plan = explain_str(Q["q_evt_transitions"](spark, sf_dir))
    assert "Window" in plan
    assert "partitionBy=[], " not in plan.replace("PartitionBy", "partitionBy")


def test_corpus_prep_quality_stage_pushes_filter(spark, sf_dir):
    """corpus_prep's final plan is a checkpoint scan (packing
    materializes eagerly), so pushdown is asserted on its quality
    stage — q_llm_doc_quality IS that stage's filter: the n_chars
    bound must reach the parquet scan so unviable docs never leave
    storage."""
    plan = explain_str(Q["q_llm_doc_quality"](spark, sf_dir))
    assert "PushedFilters" in plan and "n_chars" in plan


def test_correlated_agg_decorrelates_to_join(spark, sf_dir):
    """The correlated scalar subquery must decorrelate: the physical
    plan is aggregate + equi-join, never a per-row subquery loop."""
    plan = explain_str(Q["q_sub_correlated_agg"](spark, sf_dir))
    assert "Join" in plan
    assert "Subquery" not in plan or "SubqueryExec" not in plan


def test_skew_join_under_powerlaw_key(spark, tmp_path):
    """Adversarial skew: 95% of a 200k-row fact carries ONE key. The
    explicit salted join must (a) spread the hot key across salt
    partitions — no single task holds the hot key whole — and
    (b) return exactly the plain join's rows. AQE's runtime skew
    split is asserted enabled (the first-line defense; salting is the
    guardrail when even split partitions overwhelm a task)."""
    import pandas as pd

    from sparkit_learn_spark.operators.skew import salted_join

    n, hot = 200_000, 7
    pdf = pd.DataFrame({
        "k": [hot] * (n * 95 // 100) + list(range(100, 100 + n * 5 // 100)),
        "v": range(n),
    })
    large = spark.createDataFrame(pdf).repartition(8)
    small = spark.createDataFrame(
        [(hot, "hotdim")] + [(100 + i, f"d{i}") for i in range(50)],
        "k long, name string",
    )
    got = salted_join(large, small, "k", n_salts=8).toPandas()
    expect = large.join(small, "k").toPandas()
    key = ["k", "v"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[["k", "v", "name"]],
        expect.sort_values(key).reset_index(drop=True)[["k", "v", "name"]],
    )
    # the hot key's rows really are spread over multiple salt buckets
    from pyspark.sql import functions as F
    salted = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns], F.lit(42)),
               F.lit(8)).cast("int"),
    )
    n_buckets = (salted.filter(F.col("k") == hot)
                 .select("_salt").distinct().count())
    assert n_buckets == 8
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_edit_distance_single_levenshtein_evaluation(spark, sf_dir):
    """The banded levenshtein must appear EXACTLY ONCE in the physical
    plan: a filter over the aliased column gets re-inlined per
    conjunct by Catalyst (no cross-expression CSE for this function —
    measured 3.7x at sf1), which is why the query uses the
    array→filter(λ)→explode single-reference form. A second
    occurrence in the plan means that structure regressed."""
    plan = explain_str(Q["q_llm_edit_distance"](spark, sf_dir))
    assert plan.count("levenshtein") == 1, plan


def test_unpivot_has_no_extra_exchange(spark, sf_dir):
    """UNPIVOT is a projection/generate — the only exchange allowed in
    the plan is the upstream aggregate's partial->final shuffle."""
    import re

    plan = explain_str(Q["q_agg_unpivot"](spark, sf_dir))
    # count physical NODES ("(n) Exchange" detail headers), not string
    # occurrences — each node appears twice in a formatted plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan
    assert "Expand" in plan  # the unpivot generate itself


def test_tpch_q6_full_pushdown_and_pruned_read(spark, sf_dir):
    """Q6 is the pure scan query: every predicate must reach the
    parquet scan and the read schema must carry exactly the 4 columns
    the query touches — at 100 TB this is the difference between a
    bandwidth-bound scan and reading the whole fact table."""
    plan = explain_str(Q["q_tpch_q6"](spark, sf_dir))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert col not in read_schema, read_schema


def test_tpch_q8_broadcasts_dims_no_sort_merge(spark, sf_dir):
    """Q8's five dimension joins (part, nation x2 incl. the
    region-restricted role, plus AQE-sized supplier/customer at
    fixture scale) must not degenerate into sort-merge joins."""
    plan = explain_str(Q["q_tpch_q8"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime bloom-filter join pruning — the 100 TB lever for a
    selective-dim ⋈ huge-fact shuffle join: Spark builds a bloom
    filter from the filtered build side and applies might_contain to
    the probe side's scan, killing most fact rows before the
    exchange. Off by default at fixture scale only because the
    application side is below the 10 GB scan threshold — this pins
    the conf recipe (all three are runtime-settable SQL confs) and
    asserts the filter actually injects."""
    from sparkit_learn_spark.catalog import load_table
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000)
        li = load_table(spark, sf_dir, "lineitem")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority")
             .agg(F.sum("l_extendedprice").alias("s")))
        plan = explain_str(j)
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_except_all_is_counted_aggregate_not_join(spark, sf_dir):
    """EXCEPT ALL must execute as the counted-aggregate + generate
    plan (one value shuffle, map-side combined) — never as a join.
    A join-based rewrite would shuffle both sides AND break down on
    skewed keys; the counted form is skew-safe by construction."""
    import re

    plan = explain_str(Q["q_set_except_all"](spark, sf_dir))
    assert "Join" not in plan, plan[:1500]
    assert "Generate" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1500]


def test_tpch_q9_broadcasts_dims(spark, sf_dir):
    """Q9's part/supplier/nation edges must all be broadcast — the
    only sort-merge-worthy shuffle is lineitem ⋈ orders."""
    plan = explain_str(Q["q_tpch_q9"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_tpch_q11_threshold_no_driver_collect(spark, sf_dir):
    """Q11's global-share threshold must arrive as a broadcast scalar
    (one-row join), never a Python-side collect; and the comparison
    runs in integer cents (no float in the filter)."""
    plan = explain_str(Q["q_tpch_q11"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_attribution_single_user_window(spark, sf_dir):
    """Last-touch attribution is ONE user-partitioned window pass —
    no self-join of events against events."""
    plan = explain_str(Q["q_evt_attribution"](spark, sf_dir))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


def test_scd2_single_window_no_self_join(spark, sf_dir):
    plan = explain_str(Q["q_scd2_history"](spark, sf_dir))
    assert "Join" not in plan  # lead() only — any join means the O(n²) form
    assert plan.count("Window") >= 1


def test_snapshot_diff_single_scan(spark, sf_dir):
    """The conditional-aggregation rewrite reads lineitem ONCE — a
    second scan would mean the two-snapshot self-join came back."""
    plan = explain_str(Q["q_snapshot_diff"](spark, sf_dir))
    # formatted explain prints each scan twice (tree + detail) —
    # count distinct scan locations instead
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan


def test_merge_upsert_is_single_full_outer(spark, sf_dir):
    plan = explain_str(Q["q_merge_upsert"](spark, sf_dir))
    assert "FullOuter" in plan
    # target + source read once each (scan locations, not text dupes)
    assert plan.count("Location: InMemoryFileIndex") == 2


def test_variant_no_python_eval(spark, sf_dir):
    """VARIANT parse + typed extraction stays entirely JVM-side."""
    plan = explain_str(Q["q_json_variant"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rolling_median_single_window_no_python(spark, sf_dir):
    """One Window node computes all three frame columns (collect_list,
    avg share the identical spec); no Python eval anywhere."""
    plan = explain_str(Q["q_win_rolling_median"](spark, sf_dir))
    assert plan.count("Window") >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the frame spec reaches the plan (ROWS BETWEEN 6 PRECEDING)
    assert "-6" in plan or "6 PRECEDING" in plan.upper()


def test_retrieval_query_side_never_shuffles(spark, sf_dir):
    """Cross-table retrieval: the only exchange allowed on the query
    stream is the documented round-robin spread — no hash/range
    exchange (the corpus ships via broadcast variables, invisible to
    the plan)."""
    plan = explain_str(Q["q_llm_retrieval_topk"](spark, sf_dir))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_ewma_single_window_pass(spark, sf_dir):
    plan = explain_str(Q["q_ts_ewma"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Window") >= 1


def test_gini_no_python_single_partition_free(spark, sf_dir):
    """Gini: pure JVM windows + aggregate; must NOT degenerate into a
    global single-partition window (every window spec carries the
    segment partition key)."""
    plan = explain_str(Q["q_agg_gini"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan


def test_basket_rules_broadcasts_brand_dim_no_python(spark, sf_dir):
    """Association rules: the part->brand dimension join must
    broadcast (both for the order-brand build and the support
    lookups); everything stays JVM-side."""
    plan = explain_str(Q["q_ml_basket_rules"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_seq_pattern_no_window_no_self_join(spark, sf_dir):
    """Sequence patterns run as ONE hash agg to journey strings plus
    row-local regex — no window, no join (the funnel-query alternative
    would window per user)."""
    plan = explain_str(Q["q_evt_seq_pattern"](spark, sf_dir))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_median_single_exchange_before_window(spark, sf_dir):
    """Weighted median (r11 shape): the cumulative RANGE-frame window
    consumes raw fact rows directly — the former (group, value)
    histogram barely collapsed near-unique cent prices yet paid its
    own exchange before the window re-partitioned by group. The plan
    must have NO aggregate below the window (tree section: nothing
    between Window and the scan but sort/exchange/project) and the
    final group-by must ride the window's partitioning."""
    plan = explain_str(Q["q_agg_weighted_median"](spark, sf_dir))
    assert "Window" in plan
    tree = plan.split("\n\n")[0]
    below_window = tree[tree.index("Window"):]
    assert "HashAggregate" not in below_window, (
        "an aggregate crept back below the cumulative window:\n" + tree)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ols2_single_shuffle_single_agg_pass(spark, sf_dir):
    """Closed-form OLS: all ten moments accumulate in ONE partial+
    final aggregate — exactly one exchange in the whole plan, no
    second pass over the fact."""
    plan = explain_str(Q["q_stat_ols2"](spark, sf_dir))
    # formatted explain prints each node twice (tree + detail header);
    # count tree nodes only
    assert plan.count("Exchange (") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_yoy_and_decompose_window_over_aggregated_grain(spark, sf_dir):
    """Period-over-period + seasonal decomposition: the unpartitioned
    window must sit ABOVE the month/day-grain aggregate (window input
    is dimension-sized), and the fact-side aggregate is partial+final."""
    for name in ("q_ts_yoy", "q_ts_decompose"):
        plan = explain_str(Q[name](spark, sf_dir))
        assert "Window" in plan
        assert plan.count("HashAggregate") >= 2, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_dedup_is_anti_join_on_digest(spark, sf_dir):
    """Incremental dedup: history check must compile to a LeftAnti
    join (no except/distinct-subtract detour), shuffling digests only."""
    plan = explain_str(Q["q_llm_dedup_incremental"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spatial_knn_no_cartesian_cellgrid_joins(spark, sf_dir):
    """Adaptive spatial kNN: both phases must be CELL equi-joins
    (SortMerge/ShuffledHash on (cx, cy)) with the distance predicate
    as a post-join filter — a CartesianProduct or nested-loop theta
    join is the quadratic shape this operator exists to avoid."""
    plan = explain_str(Q["q_join_spatial_knn"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_keyword_extract_df_join_is_broadcast(spark, sf_dir):
    """Per-doc TF-IDF keywords: the document-frequency dictionary must
    join back by BROADCAST (vocabulary-sized), and the top-3 window
    partitions by doc — no global sort of the term-grain table."""
    plan = explain_str(Q["q_llm_keyword_extract"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_phrase_search_filters_before_position_join(spark, sf_dir):
    """Positional phrase search: postings-list pruning — the token
    filters must sit BELOW the (doc, position) join, so only the two
    query terms' positions ever reach the join (no full-index
    self-join)."""
    plan = explain_str(Q["q_llm_phrase_search"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both sides of the join are generated+filtered before joining:
    # the equality filter on the exploded token appears at least twice
    assert plan.count("hash") >= 1  # term literal reaches a Filter node
    assert "Filter" in plan


def test_proration_windows_at_customer_grain(spark, sf_dir):
    """Largest-remainder proration: the remainder-rank window must
    partition by nation over CUSTOMER-grain rows (post-aggregate),
    with nation totals and bump counts arriving by broadcast."""
    plan = explain_str(Q["q_fin_proration"](spark, sf_dir))
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_registers_partial_final_no_python(spark, sf_dir):
    """Portable HLL: the register build must be a partial+final MAX
    aggregate at bucket grain (the mergeable-sketch shape) with no
    Python evaluation anywhere in the plan."""
    plan = explain_str(Q["q_sketch_hll_portable"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_markov_stationary_no_python_no_cartesian_blowup(spark, sf_dir):
    """Markov repeated squaring: five k²-grain join-aggregates — the
    plan must stay JVM-side and never degrade to a nested-loop join
    over the transition matrix."""
    plan = explain_str(Q["q_evt_markov_stationary"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_multitouch_attribution_bucketless_theta_guard(spark, sf_dir):
    """U-shaped attribution: the touch join must not compile to a
    CartesianProduct — the user-key equi component must drive the
    join, with the 24h band as a post-join or join-side filter."""
    plan = explain_str(Q["q_evt_multitouch_attribution"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kendall_pairwise_is_day_grain_broadcast(spark, sf_dir):
    """Kendall tau-b: the pairwise concordance join runs at DAY grain
    after both sides aggregate — the plan must broadcast one side
    (dimension-sized) and never nest a cartesian over fact rows."""
    plan = explain_str(Q["q_stat_kendall_tau"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_matrix_profile_broadcast_nested_loop_on_arrays(spark, sf_dir):
    """Matrix profile: the all-pairs stage must be a broadcast
    nested-loop over the tiny window-array table (days² condition
    evals), NOT a position-exploded shuffle join, and the per-window
    min must be a partial+final aggregate (map-side combine), not a
    row_number window over the pair set."""
    plan = explain_str(Q["q_ts_matrix_profile"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    # the per-window min(struct) is a two-stage partial+final
    # aggregate (sort-based: struct buffers aren't hash-supported);
    # r10's overflow-guard checkpoint moved the day-grain groupBy's
    # HashAggregates out of this plan, so count aggregates generically
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kruskal_rank_histogram_value_domain(spark, sf_dir):
    """Kruskal-Wallis: ranks must come from the value-domain
    histogram (aggregate before the cumulative window), so the plan
    shows aggregation feeding the window, and the group totals join
    must broadcast."""
    plan = explain_str(Q["q_stat_kruskal_wallis"](spark, sf_dir))
    assert "HashAggregate" in plan and "Window" in plan
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_auc_fairness_partitions_by_source(spark, sf_dir):
    """Per-group AUC: the rank window must PARTITION BY source (no
    global single-partition sort over the histogram) and stay
    JVM-side."""
    from pyspark.sql import functions as F  # noqa: F401

    df = Q["q_ml_auc_fairness"](spark, sf_dir)
    plan = explain_str(df)
    # The WINDOW SPEC itself must partition by source — a bare
    # "source in plan" is satisfied by any reference to the column
    # (ADVICE r6). Match windowspecdefinition(source#NN, ...).
    import re

    assert re.search(r"windowspecdefinition\(source#\d+", plan), (
        "no window spec partitioned by source in plan"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_chi2_features_vocab_grain_aggregates(spark, sf_dir):
    """Chi-square feature selection: label totals must BROADCAST into
    the vocab-grain table and the top-20 must be a TakeOrdered, not a
    global sort."""
    plan = explain_str(Q["q_ml_chi2_features"](spark, sf_dir))
    assert "Broadcast" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lsh_bucket_stats_no_python_no_cartesian(spark, sf_dir):
    """LSH bucket audit: signature build and bucket folds must stay
    JVM-side (md5/min/collect built-ins), with no cartesian stage."""
    plan = explain_str(Q["q_llm_lsh_bucket_stats"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_group_uses_window_group_limit(spark, sf_dir):
    """rank<=k predicates over a window must trigger Spark's
    WindowGroupLimit pushdown (partial per-partition top-k BEFORE the
    shuffle) — without it every group's full row set shuffles to the
    window sort, which is the difference between k rows and all rows
    per group at 100 TB."""
    df = Q["q_win_topk_group"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_ann_index_probe_scan_is_partition_pruned(spark, tmp_path):
    """The persisted-index probe must READ ONLY the probed lists'
    code partitions: the parquet scan of {index}/codes must carry a
    list_id PartitionFilter (hive pruning), not scan-all-then-filter
    — at 100 TB this is the difference between a probe that reads
    √n_lists of the corpus codes and one that reads all of them."""
    from sparkit_learn_spark.catalog import load_table
    from sparkit_learn_spark.operators.ann_index import write_index
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    idx = str(tmp_path / "idx")
    write_index(emb, idx, seed=42, source_fingerprint="p")
    codes = (spark.read.parquet(f"{idx}/codes")
             .filter(F.col("list_id").isin([0, 1, 2])))
    plan = explain_str(codes)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "list_id" in pf, f"list_id not in partition filters: {pf}"
