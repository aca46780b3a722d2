"""Plan-shape guardrails (SURVEY §4): the optimizations we rely on at
100 TB must actually appear in the physical plan at any scale —
pushdown reaching the parquet scan, dimension joins broadcast, top-k
as TakeOrderedAndProject, aggregation partial+final, and no Python
eval in JVM-only queries.
"""

from __future__ import annotations

from sparkit_learn_spark.plans.inspect import explain_str
from sparkit_learn_spark.registry import all_queries

Q = all_queries()


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
