"""Physical-configuration invariance: results must be bit-identical
under different shuffle-partition counts and with AQE on/off — the
determinism contract that lets the same query run on a laptop and a
1000-executor cluster and hash identically. A query that fails these
is relying on partition order (the collect_set class of bug) or on a
specific physical plan."""

from __future__ import annotations

import pytest

from sparkit_learn_spark.registry import all_queries
from sparkit_learn_spark.testing import normalize

# one representative per execution shape: agg, shuffle join, window,
# salted join, set-op, sampling, cumulative-distinct, id assignment,
# plus the closing-wave shapes: bitset build (bounded collect_list
# aggregation), frame-bounded collect_list, banded hash self-join
REPRESENTATIVES = [
    "q_agg_q1",
    "q_join_shuffle",
    "q_join_skew_salted",
    "q_win_topk_group",
    "q_set_intersect_all",
    "q_llm_reservoir_sample",
    "q_win_cume_distinct",
    "q_ids_stable",
    "q_join_bloom_prune",
    "q_win_rolling_median",
    "q_mm_phash_neardup",
]


def _rows(spark, name, sf_dir):
    return normalize(all_queries()[name](spark, sf_dir).toPandas())


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_shuffle_partition_invariance(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, name, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_aqe_invariance(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        a = _rows(spark, name, sf_dir)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        b = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert a == b
