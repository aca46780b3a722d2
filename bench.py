"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced via the noop sink (full computation, no driver
collect cost) after a warm-up of the parquet footer reads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkit_learn_spark.registry import all_queries
from sparkit_learn_spark.session import get_session

#: Headline set — one representative per operator family.
HEADLINE = [
    "q_agg_q1",          # scan + filter + partial/final agg (flagship)
    "q_scan_pruned",     # pushdown + column pruning
    "q_join_shuffle",    # large equi join
    "q_join_multiway",   # 6-table TPC-H Q5-style chain
    "q_join_asof",       # union-style as-of join (window)
    "q_agg_cube",        # grouping-set expansion
    "q_win_running",     # running-frame window
    "q_topk",            # TakeOrderedAndProject
    "q_stream_session",  # session windows (batch mode)
    "q_udf_pandas",      # Arrow-vectorized Python path
    "q_ml_tfidf",        # explode + double agg + broadcast join
    "q_llm_exact_dedup", # sha2 hash dedup
    "q_llm_cosine_topk", # O(N²) vector math (2k×2k at sf0.1)
    "q_llm_minhash_dedup",  # MinHash LSH similarity join (MLlib)
    "q_llm_minhash_banded", # hand-rolled banded MinHash + exact verify
    "q_llm_simhash_dedup",  # 64-bit sketch + band join
    "q_llm_ngram_jaccard",  # exact Jaccard via inverted shingle index
    "q_llm_lang_id",        # NB language-ID (profile + score + argmax)
    "q_llm_ann_ivf",        # IVF approximate neighbors
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("sparkit-bench", master=f"local[{cpus}]",
                        extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: JVM/codegen/parquet-footer costs land here, not on q1
    from sparkit_learn_spark.catalog import load_table
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "orders").count()

    timings: dict[str, float] = {}
    for name in names:
        df = queries[name](spark, sf_dir)  # build plan (cheap)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
