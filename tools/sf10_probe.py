"""sf10 probe (VERDICT r6 next-steps #8): one 100x scale point (vs
sf0.1) for the dedup/ANN family, run ONE QUERY AT A TIME with a
per-query wall budget and INCREMENTAL json writes — the single-shot
sweep form lost everything when the 50-minute umbrella timeout hit.

The sf10 fixture (tools/gen_scale.py --factor 100) replicates sf0.1
with shifted keys and per-replica doc suffixes: 60M lineitems, 500k
documents, 200k embedding vectors. A query whose wall grows faster
than 100x the sf0.1 time has hit a scale cliff.

Usage: python tools/sf10_probe.py [--only a,b,c] [--budget 600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(REPO, ".scale/sf10")
OUT = os.path.join(REPO, "SCALE_r8_sf10.json")
FACTOR = 100

#: cheap-first so a budget kill loses the least information
DEFAULT_QUERIES = [
    "q_llm_exact_dedup",
    "q_llm_dedup_incremental",
    "q_stream_neardup_dedup",
    "q_llm_ann_ivf",
    "q_llm_ann_ivfpq",
    "q_llm_dedup_recall",
    "q_llm_setjoin_prefix",
    "q_llm_minhash_banded",
    "q_llm_ngram_jaccard",
    "q_llm_ann_lsh",
]


def main() -> None:
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--budget", type=float, default=900.0,
                    help="per-query sf10 wall budget (s)")
    ap.add_argument("--out", default=OUT,
                    help="incremental json output path")
    a = ap.parse_args()
    OUT = a.out
    names = a.only.split(",") if a.only else DEFAULT_QUERIES

    from sparkit_learn_spark.registry import all_queries
    from sparkit_learn_spark.session import get_session

    # r9: the engine's 8g driver default OOM-killed the sf10 graph
    # pipelines (pagerank/ppr at 100x in one JVM); probes need a
    # host-sized heap unless the caller pins one
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    def fresh_session():
        s = get_session(
            "sf10-probe",
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            extra_confs={
                "spark.ui.enabled": "false",
                # 60M-row shuffles: keep partitions ~128MB-shaped.
                # Quadratic-output pair pipelines (near-dup graph at
                # the replica fixture) need MORE partitions so each
                # task's aggregation state fits — override via env.
                "spark.sql.shuffle.partitions": os.environ.get(
                    "SPARK_GRAFT_PROBE_SHUFFLE", "64"),
                # AQE's small-MAP-OUTPUT coalescing is wrong for the
                # quadratic-output pair pipelines: it merges the
                # post-shuffle partitions whose JOIN OUTPUT then
                # explodes, concentrating multi-GB aggregation maps
                # on a handful of tasks (measured: the 100x near-dup
                # sym materialization OOMs a 48g heap with coalescing
                # on, completes with it off).
                "spark.sql.adaptive.coalescePartitions.enabled":
                    "false",
            },
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = fresh_session()
    queries = all_queries()

    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("queries", {})

    def persist():
        with open(OUT, "w") as f:
            json.dump({"small": SMALL, "big": BIG, "factor": FACTOR,
                       "budget_s": a.budget, "queries": results}, f, indent=1)

    from sparkit_learn_spark.catalog import load_table
    for d in (SMALL, BIG):
        load_table(spark, d, "lineitem").count()

    for i, name in enumerate(names, 1):
        if name in results and "error" not in results[name]:
            print(f"[{i}/{len(names)}] {name}: cached", flush=True)
            continue
        # a prior query can take the whole JVM down (the r8 probe lost
        # 13 queries to one driver crash); recreate the session rather
        # than cascading "stopped SparkContext" errors
        try:
            if spark.sparkContext._jsc.sc().isStopped():
                spark = fresh_session()
        except Exception:  # noqa: BLE001
            spark = fresh_session()
        row: dict = {}
        try:
            t0 = time.perf_counter()
            queries[name](spark, SMALL).write.format("noop").mode("overwrite").save()
            row["t_small"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            queries[name](spark, BIG).write.format("noop").mode("overwrite").save()
            row["t_big"] = round(time.perf_counter() - t0, 2)
            row["ratio_vs_linear"] = round(
                row["t_big"] / (FACTOR * row["t_small"]), 3)
        except Exception as e:  # noqa: BLE001
            row["error"] = f"{type(e).__name__}: {e}"[:300]
            # r9: a budget/OOM kill can leave a context that still
            # reports isStopped()=False while every job fails — the
            # r9 graph probe cascaded 6 dead-session errors that way.
            # After ANY error, tear the session down hard so the next
            # query provably starts fresh.
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            try:
                from pyspark.sql import SparkSession
                SparkSession._instantiatedSession = None
                SparkSession._activeSession = None
            except Exception:  # noqa: BLE001
                pass
            spark = fresh_session()
        results[name] = row
        persist()
        print(f"[{i}/{len(names)}] {name}: {row}", flush=True)
        # r9: queries pin localCheckpoint blocks they never unpersist
        # (the returned frames are discarded here, but the JVM RDDs
        # survive until ContextCleaner sees them garbage-collected).
        # Force a GC cycle between queries so one session's storage
        # doesn't accumulate across the sweep — without this, query
        # N's spill-read buffers OOMed on query N-1's leftover blocks.
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)
        except Exception:  # noqa: BLE001
            pass
    spark.stop()


if __name__ == "__main__":
    main()
