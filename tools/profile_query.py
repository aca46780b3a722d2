"""Per-query profiler for optimization rounds: times one or more
queries with the noop sink (guide §1.4), labels jobs (§1.5), and dumps
`.explain("formatted")` to plans/<round>/<query>_<tag>.txt.

Usage:
    python tools/profile_query.py [--tag before --round r11 --runs 2] q_a q_b ...

Prints one JSON line per query: {"query", "build_s", "exec_s" (best),
"runs": [..]}. Plans are written only when --tag is given.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkit_learn_spark.registry import all_queries  # noqa: E402
from sparkit_learn_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after)")
    ap.add_argument("--round", default="r11")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("sparkit-profile", master=f"local[{cpus}]",
                        extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    from sparkit_learn_spark.catalog import load_table
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "orders").count()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round)
    for name in args.queries:
        runs = []
        build_best = float("inf")
        df = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            tb = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            build_best = min(build_best, t0 - tb)
            spark.sparkContext.setJobDescription(None)
        if args.tag and df is not None:
            os.makedirs(plan_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        print(json.dumps({"query": name, "build_s": round(build_best, 3),
                          "exec_s": min(runs), "runs": runs}))
        sys.stdout.flush()
        # mirror bench.py's per-query state release (r11)
        try:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(True)
        except Exception:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
