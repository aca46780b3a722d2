"""Capture .explain("formatted") for queries WITHOUT executing them
(plan shape is host-load independent, so this can run while tests
hog the CPU; timing comes from tools/profile_query.py later).

Usage: python tools/capture_plans.py --tag before --round r11 q_a q_b ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkit_learn_spark.registry import all_queries  # noqa: E402
from sparkit_learn_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r11")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_session("sparkit-plans", master=f"local[{cpus}]",
                        extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plan_dir, exist_ok=True)
    for name in args.queries:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("captured", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
