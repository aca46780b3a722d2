"""sf10 probe of the persisted-ANN ingest path (VERDICT r9 item #5):
build the IVF-PQ index over 99% of the sf10 embeddings once, append
the remaining 1% as an incremental batch, and record

  t_build    full historical build wall (train + encode + write)
  t_append   frozen-quantizer batch append wall
  recall_appended / recall_rebuilt   probe recall@5 vs the exact
             cosine top-5, for the appended index and for a fresh
             full-corpus rebuild — the append must not cost recall

The 100 TB ingest story made empirical: append wall must be batch-
sized (<< build wall), and probing the appended index must match the
rebuild within noise.

Usage: python tools/sf10_append_probe.py [--out SCALE_r10_append.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

BIG = os.path.join(REPO, ".scale/sf10")


def recall_at_k(spark, got, emb, k=5):
    """Mean overlap of got's (qid, nid) top-k with the exact cosine
    top-k (self-excluded, matching probe_index semantics)."""
    from pyspark.sql import functions as F

    from sparkit_learn_spark.operators.similarity import cosine_retrieve

    gp = got.select("qid", "nid").toPandas()
    qids = sorted(gp["qid"].unique().tolist())
    panel = emb.filter(F.col("vec_id").isin(qids))
    ex = cosine_retrieve(panel, emb, k=k + 1,
                         max_broadcast_rows=300_000).toPandas()
    ex = ex[ex["qid"] != ex["nid"]]
    ex = (ex.sort_values(["qid", "sim", "nid"],
                         ascending=[True, False, True])
          .groupby("qid").head(k))
    got_pairs = set(map(tuple, gp.values))
    exact_pairs = set(map(tuple, ex[["qid", "nid"]].values))
    return len(got_pairs & exact_pairs) / (len(qids) * k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SCALE_r10_append.json"))
    a = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from sparkit_learn_spark.catalog import load_table
    from sparkit_learn_spark.operators.ann_index import (
        append_to_index,
        load_meta,
        probe_index,
        write_index,
    )
    from sparkit_learn_spark.session import get_session

    spark = get_session(
        "sf10-append-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={"spark.ui.enabled": "false",
                     "spark.sql.shuffle.partitions": "64"})
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, BIG, "embeddings")
    hist = emb.filter(F.col("vec_id") % 100 != 0)
    batch = emb.filter(F.col("vec_id") % 100 == 0)
    n_hist, n_batch = hist.count(), batch.count()

    work = tempfile.mkdtemp(prefix="sf10_append_")
    idx = os.path.join(work, "idx")
    idx_full = os.path.join(work, "idx_full")
    out: dict = {"n_hist": n_hist, "n_batch": n_batch}
    try:
        t0 = time.perf_counter()
        write_index(hist, idx, seed=42, source_fingerprint="hist")
        out["t_build"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        meta = append_to_index(batch, idx, expected_fingerprint="hist",
                               new_fingerprint="full")
        out["t_append"] = round(time.perf_counter() - t0, 2)
        out["append_over_build"] = round(out["t_append"] / out["t_build"], 4)
        assert meta["n_vectors"] == n_hist + n_batch

        panel = emb.orderBy("vec_id").limit(64)
        got = probe_index(spark, idx, panel, k=5, refine=4, corpus=emb,
                          expected_fingerprint="full")
        out["recall_appended"] = round(recall_at_k(spark, got, emb), 4)

        t0 = time.perf_counter()
        write_index(emb, idx_full, seed=42, source_fingerprint="full")
        out["t_rebuild_full"] = round(time.perf_counter() - t0, 2)
        got2 = probe_index(spark, idx_full, panel, k=5, refine=4,
                           corpus=emb, expected_fingerprint="full")
        out["recall_rebuilt"] = round(recall_at_k(spark, got2, emb), 4)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        with open(a.out, "w") as f:
            json.dump({"big": BIG, "probe": out}, f, indent=1)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
