"""Similarity search over embedding columns.

``cosine_topk`` is the exact baseline: a guarded broadcast fast path
(candidate matrix broadcast once — only while it provably fits) that
FAILS OVER to ``cosine_topk_sharded``, the distributed exact path
(candidates sharded, queries routed shard-by-shard via a cogrouped
Arrow join — no driver collect, no full-table broadcast).
``ann_lsh_neighbors`` and ``ivf_topk`` are the approximate scale
paths; ``ivf_topk`` keeps only the n_lists×d centroid matrix on the
driver — vectors stay distributed, co-partitioned by list id.

For unit vectors, euclidean² = 2 − 2·cos, so a euclidean radius r
corresponds to cosine ≥ 1 − r²/2.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve via __globals__
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import dot

#: Above this many vectors the broadcast candidate matrix stops being
#: safe (100k × 64 float64 ≈ 50 MB per executor) and cosine_topk
#: routes to the sharded path instead of OOMing the driver.
DEFAULT_MAX_BROADCAST_ROWS = 100_000

#: Below this many candidates a single stable argsort beats the O(n)
#: partition-select's extra passes (measured at sf0.1: select cost
#: +0.4 s on 2k candidates; at sf1/20k select wins 2.8x). Both
#: branches return identical rows, so the cutover is purely a
#: constant-factor choice.
ARGSORT_CUTOVER = 4096


def _spread(df: DataFrame) -> DataFrame:
    """Guarantee at least ``defaultParallelism`` partitions ahead of an
    expensive per-row compute stage (a BLAS matmul per Arrow batch):
    a small parquet input arrives in 1-2 row-group partitions, which
    would serialize the scoring onto 1-2 cores (measured at sf1: the
    20k-vector corpus reads as 2 partitions → 43.6 s; spread → ~14 s).
    At corpus scale the input already has more partitions than cores,
    so this is a structural no-op there — the repartition only fires
    exactly when the data is small enough for its shuffle to be free.
    (r11: logic shared with catalog.spread_scan, which generalizes it
    to the text/multimodal scan paths.)"""
    from ..catalog import spread_scan

    return spread_scan(df)


def _topk_rows(scored: DataFrame, k: int) -> DataFrame:
    """Global deterministic top-k per query over (qid, nid, sim)."""
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "sim", "rn")
    )


def cosine_topk(emb: DataFrame, *, k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding",
                max_broadcast_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
                n_shards: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors per vector: (qid, nid, sim, rn).

    Row-count guard: ≤ ``max_broadcast_rows`` vectors take the
    broadcast fast path (one bounded collect of the candidate matrix,
    one float64 BLAS matmul per Arrow batch — the reference's
    blocked-matrix execution model [ref: splearn/rdd.py ArrayRDD.dot —
    per-block X·A with a broadcast local matrix · C:M]); above it the
    call FAILS OVER to :func:`cosine_topk_sharded`, which never
    materializes the corpus anywhere.

    Determinism: similarities are rounded to 6dp BEFORE ranking with
    an id tiebreak, so ranking matches any double-precision oracle —
    and both paths return bit-identical results.
    """
    import numpy as np
    import pandas as pd

    # bounded-scan guard: limit(n+1).count() stops reading after
    # max_broadcast_rows+1 rows instead of scanning the full lineage
    # (a full count() would double input reads on the common path)
    if emb.limit(max_broadcast_rows + 1).count() > max_broadcast_rows:
        return cosine_topk_sharded(emb, k=k, id_col=id_col, vec_col=vec_col,
                                   n_shards=n_shards)

    cand = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vb")).collect()
    nids = np.array([r["nid"] for r in cand], dtype=np.int64)
    C = np.array([np.asarray(r["vb"], dtype=np.float64) for r in cand])
    order = np.argsort(nids)  # tiebreak needs id-sorted candidates
    nids, C = nids[order], C[order]
    spark = emb.sparkSession
    b_nids = spark.sparkContext.broadcast(nids)
    b_C = spark.sparkContext.broadcast(C)

    # r12 (guide §4.2/§5): score in QUERY CHUNKS into one preallocated
    # buffer instead of materializing the whole batch's n-wide score
    # matrix per call. A fresh ~100 MB numpy result per task is served
    # by mmap, and concurrent map/unmap churn across 32 workers
    # serializes on kernel page handling (measured on this host: the
    # identical GEMM 73 s fresh-alloc vs 9.7 s into a reused buffer,
    # paired in-process; worker-side instrumentation put 98-110 s of a
    # 117 s sf1 task in that one matmul). Chunking bounds the buffer to
    # q_chunk x n and `out=` reuses it across chunks — the dot
    # products, 6dp rounding, and per-row selection are unchanged, so
    # output is bit-identical.
    Q_CHUNK = 128

    def topk_batches(batches):
        cn, cm = b_nids.value, b_C.value
        cmT = np.ascontiguousarray(cm.T)
        n = len(cn)
        s_buf = np.empty((Q_CHUNK, n))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Qb = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            qids_b = pdf["qid"].to_numpy()
            rows = []
            for lo in range(0, len(Qb), Q_CHUNK):
                Q = Qb[lo:lo + Q_CHUNK]
                S = s_buf[:len(Q)]
                np.matmul(Q, cmT, out=S)
                np.round(S, 6, out=S)
                for qi, qid in enumerate(qids_b[lo:lo + Q_CHUNK]):
                    sims = S[qi].copy()
                    # self-exclusion: candidates are id-sorted, so the
                    # query's own slot is findable in O(log n)
                    self_pos = np.searchsorted(cn, qid)
                    if self_pos < n and cn[self_pos] == qid:
                        sims[self_pos] = -np.inf
                    # top-k selection, branched on candidate count: the
                    # O(n) partition-select (everything >= the k-th
                    # value, then stable-sort the tiny boundary subset)
                    # wins at sf1 scale (72 s -> 26 s measured) but its
                    # extra passes LOSE to one stable argsort below a
                    # few thousand candidates (0.4 s at sf0.1, measured
                    # r4). Both branches produce identical rows:
                    # candidates are id-sorted and the sort is stable,
                    # so ties break by lower nid either way.
                    if n <= k or n <= ARGSORT_CUTOVER:
                        idx = np.nonzero(np.isfinite(sims))[0]
                    else:
                        kth = np.partition(sims, n - k)[n - k]
                        idx = np.nonzero(sims >= kth)[0]
                    top = idx[np.argsort(-sims[idx], kind="stable")[:k]]
                    for rn, j in enumerate(top, start=1):
                        rows.append((int(qid), int(cn[j]), float(sims[j]), rn))
            yield pd.DataFrame(rows, columns=["qid", "nid", "sim", "rn"])

    # r12 (VERDICT r11 #6): size the Python fan-out by ROWS, not by
    # core count — the corpus size n is already known from the collect
    # above. A blind spread to defaultParallelism put ~63 rows in each
    # of 32 mapInPandas tasks at sf0.1; each cold task pays a Python
    # worker fork + numpy/pandas import for one sub-ms matmul, which
    # is exactly the 32-core-slower-than-8-core inversion the r11
    # driver run measured (8/32 ratio 0.14). ~256 rows per task keeps
    # the matmul batched. This path only ever sees <= max_broadcast_rows
    # vectors (larger inputs failed over to the sharded path above), so
    # the repartition is unconditional — no df.rdd partition probe
    # (which forces a full plan analysis driver-side; VERDICT r11 #9).
    n_parts = min(
        emb.sparkSession.sparkContext.defaultParallelism,
        max(2, -(-len(nids) // 256)),
    )
    q = emb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("vb")) \
        .repartition(n_parts)
    return q.mapInPandas(topk_batches, schema="qid long, nid long, sim double, rn long")


def cosine_topk_sharded(emb: DataFrame, *, k: int = 5, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_shards: int | None = None,
                        n_query_shards: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors with NO driver collect and NO
    full-table broadcast — the >10⁶-vector brute-force shape.

    BOTH sides are hash-sharded: candidates into ``n_shards`` groups,
    queries into ``n_query_shards`` (default = n_shards) groups, and
    every (q_shard, c_shard) grid cell is one cogrouped-Arrow task
    scoring a Q_cell × C_cell BLAS matmul. Per-task memory is
    n/n_query_shards + n/n_shards vectors — O(n/shards), NOT the full
    query set — so at a fixed memory budget both knobs scale linearly
    with the corpus. Shuffle volume: queries n_shards× + candidates
    n_query_shards× — O(n·shards) rows each way. Per-cell top-k
    bounds the intermediate to n·n_shards·k rows; a final window
    merges the global top-k. Compute stays the unavoidable exact
    O(n²) matmul, spread over shards² cells.

    Output is bit-identical to the broadcast path (same 6dp rounding
    before ranking, same nid tiebreak).
    """
    import numpy as np
    import pandas as pd

    if n_shards is None:
        # r11 (guide §2.2): scale-adaptive shard count. The fixed 16
        # built a 256-cell grid even for a 2k-vector corpus — 256
        # cogrouped Python calls of ~125×125 rows where boundary
        # overhead dwarfed the matmuls (1.46 s vs 0.85 s at 4 shards,
        # bit-identical output — per-cell top-k then global merge is
        # invariant to the grid). Target ~500 rows per shard side,
        # floor 2 (grid ≥ 4 cells), cap 16 — the old default — so any
        # corpus past 8k rows behaves exactly as before and truly
        # huge corpora keep the documented "raise n_shards at a fixed
        # memory budget" contract. The count is bounded: it stops
        # scanning at cap·target+1 rows, never the full corpus.
        probe = emb.limit(16 * 500 + 1).count()
        n_shards = max(2, min(16, -(-probe // 500)))
    n_qs = n_query_shards or n_shards
    cands = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("vb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("c_shard"),
    ).withColumn(
        "q_shard", F.explode(F.array(*[F.lit(i) for i in range(n_qs)]))
    )
    queries = emb.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("vb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_qs)).cast("int").alias("q_shard"),
    ).withColumn(
        "c_shard", F.explode(F.array(*[F.lit(i) for i in range(n_shards)]))
    )

    def score_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "nid": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        Q = np.array([np.asarray(v, dtype=np.float64) for v in left["vb"]])
        C = np.array([np.asarray(v, dtype=np.float64) for v in right["vb"]])
        nids = right["nid"].to_numpy()
        order = np.argsort(nids)  # id-sorted -> stable tiebreak
        nids, C = nids[order], C[order]
        S = np.round(Q @ C.T, 6)
        qids = left["qid"].to_numpy()
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            sims = S[qi]
            idx = np.nonzero(nids != qid)[0]
            top = idx[np.argsort(-sims[idx], kind="stable")[:k]]
            out_q.extend([qid] * len(top))
            out_n.extend(nids[top])
            out_s.extend(sims[top])
        return pd.DataFrame({"qid": np.asarray(out_q, dtype=np.int64),
                             "nid": np.asarray(out_n, dtype=np.int64),
                             "sim": np.asarray(out_s, dtype=np.float64)})

    scored = (
        queries.groupBy("q_shard", "c_shard")
        .cogroup(cands.groupBy("q_shard", "c_shard"))
        .applyInPandas(score_shard, schema="qid long, nid long, sim double")
    )
    return _topk_rows(scored, k)


def ann_lsh_neighbors(emb: DataFrame, *, radius: float = 1.0,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      bucket_length: float = 0.5, num_hash_tables: int = 4,
                      seed: int = 42, k: int | None = None,
                      bucket_cap: int = 512) -> DataFrame:
    """Approximate neighbor pairs within a euclidean radius:
    (vec_id_a, vec_id_b, dist). Candidates come from LSH buckets, not
    the cross product.

    Hand-rolled random-projection LSH (r8) replacing MLlib's
    ``approxSimilarityJoin``: the MLlib join enumerates EVERY
    bucket-coincident pair before the distance filter, so its work
    tracks true neighbor density — the one registry entry the r7 sf10
    probe had to ABORT (>7.7× of linear on the dup-amplified fixture).
    This version bounds the work structurally:

      1. per table t: bucket = floor(v · r_t / bucket_length) with
         unit-gaussian r_t (the BucketedRandomProjectionLSH hash
         family, seeded);
      2. the CANDIDATE side of each (table, bucket) is capped at
         ``bucket_cap`` members (deterministic: lowest vec_id —
         the viral-bucket cap discipline of q_llm_ngram_jaccard's
         df cap), so distance computations are ≤ tables·cap·n
         regardless of how dense a bucket gets; probes are never
         dropped, only their candidate fan-in is bounded.
         ``bucket_cap=None`` disables the cap for callers whose
         correctness needs FULL in-bucket enumeration (the
         embed-cosine dedup's recall-1.0 contract) — then the work is
         Σ|bucket|² BLAS FLOPs, quadratic in the densest bucket, and
         the caller owns that trade;
      3. pairs dedup across tables via min(dist) group, then the
         radius filter and the ``k``-nearest-per-probe cap.

    Recall within the radius is exact while every bucket fits the
    cap (the sf0.1 fixture's max bucket is far below 512) and
    degrades gracefully on viral buckets instead of blowing up the
    join. ``k`` bounds the OUTPUT to the k nearest per probe — the
    ≤ k·n contract IVF keeps."""
    import numpy as np

    d = len(emb.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    R = rng.standard_normal((num_hash_tables, d))
    R /= np.linalg.norm(R, axis=1, keepdims=True)

    v = F.col("v")
    entries = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    tables = []
    for t in range(num_hash_tables):
        r_lit = F.array(*[F.lit(float(x)) for x in R[t]])
        proj = F.aggregate(F.zip_with(v, r_lit, lambda a, b: a * b),
                           F.lit(0.0), lambda acc, x: acc + x)
        tables.append(F.struct(F.lit(t).alias("t"),
                               F.floor(proj / F.lit(bucket_length))
                               .alias("bucket")))
    hashed = entries.select(
        "vec_id", "v", F.explode(F.array(*tables)).alias("h")
    ).select("vec_id", "v", F.col("h.t").alias("t"),
             F.col("h.bucket").alias("bucket"))

    from pyspark.sql import Window

    import pandas as pd

    r2 = float(radius) * float(radius)
    chunk = 4096
    if k is not None and bucket_cap is not None and bucket_cap > chunk:
        raise ValueError("k-capped mode requires bucket_cap <= 4096")

    def _score(ids, X):
        """Score one complete (table, bucket): probes = all members,
        candidates = first ``bucket_cap`` by vec_id (all when None);
        BLAS matmuls over chunk×chunk blocks (the semdedup per-cell
        pattern), YIELDING one output frame per probe chunk so a dense
        bucket's pair output streams out in bounded Arrow batches
        instead of materializing at once (the r8 sf10 Arrow-OOM fix)."""
        n_c = len(X) if bucket_cap is None else min(len(X), bucket_cap)
        for lo in range(0, len(X), chunk):
            P = X[lo:lo + chunk]
            p2 = (P ** 2).sum(1)
            out_a, out_b, out_d = [], [], []
            for co in range(0, n_c, chunk):
                C = X[co:min(co + chunk, n_c)]
                cid = ids[co:co + len(C)]
                d2 = p2[:, None] - 2.0 * (P @ C.T) + (C ** 2).sum(1)[None, :]
                np.maximum(d2, 0.0, out=d2)
                if k is None:
                    ii, jj = np.nonzero(d2 <= r2)
                    keep = ids[lo + ii] != cid[jj]
                    ii, jj = ii[keep], jj[keep]
                    out_a.append(ids[lo + ii])
                    out_b.append(cid[jj])
                    out_d.append(np.sqrt(d2[ii, jj]))
                else:  # single candidate block (cap <= chunk)
                    for r in range(len(P)):
                        row = d2[r]
                        js = np.nonzero(row <= r2)[0]
                        js = js[cid[js] != ids[lo + r]]
                        if len(js) > k:
                            js = js[np.argsort(row[js], kind="stable")[:k]]
                        out_a.append(np.full(len(js), ids[lo + r]))
                        out_b.append(cid[js])
                        out_d.append(np.sqrt(row[js]))
            if out_a:
                yield pd.DataFrame({
                    "vec_id_a": np.concatenate(out_a).astype(np.int64),
                    "vec_id_b": np.concatenate(out_b).astype(np.int64),
                    "dist": np.concatenate(out_d).astype(np.float64),
                })

    def score_stream(batches):
        """mapInPandas over (t, bucket)-repartitioned, key-sorted rows:
        buffer one bucket at a time (ids + vectors only), score it,
        and stream the pair output — per-task memory is one bucket's
        matrix plus one probe chunk's pairs, never the full result.
        Bucket boundaries are found vectorized per Arrow batch (no
        per-row Python)."""
        key = None
        id_slices: list = []
        v_slices: list = []

        def flush():
            if not id_slices:
                return
            ids = np.concatenate(id_slices).astype(np.int64)
            vecs = np.concatenate(v_slices)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            X = np.array([np.asarray(x, np.float64) for x in vecs[order]])
            yield from _score(ids, X)

        for pdf in batches:
            t_arr = pdf["t"].to_numpy()
            b_arr = pdf["bucket"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            vs = pdf["v"].to_numpy()
            change = np.flatnonzero(
                (t_arr[1:] != t_arr[:-1]) | (b_arr[1:] != b_arr[:-1])
            ) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            for s, e in zip(starts, ends):
                kk = (t_arr[s], b_arr[s])
                if kk != key:
                    yield from flush()
                    id_slices, v_slices = [], []
                    key = kk
                id_slices.append(vids[s:e])
                v_slices.append(vs[s:e])
        yield from flush()

    pairs = (
        hashed.repartition("t", "bucket")
        .sortWithinPartitions("t", "bucket", "vec_id")
        .mapInPandas(score_stream,
                     schema="vec_id_a long, vec_id_b long, dist double")
    )
    out = (
        pairs.groupBy("vec_id_a", "vec_id_b")  # dedup across tables
        .agg(F.round(F.min("dist"), 6).alias("dist"))
        .filter(F.col("dist") <= radius)
    )
    if k is not None:
        rn = F.row_number().over(
            Window.partitionBy("vec_id_a").orderBy("dist", "vec_id_b")
        )
        out = out.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")
    return out


def auto_ivf_params(n: int) -> tuple[int, int]:
    """(n_lists, n_probe) sized from the corpus count: n_lists ≈ √n
    (balances probe fan-out against per-list matmul size — each task
    scores ~n/n_lists vectors), clamped to [4, 4096]; n_probe ≈
    √n_lists, floor 4.

    The probe schedule is O(√n_lists), NOT a fixed fraction of the
    lists: a fractional default (r4 used ⅓) scores a constant share
    of the ENTIRE corpus per query — at 10⁹ vectors that is brute
    force with extra steps. √n_lists keeps the scanned share shrinking
    as the corpus grows (n^(1/4)/n^(1/2) of lists → scanned fraction
    ~n^(-1/4)) while still probing every list the quantizer puts real
    neighbor mass in: recall ≥ 0.6 at the auto default is calibrated
    and asserted on a CLUSTERED mixture-of-Gaussians fixture
    (tests/test_ml.py::test_ivf_topk_autosized_recall_and_balance) —
    clustered data is the workload IVF exists for; uniform random
    vectors (the quantizer's theoretical worst case, where no
    sublinear index can beat a corpus scan) are covered by the
    pinned-parameter recall test instead."""
    import math

    n_lists = max(4, min(4096, round(math.sqrt(max(n, 1)))))
    n_probe = max(4, min(n_lists, round(math.sqrt(n_lists))))
    return n_lists, n_probe


def ivf_list_balance(assign: DataFrame, list_col: str = "list_id") -> dict:
    """Index-quality metric for an IVF assignment: per-list size
    spread. A healthy quantizer has cv (stddev/mean) well under 1;
    cv ≥ 2 or max_frac near 1 means one list absorbs the corpus and
    probes degrade toward brute force — resize n_lists or re-seed.
    One aggregate job; returns {n_lists, min, max, mean, cv, max_frac}.
    """
    sizes = assign.groupBy(list_col).count()
    r = sizes.agg(
        F.count("*").alias("n_lists"),
        F.min("count").alias("mn"),
        F.max("count").alias("mx"),
        F.avg("count").alias("avg"),
        F.stddev_pop("count").alias("sd"),
        F.sum("count").alias("total"),
    ).first()
    return {
        "n_lists": r["n_lists"],
        "min": r["mn"],
        "max": r["mx"],
        "mean": r["avg"],
        "cv": (r["sd"] / r["avg"]) if r["avg"] else 0.0,
        "max_frac": (r["mx"] / r["total"]) if r["total"] else 0.0,
    }


#: Quantizer train samples up to this many rows run Lloyd's iterations
#: driver-side in one vectorized numpy pass — the faiss approach:
#: coarse-quantizer training only ever sees a BOUNDED sample (50/list,
#: capped upstream), and below this size MLlib's per-iteration job
#: overhead dominates the actual math by ~50x (measured at sf0.1:
#: ~1.0 s of KMeans jobs vs ~15 ms of numpy on 2k×64). Driver memory
#: is O(cap·d) ≈ 16 MB at d=64, independent of corpus size.
DRIVER_TRAIN_CAP = 32_768


def _collect_bounded_sample(train: DataFrame):
    """Training sample as a local float64 matrix — bounded BY
    CONSTRUCTION: the limit() bakes DRIVER_TRAIN_CAP into the plan, so
    this collect can never exceed the cap no matter what the caller
    passed. O(cap·d) driver memory, independent of corpus size."""
    import numpy as np

    rows = train.select("v").limit(DRIVER_TRAIN_CAP).collect()
    return np.array([np.asarray(r["v"], dtype=np.float64) for r in rows])


def _lloyd(X, k: int, *, seed: int, iters: int = 10):
    """Vectorized numpy Lloyd's k-means over a LOCAL sample matrix:
    random init from the sample, empty clusters re-seeded. Returns
    min(k, len(X)) × d centroids."""
    import numpy as np

    rng = np.random.default_rng(seed)
    kk = min(k, len(X))
    C = X[rng.choice(len(X), size=kk, replace=False)].copy()
    x2 = (X ** 2).sum(1)
    for _ in range(iters):
        d2 = x2[:, None] - 2.0 * (X @ C.T) + (C ** 2).sum(1)[None, :]
        lab = d2.argmin(1)
        for j in range(kk):
            m = lab == j
            C[j] = X[m].mean(0) if m.any() else X[rng.integers(len(X))]
    return C


def _train_coarse_quantizer(train: DataFrame, n_lists: int, *,
                            seed: int, n_train: int):
    """n_lists×d centroid ndarray for the IVF coarse quantizer.

    ``train`` is the (already sample-capped) training slice with a
    ``v`` array column. Small samples train driver-side (numpy
    Lloyd's, 10 iterations — see _collect_bounded_sample/_lloyd);
    larger ones fall back to distributed MLlib KMeans. Either way only
    the centroid matrix reaches the caller."""
    import numpy as np

    if n_train <= DRIVER_TRAIN_CAP:
        return _lloyd(_collect_bounded_sample(train), n_lists, seed=seed)

    from pyspark.ml.clustering import KMeans

    feat = train.withColumn("features",
                            array_to_vector(F.col("v").cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="features",
                initMode="random", maxIter=5).fit(feat)
    return np.array(km.clusterCenters())


def ivf_topk(emb: DataFrame, *, k: int = 5, n_lists: int | None = None,
             n_probe: int | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors:
    (qid, nid, sim, rn) — fully distributed index, NO driver-side
    vector matrix.

    Index: KMeans coarse quantizer (n_lists centroids) assigns every
    vector to one list; the corpus stays a DataFrame co-partitioned by
    list_id. Search: each query computes its n_probe nearest centroids
    from the BROADCAST CENTROIDS ONLY (n_lists×d — the single piece of
    driver state, independent of corpus size) and is routed to those
    lists; a cogrouped Arrow join scores one Q×M matmul per list and
    keeps a per-list top-k; a final window merges the global top-k.

    Scale: shuffle = corpus once (by list_id) + queries n_probe× (with
    their d-dim vectors); every task holds one list (~n/n_lists
    vectors). ``n_lists=None`` (the default) auto-sizes to ≈√n via
    ``auto_ivf_params`` — one count() job — so no call site depends on
    a magic constant surviving a 100× scale-up; pass explicit values
    to pin an index layout. ``ivf_list_balance`` diagnoses quantizer
    skew. Recall vs the exact baseline is asserted in tests/test_ml.py
    for both explicit and auto-sized parameters.
    """
    import numpy as np
    import pandas as pd

    import math as _math

    n_total: int | None = None  # counted at most ONCE per call
    if n_lists is None:
        n_total = emb.count()
        n_lists, auto_probe = auto_ivf_params(n_total)
        if n_probe is None:
            n_probe = auto_probe
    elif n_probe is None:
        n_probe = max(4, min(n_lists, round(_math.sqrt(n_lists))))

    # array<double> at the source: lossless upcast for float inputs,
    # one cast instead of per-stage numpy conversions downstream;
    # _spread keeps the route matmul off a 1-2 partition parquet read
    vec = _spread(emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    # quantizer quality barely affects recall (n_probe does), and every
    # k-means iteration over the corpus is a full pass -> train on a
    # BOUNDED sample (faiss does the same); assignment below still
    # covers every vector. Small samples run Lloyd's driver-side
    # (numpy), big ones distributed MLlib — see _train_coarse_quantizer.
    n_train_cap = max(50 * n_lists, 4096)
    if n_total is None:  # explicit n_lists path — the one count this call pays
        n_total = vec.count()
    train = vec
    if n_total > n_train_cap:
        train = vec.sample(fraction=min(1.0, n_train_cap / n_total), seed=seed)
    centers = _train_coarse_quantizer(
        train, n_lists, seed=seed, n_train=min(n_total, n_train_cap)
    )  # n_lists × d — the single piece of driver state
    b_centers = emb.sparkSession.sparkContext.broadcast(centers)

    def route(batches):
        """ONE pass over the corpus emits BOTH index sides: each
        vector's corpus-assignment row (role=0, its nearest list) and
        its n_probe query-probe rows (role=1, the lists it searches).
        Fusing assignment and probing — they rank against the same
        broadcast centroid matrix — halves the Python scan stages and
        feeds a single shuffle instead of a two-sided cogroup.
        Vectors are emitted as array<double>: a lossless upcast for
        any input element type (a hardcoded float would silently
        downcast double embeddings and could reorder the top-k)."""
        C = b_centers.value
        c2 = (C ** 2).sum(1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, np.float64) for v in pdf["v"]])
            # rank by -2·x·c + |c|² — the |x|² term is constant per
            # row; one BLAS matmul, no batch×lists×dim broadcast temp
            d2 = -2.0 * (X @ C.T) + c2[None, :]
            near = np.argpartition(d2, n_probe - 1, axis=1)[:, :n_probe] \
                if n_probe < d2.shape[1] else \
                np.broadcast_to(np.arange(d2.shape[1]), d2.shape).copy()
            lab = np.take_along_axis(
                near, np.take_along_axis(d2, near, 1).argmin(1, keepdims=True), 1
            ).ravel()  # assignment = argmin — always among the probed lists
            ids = pdf["vid"].to_numpy()
            vs = pdf["v"].to_numpy()
            yield pd.DataFrame({
                "list_id": np.concatenate([lab, near.ravel()]).astype("int32"),
                "role": np.concatenate([
                    np.zeros(len(ids)), np.ones(near.size)]).astype("int8"),
                "id": np.concatenate([ids, np.repeat(ids, near.shape[1])]),
                "v": np.concatenate([vs, np.repeat(vs, near.shape[1])]),
            })

    routed = vec.mapInPandas(
        route, schema="list_id int, role tinyint, id long, v array<double>"
    )

    def score_list(pdf: pd.DataFrame) -> pd.DataFrame:
        corp = pdf[pdf["role"] == 0]
        qry = pdf[pdf["role"] == 1]
        if len(corp) == 0 or len(qry) == 0:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "nid": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        Q = np.array([np.asarray(v, np.float64) for v in qry["v"]])
        M = np.array([np.asarray(v, np.float64) for v in corp["v"]])
        nids = corp["id"].to_numpy()
        order = np.argsort(nids)
        nids, M = nids[order], M[order]
        S = np.round(Q @ M.T, 6)
        qids = qry["id"].to_numpy()
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            sims = S[qi]
            idx = np.nonzero(nids != qid)[0]
            top = idx[np.argsort(-sims[idx], kind="stable")[:k]]
            out_q.extend([qid] * len(top))
            out_n.extend(nids[top])
            out_s.extend(sims[top])
        return pd.DataFrame({"qid": np.asarray(out_q, dtype=np.int64),
                             "nid": np.asarray(out_n, dtype=np.int64),
                             "sim": np.asarray(out_s, dtype=np.float64)})

    scored = (
        routed.groupBy("list_id")
        .applyInPandas(lambda _, pdf: score_list(pdf),
                       schema="qid long, nid long, sim double")
    )
    return _topk_rows(scored, k)


def ivf_pq_topk(emb: DataFrame, *, k: int = 5, n_lists: int | None = None,
                n_probe: int | None = None, m_subspaces: int = 8,
                n_codes: int = 256, refine: int = 4,
                id_col: str = "vec_id", vec_col: str = "embedding",
                seed: int = 42) -> DataFrame:
    """IVF-PQ approximate top-k cosine neighbors with EXACT re-rank:
    (qid, nid, sim, rn) — the compressed-index ANN shape for corpora
    whose raw vectors are too big to shuffle.

    Why it exists beside :func:`ivf_topk`: plain IVF still shuffles
    the full d-dim float vectors into the scoring stage — 512 B/vector
    at d=64 float64, i.e. the scoring shuffle IS the corpus. Product
    quantization stores each vector as ``m_subspaces`` one-byte
    codebook indices (8 B/vector here, a 64× cut): split d into m
    subspaces, k-means each subspace of the coarse RESIDUAL
    (x − centroid(list(x))) into ``n_codes`` codes (the faiss IVFPQ
    layout). Scoring is ADC (asymmetric distance computation): per
    query and subspace, one q·codebook lookup table (m × n_codes),
    then every corpus score is ``q·c_list + Σ_m T_m[code_m]`` — table
    lookups, no vector math per candidate.

    PQ scores are approximations, so the top ``k·refine`` candidates
    per query are RE-RANKED exactly: candidate (qid, nid) pairs join
    the true vectors by id (candidate-sized, not corpus-sized) and the
    exact JVM dot decides the final top-k with the same 6dp-round +
    nid tiebreak as every other path. Recall ≥ 0.6 at auto sizing is
    asserted on the clustered calibration fixture (tests/test_ml.py).

    Driver state: coarse centroids (n_lists×d) + codebooks
    (m × n_codes × d/m ≈ n_codes·d) — both corpus-size-independent;
    training uses the bounded sample only (_collect_bounded_sample).
    Shuffle: corpus once as (id, 8-byte codes); queries n_probe× with
    their vector (queries are the small side by construction);
    candidates 2× for the exact refine join.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_lists is None:
        n_total = emb.count()
        n_lists, auto_probe = auto_ivf_params(n_total)
        if n_probe is None:
            n_probe = auto_probe
    else:
        n_total = None
        if n_probe is None:
            n_probe = max(4, min(n_lists, round(math.sqrt(n_lists))))

    vec = _spread(emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    n_train_cap = max(50 * n_lists, 4096)
    if n_total is None:
        n_total = vec.count()
    train = vec
    if n_total > n_train_cap:
        train = vec.sample(fraction=min(1.0, n_train_cap / n_total), seed=seed)
    X = _collect_bounded_sample(train)
    d = X.shape[1]
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by m_subspaces={m_subspaces}")
    ds = d // m_subspaces

    C = _lloyd(X, n_lists, seed=seed)                       # coarse centroids
    lab = ((X ** 2).sum(1)[:, None] - 2.0 * (X @ C.T)
           + (C ** 2).sum(1)[None, :]).argmin(1)
    R = X - C[lab]                                          # residuals
    books = [_lloyd(R[:, s * ds:(s + 1) * ds], n_codes, seed=seed + 1 + s)
             for s in range(m_subspaces)]
    sc = emb.sparkSession.sparkContext
    b_C = sc.broadcast(C)
    b_books = sc.broadcast(books)

    def encode_route(batches):
        """ONE corpus pass emits both index sides: corpus rows carry
        CODES ONLY (role=0 — the vector never enters the scoring
        shuffle), query rows carry the vector to their n_probe lists
        (role=1)."""
        Cl = b_C.value
        bks = b_books.value
        c2 = (Cl ** 2).sum(1)
        n_pr = min(n_probe, len(Cl))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Xb = np.array([np.asarray(v, np.float64) for v in pdf["v"]])
            d2 = -2.0 * (Xb @ Cl.T) + c2[None, :]
            near = np.argpartition(d2, n_pr - 1, axis=1)[:, :n_pr] \
                if n_pr < d2.shape[1] else \
                np.broadcast_to(np.arange(d2.shape[1]), d2.shape).copy()
            labb = np.take_along_axis(
                near, np.take_along_axis(d2, near, 1).argmin(1, keepdims=True), 1
            ).ravel()
            Rb = Xb - Cl[labb]
            codes = np.empty((len(Xb), m_subspaces), dtype=np.int64)
            for s in range(m_subspaces):
                B = bks[s]
                sub = Rb[:, s * ds:(s + 1) * ds]
                codes[:, s] = (-2.0 * (sub @ B.T)
                               + (B ** 2).sum(1)[None, :]).argmin(1)
            ids = pdf["vid"].to_numpy()
            vs = pdf["v"].to_numpy()
            corp = pd.DataFrame({
                "list_id": labb.astype("int32"),
                "role": np.int8(0),
                "id": ids,
                "qv": None,
                "codes": list(codes),
            })
            prob = pd.DataFrame({
                "list_id": near.ravel().astype("int32"),
                "role": np.int8(1),
                "id": np.repeat(ids, near.shape[1]),
                "qv": np.repeat(vs, near.shape[1]),
                "codes": None,
            })
            yield pd.concat([corp, prob], ignore_index=True)

    routed = vec.mapInPandas(
        encode_route,
        schema="list_id int, role tinyint, id long, qv array<double>, codes array<long>",
    )

    n_cand = k * refine

    def adc_list(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        corp = pdf[pdf["role"] == 0]
        qry = pdf[pdf["role"] == 1]
        empty = pd.DataFrame({"qid": pd.Series(dtype="int64"),
                              "nid": pd.Series(dtype="int64")})
        if len(corp) == 0 or len(qry) == 0:
            return empty
        Cl = b_C.value
        bks = b_books.value
        list_id = int(key[0])
        codes = np.array([np.asarray(c, np.int64) for c in corp["codes"]])
        nids = corp["id"].to_numpy()
        order = np.argsort(nids)           # id-sorted -> stable tiebreak
        nids, codes = nids[order], codes[order]
        Q = np.array([np.asarray(v, np.float64) for v in qry["qv"]])
        base = Q @ Cl[list_id]             # q·c_list, one per query
        # ADC tables: T[s] is nq × n_codes; corpus score = base + Σ lookups
        approx = np.tile(base[:, None], (1, len(nids)))
        for s in range(m_subspaces):
            T = Q[:, s * ds:(s + 1) * ds] @ bks[s].T
            approx += T[:, codes[:, s]]
        qids = qry["id"].to_numpy()
        out_q, out_n = [], []
        for qi, qid in enumerate(qids):
            sims = approx[qi]
            idx = np.nonzero(nids != qid)[0]
            top = idx[np.argsort(-sims[idx], kind="stable")[:n_cand]]
            out_q.extend([qid] * len(top))
            out_n.extend(nids[top])
        return pd.DataFrame({"qid": np.asarray(out_q, dtype=np.int64),
                             "nid": np.asarray(out_n, dtype=np.int64)})

    cands = (
        routed.groupBy("list_id")
        .applyInPandas(adc_list, schema="qid long, nid long")
    )

    # EXACT refine: candidate-sized joins back to the true vectors.
    # The dot+round is computed in numpy (np.round = half-to-even, the
    # SAME rounding as cosine_topk/ivf_topk's BLAS paths) — NOT JVM
    # F.round (HALF_UP over a sequential fold), which could diverge by
    # 1e-6 on a .5-boundary sim and break the cross-path bit-equality
    # contract asserted in tests/test_ml.py.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _np_dot6(q: pd.Series, v: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        Q = np.array([np.asarray(x, np.float64) for x in q])
        V = np.array([np.asarray(x, np.float64) for x in v])
        return pd.Series(np.round(np.einsum("ij,ij->i", Q, V), 6))

    qside = vec.select(F.col("vid").alias("qid"), F.col("v").alias("_qvec"))
    nside = vec.select(F.col("vid").alias("nid"), F.col("v").alias("_nvec"))
    scored = (
        cands.join(qside, "qid").join(nside, "nid")
        .select("qid", "nid", _np_dot6("_qvec", "_nvec").alias("sim"))
    )
    return _topk_rows(scored, k)


def mmr_rerank(emb: DataFrame, *, k: int = 5, fetch: int = 20,
               lam: float = 0.7, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal-marginal-relevance re-rank: from each query's top-
    ``fetch`` cosine candidates, greedily select ``k`` balancing
    relevance against redundancy —
    argmax over remaining d of  lam·sim(q,d) − (1−lam)·max_{s∈S} sim(d,s).

    Returns (qid, nid, mmr_rank, relevance, diversity_penalty).
    Deterministic: candidate sims are the exact path's 6dp-rounded
    values and ties break on nid.

    Scale: the greedy loop runs per query over ≤``fetch`` candidates
    inside applyInPandas — O(k·fetch) numpy per group, embarrassingly
    parallel across queries; only (qid, candidate) rows shuffle. The
    anti-pattern is a global driver loop over all queries. NOTE the
    candidate FETCH here is the exact all-pairs top-k — O(n²) by
    contract; for corpus-scale retrieval feed the greedy from the
    persisted ANN index instead (:func:`mmr_rerank_candidates` +
    ann_index.probe_index, the q_llm_mmr_ann path)."""
    cand = cosine_topk(emb, k=fetch, id_col=id_col, vec_col=vec_col)
    return mmr_rerank_candidates(cand, emb, k=k, lam=lam,
                                 id_col=id_col, vec_col=vec_col)


def mmr_rerank_candidates(cand: DataFrame, emb: DataFrame, *,
                          k: int = 5, lam: float = 0.7,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """MMR greedy over an EXTERNALLY-SUPPLIED candidate frame
    (qid, nid, sim) — the fetch-agnostic core of :func:`mmr_rerank`:
    exact top-k feeds it below ~10⁶ vectors, the persisted IVF-PQ
    probe feeds it at corpus scale. Same determinism contract
    (6dp sims in, 9dp-rounded argmax, nid tiebreak)."""
    import numpy as np
    import pandas as pd

    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    joined = cand.select("qid", "nid", "sim").join(vecs, "nid")
    # r11 (guide §4.1): pack each query's ≤fetch candidates into ONE
    # row with collect_list, then run the greedy over WHOLE Arrow
    # batches in mapInPandas — the previous per-group applyInPandas
    # paid one Python/pandas round-trip per qid (~2k calls of ~20 rows
    # each at sf0.1; the call overhead, not the numpy greedy, dominated
    # the query). Shuffle volume is unchanged (same rows keyed by qid);
    # only the Python boundary granularity changes, and the per-group
    # numerics below are byte-for-byte the old greedy.
    packed = joined.groupBy("qid").agg(
        F.collect_list(F.struct("nid", "sim", "nv")).alias("cands"))

    def greedy_batches(batches):
        for pdf in batches:
            rows = []
            for qid, cands in zip(pdf["qid"], pdf["cands"]):
                nids = np.fromiter((c["nid"] for c in cands),
                                   dtype=np.int64, count=len(cands))
                sims = np.fromiter((c["sim"] for c in cands),
                                   dtype=np.float64, count=len(cands))
                # sim-desc, nid-asc — identical order to the old
                # sort_values(["sim","nid"], ascending=[False,True])
                order = np.lexsort((nids, -sims))
                nids, sims = nids[order], sims[order]
                C = np.array([np.asarray(cands[i]["nv"], np.float64)
                              for i in order])
                qid = int(qid)
                n = len(nids)
                pen = np.zeros(n)
                avail = np.ones(n, dtype=bool)
                for rank in range(1, min(k, n) + 1):
                    score = lam * sims - (1 - lam) * pen
                    score[~avail] = -np.inf
                    # deterministic argmax with nid tiebreak: nids are
                    # sim-desc, nid-asc sorted, and argmax returns the
                    # first maximum
                    j = int(np.argmax(np.round(score, 9)))
                    avail[j] = False
                    rows.append((qid, int(nids[j]), rank,
                                 float(sims[j]), float(pen[j])))
                    new_sim = np.round(C @ C[j], 6)
                    pen = np.maximum(pen, new_sim)
            yield pd.DataFrame(rows, columns=["qid", "nid", "mmr_rank",
                                              "relevance",
                                              "diversity_penalty"])

    return packed.mapInPandas(
        greedy_batches,
        schema=("qid long, nid long, mmr_rank int, relevance double, "
                "diversity_penalty double"),
    )


def cosine_retrieve(queries: DataFrame, corpus: DataFrame, *, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    max_broadcast_rows: int = DEFAULT_MAX_BROADCAST_ROWS) -> DataFrame:
    """CROSS-TABLE exact retrieval: top-k cosine neighbors in
    ``corpus`` for every vector in ``queries`` — the query!=corpus
    shape actual retrieval has (benchmark-vs-train search, eval-set
    neighbors), vs cosine_topk's self-join. Same determinism contract
    (6dp rounding before ranking, id tiebreak); no self-exclusion —
    if an id appears in both frames it is a legitimate hit.

    Scale: the corpus broadcasts (bounded; raise past
    ``max_broadcast_rows`` — use IVF routing for bigger corpora); the
    query stream never shuffles."""
    import numpy as np
    import pandas as pd

    if corpus.limit(max_broadcast_rows + 1).count() > max_broadcast_rows:
        raise ValueError(
            f"corpus exceeds {max_broadcast_rows} rows — use ivf_topk-style "
            "routing for broadcast-infeasible corpora")
    cand = corpus.select(F.col(id_col).alias("nid"),
                         F.col(vec_col).alias("vb")).collect()
    nids = np.array([r["nid"] for r in cand], dtype=np.int64)
    C = np.array([np.asarray(r["vb"], dtype=np.float64) for r in cand])
    order = np.argsort(nids)
    nids, C = nids[order], C[order]
    spark = queries.sparkSession
    b_nids = spark.sparkContext.broadcast(nids)
    b_C = spark.sparkContext.broadcast(C)

    # r12: query-chunked scoring into one reused buffer — same
    # allocation-churn fix as cosine_topk above (this host serializes
    # concurrent large mmap/munmap; see the measured 73 s -> 9.7 s
    # paired GEMM A/B there). Dots, rounding, selection unchanged.
    Q_CHUNK = 128

    def topk_batches(batches):
        cn, cm = b_nids.value, b_C.value
        cmT = np.ascontiguousarray(cm.T)
        n = len(cn)
        s_buf = np.empty((Q_CHUNK, n))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Qb = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            qids_b = pdf["qid"].to_numpy()
            rows = []
            for lo in range(0, len(Qb), Q_CHUNK):
                Q = Qb[lo:lo + Q_CHUNK]
                S = s_buf[:len(Q)]
                np.matmul(Q, cmT, out=S)
                np.round(S, 6, out=S)
                for qi, qid in enumerate(qids_b[lo:lo + Q_CHUNK]):
                    sims = S[qi]
                    if n <= k or n <= ARGSORT_CUTOVER:
                        idx = np.arange(n)
                    else:
                        kth = np.partition(sims, n - k)[n - k]
                        idx = np.nonzero(sims >= kth)[0]
                    top = idx[np.argsort(-sims[idx], kind="stable")[:k]]
                    for rn, j in enumerate(top, start=1):
                        rows.append((int(qid), int(cn[j]), float(sims[j]), rn))
            yield pd.DataFrame(rows, columns=["qid", "nid", "sim", "rn"])

    q = _spread(queries.select(F.col(id_col).alias("qid"),
                               F.col(vec_col).alias("vb")))
    return q.mapInPandas(topk_batches,
                         schema="qid long, nid long, sim double, rn long")


def panel_all_sims(corpus: DataFrame, panel: DataFrame, *,
                   corpus_id: str = "vec_id", vec_col: str = "embedding",
                   panel_id: str = "qid", panel_vec: str = "q_emb",
                   payload_cols: list[str] | None = None,
                   exclude_self: bool = True,
                   max_panel_rows: int = 4096) -> DataFrame:
    """ALL pairwise (panel × corpus) dot products, 6dp-rounded — the
    exhaustive sims table behind fixed-panel evals (retrieval metrics,
    RRF fusion). The tiny panel is collected (bounded by contract —
    eval panels are dozens of queries) and each corpus Arrow batch is
    scored with ONE float64 BLAS matmul, replacing the broadcast
    nested-loop join whose per-pair interpreted zip_with/aggregate
    lambda dominated the eval queries (guide §4.2: hand whole batches
    to vectorized native code). Determinism contract identical to
    cosine_topk: np.round(·, 6) of the float64 matmul agrees with the
    oracle's 6dp-rounded sequential list_sum on every fixture SF (the
    same empirical contract the hash-green cosine_topk/cosine_retrieve
    already rely on).

    Emits (qid, cid, sim, *payload_cols copied from the corpus row);
    per-query panel attributes join back JVM-side on the qid key."""
    import numpy as np
    import pandas as pd

    payload_cols = payload_cols or []
    prow = panel.select(panel_id, panel_vec).limit(max_panel_rows + 1).collect()
    if len(prow) > max_panel_rows:
        raise ValueError(
            f"panel exceeds {max_panel_rows} rows — this operator is for "
            "fixed eval panels; shard the panel or use cosine_retrieve")
    qids = np.array([r[panel_id] for r in prow], dtype=np.int64)
    Q = np.array([np.asarray(r[panel_vec], dtype=np.float64) for r in prow])
    spark = corpus.sparkSession
    b_qids = spark.sparkContext.broadcast(qids)
    b_Q = spark.sparkContext.broadcast(Q)

    src = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(vec_col).alias("vb"),
        *payload_cols,
    )
    pay_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields if f.name in payload_cols
    )

    def score_batches(batches):
        qn, qm = b_qids.value, b_Q.value
        nq = len(qn)
        for pdf in batches:
            nb = len(pdf)
            if nb == 0:
                continue
            C = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            S = np.round(qm @ C.T, 6)          # (nq, nb)
            out_qid = np.repeat(qn, nb)
            out_cid = np.tile(pdf["cid"].to_numpy(), nq)
            out = {"qid": out_qid, "cid": out_cid, "sim": S.ravel()}
            for c in payload_cols:
                out[c] = np.tile(pdf[c].to_numpy(), nq)
            res = pd.DataFrame(out)
            if exclude_self:
                res = res[res["qid"] != res["cid"]]
            yield res

    return _spread(src).mapInPandas(
        score_batches, schema="qid long, cid long, sim double" + pay_schema)


def semdedup(emb: DataFrame, *, n_clusters: int | None = None,
             threshold: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42,
             chunk: int = 4096) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster-then-dedup-within-cluster — the
    published scale recipe for embedding dedup, complementing the
    LSH-candidate path (q_llm_embed_cosine_dedup).

      1. a KMeans coarse quantizer (trained on a BOUNDED sample,
         reusing the IVF machinery) assigns every vector to one of
         ~sqrt(n) clusters;
      2. WITHIN each cluster, exact pairwise cosine >= ``threshold``
         pairs are folded by a local union-find and every dup group
         keeps its minimum id.

    Returns one row per vector: (vec_id, cluster_id, keep, dup_of) —
    ``dup_of`` is the kept representative for dropped rows, NULL for
    keepers; ``cluster_id`` is the (seed-dependent) quantizer cell,
    exposed so tests can assert the within-cluster exactness contract.

    Scale: the quadratic term is bounded to sum(|cluster|^2) instead
    of n^2 — with k ≈ √n lists each task's matmul is ~√n×√n; the
    within-cluster scoring streams in ``chunk``-row slices so task
    memory is O(chunk·|cluster|). Cross-cluster near-dups are
    deliberately missed (the paper's trade: recall tracks quantizer
    quality); the LSH path is the recall-first alternative.
    """
    import numpy as np
    import pandas as pd

    vec = _spread(emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    n_total = vec.count()
    if n_clusters is None:
        n_clusters, _ = auto_ivf_params(n_total)
    n_train_cap = max(50 * n_clusters, 4096)
    train = vec
    if n_total > n_train_cap:
        train = vec.sample(fraction=min(1.0, n_train_cap / n_total), seed=seed)
    centers = _train_coarse_quantizer(
        train, n_clusters, seed=seed, n_train=min(n_total, n_train_cap)
    )
    b_centers = emb.sparkSession.sparkContext.broadcast(centers)

    def assign(batches):
        C = b_centers.value
        c2 = (C ** 2).sum(1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(x, np.float64) for x in pdf["v"]])
            lab = (-2.0 * (X @ C.T) + c2[None, :]).argmin(1)
            yield pd.DataFrame({
                "cluster": lab.astype("int32"),
                "vid": pdf["vid"].to_numpy(),
                "v": pdf["v"].to_numpy(),
            })

    assigned = vec.mapInPandas(
        assign, schema="cluster int, vid long, v array<double>"
    )

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic within-cluster order: ids ascending, so the
        # union-find representative is the group minimum
        pdf = pdf.sort_values("vid").reset_index(drop=True)
        ids = pdf["vid"].to_numpy()
        X = np.array([np.asarray(x, np.float64) for x in pdf["v"]])
        # normalize so the threshold is TRUE cosine even for
        # non-unit-norm inputs (ADVICE r7: the raw dot equalled cosine
        # only under the fixture's unit-vector convention)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X = X / np.maximum(norms, 1e-12)
        n = len(ids)
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            sims = X[lo:hi] @ X.T  # chunk x n
            for r in range(hi - lo):
                i = lo + r
                js = np.nonzero(sims[r, :i] >= threshold)[0]
                for j in js:
                    ri, rj = find(i), find(int(j))
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        root = np.array([find(i) for i in range(n)])
        keep = root == np.arange(n)
        dup_of = np.where(keep, np.int64(-1), ids[root])
        return pd.DataFrame({
            "vec_id": ids,
            "cluster_id": np.full(n, int(pdf["cluster"].iloc[0]),
                                  dtype=np.int64),
            "keep": keep, "dup_of": dup_of,
        })

    out = assigned.groupBy("cluster").applyInPandas(
        dedup_cluster,
        schema="vec_id long, cluster_id long, keep boolean, dup_of long",
    )
    return out.select(
        "vec_id", "cluster_id", "keep",
        F.when(F.col("dup_of") >= 0, F.col("dup_of")).alias("dup_of"),
    )
