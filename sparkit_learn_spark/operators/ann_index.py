"""Persisted ANN index lifecycle: build once, probe many (r9).

Every ``q_llm_ann*`` query so far retrains its quantizer/codebooks per
call — fine for a benchmark row, wrong for production: a 100 TB
similarity service amortizes ONE index build across thousands of query
batches. This module persists the faiss-style IVF-PQ layout as plain
parquet under a directory (the :mod:`bucketing` pattern: pay the
expensive pass once at write time, reuse it exchange-free after):

  {path}/meta/       one row: n_lists, m_subspaces, n_codes, d,
                     n_vectors, seed, source_fingerprint
  {path}/centroids/  (list_id, c array<double>)        — n_lists rows
  {path}/codebooks/  (subspace, code, w array<double>) — m·n_codes rows
  {path}/codes/      (id, codes array<long>) PARTITIONED BY list_id

``codes`` is hive-partitioned by list_id so a probe that touches
n_probe lists READS ONLY THOSE DIRECTORIES — partition pruning makes
the scan cost track the probe schedule (√n_lists of the corpus), not
the corpus. Centroids + codebooks are the only driver-side state
(n_lists·d + m·n_codes·d/m doubles, corpus-size-independent), exactly
the state :func:`similarity.ivf_pq_topk` broadcasts per run.

Staleness: ``meta.source_fingerprint`` records the corpus identity the
caller supplies (size+mtime of the source parquet in the registered
query). ``load_index`` surfaces it; ``build_if_stale`` rebuilds when
it changes. An index probed against a corpus it was not built from
returns silently wrong neighbors — fingerprint discipline is the
caller's contract, enforced here rather than documented away.

Exact re-rank at probe time joins candidates back to the RAW vector
table by id (candidate-sized join) — the index stores codes only, the
corpus table remains the vector store, faiss's refine-at-search shape.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _collect_bounded_sample,
    _lloyd,
    _spread,
    _topk_rows,
    auto_ivf_params,
)


def _train(vec: DataFrame, n_lists: int, m_subspaces: int, n_codes: int,
           seed: int, n_total: int):
    """Coarse centroids + per-subspace residual codebooks from the
    bounded training sample (the ivf_pq_topk recipe)."""
    n_train_cap = max(50 * n_lists, 4096)
    train = vec
    if n_total > n_train_cap:
        train = vec.sample(fraction=min(1.0, n_train_cap / n_total),
                           seed=seed)
    X = _collect_bounded_sample(train)
    d = X.shape[1]
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by m_subspaces={m_subspaces}")
    ds = d // m_subspaces
    C = _lloyd(X, n_lists, seed=seed)
    lab = ((X ** 2).sum(1)[:, None] - 2.0 * (X @ C.T)
           + (C ** 2).sum(1)[None, :]).argmin(1)
    R = X - C[lab]
    books = [_lloyd(R[:, s * ds:(s + 1) * ds], n_codes, seed=seed + 1 + s)
             for s in range(m_subspaces)]
    return C, books, d, ds


def _encode_frame(vec: DataFrame, C: np.ndarray, books: list) -> DataFrame:
    """(id, list_id, codes) for every vector in ``vec`` against a
    FIXED quantizer — one Arrow pass, broadcast driver state only."""
    ds = C.shape[1] // len(books)
    sc = vec.sparkSession.sparkContext
    b_C = sc.broadcast(C)
    b_books = sc.broadcast(books)

    def encode(batches):
        Cl = b_C.value
        bks = b_books.value
        c2 = (Cl ** 2).sum(1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, np.float64) for v in pdf["v"]])
            lab = (-2.0 * (X @ Cl.T) + c2[None, :]).argmin(1)
            R = X - Cl[lab]
            codes = np.empty((len(X), len(bks)), dtype=np.int64)
            for s, B in enumerate(bks):
                sub = R[:, s * ds:(s + 1) * ds]
                codes[:, s] = (-2.0 * (sub @ B.T)
                               + (B ** 2).sum(1)[None, :]).argmin(1)
            yield pd.DataFrame({"id": pdf["vid"].to_numpy(),
                                "list_id": lab.astype("int32"),
                                "codes": list(codes)})

    return vec.mapInPandas(
        encode, schema="id long, list_id int, codes array<long>")


def train_quantizer(emb: DataFrame, *, n_lists: int | None = None,
                    m_subspaces: int = 8, n_codes: int = 256,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> tuple:
    """Train the IVF-PQ quantizer ONCE on a bounded global sample and
    return (centroids, codebooks) for handing to shard builders
    (write_index's ``quantizer=``). One count job + one bounded
    collect; corpus-size-independent driver state."""
    vec = _spread(emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    n_total = vec.count()
    if n_lists is None:
        n_lists, _ = auto_ivf_params(n_total)
    C, books, _d, _ds = _train(vec, n_lists, m_subspaces, n_codes,
                               seed, n_total)
    return C, books


def write_index(emb: DataFrame, path: str, *, n_lists: int | None = None,
                m_subspaces: int = 8, n_codes: int = 256, seed: int = 42,
                id_col: str = "vec_id", vec_col: str = "embedding",
                source_fingerprint: str = "",
                quantizer: tuple | None = None) -> dict:
    """Build and persist an IVF-PQ index for ``emb`` under ``path``.

    One corpus pass encodes every vector to (list_id, m one-byte
    codes); the write shuffles by list_id once (the amortized cost).
    Returns the meta row as a dict.

    ``quantizer=(C, books)`` skips training and encodes against the
    given centroids/codebooks — the SHARD-PARALLEL build path: train
    the quantizer once on a global sample, hand it to every shard
    builder, then :func:`merge_indexes` the shard outputs (faiss's
    distributed-build recipe; at 100 TB the encode pass is the
    parallel part and training is one bounded-sample job)."""
    spark = emb.sparkSession
    vec = _spread(emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    n_total = vec.count()
    if quantizer is not None:
        C, books = quantizer
        n_lists = len(C)
        m_subspaces = len(books)
        n_codes = len(books[0])
        d = C.shape[1]
    else:
        if n_lists is None:
            n_lists, _ = auto_ivf_params(n_total)
        C, books, d, _ds = _train(vec, n_lists, m_subspaces, n_codes,
                                  seed, n_total)
    (_encode_frame(vec, C, books)
        .repartition("list_id")
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(f"{path}/codes"))

    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(C)],
        "list_id int, c array<double>")
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    book_rows = [(s, int(c), [float(x) for x in w])
                 for s, B in enumerate(books) for c, w in enumerate(B)]
    spark.createDataFrame(
        book_rows, "subspace int, code int, w array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")

    meta = {"n_lists": n_lists, "m_subspaces": m_subspaces,
            "n_codes": n_codes, "d": d, "n_vectors": n_total,
            "seed": seed, "source_fingerprint": source_fingerprint}
    _write_meta(spark, path, meta)
    return meta


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    spark.createDataFrame(
        [(meta["n_lists"], meta["m_subspaces"], meta["n_codes"],
          meta["d"], meta["n_vectors"], meta["seed"],
          meta["source_fingerprint"])],
        "n_lists int, m_subspaces int, n_codes int, d int, "
        "n_vectors long, seed int, source_fingerprint string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def append_to_index(emb_batch: DataFrame, path: str, *,
                    expected_fingerprint: str, new_fingerprint: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """Add a NEW batch of vectors to a persisted index WITHOUT
    retraining — the incremental ingest path (faiss ``add`` semantics):
    the batch is encoded against the EXISTING quantizer/codebooks and
    its codes are appended to the hive partitions; meta's count and
    fingerprint advance atomically-enough for the single-writer
    contract (the driver pipeline is the only writer).

    The quantizer is deliberately frozen: appending never changes
    earlier codes, so probes stay reproducible and the append cost is
    batch-sized. The trade is drift — if the batch distribution shifts
    away from the training sample, new vectors crowd few lists and
    probe cost rises; monitor with :func:`similarity.ivf_list_balance`
    and rebuild when cv degrades (documented faiss practice).

    ``expected_fingerprint`` must match the index's current meta
    (stale-writer guard); ``new_fingerprint`` is recorded as the new
    corpus identity.

    Crash safety: codes land before meta advances, so a failure
    between the two writes leaves codes ahead of meta — and a naive
    retry would pass the fingerprint guard and append the batch AGAIN
    (permanent silent duplication; r9 ADVICE). The append therefore
    verifies the count invariant first: if codes are exactly one
    batch ahead AND this batch's ids are all already present, the
    interrupted commit is COMPLETED (meta-only write, no re-append);
    any other divergence raises loudly so the caller rebuilds."""
    spark = emb_batch.sparkSession
    meta = load_meta(spark, path)
    if meta["source_fingerprint"] != expected_fingerprint:
        raise ValueError(
            f"append_to_index at {path}: index fingerprint "
            f"{meta['source_fingerprint']!r} != expected "
            f"{expected_fingerprint!r} — another writer moved it, or "
            "the batch was already appended")
    vec = _spread(emb_batch.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    n_batch = vec.count()
    codes = spark.read.parquet(f"{path}/codes")
    n_actual = codes.count()  # parquet count — row-group metadata scan
    n_meta = int(meta["n_vectors"])
    if n_actual != n_meta:
        n_present = codes.join(
            vec.select(F.col("vid").alias("id")), "id", "semi").count()
        if n_actual == n_meta + n_batch and n_present == n_batch:
            # previous run crashed between the codes append and the
            # meta commit — the batch is fully on disk; finish the
            # commit without re-appending
            meta = dict(meta)
            meta["n_vectors"] = n_meta + n_batch
            meta["source_fingerprint"] = new_fingerprint
            _write_meta(spark, path, meta)
            return meta
        raise RuntimeError(
            f"append_to_index at {path}: codes hold {n_actual} rows "
            f"but meta records {n_meta} (batch={n_batch}, of which "
            f"{n_present} already present) — index is inconsistent; "
            "rebuild it (build_if_stale / write_index)")
    C, books = read_quantizer(spark, path, meta["m_subspaces"])
    (_encode_frame(vec, C, books)
        .repartition("list_id")
        .write.mode("append").partitionBy("list_id")
        .parquet(f"{path}/codes"))
    meta = dict(meta)
    meta["n_vectors"] = n_meta + n_batch
    meta["source_fingerprint"] = new_fingerprint
    _write_meta(spark, path, meta)
    return meta


def load_meta(spark: SparkSession, path: str) -> dict:
    """The index's meta row (raises if the index does not exist)."""
    return spark.read.parquet(f"{path}/meta").first().asDict()


def read_quantizer(spark: SparkSession, path: str,
                   m_subspaces: int) -> tuple:
    """(centroids ndarray, codebook list) — the driver-side state."""
    cent = spark.read.parquet(f"{path}/centroids").orderBy(
        "list_id").collect()
    C = np.array([r["c"] for r in cent])
    bk = spark.read.parquet(f"{path}/codebooks").orderBy(
        "subspace", "code").collect()
    books = [np.array([r["w"] for r in bk if r["subspace"] == s])
             for s in range(m_subspaces)]
    return C, books


def merge_indexes(spark: SparkSession, paths: list[str], out: str, *,
                  source_fingerprint: str = "") -> dict:
    """Merge SHARD indexes built against ONE shared quantizer into a
    single index at ``out`` — the reduce step of the shard-parallel
    build (see :func:`write_index`'s ``quantizer=``). Refuses shards
    whose quantizers differ (layout params or centroid bytes): codes
    from different quantizers are mutually meaningless, and a silent
    mix would probe as garbage.

    Scale: the merge is ONE partitioned read-union-write of code rows
    (8 B/vector) — no vector math, no quantizer state beyond the
    shared one copied through."""
    if len(paths) < 2:
        raise ValueError("merge_indexes needs at least two shards")
    metas = [load_meta(spark, p) for p in paths]
    layout_keys = ("n_lists", "m_subspaces", "n_codes", "d", "seed")
    layouts = {tuple(m[k] for k in layout_keys) for m in metas}
    if len(layouts) != 1:
        raise ValueError(f"merge_indexes: shard layouts differ: {layouts}")
    quants = [read_quantizer(spark, p, metas[0]["m_subspaces"])
              for p in paths]
    C0, books0 = quants[0]
    for C, books in quants[1:]:
        if not (np.array_equal(C0, C)
                and all(np.array_equal(a, b)
                        for a, b in zip(books0, books))):
            raise ValueError(
                "merge_indexes: shard quantizers differ — shards must "
                "be encoded against ONE shared quantizer "
                "(write_index(quantizer=...))")
    codes = spark.read.parquet(f"{paths[0]}/codes")
    for p in paths[1:]:
        codes = codes.unionByName(spark.read.parquet(f"{p}/codes"))
    (codes.repartition("list_id")
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(f"{out}/codes"))
    spark.read.parquet(f"{paths[0]}/centroids").coalesce(1) \
        .write.mode("overwrite").parquet(f"{out}/centroids")
    spark.read.parquet(f"{paths[0]}/codebooks").coalesce(1) \
        .write.mode("overwrite").parquet(f"{out}/codebooks")
    meta = dict(metas[0])
    meta["n_vectors"] = int(sum(m["n_vectors"] for m in metas))
    meta["source_fingerprint"] = source_fingerprint
    _write_meta(spark, out, meta)
    return meta


def build_if_stale(emb: DataFrame, path: str, *,
                   source_fingerprint: str, lock_timeout: float = 600.0,
                   **build_kw) -> tuple[dict, bool]:
    """(meta, rebuilt): load the index at ``path`` if its fingerprint
    matches, else (re)build it. The build-once-probe-many entry.

    Builds are serialized by the shared atomic-mkdir build lock
    (r9 ADVICE: two sessions sharing one warehouse dir could
    interleave overwrite-writes and corrupt the layout). The lock is
    re-checked after acquisition, so a waiter that blocked behind a
    builder finds the fresh index and skips its own build. Only the
    missing-index read error is swallowed; genuine read errors
    propagate."""
    from pyspark.errors import AnalysisException

    from .store_lock import build_lock

    spark = emb.sparkSession

    def _fresh() -> dict | None:
        try:
            meta = load_meta(spark, path)
        except AnalysisException as exc:  # missing path -> build
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return None
            raise
        return meta if meta["source_fingerprint"] == source_fingerprint \
            else None

    meta = _fresh()
    if meta is not None:
        return meta, False
    with build_lock(path, timeout=lock_timeout):
        meta = _fresh()  # another session may have built while we waited
        if meta is not None:
            return meta, False
        return write_index(emb, path,
                           source_fingerprint=source_fingerprint,
                           **build_kw), True


def probe_index(spark: SparkSession, path: str, queries: DataFrame, *,
                k: int = 5, n_probe: int | None = None, refine: int = 4,
                corpus: DataFrame | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                expected_fingerprint: str | None = None) -> DataFrame:
    """Search a PERSISTED index: (qid, nid, sim, rn) top-k rows.

    Loads centroids + codebooks driver-side (the corpus-independent
    state), routes each query to its ``n_probe`` nearest lists, scans
    ONLY those lists' code partitions (hive partition pruning on
    list_id), ADC-scores, and exactly re-ranks the top ``k*refine``
    against ``corpus`` (the raw vector store) when given — the same
    ADC + refine semantics as :func:`similarity.ivf_pq_topk`, minus
    the training.

    ``expected_fingerprint`` guards against probing a stale index:
    pass the current corpus fingerprint and a mismatch raises instead
    of returning silently wrong neighbors."""
    if corpus is None:
        # keyword-optional for call-site symmetry with ivf_pq_topk, but
        # required by contract (exact re-rank) — validate before any
        # Spark work is spent (r9 ADVICE)
        raise ValueError("probe_index: pass corpus= (the raw vector "
                         "store) for the exact re-rank")
    meta = load_meta(spark, path)
    if (expected_fingerprint is not None
            and meta["source_fingerprint"] != expected_fingerprint):
        raise ValueError(
            f"ann_index at {path} is stale: built from "
            f"{meta['source_fingerprint']!r}, corpus is now "
            f"{expected_fingerprint!r} — rebuild with build_if_stale")
    m, ds = meta["m_subspaces"], meta["d"] // meta["m_subspaces"]
    if n_probe is None:
        n_probe = max(4, min(meta["n_lists"],
                             round(meta["n_lists"] ** 0.5)))

    C, books = read_quantizer(spark, path, m)

    qv = queries.select(F.col(id_col).alias("qid"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
    q_loc = qv.collect()  # the query panel is the small side by contract
    if len(q_loc) > 100_000:
        raise ValueError("probe_index: query panel exceeds 100k rows — "
                         "split the batch or use ivf_pq_topk")
    Q = np.array([np.asarray(r["qv"], np.float64) for r in q_loc])
    qids = np.array([r["qid"] for r in q_loc], dtype=np.int64)
    d2 = -2.0 * (Q @ C.T) + (C ** 2).sum(1)[None, :]
    n_pr = min(n_probe, len(C))
    near = (np.argpartition(d2, n_pr - 1, axis=1)[:, :n_pr]
            if n_pr < d2.shape[1]
            else np.broadcast_to(np.arange(d2.shape[1]), d2.shape).copy())
    probed_lists = sorted({int(x) for x in near.ravel()})

    # query routing table: (list_id, qid, qv) — tiny, broadcast side
    route_rows = [(int(near[i, j]), int(qids[i]),
                   [float(x) for x in Q[i]])
                  for i in range(len(Q)) for j in range(near.shape[1])]
    routed_q = spark.createDataFrame(
        route_rows, "list_id int, qid long, qv array<double>")

    # codes scan: ONLY the probed list partitions (pruned at the source)
    codes = (spark.read.parquet(f"{path}/codes")
             .filter(F.col("list_id").isin(probed_lists)))

    b_C = spark.sparkContext.broadcast(C)
    b_books = spark.sparkContext.broadcast(books)
    n_cand = k * refine

    def adc(key, cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": pd.Series(dtype="int64"),
                              "nid": pd.Series(dtype="int64")})
        if len(cdf) == 0 or len(qdf) == 0:
            return empty
        Cl, bks = b_C.value, b_books.value
        list_id = int(key[0])
        codes_m = np.array([np.asarray(c, np.int64) for c in cdf["codes"]])
        nids = cdf["id"].to_numpy()
        order = np.argsort(nids)
        nids, codes_m = nids[order], codes_m[order]
        Qm = np.array([np.asarray(v, np.float64) for v in qdf["qv"]])
        approx = np.tile((Qm @ Cl[list_id])[:, None], (1, len(nids)))
        for s in range(len(bks)):
            T = Qm[:, s * ds:(s + 1) * ds] @ bks[s].T
            approx += T[:, codes_m[:, s]]
        out_q, out_n = [], []
        for qi, qid in enumerate(qdf["qid"].to_numpy()):
            sims = approx[qi]
            idx = np.nonzero(nids != qid)[0]
            top = idx[np.argsort(-sims[idx], kind="stable")[:n_cand]]
            out_q.extend([qid] * len(top))
            out_n.extend(nids[top])
        return pd.DataFrame({"qid": np.asarray(out_q, dtype=np.int64),
                             "nid": np.asarray(out_n, dtype=np.int64)})

    cands = (codes.groupBy("list_id")
             .cogroup(routed_q.groupBy("list_id"))
             .applyInPandas(adc, schema="qid long, nid long")
             .distinct())  # a pair can surface from several lists

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _np_dot6(q: pd.Series, v: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        Qb = np.array([np.asarray(x, np.float64) for x in q])
        Vb = np.array([np.asarray(x, np.float64) for x in v])
        return pd.Series(np.round(np.einsum("ij,ij->i", Qb, Vb), 6))

    store = corpus.select(F.col(id_col).alias("nid"),
                          F.col(vec_col).cast("array<double>").alias("_nv"))
    qstore = queries.select(F.col(id_col).alias("qid"),
                            F.col(vec_col).cast("array<double>").alias("_qv"))
    scored = (cands.join(qstore, "qid").join(store, "nid")
              .select("qid", "nid", _np_dot6("_qv", "_nv").alias("sim")))
    return _topk_rows(scored, k)
