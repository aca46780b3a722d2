"""Persisted MinHash-LSH near-dup index (r10): standing banded-bucket
tables for INCREMENTAL near-duplicate detection — the third leg of the
persisted-state family (ann_index: vector codes; funnel_store: exact
digests + head-token fingerprints; here: MinHash band keys, the
industry-standard near-dup candidate structure à la Broder/LSH).

Why it exists: every near-dup query in the registry recomputes
signatures for BOTH sides of the comparison. A production corpus
computes each document's signature once, persists its band keys, and
each incoming batch (a) probes the standing bands for candidates and
(b) appends its own keys — batch-sized marginal cost against a 100 TB
history.

Layout:

  {path}/bands/  (doc_id, band_id, band_key) PARTITIONED BY run_id —
                 band_key is the ':'-joined signature slice, a string
                 equality key; run N's probe/append reads run_id < N
                 only, so crashed-run retries are blind to their own
                 partial append (the funnel_store discipline). Band
                 rows feed DISTINCT candidate pairs, so duplicate
                 appends are semantically harmless.
  {path}/meta/   (n_hashes, band_rows, shingle_k, n_docs,
                  source_fingerprint)

Portability: signatures use the repo's cross-engine hash convention —
md5-prefix base (7 hex chars → BIGINT, overflow-safe) through the 16-member affine
family over the 32-bit ring (the q_sketch_minhash_portable family,
queries/wave52.py) — so a DuckDB oracle rebuilds byte-identical band
keys and the index queries are EXACTLY oracled, unlike the xxhash
production MinHash (rows-only by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens

#: portable affine family over the 32-bit ring — MUST stay in sync
#: with queries/wave52.py's _MH (the cross-engine-verified family).
MH_FAMILY = [
    (2654435761, 1), (40503, 7), (2246822519, 13), (3266489917, 19),
    (668265263, 29), (374761393, 37), (3141592653, 43), (2718281829, 53),
    (1597334677, 61), (2869860233, 71), (3987654323, 79), (1234567891, 89),
    (2147483629, 97), (1073741827, 101), (536870923, 107), (268435459, 113),
]

MH_FAMILY_SQL = " UNION ALL ".join(
    f"SELECT {j} AS j, {a} AS a, {b} AS b"
    for j, (a, b) in enumerate(MH_FAMILY))

N_HASHES = len(MH_FAMILY)
BAND_ROWS = 4  # 16 hashes / 4 rows -> 4 bands; s-curve ~ (1-(1-j^4)^4)
SHINGLE_K = 5  # the registry's near-dup shingle width


def doc_bands(docs: DataFrame, *, band_rows: int = BAND_ROWS,
              k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, band_id, band_key) for every document with >= k
    tokens: distinct k-shingles -> portable 60-bit base hash -> 16
    affine minima -> band_rows-wide signature slices joined to one
    string key per band.

    Scale: the signature is a (doc, j)-grain MIN aggregate — map-side
    combining collapses the shingle×hash stream before the shuffle;
    band keys are ~40 B/doc·band. Never all-pairs."""
    spark = docs.sparkSession
    t = docs.select("doc_id", tokens("text").alias("toks")) \
        .where(F.size("toks") >= k)
    sh = t.select(
        "doc_id", F.explode(shingles(F.col("toks"), k=k)).alias("sh")
    ).distinct()
    # 7-hex (28-bit) base so base*a stays inside int64 in BOTH
    # engines (DuckDB raises on BIGINT overflow; 2^28 * 2^32 < 2^63)
    base = (F.conv(F.substring(F.md5("sh"), 1, 7), 16, 10)
            .cast("long").alias("base"))
    fam = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(MH_FAMILY)],
        "j int, a long, b long")
    sigs = (
        sh.select("doc_id", base)
        .crossJoin(F.broadcast(fam))
        .groupBy("doc_id", "j")
        .agg(F.min((F.col("base") * F.col("a") + F.col("b"))
                   % F.lit(4294967296)).alias("sig"))
    )
    return (
        sigs.withColumn("band_id",
                        (F.col("j") / F.lit(band_rows)).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "sig"))),
                lambda s: s["sig"].cast("string")),
            ":").alias("band_key"))
    )


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    spark.createDataFrame(
        [(meta["n_hashes"], meta["band_rows"], meta["shingle_k"],
          meta["n_docs"], meta["source_fingerprint"])],
        "n_hashes int, band_rows int, shingle_k int, n_docs long, "
        "source_fingerprint string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_meta(spark: SparkSession, path: str) -> dict:
    return spark.read.parquet(f"{path}/meta").first().asDict()


def build_neardup_index(docs: DataFrame, path: str, *,
                        source_fingerprint: str,
                        band_rows: int = BAND_ROWS,
                        k: int = SHINGLE_K) -> dict:
    """One signature pass over the corpus; bands land under run_id=0."""
    spark = docs.sparkSession
    b = doc_bands(docs, band_rows=band_rows, k=k)
    (b.withColumn("run_id", F.lit(0))
        .write.mode("overwrite").partitionBy("run_id")
        .parquet(f"{path}/bands"))
    n_docs = (spark.read.parquet(f"{path}/bands")
              .select("doc_id").distinct().count())
    meta = {"n_hashes": N_HASHES, "band_rows": band_rows,
            "shingle_k": k, "n_docs": n_docs,
            "source_fingerprint": source_fingerprint}
    _write_meta(spark, path, meta)
    return meta


def build_neardup_if_stale(docs: DataFrame, path: str, *,
                           source_fingerprint: str,
                           lock_timeout: float = 600.0,
                           **kw) -> tuple[dict, bool]:
    """(meta, rebuilt) — the build-once-probe-many entry (only the
    missing-path read error is swallowed). Builds are serialized by
    the shared atomic-mkdir lock (ADVICE r10: ann_index gained it in
    r9 for the identical two-writers-one-warehouse hazard) and the
    staleness check re-runs after acquisition, so a waiter that
    blocked behind a builder reuses the fresh index."""
    from pyspark.errors import AnalysisException

    from .store_lock import build_lock

    spark = docs.sparkSession

    def _fresh() -> dict | None:
        try:
            meta = load_meta(spark, path)
        except AnalysisException as exc:
            if ("PATH_NOT_FOUND" in str(exc)
                    or "Path does not exist" in str(exc)):
                return None
            raise
        return meta if meta["source_fingerprint"] == source_fingerprint \
            else None

    meta = _fresh()
    if meta is not None:
        return meta, False
    with build_lock(path, timeout=lock_timeout):
        meta = _fresh()
        if meta is not None:
            return meta, False
        return build_neardup_index(
            docs, path, source_fingerprint=source_fingerprint, **kw), True


def append_to_neardup_index(batch: DataFrame, path: str, *,
                            run_id: int, expected_fingerprint: str,
                            new_fingerprint: str) -> dict:
    """Append the batch's band keys under ``run_id`` and advance the
    fingerprint. Frozen "quantizer": the hash family is static, so an
    append never perturbs earlier keys and costs one batch signature
    pass. Fingerprint-guarded against stale writers; duplicate
    appends of the same batch are semantically harmless (bands feed
    DISTINCT candidates) but the guard refuses them loudly anyway.

    Crash safety (ADVICE r10, the ann_index append discipline): bands
    land before meta advances, so a crash between the two writes
    leaves this run's partition on disk with the OLD fingerprint — a
    naive retry would pass the guard and append the batch AGAIN,
    permanently duplicating raw band rows (the coverage/append audits
    count raw rows, so that failure has no recovery path). The append
    therefore checks its own run_id partition first: if it already
    holds EXACTLY this batch's band multiset, the interrupted commit
    is COMPLETED meta-only; any other divergence raises loudly."""
    spark = batch.sparkSession
    if run_id < 1:
        raise ValueError("append_to_neardup_index: run_id must be >= 1")
    meta = load_meta(spark, path)
    if meta["source_fingerprint"] != expected_fingerprint:
        raise ValueError(
            f"neardup_index at {path}: fingerprint "
            f"{meta['source_fingerprint']!r} != expected "
            f"{expected_fingerprint!r} — another writer moved it, or "
            "the batch was already appended")

    def _commit(meta: dict) -> dict:
        n_docs = (spark.read.parquet(f"{path}/bands")
                  .select("doc_id").distinct().count())
        meta = dict(meta)
        meta["n_docs"] = n_docs
        meta["source_fingerprint"] = new_fingerprint
        _write_meta(spark, path, meta)
        return meta

    # partition-pruned probe of this run's own partition: free when
    # the partition is absent (the normal case), batch-sized when a
    # crashed attempt left it behind
    existing = (spark.read.parquet(f"{path}/bands")
                .filter(F.col("run_id") == run_id)
                .select("doc_id", "band_id", "band_key"))
    n_existing = existing.count()
    if n_existing > 0:
        b = doc_bands(batch, band_rows=meta["band_rows"],
                      k=meta["shingle_k"]).localCheckpoint(eager=True)
        try:
            same = (b.count() == n_existing
                    and existing.exceptAll(b).limit(1).count() == 0)
        finally:
            b.unpersist()
        if same:
            # previous run crashed between the bands append and the
            # meta write — the batch is fully on disk; finish the
            # commit without re-appending
            return _commit(meta)
        raise RuntimeError(
            f"append_to_neardup_index at {path}: run_id={run_id} "
            f"partition already holds {n_existing} band rows that do "
            "not match this batch — run_id collision or partial "
            "write; rebuild the index (build_neardup_if_stale)")
    b = doc_bands(batch, band_rows=meta["band_rows"],
                  k=meta["shingle_k"])
    (b.withColumn("run_id", F.lit(run_id))
        .write.mode("append").partitionBy("run_id")
        .parquet(f"{path}/bands"))
    return _commit(meta)


def candidate_pairs(batch: DataFrame, path: str, *,
                    run_id: int | None = None,
                    include_batch: bool = False) -> DataFrame:
    """(batch_doc, corpus_doc) DISTINCT candidate pairs: the batch's
    band keys hash-joined against the standing bands. ``run_id``
    bounds the standing side to runs < run_id (the crash-idempotence
    filter); None reads everything. Self-pairs are dropped.

    ``include_batch=True`` additionally self-joins the batch's OWN
    band keys (VERDICT r10 item #5: two near-dup docs arriving in the
    SAME batch are otherwise invisible until the next run) — emitted
    once per unordered pair as (min_id, max_id). Bounded: the self
    side is batch-sized, never corpus-sized. The default stays
    batch-vs-history because the ingest funnel's fingerprint gate
    (funnel_store stage 2) already owns intra-batch dedup when both
    run in one pipeline.

    Scale: one batch signature pass + one equi-join on 40 B keys —
    the candidate step never touches text, and the join output is the
    candidate set itself (verify downstream at pair grain)."""
    spark = batch.sparkSession
    meta = load_meta(spark, path)
    standing = spark.read.parquet(f"{path}/bands")
    if run_id is not None:
        standing = standing.filter(F.col("run_id") < run_id)
    qb = doc_bands(batch, band_rows=meta["band_rows"],
                   k=meta["shingle_k"])
    if include_batch:
        # one signature pass feeds both joins
        qb = qb.localCheckpoint(eager=True)
    pairs = (
        qb.select(F.col("doc_id").alias("batch_doc"),
                  "band_id", "band_key")
        .join(standing.select(F.col("doc_id").alias("corpus_doc"),
                              "band_id", "band_key"),
              ["band_id", "band_key"])
        .filter(F.col("batch_doc") != F.col("corpus_doc"))
        .select("batch_doc", "corpus_doc")
    )
    if include_batch:
        self_side = qb.select(F.col("doc_id").alias("corpus_doc"),
                              "band_id", "band_key")
        intra = (
            qb.select(F.col("doc_id").alias("batch_doc"),
                      "band_id", "band_key")
            .join(self_side, ["band_id", "band_key"])
            .filter(F.col("batch_doc") < F.col("corpus_doc"))
            .select("batch_doc", "corpus_doc")
        )
        pairs = pairs.unionByName(intra)
    return pairs.distinct()


def compact_neardup_index(spark: SparkSession, path: str, *,
                          upto_run: int | None = None,
                          lock_timeout: float = 600.0) -> dict:
    """Fold band partitions with run_id < ``upto_run`` (default: all
    runs) into run_id=0 — the small-file compaction for a standing
    index that has accrued one partition per ingest run (VERDICT r10
    item #4: after N runs the candidate join reads N small partitions;
    at a run per day that is file-count death by a thousand cuts).

    Folding preserves probe semantics exactly: compacted keys carry
    run_id=0, which every future ``candidate_pairs(run_id=N)`` filter
    (run_id < N, N >= 1) admits, same as the runs they replace; runs
    >= ``upto_run`` keep their partitions so in-flight crash-retry
    windows stay intact. Duplicate band rows (possible only from
    pre-self-heal crashed appends) are dropped — compaction is the
    natural point to restore the rows == 4 x docs invariant.

    Single-writer maintenance op (takes the build lock; run it
    quiesced, like VACUUM). The rewrite is swap-committed: the new
    table lands beside the old and replaces it with two renames, so a
    crash leaves either the old or the new layout, never a mix."""
    import os
    import shutil

    from .store_lock import build_lock

    with build_lock(path, timeout=lock_timeout):
        meta = load_meta(spark, path)
        bands = spark.read.parquet(f"{path}/bands")
        if upto_run is None:
            upto_run = (bands.agg(F.max("run_id")).first()[0] or 0) + 1
        fold = (bands.filter(F.col("run_id") < upto_run)
                .select("doc_id", "band_id", "band_key").distinct()
                .withColumn("run_id", F.lit(0)))
        keep = bands.filter(F.col("run_id") >= upto_run) \
            .select("doc_id", "band_id", "band_key", "run_id")
        tmp = f"{path}/bands.compact.tmp"
        (fold.unionByName(keep)
            .repartition("run_id")
            .write.mode("overwrite").partitionBy("run_id").parquet(tmp))
        old = f"{path}/bands.compact.old"
        os.rename(f"{path}/bands", old)
        os.rename(tmp, f"{path}/bands")
        shutil.rmtree(old)
        return _recount_meta(spark, path, meta)


def expire_neardup_run(spark: SparkSession, path: str, *,
                       run_id: int, new_fingerprint: str,
                       lock_timeout: float = 600.0) -> dict:
    """Drop ONE run's band keys — the retention/right-to-erasure path
    for a standing index (VERDICT r10 item #4): a run's documents
    leave the candidate structure by deleting its hive partition, an
    O(1) directory drop, not a table rewrite. The corpus identity
    changes, so the caller supplies the successor fingerprint.

    run_id=0 is refused: the bootstrap/compacted partition holds many
    runs' keys — expire those docs by rebuilding from the retained
    corpus instead."""
    import shutil

    from .store_lock import build_lock

    if run_id < 1:
        raise ValueError(
            "expire_neardup_run: run_id must be >= 1 (partition 0 is "
            "the bootstrap/compacted history — rebuild to erase it)")
    with build_lock(path, timeout=lock_timeout):
        meta = load_meta(spark, path)
        part = f"{path}/bands/run_id={run_id}"
        shutil.rmtree(part)  # missing partition raises — loud by design
        meta = dict(meta)
        meta["source_fingerprint"] = new_fingerprint
        return _recount_meta(spark, path, meta)


def _recount_meta(spark: SparkSession, path: str, meta: dict) -> dict:
    meta = dict(meta)
    meta["n_docs"] = (spark.read.parquet(f"{path}/bands")
                      .select("doc_id").distinct().count())
    _write_meta(spark, path, meta)
    return meta
