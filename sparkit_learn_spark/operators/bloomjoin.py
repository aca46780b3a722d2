"""Broadcast Bloom-filter semi-join pruning.

Spark's runtime row-level filtering injects exactly this shape when
``spark.sql.optimizer.runtime.bloomFilter.enabled`` fires, but the
aggregate it rides on (``bloom_filter_agg``) is not a public SQL
function — so this operator builds the same artifact from public
primitives: ``n_hashes`` xxhash64 probes into an ``n_bits``-bit
bitset held as one ``array<bigint>`` row.

Build (dim side, small by premise): distinct keys → explode the k
probe positions → groupBy 64-bit word index → ``bit_or`` of in-word
masks → densify against ``range(n_words)`` → ONE row holding the
array (n_bits/64 longs, ≤ a few KiB). Probe (fact side): the one-row
array is crossJoin-broadcast and each row runs k pure-codegen bit
tests — **the 100 TB fact side never shuffles for the pruning step**;
only surviving candidates enter the exact semi-join that removes
Bloom false positives, so the result is EXACTLY the semi-join's.

No driver collect anywhere: the bitset assembles with a bounded
(n_words-row) ``collect_list`` aggregation inside the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_candidates(fact: DataFrame, dim_keys: DataFrame, fact_key: str,
                     *, n_bits: int = 8192, n_hashes: int = 3) -> DataFrame:
    """Probe-only stage of :func:`bloom_semi_join`: fact rows whose key
    passes every Bloom bit test. Contains ALL true members (a Bloom
    filter has no false negatives) plus ~(1-e^{-kn/m})^k false
    positives; callers needing exactness must verify with the real
    semi-join (which :func:`bloom_semi_join` does). Exposed separately
    so tests can measure the bit arithmetic's selectivity directly.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    if len(dim_keys.columns) != 1:
        raise ValueError("dim_keys must have exactly one column")
    n_words = n_bits // 64
    keys = dim_keys.select(F.col(dim_keys.columns[0]).alias("_k")).distinct()

    positions = keys.select(
        F.explode(F.array(*[
            F.pmod(F.xxhash64("_k", F.lit(i)), F.lit(n_bits)).alias(f"p{i}")
            for i in range(n_hashes)
        ])).alias("p")
    )
    words = positions.groupBy(
        F.expr("CAST(p DIV 64 AS INT)").alias("w")
    ).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))")
         .alias("bits")
    )
    dense = (
        fact.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    bitset = dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda s: s["bits"],
        ).alias("_bloom")
    )

    def probe(i: int) -> str:
        p = f"pmod(xxhash64({fact_key}, {i}), {n_bits})"
        return (f"(element_at(_bloom, CAST({p} DIV 64 AS INT) + 1) & "
                f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0")

    return (
        fact.join(F.broadcast(bitset))
        .filter(F.expr(" AND ".join(probe(i) for i in range(n_hashes))))
        .drop("_bloom")
    )


def bloom_semi_join(fact: DataFrame, dim_keys: DataFrame, fact_key: str,
                    *, n_bits: int = 8192, n_hashes: int = 3) -> DataFrame:
    """Semi-join ``fact`` to the single-column key frame ``dim_keys``,
    pruning fact rows through a broadcast Bloom bitset before the
    exact join. Result rows == ``fact LEFT SEMI JOIN dim_keys``.

    ``dim_keys`` must have exactly one column, type-identical to
    ``fact[fact_key]`` (xxhash64 is type-sensitive).
    """
    candidates = bloom_candidates(
        fact, dim_keys, fact_key, n_bits=n_bits, n_hashes=n_hashes
    )
    keys = dim_keys.select(F.col(dim_keys.columns[0]).alias("_k")).distinct()
    return candidates.join(
        F.broadcast(keys), candidates[fact_key] == keys["_k"], "left_semi"
    )
