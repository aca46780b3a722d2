"""Round-6 wave 51: EXACTLY-ORACLED probabilistic sketches — an HLL
(p=10) whose registers, estimate, and error are bit-identical across
engines (portable multiplicative hash + string-binary bit_length, no
engine log2 at integer boundaries), a Bloom filter with measured vs
theoretical false-positive rate, and a Count-Min sketch with probe
estimates vs exact counts. Unlike engine-native approx aggregates
(rows-only checks), these verify the SKETCH CONSTRUCTION itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# portable 32-bit multiplicative hash of an integer key
_H32 = "(({k} * 2654435761) % 4294967296)"


@register(
    "q_sketch_hll_portable",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT o_custkey AS x FROM orders),
    hashed AS (
        SELECT {_H32.format(k='x')} // 4194304 AS bucket,
               {_H32.format(k='x')} % 4194304 AS rem
        FROM keys),
    regs AS (
        SELECT bucket,
               MAX(CASE WHEN rem = 0 THEN 23
                        ELSE 22 - length(bin(CAST(rem AS BIGINT))) + 1
                   END) AS rho
        FROM hashed GROUP BY bucket),
    est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nonzero,
               SUM(POWER(2.0, -rho)) AS harm
        FROM regs),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_d FROM keys)
    SELECT e.n_nonzero,
           CAST(ROUND(0.7213 / (1 + 1.079 / 1024) * 1024 * 1024
                / (e.harm + (1024 - e.n_nonzero))) AS BIGINT)
               AS hll_estimate,
           x.exact_d,
           ROUND((0.7213 / (1 + 1.079 / 1024) * 1024 * 1024
                  / (e.harm + (1024 - e.n_nonzero)) - x.exact_d)
                 / x.exact_d, 6) AS rel_error
    FROM est e CROSS JOIN ex x
    """,
)
def q_sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-verified HyperLogLog (p=10, 1024 registers):
    bucket = top 10 hash bits, rho = leading-zero rank of the
    remaining 22 bits computed via the BINARY-STRING length (length
    of bin(rem)) — pure integer/string ops, because floor(log2(2^k))
    computed as log/ln is off-by-one at exact powers of two in IEEE —
    registers reduce by MAX, and the classical alpha-corrected
    harmonic estimate (with the zero-register linear-counting term
    folded in) is one deterministic double expression. Both engines
    build the IDENTICAL sketch — this oracles the construction, which
    rows-only checks on engine-native approx_count_distinct cannot.

    Scale: register build is one map-side-combining MAX aggregate at
    1024-bucket grain — the textbook distributed-HLL merge (register
    MAX is the sketch union); the estimate is a 1024-row fold."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("x")).distinct()
    h = F.expr(_H32.format(k="x"))
    hashed = keys.select(
        (h / 4194304).cast("long").alias("bucket"),
        (h % 4194304).alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, 23).otherwise(
        22 - F.length(F.expr("bin(rem)")) + 1
    )
    regs = hashed.groupBy("bucket").agg(F.max(rho).alias("rho"))
    est = regs.agg(
        F.count("*").alias("n_nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("harm"),
    )
    ex = keys.agg(F.count("*").alias("exact_d"))
    raw = (
        0.7213
        / (1 + 1.079 / 1024)
        * 1024
        * 1024
        / (F.col("harm") + (1024 - F.col("n_nonzero")))
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "n_nonzero",
        F.round(raw).cast("long").alias("hll_estimate"),
        "exact_d",
        F.round((raw - F.col("exact_d")) / F.col("exact_d"), 6).alias(
            "rel_error"
        ),
    )


@register(
    "q_sketch_bloom_portable",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS x FROM orders),
    bits AS (
        SELECT DISTINCT bit FROM (
            SELECT ((x * 2654435761 + 12345) % 4294967296) % 65536
                AS bit FROM members
            UNION ALL
            SELECT ((x * 40503 + 54321) % 4294967296) % 65536
            FROM members
            UNION ALL
            SELECT ((x * 2246822519 + 98765) % 4294967296) % 65536
            FROM members)),
    setbits AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_set FROM bits),
    probes AS (
        SELECT x + 10000000 AS y FROM members),
    fp AS (
        SELECT CAST(SUM(CASE WHEN
            EXISTS (SELECT 1 FROM bits b WHERE b.bit =
                ((y * 2654435761 + 12345) % 4294967296) % 65536)
            AND EXISTS (SELECT 1 FROM bits b WHERE b.bit =
                ((y * 40503 + 54321) % 4294967296) % 65536)
            AND EXISTS (SELECT 1 FROM bits b WHERE b.bit =
                ((y * 2246822519 + 98765) % 4294967296) % 65536)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
               CAST(COUNT(*) AS BIGINT) AS n_probes
        FROM probes),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM members)
    SELECT s.n_set, f.n_fp, f.n_probes,
           ROUND(f.n_fp / CAST(f.n_probes AS DOUBLE), 6)
               AS measured_fpr,
           ROUND(POWER(s.n_set / 65536.0, 3), 6) AS predicted_fpr
    FROM setbits s CROSS JOIN fp f CROSS JOIN n
    """,
)
def q_sketch_bloom_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-verified Bloom filter: the customer-key set
    inserted into a 65536-bit filter through THREE portable affine
    hashes, then probed with a disjoint key range — reporting set-bit
    count, measured false-positive rate, and the occupancy-based
    prediction (bits_set/m)^k they should (and do) agree with. Both
    engines build the identical bit set, so the FPR is exact, not a
    property-test bound — the verification the bloom-prune join
    (q_join_bloom_prune) rests on.

    Scale: the bit set is a distinct-aggregate at bit grain (≤65536
    rows — broadcastable), probes are a semi-join per hash against
    it; a production filter packs the same bits into LONG lanes
    (operators' bloom does) — this query verifies the MATH, the
    packing is representation."""
    o = load_table(spark, sf_dir, "orders")
    members = o.select(F.col("o_custkey").alias("x")).distinct()

    def bit(col, a, b):
        return ((col * a + b) % 4294967296) % 65536

    bits = (
        members.select(bit(F.col("x"), 2654435761, 12345).alias("bit"))
        .unionAll(
            members.select(bit(F.col("x"), 40503, 54321).alias("bit"))
        )
        .unionAll(
            members.select(
                bit(F.col("x"), 2246822519, 98765).alias("bit")
            )
        )
        .distinct()
    )
    setbits = bits.agg(F.count("*").alias("n_set"))
    probes = members.select((F.col("x") + 10000000).alias("y"))
    p1 = probes.join(
        bits, bit(F.col("y"), 2654435761, 12345) == F.col("bit"), "left_semi"
    )
    p2 = p1.join(
        bits, bit(F.col("y"), 40503, 54321) == F.col("bit"), "left_semi"
    )
    p3 = p2.join(
        bits,
        bit(F.col("y"), 2246822519, 98765) == F.col("bit"),
        "left_semi",
    )
    fp = p3.agg(F.count("*").alias("n_fp"))
    n_probes = probes.agg(F.count("*").alias("n_probes"))
    return (
        setbits.crossJoin(F.broadcast(fp))
        .crossJoin(F.broadcast(n_probes))
        .select(
            "n_set",
            "n_fp",
            "n_probes",
            F.round(
                F.col("n_fp") / F.col("n_probes").cast("double"), 6
            ).alias("measured_fpr"),
            F.round(F.pow(F.col("n_set") / 65536.0, 3), 6).alias(
                "predicted_fpr"
            ),
        )
    )


@register(
    "q_sketch_cms_portable",
    oracle="""
    WITH ev AS (
        SELECT user_id AS x FROM events),
    cells AS (
        SELECT j, ((x * a + b) % 4294967296) % 1024 AS col,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ev CROSS JOIN (
            SELECT 0 AS j, 2654435761 AS a, 12345 AS b
            UNION ALL SELECT 1, 40503, 54321
            UNION ALL SELECT 2, 2246822519, 98765
            UNION ALL SELECT 3, 3266489917, 13579) h
        GROUP BY j, col),
    probe_keys AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM ev GROUP BY x
        ORDER BY exact_cnt DESC, x LIMIT 10),
    est AS (
        SELECT p.x, p.exact_cnt,
               MIN(c.cnt) AS cms_estimate
        FROM probe_keys p
        CROSS JOIN (
            SELECT 0 AS j, 2654435761 AS a, 12345 AS b
            UNION ALL SELECT 1, 40503, 54321
            UNION ALL SELECT 2, 2246822519, 98765
            UNION ALL SELECT 3, 3266489917, 13579) h
        JOIN cells c ON c.j = h.j
                    AND c.col = ((p.x * h.a + h.b) % 4294967296) % 1024
        GROUP BY p.x, p.exact_cnt)
    SELECT x AS user_id, exact_cnt, cms_estimate,
           CAST(cms_estimate - exact_cnt AS BIGINT) AS overcount
    FROM est
    """,
)
def q_sketch_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-verified Count-Min sketch (4×1024, portable affine
    hashes): event counts folded into the grid, then the top-10 users
    probed — CMS estimate = MIN over the 4 rows' cells, reported
    beside the exact count with the (always ≥ 0) overcount. Both
    engines build the identical grid, so the estimates match exactly
    — construction-level verification the pytest-bounded native
    sketch (q_llm_countmin_freq) can't give.

    Scale: the grid is a (4·1024)-cell aggregate with map-side
    combining (cell merge = addition, the CMS union law); probes join
    the dictionary-sized grid by cell key. The probe set is a
    bounded top-k, not the full key space."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(F.col("user_id").alias("x"))
    hashes = [
        (0, 2654435761, 12345),
        (1, 40503, 54321),
        (2, 2246822519, 98765),
        (3, 3266489917, 13579),
    ]
    cells = None
    for j, a, b in hashes:
        c = ev.groupBy(
            (((F.col("x") * a + b) % 4294967296) % 1024).alias("col")
        ).agg(F.count("*").alias("cnt")).select(
            F.lit(j).alias("j"), "col", "cnt"
        )
        cells = c if cells is None else cells.unionByName(c)
    probe_keys = (
        ev.groupBy("x")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "x")
        .limit(10)
    )
    est = None
    for j, a, b in hashes:
        cj = cells.filter(F.col("j") == j).select(
            "col", F.col("cnt").alias(f"cnt{j}")
        )
        probe_keys = probe_keys.join(
            F.broadcast(cj),
            (((F.col("x") * a + b) % 4294967296) % 1024) == F.col("col"),
        ).drop("col")
    return probe_keys.select(
        F.col("x").alias("user_id"),
        "exact_cnt",
        F.least("cnt0", "cnt1", "cnt2", "cnt3").alias("cms_estimate"),
        (F.least("cnt0", "cnt1", "cnt2", "cnt3") - F.col("exact_cnt"))
        .cast("long")
        .alias("overcount"),
    )
