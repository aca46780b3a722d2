"""Round-8 wave 136: storage-layout and incremental-maintenance depth
— zone-map pruning effectiveness of a Z-order layout vs arrival order
(the measurement justifying OPTIMIZE ZORDER at 100 TB), file-overlap
clustering depth on a sort key (the table-health metric behind
compaction planners), and incremental aggregate maintenance with
DELETES (retraction algebra: base + inserts − deletes ≡ full
refresh). All exactly DuckDB-oracled in integer space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.ranking import global_row_number
from ..registry import register
from .wave13 import _morton_expr_spark, _morton_expr_sql

#: rows per simulated file chunk (the parquet row-group stand-in).
CHUNK = 1000

#: canonical 2-D predicate for the pruning measurement.
CK_LO, CK_HI = 1000, 4999
DAY_LO, DAY_HI = 1000, 1399


@register(
    "q_maint_zorder_pruning",
    oracle=f"""
    WITH k AS (
        SELECT o_orderkey,
               CAST(o_custkey % 65536 AS BIGINT) AS ck16,
               CAST(DATE_DIFF('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
        FROM orders),
    z AS (
        SELECT k.*, CAST({_morton_expr_sql("ck16", "day_num")} AS BIGINT)
                        AS zcode
        FROM k),
    laid AS (
        SELECT 'arrival' AS layout, ck16, day_num,
               (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // {CHUNK}
                   AS fid
        FROM z
        UNION ALL
        SELECT 'zorder' AS layout, ck16, day_num,
               (ROW_NUMBER() OVER (ORDER BY zcode, o_orderkey) - 1)
                   // {CHUNK} AS fid
        FROM z),
    zone AS (
        SELECT layout, fid,
               MIN(ck16) AS ck_min, MAX(ck16) AS ck_max,
               MIN(day_num) AS d_min, MAX(day_num) AS d_max
        FROM laid GROUP BY 1, 2),
    flagged AS (
        SELECT layout,
               CASE WHEN ck_max < {CK_LO} OR ck_min > {CK_HI}
                      OR d_max < {DAY_LO} OR d_min > {DAY_HI}
                    THEN 1 ELSE 0 END AS pruned
        FROM zone)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(pruned) AS BIGINT) AS files_pruned,
           CAST(COUNT(*) - SUM(pruned) AS BIGINT) AS files_scanned,
           ROUND(CAST(SUM(pruned) AS DOUBLE) / COUNT(*), 6) AS prune_rate
    FROM flagged GROUP BY layout ORDER BY layout
    """,
)
def q_maint_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning effectiveness, measured: lay orders out in
    {CHUNK}-row files twice — arrival order vs Z-order on (customer,
    day) — build each file's min/max zone maps, and count how many
    files a canonical 2-D predicate can skip under each layout. The
    number that justifies (or refutes) an OPTIMIZE ZORDER pass before
    a 100 TB scan-heavy workload: arrival-ordered files straddle the
    whole customer range so almost nothing prunes; Z-ordered files are
    compact rectangles in (ck, day) space.

    Scale: the chunking window is the sf-fixture stand-in for real
    file boundaries (production reads them from parquet footers —
    metadata-grain, no data pass); zone maps and the prune test are
    file-grain."""
    o = load_table(spark, sf_dir, "orders")
    k = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("long").alias("ck16"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("long").alias("day_num"),
    )
    z = k.withColumn(
        "zcode", _morton_expr_spark(F.col("ck16"), F.col("day_num"))
    )
    # global row numbers via the distributed two-pass ranking — a
    # bare Window.orderBy here would plan a SinglePartition stage,
    # the exact straggler this layout work exists to avoid at 100 TB
    arrival = global_row_number(z, ["o_orderkey"], name="rn").select(
        F.lit("arrival").alias("layout"), "ck16", "day_num",
        ((F.col("rn") - 1) / CHUNK).cast("long").alias("fid"),
    )
    zord = global_row_number(z, ["zcode", "o_orderkey"], name="rn").select(
        F.lit("zorder").alias("layout"), "ck16", "day_num",
        ((F.col("rn") - 1) / CHUNK).cast("long").alias("fid"),
    )
    zone = (
        arrival.unionAll(zord)
        .groupBy("layout", "fid")
        .agg(
            F.min("ck16").alias("ck_min"), F.max("ck16").alias("ck_max"),
            F.min("day_num").alias("d_min"), F.max("day_num").alias("d_max"),
        )
    )
    flagged = zone.select(
        "layout",
        F.when(
            (F.col("ck_max") < CK_LO) | (F.col("ck_min") > CK_HI)
            | (F.col("d_max") < DAY_LO) | (F.col("d_min") > DAY_HI),
            1,
        ).otherwise(0).alias("pruned"),
    )
    return (
        flagged.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("pruned").alias("files_pruned"),
            (F.count(F.lit(1)) - F.sum("pruned")).alias("files_scanned"),
            F.round(
                F.sum("pruned").cast("double") / F.count(F.lit(1)), 6
            ).alias("prune_rate"),
        )
        .orderBy("layout")
    )


@register(
    "q_maint_clustering_depth",
    oracle=f"""
    WITH laid AS (
        SELECT 'arrival' AS layout, o_custkey,
               (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // {CHUNK}
                   AS fid
        FROM orders
        UNION ALL
        SELECT 'clustered' AS layout, o_custkey,
               (ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1)
                   // {CHUNK} AS fid
        FROM orders),
    files AS (
        SELECT layout, fid, MIN(o_custkey) AS lo, MAX(o_custkey) AS hi
        FROM laid GROUP BY 1, 2),
    events AS (
        SELECT layout, lo AS pos, 1 AS delta FROM files
        UNION ALL
        SELECT layout, hi + 1 AS pos, -1 FROM files),
    swept AS (
        SELECT layout, delta,
               SUM(delta) OVER (PARTITION BY layout
                                ORDER BY pos, delta ASC
                                ROWS UNBOUNDED PRECEDING) AS depth
        FROM events),
    starts AS (SELECT layout, depth FROM swept WHERE delta = 1)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           ROUND(AVG(depth), 6) AS avg_depth
    FROM starts GROUP BY layout ORDER BY layout
    """,
)
def q_maint_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering depth on the sort key (the compaction-planner
    health metric, cf. Delta OPTIMIZE / Iceberg rewrite strategies):
    treat each {CHUNK}-row file's [min, max] customer-key range as an
    interval and sweep for overlap depth — how many files a point
    lookup on the key must open. Arrival-ordered files all span the
    whole key range (depth ≈ n_files); a clustered layout's depth
    collapses toward 1. Reported per layout from the same sweep.

    Scale: intervals are file-grain metadata (two events per file);
    the sweep is a running sum over 2·n_files rows — the measurement
    costs nothing next to the table it describes."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    arrival = global_row_number(o, ["o_orderkey"], name="rn").select(
        F.lit("arrival").alias("layout"), "o_custkey",
        ((F.col("rn") - 1) / CHUNK).cast("long").alias("fid"),
    )
    clustered = global_row_number(
        o, ["o_custkey", "o_orderkey"], name="rn"
    ).select(
        F.lit("clustered").alias("layout"), "o_custkey",
        ((F.col("rn") - 1) / CHUNK).cast("long").alias("fid"),
    )
    files = (
        arrival.unionAll(clustered)
        .groupBy("layout", "fid")
        .agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi"))
    )
    events = files.select(
        "layout", F.col("lo").alias("pos"), F.lit(1).alias("delta")
    ).unionAll(
        files.select("layout", (F.col("hi") + 1).alias("pos"),
                     F.lit(-1).alias("delta"))
    )
    # tie order is load-bearing: ends (delta −1, at hi+1) must process
    # BEFORE starts at the same position, else two exactly-abutting
    # files ([1,4] and [5,9]) read as overlapping and the clustered
    # layout can never collapse to depth 1
    swept = events.withColumn(
        "depth",
        F.sum("delta").over(
            Window.partitionBy("layout")
            .orderBy(F.col("pos"), F.col("delta").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        swept.where(F.col("delta") == 1)
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.max("depth").cast("long").alias("max_depth"),
            F.round(F.avg("depth"), 6).alias("avg_depth"),
        )
        .orderBy("layout")
    )


@register(
    "q_ivm_retract",
    oracle="""
    WITH base AS (
        SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'),
    inserts AS (
        SELECT * FROM orders
        WHERE o_orderdate >= DATE '1997-01-01' AND o_orderkey % 2 = 0),
    deletes AS (SELECT * FROM base WHERE o_orderkey % 100 = 0),
    agg_base AS (
        SELECT o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM base GROUP BY 1),
    agg_ins AS (
        SELECT o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM inserts GROUP BY 1),
    agg_del AS (
        SELECT o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM deletes GROUP BY 1),
    ivm AS (
        SELECT b.pri,
               b.n + COALESCE(i.n, 0) - COALESCE(d.n, 0) AS n,
               b.cents + COALESCE(i.cents, 0) - COALESCE(d.cents, 0)
                   AS cents
        FROM agg_base b
        LEFT JOIN agg_ins i ON i.pri = b.pri
        LEFT JOIN agg_del d ON d.pri = b.pri),
    direct AS (
        SELECT o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM (SELECT * FROM base
              WHERE o_orderkey % 100 <> 0
              UNION ALL SELECT * FROM inserts)
        GROUP BY 1)
    SELECT ivm.pri AS o_orderpriority, ivm.n AS n_orders,
           ivm.cents AS total_cents,
           CASE WHEN ivm.n = direct.n AND ivm.cents = direct.cents
                THEN 1 ELSE 0 END AS ivm_equals_direct
    FROM ivm JOIN direct ON direct.pri = ivm.pri
    ORDER BY o_orderpriority
    """,
)
def q_ivm_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance WITH RETRACTIONS: a per-priority
    aggregate view maintained under a delta batch containing both
    inserts (new 1997+ orders) and deletes (retracted base orders) —
    new state = base + Δinserts − Δdeletes, for the subtractable
    monoid (count, integer cent sum). Emits the maintained view plus
    a per-row proof bit against the full recompute. Extends
    q_ivm_merge_law (insert-only) with the delete algebra every CDC
    pipeline needs; min/max are deliberately absent — they are NOT
    subtractable, which is exactly why production IVM keeps them in
    separate monotonic views.

    Scale: three partial aggregates at priority grain (≤5 rows) and
    broadcast joins; the delta never touches the base fact again."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    inserts = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderkey") % 2 == 0)
    )
    deletes = base.where(F.col("o_orderkey") % 100 == 0)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("pri")).agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")
        )

    b, i, d = agg(base), agg(inserts), agg(deletes)
    ivm = (
        b.join(i.withColumnRenamed("n", "ni").withColumnRenamed(
            "cents", "ci"), "pri", "left")
        .join(d.withColumnRenamed("n", "nd").withColumnRenamed(
            "cents", "cd"), "pri", "left")
        .select(
            "pri",
            (F.col("n") + F.coalesce("ni", F.lit(0))
             - F.coalesce("nd", F.lit(0))).alias("n"),
            (F.col("cents") + F.coalesce("ci", F.lit(0))
             - F.coalesce("cd", F.lit(0))).alias("cents"),
        )
    )
    direct = agg(
        base.where(F.col("o_orderkey") % 100 != 0).unionAll(inserts)
    ).withColumnRenamed("n", "n2").withColumnRenamed("cents", "c2")
    return (
        ivm.join(direct, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.col("n").alias("n_orders"),
            F.col("cents").alias("total_cents"),
            F.when(
                (F.col("n") == F.col("n2")) & (F.col("cents") == F.col("c2")),
                1,
            ).otherwise(0).alias("ivm_equals_direct"),
        )
        .orderBy("o_orderpriority")
    )
