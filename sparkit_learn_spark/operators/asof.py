"""Generic as-of join — an operator Spark lacks natively.

Union-style implementation (no pairwise candidate explosion): tag
both inputs, sort once per key by event time, and carry the most
recent right-side payload forward with last(ignoreNulls). One shuffle
on the key, linear state — the same plan as q_join_asof but
generalized to any two tables (cf. DuckDB ASOF JOIN / pandas
merge_asof / kdb aj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str, right_ts: str,
              inclusive: bool = True,
              payload_prefix: str = "asof_") -> DataFrame:
    """For every left row, attach the latest right row with
    right_ts <= left_ts (inclusive) or < left_ts (strict), per ``on``
    key. Right payload columns come back prefixed; left rows with no
    prior right row keep NULL payloads (left-outer semantics).
    """
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias("_asof_ts"), *[F.col(c) for c in payload_cols]
    )

    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_payload", F.lit(None).cast(
        right.select(payload.alias("p")).schema["p"].dataType
    ))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    # right rows sort before left rows at equal ts => inclusive match;
    # strict mode sorts them after and excludes same-ts rights
    r_side_order = 0 if inclusive else 2
    merged = l_tag.unionByName(
        r_tag.withColumn("_side", F.lit(r_side_order)), allowMissingColumns=True
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, -1 if not inclusive else 0)
    )
    carried = merged.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).drop("_ts", "_side", "_payload")
    out = out.withColumn(f"{payload_prefix}ts", F.col("_match._asof_ts"))
    for c in payload_cols:
        out = out.withColumn(f"{payload_prefix}{c}", F.col(f"_match.{c}"))
    return out.drop("_match")
