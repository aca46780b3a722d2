"""Upsample the driver-generated testdata to a larger scale factor by
key-shifted replication, preserving referential integrity.

Each replica i shifts every primary/foreign key by i x max(key) so
joins land on exactly one replica (no cross-replica fan-out) and the
join selectivity per key stays identical to the source scale --
timings scale linearly with the factor, which is the point: a query
whose wall time grows FASTER than the factor has hit a scale cliff
(broadcast threshold, skew, quadratic candidate growth).

Documents get a per-replica suffix token appended (and n_chars
recomputed) so replicas are near- but not exact-duplicates: shingle
document frequencies multiply by the factor, deliberately stressing
the viral-shingle df cap exactly the way boilerplate text does at
100 TB. Embeddings are replicated verbatim (shifted vec_id): ANN
recall semantics change (each vector gains factor-1 perfect
neighbors) but throughput shape does not.

Usage: python tools/gen_scale.py [--src DIR] [--out DIR] [--factor N]
DuckDB does the rewrite (columnar, zero Spark startup); ~seconds for
factor 10 over sf0.1.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

#: table -> {column: key-space table.column whose max is the shift unit}
KEY_SHIFTS: dict[str, dict[str, tuple[str, str]]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}

#: dimension tables copied as-is (TPC-H does not scale them either)
UNSCALED = {"region", "nation"}


def generate(src: str, out: str, factor: int) -> None:
    con = duckdb.connect()
    outp = Path(out)
    outp.mkdir(parents=True, exist_ok=True)

    maxes: dict[tuple[str, str], int] = {}
    for shifts in KEY_SHIFTS.values():
        for table, col in shifts.values():
            if (table, col) not in maxes:
                maxes[(table, col)] = con.sql(
                    f"SELECT MAX({col}) FROM '{src}/{table}.parquet'"
                ).fetchone()[0]

    for table, shifts in KEY_SHIFTS.items():
        src_file = f"{src}/{table}.parquet"
        dst_file = outp / f"{table}.parquet"
        if table in UNSCALED:
            con.sql(f"COPY (SELECT * FROM '{src_file}') TO '{dst_file}' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        exprs = []
        for c in cols:
            if c in shifts:
                unit = maxes[shifts[c]]
                exprs.append(f"({c} + i * {unit}) AS {c}")
            elif table == "documents" and c == "text":
                # near-dup (not exact-dup) replicas: one suffix token
                exprs.append(
                    "CASE WHEN i = 0 THEN text"
                    " ELSE text || ' rep' || CAST(i AS VARCHAR) END AS text"
                )
            elif table == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN i = 0 THEN n_chars"
                    " ELSE n_chars + 5 + CAST(i >= 10 AS BIGINT) END AS n_chars"
                )
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src_file}' "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS i) "
            f"ORDER BY i) TO '{dst_file}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dst_file}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    generate(a.src, a.out, a.factor)
