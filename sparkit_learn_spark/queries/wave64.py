"""Round-6 wave 64: single-bin DFT — the weekly-frequency Fourier
coefficient of the daily-revenue series, with the 7 roots of unity
precomputed in Python and inlined as identical literals in both
engines (no runtime trig parity risk). Exactly DuckDB-oracled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# the 7 weekly roots of unity, as exact literal strings shared by both
# engines: phase index = (day-number mod 7)
_COS = [repr(math.cos(2 * math.pi * k / 7)) for k in range(7)]
_SIN = [repr(math.sin(2 * math.pi * k / 7)) for k in range(7)]
_COS_CASE = " ".join(
    f"WHEN {k} THEN {c}" for k, c in enumerate(_COS)
)
_SIN_CASE = " ".join(
    f"WHEN {k} THEN {s}" for k, s in enumerate(_SIN)
)


@register(
    "q_ts_dft_weekly",
    oracle=f"""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rev) AS BIGINT) AS s FROM day),
    terms AS (
        SELECT CAST(ROUND(1e3 * (day.rev - m.s / CAST(m.n AS DOUBLE))
                    * CASE date_diff('day', DATE '1995-01-01', day.d) % 7
                      {_COS_CASE} END) AS BIGINT) AS re_u,
               CAST(ROUND(1e3 * (day.rev - m.s / CAST(m.n AS DOUBLE))
                    * CASE date_diff('day', DATE '1995-01-01', day.d) % 7
                      {_SIN_CASE} END) AS BIGINT) AS im_u
        FROM day CROSS JOIN m),
    coef AS (
        SELECT CAST(SUM(re_u) AS BIGINT) AS re_su,
               CAST(SUM(im_u) AS BIGINT) AS im_su,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM terms)
    SELECT n AS n_days,
           ROUND(re_su / 1e3 / n, 6) AS dft_real,
           ROUND(im_su / 1e3 / n, 6) AS dft_imag,
           ROUND(SQRT((re_su / 1e3 / n) * (re_su / 1e3 / n)
                      + (im_su / 1e3 / n) * (im_su / 1e3 / n)), 6)
               AS weekly_amplitude_cents
    FROM coef
    """,
)
def q_ts_dft_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin discrete Fourier transform at the weekly frequency:
    the mean-removed daily-revenue series projected onto cos/sin of
    period 7 — the Goertzel-style one-frequency probe that quantifies
    HOW STRONG the weekly cycle is in revenue-cents units
    (q_ts_autoperiod finds WHICH period; this measures the chosen
    one's amplitude and phase components). The 7 roots of unity are
    precomputed in Python and inlined as IDENTICAL literals in both
    engines — no runtime trig whose last-ulp could differ — and each
    day's term quantizes to milli-units so the projection sums are
    exact and order-free.

    Scale: day-grain series after one map-side aggregate; the
    projection is a row-local multiply by one of 7 constants and two
    scalar sums — a full K-bin spectrum is K independent copies of
    the same shape."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    m = day.agg(F.count("*").alias("n"), F.sum("rev").alias("s"))
    phase = F.datediff("d", F.lit("1995-01-01")) % 7
    cos_expr = None
    sin_expr = None
    for k in range(7):
        c = float(_COS[k])
        si = float(_SIN[k])
        cos_expr = (
            F.when(phase == k, c)
            if cos_expr is None
            else cos_expr.when(phase == k, c)
        )
        sin_expr = (
            F.when(phase == k, si)
            if sin_expr is None
            else sin_expr.when(phase == k, si)
        )
    centered = F.col("rev") - F.col("s") / F.col("n").cast("double")
    terms = day.crossJoin(F.broadcast(m)).select(
        F.round(1e3 * centered * cos_expr).cast("long").alias("re_u"),
        F.round(1e3 * centered * sin_expr).cast("long").alias("im_u"),
    )
    coef = terms.agg(
        F.sum("re_u").alias("re_su"),
        F.sum("im_u").alias("im_su"),
        F.count("*").alias("n"),
    )
    re = F.col("re_su") / 1e3 / F.col("n")
    im = F.col("im_su") / 1e3 / F.col("n")
    return coef.select(
        F.col("n").alias("n_days"),
        F.round(re, 6).alias("dft_real"),
        F.round(im, 6).alias("dft_imag"),
        F.round(F.sqrt(re * re + im * im), 6).alias(
            "weekly_amplitude_cents"
        ),
    )
