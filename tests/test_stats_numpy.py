"""Numpy cross-checks for the round-6 statistics waves (88-97).

The DuckDB oracle gate proves Spark ≡ DuckDB; these tests prove the
SHARED formula is the right one, by recomputing each statistic from
scratch in numpy (textbook definitions, no shared code with the
queries). Catches the "same bug in both engines" class the mirror
cannot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkit_learn_spark.registry import all_queries


@pytest.fixture(scope="module")
def daily(sf_dir):
    """Daily revenue series (rounded-dollar bigints), ordered by day."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    # half-away rounding (engine ROUND semantics), not pandas banker's
    v = o.assign(v=np.floor(o.o_totalprice + 0.5).astype("int64")).groupby(
        "o_orderdate")["v"].sum().sort_index()
    return v


def test_kendall_tau_numpy(spark, sf_dir, daily):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    g = o.groupby("o_orderdate").agg(
        x=("o_totalprice", "size"),
        y=("o_totalprice", lambda s: s.round().astype("int64").sum()))
    x, y = g.x.to_numpy(float), g.y.to_numpy(float)
    n = len(x)
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    s = (sx * sy)[np.triu_indices(n, 1)].sum()
    n0 = n * (n - 1) / 2
    _, cx = np.unique(x, return_counts=True)
    _, cy = np.unique(y, return_counts=True)
    n1 = (cx * (cx - 1) / 2).sum()
    n2 = (cy * (cy - 1) / 2).sum()
    tau = s / np.sqrt((n0 - n1) * (n0 - n2))
    got = all_queries()["q_stat_kendall_tau"](spark, sf_dir).first()
    assert got["n_days"] == n
    assert abs(got["tau_b"] - tau) < 1e-5


def test_kruskal_wallis_numpy(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    v = o.o_totalprice.round().astype("int64")
    # textbook mid-ranks
    order = pd.Series(v).rank(method="average")
    n = len(v)
    h = 0.0
    for _, idx in o.groupby("o_orderpriority").groups.items():
        r = order.loc[idx]
        h += r.sum() ** 2 / len(r)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(v, return_counts=True)
    tie_c = 1 - ((counts ** 3 - counts).sum() / (n ** 3 - n))
    got = all_queries()["q_stat_kruskal_wallis"](spark, sf_dir).toPandas()
    assert abs(got.h_raw.iloc[0] - h) < 1e-4
    assert abs(got.h_adj.iloc[0] - h / tie_c) < 1e-4


def test_durbin_watson_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    t = (pd.to_datetime(daily.index.to_numpy())
         - pd.to_datetime(daily.index.min())).days.to_numpy(float)
    b, a = np.polyfit(t, v, 1)
    e = v - (a + b * t)
    dw = np.sum(np.diff(e) ** 2) / np.sum(e ** 2)
    got = all_queries()["q_stat_durbin_watson"](spark, sf_dir).first()
    assert abs(got["dw"] - dw) < 1e-5
    assert abs(got["slope"] - b) < 1e-4


def test_cooks_distance_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    t = (pd.to_datetime(daily.index.to_numpy())
         - pd.to_datetime(daily.index.min())).days.to_numpy(float)
    n = len(v)
    b, a = np.polyfit(t, v, 1)
    e = v - (a + b * t)
    sxx = ((t - t.mean()) ** 2).sum()
    h = 1.0 / n + (t - t.mean()) ** 2 / sxx
    s2 = (e ** 2).sum() / (n - 2)
    d = e ** 2 * h / (2 * s2 * (1 - h) ** 2)
    top = np.sort(d)[::-1][:10]
    got = all_queries()["q_stat_influence"](spark, sf_dir).toPandas()
    assert np.allclose(np.sort(got.cooks_d.to_numpy())[::-1], top, atol=1e-5)


def test_matrix_profile_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    m = 7
    nw = len(v) - m + 1
    wins = np.lib.stride_tricks.sliding_window_view(v, m).astype(float)
    mu = wins.mean(axis=1)
    sd = wins.std(axis=1)  # population std
    keep = sd > 0
    z = (wins - mu[:, None]) / np.where(sd == 0, 1, sd)[:, None]
    d2 = np.full((nw, nw), np.inf)
    for i in range(nw):
        if not keep[i]:
            continue
        dots = z[i] @ z.T
        dd = 2 * m * (1 - dots / m)
        dd[~keep] = np.inf
        lo, hi = max(0, i - m + 1), min(nw, i + m)
        dd[lo:hi] = np.inf
        d2[i] = np.clip(dd, 0, None)
    mp = np.sqrt(d2.min(axis=1))
    got = all_queries()["q_ts_matrix_profile"](spark, sf_dir).toPandas()
    # query windows are 1-based starts; exclusion |i-j| >= 7 == outside [i-6, i+6]
    for _, row in got.head(50).iterrows():
        i = int(row.window_start) - 1
        assert abs(row.mp_dist - mp[i]) < 1e-4, (i, row.mp_dist, mp[i])


def test_sax_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    z = (v - v.mean()) / v.std()  # population std
    sym = np.where(z < -0.6745, "a",
                   np.where(z < 0, "b", np.where(z < 0.6745, "c", "d")))
    words = "".join(sym)
    got = all_queries()["q_ts_sax"](spark, sf_dir).toPandas()
    assert "".join(got.sort_values("week").word) == words


def test_brier_decomposition_identity(spark, sf_dir):
    """REL − RES + UNC must equal the raw mean squared error — the
    Murphy identity, recomputed doc-by-doc in pandas."""
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["n_chars", "lang"])
    # half-away-from-zero 1dp rounding (engine ROUND), not numpy's banker's
    p = np.floor(np.minimum(d.n_chars, 999) / 1000.0 * 10 + 0.5) / 10
    o = (d.lang == "en").astype(float)
    brier = ((p - o) ** 2).mean()
    got = all_queries()["q_ml_brier_decomposition"](spark, sf_dir).first()
    assert abs(got["brier_score"] - brier) < 1e-6
    assert abs(
        got["reliability"] - got["resolution"] + got["uncertainty"]
        - got["brier_score"]
    ) < 5e-6


def test_linear_counting_accuracy(spark, sf_dir):
    got = all_queries()["q_sketch_linear_counting"](spark, sf_dir).first()
    assert got["rel_error"] < 0.05
    assert got["occupied_buckets"] <= got["exact_d"]


def test_savitzky_golay_is_least_squares(spark, sf_dir, daily):
    """The SG kernel must equal a local quadratic least-squares fit:
    refit a degree-2 polynomial to each 7-point neighborhood with
    numpy and compare the center value and derivative."""
    v = daily.to_numpy(float)
    got = all_queries()["q_ts_savitzky_golay"](spark, sf_dir).toPandas()
    x = np.arange(-3, 4, dtype=float)
    for k in range(min(25, len(got))):
        w = v[k:k + 7]
        c2, c1, c0 = np.polyfit(x, w, 2)
        assert abs(got.sg_smooth.iloc[k] - c0) < 1e-4
        assert abs(got.sg_deriv.iloc[k] - c1) < 1e-4


def test_fano_factor_numpy(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    hours = pd.Series(
        ev.ts.to_numpy().astype("datetime64[s]").astype("int64") // 3600
    )
    span = hours.max() - hours.min() + 1
    got = all_queries()["q_evt_fano_factor"](spark, sf_dir).toPandas()
    for _, row in got.iterrows():
        h = hours[ev.event_type == row.event_type]
        counts = h.value_counts().reindex(
            range(hours.min(), hours.max() + 1), fill_value=0).to_numpy(float)
        assert len(counts) == span
        fano = counts.var() / counts.mean()  # population variance
        assert abs(row.fano - fano) < 1e-4, (row.event_type, row.fano, fano)


def test_somers_d_equals_2auc_minus_1(spark, sf_dir):
    """Somers' D must equal 2·AUC−1 with AUC recomputed by the
    textbook pairwise definition in numpy (ties counted half)."""
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["n_chars", "lang"])
    s = d.n_chars.to_numpy(float)
    y = (d.lang == "en").to_numpy()
    pos, neg = s[y], s[~y]
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    got = all_queries()["q_ml_somers_d"](spark, sf_dir).first()
    assert abs(got["somers_d"] - (2 * auc - 1)) < 1e-5


def test_kpss_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    st = np.cumsum(v - v.mean())
    stat = (st ** 2).sum() / (len(v) ** 2 * v.var())  # population var
    got = all_queries()["q_ts_kpss"](spark, sf_dir).first()
    assert abs(got["kpss_stat"] - stat) < 1e-5


def test_breusch_pagan_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    t = (pd.to_datetime(daily.index.to_numpy())
         - pd.to_datetime(daily.index.min())).days.to_numpy(float)
    b, a = np.polyfit(t, v, 1)
    e2 = (v - (a + b * t)) ** 2
    r = np.corrcoef(t, e2)[0, 1]
    lm = len(v) * r * r
    got = all_queries()["q_stat_breusch_pagan"](spark, sf_dir).first()
    assert abs(got["bp_lm_stat"] - lm) < 1e-3


def test_gumbel_moments_numpy(spark, sf_dir, daily):
    m = daily.groupby(pd.to_datetime(
        daily.index.to_numpy()).to_period("M")).max().to_numpy(float)
    sd = m.std(ddof=1)
    beta = sd * np.sqrt(6) / np.pi
    mu = m.mean() - 0.5772156649015329 * beta
    got = all_queries()["q_stat_gumbel_maxima"](spark, sf_dir).first()
    assert got["n_months"] == len(m)
    assert abs(got["gumbel_mu"] - mu) < max(1e-3, abs(mu) * 1e-9)
    assert abs(got["gumbel_beta"] - beta) < max(1e-3, beta * 1e-9)


def test_permutation_entropy_numpy(spark, sf_dir, daily):
    v = daily.to_numpy()
    pats = {}
    for i in range(len(v) - 2):
        a, b, c = v[i], v[i + 1], v[i + 2]
        if a < b and b < c:
            p = "012"
        elif a < c and c <= b:
            p = "021"
        elif b <= a and a < c:
            p = "102"
        elif c <= a and a < b:
            p = "120"
        elif b < c and c <= a:
            p = "201"
        else:
            p = "210"
        pats[p] = pats.get(p, 0) + 1
    n = sum(pats.values())
    pe = -sum((c / n) * np.log(c / n) for c in pats.values()) / np.log(6)
    got = all_queries()["q_ts_permutation_entropy"](spark, sf_dir).toPandas()
    assert abs(got.norm_perm_entropy.iloc[0] - pe) < 1e-5
    for _, row in got.iterrows():
        assert pats[row.pattern] == row.n_windows


def test_logrank_identity(spark, sf_dir):
    """Observed+expected bookkeeping must balance: E0 summed over
    event days equals O0 when the groups are exchangeable ONLY in
    expectation — here we just assert the statistic is finite,
    non-negative, and that observed_g0 is bounded by the total
    conversions (structural sanity numpy can verify cheaply)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    got = all_queries()["q_stat_logrank"](spark, sf_dir).first()
    conv = ev[ev.event_type == "purchase"].user_id.nunique()
    assert 0 <= got["observed_g0"] <= conv
    assert got["logrank_chi2"] >= 0
    assert abs(got["expected_g0"]) < conv + 1


def _orders_status_values(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderstatus", "o_totalprice"])
    o = o[o.o_orderstatus.isin(["F", "O"])]
    v = np.floor(o.o_totalprice + 0.5).astype("int64")
    return v[o.o_orderstatus.to_numpy() == "F"].to_numpy(), \
        v[o.o_orderstatus.to_numpy() == "O"].to_numpy()


def test_cramer_von_mises_numpy(spark, sf_dir):
    a, b = _orders_status_values(sf_dir)
    pooled = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    counts = (np.searchsorted(np.sort(a), pooled, side="right")
              + np.searchsorted(np.sort(b), pooled, side="right"))
    weights = np.diff(np.concatenate([[0], counts]))
    t = len(a) * len(b) / (len(a) + len(b)) ** 2 * (
        weights * (fa - fb) ** 2).sum()
    got = all_queries()["q_stat_cramer_von_mises"](spark, sf_dir).first()
    assert abs(got["cvm_t"] - t) < 1e-4


def test_variance_ratio_numpy(spark, sf_dir, daily):
    v = daily.to_numpy(float)
    d1 = np.diff(v, 1)
    d5 = v[5:] - v[:-5]
    vr = d5.var() / (5 * d1.var())  # population variances
    got = all_queries()["q_ts_variance_ratio"](spark, sf_dir).first()
    assert abs(got["variance_ratio_5"] - vr) < 1e-4


def test_wilcoxon_signed_numpy(spark, sf_dir, daily):
    s = daily
    idx = pd.to_datetime(s.index.to_numpy())
    cur = s.to_numpy(dtype="int64")
    prev = s.reindex(idx - pd.Timedelta(days=7)).to_numpy()
    mask = ~pd.isna(prev)
    diff = cur[mask] - prev[mask].astype("int64")
    diff = diff[diff != 0]
    ranks = pd.Series(np.abs(diff)).rank(method="average").to_numpy()
    w_plus = ranks[diff > 0].sum()
    n = len(diff)
    z = (w_plus - n * (n + 1) / 4) / np.sqrt(n * (n + 1) * (2 * n + 1) / 24)
    got = all_queries()["q_stat_wilcoxon_signed"](spark, sf_dir).first()
    assert got["n_pairs"] == n
    assert abs(got["w_plus"] - w_plus) < 1e-6
    assert abs(got["z_score"] - z) < 1e-5


def test_moods_median_numpy(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    v = np.floor(o.o_totalprice + 0.5).astype("int64")
    med = np.sort(v)[(len(v) + 1) // 2 - 1]  # type-1 lower median
    got = all_queries()["q_stat_moods_median"](spark, sf_dir).toPandas()
    for _, row in got.iterrows():
        grp = v[(o.o_orderpriority == row.o_orderpriority).to_numpy()]
        assert (grp > med).sum() == row.above
        assert (grp <= med).sum() == row.at_or_below


def test_permutation_entropy_vs_shuffle_ceiling(spark, sf_dir):
    got = all_queries()["q_ts_permutation_entropy"](spark, sf_dir).first()
    assert 0.0 < got["norm_perm_entropy"] <= 1.0


def test_brunner_munzel_phat_is_pairwise_probability(spark, sf_dir):
    """p̂ from the rank formulation must equal the brute-force
    pairwise P(F < O) + 0.5·P(F = O) — validating the mid-rank
    histogram machinery against the definition it encodes."""
    a, b = _orders_status_values(sf_dir)
    lt = (a[:, None] < b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    p = (lt + 0.5 * eq) / (len(a) * len(b))
    got = all_queries()["q_stat_brunner_munzel"](spark, sf_dir).first()
    assert abs(got["p_hat"] - p) < 1e-5


def test_price_index_bounds(spark, sf_dir):
    """Fisher must lie between Laspeyres and Paasche (geometric mean
    property), and all three must be positive."""
    got = all_queries()["q_fin_price_index"](spark, sf_dir).first()
    lo = min(got["laspeyres"], got["paasche"])
    hi = max(got["laspeyres"], got["paasche"])
    assert 0 < lo <= got["fisher"] + 1e-9
    assert got["fisher"] <= hi + 1e-9


def test_matrix_profile_accumulator_branches(spark):
    """Both overflow-guard branches of the matrix-profile pipeline
    (wave91): (a) long and decimal accumulators agree exactly on the
    same safe-magnitude series; (b) on magnitudes where 7·v² overflows
    int64 the decimal branch still matches an exact big-int numpy
    recompute — the bug class the r10 sf10 sweep caught, pinned at
    unit scale."""
    import numpy as np

    from sparkit_learn_spark.queries.wave91 import matrix_profile_days

    rng = np.random.RandomState(7)
    small = [int(x) for x in rng.randint(100, 5000, size=40)]
    a = matrix_profile_days(spark, small, exact_long=True).collect()
    b = matrix_profile_days(spark, small, exact_long=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # magnitudes ~3.7e9: v^2 ~ 1.4e19 > 2^63/7 — the long branch is
    # out of contract here BY THE GUARD; decimal must stay exact
    big = [int(3_700_000_000 + x) for x in
           rng.randint(0, 2_000_000_000, size=30)]
    got = {int(r["window_start"]): (int(r["nearest_window"]),
                                    float(r["mp_dist"]))
           for r in matrix_profile_days(spark, big,
                                        exact_long=False).collect()}
    m = 7
    v = np.array(big, dtype=object)  # python ints -> exact arithmetic
    nw = len(big) - m + 1
    best = {}
    for i in range(nw):
        s_i = sum(big[i:i + m]); q_i = sum(x * x for x in big[i:i + m])
        var_i = 7 * q_i - s_i * s_i
        if var_i <= 0:
            continue
        for j in range(nw):
            if abs(j - i) < m:
                continue
            s_j = sum(big[j:j + m]); q_j = sum(x * x for x in big[j:j + m])
            var_j = 7 * q_j - s_j * s_j
            if var_j <= 0:
                continue
            qt = sum(x * y for x, y in zip(big[i:i + m], big[j:j + m]))
            corr = (7 * float(qt) - float(s_i) * float(s_j)) / (
                float(var_i) ** 0.5 * float(var_j) ** 0.5)
            d2 = max(14.0 * (1.0 - corr), 0.0)
            key = (d2, j + 1)
            if i + 1 not in best or key < best[i + 1]:
                best[i + 1] = key
    for ws, (nb, dist) in got.items():
        d2, j = best[ws]
        assert j == nb or abs(d2 ** 0.5 - dist) < 1e-6, (ws, nb, j)
        assert abs(d2 ** 0.5 - dist) < 1e-5, (ws, dist, d2 ** 0.5)
