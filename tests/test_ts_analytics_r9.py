"""Semantic law tests for the late-r9 timeseries analytics batch
(CUSUM changepoint, seasonal hour-of-day baseline).

Hand-crafted series pin the WHY behind the oracle hash (the level
shift IS found; the seasonal peak IS the outlier), plus fixture-level
invariants on sf0.001."""

import pandas as pd
import pyspark.sql.functions as F

from rados_timestore_spark.queries_timeseries import (
    ts_cusum_changepoint,
    ts_seasonal_baseline,
)

SF = "/root/testdata/sf0.001"
_HOUR = 3_600_000_000
_DAY = 86_400_000_000


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value"])
    pdf["event_type"] = "view"
    pdf["props"] = "{}"
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)


def test_cusum_finds_the_level_shift(spark, tmp_path):
    # 4 points at 10.0 then 4 at 50.0 — the classic step change.
    # |n*S_i - i*S_n| peaks at the LAST pre-shift index (i=4).
    rows = [
        (i, 1, pd.Timestamp(i * _HOUR, unit="us"),
         10.0 if i < 4 else 50.0)
        for i in range(8)
    ]
    _write_events(tmp_path, rows)
    out = ts_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.n == 8
    assert r.cp_idx == 4
    assert r.t_cp == 3 * _HOUR  # the 4th point (i=1-based)
    # centered centi-values: 0 x4, 4000 x4; S_4=0, S_n=16000
    # D_4 = 8*0 - 4*16000 = -64000
    assert r.d_abs == 64_000


def test_cusum_constant_series_is_flat(spark, tmp_path):
    # No shift -> every D_i = 0; tie-break picks the FIRST point.
    rows = [(i, 2, pd.Timestamp(i * _HOUR, unit="us"), 7.5)
            for i in range(5)]
    _write_events(tmp_path, rows)
    r = ts_cusum_changepoint(spark, str(tmp_path)).collect()[0]
    assert r.d_abs == 0 and r.cp_idx == 1 and r.t_cp == 0


def test_cusum_fixture_invariants(spark):
    out = ts_cusum_changepoint(spark, SF)
    pdf = out.toPandas()
    # exactly one changepoint row per series present in the fixture
    assert pdf["user_id"].is_unique
    assert (pdf["cp_idx"] >= 1).all()
    assert (pdf["cp_idx"] <= pdf["n"]).all()
    assert (pdf["d_abs"] >= 0).all()


def test_seasonal_peak_is_the_outlier(spark, tmp_path):
    # hod-0 cell: three 10.0s and one 100.0 across four days ->
    # the 100.0 event is the peak residual of its cell.
    rows = [
        (d, 3, pd.Timestamp(d * _DAY, unit="us"),
         100.0 if d == 2 else 10.0)
        for d in range(4)
    ]
    # and a second cell (hod 5) with constant values -> dev_num 0
    rows += [
        (10 + d, 3, pd.Timestamp(d * _DAY + 5 * _HOUR, unit="us"), 4.0)
        for d in range(3)
    ]
    _write_events(tmp_path, rows)
    out = {r.hod: r for r in
           ts_seasonal_baseline(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 5}
    r0 = out[0]
    assert r0.n == 4 and r0.sum_centi == 13_000
    assert r0.v_centi_peak == 10_000 and r0.t_peak == 2 * _DAY
    assert r0.dev_num == abs(10_000 * 4 - 13_000)
    r5 = out[5]
    assert r5.n == 3 and r5.dev_num == 0
    # tie-break on (t, v): earliest time wins among equal deviations
    assert r5.t_peak == 5 * _HOUR


def test_seasonal_fixture_invariants(spark):
    out = ts_seasonal_baseline(spark, SF)
    assert out.filter((F.col("hod") < 0) | (F.col("hod") > 23)) \
        .count() == 0
    # one row per (user, hod) cell
    assert out.groupBy("user_id", "hod").count() \
        .filter(F.col("count") > 1).count() == 0
    # dev_num is n*|v - mean| >= 0 and 0 only if peak equals the mean
    bad = out.filter(
        (F.col("dev_num") == 0)
        & (F.col("v_centi_peak") * F.col("n") != F.col("sum_centi"))
    ).count()
    assert bad == 0


def test_rolling_active_users_windows(spark, tmp_path):
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_active_users,
    )

    # user 1 on day 0, user 2 on day 3, user 3 on day 10:
    # WAU(d) counts users active in [d-6, d]
    rows = [
        (0, 1, pd.Timestamp(0, unit="us"), 1.0),
        (1, 2, pd.Timestamp(3 * _DAY, unit="us"), 1.0),
        (2, 3, pd.Timestamp(10 * _DAY, unit="us"), 1.0),
        # same user twice on one day must count once
        (3, 2, pd.Timestamp(3 * _DAY + _HOUR, unit="us"), 2.0),
    ]
    _write_events(tmp_path, rows)
    out = {r.day_us // _DAY: r for r in
           ts_rolling_active_users(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 3, 10}
    assert (out[0].dau, out[0].wau) == (1, 1)
    assert (out[3].dau, out[3].wau) == (1, 2)   # users 1 and 2
    assert (out[10].dau, out[10].wau) == (1, 1)  # day-0/3 aged out


def test_rolling_active_users_fixture_invariants(spark):
    from rados_timestore_spark.queries_timeseries import (
        _events, ts_rolling_active_users,
    )

    out = ts_rolling_active_users(spark, SF).toPandas()
    total = _events(spark, SF).select("user_id").distinct().count()
    assert (out["wau"] >= out["dau"]).all()
    assert (out["wau"] <= total).all()
    assert out["day_us"].is_unique


def test_rolling_volatility_laws(spark, tmp_path):
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_volatility,
    )

    # three events 10 min apart then one 2h later: the trailing-hour
    # frame contains exactly the in-range rows; var_num is the exact
    # n*sumsq - sum^2 of centi-values
    rows = [
        (0, 1, pd.Timestamp(0, unit="us"), 10.0),
        (1, 1, pd.Timestamp(600_000_000, unit="us"), 20.0),
        (2, 1, pd.Timestamp(1_200_000_000, unit="us"), 40.0),
        (3, 1, pd.Timestamp(2 * _HOUR + 1_200_000_000, unit="us"), 5.0),
    ]
    _write_events(tmp_path, rows)
    out = {r.event_id: r for r in
           ts_rolling_volatility(spark, str(tmp_path)).collect()}
    assert out[0].n_win == 1 and out[0].var_num == 0
    # event 2: window holds 1000, 2000, 4000 centi
    r2 = out[2]
    assert r2.n_win == 3 and r2.sum_centi == 7000
    assert r2.var_num == 3 * (1000**2 + 2000**2 + 4000**2) - 7000**2
    # event 3 is alone again after the 2h gap
    assert out[3].n_win == 1 and out[3].var_num == 0


def test_rolling_volatility_fixture_invariants(spark):
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_volatility,
    )

    out = ts_rolling_volatility(spark, SF).toPandas()
    # variance numerator is non-negative (Cauchy-Schwarz) and zero
    # exactly when the window is a single repeated value
    assert (out["var_num"] >= 0).all()
    assert ((out["n_win"] == 1) <= (out["var_num"] == 0)).all()


# ------------------------------------------------ interval coalesce


def test_coalesce_long_interval_swallows_short_ones(spark, tmp_path):
    # One long interval covering two later short ones — the case that
    # distinguishes the cumulative-max rule from lag(end): event 300
    # opens [0, 360s]; events at 100s and 200s open sub-minute-6
    # intervals entirely inside it; an event at 400s starts island 2.
    from rados_timestore_spark.queries_timeseries import (
        ts_interval_coalesce,
    )

    s = 1_000_000
    rows = [
        (240, 9, pd.Timestamp(0, unit="us"), 1.0),        # [0, 300s]
        (0, 9, pd.Timestamp(100 * s, unit="us"), 1.0),    # [100, 160]
        (1, 9, pd.Timestamp(200 * s, unit="us"), 1.0),    # [200, 261]
        (2, 9, pd.Timestamp(400 * s, unit="us"), 1.0),    # [400, 462]
    ]
    _write_events(tmp_path, rows)
    out = sorted(
        ts_interval_coalesce(spark, str(tmp_path)).collect(),
        key=lambda r: r.island_no)
    assert len(out) == 2
    a, b = out
    assert (a.n_intervals, a.start_us, a.end_us) == (3, 0, 300 * s)
    assert (b.n_intervals, b.start_us, b.end_us) == (1, 400 * s,
                                                     462 * s)


def test_coalesce_touching_endpoints_merge(spark, tmp_path):
    # start == running max end merges (closed intervals): event 240
    # opens [0, 300s]; an event exactly at 300s joins the island.
    from rados_timestore_spark.queries_timeseries import (
        ts_interval_coalesce,
    )

    s = 1_000_000
    rows = [
        (240, 9, pd.Timestamp(0, unit="us"), 1.0),        # [0, 300s]
        (0, 9, pd.Timestamp(300 * s, unit="us"), 1.0),    # [300, 360]
    ]
    _write_events(tmp_path, rows)
    out = ts_interval_coalesce(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].n_intervals == 2
    assert out[0].end_us == 360 * s


def test_coalesce_fixture_invariants(spark):
    from rados_timestore_spark.queries_timeseries import (
        ts_interval_coalesce,
    )

    out = ts_interval_coalesce(spark, SF).toPandas()
    # islands of one user are disjoint AND separated (touching merged)
    for _u, g in out.groupby("user_id"):
        g = g.sort_values("island_no")
        assert (g["island_no"].to_numpy()
                == range(1, len(g) + 1)).all()
        assert (g["start_us"].to_numpy()[1:]
                > g["end_us"].to_numpy()[:-1]).all()
    assert (out["duration_us"]
            == out["end_us"] - out["start_us"]).all()
    # every event lands in exactly one island
    ev = spark.read.parquet(f"{SF}/events.parquet")
    per_user = ev.groupBy("user_id").count().toPandas() \
        .set_index("user_id")["count"]
    got = out.groupby("user_id")["n_intervals"].sum()
    assert got.to_dict() == per_user.to_dict()


# -------------------------------------------------- EWMA smoothing


def test_ewma_recurrence_unroll(spark, tmp_path):
    # ewma_x65536 IS the alpha=1/2 recurrence unrolled: for values
    # 10, 20, 40 (centi 1000, 2000, 4000) the exact terms are
    # s1 = 1000*2^15, s2 = 2000*2^15 + 1000*2^14, ...
    from rados_timestore_spark.queries_timeseries import (
        ts_ewma_smooth,
    )

    rows = [
        (0, 1, pd.Timestamp(0, unit="us"), 10.0),
        (1, 1, pd.Timestamp(_HOUR, unit="us"), 20.0),
        (2, 1, pd.Timestamp(2 * _HOUR, unit="us"), 40.0),
    ]
    _write_events(tmp_path, rows)
    out = {r.event_id: r.ewma_x65536 for r in
           ts_ewma_smooth(spark, str(tmp_path)).collect()}
    assert out[0] == 1000 * (1 << 15)
    assert out[1] == 2000 * (1 << 15) + 1000 * (1 << 14)
    assert out[2] == (4000 * (1 << 15) + 2000 * (1 << 14)
                      + 1000 * (1 << 13))


def test_ewma_constant_series_converges_geometrically(spark, tmp_path):
    # constant v: s_n/2^16 = v * (1 - 2^-n) — after 16 points the
    # truncated sum equals v*(2^16 - 1), one tail-weight short of v
    from rados_timestore_spark.queries_timeseries import (
        ts_ewma_smooth,
    )

    rows = [(i, 3, pd.Timestamp(i * _HOUR, unit="us"), 5.0)
            for i in range(20)]
    _write_events(tmp_path, rows)
    out = {r.event_id: r.ewma_x65536 for r in
           ts_ewma_smooth(spark, str(tmp_path)).collect()}
    assert out[15] == 500 * ((1 << 16) - 1)
    assert out[19] == out[15]  # steady state: window saturated


def test_ewma_fixture_bounds(spark):
    # the smoother never leaves the convex hull of the inputs:
    # min(v)*(2^16-1) <= ewma <= max(v)*(2^16-1) for same-sign hulls,
    # and a 1-row head is exactly v*2^15
    from rados_timestore_spark.queries_timeseries import (
        ts_ewma_smooth,
    )

    out = ts_ewma_smooth(spark, SF).toPandas()
    lo, hi = out["v"].min(), out["v"].max()
    bound = max(abs(lo), abs(hi)) * ((1 << 16) - 1)
    assert (out["ewma_x65536"].abs() <= bound).all()


# ------------------------------------------------- rolling median


def test_rolling_median_odd_even_frames(spark, tmp_path):
    # frame sizes 1..4 over values 30, 10, 20, 40 — pins the sorted
    # indexing: n=1 -> 2*30; n=2 -> 10+30; n=3 -> 2*20; n=4 -> 20+30
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_median,
    )

    vals = [30.0, 10.0, 20.0, 40.0]
    rows = [(i, 1, pd.Timestamp(i * _HOUR, unit="us"), v)
            for i, v in enumerate(vals)]
    _write_events(tmp_path, rows)
    out = {r.event_id: (r.n_win, r.median2x) for r in
           ts_rolling_median(spark, str(tmp_path)).collect()}
    assert out[0] == (1, 2 * 3000)
    assert out[1] == (2, 1000 + 3000)
    assert out[2] == (3, 2 * 2000)
    assert out[3] == (4, 2000 + 3000)


def test_rolling_median_frame_caps_at_seven(spark, tmp_path):
    # 10 points, value = index: at i=9 the frame is [3..9] (7 rows),
    # median = 6 -> median2x = 1200 centi
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_median,
    )

    rows = [(i, 2, pd.Timestamp(i * _HOUR, unit="us"), float(i))
            for i in range(10)]
    _write_events(tmp_path, rows)
    out = {r.event_id: (r.n_win, r.median2x) for r in
           ts_rolling_median(spark, str(tmp_path)).collect()}
    assert out[9] == (7, 2 * 600)
    assert out[6] == (7, 2 * 300)


def test_rolling_median_fixture_invariants(spark):
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_median,
    )

    out = ts_rolling_median(spark, SF).toPandas()
    assert (out["n_win"] >= 1).all() and (out["n_win"] <= 7).all()
    # odd frames double ONE integer element -> median2x is even;
    # (even frames sum two distinct-index elements, no parity law)
    odd = out[out["n_win"] % 2 == 1]
    assert len(odd) > 0 and (odd["median2x"] % 2 == 0).all()
