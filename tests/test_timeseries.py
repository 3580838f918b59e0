"""gapfill — dense-grid generation, locf/linear fills (functions/timeseries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.timeseries import gapfill


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts_ns long, value double")


def test_grid_is_dense_and_marks_filled(spark):
    df = _df(spark, [(1, 0, 10.0), (1, 35, 40.0)])  # bucket 10 → 0..30
    out = {r.bucket_ns: (r.v, r.filled) for r in gapfill(df, 10).collect()}
    assert set(out) == {0, 10, 20, 30}
    assert out[0] == (10.0, False) and out[30] == (40.0, False)
    assert out[10] == (None, True) and out[20] == (None, True)


def test_locf(spark):
    df = _df(spark, [(1, 0, 10.0), (1, 35, 40.0)])
    out = {r.bucket_ns: r.v for r in gapfill(df, 10, fill="locf").collect()}
    assert out == {0: 10.0, 10: 10.0, 20: 10.0, 30: 40.0}


def test_linear_hand_computed(spark):
    df = _df(spark, [(1, 0, 10.0), (1, 35, 40.0)])
    out = {r.bucket_ns: r.v for r in gapfill(df, 10, fill="linear").collect()}
    assert out == {0: 10.0, 10: 20.0, 20: 30.0, 30: 40.0}


def test_linear_trailing_gap_is_locf_and_multi_group(spark):
    df = _df(
        spark,
        [(1, 0, 10.0), (1, 25, 20.0), (2, 0, 5.0), (2, 45, 1.0)],
    )
    rows = gapfill(df, 10, fill="linear").collect()
    g1 = {r.bucket_ns: r.v for r in rows if r.user_id == 1}
    g2 = {r.bucket_ns: r.v for r in rows if r.user_id == 2}
    assert g1 == {0: 10.0, 10: 15.0, 20: 20.0}
    # group 2: interpolation over 4 gaps of 1/4 each
    assert g2 == {0: 5.0, 10: 4.0, 20: 3.0, 30: 2.0, 40: 1.0}


def test_avg_buckets_multiple_events(spark):
    df = _df(spark, [(1, 0, 10.0), (1, 5, 20.0), (1, 12, 7.0)])
    out = {r.bucket_ns: r.v for r in gapfill(df, 10).collect()}
    assert out == {0: 15.0, 10: 7.0}


def test_exact_fixed_point_path_matches_plain_avg(spark, sf_dir):
    from astro_sdk_spark.queries import T

    ev = T(spark, sf_dir, "events")
    a = gapfill(ev, 7_200_000_000_000, fill="linear", value_scale=100)
    b = gapfill(ev, 7_200_000_000_000, fill="linear")
    rows_a = {(r.user_id, r.bucket_ns): r.v for r in a.collect()}
    rows_b = {(r.user_id, r.bucket_ns): r.v for r in b.collect()}
    assert set(rows_a) == set(rows_b)
    for k in rows_a:  # identical up to the last rounding ulp
        assert rows_a[k] == pytest.approx(rows_b[k], abs=2e-4)


def test_validation(spark):
    df = _df(spark, [(1, 0, 1.0)])
    with pytest.raises(ValueError, match="fill"):
        gapfill(df, 10, fill="bogus")
    with pytest.raises(ValueError, match="agg"):
        gapfill(df, 10, agg="median")
    with pytest.raises(ValueError, match="positive"):
        gapfill(df, 0)
    with pytest.raises(ValueError, match="avg"):
        gapfill(df, 10, agg="sum", value_scale=100)


# ---------------------------------------------------------------------------
# funnel (ordered conversion)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_ordering_is_enforced(spark):
    import datetime as dt

    from astro_sdk_spark.functions.timeseries import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1 converts in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: purchase BEFORE click → stops at step 2
        (2, t(0), "view"), (2, t(2), "click"), (2, t(1), "purchase"),
        # user 3: never viewed → not a funnel entrant
        (3, t(0), "click"), (3, t(1), "purchase"),
        # user 4: only view
        (4, t(5), "view"),
    ]
    out = {r["user_id"]: r for r in funnel(_ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["max_step"] == 3 and out[1]["step_3_ts"] == t(2)
    assert out[2]["max_step"] == 2 and out[2]["step_3_ts"] is None
    assert out[4]["max_step"] == 1


def test_funnel_strict_vs_lenient_simultaneous(spark):
    import datetime as dt

    from astro_sdk_spark.functions.timeseries import funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "view"), (1, t0, "click")]
    strict = funnel(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert strict["max_step"] == 1  # simultaneous doesn't count strictly
    lenient = funnel(_ev(spark, rows), ["view", "click"], strict=False).collect()[0]
    assert lenient["max_step"] == 2


def test_funnel_uses_earliest_completion(spark):
    import datetime as dt

    from astro_sdk_spark.functions.timeseries import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # click exists before the FIRST view too — only the one after counts
    rows = [(1, t(5), "view"), (1, t(3), "click"), (1, t(8), "click")]
    out = funnel(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert out["step_2_ts"] == t(8)


def test_funnel_validates_steps(spark):
    import pytest as _pytest

    from astro_sdk_spark.functions.timeseries import funnel

    df = _ev(spark, [])
    with _pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["view"])


# ---------------------------------------------------------------------------
# retention (cohort triangle)


def test_retention_triangle(spark):
    import datetime as dt

    from astro_sdk_spark.functions.timeseries import retention

    d = lambda day: dt.datetime(2024, 1, day)  # Jan 1 2024 is a Monday
    rows = [
        # cohort week 0 (Jan 1): users 1, 2; user 1 returns week 1
        (1, d(1), "view"), (2, d(2), "view"), (1, d(8), "click"),
        # cohort week 1 (Jan 8): user 3, never returns
        (3, d(9), "view"),
        # user 2 also active twice within week 0 — one cell only
        (2, d(3), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {(str(r["cohort"]), r["period_n"]): r for r in retention(df).collect()}
    w0, w1 = "2024-01-01", "2024-01-08"
    assert out[(w0, 0)]["n_active"] == 2 and out[(w0, 0)]["cohort_size"] == 2
    assert out[(w0, 0)]["retention"] == 1.0  # period 0 is always 1.0
    assert out[(w0, 1)]["n_active"] == 1 and out[(w0, 1)]["retention"] == 0.5
    assert out[(w1, 0)]["n_active"] == 1 and out[(w1, 0)]["cohort_size"] == 1
    assert (w1, 1) not in out  # no week-1 activity for cohort 2


def test_retention_monthly_period_arithmetic(spark):
    import datetime as dt

    from astro_sdk_spark.functions.timeseries import retention

    rows = [
        (1, dt.datetime(2024, 11, 15), "x"),
        (1, dt.datetime(2025, 2, 3), "x"),  # 3 months later, across a year
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["period_n"] for r in retention(df, period="month").collect()}
    assert out == {0, 3}


def test_retention_validates_period(spark):
    import pytest as _pytest

    from astro_sdk_spark.functions.timeseries import retention

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pytest.raises(ValueError, match="period"):
        retention(df, period="quarter")
