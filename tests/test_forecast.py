"""HOLT_WINTERS / HOLT_WINTERS_WITH_FIT (operators/forecast.py + the
InfluxQL dispatch). Model-parity tests: the reference engine rejects
the function entirely (cflux.js has no transform/predictive surface),
so truth here is the documented NIST model — a fitted forecast must
recover synthetic series the model generates exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cflux_spark.operators.forecast import _forecast_series, holt_winters

_T0 = 1704067200_000_000_000  # 2024-01-01T00:00:00Z


# ---------------------------------------------------------------- kernel


def test_holt_linear_recovers_trend():
    y = 5.0 + 1.5 * np.arange(30)
    fitted, preds = _forecast_series(y, 5, 0)
    np.testing.assert_allclose(preds, 5.0 + 1.5 * np.arange(30, 35), rtol=1e-6)
    assert len(fitted) == 30


def test_hw_recovers_seasonal_trend():
    t = np.arange(40, dtype=float)
    season = np.array([1.2, 0.8, 1.0, 1.0] * 10)
    y = (10 + 0.5 * t) * season
    _, preds = _forecast_series(y, 8, 4)
    truth = (10 + 0.5 * np.arange(40, 48)) * np.array([1.2, 0.8, 1.0, 1.0] * 2)
    assert np.max(np.abs(preds - truth) / truth) < 0.05


def test_insufficient_data_emits_nothing():
    assert len(_forecast_series(np.array([1.0, 2.0, 3.0]), 3, 4)[1]) == 0  # < 2 seasons
    assert len(_forecast_series(np.array([1.0, 2.0]), 3, 0)[1]) == 0  # < 3 points


def test_fixed_params_skip_fit():
    """params= evaluates the recurrence with the given constants —
    results differ from the fitted pass and replay the hand-computed
    recursion exactly (the q_holt_winters oracle contract)."""
    rng = np.random.default_rng(11)
    y = (10 + 0.3 * np.arange(36)) * np.tile([1.1, 0.9, 1.0], 12) + rng.normal(0, 0.1, 36)
    m, a, b, g = 3, 0.5, 0.25, 0.25
    _, preds = _forecast_series(y, 6, m, params=np.array([a, b, g]))

    # hand replay (same init + recursion as _fit_hw, written independently)
    n_seasons = len(y) // m
    savg = [y[i * m : (i + 1) * m].mean() for i in range(n_seasons)]
    seas = np.array(
        [np.mean([y[i * m + j] / savg[i] for i in range(n_seasons) if savg[i] != 0])
         for j in range(m)]
    )
    seas[seas == 0] = 1.0
    level = y[:m].mean()
    trend = np.mean((y[m : 2 * m] - y[:m]) / m)
    for t in range(m, len(y)):
        ph = t % m
        denom = seas[ph] if seas[ph] != 0 else 1.0
        nl = a * y[t] / denom + (1 - a) * (level + trend)
        trend = b * (nl - level) + (1 - b) * trend
        lv = nl if nl != 0 else 1.0
        seas[ph] = g * y[t] / lv + (1 - g) * seas[ph]
        level = nl
    ks = np.arange(1, 7)
    truth = (level + ks * trend) * seas[(len(y) + ks - 1) % m]
    np.testing.assert_array_equal(preds, truth)

    # differs from the fitted pass (the optimizer moves off (a,b,g))
    _, fitted_preds = _forecast_series(y, 6, m)
    assert not np.array_equal(preds, fitted_preds)


def test_fixed_params_holt_linear():
    y = 5.0 + 1.5 * np.arange(30)
    _, preds = _forecast_series(y, 5, 0, params=np.array([0.5, 0.5]))
    # a perfect line is reproduced exactly by Holt regardless of constants
    np.testing.assert_allclose(preds, 5.0 + 1.5 * np.arange(30, 35), rtol=1e-9)


def test_df_fixed_params_validation(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "k string, ts_ms long, val double")
    with pytest.raises(ValueError, match="smoothing constants"):
        holt_winters(df, ["k"], "ts_ms", "val", 2, 4, interval=1, params=(0.5, 0.5))
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        holt_winters(df, ["k"], "ts_ms", "val", 2, 4, interval=1, params=(0.5, 0.5, 1.5))
    with pytest.raises(ValueError, match="smoothing constants"):
        holt_winters(df, ["k"], "ts_ms", "val", 2, 0, interval=1, params=(0.5, 0.5, 0.5))


def test_kernel_deterministic():
    rng = np.random.default_rng(7)
    y = (10 + 0.3 * np.arange(36)) * np.tile([1.1, 0.9, 1.0], 12) + rng.normal(0, 0.1, 36)
    p1 = _forecast_series(y.copy(), 6, 3)[1]
    p2 = _forecast_series(y.copy(), 6, 3)[1]
    np.testing.assert_array_equal(p1, p2)


# ------------------------------------------------------------- DataFrame op


@pytest.fixture(scope="module")
def bucketed(spark):
    rows = []
    seas = [1.2, 0.8, 1.0, 1.0]
    for k in ("a", "b"):
        bias = 0.0 if k == "a" else 5.0
        for i in range(48):
            v = (10 + bias + 0.5 * i) * seas[i % 4]
            rows.append((k, _T0 // 1_000_000 + i * 60_000, float(v)))
    return spark.createDataFrame(rows, "k string, ts_ms long, val double")


def test_df_forecast_per_series(bucketed):
    out = holt_winters(bucketed, ["k"], "ts_ms", "val", 8, 4, interval=60_000)
    pdf = out.toPandas().sort_values(["k", "ts_ms"])
    assert set(pdf["k"]) == {"a", "b"}
    assert (pdf.groupby("k").size() == 8).all()
    last_ms = _T0 // 1_000_000 + 47 * 60_000
    assert pdf["ts_ms"].min() == last_ms + 60_000  # forecasts start AFTER input
    seas = [1.2, 0.8, 1.0, 1.0]
    for k, bias in (("a", 0.0), ("b", 5.0)):
        preds = pdf[pdf["k"] == k]["_hw"].to_numpy()
        truth = np.array([(10 + bias + 0.5 * (48 + j)) * seas[(48 + j) % 4] for j in range(8)])
        assert np.max(np.abs(preds - truth) / truth) < 0.05


def test_df_with_fit_covers_range(bucketed):
    out = holt_winters(bucketed, ["k"], "ts_ms", "val", 4, 4, interval=60_000, with_fit=True)
    counts = out.groupBy("k").count().toPandas().set_index("k")["count"]
    assert (counts == 52).all()  # 48 fitted + 4 forecast


def test_df_ungrouped_single_series(bucketed):
    one = bucketed.filter(F.col("k") == "a").drop("k")
    out = holt_winters(one, [], "ts_ms", "val", 6, 4, interval=60_000)
    assert out.count() == 6


def test_df_rejects_bad_args(bucketed):
    with pytest.raises(ValueError):
        holt_winters(bucketed, ["k"], "ts_ms", "val", 0, 4, interval=60_000)
    with pytest.raises(ValueError):
        holt_winters(bucketed, ["k"], "ts_ms", "val", 5, -1, interval=60_000)


# ---------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def hw_engine(spark, tmp_path_factory):
    from cflux_spark.plans.influxql import InfluxQLEngine
    from cflux_spark.sources.ingest import LPStore

    root = str(tmp_path_factory.mktemp("hw"))
    store = LPStore(spark, root, db="hwdb")
    seas = [1.2, 0.8, 1.0, 1.0]
    lines = []
    for i in range(48):
        v = (10 + 0.5 * i) * seas[i % 4]
        lines.append(f"m,host=a v={v:.4f} {_T0 + i * 60_000_000_000}")
    store.write_batch(spark.createDataFrame([(l,) for l in lines], "line string"))
    return InfluxQLEngine(spark, root)


def test_engine_forecast_values_and_timestamps(hw_engine):
    res = hw_engine.execute(
        "SELECT holt_winters(mean(v), 8, 4) FROM m WHERE host = 'a' GROUP BY time(60s)",
        db="hwdb",
    )
    se = res["results"][0]["series"][0]
    assert se["columns"] == ["time", "holt_winters"]
    assert len(se["values"]) == 8
    assert se["values"][0][0] == (_T0 + 48 * 60_000_000_000) // 1_000_000
    seas = [1.2, 0.8, 1.0, 1.0]
    truth = [(10 + 0.5 * (48 + j)) * seas[(48 + j) % 4] for j in range(8)]
    preds = [v[1] for v in se["values"]]
    assert max(abs(p - t) / t for p, t in zip(preds, truth)) < 0.05


def test_engine_with_fit_and_alias(hw_engine):
    res = hw_engine.execute(
        "SELECT holt_winters_with_fit(mean(v), 4, 4) AS hw FROM m GROUP BY time(60s)",
        db="hwdb",
    )
    se = res["results"][0]["series"][0]
    assert se["columns"] == ["time", "hw"]
    assert len(se["values"]) == 52  # 48 in-range fitted + 4 forecast


def test_engine_rejections(hw_engine):
    from cflux_spark.plans.influxql import InfluxQLError

    with pytest.raises(InfluxQLError, match="aggregate"):
        hw_engine.execute("SELECT holt_winters(v, 8, 4) FROM m", db="hwdb")
    with pytest.raises(InfluxQLError, match="integer N"):
        hw_engine.execute(
            "SELECT holt_winters(mean(v), 8) FROM m GROUP BY time(60s)", db="hwdb"
        )
    with pytest.raises(InfluxQLError, match="GROUP BY time"):
        hw_engine.execute("SELECT holt_winters(mean(v), 8, 4) FROM m", db="hwdb")
    with pytest.raises(InfluxQLError, match="N must be >= 1"):
        hw_engine.execute(
            "SELECT holt_winters(mean(v), 0, 4) FROM m GROUP BY time(60s)", db="hwdb"
        )


def test_df_rejects_absurd_n(bucketed):
    with pytest.raises(ValueError, match="capped"):
        holt_winters(bucketed, ["k"], "ts_ms", "val", 10_000_000, 4, interval=60_000)


def test_engine_forecast_grouped_by_tag(hw_engine, spark):
    """GROUP BY <tag> + time: one forecast series per tag combo."""
    from cflux_spark.plans.influxql import InfluxQLEngine
    from cflux_spark.sources.ingest import LPStore

    res = hw_engine.execute(
        "SELECT holt_winters(mean(v), 3, 0) FROM m GROUP BY time(60s), host",
        db="hwdb",
    )
    series = res["results"][0]["series"]
    assert [s["tags"] for s in series] == [{"host": "a"}]
    assert len(series[0]["values"]) == 3
