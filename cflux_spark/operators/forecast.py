"""InfluxQL HOLT_WINTERS / HOLT_WINTERS_WITH_FIT (InfluxDB 1.8's
predictive function family — the one SELECT function family absent
from the reference engine's grammar AND from this engine until round
7; cflux.js:687-833 answers no transform/predictor functions at all).

Semantics follow InfluxDB's documented model (the NIST/ENGSTAT triple
exponential smoothing the InfluxDB docs cite): seasonal length m > 1
fits multiplicative Holt-Winters

    L_t = a * y_t / I_{t-m} + (1-a) * (L_{t-1} + B_{t-1})
    B_t = b * (L_t - L_{t-1}) + (1-b) * B_{t-1}
    I_t = g * y_t / L_t     + (1-g) * I_{t-m}
    F_{t+k} = (L_t + k * B_t) * I_{t-m+((k-1) mod m)+1}

and m <= 1 fits Holt's linear (no seasonal factor). The smoothing
constants (a, b, g) minimize in-sample SSE via Nelder-Mead — same
strategy as InfluxDB (which fits with gonum's Nelder-Mead); the
optimizer trajectory is not guaranteed to match InfluxDB's binary
output bit-for-bit, so this is documented as model-parity, not
value-parity (there is no reference output to match: the reference
engine rejects the function).

Execution shape: the input is a bucketed ``GROUP BY time()`` result —
a frame that is BOUNDED by (time range / interval) per series, i.e.
thousands of rows at most by construction — so the fit runs as ONE
Arrow-batched kernel per series (``applyInPandas``), the sanctioned
sequential-kernel pattern (SURVEY §2.10). Parallelism = #series; no
driver collect; forecasts materialize as rows appended past the last
bucket at the series' own interval.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FORECAST_FNS = {"holt_winters", "holt_winters_with_fit"}


def _nelder_mead(f, x0: np.ndarray, iters: int = 200) -> np.ndarray:
    """Compact deterministic Nelder-Mead (reflection 1, expansion 2,
    contraction 0.5, shrink 0.5) with a fixed +0.1 start simplex —
    matches the standard coefficients InfluxDB's fitter uses."""
    n = len(x0)
    pts = [x0.astype(float)]
    for i in range(n):
        p = x0.astype(float).copy()
        p[i] = p[i] + 0.1
        pts.append(p)
    simplex = np.array(pts)
    fv = np.array([f(p) for p in simplex])
    for _ in range(iters):
        order = np.argsort(fv, kind="stable")
        simplex, fv = simplex[order], fv[order]
        if abs(fv[-1] - fv[0]) <= 1e-10 * (abs(fv[0]) + 1e-10):
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        if fr < fv[0]:
            xe = centroid + 2.0 * (centroid - simplex[-1])
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    fv[i] = f(simplex[i])
    return simplex[np.argmin(fv)]


def _clamp01(x: np.ndarray) -> np.ndarray:
    return np.minimum(1.0, np.maximum(0.0, x))


def _fit_holt(y: np.ndarray, params: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Holt's linear (m <= 1): fitted one-step-ahead values, final
    level, final trend."""
    a, b = params
    level, trend = y[0], y[1] - y[0]
    fitted = np.empty(len(y))
    fitted[0] = y[0]
    for t in range(1, len(y)):
        fitted[t] = level + trend
        new_level = a * y[t] + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        level = new_level
    return fitted, level, trend


def _fit_hw(
    y: np.ndarray, m: int, params: np.ndarray
) -> tuple[np.ndarray, float, float, np.ndarray]:
    """Multiplicative Holt-Winters (m > 1): fitted values, final
    level/trend, final m seasonal indices (oldest-first for the next
    season). Standard initialization: level = mean of season 1, trend
    = averaged cross-season slope, indices = mean ratio to the season
    average across complete seasons."""
    a, b, g = params
    n_seasons = len(y) // m
    season_avgs = np.array([y[i * m : (i + 1) * m].mean() for i in range(n_seasons)])
    idx = np.zeros(m)
    for j in range(m):
        r = [
            y[i * m + j] / season_avgs[i]
            for i in range(n_seasons)
            if season_avgs[i] != 0
        ]
        idx[j] = np.mean(r) if r else 1.0
    idx[idx == 0] = 1.0
    level = y[:m].mean()
    trend = np.mean((y[m : 2 * m] - y[:m]) / m)
    fitted = np.empty(len(y))
    fitted[:m] = level * idx
    seas = idx.copy()  # seas[t % m] = index for phase t % m
    for t in range(m, len(y)):
        ph = t % m
        fitted[t] = (level + trend) * seas[ph]
        denom = seas[ph] if seas[ph] != 0 else 1.0
        new_level = a * y[t] / denom + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        lv = new_level if new_level != 0 else 1.0
        seas[ph] = g * y[t] / lv + (1 - g) * seas[ph]
        level = new_level
    return fitted, level, trend, seas


def _forecast_series(
    y: np.ndarray, n: int, m: int, params: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Fit + forecast one series: returns (fitted, predictions[n]).
    With ``params`` given the smoothing constants are used as-is
    (no optimizer) — the fixed-parameter evaluation path, a pure
    linear-recurrence pass that a recursive CTE can replay exactly
    (the oracle story for ``q_holt_winters``)."""
    if m > 1:
        if len(y) < 2 * m:
            return np.empty(0), np.empty(0)  # under two seasons: no fit

        if params is None:

            def sse(p):
                pc = _clamp01(p)
                penalty = 1e6 * float(np.sum((p - pc) ** 2))
                f, *_ = _fit_hw(y, m, pc)
                return float(np.sum((f - y) ** 2)) + penalty

            params = _clamp01(_nelder_mead(sse, np.array([0.5, 0.1, 0.1])))
        fitted, level, trend, seas = _fit_hw(y, m, params)
        ks = np.arange(1, n + 1)
        preds = (level + ks * trend) * seas[(len(y) + ks - 1) % m]
    else:
        if len(y) < 3:
            return np.empty(0), np.empty(0)

        if params is None:

            def sse(p):
                pc = _clamp01(p)
                penalty = 1e6 * float(np.sum((p - pc) ** 2))
                f, *_ = _fit_holt(y, pc)
                return float(np.sum((f - y) ** 2)) + penalty

            params = _clamp01(_nelder_mead(sse, np.array([0.5, 0.1])))
        fitted, level, trend = _fit_holt(y, params)
        preds = level + np.arange(1, n + 1) * trend
    return fitted, preds


def holt_winters(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    n: int,
    season: int,
    interval: int,
    with_fit: bool = False,
    out_col: str = "_hw",
    params: tuple[float, ...] | None = None,
) -> DataFrame:
    """HOLT_WINTERS over a bucketed per-series frame: emit ``n``
    forecast rows per series at ``interval`` spacing past the last
    bucket (plus the in-range fitted values when ``with_fit``).
    ``order_col`` must be the numeric bucket timestamp the interval is
    expressed in (ms for InfluxQL bucketed frames). Null values drop
    first (fill() upstream provides dense grids when wanted — same
    contract InfluxDB documents). Series with fewer than two complete
    seasons (m>1) or three points (m<=1) emit nothing, matching
    InfluxDB's insufficient-data behavior.

    ``params`` fixes the smoothing constants — ``(alpha, beta)`` for
    Holt's linear (season <= 1), ``(alpha, beta, gamma)`` for seasonal
    HW — and skips the Nelder-Mead fit entirely. The fixed-parameter
    pass is a deterministic linear recurrence over the sorted buckets,
    so a recursive CTE can replay it exactly (the DuckDB oracle for
    ``q_holt_winters`` uses this path); omit it for InfluxDB's fitted
    behavior."""
    if n < 1:
        raise ValueError(f"holt_winters N must be >= 1, got {n}")
    if n > 1_000_000:
        # each series materializes n forecast rows in one kernel task;
        # an absurd N would OOM the executor, so refuse loudly
        raise ValueError(f"holt_winters N capped at 1,000,000 forecast points, got {n}")
    if season < 0:
        raise ValueError(f"holt_winters seasonal pattern must be >= 0, got {season}")
    fixed: np.ndarray | None = None
    if params is not None:
        want = 3 if season > 1 else 2
        if len(params) != want:
            raise ValueError(
                f"holt_winters fixed params need {want} smoothing constants "
                f"for season={season}, got {len(params)}"
            )
        if any(not (0.0 <= p <= 1.0) for p in params):
            raise ValueError(f"holt_winters smoothing constants must be in [0, 1]: {params}")
        fixed = np.asarray(params, dtype=float)
    import pyspark.sql.functions as F

    if not keys:
        # ungrouped: ONE merged series — a single bounded bucket frame
        # by construction (time range / interval rows), so one kernel
        # task is the honest shape
        tagged = df.withColumn("_g", F.lit(1))
        return holt_winters(
            tagged, ["_g"], order_col, val_col, n, season, interval,
            with_fit=with_fit, out_col=out_col, params=params,
        ).drop("_g")

    df = df.filter(F.col(val_col).isNotNull())
    out_fields = [
        T.StructField(k.name, k.dataType) for k in df.schema.fields if k.name in keys
    ]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField(order_col, T.LongType()),
            T.StructField(out_col, T.DoubleType()),
        ]
    )
    o_name, v_name = order_col, val_col
    m = max(int(season), 0)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(o_name, kind="stable").reset_index(drop=True)
        y = pdf[v_name].to_numpy(dtype=float)
        ts = pdf[o_name].to_numpy(dtype="int64")
        fitted, preds = _forecast_series(y, n, m, params=fixed)
        if len(preds) == 0:
            return pd.DataFrame({c.name: pd.Series(dtype=object) for c in out_schema})
        last = ts[-1]
        rows_ts = np.concatenate(
            [ts, last + interval * np.arange(1, n + 1, dtype="int64")]
            if with_fit
            else [last + interval * np.arange(1, n + 1, dtype="int64")]
        )
        rows_v = np.concatenate([fitted, preds]) if with_fit else preds
        out = {k: [pdf[k].iloc[0]] * len(rows_ts) for k in keys}
        out[o_name] = rows_ts
        out[out_col] = rows_v
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(_kernel, out_schema)
