"""InfluxQL technical-analysis transforms (InfluxDB 1.8 function
surface; absent from the reference engine — cflux.js answers only the
aggregate/selector families, so this is conformance surface the
reference silently lacks).

Implemented functions and the recurrences behind them (N = period,
alpha = 2/(N+1), all per series, ordered by time):

  exponential_moving_average(v, N)        e_i = (1-a_i) e_{i-1} + a_i v_i
  double_exponential_moving_average(v, N) 2*EMA - EMA(EMA)
  triple_exponential_moving_average(v, N) 3*EMA - 3*EMA(EMA) + EMA^3
  triple_exponential_derivative(v, N)     1-point %change of EMA^3 (TRIX)
  relative_strength_index(v, N)           Wilder averages of gains/losses
  chande_momentum_oscillator(v, N)        rolling-window (no recurrence)
  kaufmans_efficiency_ratio(v, N)         rolling-window (no recurrence)
  kaufmans_adaptive_moving_average(v, N)  k_i = (1-sc_i) k_{i-1} + sc_i v_i

Warmup (EMA family): 'exponential' (default, InfluxDB's) scales the
multiplier while fewer than N points have arrived — alpha_t =
2/(min(t,N)+1), so the first point IS the seed and every point emits.
'simple' emits the simple moving average for the first N points and
switches to the exponential recurrence seeded from SMA_N afterwards.
InfluxDB's optional HOLD_PERIOD argument is rejected loudly rather
than half-supported.

Emission: EMA/DEMA/TEMA emit every point; TRIX from the 2nd;
RSI/CMO from the (N+1)-th (they consume N differences);
KER/KAMA from the (N+1)-th (they look back N points).

Execution shape: every rolling piece (SMA, gain/loss sums, lag-N) is
a JVM window — per-series when grouping keys exist, the segmented
``merged_window_stage`` otherwise (no single-partition WindowExec).
The recursions run through ``operators.recurrence.linear_recurrence``
(segmented affine scan) with coefficients computed as JVM columns —
Python appears only inside that operator's per-segment kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cflux_spark.operators.recurrence import (
    DEFAULT_SEGMENT_SPAN_NS,
    linear_recurrence,
    merged_row_number,
)
from cflux_spark.operators.windows import merged_window_stage

TA_FNS = {
    "exponential_moving_average",
    "double_exponential_moving_average",
    "triple_exponential_moving_average",
    "triple_exponential_derivative",
    "relative_strength_index",
    "chande_momentum_oscillator",
    "kaufmans_efficiency_ratio",
    "kaufmans_adaptive_moving_average",
}

# Kaufman's fast/slow smoothing constants (the standard 2/30 pair,
# which InfluxDB hard-codes as well)
_KAMA_FAST = 2.0 / (2 + 1)
_KAMA_SLOW = 2.0 / (30 + 1)


def _rn(df: DataFrame, keys, order_col, span) -> DataFrame:
    """1-based per-series row number as column ``_t``."""
    if keys:
        w = Window.partitionBy(*keys).orderBy(order_col)
        return df.withColumn("_t", F.row_number().over(w).cast("long"))
    return merged_row_number(df, order_col, "_t", segment_span=span)


def _windowed(df: DataFrame, keys, order_col, carry, span, build):
    """Apply ``build(df, window) -> df`` with a per-series window when
    grouped, the segmented merged stage otherwise."""
    if keys:
        w = Window.partitionBy(*keys).orderBy(order_col)
        return build(df, w)
    staged, w, fin = merged_window_stage(
        df, order_col=order_col, carry_rows=carry, segment_span=span
    )
    return fin(build(staged, w))


def _ema_once(
    df: DataFrame, keys, order_col, val_col, n: int, warmup: str, span, out_col: str
) -> DataFrame:
    """One EMA stage over ``val_col`` (rows must already carry ``_t``)."""
    alpha = F.lit(2.0) / (F.least(F.col("_t"), F.lit(n)) + F.lit(1.0))
    if warmup == "exponential":
        a = F.lit(1.0) - alpha
        b = alpha * F.col(val_col)
        df = df.withColumn("_a", a).withColumn("_b", b)
    elif warmup == "simple":
        const_alpha = 2.0 / (n + 1)

        def build(d, w):
            sma = F.avg(val_col).over(w.rowsBetween(-(n - 1), 0))
            return d.withColumn("_sma", sma)

        df = _windowed(df, keys, order_col, n - 1, span, build)
        warm = F.col("_t") <= n
        df = (
            df.withColumn("_a", F.when(warm, 0.0).otherwise(1.0 - const_alpha))
            .withColumn(
                "_b", F.when(warm, F.col("_sma")).otherwise(F.lit(const_alpha) * F.col(val_col))
            )
            .drop("_sma")
        )
    else:
        raise ValueError(f"unsupported warmup type: {warmup!r} (exponential|simple)")
    return linear_recurrence(
        df, keys, order_col, "_a", "_b", out_col, segment_span=span
    ).drop("_a", "_b")


def ta_transform(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    fn: str,
    n: int,
    warmup: str = "exponential",
    segment_span: int = DEFAULT_SEGMENT_SPAN_NS,
    out_col: str = "_ta",
) -> DataFrame:
    """Apply TA function ``fn`` with period ``n`` per series. Returns
    the emitted rows of ``df`` (null values dropped first, warmup rows
    the function does not emit filtered out) + ``out_col``."""
    if fn not in TA_FNS:
        raise ValueError(f"unknown TA function: {fn}")
    if n < 1:
        raise ValueError(f"{fn} period must be >= 1, got {n}")
    df = df.filter(F.col(val_col).isNotNull())
    df = _rn(df, keys, order_col, segment_span)
    v = F.col(val_col)

    if fn == "exponential_moving_average":
        out = _ema_once(df, keys, order_col, val_col, n, warmup, segment_span, out_col)
    elif fn in (
        "double_exponential_moving_average",
        "triple_exponential_moving_average",
        "triple_exponential_derivative",
    ):
        e1 = _ema_once(df, keys, order_col, val_col, n, warmup, segment_span, "_e1")
        e2 = _ema_once(e1, keys, order_col, "_e1", n, warmup, segment_span, "_e2")
        if fn == "double_exponential_moving_average":
            out = e2.withColumn(
                out_col, F.lit(2.0) * F.col("_e1") - F.col("_e2")
            ).drop("_e1", "_e2")
        else:
            e3 = _ema_once(e2, keys, order_col, "_e2", n, warmup, segment_span, "_e3")
            if fn == "triple_exponential_moving_average":
                out = e3.withColumn(
                    out_col,
                    F.lit(3.0) * F.col("_e1")
                    - F.lit(3.0) * F.col("_e2")
                    + F.col("_e3"),
                ).drop("_e1", "_e2", "_e3")
            else:  # TRIX: 1-point percent change of the triple-smoothed EMA

                def build(d, w):
                    prev = F.lag("_e3").over(w)
                    return d.withColumn(
                        out_col,
                        F.when(prev != 0, (F.col("_e3") / prev - 1.0) * 100.0),
                    )

                out = _windowed(e3, keys, order_col, 1, segment_span, build)
                out = out.filter(F.col("_t") >= 2).filter(
                    F.col(out_col).isNotNull()
                ).drop("_e1", "_e2", "_e3")
    elif fn in ("relative_strength_index", "chande_momentum_oscillator"):
        # both consume the difference series; index u = _t - 1 on it
        def build(d, w):
            return d.withColumn("_d", v - F.lag(val_col).over(w))

        diffs = _windowed(df, keys, order_col, 1, segment_span, build).filter(
            F.col("_d").isNotNull()
        )
        diffs = (
            diffs.withColumn("_u", F.col("_t") - 1)
            .withColumn("_g", F.greatest(F.col("_d"), F.lit(0.0)))
            .withColumn("_lo", F.greatest(-F.col("_d"), F.lit(0.0)))
        )
        if fn == "chande_momentum_oscillator":

            def build2(d, w):
                wr = w.rowsBetween(-(n - 1), 0)
                return d.withColumn("_sg", F.sum("_g").over(wr)).withColumn(
                    "_sl", F.sum("_lo").over(wr)
                )

            out = _windowed(diffs, keys, order_col, n - 1, segment_span, build2)
            denom = F.col("_sg") + F.col("_sl")
            out = (
                out.filter(F.col("_u") >= n)
                .withColumn(
                    out_col,
                    F.when(denom == 0, 0.0).otherwise(
                        100.0 * (F.col("_sg") - F.col("_sl")) / denom
                    ),
                )
                .drop("_d", "_u", "_g", "_lo", "_sg", "_sl")
            )
        else:  # RSI — Wilder smoothing seeded with the first-N simple mean

            def build2(d, w):
                wr = w.rowsBetween(-(n - 1), 0)
                return d.withColumn("_mg", F.avg("_g").over(wr)).withColumn(
                    "_ml", F.avg("_lo").over(wr)
                )

            staged = _windowed(diffs, keys, order_col, n - 1, segment_span, build2)
            warm = F.col("_u") <= n
            wilder_a = F.when(warm, 0.0).otherwise((n - 1) / float(n))
            staged = (
                staged.withColumn("_ag", wilder_a)
                .withColumn("_bg", F.when(warm, F.col("_mg")).otherwise(F.col("_g") / n))
                .withColumn("_bl", F.when(warm, F.col("_ml")).otherwise(F.col("_lo") / n))
            )
            r1 = linear_recurrence(
                staged, keys, order_col, "_ag", "_bg", "_avg", segment_span=segment_span
            )
            r2 = linear_recurrence(
                r1, keys, order_col, "_ag", "_bl", "_avl", segment_span=segment_span
            )
            out = (
                r2.filter(F.col("_u") >= n)
                .withColumn(
                    out_col,
                    F.when(F.col("_avl") == 0, 100.0).otherwise(
                        100.0 - 100.0 / (1.0 + F.col("_avg") / F.col("_avl"))
                    ),
                )
                .drop(
                    "_d", "_u", "_g", "_lo", "_mg", "_ml", "_ag", "_bg", "_bl",
                    "_avg", "_avl",
                )
            )
    else:  # kaufmans_efficiency_ratio / kaufmans_adaptive_moving_average

        def build(d, w):
            dabs = F.abs(v - F.lag(val_col).over(w))
            d = d.withColumn("_dabs", dabs)
            vol = F.sum("_dabs").over(w.rowsBetween(-(n - 1), 0))
            direction = F.abs(v - F.lag(val_col, n).over(w))
            return d.withColumn("_vol", vol).withColumn("_dir", direction)

        staged = _windowed(df, keys, order_col, n, segment_span, build)
        er = F.when(F.col("_vol") == 0, 0.0).otherwise(F.col("_dir") / F.col("_vol"))
        staged = staged.withColumn("_er", er)
        if fn == "kaufmans_efficiency_ratio":
            out = (
                staged.filter(F.col("_t") >= n + 1)
                .withColumn(out_col, F.col("_er"))
                .drop("_dabs", "_vol", "_dir", "_er")
            )
        else:
            # explicit product, not F.pow(x, 2): libm pow is only
            # 1-ulp-accurate and differs between JVM and C runtimes;
            # x*x is one IEEE rounding everywhere, so the DuckDB
            # oracle (q_ta_kama) reproduces sc bit-for-bit
            sc_base = F.col("_er") * F.lit(_KAMA_FAST - _KAMA_SLOW) + F.lit(_KAMA_SLOW)
            sc = sc_base * sc_base
            seedrow = F.col("_t") <= n + 1
            staged = staged.withColumn(
                "_a", F.when(seedrow, 0.0).otherwise(1.0 - sc)
            ).withColumn("_b", F.when(seedrow, v).otherwise(sc * v))
            rec = linear_recurrence(
                staged, keys, order_col, "_a", "_b", out_col, segment_span=segment_span
            )
            out = rec.filter(F.col("_t") >= n + 1).drop(
                "_dabs", "_vol", "_dir", "_er", "_a", "_b"
            )
    return out.drop("_t")
