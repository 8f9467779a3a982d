"""Cross-engine float-parity helpers (round 12, VERDICT r11 items 1–2).

The oracle gate hash-compares doubles produced independently by Spark
(JVM Math.log/exp) and DuckDB (C libm). IEEE 754 defines +,−,×,÷,sqrt
as correctly rounded — those are bit-identical across engines given
bit-identical inputs — but ln/exp/pow/log2 are NOT: each call may
differ in the last ulp between libms. A value that ACCUMULATES many
such calls (a Σ ln p dot product, a per-token avg of logs) can drift
~n·ulp, enough to land within the drift of a decimal rounding
boundary and flip a round(x, k) differently per engine — exactly the
round-11 `q_quality_classifier` driver failure.

Discipline (applied to every hash-compared value in the catalog):

1. QUANTIZE EACH TRANSCENDENTAL AT ITS CALL SITE to integer fixed
   point: ``fixed_log(expr)`` = cast(round(expr·1e9) as long). The
   single rounding absorbs the ≤ few-ulp cross-libm difference unless
   that one call lands within ulps of a half-quantum boundary
   (probability ~1e-9 PER CALL SITE VALUE, not per accumulated doc —
   and independent of how many rows sum it).
2. ACCUMULATE IN INTEGERS: sums/dot products of quantized values are
   exact and order-independent — immune to both libm variance and
   shuffle-order float-sum nondeterminism.
3. DIVIDE ONCE AT THE END: ``unfix(col)`` = col / 1e9 — integer→double
   conversion and division are correctly rounded, so both engines
   emit the identical double.
4. A transcendental of a COMPUTED value (σ(log_odds), exp(Σ…)) must
   either take a bit-identical argument built by rules 1–3 and be the
   single final call (documented flip probability ≤ ~4·ulp/grid per
   row), or stay engine-side, excluded from hashed projections.

The SQL mirror of ``fixed_log`` is
``CAST(round(expr * 1000000000.0) AS BIGINT)`` — DuckDB ``round`` and
Spark ``F.round`` both round half away from zero. ``scripts/
float_margin_probe.py`` measures the realized boundary margins;
SCALE.md records the table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# log-space quantum 1e-9: coarse enough that a few ulps of cross-libm
# disagreement on ln/exp outputs (≤ ~1e-13 absolute for |x| ≤ 1e3)
# cannot straddle a half-quantum boundary in practice; fine enough
# that per-token quantization error (≤ 5e-10) stays invisible at the
# 4–6 dp output roundings even summed over 10^4-gram documents.
FIXED_SCALE_LOG = 1_000_000_000

#: the SQL literal mirroring FIXED_SCALE_LOG
SQL_SCALE_LOG = "1000000000.0"


def fixed_log(expr: Column) -> Column:
    """Quantize a (usually transcendental) double expression to
    integer fixed point — cast(round(expr · 1e9) as long). Sums of
    these are exact and order-independent in every engine."""
    return F.round(expr * F.lit(float(FIXED_SCALE_LOG))).cast("long")


def unfix(expr: Column) -> Column:
    """Back to double: one correctly-rounded division, bit-identical
    across engines given identical integer input."""
    return expr / F.lit(float(FIXED_SCALE_LOG))
