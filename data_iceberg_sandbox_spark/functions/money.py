"""Exact fixed-point money aggregation on BIGINT (the fast path).

Spark's decimal ``sum`` leaves the primitive-long fast path as soon as
the input precision exceeds 8 (sum adds +10 precision; > 18 total →
java.math.BigDecimal per row), and any decimal *product* (precision ≥
11) always sums on the slow path — measured ~2× the whole aggregation
time of the revenue-shaped TPC-H queries at sf0.1. DuckDB never pays
this: its DECIMAL is int128 fixed-point end to end.

This module applies the same idea inside Spark's codegen'd long
arithmetic: scale each operand to an integer (cents, milli-rates),
multiply and sum as BIGINT — exact, order-independent, whole-stage
codegen — and divide once at the end, emitting the identical DOUBLE the
decimal formulation produces (the DuckDB oracles keep the decimal SQL —
every query using this path is hash-checked bit-equal against it).

Exactness bounds (all fail LOUD, never silently wrong):
- Per-row products and group sums stay in BIGINT; under ANSI mode
  (session default) overflow raises. Headroom for the scale-5 revenue
  shape (cents × milli-rate ≤ 1e10/row): ~9.2e8 rows PER GROUP —
  sf1000's 6e9-row lineitem split over 25 nations still fits. Shapes
  that would exceed it (scale-8 two-rate products) must pre-aggregate
  by a low-cardinality key first (see ``q1``'s tax-class regroup) or
  fall back to the decimal formulation.
- The final ``CAST(sum AS DOUBLE) / 10^scale`` equals the decimal
  path's single rounding while the integer sum < 2^53 (exact DOUBLE);
  beyond that a DOUBLE emit has run out of mantissa in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed(col: Column | str, scale: int = 2) -> Column:
    """Scale a money/rate column to an exact BIGINT at ``scale`` decimal
    places.

    Implemented as ``floor(x·10^scale + 0.5)`` rather than ``round``:
    Spark's Round on DOUBLE allocates a java.math.BigDecimal per row
    (measured ~15% of q1's whole runtime at sf0.1), while floor stays a
    single Math.floor in codegen. The two agree exactly for any input
    whose true value fits the scale — x·10^scale then lands within
    ~1e-9 of an integer k (the double 1234.56*100 is 123455.999…), so
    +0.5 can never reach the next half-integer boundary, and floor
    recovers k for negative values too (a bare BIGINT cast would
    truncate toward zero and break negatives; floor does not)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5)).cast("bigint")


def unscale(sum_col: Column, scale: int) -> Column:
    """Emit an integer fixed-point sum as DOUBLE at the true magnitude —
    one IEEE division, identical to casting the exact decimal sum."""
    return (sum_col.cast("double") / F.lit(float(10**scale)))
