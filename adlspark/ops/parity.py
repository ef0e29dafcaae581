"""Cross-engine comparability helpers (SURVEY.md §5.3, hardened).

Float discipline
----------------
``round(sum(double), 6)`` is NOT safe across engines: summing 60k doubles of
magnitude ~1e4 leaves order-dependent roundoff ~1e-5, which straddles 1e-6
rounding boundaries. Instead every cross-engine double *sum* goes through
**exact decimal summation**: cast each input to DECIMAL(38, s), sum (exact,
associative, order-independent), cast the total back to double. Both Spark
and DuckDB produce the identical decimal, hence the identical double.

- ``dsum(col)``   → Spark side;   ``o_dsum(expr)``  → oracle-SQL side.
- ``davg(col)``   → exact-sum / count (deterministic IEEE divide), round 6.
- Non-decimalizable statistics (stddev/corr/percentile) round coarsely
  (ROUND_STATS=4) — their cross-engine drift is ≪1e-4 relative.

Both sides MUST use the same scale; 6 fractional digits at DECIMAL(38,6)
leaves 32 integral digits — no overflow until ~1e32, fine at any sf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
O_DEC = "DECIMAL(38,6)"
ROUND_STATS = 4
ROUND_COS = 4


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str, ndigits: int = 6) -> Column:
    """Exact-sum average of a double column, rounded to `ndigits`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c), ndigits
    )


def o_dsum(expr: str) -> str:
    """Oracle-SQL twin of ``dsum``."""
    return f"CAST(sum(CAST(({expr}) AS {O_DEC})) AS DOUBLE)"


def o_davg(expr: str, ndigits: int = 6) -> str:
    """Oracle-SQL twin of ``davg``."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS {O_DEC})) AS DOUBLE)"
        f" / count({expr}), {ndigits})"
    )


# ---------------------------------------------------------------------------
# TOTAL variants (round 9 — the scheduled round-10 swap target).
#
# The plain helpers above are not total over non-representable doubles:
# Spark ANSI ABORTS casting ±Inf / DBL_MAX to DECIMAL(38,6) (NaN silently
# NULLs), and DuckDB's TRY_CAST still ERRORS on NaN (engine bug, probed on
# DuckDB 1.0). These variants agree value-by-value on every extreme
# (NaN/±Inf/DBL_MAX → excluded as NULL; -0.0 and denormals → 0), making
# "non-representable doubles are excluded from exact sums" the documented
# convention; averages count only representable values so both sides use
# the same denominator. Pinned by tests/test_parity_total.py; kernels
# switch over in round 10 (the swap re-enters ~35 keys — window-budgeted
# there, see BASELINE.md round-9 float-extremes record).
# ---------------------------------------------------------------------------


def dsum_total(col: Column | str) -> Column:
    """``dsum`` that is total over NaN/±Inf/out-of-range doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.try_cast(DEC)).cast("double")


def davg_total(col: Column | str, ndigits: int = 6) -> Column:
    """``davg`` over the decimal-representable values only."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.try_cast(DEC)
    return F.round(F.sum(d).cast("double") / F.count(d), ndigits)


def _o_dec_total(expr: str) -> str:
    # isnan guard first: DuckDB TRY_CAST(NaN AS DECIMAL) errors instead
    # of yielding NULL; isnan(NULL) is NULL -> ELSE branch -> NULL, safe
    return f"TRY_CAST(CASE WHEN isnan({expr}) THEN NULL ELSE ({expr}) END AS {O_DEC})"


def o_dsum_total(expr: str) -> str:
    """Oracle-SQL twin of ``dsum_total``."""
    return f"CAST(sum({_o_dec_total(expr)}) AS DOUBLE)"


def o_davg_total(expr: str, ndigits: int = 6) -> str:
    """Oracle-SQL twin of ``davg_total``."""
    return (
        f"round(CAST(sum({_o_dec_total(expr)}) AS DOUBLE)"
        f" / count({_o_dec_total(expr)}), {ndigits})"
    )
