"""Shared time-bucket banding for range joins (batch and streaming).

A range join ``t2 in [t1, t1+W]`` with an equi conjunct leaves Theta(k^2)
residual comparisons inside each hot equal-key block. Banding adds a
coarse W-wide time bucket to the join key: the left side duplicates each
row into its own and the next bucket, the right side keeps one, and any
qualifying pair matches in EXACTLY one assignment — identical output, no
post-dedup (see ops/joins.py join_theta_range for the measured numbers).

The bucket MUST be computed with exact integer division: FP division +
cast('long') can round an exact boundary quotient to n-eps, landing a row
one bucket early and silently dropping a qualifying pair. Spark's ``div``
truncates toward zero, so for negative-epoch (pre-1970) data bucket 0
spans (-W, W) — 2W wide. That is still safe: bucketing stays monotonic
and every bucket is at least W wide, so bkt(t1+W) <= bkt(t1)+1 always
holds. The brute-force boundary test in tests/test_properties.py pins
this, including pre-1970 fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_bucket(ts_col: str, width_us: int) -> Column:
    """Exact-integer bucket index of timestamp column ``ts_col``.

    ``div`` is an infix operator with no Column-API equivalent (`/` is
    DOUBLE division, unusable here per the module docstring), so this
    stays an F.expr — but the identifier is backtick-quoted (with
    embedded backticks doubled, Spark's escape) so a column name that
    needs quoting can't silently become an expression."""
    if not isinstance(width_us, int) or width_us <= 0:
        raise ValueError(f"width_us must be a positive int, got {width_us!r}")
    quoted = ts_col.replace("`", "``")
    return F.expr(f"unix_micros(`{quoted}`) div {width_us}")


def banded_assignments(ts_col: str, width_us: int) -> Column:
    """The left side's two candidate buckets (own and next) to explode."""
    b = time_bucket(ts_col, width_us)
    return F.array(b, b + 1)
