"""Generic as-of join operator (Spark has no native one).

``asof_join(left, right, on, left_ts, right_ts, right_cols)`` attaches to
every left row the ``right_cols`` of the most recent right row with
``right.ts <= left.ts`` within the same ``on`` key (inclusive — DuckDB
ASOF semantics; unmatched left rows keep NULLs, i.e. ASOF LEFT JOIN).

Implementation: union-tag + running ``last(..., ignorenulls)`` window —
one shuffle on the key, O(1) state per row, no join node and no candidate
explosion; the shape that survives any scale. At equal timestamps the
right row sorts first, making the match inclusive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance=None,
    direction: str = "backward",
) -> DataFrame:
    """ASOF LEFT JOIN. ``tolerance``: optional max lookback (backward) /
    lookahead (forward) as a Column interval (e.g. ``F.expr("INTERVAL 1
    HOUR")``) — matches outside the horizon are nulled out.
    ``direction``: 'backward' matches the most recent right row at or
    before the left timestamp; 'forward' the earliest right row at or
    after it (pandas merge_asof semantics). Forward runs the identical
    one-window kernel with the time order reversed."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    fwd = direction == "forward"
    out_prefix = "asof_"
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(left_ts)
    )
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"_r_{c}", F.lit(None))
    r_tagged = right.select(
        *on, F.col(right_ts).alias("_ats"), *[F.col(c).alias(f"_r_{c}") for c in right_cols]
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    # Ordering: timestamp, then right-before-left (inclusive match), then —
    # when several right rows share the same (key, ts) — the right payload
    # tuple itself, so the carried row is deterministically the one with
    # the greatest right_cols value instead of whichever row the shuffle
    # happened to deliver last.
    order = [F.col("_ats").desc() if fwd else F.col("_ats"), F.col("_side")]
    if right_cols:
        order.append(F.struct(*[F.col(f"_r_{c}") for c in right_cols]))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            f"{out_prefix}{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"_r_{c}")), ignorenulls=True).over(w),
        )
    carried = carried.withColumn(
        f"{out_prefix}ts",
        F.last(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        if fwd:
            too_old = F.col(f"{out_prefix}ts") > (F.col(left_ts) + tolerance)
        else:
            too_old = F.col(f"{out_prefix}ts") < (F.col(left_ts) - tolerance)
        for c in right_cols:
            out = out.withColumn(
                f"{out_prefix}{c}",
                F.when(too_old, F.lit(None)).otherwise(F.col(f"{out_prefix}{c}")),
            )
        out = out.withColumn(
            f"{out_prefix}ts",
            F.when(too_old, F.lit(None)).otherwise(F.col(f"{out_prefix}ts")),
        )
    drop = ["_side", "_ats"] + [f"_r_{c}" for c in right_cols]
    return out.drop(*drop)
