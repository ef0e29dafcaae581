"""§2 E — Window functions.

Every window carries a unique tiebreaker in ORDER BY (§5.3 determinism).
Window sums over doubles use the decimal trick from parity.py: engines
disagree on frame-sum accumulation order (running vs segment-tree), so
only an exact decimal sum is comparable. Scale note: window state is
per-partition; partitionBy keys here (nation, user, customer) shard the
work — no global windows except where the operator is inherently global
(ntile over all customers), which at 100 TB would be re-expressed over a
bucketed pre-aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.ops.parity import DEC
from adlspark.registry import query


@query(
    "win_rownum",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       row_number() OVER (PARTITION BY coalesce(c_nationkey, -1)
                          ORDER BY coalesce(c_acctbal,
                                            '-infinity'::DOUBLE) DESC,
                                   c_custkey) AS rn
FROM customer
""",
)
def win_rownum(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal", F.row_number().over(w).cast("long").alias("rn")
    )


@query(
    "win_rank_dense",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
       rank() OVER (PARTITION BY coalesce(c_nationkey, -1)
                    ORDER BY CAST(floor(coalesce(c_acctbal, -1e15) / 100)
                                  AS BIGINT) DESC) AS rnk,
       dense_rank() OVER (PARTITION BY coalesce(c_nationkey, -1)
                          ORDER BY CAST(floor(coalesce(c_acctbal, -1e15)
                                              / 100)
                                        AS BIGINT) DESC) AS drnk
FROM customer
""",
)
def win_rank_dense(spark, sf_dir):
    """rank/dense_rank with genuine ties (acctbal bucketed to hundreds).

    Bucketing uses ``floor(x/100)`` (not ``round(x, -2)``): Spark rounds
    doubles HALF_UP while DuckDB rounds HALF_EVEN, so exact .50 hundred
    boundaries would land in different buckets and shift every later rank.
    floor is rounding-mode-free and IEEE-identical across engines.
    """
    c = tables.load(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 100).cast("long")
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("bal_bucket").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        "bal_bucket",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "win_topk_group",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY coalesce(c_mktsegment, chr(1))
                            ORDER BY coalesce(o_totalprice,
                                              '-infinity'::DOUBLE) DESC,
                                     o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) t WHERE rn <= 3
""",
)
def win_topk_group(spark, sf_dir):
    """Top-3 per group ≡ DuckDB QUALIFY. At scale this is the standard
    shuffle-once top-k; AQE handles group skew."""
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       lag(value, 2, -1.0) OVER w AS prev2_value
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
WINDOW w AS (PARTITION BY coalesce(user_id, -1)
             ORDER BY coalesce(ts, TIMESTAMP '1900-01-01'), event_id)
""",
)
def win_lag_lead(spark, sf_dir):
    ev = tables.events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "win_running_sum",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(sum(TRY_CAST(CASE WHEN isnan(o_totalprice) THEN NULL ELSE (o_totalprice) END AS DECIMAL(38,6)))
              OVER (PARTITION BY coalesce(o_custkey, -1)
                    ORDER BY coalesce(o_orderdate, TIMESTAMP '1900-01-01'),
                             o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
""",
)
def win_running_sum(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").try_cast(DEC)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(CAST(sum(TRY_CAST(CASE WHEN isnan(o_totalprice) THEN NULL ELSE (o_totalprice) END AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / count(*) OVER w, 6) AS mavg
FROM orders
WINDOW w AS (PARTITION BY coalesce(o_custkey, -1)
             ORDER BY coalesce(o_orderdate, TIMESTAMP '1900-01-01'),
                      o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def win_moving_avg(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum(F.col("o_totalprice").try_cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("mavg"),
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       count(*) OVER (PARTITION BY coalesce(o_orderstatus, chr(1))
                      ORDER BY coalesce(o_totalprice, -1e15)
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
         AS n_near
FROM orders
""",
)
def win_range_frame(spark, sf_dir):
    """Value-range frame: orders within ±1000 of each order's price.

    Scale note (round-8 sliding-frame audit): Spark re-aggregates a
    bounded sliding frame whenever its lower bound moves, so this costs
    O(rows × frame) per status partition. The integer-key difference
    rewrite (ts_velocity_features) does NOT apply here — the order key
    is a continuous DOUBLE, where "strictly below p−1000" is not
    expressible as an inclusive unbounded-preceding offset frame, so
    the subtraction would drop exact-boundary ties. This key exists to
    pin Spark's native RANGE-offset operator; a 100 TB deployment with
    a dense price axis would bucket prices to integer cents first and
    then use the prefix-difference form."""
    o = tables.load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
    )


@query(
    "win_ntile_pct",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist
FROM customer
WINDOW w AS (ORDER BY coalesce(c_acctbal, '-infinity'::DOUBLE), c_custkey)
""",
)
def win_ntile_pct(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT c_custkey, c_nationkey,
       first_value(c_custkey) OVER w AS richest,
       last_value(c_custkey) OVER w AS poorest
FROM customer
WINDOW w AS (PARTITION BY coalesce(c_nationkey, -1)
             ORDER BY coalesce(c_acctbal, '-infinity'::DOUBLE) DESC,
                      c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.first("c_custkey").over(w).alias("richest"),
        F.last("c_custkey").over(w).alias("poorest"),
    )


@query(
    "win_nth_value",
    oracle="""
SELECT c_custkey, c_nationkey,
       nth_value(c_custkey, 2) OVER w AS second_richest,
       lag(c_custkey, 1) OVER (PARTITION BY coalesce(c_nationkey, -1)
                               ORDER BY coalesce(c_acctbal,
                                                 '-infinity'::DOUBLE) DESC,
                                        c_custkey)
         AS prev_in_rank
FROM customer
WINDOW w AS (PARTITION BY coalesce(c_nationkey, -1)
             ORDER BY coalesce(c_acctbal, '-infinity'::DOUBLE) DESC,
                      c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_nth_value(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    full = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    run = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.nth_value("c_custkey", 2).over(full).alias("second_richest"),
        F.lag("c_custkey", 1).over(run).alias("prev_in_rank"),
    )


@query(
    "win_cume_pct",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(round(CAST(percent_rank() OVER w AS DECIMAL(18,12)), 6)
            AS DOUBLE) AS pct_rank,
       CAST(round(CAST(cume_dist() OVER w AS DECIMAL(18,12)), 6)
            AS DOUBLE) AS cume,
       CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket
FROM customer
WINDOW w AS (PARTITION BY coalesce(c_nationkey, -1)
             ORDER BY CAST(floor(coalesce(c_acctbal, -1e15) / 100)
                           AS BIGINT), c_custkey)
""",
)
def win_cume_pct(spark, sf_dir):
    """percent_rank + cume_dist over a deterministic total order
    (floor-bucketed balance, custkey tiebreak — same rounding-mode-free
    bucketing as win_rank_dense). The ratios are rounded through a
    DECIMAL(18,12) guard cast on BOTH engines: k/n with a 2·5-smooth n
    lands EXACTLY on round-6 ties (e.g. 82/1280 = 0.0640625 at sf0.1),
    where Spark's double round (HALF_UP on the binary value) and
    DuckDB's differ — both engines round DECIMALS half-up identically,
    so the guard cast makes the tie deterministic."""
    c = tables.load(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 100).cast("long")
    )
    w = Window.partitionBy("c_nationkey").orderBy("bal_bucket", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w).cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("pct_rank"),
        F.round(F.cume_dist().over(w).cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("cume"),
        "bal_bucket",
    )


@query(
    "win_streak",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE user_id < 50
), g AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY coalesce(day, DATE '1900-01-01'))
                    AS INTEGER) AS grp
  FROM d
), s AS (
  SELECT user_id, grp, count(*) AS streak_len, min(day) AS streak_start
  FROM g GROUP BY user_id, grp
), r AS (
  SELECT user_id, streak_len, streak_start,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY streak_len DESC,
                    coalesce(streak_start, DATE '1900-01-01')) AS rk
  FROM s
)
SELECT user_id, streak_len AS longest_streak_days, streak_start
FROM r WHERE rk = 1
""",
)
def win_streak(spark, sf_dir):
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands window pattern (day minus dense row_number is
    constant within a run of consecutive days, so runs fall out of one
    group-by), used for engagement/retention features. Deterministic
    tie-break: earliest streak wins.

    Scale shape: distinct (user, day) first — collapses event volume to
    at most users x days; then two user-partitioned windows and two
    map-side-combinable aggregates, all on the same user-keyed shuffle.
    The user filter keeps fixture output reviewable; the plan shape is
    unchanged without it."""
    ev = tables.events(spark, sf_dir).where(F.col("user_id") < 50)
    d = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    rw = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start")
    )
    return (
        s.withColumn("rk", F.row_number().over(rw))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("longest_streak_days"),
            "streak_start",
        )
    )


@query(
    "win_distinct_running",
    oracle="""
WITH e AS (
  SELECT DISTINCT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
         user_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT DISTINCT event_type, d AS day,
       CAST(count(DISTINCT user_id) OVER (
         PARTITION BY coalesce(event_type, chr(1)) ORDER BY d
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_distinct_users
FROM e
""",
)
def win_distinct_running(spark, sf_dir):
    """Running COUNT(DISTINCT) over a window — cumulative distinct users
    per event_type by day. Spark's window functions reject DISTINCT
    aggregates, so the operator IS the scalable rewrite: a user counts
    exactly once, on their FIRST day — so per-(type, user) min(day),
    count the first-appearances per day, and a plain running SUM over
    the per-day new-user counts. The oracle uses DuckDB's NATIVE
    count(DISTINCT) OVER with a RANGE frame, so the hash check certifies
    the rewrite's equivalence (the same native-vs-rewrite contract as
    ``subq_any_all``).

    Scale shape: the naive form (collect_set over an ever-growing
    frame) holds every user id seen so far in window state — O(users)
    memory per partition; the rewrite's state is ONE running integer,
    and all heavy stages (distinct, min, count) are map-side-combinable
    hash shuffles. This is how cumulative-uniques dashboards are
    actually computed at 100 TB.
    """
    # Domain: non-null (user_id, ts) — "cumulative distinct USERS by
    # DAY" is undefined for a userless or timeless event. Without the
    # filter the rewrite's per-day new-user count would count a NULL
    # user (count(1) over the first-day groups) where the oracle's
    # count(DISTINCT user_id) ignores it, and a NULL day would ride
    # Spark's NULLS-FIRST running frame vs DuckDB's NULLS-LAST.
    ev = tables.events(spark, sf_dir).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("d"),
        "user_id",
    )
    firsts = ev.groupBy("event_type", "user_id").agg(F.min("d").alias("fd"))
    new_per_day = firsts.groupBy("event_type", F.col("fd").alias("d")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = ev.select("event_type", "d").distinct()
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # eqNullSafe on event_type: a NULL type is one group to groupBy,
    # to DISTINCT, and to the oracle's PARTITION BY — but a plain
    # equi-join would drop it (NULL != NULL), zeroing the null group's
    # running count. The join stays broadcastable either way (both
    # sides are (type, day)-sized).
    npd = (
        new_per_day.withColumnRenamed("event_type", "et_r")
        .withColumnRenamed("d", "d_r")
    )
    return (
        days.join(
            npd,
            days["event_type"].eqNullSafe(npd["et_r"])
            & (days["d"] == npd["d_r"]),
            "left",
        )
        .select(
            days["event_type"],
            days["d"].alias("day"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(w)
            .cast("long")
            .alias("cum_distinct_users"),
        )
    )


@query(
    "win_time_range",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(count(*) OVER (
         PARTITION BY coalesce(user_id, -1)
         ORDER BY coalesce(CAST(ts AS TIMESTAMP), TIMESTAMP '1900-01-01')
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_last_hour
FROM events
""",
)
def win_time_range(spark, sf_dir):
    """Time-interval RANGE window — for every event, how many of the
    same user's events fall in the trailing one hour (the rolling
    rate-limit / burst-detection primitive). Spark's window frames
    accept only NUMERIC range bounds, so the operator IS the standard
    rewrite: order by integer epoch-microseconds and bound the frame at
    -3.6e9 µs. The oracle runs DuckDB's NATIVE `RANGE BETWEEN INTERVAL
    1 HOUR PRECEDING`, so the hash check certifies the rewrite's
    equivalence — same native-vs-rewrite contract as
    ``win_distinct_running`` and ``subq_any_all``.

    Scale shape: one hash shuffle by user, per-user time sort. Spark
    re-aggregates a bounded sliding frame's buffer whenever its lower
    bound moves — O(rows × frame_size) per partition — but at a 1-hour
    horizon the frame stays small and the per-user SORT dominates
    (measured linear on the round-8 50%-hot-user ladder: 2.44× wall for
    2.5× hot rows). Keys whose frame grows with time-density (the 7-day
    horizon in ts_velocity_features) use the difference-of-two-
    unbounded-prefix-counts rewrite instead; it is NOT used here because
    it is wall-clock neutral at this frame size and diverges on NULL-ts
    peer groups (a trailing frame counts a null row's null peers; a
    prefix difference counts none — the oracle pins the former).
    """
    ev = tables.events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
    )
