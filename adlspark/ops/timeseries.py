"""§2 J — Time-series / event analytics (batch forms of the streaming
surface; §K re-runs the same logic through Structured Streaming).

All timestamps follow the §1.3 discipline: events.ts is µs-truncated via
integer division (tables.events), matching DuckDB's CAST(ts AS TIMESTAMP),
so window boundaries computed on both sides agree exactly. Outputs avoid
timezone-dependent functions (date_trunc/epoch only — no to_timestamp
tz round-trips).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.ops.parity import DEC, O_DEC, dsum_total, o_dsum_total
from adlspark.registry import query


@query(
    "ts_tumbling",
    oracle=f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
       event_type,
       count(*) AS n,
       {o_dsum_total('value')} AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def ts_tumbling(spark, sf_dir):
    """Tumbling 1-hour window per event_type. F.window with epoch-aligned
    1-hour buckets ≡ date_trunc('hour') — map-side combinable.

    Null-ts rows are OUT of the domain: Spark's F.window silently drops
    them (a timeless event belongs to no window), so the oracle filters
    them explicitly rather than keeping DuckDB's NULL-bucket group."""
    ev = tables.events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_total("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


@query(
    "ts_sliding",
    oracle=f"""
WITH e AS (
  SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800 AS BIGINT)
           AS t30, value
  FROM events
  WHERE ts IS NOT NULL
), w AS (
  SELECT t30 AS w_epoch, value FROM e
  UNION ALL
  SELECT t30 - 1800 AS w_epoch, value FROM e
)
SELECT w_epoch, count(*) AS n,
       {o_dsum_total('value')} AS sum_value
FROM w GROUP BY w_epoch
""",
)
def ts_sliding(spark, sf_dir):
    """Sliding 1-hour window every 30 min — each event lands in exactly
    two windows. Output key is epoch seconds of the window start (avoids
    any tz representation issues across engines)."""
    ev = tables.events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_total("value").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_epoch"), "n", "sum_value"
        )
    )


@query(
    "ts_session",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
  WHERE ts IS NOT NULL
), g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY coalesce(user_id, -1) ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY coalesce(user_id, -1) ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM g
), per AS (
  SELECT user_id, sid, count(*) AS n,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(sum(dur_us) AS BIGINT) AS total_dur_us
FROM per GROUP BY user_id
""",
)
def ts_session(spark, sf_dir):
    """Session windows per user with 5-minute gap. Spark's session_window
    starts a NEW session when the gap is ≥ the timeout (windows touching
    at exactly gap don't merge), hence the oracle's `>=` in the
    gaps-and-islands form. Durations are exact µs longs."""
    ev = tables.events(spark, sf_dir)
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", "5 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.sum("dur_us").alias("total_dur_us"),
    )


@query(
    "ts_dedup",
    oracle="""
SELECT event_id, user_id, event_type,
       date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_bucket
FROM (
  SELECT event_id, user_id, event_type, ts,
         row_number() OVER (
           PARTITION BY coalesce(user_id, -1),
                        coalesce(event_type, chr(1)),
                        date_trunc('minute',
                                   coalesce(CAST(ts AS TIMESTAMP),
                                            TIMESTAMP '1900-01-01'))
           ORDER BY coalesce(CAST(ts AS TIMESTAMP), TIMESTAMP '1900-01-01'),
                    event_id) AS rn
  FROM events
) t WHERE rn = 1
""",
)
def ts_dedup(spark, sf_dir):
    """Keep-first dedup on (user_id, event_type, minute) — deterministic
    row_number form, unlike dropDuplicates' arbitrary tie choice (the
    idempotent re-ingest primitive).

    Oracle null-key sentinels: DuckDB 1.0's parallel window sort is
    UNSTABLE when a PARTITION BY / ORDER BY key is NULL (null groups
    split per chunk and can corrupt neighboring partition boundaries —
    reproduced: 200k rows, partition counts vary per run). Every
    nullable window key in the events-family oracles is coalesced to an
    out-of-domain sentinel (user -1 / chr(1) / 1900 timestamps), which
    is the identity on the null-free driver fixtures and reproduces
    Spark's null placement (ASC NULLS FIRST, DESC NULLS LAST) exactly
    on the null corpora in tests/test_null_robustness.py."""
    ev = tables.events(spark, sf_dir).withColumn(
        "minute_bucket", F.date_trunc("minute", F.col("ts"))
    )
    w = Window.partitionBy("user_id", "event_type", "minute_bucket").orderBy(
        "ts", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "minute_bucket")
    )


@query(
    "ts_gap_fill",
    oracle="""
WITH b AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events WHERE user_id < 20
  GROUP BY user_id, day
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM b GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
)
SELECT g.user_id, g.day, coalesce(b.n, 0) AS n_events,
       (b.n IS NULL) AS filled
FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.day = b.day
""",
)
def ts_gap_fill(spark, sf_dir):
    """Time-series gap filling: per-user daily counts densified onto a
    complete day grid between that user's first and last event — missing
    days appear as explicit zero rows (flagged), which downstream window
    functions (moving averages, lag deltas) require to be correct. The
    grid comes from `sequence()` per user (one row per user explodes to
    its span) — no cross join against a global calendar, so grid size
    scales with Σ user-spans, and the fill join is a co-partitioned
    equi join on (user, day). User subset keeps the fixture output
    reviewable; the plan is unchanged by the filter."""
    ev = tables.events(spark, sf_dir).where(F.col("user_id") < 20)
    b = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        b.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return (
        grid.join(b, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("filled"),
        )
    )


@query(
    "ts_funnel",
    oracle="""
SELECT user_id,
       (first_signup IS NOT NULL) AS has_signup,
       (first_signup IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase > first_signup) AS converted,
       first_signup, first_purchase
FROM (
  SELECT user_id,
         min(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'signup')
           AS first_signup,
         min(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'purchase')
           AS first_purchase
  FROM events GROUP BY user_id
) t
""",
)
def ts_funnel(spark, sf_dir):
    """Ordered funnel signup→purchase per user via conditional min-ts —
    one aggregation pass, no self-join."""
    ev = tables.events(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return agg.select(
        "user_id",
        F.col("first_signup").isNotNull().alias("has_signup"),
        (
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
        ).alias("converted"),
        "first_signup",
        "first_purchase",
    )


@query(
    "ts_resample_ohlc",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         ts, event_id, value
  FROM events
), r AS (
  SELECT user_id, day, value,
         row_number() OVER (
           PARTITION BY coalesce(user_id, -1),
                        coalesce(day, DATE '1900-01-01')
           ORDER BY coalesce(ts, TIMESTAMP '1900-01-01'), event_id) AS rn_a,
         row_number() OVER (
           PARTITION BY coalesce(user_id, -1),
                        coalesce(day, DATE '1900-01-01')
           ORDER BY coalesce(ts, TIMESTAMP '1900-01-01') DESC,
                    event_id DESC) AS rn_d
  FROM e
)
SELECT user_id, day,
       max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       max(CASE WHEN rn_d = 1 THEN value END) AS close_v,
       count(*) AS n
FROM r GROUP BY user_id, day
""",
)
def ts_resample_ohlc(spark, sf_dir):
    """Daily OHLC resample per user: open/close are the first/last value
    by (ts, event_id) — the event_id tiebreak makes the answer
    deterministic even under equal timestamps — high/low/n are plain
    aggregates. Both row_numbers share the (user, day) partitioning, so
    the exchange is paid once (the opposite sort order adds a sort, not
    a shuffle), then a map-side-combinable aggregate; this is the
    downsample-to-bars shape every metrics store runs at scale."""
    ev = tables.events(spark, sf_dir)
    e = ev.select(
        "user_id",
        F.to_date(F.col("ts")).alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id", "day")
    r = e.select(
        "user_id",
        "day",
        "value",
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("rn_a"),
        F.row_number()
        .over(w.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_d"),
    )
    return r.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ts_retention",
    oracle="""
WITH su AS (
  SELECT user_id,
         min(epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000) AS cohort_w
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w
  FROM events
)
SELECT su.cohort_w, act.w - su.cohort_w AS weeks_since,
       count(DISTINCT act.user_id) AS n_active
FROM su JOIN act USING (user_id)
WHERE act.w >= su.cohort_w
GROUP BY 1, 2
""",
)
def ts_retention(spark, sf_dir):
    """Cohort retention: users grouped by their first-signup week, counted
    as active in each subsequent week — THE product-analytics matrix. Week
    buckets are exact integer epoch-µs floor-divisions (no tz or float
    drift on either engine). Shape at scale: one filter+agg for cohorts,
    one distinct-projection for activity, a user-keyed equi join (both
    sides shuffle on user_id once), then a small (cohort, week) aggregate
    — no window functions, no cross joins, linear in events."""
    ev = tables.events(spark, sf_dir)
    week = F.expr("unix_micros(ts) div 604800000000")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).alias("cohort_w"))
    )
    act = ev.select("user_id", week.alias("w")).distinct()
    return (
        su.join(act, "user_id")
        .where(F.col("w") >= F.col("cohort_w"))
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("weeks_since"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "ts_anomaly_zscore",
    oracle=f"""
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         {{o_dsum_value}} AS sx,
         {{o_dsum_value2}} AS sxx
  FROM events GROUP BY event_type
), v AS (
  -- negative sample variance is a totality-convention artifact (a
  -- ~1e20 value is IN sx but its 1e40 square is excluded from sxx):
  -- the z-score is undefined there — NULL on both engines (DuckDB's
  -- sqrt(negative) ERRORS; Spark's yields NaN, which the abs filter
  -- would KEEP since NaN compares greatest)
  SELECT event_type, n, sx,
         CASE WHEN (sxx - (sx * sx) / n) / (n - 1.0) >= 0
              THEN sqrt((sxx - (sx * sx) / n) / (n - 1.0)) END AS sd
  FROM s
), z AS (
  SELECT e.event_id, e.event_type, e.value,
         round((e.value - v.sx / v.n) / v.sd, 6) AS zscore
  FROM events e JOIN v USING (event_type)
)
SELECT event_id, event_type, value, zscore
FROM z WHERE abs(zscore) > 3.0
""".format(
        o_dsum_value=o_dsum_total("value"),
        o_dsum_value2=o_dsum_total("value * value"),
    ),
)
def ts_anomaly_zscore(spark, sf_dir):
    """Z-score anomaly detection: events whose value deviates more than
    3 standard deviations from their event_type's distribution. Uses the
    agg_stats discipline — decimal-exact sufficient statistics (sums of
    x, x² in DECIMAL(38,6), order-independent) and the identical IEEE
    closed form in both engines, so the score is cross-engine stable
    without native stddev's merge-order sensitivity.

    Scale shape: one map-side-combinable stats aggregate (3 numbers per
    event_type — a handful of groups, broadcastable), one broadcast join
    back, one narrow filter. The event stream is scanned twice but never
    shuffled; at 100 TB the stats side is metadata-sized. For drifting
    distributions swap the global stats for a time-bucketed stats key
    (same shape, composite join key).
    """
    ev = tables.events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_total(F.col("value")).alias("sx"),
        dsum_total(F.col("value") * F.col("value")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    # try_divide: a single-event type (n=1) or a zero-variance type
    # (all values equal — ties fixture) has no z-score; DuckDB's /0
    # yields NULL and the |z|>3 filter drops the rows on both engines,
    # where Spark's ANSI `/` would abort the whole job. The variance
    # is guarded non-negative before sqrt (see the oracle's v CTE):
    # the totality convention can exclude a huge value's square from
    # sxx while keeping the value in sx, and sqrt(negative) is NaN
    # here but an ERROR in DuckDB.
    varg = F.try_divide(sxx - (sx * sx) / n, n - F.lit(1.0))
    sd = F.when(varg >= 0, F.sqrt(varg))
    z = F.round(F.try_divide(F.col("value") - sx / n, sd), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .where(F.abs(F.col("zscore")) > 3.0)
    )


@query(
    "ts_trend_slope",
    oracle=f"""
WITH e AS (
  SELECT user_id,
         -- floor() matches Spark unix_timestamp's whole-second truncation
         -- (DuckDB epoch() keeps fractional microseconds)
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS x,
         value AS y
  FROM events
), s AS (
  SELECT user_id,
         CAST(count(*) AS DOUBLE) AS n,
         -- x is an integer epoch: DECIMAL(19,0)/(19,6) products stay
         -- within precision 38 on BOTH engines, so every sum is exact;
         -- the old (38,6)x(38,6) products overflowed precision and each
         -- engine rounded them differently (ulp drift that flipped a
         -- round-6 digit for one sf0.1 user)
         CAST(sum(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS DOUBLE) AS sxx,
         {o_dsum_total('y')} AS sy,
         CAST(sum(CAST(x AS DECIMAL(19,0))
              * TRY_CAST(CASE WHEN isnan(y) THEN NULL
                         ELSE (y) END AS DECIMAL(19,6)))
              AS DOUBLE) AS sxy
  FROM e GROUP BY user_id HAVING count(*) >= 2
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0, 6)
         AS slope_per_day
FROM s
""",
)
def ts_trend_slope(spark, sf_dir):
    """Per-user linear trend: the least-squares slope of event value
    over time (scaled to per-day units) — the standard drift/trend
    detector for engagement or metric decay. Follows the agg_stats
    discipline: order-independent DECIMAL(38,6) sufficient sums (n, Σx,
    Σx², Σy, Σxy) then the identical IEEE closed form in both engines —
    native regr_slope is merge-order sensitive and cross-engine
    unstable.

    Scale shape: one map-side-combinable aggregate shuffling five
    numbers per user, one narrow projection. Nothing else — the
    canonical sufficient-statistics reduction that holds at any scale.
    """
    ev = tables.events(spark, sf_dir)
    # integer-epoch x as DECIMAL(19,0): its products with itself and with
    # DECIMAL(19,6) y fit precision 38 EXACTLY on both engines — the
    # (38,6)x(38,6) form overflowed and rounded engine-specifically
    x = F.unix_timestamp(F.col("ts")).cast("decimal(19,0)")
    y = F.col("value")
    s = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
            dsum_total(y).alias("sy"),
            F.sum(x * y.try_cast("decimal(19,6)")).cast("double").alias("sxy"),
        )
        .where(F.col("n") >= 2)
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy = F.col("sy"), F.col("sxy")
    # try_divide: a user whose events all share one timestamp has zero
    # x-variance — slope undefined, NULL on both engines (DuckDB /0 is
    # NULL; Spark's ANSI `/` would abort the job)
    return s.select(
        "user_id",
        n.cast("long").alias("n_events"),
        F.round(
            F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx) * 86400.0, 6
        ).alias("slope_per_day"),
    )


@query(
    "ts_seasonality",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
         value
  FROM events
), p AS (
  SELECT event_type, hr, count(*) AS n,
         {{o_dsum_v}} AS sum_value
  FROM h GROUP BY event_type, hr
), r AS (
  SELECT event_type, hr, n, sum_value,
         row_number() OVER (PARTITION BY coalesce(event_type, chr(1))
                            ORDER BY n DESC, coalesce(hr, -1)) AS rk
  FROM p
)
SELECT event_type, hr, n, sum_value, (rk = 1) AS is_peak_hour
FROM r
""".format(o_dsum_v=o_dsum_total("value")),
)
def ts_seasonality(spark, sf_dir):
    """Hour-of-day seasonality profile per event type, with the peak
    hour flagged (deterministic tie-break: earliest hour) — the daily
    activity fingerprint behind load forecasting and anomaly baselining
    (an hourly z-score baseline would key ts_anomaly_zscore's stats by
    this profile's buckets).

    Scale shape: one map-side-combinable aggregate onto at most
    |types| x 24 rows, then a window over that tiny profile — event
    volume never reaches the window."""
    ev = tables.events(spark, sf_dir)
    p = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum_total(F.col("value")).alias("sum_value"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("hr"))
    return p.withColumn("rk", F.row_number().over(w)).select(
        "event_type",
        "hr",
        "n",
        "sum_value",
        (F.col("rk") == 1).alias("is_peak_hour"),
    )


_CUMSUM_SEQUENTIAL = None


def _cumsum_is_sequential():
    """Once-per-process sentinel: does np.cumsum accumulate strictly
    left-to-right? Sequential IEEE adds leave 1.0 + k·2⁻⁵³ stuck at 1.0
    (each add rounds down); any pairwise/blocked scheme would combine
    the small terms first and drift upward. Cached so the per-batch cost
    is one flag read; runs wherever the kernel runs, executors included,
    so a numpy upgrade on the cluster self-checks without a test rig."""
    global _CUMSUM_SEQUENTIAL
    if _CUMSUM_SEQUENTIAL is None:
        import numpy as np

        eps = np.ldexp(1.0, -53)
        x = np.concatenate(([1.0], np.full(64, eps)))
        expect = np.empty_like(x)
        acc = 0.0
        for i in range(len(x)):
            acc = acc + x[i]
            expect[i] = acc
        _CUMSUM_SEQUENTIAL = bool(np.array_equal(np.cumsum(x), expect))
    return _CUMSUM_SEQUENTIAL


def _ewma_halving(vals, prev=None):
    """Bit-exact vectorized y_i = fl(0.5·x_i + 0.5·y_{i-1}).

    With ``prev=None`` the series seeds itself (y_0 = x_0); with a
    carried ``prev`` (resuming a user's series across Arrow batch
    boundaries) every element, including the first, applies the
    recurrence against it.

    Scaling a double by a power of two is exact (within range), and IEEE
    rounding commutes with exact scaling: fl(a+b)·2^k = fl(a·2^k + b·2^k)
    while both sides stay normal. Substituting z_k = y_{i+k}·2^{k+1}
    inside a block starting at i turns the recurrence into a plain
    running sum, z_k = fl(x_{i+k}·2^k + z_{k-1}) — i.e. np.cumsum over
    exactly-prescaled terms, whose sequential left-to-right accumulate
    performs the identical rounding sequence to the naive Python loop.

    Guards (each falls back to the loop, which defines the semantics):
    - adaptive block size B ≤ 1000 − log2(max|x|) so no scaled term or
      partial sum (bounded by max|x|·2^{B+1}) can overflow;
    - non-finite input or max|x| ≥ 2^990 → loop;
    - any nonzero output with |y| < 1e-280 → loop, because rounding only
      commutes with scaling in the NORMAL range: a step whose true value
      is subnormal quantizes differently unscaled vs scaled, and at the
      first such step the correctly-rounded (scaled-domain) output is
      itself far below 1e-280, so the scan always catches a divergence.

    Pinned bit-exact against the loop (hypothesis-style sweep incl.
    zero-decay and mixed-magnitude cases) and against DuckDB's
    recursive-CTE evaluation in tests/test_timeseries_exact.py.

    Dependency note: the argument above assumes ``np.cumsum`` performs a
    strictly sequential left-to-right accumulation — a numpy
    implementation detail, not a documented guarantee (a future numpy
    adopting pairwise accumulation would round differently). Guarded two
    ways: the pinning test above, and ``_cumsum_is_sequential()`` below,
    a once-per-process runtime sentinel that also runs on EXECUTORS (not
    just the test environment); if it ever fails, this function falls
    back to the defining loop rather than silently changing results."""
    import numpy as np

    def _loop(v, p):
        out = v.copy()
        if p is not None:
            out[0] = 0.5 * v[0] + 0.5 * p
        for i in range(1, len(out)):
            out[i] = 0.5 * v[i] + 0.5 * out[i - 1]
        return out

    seed = prev

    n = len(vals)
    if n == 0:
        return vals.copy()
    if n == 1 and prev is None:
        return vals.copy()
    if not _cumsum_is_sequential():
        return _loop(vals, prev)
    vmax = np.max(np.abs(vals))
    if prev is not None:
        vmax = max(vmax, abs(prev))
    if not np.isfinite(vmax) or vmax >= np.ldexp(1.0, 990):
        return _loop(vals, prev)
    B = min(512, 1000 - (int(np.ceil(np.log2(vmax))) if vmax > 0 else 0))
    out = np.empty_like(vals)
    if prev is None:
        out[0] = vals[0]
        prev = vals[0]
        i = 1
    else:
        i = 0
    while i < n:
        j = min(i + B, n)
        k = np.arange(j - i)
        scaled = np.cumsum(
            np.concatenate(([prev], np.ldexp(vals[i:j], k)))
        )[1:]
        out[i:j] = np.ldexp(scaled, -(k + 1))
        prev = out[j - 1]
        i = j
    nonzero = out[out != 0]
    if nonzero.size and np.min(np.abs(nonzero)) < 1e-280:
        return _loop(vals, seed)
    return out


@query(
    "ts_ewma",
    oracle="""
WITH RECURSIVE s AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND isfinite(value)
), r(user_id, rn, event_id, value, ewma) AS (
  SELECT user_id, rn, event_id, value, value FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.event_id, s.value,
         0.5 * s.value + 0.5 * r.ewma
  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, event_id, value, ewma FROM r
""",
)
def ts_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average (α=0.5) — the
    inherently SEQUENTIAL time-series statistic: ewma_t = α·x_t +
    (1-α)·ewma_{t-1}, seeded with the first observation. No built-in
    window frame expresses this recurrence, so it runs as ONE
    mapInPandas pass over partitions that are hash-repartitioned by
    user_id and sorted (user_id, ts, event_id) JVM-side: each user's
    history is a contiguous ordered run, the kernel scans runs inside
    each Arrow batch, and the (user, ewma) carry resumes a run that
    spans a batch boundary. This replaces the earlier per-user
    applyInPandas, whose ~2 ms/group pandas overhead dominated the key
    (1 500 groups ≈ 3 s at sf0.1) — group count no longer appears in
    the cost, only total row count does.

    Cross-engine exactness without rounding: α=0.5 makes every step two
    exact halvings (scaling a double by 0.5 is lossless barring
    underflow) plus one correctly-rounded IEEE add — bit-identical to
    DuckDB's recursive-CTE evaluation of the same recurrence, in the
    same (µs-truncated ts, event_id) order. The scan is evaluated by
    ``_ewma_halving`` (above), a vectorized np.cumsum in a power-of-two
    scaled domain that reproduces the per-step IEEE rounding of the
    naive loop bit-for-bit (see its docstring for the argument and the
    overflow/subnormal guards).

    Scale shape: one shuffle by user_id, then purely local sequential
    work per user — the same layout a 1000-executor cluster needs,
    since EWMA cannot be computed without each user's history in one
    place. Users are independent, so parallelism is the user count; a
    single pathological user is bounded by its own event count, not
    the corpus."""
    import numpy as np
    import pandas as pd

    def ewma_partition(batches):
        last_uid = None
        last_y = None
        for pdf in batches:
            uids = pdf["user_id"].to_numpy()
            # Non-null user_id is a kernel invariant: a null arrives via
            # Arrow→pandas as NaN, and NaN != NaN would split the null
            # group into singleton runs (each re-seeded, unlike the old
            # groupBy which grouped nulls together) while the
            # 'user_id long' output schema cannot serialize NaN — fail
            # loudly instead of silently mis-seeding.
            if pdf["user_id"].isna().any():
                raise ValueError(
                    "ts_ewma requires non-null user_id; filter or "
                    "impute nulls upstream before the EWMA pass"
                )
            vals = pdf["value"].to_numpy()
            out = np.empty_like(vals)
            if len(uids):
                starts = np.flatnonzero(
                    np.concatenate(([True], uids[1:] != uids[:-1]))
                )
                ends = np.append(starts[1:], len(uids))
                for s, e in zip(starts, ends):
                    carry = last_y if uids[s] == last_uid else None
                    out[s:e] = _ewma_halving(vals[s:e], prev=carry)
                last_uid = uids[-1]
                last_y = out[-1]
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "value": pdf["value"],
                    "ewma": out,
                }
            )

    # Domain: FINITE observed values only — non-null (user_id, ts,
    # value) and value ∉ {NaN, ±Inf}. A null user has no series, a null
    # ts has no position in it, and a non-finite value would poison
    # every later step of the recurrence — worse, divergently: the
    # pandas→Arrow output hop degrades a NaN ewma to NULL while
    # DuckDB's recursive CTE propagates NaN, and an Inf/-Inf mix
    # manufactures fresh NaNs mid-series. Both sides filter the same
    # finite domain (Spark: NaN compares greatest, so value<'inf'
    # already excludes it; the isnan is for the reader). The kernel's
    # null-user raise below stays as the executor-side invariant check.
    ev = tables.events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    ).where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.col("value") > F.lit(float("-inf")))
        & (F.col("value") < F.lit(float("inf")))
    )
    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            ewma_partition,
            "user_id long, event_id long, value double, ewma double",
        )
    )


@query(
    "ts_interpolate",
    oracle="""
WITH obs AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         round(CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE (value) END AS DECIMAL(38,6))) AS DOUBLE)
               / count(*), 6) AS v
  FROM events WHERE user_id < 20
  GROUP BY 1, 2
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY user_id
), grid AS (
  SELECT s.user_id, g.day
  FROM span s, unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS g(day)
), joined AS (
  SELECT g.user_id, g.day, o.v,
         last_value(o.v IGNORE NULLS) OVER w_prev AS v_prev,
         last_value(CASE WHEN o.v IS NOT NULL THEN g.day END IGNORE NULLS)
           OVER w_prev AS d_prev,
         first_value(o.v IGNORE NULLS) OVER w_next AS v_next,
         first_value(CASE WHEN o.v IS NOT NULL THEN g.day END IGNORE NULLS)
           OVER w_next AS d_next
  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
  WINDOW
    w_prev AS (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       CASE WHEN v IS NOT NULL THEN v
            ELSE round(
              (CAST(round(v_prev * 1000000) AS BIGINT)
                 * date_diff('day', day, d_next)
               + CAST(round(v_next * 1000000) AS BIGINT)
                 * date_diff('day', d_prev, day))
              / date_diff('day', d_prev, d_next) / 1000000.0, 6) END AS value,
       v IS NULL AS interpolated
FROM joined
""",
)
def ts_interpolate(spark, sf_dir):
    """Linear interpolation of missing days in each user's daily mean
    value series — the sensor-data companion to ts_gap_fill's zero-fill:
    gaps are filled on the straight line between the surrounding observed
    days (endpoints always observed because the grid spans first..last
    observation). The prev/next anchors come from IGNORE NULLS window
    frames over one (user, day) sort — the whole operator is the
    gap-fill grid join plus two window passes sharing a single shuffle.
    """
    ev = tables.events(spark, sf_dir).where(F.col("user_id") < 20)
    from adlspark.ops.parity import dsum_total

    obs = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.round(dsum_total("value") / F.count(F.lit(1)), 6).alias("v"))
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    j = grid.join(obs, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    j = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("v_prev"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("d_prev"),
        F.first("v", ignorenulls=True).over(w_next).alias("v_next"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("d_next"),
    )
    # Integer-exact interpolation numerator (values carry ≤6 decimals by
    # construction, so round(v·1e6) recovers an exact long): one double
    # division at the end means both engines perform the IDENTICAL IEEE
    # ops — the float formula (v_prev + Δ·a/b) rounds differently in the
    # last ulp across engines at 6-digit boundaries (hit at sf0.001).
    vi_prev = F.round(F.col("v_prev") * 1000000).cast("long")
    vi_next = F.round(F.col("v_next") * 1000000).cast("long")
    interp = F.round(
        (
            vi_prev * F.datediff(F.col("d_next"), F.col("day"))
            + vi_next * F.datediff(F.col("day"), F.col("d_prev"))
        )
        / F.datediff(F.col("d_next"), F.col("d_prev"))
        / 1000000.0,
        6,
    )
    return j.select(
        "user_id",
        "day",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias(
            "value"
        ),
        F.col("v").isNull().alias("interpolated"),
    )


@query(
    "ts_autocorr",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         coalesce(event_type, chr(1)) AS et_k,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         date_trunc('day', coalesce(CAST(ts AS TIMESTAMP),
                                    TIMESTAMP '1900-01-01')) AS d_k,
         {o_dsum_total('value')} AS total
  FROM events GROUP BY 1, 2, 3, 4
), lagged AS (
  SELECT event_type, total,
         lag(total) OVER (PARTITION BY et_k ORDER BY d_k) AS prev
  FROM daily
)
SELECT event_type,
       count(prev) AS n_pairs,
       round(corr(total, prev), 4) AS autocorr_lag1
FROM lagged GROUP BY event_type
""",
)
def ts_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of the daily value series per event type —
    the seasonality/persistence screen run before fitting any forecast
    model (near 0 = memoryless, near ±1 = strong daily carryover).

    Exactness: daily totals go through the decimal-exact sum
    (parity.py), so both engines correlate IDENTICAL doubles; corr
    itself is a non-decimalizable statistic → ROUND_STATS=4 per §5.3.
    Scale shape: one map-side-combinable daily aggregate, a per-type
    lag window over day-count-sized partitions, one tiny corr agg —
    the corpus-sized work is the first aggregate only.
    """
    ev = tables.events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(dsum_total("value").alias("total"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type", "total", F.lag("total").over(w).alias("prev")
    )
    return lagged.groupBy("event_type").agg(
        F.count("prev").alias("n_pairs"),
        F.round(F.corr("total", "prev"), 4).alias("autocorr_lag1"),
    )


@query(
    "ts_rolling_median",
    oracle="""
SELECT event_id, user_id, value,
       round(quantile_cont(CASE WHEN isfinite(value) THEN value END, 0.5)
             OVER (
         PARTITION BY coalesce(user_id, -1)
         ORDER BY coalesce(CAST(ts AS TIMESTAMP), TIMESTAMP '1900-01-01'),
                  event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 6) AS med7
FROM events
""",
)
def ts_rolling_median(spark, sf_dir):
    """Trailing 7-event median of value per user — the robust rolling
    statistic (median ignores the spike that wrecks a rolling mean).
    Spark has no exact percentile window function, so the operator IS
    the rewrite: sort the bounded 7-row frame (``collect_list`` +
    ``array_sort``) and interpolate lower + (upper-lower)·0.5 — the
    EXACT arithmetic DuckDB's native ``quantile_cont OVER`` uses
    (position (n-1)/2, linear interpolation), certified by the hash
    (the (a+b)/2 form differs in the last ulp and would drift).

    Scale shape: frame state is the 7-row buffer — O(frame), not
    O(history); one hash shuffle by user. The frame-bounded sorted-array
    rewrite is how exact rolling quantiles are actually run at scale;
    unbounded frames would switch to a sketch (``agg_approx_percentile``).
    """
    ev = tables.events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    # Frame domain = FINITE values only (NaN compares greatest in Spark,
    # so value<'inf' already excludes it). A NaN in the sorted frame
    # poisons the interpolation where DuckDB's quantile_cont skips it
    # erratically, and an odd frame whose median element is ±Inf makes
    # the lower+(upper-lower)·0.5 form yield Inf-Inf = NaN where DuckDB
    # returns the element — so both sides exclude non-finite from the
    # frame (rows keep their output row; only the statistic's domain
    # shrinks).
    finite = (
        ~F.isnan("value")
        & (F.col("value") > F.lit(float("-inf")))
        & (F.col("value") < F.lit(float("inf")))
    )
    vals = F.array_sort(
        F.collect_list(F.when(finite, F.col("value"))).over(w)
    )
    n = F.size(vals)
    lower = F.element_at(vals, ((n + 1) / 2).cast("int"))
    upper = F.element_at(vals, (n / 2).cast("int") + 1)
    med = lower + (upper - lower) * F.lit(0.5)
    # collect_list skips NULL values, so an all-null frame (e.g. a
    # user's first event carrying a null value) is EMPTY — element_at
    # index 0 is an ANSI error, where DuckDB's quantile_cont over the
    # same all-null frame yields NULL. CASE evaluates the guarded
    # branch only, so the n>=1 arm never touches index 0.
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.when(n >= 1, F.round(med, 6)).alias("med7"),
    )


@query(
    "ts_pattern_match",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                      WHEN 'signup' THEN 's' WHEN 'purchase' THEN 'p'
                      ELSE 'e' END, ''
                    ORDER BY coalesce(CAST(ts AS TIMESTAMP),
                                      TIMESTAMP '1900-01-01'),
                             event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_buy_paths,
       CAST(len(regexp_extract_all(s, 'vc*e')) AS BIGINT) AS n_err_paths
FROM seq
""",
)
def ts_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-lite: count view→click*→purchase (and →error)
    paths per user by regex over the user's ordered event-letter string.

    Spark has no MATCH_RECOGNIZE; the scalable rewrite is (1) one hash
    shuffle grouping each user's events, (2) an ordered reduction to a
    letter string (array_sort of (ts, event_id, letter) structs — struct
    order is the total order, so the aggregation is deterministic under
    any partitioning), (3) JVM regexp_extract_all over the bounded
    per-user string. Pattern 'vc*p' is unambiguous (each alternative is a
    single distinct letter), so Java-regex and RE2 agree on the same
    non-overlapping greedy matches — cross-engine-stable, unlike patterns
    with overlapping alternatives. At 100 TB the same shape runs per
    (user, day) to bound string length; state is O(user history), the
    same bound sessionization needs.
    """
    ev = tables.events(spark, sf_dir)
    letter = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    seq = (
        ev.select("user_id", F.struct("ts", "event_id", letter.alias("ch")).alias("t"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("t")), lambda x: x["ch"]),
                "",
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.size(F.regexp_extract_all(F.col("s"), F.lit("vc*p"), 0))
        .cast("long")
        .alias("n_buy_paths"),
        F.size(F.regexp_extract_all(F.col("s"), F.lit("vc*e"), 0))
        .cast("long")
        .alias("n_err_paths"),
    )


@query(
    "ts_cusum_changepoint",
    oracle=f"""
WITH daily AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE (value) END AS {O_DEC})) AS xdec
  FROM events GROUP BY 1, 2
), dev AS (
  SELECT user_id, day,
         CAST(sum(xdec) OVER (PARTITION BY coalesce(user_id, -1)
                              ORDER BY coalesce(day, DATE '1900-01-01')
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)
         - CAST(row_number() OVER (PARTITION BY coalesce(user_id, -1)
                                   ORDER BY coalesce(day, DATE '1900-01-01'))
                AS DOUBLE)
           * (CAST(sum(xdec) OVER (PARTITION BY coalesce(user_id, -1))
                   AS DOUBLE)
              / CAST(count(*) OVER (PARTITION BY coalesce(user_id, -1))
                     AS DOUBLE)) AS d,
         count(*) OVER (PARTITION BY coalesce(user_id, -1)) AS n_days
  FROM daily
), ranked AS (
  SELECT user_id, day, round(abs(d), 6) AS abs_dev, n_days,
         row_number() OVER (
           PARTITION BY coalesce(user_id, -1)
           ORDER BY coalesce(round(abs(d), 6), '-infinity'::DOUBLE) DESC,
                    coalesce(day, DATE '1900-01-01')) AS rn
  FROM dev
)
SELECT user_id, day AS cp_day, abs_dev AS max_abs_cusum,
       CAST(n_days AS BIGINT) AS n_days
FROM ranked WHERE rn = 1
""",
)
def ts_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection per user: the day where the running
    sum of deviations from the user's mean daily value peaks in absolute
    terms (Page 1954's cumulative-sum statistic; the standard single
    change-point estimate argmax_t |S_t - t·x̄|).

    Cross-engine exactness: daily sums and the running prefix are
    DECIMAL(38,6) (order-independent); the deviation is then derived with
    the identical IEEE expression `double(S_t) - double(t)·mean` on both
    engines, so the argmax ranking (rounded |dev| desc, day asc) is
    deterministic. Scale shape: one shuffle to (user, day) aggregates,
    one window pass per user — state O(1) per row, history streamed in
    day order; no self-join, no driver state.
    """
    ev = tables.events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").try_cast(DEC)).alias("xdec"))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("user_id")
    mean = F.sum("xdec").over(w_all).cast("double") / F.count(
        F.lit(1)
    ).over(w_all).cast("double")
    dev = (
        F.sum("xdec").over(w_run).cast("double")
        - F.row_number().over(Window.partitionBy("user_id").orderBy("day")).cast(
            "double"
        )
        * mean
    )
    scored = daily.select(
        "user_id",
        "day",
        F.round(F.abs(dev), 6).alias("abs_dev"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_days"),
    )
    w_rank = Window.partitionBy("user_id").orderBy(F.desc("abs_dev"), F.col("day"))
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("day").alias("cp_day"),
            F.col("abs_dev").alias("max_abs_cusum"),
            "n_days",
        )
    )


@query(
    "ts_rolling_corr",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS x,
         count(*) FILTER (WHERE event_type = 'purchase') AS y
  FROM events GROUP BY 1, 2
), f AS (
  SELECT user_id, day, x, y,
         count(*)                          OVER w AS n,
         CAST(sum(x)     OVER w AS BIGINT) AS sx,
         CAST(sum(y)     OVER w AS BIGINT) AS sy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         CAST(sum(y * y) OVER w AS BIGINT) AS syy,
         CAST(sum(x * y) OVER w AS BIGINT) AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY coalesce(user_id, -1)
               ORDER BY coalesce(day, DATE '1900-01-01')
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST(n AS BIGINT) AS n_frame,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4)
            END AS roll_corr
FROM f
""",
)
def ts_rolling_corr(spark, sf_dir):
    """Trailing-7-day rolling Pearson correlation between a user's total
    daily activity and their daily purchase count (does activity convert?).

    Spark has no corr() over a window frame; the scalable rewrite keeps
    the six *integer* sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy)
    over the bounded frame and derives r in closed form. Because both
    series are counts, every frame sum is exact in BIGINT on both engines
    — none of the float-window-summation-order drift that plagues
    sliding sums of doubles (DuckDB's segment-tree window evaluation vs
    Spark's frame re-scan associate differently; integers make the
    question moot). Degenerate frames (constant series) are NULL via the
    same integer variance test on both sides. Scale: one shuffle to
    (user, day), one O(frame) window pass; state per row is six longs.
    """
    ev = tables.events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    n = F.count(F.lit(1)).over(w)
    sx, sy = F.sum("x").over(w), F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    corr = F.when(
        (n >= 2) & (vx > 0) & (vy > 0),
        F.round(
            (n * sxy - sx * sy).cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            4,
        ),
    )
    return daily.select(
        "user_id",
        "day",
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
        n.cast("long").alias("n_frame"),
        corr.alias("roll_corr"),
    )


@query(
    "ts_outlier_mad",
    oracle="""
WITH obs AS (
  SELECT event_id, event_type, value
  FROM events WHERE isfinite(value)
), med AS (
  SELECT event_type, median(value) AS med FROM obs GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM obs e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value,
       CAST(round(TRY_CAST(0.6745 * (d.value - d.med) / m.mad
                       AS DECIMAL(38,12)), 4) AS DOUBLE) AS robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0
  AND abs(CAST(round(TRY_CAST(0.6745 * (d.value - d.med) / m.mad
                          AS DECIMAL(38,12)), 4) AS DOUBLE)) > 3.5
""",
)
def ts_outlier_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the
    estimator that, unlike ``ts_anomaly_zscore``'s mean/stddev, is not
    itself dragged by the outliers it is hunting (50% breakdown point vs
    0%). Flags events whose modified z-score 0.6745·(x−med)/MAD exceeds
    3.5 (Iglewicz & Hoaglin 1993's recommended cut).

    Cross-engine: exact interpolated medians (the agg_median discipline),
    then a single identical IEEE expression rounded to 4 — no
    order-dependent accumulation anywhere.

    Scale shape: two grouped exact medians (sort-based, group-local) and
    two BROADCAST joins back — the per-type median table is #event_types
    rows, so the event stream is scanned but never shuffled. At 100 TB
    swap the exact medians for agg_approx_percentile's mergeable GK
    sketch (one combinable pass each) and keep the same two broadcast
    joins; the flag expression is unchanged.

    Domain: FINITE observations only (matching the oracle's
    isfinite(value) filter — a NULL value was already invisible to both
    engines' medians and never survived the >3.5 flag; NaN/±Inf would
    poison the medians divergently: Spark compares NaN greatest while
    DuckDB's median is erratic over NaN, and the DECIMAL(18,12) guard
    cast aborts on non-finite z under ANSI where DuckDB's CAST errors
    on NaN)."""
    ev = tables.events(spark, sf_dir).where(
        ~F.isnan("value")
        & (F.col("value") > F.lit(float("-inf")))
        & (F.col("value") < F.lit(float("inf")))
    )
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    # DECIMAL(38,12) guard cast before the round: the z ratio can land
    # exactly on a 4-digit tie (3.85225 at sf0.1) where the engines'
    # double rounding modes diverge; both round decimals half-up. The
    # 26 integral digits absorb a ~1e20-valued outlier's z (the old
    # (18,12) held only 6 and ANSI-aborted on it); try_cast keeps the
    # expression total — a z beyond ~1e26 degrades to NULL identically
    # on both engines (z cannot be NaN here: finite domain, mad > 0).
    rz = F.round(
        (
            F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
        ).try_cast("decimal(38,12)"),
        4,
    ).cast("double")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > 0)
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
        .where(F.abs(F.col("robust_z")) > 3.5)
    )


@query(
    "ts_attribution",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_id END IGNORE NULLS)
           OVER w AS touch_id,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS touch_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
           OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY coalesce(user_id, -1)
               ORDER BY coalesce(CAST(ts AS TIMESTAMP),
                                 TIMESTAMP '1900-01-01'), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_id, user_id, touch_id, touch_type,
       date_diff('microsecond', touch_ts, ts) AS gap_us
FROM ordered
WHERE event_type = 'purchase' AND touch_id IS NOT NULL
  AND date_diff('microsecond', touch_ts, ts) <= 7::BIGINT * 86400 * 1000000
""",
)
def ts_attribution(spark, sf_dir):
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click/view strictly before it (ROWS ... 1
    PRECEDING — a touch sharing the purchase's exact timestamp counts
    only if its event_id orders earlier, the same total order on both
    engines), within a 7-day lookback. The gap stays in integer
    microseconds end-to-end (unix_micros arithmetic), so the window
    boundary is exact — no float epoch drift.

    Scale shape: ONE user-keyed shuffle and one ordered window pass with
    O(1) carried state (the last touch seen) — the classic
    sessionization shape, linear in each user's history and immune to
    how many users exist. A first-touch variant is the same plan with
    first_value; multi-touch weighting would switch the window to a
    collected struct but keep the single shuffle."""
    ev = tables.events(spark, sf_dir)
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch_ts"))
    return (
        marked.where(
            (F.col("event_type") == "purchase") & F.col("touch_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "touch_id",
            "touch_type",
            gap.alias("gap_us"),
        )
        .where(F.col("gap_us") <= F.lit(7 * 86400 * 1000000).cast("long"))
    )


@query(
    "ts_burst_detect",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
), base AS (
  SELECT event_type, day, n,
         CAST(sum(n) OVER (PARTITION BY coalesce(event_type, chr(1))
                           ORDER BY coalesce(day, DATE '1900-01-01')
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS sum7,
         count(*) OVER (PARTITION BY coalesce(event_type, chr(1))
                        ORDER BY coalesce(day, DATE '1900-01-01')
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS days7
  FROM daily
)
SELECT event_type, day, n, sum7, days7,
       round(CAST(n * days7 AS DOUBLE) / sum7, 4) AS burst_ratio
FROM base
WHERE days7 = 7 AND 8 * n * days7 >= 9 * sum7
""",
)
def ts_burst_detect(spark, sf_dir):
    """Burst detection: days where an event type's volume exceeds its
    trailing-week mean by the burst factor (9/8 here — calibrated so the
    near-uniform synthetic fixture still exhibits bursts at every SF;
    real deployments set 2-3×) — the rate-spike screen (deploy incidents,
    crawler storms, viral content) that complements ``ts_anomaly_zscore``
    (value outliers) and ``ts_cusum_changepoint`` (level shifts).

    The threshold is evaluated in INTEGER arithmetic (8·n·days7 ≥
    9·sum7 — cross-multiplied, no division), so the burst set is bit-exact on
    both engines; the reported ratio is display-only at round 4. Only
    full 7-day baselines qualify (days7 = 7), excluding series warm-up.

    Scale shape: the corpus collapses to (event_type, day) counts in one
    map-side-combinable aggregate — everything after operates on
    #types × #days rows, metadata scale. One shuffle for the aggregate;
    the ordered window rides a per-type partition with a two-pointer
    7-row frame, O(1) state."""
    ev = tables.events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    base = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("days7"),
    )
    return base.where(
        (F.col("days7") == 7)
        & (8 * F.col("n") * F.col("days7") >= 9 * F.col("sum7"))
    ).select(
        "event_type",
        "day",
        "n",
        "sum7",
        "days7",
        F.round((F.col("n") * F.col("days7")).cast("double") / F.col("sum7"), 4)
        .alias("burst_ratio"),
    )


@query(
    "ts_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
), days AS (SELECT DISTINCT day FROM ud),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u
    ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
), dau AS (
  SELECT day, count(*) AS dau FROM ud GROUP BY day
)
SELECT d.day, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
FROM days d JOIN dau USING (day) JOIN wau ON wau.day = d.day
""",
)
def ts_active_users(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    triple every product and every corpus-freshness dashboard runs.

    Scale shape: events collapse ONCE to distinct (user, day) — the only
    corpus-sized pass, map-side combined. The sliding distinct (WAU)
    uses the COVERING-EXPLODE rewrite instead of a windowed
    count(DISTINCT): each (user, day) row covers days d..d+6, so a
    7-way explode + exact distinct per covered day reproduces the
    trailing-window distinct with plain combinable aggregates — no
    per-day re-scan, no quadratic window state, and the explode factor
    is the window length, not the data. Days outside the observed range
    are clipped via the semi-join against real days (both engines)."""
    ev = tables.events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covered = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    wau = (
        covered.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
    )


@query(
    "ts_forecast_naive",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         {{o_dsum}} AS total
  FROM events GROUP BY event_type, day
), j AS (
  SELECT a.event_type, a.day, a.total AS actual, f.total AS forecast,
         abs(a.total - f.total) AS abs_err
  FROM daily a JOIN daily f
    ON f.event_type = a.event_type AND f.day = a.day - INTERVAL 7 DAY
)
SELECT event_type,
       count(*) AS n_days,
       round(CAST(sum(TRY_CAST(CASE WHEN isnan(abs_err) THEN NULL ELSE (abs_err) END AS DECIMAL(38,6))) AS DOUBLE)
             / count(*), 6) AS mae,
       round(CAST(sum(TRY_CAST(CASE WHEN isnan(abs_err) THEN NULL ELSE (abs_err) END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(TRY_CAST(CASE WHEN isnan(actual) THEN NULL ELSE (actual) END AS DECIMAL(38,6))) AS DOUBLE), 6)
         AS wape
FROM j GROUP BY event_type
""".format(o_dsum=o_dsum_total("value")),
)
def ts_forecast_naive(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's per-type
    value total with the value from 7 days earlier, then score MAE and
    WAPE per type — the baseline every forecasting pipeline must beat,
    and the backtest harness shape (join actuals to lagged forecasts,
    aggregate the error) that any fancier model plugs into unchanged.

    Cross-engine: daily totals and error sums use decimal-exact
    summation; MAE/WAPE are single IEEE divides at round 6.

    Scale shape: the corpus collapses once to (type, day) decimal
    totals; the forecast join is a self-join of that metadata-scale
    table on (type, day-7) — co-partitioned by the same aggregate
    shuffle, AQE turns it broadcast. Swapping in lag() over a type
    window gives the same result with zero join; the join form is kept
    because real backtests join MODEL OUTPUT tables, not self-lags."""
    ev = tables.events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(dsum_total("value").alias("total"))
    a = daily.alias("a")
    f_ = daily.alias("f")
    j = a.join(
        f_,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.day") == F.date_sub(F.col("a.day"), 7)),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.total").alias("actual"),
        F.abs(F.col("a.total") - F.col("f.total")).alias("abs_err"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(dsum_total("abs_err") / F.count(F.lit(1)), 6).alias("mae"),
        F.round(dsum_total("abs_err") / dsum_total("actual"), 6).alias("wape"),
    )


@query(
    "ts_velocity_features",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id,
       CAST(count(*) OVER (PARTITION BY coalesce(user_id, -1)
            ORDER BY coalesce(us, -1)
            RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS n_1h,
       CAST(count(*) OVER (PARTITION BY coalesce(user_id, -1)
            ORDER BY coalesce(us, -1)
            RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS n_24h,
       CAST(count(*) OVER (PARTITION BY coalesce(user_id, -1)
            ORDER BY coalesce(us, -1)
            RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS n_7d
FROM e
""",
)
def ts_velocity_features(spark, sf_dir):
    """Point-in-time-correct velocity features: at EACH purchase, how
    many purchases did this user make in the strictly-preceding 1 h /
    24 h / 7 d — the leakage-free sliding counts every fraud/abuse/
    feature-store pipeline computes (the frame excludes the current row
    and anything simultaneous with it, so a feature never peeks at its
    own label event).

    All six counts ride ONE user-keyed shuffle and one ordered sort.
    Each horizon is computed as a DIFFERENCE of two unbounded-preceding
    RANGE counts — count(us ≤ t−1) − count(us ≤ t−h−1) over exact
    integer microseconds (the §1.3 µs discipline) — instead of one
    bounded sliding frame [t−h, t−1]: Spark's sliding frame re-
    aggregates the whole buffer every time the lower bound moves, so a
    bounded range count costs O(rows × frame_size) per partition and
    went SUPER-LINEAR on the round-8 50%-hot-user stress (5.8× wall
    for 2.5× hot rows — at 100× duplicate time-density a 7-day frame
    spans ~half the hot partition). Unbounded-preceding frames only
    ever ADD rows (O(1) amortized per row), and the two prefix counts
    subtract to exactly the sliding count, ties and all, because both
    bounds are value-based on the same integer key. A hot user is then
    one partition's linear scan, the irreducible PARTITION BY floor."""
    ev = tables.events(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    ).select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("us")
    )

    def prefix_count(us_back):
        # rows with order key ≤ current − us_back, i.e. strictly older
        # than the frame start for the (us_back − 1)-deep horizon
        w = (
            Window.partitionBy("user_id")
            .orderBy("us")
            .rangeBetween(Window.unboundedPreceding, -us_back)
        )
        return F.count(F.lit(1)).over(w)

    def horizon(us_back):
        return (prefix_count(1) - prefix_count(us_back + 1)).cast("long")

    return ev.select(
        "event_id",
        "user_id",
        horizon(3600 * 1000000).alias("n_1h"),
        horizon(86400 * 1000000).alias("n_24h"),
        horizon(7 * 86400 * 1000000).alias("n_7d"),
    )


@query(
    "ts_event_paths",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
), g AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY coalesce(user_id, -1)
                      ORDER BY coalesce(ts, TIMESTAMP '1900-01-01'), event_id)
), s AS (
  SELECT *, CAST(sum(new_s) OVER (
              PARTITION BY coalesce(user_id, -1)
              ORDER BY coalesce(ts, TIMESTAMP '1900-01-01'), event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM g
), paths AS (
  SELECT user_id, sid,
         string_agg(coalesce(event_type, ''), '>'
                    ORDER BY coalesce(ts, TIMESTAMP '1900-01-01'), event_id)
           AS path,
         count(*) AS path_len
  FROM s GROUP BY user_id, sid
)
SELECT path, count(*) AS n_sessions,
       CAST(max(path_len) AS BIGINT) AS path_len
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 10
""",
)
def ts_event_paths(spark, sf_dir):
    """Top user journeys: the 10 most common event-type PATHS through a
    session (5-min gap sessionization, events ordered by (ts, event_id)
    — a total order, so the path string is deterministic on both
    engines) — the sequence-mining staple behind funnel discovery and
    UX analysis, here as pure declarative aggregation.

    Scale shape: ONE user-keyed shuffle carries the sessionization
    windows AND the ordered path collect (same partition key); the path
    table is sessions-sized, and the final top-10 is a
    TakeOrderedAndProject over the path aggregate — no global sort. A
    hot user adds one partition's linear window scan (the ts_session
    stress shape). Paths are grouped-by-value, so popular journeys
    combine map-side."""
    ev = tables.events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            >= F.lit(300 * 1000000)
        ),
        1,
    ).otherwise(0)
    s = ev.withColumn("new_s", new_s).withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # NULL event_type renders as the empty step on BOTH engines:
    # array_join would silently SKIP a null element (dropping its '>'
    # separator) while string_agg of an all-NULL session is NULL, not
    # '' — coalesce to '' before joining keeps path/step-count parity.
    paths = s.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: F.coalesce(x["event_type"], F.lit("")),
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("path_len"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("path_len").alias("path_len"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


@query(
    "ts_drift_psi",
    oracle="""
WITH a AS (
  SELECT value FROM events
  WHERE event_type = 'view' AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
), b AS (
  SELECT value FROM events
  WHERE event_type = 'view' AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
), binned AS (
  SELECT CAST(least(floor(value / 10.0), 9) AS BIGINT) AS bin,
         CAST(sum(in_a) AS BIGINT) AS ca, CAST(sum(in_b) AS BIGINT) AS cb
  FROM (
    SELECT value, 1 AS in_a, 0 AS in_b FROM a
    UNION ALL SELECT value, 0, 1 FROM b
  ) GROUP BY bin
), tot AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb)
SELECT bin,
       CAST(ca AS BIGINT) AS n_before, CAST(cb AS BIGINT) AS n_after,
       round((CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na)
             * ln((CAST(cb AS DOUBLE) / nb) / (CAST(ca AS DOUBLE) / na)), 6)
         AS psi_term
FROM binned CROSS JOIN tot
WHERE ca > 0 AND cb > 0
""",
)
def ts_drift_psi(spark, sf_dir):
    """Population Stability Index terms per bin: the feature-drift
    monitor credit-risk and ML-platform teams run on every feature
    (PSI = Σ (p_after − p_before)·ln(p_after/p_before) over fixed
    bins; > 0.2 flags a shifted population). Output is per-bin terms so
    the dashboard can show WHERE the distribution moved — summing them
    is one more aggregate. Bin proportions come from exact integer
    counts; each term is one identical IEEE expression at round 6.
    Empty-on-either-side bins are excluded (the standard convention —
    production systems smooth instead; that's a constant in the same
    expression).

    Scale shape: fixed decile-style bins → one combinable aggregate to
    bin counts (10 rows), totals broadcast, metadata-scale term math.
    Per-feature fan-out at 100 TB adds the feature name to the grouping
    key — same single pass."""
    ev = tables.events(spark, sf_dir).where(F.col("event_type") == "view")
    cut = F.lit("2024-01-15").cast("timestamp")
    tagged = ev.select(
        F.least(F.floor(F.col("value") / 10.0), F.lit(9))
        .cast("long")
        .alias("bin"),
        (F.col("ts") < cut).cast("long").alias("in_a"),
        (F.col("ts") >= cut).cast("long").alias("in_b"),
    )
    binned = tagged.groupBy("bin").agg(
        F.sum("in_a").alias("ca"), F.sum("in_b").alias("cb")
    )
    tot = tagged.agg(F.sum("in_a").alias("na"), F.sum("in_b").alias("nb"))
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    return (
        binned.crossJoin(F.broadcast(tot))
        .where((F.col("ca") > 0) & (F.col("cb") > 0))
        .select(
            "bin",
            F.col("ca").alias("n_before"),
            F.col("cb").alias("n_after"),
            F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
        )
    )
