"""§2 C — Joins.

Strategy notes (what Catalyst/AQE picks and why it's the scale-right plan):
- Dim tables (region/nation/customer at small sf) fall under
  autoBroadcastJoinThreshold → broadcast-hash, no shuffle of the fact side.
  `join_broadcast` pins it explicitly with `F.broadcast`.
- Fact-fact equi joins (lineitem⋈aggregate) shuffle both sides on the key —
  sort-merge with AQE skew splitting; at 100 TB, bucketing both sides on
  the join key removes this shuffle entirely (see io.staging).
- Theta/range joins keep an equi conjunct (user_id / orderkey) so Spark
  plans SMJ with a range post-filter instead of a cartesian
  BroadcastNestedLoop.
- As-of join has no native Spark operator: implemented as the
  union-tag + last(ignorenulls) running-window pattern — one shuffle on
  (user_id), no join at all, which beats a range-join + row_number at any
  scale and reproduces DuckDB ASOF's inclusive greatest-ts-≤ semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.ops.parity import dsum_total, o_dsum_total
from adlspark.registry import query


@query(
    "join_inner",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, n_name
FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE o_totalprice > 300000
""",
)
def join_inner(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "o_totalprice", "c_name", "n_name")
    )


@query(
    "join_broadcast",
    oracle="""
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
)
def join_broadcast(spark, sf_dir):
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "join_multikey",
    oracle=f"""
SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, g.grp_qty, g.grp_cnt
FROM lineitem l
JOIN (
  SELECT l_orderkey, l_partkey,
         {o_dsum_total('l_quantity')} AS grp_qty,
         count(*) AS grp_cnt
  FROM lineitem GROUP BY l_orderkey, l_partkey
) g ON l.l_orderkey = g.l_orderkey AND l.l_partkey = g.l_partkey
""",
)
def join_multikey(spark, sf_dir):
    """Composite-key self join against a per-(order,part) aggregate."""
    li = tables.load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey", "l_partkey").agg(
        dsum_total("l_quantity").alias("grp_qty"),
        F.count(F.lit(1)).alias("grp_cnt"),
    )
    return li.join(agg, on=["l_orderkey", "l_partkey"]).select(
        "l_orderkey", "l_partkey", "l_linenumber", "grp_qty", "grp_cnt"
    )


@query(
    "join_left",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
    ON c_custkey = o_custkey
""",
)
def join_left(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
SELECT o_orderkey, o_totalprice, c_custkey, c_name
FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
  RIGHT JOIN customer ON o_custkey = c_custkey
""",
)
def join_right(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    c = tables.load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "join_full",
    oracle="""
SELECT coalesce(c.c_custkey, o.o_custkey) AS k,
       c.c_acctbal, o.o_orderkey, o.o_totalprice
FROM (SELECT * FROM customer WHERE c_acctbal > 8000) c
  FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
    ON c.c_custkey = o.o_custkey
""",
)
def join_full(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 8000)
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return o.join(c, c.c_custkey == o.o_custkey, "full").select(
        F.coalesce(c.c_custkey, o.o_custkey).alias("k"),
        "c_acctbal",
        "o_orderkey",
        "o_totalprice",
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
""",
)
def join_semi(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
)
""",
)
def join_anti(spark, sf_dir):
    p = tables.load(spark, sf_dir, "part")
    li = tables.load(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def join_cross(spark, sf_dir):
    r = tables.load(spark, sf_dir, "region")
    n = tables.load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id
FROM e e1
JOIN e e2
  ON e1.user_id = e2.user_id
 AND e2.event_id > e1.event_id
 AND e2.ts >= e1.ts
 AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
""",
)
def join_theta_range(spark, sf_dir):
    """Range self-join: same-user event pairs within 10 minutes, via the
    BANDED range join. A bare user_id equi conjunct is not enough at
    scale: a sort-merge join evaluates the range residual across each
    equal-key block, so one hot user with k events costs Theta(k^2)
    comparisons in a single task — measured 95 s (92x the sf0.1 time)
    on the 10x-skew stress set where one user owns 200k events. Banding
    adds a coarse time bucket (one window width, 10 min) to the join
    key: the left side duplicates each event into its own and the next
    bucket, the right side keeps its single bucket, and any qualifying
    pair (t2 in [t1, t1+10m]) lands in EXACTLY one of the two
    assignments — identical output, no post-dedup, and the per-block
    work drops from per-user to per-(user, 10 minutes). The range
    residual still applies inside each bucket pair."""
    from adlspark.ops.banding import banded_assignments, time_bucket

    BUCKET_US = 600 * 1000000  # one window width: 10 minutes
    e = tables.events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        time_bucket("ts", BUCKET_US).alias("bkt"),
    )
    left = e.select(
        F.col("event_id").alias("id1"),
        "user_id",
        F.col("ts").alias("ts1"),
        F.explode(banded_assignments("ts", BUCKET_US)).alias("jb"),
    )
    right = e.select(
        F.col("event_id").alias("id2"),
        F.col("user_id").alias("user_id2"),
        F.col("ts").alias("ts2"),
        F.col("bkt").alias("jb2"),
    )
    return left.join(
        right,
        (F.col("user_id") == F.col("user_id2"))
        & (F.col("jb") == F.col("jb2"))
        & (F.col("id2") > F.col("id1"))
        & (F.col("ts2") >= F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 10 MINUTES")),
    ).select("id1", "id2", "user_id")


@query(
    "join_asof",
    oracle="""
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'signup')
SELECT p.event_id AS purchase_id, p.user_id,
       p.ts AS purchase_ts, s.ts AS signup_ts
FROM p ASOF LEFT JOIN s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase paired with the user's most recent
    signup at-or-before it (inclusive, matching DuckDB ASOF). Uses the
    generic ``adlspark.ops.asof.asof_join`` operator — union-tag +
    running window, one shuffle, no candidate explosion (see asof.py
    for the scale rationale)."""
    from adlspark.ops.asof import asof_join

    ev = tables.events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=[],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("signup_ts"),
    )


@query(
    "join_interval",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
""",
)
def join_interval(spark, sf_dir):
    """Interval containment with an equi conjunct: lineitems shipped
    within 30 days of their order date."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    ).select("l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@query(
    "join_skew_salted",
    oracle=f"""
SELECT e.user_id, d.cohort, count(*) AS n,
       {o_dsum_total('e.value')} AS sum_value
FROM events e
JOIN (SELECT DISTINCT user_id, user_id % 7 AS cohort FROM events) d
  ON e.user_id = d.user_id
GROUP BY e.user_id, d.cohort
""",
)
def join_skew_salted(spark, sf_dir):
    """Skew-mitigated join via explicit salting: the (large, skewed) fact
    side gets a random-free deterministic salt (event_id % SALT); the dim
    side is replicated SALT times; the join key becomes (user_id, salt),
    splitting any hot user's rows across SALT reducers. AQE's skew-join
    handles this automatically for sort-merge joins; explicit salting is
    the portable form that also covers aggregations and older planners.
    Results are identical to the unsalted join (the oracle is unsalted).
    """
    SALT = 8
    ev = tables.events(spark, sf_dir).withColumn(
        "salt", (F.col("event_id") % SALT).cast("int")
    )
    dim = (
        tables.events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.col("user_id") % 7)
    )
    dim_salted = dim.crossJoin(
        F.broadcast(
            ev.sparkSession.range(SALT).select(F.col("id").cast("int").alias("salt"))
        )
    )
    joined = ev.join(dim_salted, on=["user_id", "salt"])
    return joined.groupBy("user_id", "cohort").agg(
        F.count(F.lit(1)).alias("n"),
        dsum_total("value").alias("sum_value"),
    )


@query(
    "join_interval_bucketed",
    oracle="""
WITH top AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS win_start, count(*) AS n
  FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20
)
SELECT t.user_id, t.win_start, count(*) AS n_events
FROM top t JOIN events e
  ON CAST(e.ts AS TIMESTAMP) >= t.win_start
 AND CAST(e.ts AS TIMESTAMP) < t.win_start + INTERVAL 6 HOUR
GROUP BY t.user_id, t.win_start
""",
)
def join_interval_bucketed(spark, sf_dir):
    """Pure range join (NO equi key) turned into an equi join by time
    bucketing — the scale technique for point-in-interval joins that
    would otherwise plan as a nested-loop scan of every (point,
    interval) combination. Each interval (the 6-hour activity window
    starting at a top-20 user's first event) is exploded into the
    1-hour buckets it overlaps; each point carries its own hour bucket;
    the join becomes bucket-equality plus a residual range check. An
    interval covers at most 7 buckets and a point has exactly one, so
    replication is bounded and no match is produced twice.

    Scale shape: bucket explosion multiplies the SMALL side only (20
    windows -> ~140 rows, broadcastable); the event side is a narrow
    map adding its hour key. The plan is a broadcast hash join on the
    bucket key — plan-asserted to contain no nested-loop join — and at
    1000-executor scale the same shape holds with the window table
    either broadcast or shuffled on the bucket key, never
    all-pairs-compared.
    """
    ev = tables.events(spark, sf_dir)
    top = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("win_start"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(20)
        .withColumn("win_end", F.col("win_start") + F.expr("INTERVAL 6 HOURS"))
    )
    wb = top.select(
        "user_id",
        "win_start",
        "win_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("win_start")),
                F.date_trunc("hour", F.col("win_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bkt"),
    )
    pt = ev.select(F.col("ts").alias("ets"), F.date_trunc("hour", F.col("ts")).alias("bkt"))
    return (
        pt.join(F.broadcast(wb), "bkt")
        .where((F.col("ets") >= F.col("win_start")) & (F.col("ets") < F.col("win_end")))
        .groupBy("user_id", "win_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "join_asof_forward",
    oracle="""
WITH err AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type = 'error'),
     pur AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type = 'purchase')
SELECT err.event_id AS error_id, err.user_id,
       err.ts AS error_ts,
       CASE WHEN pur.ts <= err.ts + INTERVAL 2 HOUR THEN pur.ts END
         AS next_purchase_ts
FROM err ASOF LEFT JOIN pur
  ON err.user_id = pur.user_id AND err.ts <= pur.ts
""",
)
def join_asof_forward(spark, sf_dir):
    """Forward-direction as-of join with a tolerance horizon: each error
    event paired with the same user's NEXT purchase at-or-after it, but
    only within 2 hours (the did-the-error-lose-the-sale query; pandas
    ``merge_asof(direction='forward', tolerance=...)`` semantics). Same
    single-window kernel as the backward key — one shuffle, no candidate
    explosion — with the time order reversed; the tolerance is a pure
    post-filter on the carried timestamp."""
    from adlspark.ops.asof import asof_join

    ev = tables.events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(
        errors,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=[],
        tolerance=F.expr("INTERVAL 2 HOURS"),
        direction="forward",
    )
    return joined.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        F.col("asof_ts").alias("next_purchase_ts"),
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH err AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type = 'error'),
     pur AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type = 'purchase'),
     back AS (
       SELECT err.event_id, err.user_id, err.ts, pur.ts AS prev_ts
       FROM err ASOF LEFT JOIN pur
         ON err.user_id = pur.user_id AND err.ts >= pur.ts
     ),
     fwd AS (
       SELECT err.event_id, pur.ts AS next_ts
       FROM err ASOF LEFT JOIN pur
         ON err.user_id = pur.user_id AND err.ts <= pur.ts
     )
SELECT b.event_id AS error_id, b.user_id, b.ts AS error_ts,
       CASE
         WHEN b.prev_ts IS NULL THEN f.next_ts
         WHEN f.next_ts IS NULL THEN b.prev_ts
         WHEN date_diff('microseconds', b.prev_ts, b.ts)
              <= date_diff('microseconds', b.ts, f.next_ts) THEN b.prev_ts
         ELSE f.next_ts
       END AS nearest_purchase_ts
FROM back b JOIN fwd f ON b.event_id = f.event_id
""",
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (pandas ``merge_asof(
    direction='nearest')``): each error event paired with the same user's
    CLOSEST purchase in time, whichever side it falls on — ties go
    backward, matching pandas. Composition of the backward and forward
    single-window kernels on the same shuffle key plus one equi-join on
    the left key; at scale all three hash-partition by user, so AQE/
    bucketing keeps the final join co-located. No candidate explosion —
    each direction contributes at most one row per left row.
    """
    from adlspark.ops.asof import asof_join

    ev = tables.events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    back = asof_join(
        errors, purchases, ["user_id"], "ts", "ts", [], direction="backward"
    ).select("event_id", "user_id", "ts", F.col("asof_ts").alias("prev_ts"))
    fwd = asof_join(
        errors, purchases, ["user_id"], "ts", "ts", [], direction="forward"
    ).select("event_id", F.col("asof_ts").alias("next_ts"))
    j = back.join(fwd, "event_id")
    # Integer microsecond gaps: cast('double') loses sub-µs exactness and
    # can flip the <= tie against the oracle's date_diff('microseconds').
    back_gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    fwd_gap = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(back_gap <= fwd_gap, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return j.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        nearest.alias("nearest_purchase_ts"),
    )


@query(
    "join_star_schema",
    oracle=f"""
SELECT n_name,
       {o_dsum_total('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def join_star_schema(spark, sf_dir):
    """TPC-H Q5-shaped star join: local-supplier revenue by nation.

    The scale story is the join ORDER and STRATEGIES, not the SQL: the
    two fact tables (lineitem, orders) meet in one shuffled sort-merge
    join on orderkey; the small dimensions (supplier, nation, region)
    join broadcast-hash explicitly, while the customer edge is left to
    AQE — customer is dimension-sized here but fact-sized in a real
    TPC-H deployment, so hard-coding a broadcast there would be the
    100×-scale bug; AQE picks broadcast at this sf and SMJ at scale. The region filter is pushed below the
    join (partition/row-group pruning at the scan), and the local-supplier
    condition c_nationkey = s_nationkey rides the supplier broadcast as
    an extra equi conjunct rather than a post-filter. Revenue uses the
    decimal-exact dsum discipline; the per-item product
    price·(1−discount) is one IEEE expression on both engines.
    """
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(
            r, F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            dim,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum_total(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_bloom_filtered",
    oracle=f"""
SELECT date_trunc('month', o.o_orderdate) AS order_month,
       count(*) AS n_items,
       {o_dsum_total('l.l_extendedprice')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
""",
)
def join_bloom_filtered(spark, sf_dir):
    """Bloom-filter semi-join reduction: the selective dim predicate
    (urgent orders, ~20%) is turned into a 64 Kbit / 4-hash Bloom filter
    that prunes fact rows BEFORE the join shuffle — the runtime-filter
    pattern engines apply when the join key is not a partition column
    (complementing ``join_dpp_prune``, which handles the partitioned
    case). False positives are removed by the exact join that follows,
    so the result is identical to the plain join — which is exactly what
    the oracle checks.

    Spark-first shape: the filter is a DataFrame aggregate — hash each
    dim key 4 ways (xxhash64, JVM-side), OR the bits into a 1024-word
    bitmap (map-side combinable, merges across partitions for free),
    broadcast the single-row bitmap, and test membership with pure
    bitwise expressions (shiftright/&) inside whole-stage codegen. No
    driver-side filter object, no Python, no extra shuffle: at 100 TB
    the fact scan emits ~20% + ε of its rows into the join exchange
    instead of 100%, and the bitmap costs 8 KB per executor."""
    BITS, WORDS, K = 65536, 1024, 4

    def positions(col):
        return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(BITS)) for i in range(K)]

    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate"
    )

    pos = urgent.select(
        F.explode(F.array(*positions(F.col("o_orderkey")))).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / F.lit(64)).cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")).alias("bits")
    )
    bitmap = words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(WORDS - 1)),
            lambda i: F.coalesce(F.element_at("m", i), F.lit(0).cast("long")),
        ).alias("bm")
    )

    def member(key: str):
        test = F.lit(True)
        for i in range(K):
            p = f"pmod(xxhash64({key}, {i}), {BITS})"
            test = test & (
                F.expr(
                    f"(shiftright(element_at(bm, CAST({p} / 64 AS INT) + 1),"
                    f" CAST({p} % 64 AS INT)) & 1) = 1"
                )
            )
        return test

    pruned = li.crossJoin(F.broadcast(bitmap)).where(member("l_orderkey"))
    return (
        pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_total("l_extendedprice").alias("revenue"),
        )
    )


@query(
    "join_asof_tolerance",
    oracle="""
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'signup')
SELECT purchase_id, user_id, purchase_ts,
       CASE WHEN gap_us <= 3::BIGINT * 86400 * 1000000 THEN raw_signup_ts
            END AS signup_ts,
       CASE WHEN gap_us <= 3::BIGINT * 86400 * 1000000 THEN gap_us
            END AS gap_us
FROM (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         s.ts AS raw_signup_ts,
         date_diff('microsecond', s.ts, p.ts) AS gap_us
  FROM p ASOF LEFT JOIN s
    ON p.user_id = s.user_id AND p.ts >= s.ts
)
""",
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a tolerance window (pandas merge_asof's
    ``tolerance``): each purchase takes the user's most recent signup
    at-or-before it ONLY if it is within 3 days; staler matches are
    nulled but the left row survives — the semantics risk/feature
    pipelines need when a stale dimension value is worse than none.

    The gap test is integer microseconds end-to-end (unix_micros — the
    join_asof_nearest discipline), so the tolerance boundary is exact
    on both engines. Same single-shuffle union-tag kernel as
    ``join_asof``; tolerance adds one null-out projection, no extra
    join and no extra shuffle."""
    from adlspark.ops.asof import asof_join

    TOL_US = 3 * 86400 * 1000000
    ev = tables.events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=[],
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))
    in_tol = F.col("asof_ts").isNotNull() & (gap <= F.lit(TOL_US))
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_tol, F.col("asof_ts")).alias("signup_ts"),
        F.when(in_tol, gap).alias("gap_us"),
    )
