"""§2 D — Aggregations.

All plans are plain ``groupBy().agg()`` — Catalyst compiles these to
partial (map-side) + final hash aggregates automatically, which is the
scale-correct shape: the shuffle carries one row per (partition, group),
not per input row. Double sums use exact decimal summation (parity.py) so
results are independent of partition count / merge order — a property that
matters both for the DuckDB oracle and for determinism on a 1000-executor
cluster.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.ops.parity import DEC, O_DEC, davg_total, dsum_total, o_davg_total, o_dsum_total
from adlspark.registry import query


@query(
    "agg_group_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {o_dsum_total('l_quantity')} AS sum_qty,
       {o_dsum_total('l_extendedprice')} AS sum_base_price,
       {o_dsum_total('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {o_dsum_total('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {o_davg_total('l_quantity')} AS avg_qty,
       {o_davg_total('l_extendedprice')} AS avg_price,
       {o_davg_total('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_group_q1(spark, sf_dir):
    """TPC-H Q1 shape: filter → hash aggregate, 8 aggregates over 2 keys."""
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_total("l_quantity").alias("sum_qty"),
            dsum_total("l_extendedprice").alias("sum_base_price"),
            dsum_total(disc_price).alias("sum_disc_price"),
            dsum_total(charge).alias("sum_charge"),
            davg_total("l_quantity").alias("avg_qty"),
            davg_total("l_extendedprice").alias("avg_price"),
            davg_total("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_global",
    oracle=f"""
SELECT {o_dsum_total('l_quantity')} AS sum_qty,
       {o_davg_total('l_extendedprice')} AS avg_price,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(*) AS n_rows
FROM lineitem
""",
)
def agg_global(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    return li.agg(
        dsum_total("l_quantity").alias("sum_qty"),
        davg_total("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT c_nationkey, count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
)
def agg_count_distinct(spark, sf_dir):
    """Exact distinct — Catalyst plans Expand + two-phase aggregate."""
    orders = tables.load(spark, sf_dir, "orders")
    customer = tables.load(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_nationkey")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@query("agg_approx_distinct")  # rows-only: HLL++ sketch differs per engine
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct's Expand blow-up is unaffordable. rsd=0.01 → ~1% error."""
    # NOT spread (round-14 A/B 1.88x WORSE): 32 partial HLL++ sketches
    # per group outweigh the single-task scan at this size
    orders = tables.load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers")
    )


@query(
    "agg_having",
    oracle=f"""
SELECT o_custkey, count(*) AS n_orders,
       {o_dsum_total('o_totalprice')} AS total_spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
""",
)
def agg_having(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_total("o_totalprice").alias("total_spend"),
        )
        .where(F.col("n_orders") >= 12)
    )


@query(
    "agg_stats",
    oracle=f"""
SELECT l_returnflag,
       sqrt((sxx - (sx * sx) / n) / (n - 1.0)) AS std_qty,
       (sxx - (sx * sx) / n) / (n - 1.0) AS var_qty,
       round((n * spx - sp * sx)
         / (sqrt(n * spp - sp * sp) * sqrt(n * sxx - sx * sx)), 6) AS corr_price_qty,
       (sdt - (sd * st) / n) / (n - 1.0) AS covar_disc_tax
FROM (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         {o_dsum_total('l_quantity')} AS sx,
         {o_dsum_total('l_quantity * l_quantity')} AS sxx,
         {o_dsum_total('l_extendedprice')} AS sp,
         {o_dsum_total('l_extendedprice * l_extendedprice')} AS spp,
         {o_dsum_total('l_extendedprice * l_quantity')} AS spx,
         {o_dsum_total('l_discount')} AS sd,
         {o_dsum_total('l_tax')} AS st,
         {o_dsum_total('l_discount * l_tax')} AS sdt
  FROM lineitem GROUP BY l_returnflag
) t
""",
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates (stddev/var/corr/covar) from decimal-exact
    sufficient statistics.

    Engine-native stddev/corr use co-moment merges whose result depends on
    partition merge order, so round(native_agg, k) flips at rounding
    boundaries across engines (the round-1 driver mismatch). Instead: sums
    of x, x², xy are computed exactly in DECIMAL(38,6) (order-independent),
    cast to double, and the statistic is derived with the identical IEEE
    closed form in both engines — bit-identical output, no rounding needed.
    The shape is still one map-side-combinable hash aggregate (one shuffle
    of 10 numbers per group) — the same sufficient-statistics pattern a
    1000-executor cluster wants.
    """
    # spread: the single-row-group lineitem file scans as ONE task, so
    # the 9 decimal(38,6) sufficient-statistic sums over 600k rows ran
    # single-core (guide §2.5); the repartition ships only the 5 used
    # columns (pruned below the exchange) and the partial aggregate
    # above it is 10 numbers per group per task.
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    disc, tax = F.col("l_discount"), F.col("l_tax")
    suff = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_total(qty).alias("sx"),
        dsum_total(qty * qty).alias("sxx"),
        dsum_total(price).alias("sp"),
        dsum_total(price * price).alias("spp"),
        dsum_total(price * qty).alias("spx"),
        dsum_total(disc).alias("sd"),
        dsum_total(tax).alias("st"),
        dsum_total(disc * tax).alias("sdt"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sp, spp, spx = F.col("sp"), F.col("spp"), F.col("spx")
    sd, st, sdt = F.col("sd"), F.col("st"), F.col("sdt")
    # try_divide throughout: a single-row group (n=1, e.g. one lineitem
    # with a NULL returnflag forming its own group) has no sample
    # variance/corr/covar — DuckDB's /0 yields NULL, Spark's ANSI `/`
    # would abort the job
    var_qty = F.try_divide(sxx - (sx * sx) / n, n - F.lit(1.0))
    return suff.select(
        "l_returnflag",
        F.sqrt(var_qty).alias("std_qty"),
        var_qty.alias("var_qty"),
        # corr's numerator/denominator cancel ~3 digits and C++ FMA
        # contraction (absent on the JVM) leaves a last-ulp diff — round at
        # 6 digits (drift ~1e-16 relative; boundary odds ~1e-12). The other
        # three stats are bit-identical closed forms, left unrounded.
        F.round(
            F.try_divide(
                n * spx - sp * sx,
                F.sqrt(n * spp - sp * sp) * F.sqrt(n * sxx - sx * sx),
            ),
            6,
        ).alias("corr_price_qty"),
        F.try_divide(sdt - (sd * st) / n, n - F.lit(1.0)).alias(
            "covar_disc_tax"
        ),
    )


@query(
    "agg_skew_kurt",
    oracle=f"""
SELECT l_returnflag,
       round(((sxxx - ((3.0 * sx) * sxx) / n + ((2.0 * sx) * sx * sx) / (n * n)) / n)
             / pow((sxx - (sx * sx) / n) / n, 1.5), 6) AS skew_qty,
       round(((sxxxx - ((4.0 * sx) * sxxx) / n
               + (((6.0 * sx) * sx) * sxx) / (n * n)
               - (((3.0 * sx) * sx) * sx * sx) / ((n * n) * n)) / n)
             / pow((sxx - (sx * sx) / n) / n, 2.0), 6) - 3.0 AS kurt_qty
FROM (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         {o_dsum_total('l_quantity')} AS sx,
         {o_dsum_total('l_quantity * l_quantity')} AS sxx,
         {o_dsum_total('l_quantity * l_quantity * l_quantity')} AS sxxx,
         {o_dsum_total('l_quantity * l_quantity * l_quantity * l_quantity')} AS sxxxx
  FROM lineitem GROUP BY l_returnflag
) t
""",
)
def agg_skew_kurt(spark, sf_dir):
    """Population skewness and excess kurtosis from decimal-exact raw
    moments (sums of x..x⁴), the same sufficient-statistics discipline as
    ``agg_stats``: engine-native skewness/kurtosis merge co-moments in
    partition order (non-deterministic across engines), while decimal sums
    are associative, and the closed form is evaluated with an identical
    IEEE expression tree on both sides. l_quantity is integral ≤ 50, so
    the double products feeding the decimal cast are exact (50⁴ ≪ 2⁵³).
    Scale shape: one map-side-combinable hash aggregate shuffling six
    numbers per group — the moment sketch a 1000-executor cluster wants
    (third/fourth moments merge trivially, unlike streaming one-pass
    central-moment updates)."""
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    qty = F.col("l_quantity")
    suff = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_total(qty).alias("sx"),
        dsum_total(qty * qty).alias("sxx"),
        dsum_total(qty * qty * qty).alias("sxxx"),
        dsum_total(qty * qty * qty * qty).alias("sxxxx"),
    )
    n, sx = F.col("n"), F.col("sx")
    sxx, sxxx, sxxxx = F.col("sxx"), F.col("sxxx"), F.col("sxxxx")
    m2 = (sxx - (sx * sx) / n) / n
    m3 = (sxxx - ((F.lit(3.0) * sx) * sxx) / n + ((F.lit(2.0) * sx) * sx * sx) / (n * n)) / n
    m4 = (
        sxxxx
        - ((F.lit(4.0) * sx) * sxxx) / n
        + (((F.lit(6.0) * sx) * sx) * sxx) / (n * n)
        - (((F.lit(3.0) * sx) * sx) * sx * sx) / ((n * n) * n)
    ) / n
    # try_divide: a zero-variance group (n=1 or all-equal values) has
    # no skew/kurtosis — NULL on both engines (DuckDB /0 is NULL)
    return suff.select(
        "l_returnflag",
        F.round(F.try_divide(m3, F.pow(m2, F.lit(1.5))), 6).alias("skew_qty"),
        (F.round(F.try_divide(m4, F.pow(m2, F.lit(2.0))), 6) - F.lit(3.0))
        .alias("kurt_qty"),
    )


@query(
    "agg_percentile",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS q25,
       round(median(l_quantity), 6) AS med,
       round(quantile_cont(l_quantity, 0.75), 6) AS q75
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile(spark, sf_dir):
    """Exact percentiles (linear interpolation — same semantics as DuckDB
    quantile_cont). At 100 TB one would switch to approx_percentile."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("q25"),
        F.round(F.median("l_quantity"), 6).alias("med"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("q75"),
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT r_name, n_name, count(*) AS n_cust,
       {o_dsum_total('c_acctbal')} AS sum_bal
FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
-- empty-input seam: Spark emits NO grand-total row over an empty
-- relation; DuckDB emits the () grouping set. count(*) >= 1 for every
-- grouping-set row on non-empty input, so this only trims the empty case
HAVING count(*) > 0
""",
)
def agg_rollup(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum_total("c_acctbal").alias("sum_bal"))
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       {o_dsum_total('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
HAVING count(*) > 0  -- empty-input seam (see agg_rollup oracle)
""",
)
def agg_cube(spark, sf_dir):
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum_total("l_quantity").alias("sum_qty")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT r_name, n_name,
       (CASE WHEN r_name IS NULL THEN 2 ELSE 0 END
        + CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS lvl,
       count(*) AS n_cust,
       {o_dsum_total('c_acctbal')} AS sum_bal
FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (n_name), ())
HAVING count(*) > 0  -- empty-input seam (see agg_rollup oracle)
""",
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping sets via SQL. The subtotal level is derived from
    key NULL-ness (keys are never NULL in the data), avoiding
    grouping_id() encoding differences between engines."""
    tables.load(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    tables.load(spark, sf_dir, "nation").createOrReplaceTempView("gs_nation")
    tables.load(spark, sf_dir, "region").createOrReplaceTempView("gs_region")
    return spark.sql(
        f"""
        SELECT r_name, n_name,
               (CASE WHEN r_name IS NULL THEN 2 ELSE 0 END
                + CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS lvl,
               count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS sum_bal
        FROM gs_customer
          JOIN gs_nation ON c_nationkey = n_nationkey
          JOIN gs_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(array_agg(DISTINCT event_type)), ' ') AS types,
       count(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def agg_collect_sorted(spark, sf_dir):
    """collect_set → sorted, emitted as a space-joined string: same
    semantics as the array, but hashable by the driver's canonicalizer
    (pandas cannot factorize ndarray cells — the round-1 harness error)."""
    ev = tables.events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_conditional",
    oracle=f"""
SELECT user_id,
       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE (value) END AS {O_DEC})) FILTER (WHERE event_type = 'purchase')
            AS DOUBLE) AS purchase_value,
       count(*) FILTER (WHERE event_type = 'error') AS n_errors,
       count(*) FILTER (WHERE value > 50) AS n_high,
       count(*) AS n_total
FROM events
GROUP BY user_id
""",
)
def agg_conditional(spark, sf_dir):
    """Filtered aggregation — sum(when(...)) compiles to a single pass."""
    ev = tables.events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).try_cast(DEC))
        .cast("double")
        .alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.count(F.when(F.col("value") > 50, 1)).alias("n_high"),
        F.count(F.lit(1)).alias("n_total"),
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "agg_pivot",
    oracle=f"""
SELECT c_nationkey,
       {", ".join(
           f"count(*) FILTER (WHERE c_mktsegment = '{s}') AS {s}"
           for s in _SEGMENTS
       )}
FROM customer GROUP BY c_nationkey
""",
)
def agg_pivot(spark, sf_dir):
    """Pivot: one column per market segment, customer counts per nation.
    Spark's pivot is a single-pass conditional aggregate (the explicit
    value list avoids the extra distinct-values job at scale); empty
    cells are 0-filled to match SQL's count FILTER."""
    c = tables.load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _SEGMENTS)
    )


@query(
    "agg_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem
""",
)
def agg_unpivot(spark, sf_dir):
    """Unpivot (melt) wide measure columns to long form — one scan, no
    shuffle (Expand node), vs the UNION-of-scans SQL equivalent."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


@query(
    "agg_histogram",
    oracle=f"""
WITH b AS (
  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
         o_totalprice
  FROM orders
)
SELECT bucket,
       CAST(bucket * 50000.0 AS DOUBLE) AS bucket_lo,
       count(*) AS n,
       {o_dsum_total('o_totalprice')} AS sum_price
FROM b GROUP BY bucket
""",
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram of order totals (50k-wide buckets): the
    bucket id is a pure projection (floor-divide — no width_bucket
    dependency, identical arithmetic in both engines), so the histogram
    is ONE map-side-combinable aggregate whose shuffle carries one row
    per (partition, bucket) — the profile/data-exploration primitive at
    any scale."""
    o = tables.load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_total("o_totalprice").alias("sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("bucket_lo"),
            "n",
            "sum_price",
        )
    )


@query(
    "agg_mode",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity, count(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_quantity
), r AS (
  SELECT l_returnflag, l_quantity, n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_quantity) AS rk
  FROM c
)
SELECT l_returnflag, l_quantity AS mode_qty, n AS n_mode
FROM r WHERE rk = 1
""",
)
def agg_mode(spark, sf_dir):
    """Statistical mode per group with a DETERMINISTIC tie-break (highest
    count, then lowest value). Engine-native mode() functions leave tie
    resolution unspecified — implementing it as count + row_number makes
    the answer well-defined and cross-engine identical, and keeps the
    shape scale-correct: the first aggregate is map-side combinable, the
    window runs over the (group, distinct-value) table, which is
    cardinality-bounded, not row-bounded."""
    li = tables.load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("n_mode"),
        )
    )


@query("agg_approx_percentile")  # rows-only: sketch quantiles differ per engine
def agg_approx_percentile(spark, sf_dir):
    """Approximate percentiles via Spark's Greenwald-Khanna-style sketch
    (approx_percentile, accuracy 10000 ≈ 0.01% rank error) — the 100 TB
    path where the exact form (agg_percentile) would sort-or-collect
    full value distributions per group. The sketch is mergeable, so the
    aggregate stays one map-side-combinable shuffle of sketch state per
    group; rows-only because sketch boundaries are engine-specific
    (the exact key next to it carries the value verification).

    Output shape: the three quantiles are emitted as SCALAR double
    columns (p50/p95/p99), never as one array<double> — the driver's
    pandas canonicalizer cannot factorize ndarray cells (the round-1
    harness trap agg_collect_sorted documents and avoids via
    concat_ws); this key shipped the array form and ERRORED in its
    first round-6 driver appearance. tests/test_output_schema.py now
    lints the whole registry for atomic-only output fields."""
    li = tables.load(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("pa"),
        F.count(F.lit(1)).alias("n"),
    )
    return agged.select(
        "l_returnflag",
        F.element_at("pa", 1).alias("p50"),
        F.element_at("pa", 2).alias("p95"),
        F.element_at("pa", 3).alias("p99"),
        "n",
    )


@query(
    "agg_heavy_hitters_cms",
    oracle="""
WITH pos AS (
  SELECT user_id, r,
         CAST('0x' || substring(md5(CAST(r AS VARCHAR) || ':'
              || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 1024 AS p
  FROM events, unnest([0, 1, 2, 3]) AS t(r)
), counters AS (
  SELECT r, p, count(*) AS c FROM pos GROUP BY r, p
), cand AS (
  SELECT DISTINCT user_id FROM events
), cand_pos AS (
  SELECT user_id, r,
         CAST('0x' || substring(md5(CAST(r AS VARCHAR) || ':'
              || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 1024 AS p
  FROM cand, unnest([0, 1, 2, 3]) AS t(r)
), est AS (
  SELECT cp.user_id, min(c.c) AS est_count
  FROM cand_pos cp JOIN counters c ON cp.r = c.r AND cp.p = c.p
  GROUP BY cp.user_id
), truth AS (
  SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id
)
SELECT est.user_id, est.est_count, truth.true_count
FROM est JOIN truth ON est.user_id = truth.user_id
ORDER BY est.est_count DESC, est.user_id
LIMIT 10
""",
)
def agg_heavy_hitters_cms(spark, sf_dir):
    """Heavy hitters via a count-min sketch (Cormode & Muthukrishnan
    2005) — the frequency-estimation rung of the sketch suite next to
    HLL (distinct), GK (percentile) and Bloom (membership). A 4x1024
    counter sketch is built AS A DATAFRAME: each event contributes 4
    (row, md5-derived bucket) increments, aggregated to at most 4096
    counter cells — map-side combinable and mergeable across partitions/
    days by plain cell-wise sum, which is the property streaming
    pipelines keep sketches for. Estimation joins candidate keys'
    positions against the BROADCAST counter table (bounded by sketch
    size, never by data) and takes the per-key min; output is the top-10
    estimated-heaviest users with their true counts alongside, so the
    one-sided error guarantee (est ≥ true) is visible and oracle-checked.

    The md5-derived bucketing is integer-exact cross-engine (same recipe
    as llm_simhash), making the whole sketch — normally 'approximate' —
    bit-deterministic and fully value-checked against DuckDB.
    """
    ev = tables.spread(tables.load(spark, sf_dir, "events").select("user_id"), key="user_id")
    rows = spark.range(4).select(F.col("id").cast("int").alias("r"))

    def bucket(r_col, u_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            r_col.cast("string"), F.lit(":"), u_col.cast("string")
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    pos = ev.crossJoin(F.broadcast(rows)).select(
        "user_id", "r", bucket(F.col("r"), F.col("user_id")).alias("p")
    )
    counters = pos.groupBy("r", "p").agg(F.count(F.lit(1)).alias("c"))
    cand = ev.distinct()
    cand_pos = cand.crossJoin(F.broadcast(rows)).select(
        "user_id", "r", bucket(F.col("r"), F.col("user_id")).alias("p")
    )
    est = (
        cand_pos.join(F.broadcast(counters), ["r", "p"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(truth, "user_id")
        .orderBy(F.col("est_count").desc(), F.col("user_id"))
        .limit(10)
    )


@query("agg_hll_partial_merge")  # rows-only: sketch binaries are
# engine-specific; pytest pins the merge-vs-direct identity and error band
def agg_hll_partial_merge(spark, sf_dir):
    """HLL sketch MERGEABILITY — the property that makes approximate
    distinct counts work as a lake rollup: per-day user sketches are
    built once (hll_sketch_agg — Apache DataSketches under Spark 4),
    persisted-shaped as binary partials, then merged (hll_union_agg)
    into the month total WITHOUT rescanning events. The output carries
    the merged estimate, the direct whole-range estimate (identical by
    construction — union of partials IS the single-pass sketch), and the
    exact count for the error band. This is how a 100 TB lake answers
    'distinct users this quarter' from daily 1 KB sketches instead of a
    quarter-long scan.

    Rows-only: sketch serialization is engine-specific (DuckDB's HLL is
    a different implementation), but the pytest property pins
    merged == direct and |est - exact| / exact within the standard
    lgK=12 error (~1.6%, 3-sigma ~5%).
    """
    ev = tables.events(spark, sf_dir).select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "merged_distinct_est"
        ),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "direct_distinct_est"
        ),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return merged.crossJoin(direct).select(
        "n_days",
        "n_events",
        "merged_distinct_est",
        "direct_distinct_est",
        "exact_distinct",
    )


@query(
    "agg_median",
    oracle="""
SELECT l_returnflag,
       round(median(l_quantity), 6) AS med_qty,
       round(median(l_extendedprice), 6) AS med_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_median(spark, sf_dir):
    """Exact median per group (interpolated for even counts — both
    engines take the midpoint mean of the two central values, the same
    single IEEE operation, so round(6) is safely beyond any drift).
    Spark computes it via a group-local sort — at scale the real cost is
    the same shuffle the groupBy already pays; for one global median over
    100 TB you'd switch to agg_approx_percentile's mergeable sketch."""
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.median("l_extendedprice"), 6).alias("med_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_first_last_by",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY coalesce(user_id, -1)
                            ORDER BY coalesce(value,
                                              '-infinity'::DOUBLE) DESC,
                                     event_id DESC) AS r_top,
         row_number() OVER (PARTITION BY coalesce(user_id, -1)
                            ORDER BY coalesce(CAST(ts AS TIMESTAMP),
                                              TIMESTAMP '1900-01-01') ASC,
                                     event_id ASC)
           AS r_first,
         row_number() OVER (PARTITION BY coalesce(user_id, -1)
                            ORDER BY coalesce(CAST(ts AS TIMESTAMP),
                                              TIMESTAMP '1900-01-01') DESC,
                                     event_id DESC)
           AS r_last
  FROM events
)
SELECT user_id,
       max(CASE WHEN r_top = 1 THEN event_id END) AS top_value_event,
       max(CASE WHEN r_first = 1 THEN event_id END) AS first_event,
       max(CASE WHEN r_last = 1 THEN event_type END) AS last_type
FROM ranked GROUP BY user_id
""",
)
def agg_first_last_by(spark, sf_dir):
    """argmin/argmax aggregates (min_by/max_by): the highest-value event,
    the chronologically first event, and the latest event's type per
    user — each a single map-combinable aggregate instead of the window
    + filter detour. Orderings are made total with the unique event_id
    tiebreaker packed into a struct (both engines compare tuples
    lexicographically), so duplicate extremes can never produce
    engine-dependent winners."""
    ev = tables.events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias(
            "top_value_event"
        ),
        F.min_by("event_id", F.struct("ts", "event_id")).alias("first_event"),
        F.max_by("event_type", F.struct("ts", "event_id")).alias("last_type"),
    )


@query(
    "agg_grouping_flags",
    oracle=f"""
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       count(*) AS n_customers,
       {o_dsum_total('c_acctbal')} AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, n_name)
HAVING count(*) > 0  -- empty-input seam (see agg_rollup oracle)
""",
)
def agg_grouping_flags(spark, sf_dir):
    """CUBE with GROUPING() indicator columns — the portable way to tell
    a stored subtotal row from a genuine NULL group key downstream
    (``agg_cube`` pins the values; this key pins the indicators).
    GROUPING(col) is the SQL-standard 0/1 flag and identical across
    engines; the packed ``grouping_id()`` bit ORDER is engine-specific,
    so the composite form is deliberately excluded (SURVEY §5.3 note at
    the grouping-sets key). One partial+final aggregate per grouping
    set, map-side combined — CUBE costs 4 passes of combiners here, not
    4 scans.
    """
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    j = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        j.cube("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("long").alias("g_region"),
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            dsum_total("c_acctbal").alias("sum_bal"),
        )
        .select(
            "r_name", "n_name", "g_region", "g_nation", "n_customers", "sum_bal"
        )
    )


def _o_corr(x: str, y: str) -> str:
    """Oracle-SQL Pearson r — native corr(), ROUND_STATS=4.

    Correlation is one of parity.py's "non-decimalizable statistics":
    both engines' native one-pass co-moment accumulators drift only
    ~1e-12 relative (the sums never leave the ratio), so round-4 output
    is stable cross-engine — and native corr is ~10x cheaper than 14
    BigDecimal-backed exact sums (measured 5.9 s -> 0.6 s at sf0.1).
    Fixture r values at sf0.001/0.01/0.1 were probed to sit well clear
    of every 1e-4 rounding boundary."""
    return f"round(corr({x}, {y}), 4)"


@query(
    "agg_corr_matrix",
    oracle=f"""
SELECT l_returnflag,
       count(*) AS n,
       {_o_corr('l_quantity', 'l_extendedprice')} AS r_qty_price,
       {_o_corr('l_quantity', 'l_discount')} AS r_qty_disc,
       {_o_corr('l_extendedprice', 'l_discount')} AS r_price_disc,
       {_o_corr('l_extendedprice', 'l_tax')} AS r_price_tax
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the lineitem measures
    (quantity, extendedprice, discount, tax) per return flag — the
    feature-correlation profile step of any dataset audit.

    All six pairwise correlations come out of ONE pass: a single
    map-side-combinable aggregate whose state is each pair's co-moment
    triple (Welford-merged, numerically stable, a few doubles per
    group). No per-pair scan, no shuffle beyond the one groupBy; at
    100 TB the aggregate state is O(pairs) doubles x #groups regardless
    of row count. Adding a 5th measure costs 4 more corr states, not
    another pass. Cross-engine: corr is a parity.py non-decimalizable
    statistic -> native accumulators + ROUND_STATS=4 (drift ~1e-12
    relative, margin ~8 orders below the rounding grain)."""
    li = tables.load(spark, sf_dir, "lineitem")
    pairs = {
        "r_qty_price": ("l_quantity", "l_extendedprice"),
        "r_qty_disc": ("l_quantity", "l_discount"),
        "r_price_disc": ("l_extendedprice", "l_discount"),
        "r_price_tax": ("l_extendedprice", "l_tax"),
    }
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.corr(a, b), 4).alias(name)
            for name, (a, b) in pairs.items()
        ],
    )


@query(
    "agg_mutual_info",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS seg, n.n_name AS nat
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
), tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j),
cells AS (
  SELECT seg, nat, CAST(count(*) AS DOUBLE) AS c FROM j GROUP BY seg, nat
), px AS (SELECT seg, CAST(count(*) AS DOUBLE) AS cx FROM j GROUP BY seg),
py AS (SELECT nat, CAST(count(*) AS DOUBLE) AS cy FROM j GROUP BY nat),
mi AS (
  SELECT sum((c / n) * ln((c * n) / (cx * cy))) AS mi_nats
  FROM cells JOIN px USING (seg) JOIN py USING (nat) CROSS JOIN tot
), hx AS (SELECT sum(-(cx / n) * ln(cx / n)) AS h_seg FROM px CROSS JOIN tot),
hy AS (SELECT sum(-(cy / n) * ln(cy / n)) AS h_nat FROM py CROSS JOIN tot)
SELECT round(mi_nats, 6) AS mi_nats,
       round(h_seg, 6) AS h_seg,
       round(h_nat, 6) AS h_nat,
       round(mi_nats / least(h_seg, h_nat), 6) AS nmi
FROM mi CROSS JOIN hx CROSS JOIN hy
""",
)
def agg_mutual_info(spark, sf_dir):
    """Mutual information between two categorical columns (market
    segment × nation) plus marginal entropies and normalized MI — the
    categorical-association audit next to ``agg_corr_matrix``'s numeric
    one (is a column informative about another, or redundant?).

    Cross-engine: every probability comes from EXACT integer counts;
    the per-cell p·ln terms are identical IEEE expressions and the
    final sums run over ≤ |X|·|Y| cells (125 here) whose ~1e-15
    accumulation drift is 9 orders under the round-6 grain.

    Scale shape: one fact scan with a broadcast dim join, then three
    map-side-combinable count aggregates (cells, two marginals) — the
    cell table is category-cardinality-sized, so the MI combination
    step is metadata-scale work on any corpus; the scan never shuffles
    rows, only counts."""
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat")
    )
    cells = j.groupBy("seg", "nat").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    px = j.groupBy("seg").agg(F.count(F.lit(1)).cast("double").alias("cx"))
    py = j.groupBy("nat").agg(F.count(F.lit(1)).cast("double").alias("cy"))
    tot = j.agg(F.count(F.lit(1)).cast("double").alias("n"))
    mi = (
        cells.join(F.broadcast(px), "seg")
        .join(F.broadcast(py), "nat")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("c") / F.col("n"))
                * F.log((F.col("c") * F.col("n")) / (F.col("cx") * F.col("cy")))
            ).alias("mi_nats")
        )
    )
    hx = px.crossJoin(F.broadcast(tot)).agg(
        F.sum(-(F.col("cx") / F.col("n")) * F.log(F.col("cx") / F.col("n"))).alias(
            "h_seg"
        )
    )
    hy = py.crossJoin(F.broadcast(tot)).agg(
        F.sum(-(F.col("cy") / F.col("n")) * F.log(F.col("cy") / F.col("n"))).alias(
            "h_nat"
        )
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_seg", 6).alias("h_seg"),
            F.round("h_nat", 6).alias("h_nat"),
            F.round(F.col("mi_nats") / F.least("h_seg", "h_nat"), 6).alias("nmi"),
        )
    )


@query(
    "agg_cohort_overlap",
    oracle="""
WITH a AS (
  SELECT DISTINCT event_type, user_id FROM events
), sz AS (
  SELECT event_type, count(*) AS n FROM a GROUP BY event_type
)
SELECT x.event_type AS type1, y.event_type AS type2,
       count(*) AS n_both,
       s1.n AS n_type1, s2.n AS n_type2,
       round(CAST(count(*) AS DOUBLE)
             / (s1.n + s2.n - count(*)), 4) AS jaccard
FROM a x
JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
JOIN sz s1 ON s1.event_type = x.event_type
JOIN sz s2 ON s2.event_type = y.event_type
GROUP BY x.event_type, y.event_type, s1.n, s2.n
""",
)
def agg_cohort_overlap(spark, sf_dir):
    """Pairwise audience overlap: for every pair of event types, how
    many users did both, and the Jaccard of the two audiences — the
    cohort-intersection workload behind funnel design and feature-
    adoption dashboards (and, on a corpus, source/domain audience
    overlap).

    Scale shape: the event stream first collapses to DISTINCT
    (type, user) — one map-side-combinable dedup bounded by
    |types|×|users|, the only corpus-sized work. The pair join is a
    user-keyed self-join of that collapsed table: each user contributes
    C(k,2) rows for the k types they touched (k ≤ 5 here), so pair
    volume is audience-sized, never event-sized. Audience sizes join
    back broadcast. An N-way overlap generalizes via the same collapse
    + per-user type-set aggregation."""
    ev = tables.events(spark, sf_dir)
    a = ev.select("event_type", "user_id").distinct()
    sz = a.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    x = a.alias("x")
    y = a.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type1"),
            F.col("y.event_type").alias("type2"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    s1 = sz.select(F.col("event_type").alias("type1"), F.col("n").alias("n_type1"))
    s2 = sz.select(F.col("event_type").alias("type2"), F.col("n").alias("n_type2"))
    return (
        pairs.join(F.broadcast(s1), "type1")
        .join(F.broadcast(s2), "type2")
        .select(
            "type1",
            "type2",
            "n_both",
            "n_type1",
            "n_type2",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_type1") + F.col("n_type2") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
    )


@query(
    "agg_ks_test",
    oracle="""
WITH a AS (
  SELECT value FROM events
  WHERE event_type = 'click' AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
), b AS (
  SELECT value FROM events
  WHERE event_type = 'click' AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
), pooled AS (
  SELECT value, CAST(sum(in_a) AS BIGINT) AS ca,
         CAST(sum(in_b) AS BIGINT) AS cb FROM (
    SELECT value, 1 AS in_a, 0 AS in_b FROM a
    UNION ALL SELECT value, 0, 1 FROM b
  ) GROUP BY value
), cum AS (
  SELECT value,
         CAST(sum(ca) OVER (ORDER BY coalesce(value, '-infinity'::DOUBLE)
                            ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER (ORDER BY coalesce(value, '-infinity'::DOUBLE)
                            ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_b
  FROM pooled
), tot AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb)
SELECT CAST(na AS BIGINT) AS n_before, CAST(nb AS BIGINT) AS n_after,
       CAST(max(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS d_scaled,
       round(CAST(max(abs(cum_a * nb - cum_b * na)) AS DOUBLE)
             / (na * nb), 6) AS ks_d
FROM cum CROSS JOIN tot
GROUP BY na, nb
""",
)
def agg_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov distribution-drift statistic: did
    the click-value distribution change between the first and second
    half of the month? — the nonparametric drift test ML monitoring
    runs per feature per day. D = max |ECDF₁ − ECDF₂| is computed in
    INTEGER arithmetic (max |cum₁·n₂ − cum₂·n₁|, divided once at the
    end), so the statistic is bit-exact on both engines.

    Scale shape: pool the two samples with indicator columns, ONE
    combinable aggregate to per-value counts (distinct-value-sized, the
    only corpus pass), one ordered cumulative window over the distinct
    values, one max. At 100 TB per-feature drift runs this same plan
    per feature via grouping keys; for unbounded-cardinality features
    you'd bin first (the ts_drift_psi path) and keep everything else."""
    ev = tables.events(spark, sf_dir).where(F.col("event_type") == "click")
    cut = F.lit("2024-01-15").cast("timestamp")
    tagged = ev.select(
        "value",
        (F.col("ts") < cut).cast("long").alias("in_a"),
        (F.col("ts") >= cut).cast("long").alias("in_b"),
    )
    pooled = tagged.groupBy("value").agg(
        F.sum("in_a").alias("ca"), F.sum("in_b").alias("cb")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = pooled.select(
        "value",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = tagged.agg(
        F.sum("in_a").alias("na"), F.sum("in_b").alias("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.max(
                F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
            ).alias("d_scaled")
        )
        .select(
            F.col("na").alias("n_before"),
            F.col("nb").alias("n_after"),
            "d_scaled",
            # try_divide: one empty sample (na·nb = 0, e.g. a drift
            # window with no post-cut clicks) is NULL-ks on both
            # engines — DuckDB division by zero yields NULL, Spark's
            # ANSI `/` would abort the job instead
            F.round(
                F.try_divide(
                    F.col("d_scaled").cast("double"),
                    F.col("na") * F.col("nb"),
                ),
                6,
            ).alias("ks_d"),
        )
    )


@query(
    "agg_chi2_independence",
    oracle="""
WITH j AS (
  SELECT event_type, CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow
  FROM events
), cells AS (
  SELECT event_type, dow, CAST(count(*) AS DOUBLE) AS o FROM j GROUP BY 1, 2
), rx AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS r FROM j GROUP BY 1),
cx AS (SELECT dow, CAST(count(*) AS DOUBLE) AS c FROM j GROUP BY 1),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j)
SELECT round(sum((o - r * c / n) * (o - r * c / n) / (r * c / n)), 4)
         AS chi2,
       CAST((SELECT count(*) FROM rx WHERE event_type IS NOT NULL) - 1
            AS BIGINT)
         * CAST((SELECT count(*) FROM cx WHERE dow IS NOT NULL) - 1
                AS BIGINT) AS dof
FROM cells JOIN rx USING (event_type) JOIN cx USING (dow) CROSS JOIN tot
""",
)
def agg_chi2_independence(spark, sf_dir):
    """Chi-squared test of independence between event type and day of
    week — the categorical drift/association test beside
    ``agg_mutual_info`` (chi² gives the significance view, MI the
    information view). Observed and marginal counts are exact integers;
    the statistic sums |types|×7 identical IEEE cells (round 4, drift
    ~1e-12). NOTE both engines' dayofweek: Spark 1=Sunday, DuckDB
    0=Sunday — the oracle keys cells by DuckDB's own dow and Spark
    shifts to match (FIXTURES.md rule 5).

    Scale shape: one fact pass to cell counts (category-sized),
    marginals broadcast back, metadata-scale combination."""
    # NOT spread (round-14 A/B 1.51x WORSE): three groupBys re-execute
    # the frame, tripling the added exchange
    ev = tables.events(spark, sf_dir)
    j = ev.select(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    )
    cells = j.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rx = j.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("r"))
    cx = j.groupBy("dow").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = j.agg(F.count(F.lit(1)).cast("double").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    chi2 = F.round(
        F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp), 4
    )
    # dof from the SAME cell table, lazily — no eager .count() jobs at
    # plan-build time (two extra full scans per invocation otherwise)
    dof = (
        (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
    ).cast("long")
    return (
        cells.join(F.broadcast(rx), "event_type")
        .join(F.broadcast(cx), "dow")
        .crossJoin(F.broadcast(tot))
        .agg(chi2.alias("chi2"), dof.alias("dof"))
    )
