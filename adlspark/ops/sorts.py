"""§2 F — Sorts, limits, top-k.

The driver's comparison is order-insensitive, so sort order is *exposed as
data* via row_number over the same ordering. Scale note: a global
`orderBy` is a range-partitioned sort (sampled boundaries) — fine at any
scale; the global-window row_number used to expose the order collapses to
one partition, which is the test-surface trade-off, not the production
shape (production keeps the sort partitioned and never materializes a
global rank). `orderBy().limit(k)` compiles to TakeOrderedAndProject —
per-partition top-k heaps + driver merge, no global sort, the right shape
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


@query(
    "sort_multi",
    oracle="""
SELECT c_custkey, seg, c_acctbal,
       row_number() OVER (
         ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC
       ) AS rn
FROM (
  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
  FROM customer
) t
""",
)
def sort_multi(spark, sf_dir):
    """Multi-key sort with explicit NULL placement (Spark ASC default is
    NULLS FIRST, DuckDB's is NULLS LAST — both sides are explicit)."""
    c = tables.load(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg"),
        "c_acctbal",
    )
    w = Window.orderBy(
        F.col("seg").asc_nulls_first(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )
    return t.withColumn("rn", F.row_number().over(w).cast("long"))


@query(
    "limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
)
def limit_topk(spark, sf_dir):
    """Global top-k with unique tiebreak → TakeOrderedAndProject."""
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )
