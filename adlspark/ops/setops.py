"""§2 G — Set operations.

Spark plans UNION as a no-shuffle concat; DISTINCT/INTERSECT/EXCEPT
variants hash-shuffle on the full row — at 100 TB prefer pre-aggregated
keys (these queries operate on projected key columns for exactly that
reason).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


def _cust_keys(spark, sf_dir):
    return tables.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    )


def _supp_keys(spark, sf_dir):
    return tables.load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("name")
    )


@query(
    "set_union_all",
    oracle="""
SELECT c_custkey AS k, c_name AS name FROM customer
UNION ALL
SELECT s_suppkey AS k, s_name AS name FROM supplier
""",
)
def set_union_all(spark, sf_dir):
    return _cust_keys(spark, sf_dir).unionByName(_supp_keys(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nk FROM customer
UNION
SELECT s_nationkey AS nk FROM supplier
""",
)
def set_union_distinct(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = tables.load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
""",
)
def set_intersect(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = tables.load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
SELECT c_custkey AS k FROM customer WHERE c_acctbal > 8000
EXCEPT
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
""",
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct): high-balance customers who never placed a
    300k+ order."""
    c = (
        tables.load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .select(F.col("c_custkey").alias("k"))
    )
    o = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
    )
    return c.subtract(o)


@query(
    "set_intersect_all",
    oracle="""
SELECT c_nationkey AS nk FROM customer
INTERSECT ALL
SELECT s_nationkey AS nk FROM supplier
""",
)
def set_intersect_all(spark, sf_dir):
    """Bag intersect: nationkey appears min(#customers, #suppliers) times."""
    c = tables.load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = tables.load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersectAll(s)


@query(
    "set_except_all",
    oracle="""
SELECT o_custkey AS k FROM orders
EXCEPT ALL
SELECT c_custkey AS k FROM customer
""",
)
def set_except_all(spark, sf_dir):
    """Bag difference: each customer's order multiplicity minus one."""
    o = tables.load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = tables.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    return o.exceptAll(c)
