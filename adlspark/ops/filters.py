"""§2 B — Projections, filters, predicates.

All predicates here are sargable by design: Catalyst pushes them into the
parquet scan (`PushedFilters` in explain), so at 100 TB these become
row-group / page skips, not post-scan filters. Projections prune columns
at the reader (`ReadSchema`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


@query(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 6) AS revenue,
       concat_ws('|', l_returnflag, l_linestatus) AS flag_status
FROM lineitem
""",
)
def project_compute(spark, sf_dir):
    """Computed-column projection. A single multiply of identical doubles
    is bit-identical across engines; round(6) is belt-and-braces."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "revenue"
        ),
        F.concat_ws("|", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@query(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 100000 AND 400000
  AND NOT o_orderstatus = 'P'
  AND o_orderpriority LIKE '%-%'
""",
)
def filter_pred(spark, sf_dir):
    """Compound predicate — AND/NOT/IN/BETWEEN/LIKE, all parquet-pushable."""
    o = tables.load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 400000)
        & ~(F.col("o_orderstatus") == "P")
        & F.col("o_orderpriority").like("%-%")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "filter_null_3vl",
    oracle="""
SELECT o_orderkey,
       nullif(o_orderstatus, 'P') AS st,
       (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM
        nullif(o_orderpriority, '5-LOW')) AS nsafe_eq,
       (nullif(o_orderstatus, 'P') IS NULL) AS st_is_null
FROM orders
WHERE nullif(o_orderstatus, 'P') IS NULL
   OR nullif(o_orderstatus, 'P') = 'F'
""",
)
def filter_null_3vl(spark, sf_dir):
    """Three-valued logic: fixtures are NULL-free, so NULLs are minted with
    nullif; exercises IS NULL and null-safe equality (<=>)."""
    o = tables.load(spark, sf_dir, "orders")
    st = F.expr("nullif(o_orderstatus, 'P')")
    pr = F.expr("nullif(o_orderpriority, '5-LOW')")
    return o.select(
        "o_orderkey",
        st.alias("st"),
        st.eqNullSafe(pr).alias("nsafe_eq"),
        st.isNull().alias("st_is_null"),
    ).filter(st.isNull() | (st == "F"))


@query(
    "distinct_rows",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
""",
)
def distinct_rows(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Config-driven filtering: the engine-side analogue of the reference's
# per-source validation rules (DataSources config → predicate). The rule
# compiler turns a JSON-able rule list into one Catalyst Column, so rules
# stay declarative and pushdown-eligible.
# ---------------------------------------------------------------------------

_OPS = {
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "in": lambda c, v: c.isin(*v),
    "like": lambda c, v: c.like(v),
    "between": lambda c, v: c.between(v[0], v[1]),
}


def compile_rules(rules: list[dict]) -> Column:
    """AND-combine a list of {'col','op','value'} rules into one Column."""
    col = None
    for r in rules:
        term = _OPS[r["op"]](F.col(r["col"]), r["value"])
        col = term if col is None else (col & term)
    return col if col is not None else F.lit(True)


def apply_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    return df.where(compile_rules(rules))


_DEMO_RULES = [
    {"col": "p_type", "op": "in", "value": ["PROMO", "ECONOMY"]},
    {"col": "p_size", "op": "between", "value": [5, 40]},
    {"col": "p_retailprice", "op": ">=", "value": 900.0},
    {"col": "p_name", "op": "like", "value": "%bolt%"},
]


@query(
    "filter_dynamic_rule",
    oracle="""
SELECT p_partkey, p_name, p_type, p_size, p_retailprice
FROM part
WHERE p_type IN ('PROMO', 'ECONOMY')
  AND p_size BETWEEN 5 AND 40
  AND p_retailprice >= 900.0
  AND p_name LIKE '%bolt%'
""",
)
def filter_dynamic_rule(spark, sf_dir):
    """Predicate assembled from a config dict (per-source rule config)."""
    p = tables.load(spark, sf_dir, "part")
    return apply_rules(p, _DEMO_RULES).select(
        "p_partkey", "p_name", "p_type", "p_size", "p_retailprice"
    )
