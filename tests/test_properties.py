"""Property-based spot checks (SURVEY.md §5.4): randomized predicates and
window invariants, Spark vs DuckDB on the same fixtures."""

from __future__ import annotations

import operator

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables

_COLS = {
    "o_totalprice": st.floats(min_value=0, max_value=550000, allow_nan=False),
    "o_custkey": st.integers(min_value=0, max_value=2000),
}
_OPS = {
    ">": operator.gt,
    "<": operator.lt,
    ">=": operator.ge,
    "<=": operator.le,
}

predicate = st.tuples(
    st.sampled_from(sorted(_COLS)),
    st.sampled_from(sorted(_OPS)),
    st.data(),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate)
def test_random_filter_matches_duckdb(pred, spark, ddb, sf_dir):
    colname, opname, data = pred
    value = data.draw(_COLS[colname], label="value")
    o = tables.load(spark, sf_dir, "orders")
    spark_n = o.filter(_OPS[opname](F.col(colname), F.lit(value))).count()
    ddb_n = ddb.execute(
        f"SELECT count(*) FROM orders WHERE {colname} {opname} {value!r}"
    ).fetchone()[0]
    assert spark_n == ddb_n


def test_running_count_equals_row_number(spark, sf_dir):
    """Window-frame invariant: a running sum of 1s is row_number."""
    o = tables.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    df = o.select(
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("rc"),
    )
    assert df.filter(F.col("rn") != F.col("rc")).count() == 0


def test_dedup_is_minimal_and_subset(spark, sf_dir):
    """ts_dedup: exactly one survivor per (user, type, minute); survivors
    are a subset of the input."""
    from adlspark.ops.timeseries import ts_dedup

    out = ts_dedup(spark, sf_dir)
    groups = out.groupBy("user_id", "event_type", "minute_bucket").count()
    assert groups.filter(F.col("count") > 1).count() == 0
    ev_ids = {r.event_id for r in tables.events(spark, sf_dir).select("event_id").collect()}
    assert all(r.event_id in ev_ids for r in out.collect())


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_semi_anti_partition_customer(spark, sf_dir, how):
    """semi(J) ∪ anti(J) partitions the left table for any join pred."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    pred = c.c_custkey == o.o_custkey
    semi = c.join(o, pred, "left_semi").count()
    anti = c.join(o, pred, "left_anti").count()
    if how == "left_semi":
        assert semi + anti == c.count()
    else:
        assert anti == c.count() - semi
