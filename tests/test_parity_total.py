"""Unit bars for the TOTAL decimal-exact-sum helpers (round 9).

The round-10 swap (dsum -> dsum_total across ~35 kernels) rests on the
claim that Spark's try_cast and the isnan-guarded DuckDB TRY_CAST agree
value-by-value on every IEEE extreme. These tests pin that matrix
directly, plus end-to-end sum/avg parity over a corpus containing the
extremes — so the swap round inherits a proven foundation instead of
re-deriving it.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import Row

from adlspark.ops.parity import (
    davg_total,
    dsum_total,
    o_davg_total,
    o_dsum_total,
)

EXTREMES = [
    ("nan", float("nan")),
    ("pos_inf", float("inf")),
    ("neg_inf", float("-inf")),
    ("neg_zero", -0.0),
    ("dbl_max", 1.7976931348623157e308),
    ("denormal", 5e-324),
    ("plain", 2.5),
    ("null", None),
]


@pytest.fixture(scope="module")
def extreme_df(spark):
    return spark.createDataFrame(
        [Row(tag=t, v=v) for t, v in EXTREMES], "tag string, v double"
    )


def test_total_sum_excludes_non_representables(spark, extreme_df):
    # representable survivors: -0.0 (=0), denormal (=0), 2.5 -> sum 2.5
    got = extreme_df.agg(dsum_total("v").alias("s")).collect()[0].s
    assert got == 2.5


def test_total_avg_counts_representables_only(spark, extreme_df):
    # 3 representable values (0, 0, 2.5) -> avg 2.5/3
    got = extreme_df.agg(davg_total("v").alias("a")).collect()[0].a
    assert got == round(2.5 / 3, 6)


def test_oracle_total_sum_and_avg_match_spark(spark, extreme_df):
    con = duckdb.connect()
    try:
        vals = ", ".join(
            "(" + ("'" + t + "', " + (
                "NULL" if v is None else f"'{v}'::DOUBLE" if not math.isfinite(v)
                else repr(v)
            )) + ")"
            for t, v in EXTREMES
        )
        con.execute(f"CREATE VIEW x AS SELECT * FROM (VALUES {vals}) t(tag, v)")
        o_sum, o_avg = con.execute(
            f"SELECT {o_dsum_total('v')}, {o_davg_total('v')} FROM x"
        ).fetchone()
    finally:
        con.close()
    row = extreme_df.agg(
        dsum_total("v").alias("s"), davg_total("v").alias("a")
    ).collect()[0]
    assert o_sum == row.s == 2.5
    assert o_avg == row.a == round(2.5 / 3, 6)


def test_oracle_isnan_guard_is_null_safe():
    # isnan(NULL) is NULL -> CASE falls to ELSE -> TRY_CAST(NULL) -> NULL;
    # without the guard DuckDB TRY_CAST(NaN AS DECIMAL) raises instead of
    # yielding NULL (the engine seam the guard exists for)
    con = duckdb.connect()
    try:
        (ok,) = con.execute(
            f"SELECT {o_dsum_total('v')} FROM (VALUES (NULL::DOUBLE)) t(v)"
        ).fetchone()
        assert ok is None
        with pytest.raises(duckdb.Error):
            con.execute(
                "SELECT sum(TRY_CAST(v AS DECIMAL(38,6)))"
                " FROM (VALUES ('NaN'::DOUBLE)) t(v)"
            ).fetchone()
    finally:
        con.close()


def test_total_equals_plain_on_representable_domain(spark):
    """On in-domain data (every current fixture) the total variants are
    bit-identical to the plain ones — the property that makes the
    round-10 swap observation-equivalent outside the hostile corpora."""
    from adlspark.ops.parity import davg, dsum

    df = spark.range(1, 1000).selectExpr(
        "cast(id as double) / 7 as v"
    )
    row = df.agg(
        dsum("v").alias("p_s"),
        dsum_total("v").alias("t_s"),
        davg("v").alias("p_a"),
        davg_total("v").alias("t_a"),
    ).collect()[0]
    assert row.p_s == row.t_s
    assert row.p_a == row.t_a
