"""Structural lint on every oracle's DuckDB RESULT TYPES (no Spark needed).

The driver's value hash is typed: when DuckDB widens an aggregate —
``sum(BIGINT)`` → HUGEINT (arriving in Arrow as decimal128) — the hash
differs from Spark's int64 even for numerically identical values. That
exact class broke ``subq_not_in_null`` in round 3 (VERDICT r3 "What's
wrong" #1) despite SURVEY §5.3 rule 5 mandating ``CAST(... AS BIGINT)``.

This test makes the rule structural: every oracle is executed in DuckDB
at the fixture SF and every result column's type must be one Spark can
actually emit over these tables. HUGEINT/DECIMAL can ONLY appear through
DuckDB widening, which always means a missing cast in the oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from adlspark import registry
from adlspark.tables import TABLES

from tests.conftest import SF_DIR

ORACLES = registry.all_oracles()

# Types DuckDB produces only by implicit widening/its own numeric tower;
# Spark never emits these from our parquet schemas, so any appearance is
# a typed-hash mismatch waiting for a driver window.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def lint_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_result_types(key, lint_con):
    rel = lint_con.sql(ORACLES[key])
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(f in str(typ).upper() for f in _FORBIDDEN)
    ]
    assert not offenders, (
        f"[{key}] oracle emits DuckDB-widened types {offenders}; wrap the "
        "expression in CAST(... AS BIGINT/DOUBLE) per SURVEY §5.3 rule 5 — "
        "the driver's typed value-hash will not match Spark otherwise"
    )
