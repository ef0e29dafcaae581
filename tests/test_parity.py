"""Parametrized parity test: every registry key with an oracle is compared
against DuckDB at the fixture sf (default sf0.001; set
ADLSPARK_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the driver's t2).
Rows-only keys are executed and checked for a stable non-erroring plan."""

from __future__ import annotations

import pytest

from adlspark import registry, testing

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()

ORACLE_KEYS = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, ddb, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    testing.compare(df, ddb, ORACLES[key], key=key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    rows = df.collect()
    assert df.schema is not None
    assert rows is not None
