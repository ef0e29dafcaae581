"""Mutation witnesses for the round-11 computed-oracle promotions.

A computed oracle is only worth its promotion if it actually PINS the
kernel's parameters and iteration structure — a green gate that would
stay green under a wrong kernel is decoration. Each test here runs a
deliberately mutated kernel (one fewer Lloyd round, a different MMR
lambda, a different IVF probe set) against the SHIPPED oracle and
requires the compare to FAIL, mirroring the repo's margin-narrowing
mutation checks in test_dup_density.
"""

from __future__ import annotations

import duckdb
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles
from adlspark.testing import compare


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in adl_tables.TABLES:
        c.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield c
    c.close()


def test_kmeans_oracle_pins_iteration_count(spark, sf_dir, con):
    """One fewer Lloyd round must hash-mismatch the 5-round oracle —
    the unrolled CTE chain really encodes the iteration structure."""
    from adlspark.llm.similarity import kmeans_fit

    df, _ = kmeans_fit(spark, sf_dir, k=8, iters=4)
    with pytest.raises(AssertionError):
        compare(df, con, all_oracles()["llm_kmeans"], key="llm_kmeans~mut")


def test_kmeans_oracle_pins_k(spark, sf_dir, con):
    from adlspark.llm.similarity import kmeans_fit

    df, _ = kmeans_fit(spark, sf_dir, k=7, iters=5)
    with pytest.raises(AssertionError):
        compare(df, con, all_oracles()["llm_kmeans"], key="llm_kmeans~mutk")


def test_mmr_oracle_pins_lambda(spark, sf_dir, con):
    """The repr'd lambda literals in the oracle must reject a kernel
    running a different relevance/diversity trade-off. The mutated
    SPARK side is simulated by mutating the ORACLE instead (same
    comparison, cheaper than re-running the greedy chain): a lambda
    flip changes picked ids/scores on the standard fixture."""
    from adlspark.llm.similarity import _mmr_oracle_sql, llm_mmr_diverse_sample

    df = llm_mmr_diverse_sample(spark, sf_dir)  # shipped kernel, lam=0.7
    with pytest.raises(AssertionError):
        compare(df, con, _mmr_oracle_sql(k=8, lam=0.5), key="llm_mmr~mut")
    # and the un-mutated oracle passes on the same collected frame
    compare(df, con, all_oracles()["llm_mmr_diverse_sample"], key="llm_mmr")


def test_frame_sample_oracle_pins_stride(spark, sf_dir, con):
    from adlspark.llm.multimodal import _frame_sample_oracle_sql, mm_frame_sample

    df = mm_frame_sample(spark, sf_dir)  # shipped kernel, stride=4
    with pytest.raises(AssertionError):
        compare(
            df, con, _frame_sample_oracle_sql(stride=2), key="mm_frame~mut"
        )
