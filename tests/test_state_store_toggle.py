"""State-store provider toggle + capacity rule (round 10, VERDICT item
10 of round 9): the hot-key ladder measured the default HDFSBacked
provider's GB-state cliff (100x dedup 233-246 s vs 53.5 s on RocksDB)
and BASELINE.md documented the deployment rule; these gates turn that
guidance into executable configuration.

Three bars:
1. the ADLSPARK_STATE_STORE=rocksdb env toggle injects the RocksDB
   providerClass into both the builder conf set (session_confs) and
   the external-session path (configure) — and stays absent otherwise,
   because HDFSBacked is FASTER below ~100 MB state/partition;
2. the capacity rule recommends the provider switch exactly at the
   measured per-partition heap bound;
3. provider EQUIVALENCE: the same watermarked streaming dedup produces
   identical results under both providers (the provider moves state
   bytes, never semantics) — and the RocksDB run actually selects the
   provider (asserted via the query's runtime conf).
"""

from __future__ import annotations

import os

import pytest

from adlspark.session import (
    ROCKSDB_PROVIDER,
    STATE_HEAP_BYTES_PER_PARTITION,
    recommended_state_store,
    session_confs,
)

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def test_toggle_injects_rocksdb_provider(monkeypatch):
    monkeypatch.setenv("ADLSPARK_STATE_STORE", "rocksdb")
    assert session_confs()[PROVIDER_KEY] == ROCKSDB_PROVIDER


def test_default_stays_on_heap_provider(monkeypatch):
    monkeypatch.delenv("ADLSPARK_STATE_STORE", raising=False)
    assert PROVIDER_KEY not in session_confs()
    monkeypatch.setenv("ADLSPARK_STATE_STORE", "default")
    assert PROVIDER_KEY not in session_confs()


def test_configure_applies_toggle_to_external_session(spark, monkeypatch):
    """The driver hands its OWN session to entry(); the deployment
    toggle must reach it through configure()'s runtime conf path."""
    from adlspark.session import configure

    prev = spark.conf.get(PROVIDER_KEY, None)
    try:
        monkeypatch.setenv("ADLSPARK_STATE_STORE", "rocksdb")
        configure(spark)
        assert spark.conf.get(PROVIDER_KEY) == ROCKSDB_PROVIDER
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_KEY)
        else:
            spark.conf.set(PROVIDER_KEY, prev)
        monkeypatch.delenv("ADLSPARK_STATE_STORE", raising=False)
        configure(spark)


def test_capacity_rule_switches_at_measured_bound():
    # comfortably under: 32 partitions x 100 MB bound = 3.2 GB total
    assert recommended_state_store(1 << 30, 32) == "default"
    # the measured cliff shape: 1.8 GB of state on FEW partitions
    assert recommended_state_store(1_800_000_000, 8) == "rocksdb"
    # exactly at the bound stays default (the bound is heap-comfort,
    # not a hard ceiling)
    assert (
        recommended_state_store(STATE_HEAP_BYTES_PER_PARTITION * 4, 4)
        == "default"
    )
    assert recommended_state_store(0, 0) == "default"  # no /0


def test_dedup_semantics_provider_invariant(spark, sf_dir):
    """stream_dedup_watermark under each provider INSIDE one test:
    identical results, and the RocksDB run demonstrably selected the
    provider. (Was two parametrized instances stashing results in a
    module global — `pytest -k rocksdb`, reordering, or xdist would
    silently skip the comparison; round-11 ADVICE.)"""
    from adlspark.registry import all_queries

    def run(provider: str):
        prev = spark.conf.get(PROVIDER_KEY, None)
        try:
            if provider == "rocksdb":
                spark.conf.set(PROVIDER_KEY, ROCKSDB_PROVIDER)
                assert spark.conf.get(PROVIDER_KEY) == ROCKSDB_PROVIDER
            elif prev is not None:
                spark.conf.unset(PROVIDER_KEY)
            return sorted(
                tuple(r)
                for r in all_queries()["stream_dedup_watermark"](
                    spark, sf_dir
                ).collect()
            )
        finally:
            if prev is None:
                try:
                    spark.conf.unset(PROVIDER_KEY)
                except Exception:
                    pass
            else:
                spark.conf.set(PROVIDER_KEY, prev)

    on_heap = run("default")
    on_rocks = run("rocksdb")
    assert on_heap, "dedup stream produced no rows"
    assert on_heap == on_rocks
