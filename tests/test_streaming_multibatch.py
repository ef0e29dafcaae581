"""Multi-batch (maxFilesPerTrigger-forced) execution of the four
round-12 stream promotions — VERDICT r12 item 6.

The promoted value oracles were proven on the one-data-batch
availableNow shape (the harness default, pinned by
test_ssj_oracle_holds_on_directory_layout). The untested production
shape was the same kernels under forced micro-batch replay, where the
watermark advances BETWEEN batches and can drop late rows a
single-batch run keeps. Findings, pinned here:

- stream_tumbling_ohlc / stream_sliding_watermark: COMPLETE-mode
  aggregations with no watermark — state is never evicted and the sink
  holds the last batch's full state, so the full-corpus oracle holds
  under ANY batching. Proven multi-batch here.
- stream_transform_with_state (and its applyInPandasWithState fallback
  path): update-mode per-user counts are MONOTONE, and the kernel
  already folds the sink with max(n_events), so the final value equals
  the corpus count under any batching. Proven multi-batch here.
- stream_stream_join: append-mode inner join WITH watermarks — the one
  promotion whose oracle premise is genuinely single-batch. Under
  multi-batch replay of time-interleaved files the operative watermark
  races ahead of later files' old rows, which are dropped before the
  join; the result is a SUBSET of the oracle's matches (per-user
  counts bounded above by the oracle — exactly-once emission, no
  false matches). The oracle docstring documents this domain boundary;
  this test makes it executable.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from adlspark import tables as adl_tables
from adlspark import tables
from adlspark.streaming import streams

MULTI = {"ADLSPARK_STREAM_MAX_FILES": "1"}


@pytest.fixture(scope="module")
def mb_dir(tmp_path_factory, spark, sf_dir):
    """Events as a 4-part Spark-written directory, randomly (hence
    time-interleaved) split — each micro-batch spans the full event-time
    range, the adversarial shape for watermark advancement."""
    d = str(tmp_path_factory.mktemp("multibatch"))
    for t in adl_tables.TABLES:
        if t == "events":
            tables.load(spark, sf_dir, "events").repartition(4).write.parquet(
                os.path.join(d, "events.parquet")
            )
        else:
            shutil.copyfile(
                os.path.join(sf_dir, f"{t}.parquet"),
                os.path.join(d, f"{t}.parquet"),
            )
    return d


@pytest.fixture()
def force_multibatch():
    old = os.environ.get("ADLSPARK_STREAM_MAX_FILES")
    os.environ["ADLSPARK_STREAM_MAX_FILES"] = "1"
    yield
    # the SSJ test pops the var itself mid-test (single-batch re-run)
    if old is None:
        os.environ.pop("ADLSPARK_STREAM_MAX_FILES", None)
    else:
        os.environ["ADLSPARK_STREAM_MAX_FILES"] = old


def _data_batches():
    return [p for p in streams.LAST_QUERY_PROGRESS if p["numInputRows"] > 0]


def _ddb(d):
    con = duckdb.connect()
    for t in adl_tables.TABLES:
        src = (
            f"{d}/events.parquet/*.parquet"
            if t == "events"
            else f"{d}/{t}.parquet"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


@pytest.mark.parametrize(
    "key", ["stream_tumbling_ohlc", "stream_sliding_watermark",
            "stream_transform_with_state"]
)
def test_batching_invariant_keys_hold_oracle_multibatch(
    spark, mb_dir, force_multibatch, key
):
    """Complete-mode aggregates (no watermark, state never evicted) and
    the monotone max-folded stateful count must equal their full-corpus
    oracles under forced multi-batch replay — the same compare the
    driver runs, now across real batch boundaries."""
    from adlspark.registry import all_oracles, all_queries
    from adlspark.testing import compare

    df = all_queries()[key](spark, mb_dir)
    assert len(_data_batches()) >= 2, (
        key, [(p["batchId"], p["numInputRows"]) for p in streams.LAST_QUERY_PROGRESS]
    )
    con = _ddb(mb_dir)
    try:
        compare(df, con, all_oracles()[key], key=f"{key}~multibatch")
    finally:
        con.close()


def test_ssj_multibatch_is_a_subset_of_the_oracle(
    spark, mb_dir, force_multibatch
):
    """The stream-stream join under multi-batch replay: late rows behind
    the operative watermark are dropped pre-join, so every emitted match
    is a true oracle match (no false positives, exactly-once) and the
    per-user counts are bounded above by the single-batch oracle. This
    is the documented domain boundary of _ssj_oracle_sql, executable."""
    got = {
        r["user_id"]: r["n_attributed"]
        for r in streams.stream_stream_join(spark, mb_dir).collect()
    }
    assert len(_data_batches()) >= 2
    con = _ddb(mb_dir)
    try:
        want = dict(con.execute(streams._ssj_oracle_sql()).fetchall())
    finally:
        con.close()
    assert set(got) <= set(want), "multi-batch emitted a user the oracle lacks"
    for u, n in got.items():
        assert 0 < n <= want[u], (u, n, want[u])
    # the premise guard is real: the default (no env) single-batch run
    # on the same directory still matches the oracle exactly
    del os.environ["ADLSPARK_STREAM_MAX_FILES"]
    full = {
        r["user_id"]: r["n_attributed"]
        for r in streams.stream_stream_join(spark, mb_dir).collect()
    }
    assert len(_data_batches()) == 1
    assert full == want
