"""Central registry mapping SURVEY.md §2 keys to (query fn, oracle SQL).

Each operator module registers with the ``@query`` decorator::

    @query("agg_group_q1", oracle=\"\"\"SELECT ... \"\"\")
    def agg_group_q1(spark, sf_dir):
        return ...

``oracle=None`` marks a rows-only key (no SQL-expressible oracle; the
driver records the weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in _QUERIES:
            raise ValueError(f"duplicate registry key: {key}")
        _QUERIES[key] = fn
        if oracle is not None:
            _ORACLES[key] = oracle.strip()
        return fn

    return deco


# Keys the external harness must judge THIS round, most-urgent first.
# The driver verifies the first ~50 keys of queries() (CORRECTNESS_r01–r04
# each hold exactly 50 verdicts); keys absent from this list keep
# their existing verdicts because their code is unchanged, and rotate to
# the back of the queue.
#
# State entering driver round 6 (CORRECTNESS_r05 landed 50/50 green;
# recomputed 2026-08-14 with tools/verification_debt.py — the single
# source of truth for these numbers):
#   - 254 registry keys; 237 carry a verdict, ALL 237 green (0 failed).
#   - Debt = 17 never-verified keys: the 3 oracle keys displaced from
#     the r5 window by the changed-code re-entries, plus the 14
#     rows-only keys (no SQL-expressible oracle by §2 contract; each
#     carries a pytest property/parity bar instead).
# This window = exactly that debt, closing verification for the whole
# registry: CORRECTNESS_r06 green on these 17 ⇒ 254/254 driver-proven.
# Keys whose Spark code changes THIS session re-enter at the front per
# the standing invariant (the window holds 50, so there is ample room).
_VERIFY_WINDOW = [
    # (a) code changed this session after a green verdict — re-enter:
    #   ts_ewma — per-row Python recurrence loop replaced by the exact
    #     power-of-two-scaled np.cumsum evaluation (identical IEEE
    #     rounding sequence; pinned bit-exact vs the loop and vs DuckDB
    #     in tests/test_timeseries_exact.py).
    #   join_theta_range / stream_stream_join — banding.time_bucket now
    #     backtick-quotes the interpolated identifier (r5 ADVICE);
    #     analyzed plans verified identical modulo exprIds, re-entered
    #     anyway per the invariant.
    "ts_ewma",
    "join_theta_range",
    "stream_stream_join",
    # (b) the 3 oracle keys displaced from the r5 window
    "llm_vocab_coverage",
    "llm_temperature_sample",
    "llm_dataset_card",
    # (c) the 14 never-verified rows-only keys
    "llm_kmeans",
    "llm_ann_ivf_pq",
    "llm_pca_power",
    "llm_mmr_diverse_sample",
    "llm_bpe_learn",
    "llm_bpe_encode",
    "llm_graph_pagerank",
    "lake_compact_small_files",
    "lake_vacuum_orphans",
    "agg_approx_percentile",
    "agg_hll_partial_merge",
    "stream_tumbling_ohlc",
    "stream_sliding_watermark",
    "stream_hll_distinct",
]


def _ordered(mapping: dict) -> dict:
    """Front-load _VERIFY_WINDOW (in list order), then registration order."""
    front = {k: mapping[k] for k in _VERIFY_WINDOW if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in front}
    return {**front, **rest}


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every operator module exactly once so decorators run.

    Import order IS the driver's verification order: the external
    correctness harness processes the first ~50 registry keys per round, so
    keys that still lack a driver verdict register FIRST and keys that went
    green in a previous round rotate to the back of the queue.

    Round-1 window verified scans/filters/joins/aggs/windows; round 2
    front-loaded llm/multimodal/catalog/functions/timeseries. The current
    window is the explicit ``_VERIFY_WINDOW`` list above, applied in
    ``_ordered`` — module import order below only decides the tail.
    """
    global _LOADED
    if _LOADED:
        return
    from adlspark.llm import dedup, similarity, text, multimodal, vocab  # noqa: F401
    from adlspark.llm import graph  # noqa: F401
    from adlspark.ops import (  # noqa: F401
        lake,
        quality,
        functions,
        timeseries,
        subqueries,
        setops,
        sorts,
        udfs,
        scans,
        filters,
        joins,
        aggs,
        windows,
    )
    from adlspark.streaming import streams  # noqa: F401

    _LOADED = True
