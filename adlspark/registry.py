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
# The driver verifies the first ~50 keys of queries(); everything here has
# either (a) no driver verdict at all yet (landed after the round-3 window
# filled at exactly 50), (b) code or output schema changed after its last
# green verdict, or (c) is new in round 4. Keys absent from this list keep
# their r1/r2/r3 verdicts because their code is unchanged; they rotate to
# the back of the queue.
#
# NOTE: CORRECTNESS_r03.json was never written to the repo by the driver,
# so the round-3 window (_ROUND3_FRONT in git history @71fc38f: the
# fixed-unverified trio, catalog keys, changed llm kernels, subq/setops/
# sorts/udf/stream families) carries no recorded external verdict either.
# Those 50 keys stay green in local parity at sf0.001 AND sf0.01 and were
# clean in the end-of-round full driver simulation (COVERAGE.md); the 39
# late-r3 keys below have had NO window slot at all, so they take priority.
# ROUND-5 TODO: if CORRECTNESS_r04 again lacks verdicts for the old
# _ROUND3_FRONT keys, re-front-load them in round 5.
_ROUND4_FRONT = [
    # (a) landed after the r3 window filled — first driver verdict now
    "ts_retention",
    "llm_dedup_canonical",
    "sink_csv_roundtrip",
    "fn_struct",
    "subq_any_all",
    "llm_pack_bins",
    "llm_contamination_check",
    "llm_repetition_filter",
    "llm_winnow_fingerprint",
    "llm_minhash_signature",
    "llm_bpe_pair_count",
    "llm_srp_bits",
    "llm_minhash_estimate",
    "lake_zorder_layout",
    "join_interval_bucketed",
    "llm_dsir_weight",
    "fn_url",
    "llm_entropy_filter",
    "ts_anomaly_zscore",
    "agg_mode",
    "join_asof_forward",
    "lake_merge_upsert",
    "llm_semantic_dedup",
    "llm_incremental_dedup",
    "llm_bigram_logprob",
    "ts_trend_slope",
    "llm_mixture_weights",
    "lake_profile_columns",
    "lake_schema_diff",
    "win_streak",
    "llm_url_dedup",
    "llm_prefix_dedup",
    "ts_seasonality",
    # (a) rows-only late-r3 keys (pytest-asserted invariants; the driver
    # records the weaker ran-without-error check)
    "stream_tumbling_ohlc",
    "stream_sliding_watermark",
    "llm_graph_pagerank",
    "llm_kmeans",
    "lake_compact_small_files",
    "agg_approx_percentile",
    # (b) the shared asof kernel gained the direction param in late r3, so
    # join_asof needs a fresh verdict despite its r1 green
    "join_asof",
    # (c) new / changed in round 4 — appended as the round progresses
    "agg_skew_kurt",
    "lake_scd2",
    "llm_substring_dedup",
    "llm_graph_triangles",
    "ts_ewma",
]


def _ordered(mapping: dict) -> dict:
    """Front-load _ROUND4_FRONT (in list order), then registration order."""
    front = {k: mapping[k] for k in _ROUND4_FRONT if k in mapping}
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
    front-loaded llm/multimodal/catalog/functions/timeseries; round 3
    covered the fixed-unverified and never-windowed backlog. Round 4's
    window is the explicit ``_ROUND4_FRONT`` list above (the 39 keys that
    landed after the r3 window filled, the rows-only late arrivals, and
    join_asof whose kernel changed), applied in ``_ordered`` — module
    import order below only decides the tail.
    """
    global _LOADED
    if _LOADED:
        return
    from adlspark.llm import dedup, similarity, text, multimodal, vocab  # noqa: F401
    from adlspark.llm import graph  # noqa: F401
    from adlspark.ops import (  # noqa: F401
        lake,
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
