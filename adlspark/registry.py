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
# State entering driver round 5 (CORRECTNESS_r04 landed; recomputed
# 2026-08-14 with tools/verification_debt.py — the single source of
# truth for these numbers, per the r4 ADVICE on bookkeeping drift):
#   - 254 registry keys; 190 carry a verdict, ALL 190 green (0 failed).
#   - Debt = 64 never-verified keys: 50 with oracles + 14 rows-only.
# This 50-key window = the 3 keys whose code changed THIS session after
# a green verdict (re-enter per the standing invariant):
#   - join_theta_range / stream_stream_join — banded-join bucket now
#     exact integer `div` instead of double division + cast('long')
#     (r4 ADVICE: FP rounding could drop a boundary pair);
#   - llm_sim_threshold_join — kernel rounding switched from np.round
#     (ties-to-even) to np_round_half_away (DuckDB's ties-away policy,
#     r4 ADVICE) — llm_knn_graph got the same fix but is in the debt
#     list below anyway;
# + 47 of the 50 never-verified oracle keys.
#
# Oracle-only CAST hardening (this session, NOT re-entered): the widened
# intermediate-CTE lint (tests/test_oracle_types.py, r4 verdict #5)
# flagged 15 oracles whose WITH-clause columns carried DuckDB-widened
# HUGEINT; all 15 got in-CTE CAST(... AS BIGINT). Ten of them are
# verified green (r2–r4). They do NOT re-enter the window because the
# change is provably observation-equivalent: old and new oracle were run
# side-by-side in DuckDB at sf0.001 AND sf0.01 and produced byte-
# identical Arrow results (same schema, same values) — the driver would
# record the exact same hash — and the targeted sim re-passed all 15
# against the NEW oracles at both SFs. The Spark side is untouched.
#
# The 3 displaced oracle
# keys (llm_dataset_card, llm_vocab_coverage, llm_temperature_sample —
# simple deterministic aggregations, pytest-green, lowest spillover
# risk) close out in round 6 alongside the 14 rows-only keys
# (llm_kmeans, llm_ann_ivf_pq, llm_pca_power, llm_mmr_diverse_sample,
# llm_bpe_learn, llm_bpe_encode, llm_graph_pagerank,
# lake_compact_small_files, lake_vacuum_orphans, agg_approx_percentile,
# agg_hll_partial_merge, stream_tumbling_ohlc, stream_sliding_watermark,
# stream_hll_distinct) — 17 keys, well inside one window.
_VERIFY_WINDOW = [
    # (a) code changed this session after a green verdict — re-enter
    "join_theta_range",
    "stream_stream_join",
    "llm_sim_threshold_join",
    # (b) never-verified: lake write-path + stream recovery (front-
    # loaded per the r4 verdict — the sim exercises these paths least)
    "lake_dynamic_partition_overwrite",
    "lake_snapshot_rollback",
    "lake_write_audit_publish",
    "stream_checkpoint_recovery",
    "ingest_csv_malformed",
    # (b) never-verified: drift / statistics
    "ts_drift_psi",
    "agg_ks_test",
    "agg_chi2_independence",
    "agg_corr_matrix",
    "agg_mutual_info",
    "agg_cohort_overlap",
    "agg_grouping_flags",
    # (b) never-verified: joins / subqueries / functions / windows
    "join_star_schema",
    "join_bloom_filtered",
    "join_asof_tolerance",
    "subq_corr_scalar_agg",
    "subq_in_multi",
    "fn_unpivot",
    "fn_higher_order",
    "fn_try_arith",
    "win_distinct_running",
    "win_time_range",
    # (b) never-verified: timeseries analytics tail
    "ts_autocorr",
    "ts_rolling_median",
    "ts_pattern_match",
    "ts_cusum_changepoint",
    "ts_rolling_corr",
    "ts_outlier_mad",
    "ts_attribution",
    "ts_burst_detect",
    "ts_active_users",
    "ts_forecast_naive",
    "ts_velocity_features",
    "ts_event_paths",
    # (b) never-verified: LLM-pipeline oracle keys
    "llm_dedup_editdist",
    "llm_dedup_cross_source",
    "llm_containment_dedup",
    "llm_hard_negative_mine",
    "llm_knn_graph",
    "llm_perplexity_bucket",
    "llm_soft_dedup_weight",
    "llm_ngram_novelty",
    "llm_cooccurrence_pmi",
    "llm_rouge_overlap",
    "llm_bpe_pair_count",
    "llm_dsir_weight",
    "llm_mixture_weights",
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
