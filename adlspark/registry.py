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
# The driver verifies the first ~50 keys of queries() (CORRECTNESS_r01/r02/
# r03 each hold exactly 50 verdicts); keys absent from this list keep
# their existing verdicts because their code is unchanged, and rotate to
# the back of the queue.
#
# State entering driver round 4 (CORRECTNESS_r03 landed; computed with
# tools/verification_debt.py):
#   - 204 registry keys; 144 have verdicts, 143 green.
#   - 1 FAILED r03: subq_not_in_null (oracle HUGEINT widening — fixed
#     this round with CAST ... AS BIGINT; VERDICT r3 "What's wrong" #1).
#   - 60 keys have never been in a window; exactly 11 of them are
#     rows-only (cannot hash-fail, only rows>0).
# This 50-key window = the failed key + the changed-code keys
# (subq_not_in_null oracle cast; join_asof_nearest integer-µs tie-break;
# mm_phash_dedup char-based stub; join_theta_range + stream_stream_join
# banded hot-key range joins; llm_graph_triangles quotient rewrite) +
# the never-verified oracle keys, minus two deferrals noted below.
#
# ROUND-5 TODO (recomputed at end of the round-4 continuation session,
# 2026-08-14, via tools/verification_debt.py): 246 keys, 144 with
# verdicts; the r04 window below covers 50 (every one locally
# driver-sim green this session, including the r03-failed
# subq_not_in_null). Remaining debt after r04 lands = 52 keys:
#   - 49 oracle keys — the r3-tail and r4-session additions that did
#     not fit this window, plus llm_dsir_weight and llm_mixture_weights
#     (deferred to admit the changed banded-join keys)
#     (llm_perplexity_bucket, llm_soft_dedup_weight, llm_ngram_novelty,
#     llm_vocab_coverage, llm_rouge_overlap, ts_pattern_match,
#     ts_cusum_changepoint, ts_rolling_corr, ts_outlier_mad,
#     ts_attribution, ts_burst_detect, ts_active_users,
#     ts_forecast_naive, join_star_schema, join_bloom_filtered,
#     join_asof_tolerance, agg_corr_matrix/mutual_info/cohort_overlap,
#     agg_grouping_flags, fn_unpivot, fn_higher_order,
#     win_distinct_running, win_time_range, subq_corr_scalar_agg,
#     ingest_csv_malformed, lake_dynamic_partition_overwrite,
#     lake_snapshot_rollback, stream_checkpoint_recovery,
#     lake_write_audit_publish, ts_velocity_features, ts_event_paths,
#     fn_try_arith, agg_ks_test, agg_chi2_independence, ts_drift_psi,
#     subq_in_multi,
#     llm_dedup_editdist/cross_source/containment, ts_autocorr,
#     ts_rolling_median, llm_hard_negative_mine, llm_temperature_sample,
#     llm_cooccurrence_pmi, llm_knn_graph, llm_dataset_card)
#   - 14 rows-only keys (cannot hash-fail; each carries a falsifiable
#     pytest bar): llm_kmeans, llm_ann_ivf_pq, llm_pca_power,
#     llm_mmr_diverse_sample, llm_bpe_learn, llm_bpe_encode,
#     llm_graph_pagerank, lake_compact_small_files, lake_vacuum_orphans,
#     agg_approx_percentile, agg_hll_partial_merge, stream_tumbling_ohlc,
#     stream_sliding_watermark, stream_hll_distinct
# Round-5 plan: front-load the 49 oracle keys + any r04 failure +
# any changed-code key, then as many rows-only keys as fit; the ~2
# spillover rows-only keys close out in round 6.
_VERIFY_WINDOW = [
    # (a) FAILED r03 (oracle type widening), fixed this round
    "subq_not_in_null",
    # (b) code changed this round after/without a green verdict
    "join_asof_nearest",
    "mm_phash_dedup",
    "join_theta_range",
    "stream_stream_join",
    "win_cume_pct",
    # (c) never-verified: joins/subqueries
    "join_asof_forward",
    "join_dpp_prune",
    "join_interval_bucketed",
    "subq_any_all",
    # (c) never-verified: aggregate tail
    "agg_median",
    "agg_mode",
    "agg_histogram",
    "agg_skew_kurt",
    "agg_first_last_by",
    "agg_heavy_hitters_cms",
    # (c) never-verified: window/sort tail
    "win_streak",
    "sink_csv_roundtrip",
    # (c) never-verified: timeseries tail
    "ts_ewma",
    "ts_interpolate",
    "ts_resample_ohlc",
    "ts_retention",
    "ts_anomaly_zscore",
    "ts_seasonality",
    "ts_trend_slope",
    # (c) never-verified: lakehouse identity layer
    "lake_merge_upsert",
    "lake_time_travel",
    "lake_scd2",
    "lake_cdc_diff",
    "lake_validate_rules",
    "lake_ri_check",
    "lake_gdpr_delete",
    "lake_zorder_layout",
    "lake_profile_columns",
    "lake_schema_diff",
    # (c) never-verified: LLM-pipeline oracle keys
    "llm_winnow_fingerprint",
    "llm_minhash_estimate",
    "llm_dedup_bloom",
    "llm_paragraph_dedup",
    "llm_srp_bits",
    "llm_doc_chunk",
    "llm_unigram_logprob",
    "llm_bigram_logprob",
    "llm_stratified_sample",
    "llm_token_histogram",
    "llm_pack_bins",
    "llm_quality_classifier",
    "llm_text_normalize",
    "llm_gopher_rules",
    # llm_bpe_pair_count / llm_dsir_weight / llm_mixture_weights
    # deferred to round 5 to make room for the changed-code keys (the
    # banded joins and the decimal-guard-rounded win_cume_pct); the
    # window must stay at the driver's ~50-key budget, and all three
    # deferred keys are code-stable and pytest-green.
    "llm_graph_triangles",
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
