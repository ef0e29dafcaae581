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


# ROUND-4 TODO: the r3 window is exactly full (50), so the late-r3
# keys have NO driver verdict yet and MUST lead the round-4 front list:
# ts_retention, llm_dedup_canonical, sink_csv_roundtrip, fn_struct,
# subq_any_all, llm_pack_bins, llm_contamination_check,
# llm_repetition_filter, llm_winnow_fingerprint, llm_minhash_signature
# llm_bpe_pair_count, llm_srp_bits, llm_minhash_estimate,
# lake_zorder_layout, join_interval_bucketed, llm_dsir_weight,
# fn_url, llm_entropy_filter, ts_anomaly_zscore, agg_mode,
# join_asof_forward, lake_merge_upsert, llm_semantic_dedup,
# llm_incremental_dedup, llm_bigram_logprob, ts_trend_slope,
# llm_mixture_weights, lake_profile_columns, lake_schema_diff,
# win_streak, llm_url_dedup, llm_prefix_dedup, ts_seasonality (all green
# in local parity at sf0.001 and sf0.01 — NOTE the shared asof kernel
# gained the direction param in late r3, so join_asof also needs a
# fresh driver verdict despite its r1 green), plus the rows-only
# stream_tumbling_ohlc and stream_sliding_watermark (streaming/batch
# equivalence pytest-asserted),
# llm_graph_pagerank (rows-only; mass-conservation pytest-asserted),
# llm_kmeans (rows-only; inertia-monotonicity pytest-asserted)
# lake_compact_small_files (rows-only fs side effects;
# file-count/row-preservation pytest-asserted) and
# agg_approx_percentile (rows-only sketch, by design like
# agg_approx_distinct).
# After them: (a) any r3 window FAILURES, (b) every key whose code or
# output schema changes in round 4, (c) new keys — then rotate this
# list's survivors to the back.
#
# Keys the external harness must judge THIS round, most-urgent first.
# The driver verifies the first ~50 keys of queries(); everything here has
# either (a) a round-1 failure fixed since its last verdict, (b) code or
# output schema changed after its last green verdict, or (c) no driver
# verdict at all yet. Keys absent from this list keep their r1/r2 verdicts
# because their code is unchanged; they rotate to the back of the queue.
_ROUND3_FRONT = [
    # (a) failed r1, rewritten in r2, green locally — need external re-judge
    "agg_stats",
    "agg_collect_sorted",
    "win_rank_dense",
    # (b) changed after last verdict: catalog hashing distributed (r3),
    # search_tokens tokenization fixed (r3), output schema changed in r2
    "catalog_entries",
    "catalog_persistent",
    "catalog_search_tokens",
    # (b) changed in r3: pii email-regex escaping, prefix-filter kernel
    # gained the positional filter (near_dup_pairs + ngram_jaccard +
    # dedup_cluster share it), env-derived block count (threshold_join +
    # embed_near_dup share the block-matmul)
    "llm_pii_scrub",
    "llm_ngram_jaccard",
    "llm_near_dup_pairs",
    "llm_dedup_cluster",
    "llm_sim_threshold_join",
    "llm_embed_near_dup",
    # (d) NEW in round 3 — first driver verdict this round
    "llm_doc_chunk",
    "llm_unigram_logprob",
    "agg_histogram",
    "ts_resample_ohlc",
    "llm_stratified_sample",
    "llm_token_histogram",
    # (c) never in any driver window
    "subq_scalar",
    "subq_in",
    "subq_exists_corr",
    "subq_lateral",
    "subq_not_in_null",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_intersect_all",
    "set_except_all",
    "sort_multi",
    "limit_topk",
    "win_first_last",
    "win_nth_value",
    "win_cume_pct",
    "ts_gap_fill",
    "ts_funnel",
    "udf_python",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_grouped_map",
    "udf_map_in_pandas",
    "udtf_python",
    "stream_tumbling_watermark",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_join",
    "stream_stateful_count",
    "stream_foreach_batch_upsert",
    "stream_transform_with_state",
    "stream_stream_join",
]


def _ordered(mapping: dict) -> dict:
    """Front-load _ROUND3_FRONT (in list order), then registration order."""
    front = {k: mapping[k] for k in _ROUND3_FRONT if k in mapping}
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
    front-loaded llm/multimodal/catalog/functions/timeseries. Round 3's
    window is now driven by the explicit ``_ROUND3_FRONT`` list above
    (fixed-unverified keys, keys changed since their last verdict, and the
    32 never-windowed keys), applied in ``_ordered`` — module import order
    below only decides the tail.
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
