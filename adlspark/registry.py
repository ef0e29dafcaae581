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
# The driver verifies the first ~50 keys of queries() per round; keys
# absent from this list keep their existing verdicts because their code
# is unchanged, and rotate to the back of the queue.
#
# State entering driver round 11 (recomputed 2026-08-15 with
# tools/verification_debt.py — the single source of truth):
#   - 257 registry keys, ALL 257 carry a green latest verdict, debt =
#     0, ZERO failed — round 10 came back fully green (50/50). The
#     round-10 window spent nearly every slot on the decimal-swap
#     re-entries, so the r03/r04 staleness cohort (62 keys) is now the
#     oldest signal; VERDICT r10 item 1 makes retiring it THE r11 job.
# Composition: 4 code-changed re-entries/promotions + the entire r03
# cohort (34) + the 12 oldest r04 keys = 50. The 16 remaining r04
# keys and the r05 block rotate in r12.
#
# MANDATORY r12 (b)-class re-entries, recorded here at the moment the
# code changed (round-11 session 2, after this window was frozen): the
# mixed-dimension reference-dim guard rewrote load_embeddings +
# O_EMB_WHERE, touching the PLAN AND ORACLE of every vector kernel —
# llm_sim_topk, llm_sim_threshold_join, llm_knn_label,
# llm_embed_centroids, llm_multimodal_struct, llm_embed_near_dup,
# llm_embed_quantize, llm_srp_bits, llm_semantic_dedup,
# llm_hard_negative_mine, llm_knn_graph — and llm_kmeans,
# llm_mmr_diverse_sample, llm_ann_ivf, llm_ann_ivf_pq,
# mm_frame_sample, mm_binary_pipeline were promoted to computed value
# oracles with determinism-disciplined kernels (exact-decimal means,
# mirrored folds, hex-frame features, the PQ integer grid). All
# verified this session by full 257-key driver-sim sweeps at sf0.01 +
# targeted sims per change + the mixed-dim/edge/dup hostile gates +
# mutation witnesses + an sf0.1 sweep (BASELINE.md round-11 record),
# but the DRIVER's stamp is pre-change, so these 17 lead the r12
# window ahead of the r04/r05 staleness rotation. (llm_graph_pagerank's oracle gained
# intermediate BIGINT casts this session too — it is already in the
# r11 window below.)
_VERIFY_WINDOW = [
    # (a) failed in the latest window: none (r10 fully green).
    # (b) code changed this session after a green verdict — re-enter.
    #   stream_rate_limited_backfill: the ntile(8) staging frame is now
    #   materialized (localCheckpoint) before the per-bucket write loop
    #   so event_id ties/NULLs can't re-assign rows between loop
    #   evaluations (r11 ADVICE item; HASH-PASSED sf0.01 + sf0.001
    #   sims + tiny/empty corpus gates):
    "stream_rate_limited_backfill",
    #   rows-only -> COMPUTED value-oracle promotions (VERDICT r10
    #   item 2): the BPE trainer/encoder and the pagerank iteration
    #   are fixed-round deterministic corpus functions, unrolled into
    #   chained MATERIALIZED DuckDB CTEs (greedy merge == list_reduce
    #   fold; float op trees mirrored term by term). Kernel changes
    #   rode along: encode's NULL-text guard + >1000-char opaque-token
    #   cap + fertility 0-word NULL guard. All three HASH-PASSED
    #   sf0.01 + sf0.001 sims and the auto-enrolled hostile-corpus
    #   parity gates (null/unicode/edge/giant/empty docs):
    "llm_bpe_learn",
    "llm_bpe_encode",
    "llm_graph_pagerank",
    # (c) never-verified debt: none (first round with zero debt).
    # (d) staleness rotation — the ENTIRE r03 cohort, oldest verdicts
    #   in the registry (verification_debt.py ranking, list order):
    "fn_struct",
    "fn_url",
    "ts_gap_fill",
    "ts_funnel",
    "subq_in",
    "subq_exists_corr",
    "subq_lateral",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_intersect_all",
    "set_except_all",
    "sort_multi",
    "limit_topk",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_grouped_map",
    "udf_map_in_pandas",
    "udtf_python",
    "catalog_entries",
    "catalog_persistent",
    "join_asof",
    "agg_collect_sorted",
    "win_rank_dense",
    "win_first_last",
    "win_nth_value",
    "stream_tumbling_watermark",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_join",
    "stream_stateful_count",
    "stream_foreach_batch_upsert",
    "stream_transform_with_state",
    #   ...then the 12 oldest r04 keys:
    "llm_doc_chunk",
    "llm_unigram_logprob",
    "llm_stratified_sample",
    "llm_token_histogram",
    "llm_pack_bins",
    "llm_bigram_logprob",
    "llm_text_normalize",
    "lake_scd2",
    "lake_merge_upsert",
    "lake_profile_columns",
    "lake_schema_diff",
    "lake_time_travel",
    # Slot arithmetic: 4 (b) + 34 r03 + 12 r04 = 50.
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
