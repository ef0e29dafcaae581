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
# State entering driver round 12 (recomputed 2026-08-16 with
# tools/verification_debt.py — the single source of truth):
#   - 257 registry keys, ALL 257 green at their latest verdict, debt =
#     0, ZERO failed — r11 came back fully green (50/50) and retired
#     the r03 cohort. Oldest signal now: 16 r04 keys, then the r05
#     block (24).
# Composition: 18 (b)-class re-entries + 4 round-12 stream promotions
# + the 16 remaining r04 keys + the 12 oldest r05 keys = 50. The rest
# of r05 (12 keys) and the r06 block rotate in r13.
_VERIFY_WINDOW = [
    # (a) failed in the latest window: none (r11 fully green).
    # (b) code changed after the last green verdict — re-enter. Two
    #   changes this session, SAME key set:
    #   1. VERDICT r11 lead item — the 6 round-11 value-oracle
    #      promotions whose oracle form the driver has never run
    #      (llm_kmeans, llm_mmr_diverse_sample, llm_ann_ivf,
    #      llm_ann_ivf_pq, mm_frame_sample, mm_binary_pipeline) plus
    #      the 11 vector kernels whose plan+oracle the r11 mixed-dim
    #      reference-dim guard rewrote after their window froze.
    #   2. r11 ADVICE (round-12 session): the shared vector-domain
    #      guard (load_embeddings / O_EMB_WHERE, one edit point) now
    #      EXCLUDES null-element vectors on both engines, closing the
    #      NULL-vs-NaN oracle divergence on the promoted keys; this
    #      touches the same kernels/oracles again, plus rows-only
    #      llm_pca_power. All 18 HASH-PASSED (pca rows-only) a
    #      targeted sf0.01 driver sim after the guard change, and the
    #      null_elem hostile corpus now parity-sweeps every
    #      embedding-oracle key (tests/test_embed_robustness.py).
    "llm_kmeans",
    "llm_mmr_diverse_sample",
    "llm_ann_ivf",
    "llm_ann_ivf_pq",
    "mm_frame_sample",
    "mm_binary_pipeline",
    "llm_sim_topk",
    "llm_sim_threshold_join",
    "llm_knn_label",
    "llm_embed_centroids",
    "llm_multimodal_struct",
    "llm_embed_near_dup",
    "llm_embed_quantize",
    "llm_srp_bits",
    "llm_semantic_dedup",
    "llm_hard_negative_mine",
    "llm_knn_graph",
    "llm_pca_power",
    #   3. Round-12 rows-only -> value-oracle promotions (VERDICT r11
    #      item 5, target rows-only 18 -> <=14): the four stream keys
    #      whose availableNow/complete (or single-batch append) result
    #      is a pure corpus function — OHLC bars, sliding histogram,
    #      the attribution interval join, the drained per-user state.
    #      Each carries a mutation witness + empty-corpus gate and
    #      auto-enrolled in the hostile events corpora; all four
    #      HASH-PASSED sf0.01 + sf0.001 sims. (lake_compact_small_files
    #      / lake_vacuum_orphans were assessed and stay rows-only with
    #      the cause documented in their docstrings: physical file/byte
    #      stats are writer-environment functions.)
    "stream_tumbling_ohlc",
    "stream_sliding_watermark",
    "stream_stream_join",
    "stream_transform_with_state",
    # (c) never-verified debt: none.
    # (d) staleness rotation — the 16 remaining r04 keys (VERDICT r11
    #   item 2), verification_debt.py ranking order:
    "lake_cdc_diff",
    "lake_validate_rules",
    "lake_gdpr_delete",
    "ts_resample_ohlc",
    "ts_retention",
    "subq_not_in_null",
    "subq_any_all",
    "join_interval_bucketed",
    "join_asof_forward",
    "join_asof_nearest",
    "agg_mode",
    "agg_heavy_hitters_cms",
    "agg_median",
    "agg_first_last_by",
    "win_cume_pct",
    "win_streak",
    #   ...then the 16 oldest r05 keys:
    "llm_perplexity_bucket",
    "llm_soft_dedup_weight",
    "llm_ngram_novelty",
    "llm_cooccurrence_pmi",
    "llm_rouge_overlap",
    "llm_dsir_weight",
    "llm_mixture_weights",
    "lake_snapshot_rollback",
    "fn_unpivot",
    "fn_try_arith",
    #   (b)-class late re-entries (displacing the last two r05 slots,
    #   ts_pattern_match / ts_rolling_corr, to r13): the connected-
    #   components loop gained adaptive pointer doubling (round ≥ 4:
    #   label ← min(label, label[label]); O(log diameter) rounds on
    #   the chain-shaped graphs the dup-free rung exposed, same
    #   fixpoint — see llm_dedup_cluster). Both HASH-PASSED sf0.01 +
    #   sf0.001 sims after the change.
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    # Slot arithmetic: 18 (b) + 4 promotions + 16 r04 + 10 r05
    #   + 2 (b)-late = 50.
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
