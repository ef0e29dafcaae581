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
# State entering driver round 13 (recomputed 2026-08-16 with
# tools/verification_debt.py — the single source of truth):
#   - 258 registry keys; the 257 pre-existing ALL green at their latest
#     verdict, debt = 0, ZERO failed — r12 came back fully green
#     (50/50) and retired the r04 cohort. Oldest signal now: the 14
#     r05 keys, then the 17 r06 keys (VERDICT r12 item 1: retire both).
# Composition: 2 never-verified + 17 (b)-class re-entries + 14 r05 +
# 17 r06 = 50.
_VERIFY_WINDOW = [
    # (a) failed in the latest window: none (r12 fully green).
    # (c) never-verified: the round-13 self-dispatching near-dup ladder
    #   entry point (VERDICT r12 item 2) — routes the fixture's
    #   df-sparse shingle domain to the exact prefix rung, so the SQL
    #   oracle is the exact shingle join; sim HASH-PASSED at sf0.01 —
    #   and the per-domain quota curation step (skew-isolating
    #   over/under-cap split), sim HASH-PASSED at sf0.01 + sf0.001.
    "llm_near_dup_auto",
    "llm_domain_cap",
    # (b) code/oracle changed after the last green verdict — re-enter:
    #   1. llm_pca_power: round-13 promotion rows-only -> computed
    #      value oracle (VERDICT r12 item 4) — fixed-round power
    #      iteration with deflation replaced the eigensolver; the
    #      driver has never run the oracle form. Sim HASH-PASSED at
    #      sf0.01; mutation witness + empty/hostile gates in pytest.
    "llm_pca_power",
    #   2. stream_tumbling_ohlc: r12 ADVICE — the oracle's row_number
    #      partition key is now (user_id IS NULL, coalesce(user_id,-1))
    #      so a real -1 id can never share a sequence with NULL ids.
    "stream_tumbling_ohlc",
    #   3. The pair-expansion kernel change (VERDICT r12 item 5): the
    #      chunked expansion helpers now repartition by CONTENT HASH
    #      instead of round-robin (eliminating the map-side
    #      sortBeforeRepartition pass where the 10x dup-free rung's
    #      heap died), and the stress counters path materializes the
    #      candidate set DISK_ONLY. Same rows, different physical
    #      distribution — every key transitively using
    #      prefix_filter_pairs / chunked_self_pairs / chunked_cartesian
    #      / expand_member_pairs re-enters (AST closure over the llm
    #      modules, round-13 session):
    "llm_near_dup_pairs",
    "llm_ngram_jaccard",
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    "llm_dedup_minhash",
    "llm_dedup_editdist",
    "llm_minhash_estimate",
    "llm_containment_dedup",
    "llm_graph_triangles",
    "llm_ann_ivf",
    "llm_ann_ivf_pq",
    "llm_embed_near_dup",
    "llm_knn_graph",
    "llm_knn_label",
    "llm_sim_threshold_join",
    # (d) staleness rotation (VERDICT r12 item 1) — the full r05 cohort
    #   (14 keys, verification_debt.py ranking order):
    "ts_pattern_match",
    "ts_rolling_corr",
    "ts_attribution",
    "ts_burst_detect",
    "ts_active_users",
    "ts_drift_psi",
    "subq_in_multi",
    "join_asof_tolerance",
    "agg_corr_matrix",
    "agg_mutual_info",
    "agg_cohort_overlap",
    "agg_chi2_independence",
    "win_time_range",
    "stream_checkpoint_recovery",
    #   ...and the full r06 cohort (17 keys), leaving r07 as the oldest
    #   verdict anywhere after this window lands:
    "llm_dedup_exact",
    "llm_simhash",
    "llm_winnow_fingerprint",
    "llm_minhash_signature",
    "llm_incremental_dedup",
    "llm_prefix_dedup",
    "llm_dedup_bloom",
    "llm_paragraph_dedup",
    "llm_dedup_cross_source",
    "llm_vocab_coverage",
    "llm_temperature_sample",
    "llm_dataset_card",
    "lake_compact_small_files",
    "lake_vacuum_orphans",
    "join_theta_range",
    "agg_hll_partial_merge",
    "stream_hll_distinct",
    # Slot arithmetic: 2 new + 2 + 15 (b) + 14 r05 + 17 r06 = 50.
    # (The oldest-r07 fill slot went to llm_domain_cap; r07 rotates
    # in r14.)
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
