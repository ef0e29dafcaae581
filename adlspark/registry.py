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
# State entering driver round 14 (recomputed at the end of the round-14
# OPTIMIZATION pass with tools/verification_debt.py):
#   - 261 registry keys (259 entering the round + llm_curation_pipeline
#     + llm_ann_ivf_scaled, new this round); the 259 pre-existing ALL
#     green at their latest verdict, debt = 0, ZERO failed — r13 came
#     back fully green (50/50) and retired the r05+r06 cohorts.
#   - BUT round 14 was an optimization round and materially changed the
#     operator code behind ~44 keys (Arrow kernel rewrites, the
#     deterministic-quotient/lazy-checkpoint change, tables.spread
#     fan-outs, footer fast_count, the BPE trainer). The window rule
#     ranks (b) code-changed-since-last-verdict above (d) staleness, so
#     those keys re-enter ahead of the r07/r08 rotation VERDICT r13
#     item 1 asked for; the displaced green-and-unchanged r07/r08 keys
#     lead the r15 rotation instead. Every (b) key below is sim
#     HASH-PASS (or rows-only by its contract) at sf0.01 at this HEAD.
# Composition: 2 never-verified + 44 (b)-class re-entries + 4 r07 = 50.
_VERIFY_WINDOW = [
    # (a) failed in the latest window: none (r13 fully green).
    # (c) never-verified: the round-14 curation composition key and the
    #     trained-cell IVF (both sim HASH-PASS at sf0.01 + sf0.001):
    "llm_curation_pipeline",
    "llm_ann_ivf_scaled",
    # (b) code changed after the last green verdict — re-enter, most
    #     invasive change first. Arrow kernel rewrites:
    "llm_srp_bits",            # closure-coefficient int64 matmul
    "llm_semantic_dedup",      # same SRP kernel
    "llm_simhash",             # 16-way crossJoin -> one aggregate
    "llm_kmeans",              # Arrow assignment + fit checkpoint
    "llm_ann_ivf",             # _cells_assign
    "llm_ann_ivf_pq",          # block sizing / probe factoring (r14 s1)
    "llm_knn_graph",           # block sizing (r14 s1) + lazy quotient
    "llm_sim_threshold_join",  # block sizing + sorted/lazy quotient
    "llm_mmr_diverse_sample",  # Arrow round scorer
    "llm_near_dup_auto",       # sampled router diagnostic + quotient
    # the deterministic-quotient / lazy-checkpoint family:
    "llm_near_dup_pairs",
    "llm_ngram_jaccard",
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    "llm_dedup_minhash",       # + band melt fix
    "llm_minhash_estimate",
    "llm_dedup_editdist",
    "llm_incremental_dedup",
    "llm_containment_dedup",
    "llm_embed_near_dup",
    "llm_contamination_check",
    "llm_graph_pagerank",      # closed-form dangling mass + lazy g
    "llm_graph_triangles",     # checkpointed rep edges + quotient
    # BPE trainer/encoder changes:
    "llm_bpe_encode",
    "llm_bpe_learn",
    "llm_bpe_pair_count",
    # kmeans_fit consumers (embedding-frame checkpoint):
    "llm_embed_centroids",
    "llm_hard_negative_mine",
    # tables.spread fan-outs (single-task scan -> keyed repartition):
    "llm_minhash_signature",
    "llm_substring_dedup",     # also the r07 cohort's top entry
    "llm_winnow_fingerprint",
    "agg_stats",
    "agg_group_q1",
    "agg_skew_kurt",
    "agg_cube",
    "agg_median",
    "agg_heavy_hitters_cms",
    "fn_cast",
    "fn_math",
    "udf_python",              # also an r07 key
    # tables.fast_count (parquet-footer row counts):
    "llm_tfidf",
    "lake_snapshot_rollback",
    "lake_time_travel",
    "stream_rate_limited_backfill",
    # (d) staleness rotation — the r07 cohort's next keys by
    #     verification_debt.py ranking (the rest of r07 + all of r08
    #     are green and UNCHANGED; they lead the r15 rotation):
    "llm_fingerprint",
    "llm_quality_classifier",
    "llm_gopher_rules",
    "mm_phash_dedup",
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
