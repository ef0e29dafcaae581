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
# State entering driver round 14 (recomputed 2026-08-16 with
# tools/verification_debt.py — the single source of truth):
#   - 261 registry keys (259 entering the round + llm_curation_pipeline
#     + llm_ann_ivf_scaled, new this round); the 259 pre-existing ALL
#     green at their latest verdict, debt = 0, ZERO failed — r13 came
#     back fully green (50/50) and retired the r05+r06 cohorts. Oldest
#     signal now: the 13 r07 keys, then the 33 r08 keys (VERDICT r13
#     item 1: rotate both).
# Composition: 2 never-verified + 5 (b)-class re-entries + 13 r07 +
# 30 r08 = 50.
_VERIFY_WINDOW = [
    # (a) failed in the latest window: none (r13 fully green).
    # (c) never-verified: the round-14 curation composition key
    #   (VERDICT r13 item 5) — exact dedup -> Gopher-lite gate ->
    #   domain cap -> md5-bucket split as one dataflow, full value
    #   oracle; sim HASH-PASSED at sf0.01 + sf0.001 —
    "llm_curation_pipeline",
    #   and the trained-√N-cell IVF (the deployment form the round-14
    #   vector stress rungs showed fixed-cell IVF needs): dynamic-k
    #   Lloyd trainer + the shared _ivf_probe_search, dynamic-LIMIT
    #   unrolled-CTE oracle, mutation-witnessed (iters, k); sim
    #   HASH-PASSED at sf0.01 + sf0.001.
    "llm_ann_ivf_scaled",
    # (b) code changed after the last green verdict — re-enter:
    #   llm_near_dup_auto: the router diagnostic gained a sampled
    #   regime above NEAR_DUP_SAMPLE_DOCS (VERDICT r13 item 4). Driver
    #   fixtures sit far below the threshold so the routed plan is
    #   bit-identical, but the dispatch code changed; sim HASH-PASSED
    #   at sf0.01 after the change.
    "llm_near_dup_auto",
    #   ...and the four ANN keys the round-14 block-sizing change /
    #   _ivf_probe_search factoring touched (fixture plans are
    #   bit-identical — B stays 8 below ~16k uniques and the factored
    #   search is expression-for-expression — but the code changed, so
    #   by the window rule they re-enter; all sim HASH-PASSED at
    #   sf0.01 after the change):
    "llm_knn_graph",
    "llm_sim_threshold_join",
    "llm_ann_ivf_pq",
    "llm_ann_ivf",
    # (d) staleness rotation (VERDICT r13 item 1) — the full r07 cohort
    #   (13 keys, verification_debt.py ranking order):
    "llm_fingerprint",
    "llm_substring_dedup",
    "llm_quality_classifier",
    "llm_gopher_rules",
    "mm_phash_dedup",
    "fn_json",
    "fn_map",
    "ts_event_paths",
    "udf_python",
    "scan_project",
    "agg_approx_percentile",
    "agg_ks_test",
    "win_distinct_running",
    #   ...the r08 cohort (30 of its 33 keys — the window holds 50):
    "llm_contamination_check",
    "lake_zorder_layout",
    "fn_array",
    "fn_higher_order",
    "ts_velocity_features",
    "scan_all_tables_counts",
    "ingest_csv_header",
    "stream_file_source",
    "ingest_csv_malformed",
    "project_compute",
    "filter_pred",
    "filter_null_3vl",
    "distinct_rows",
    "filter_dynamic_rule",
    "join_inner",
    "join_broadcast",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_interval",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_percentile",
    "agg_pivot",
    "agg_unpivot",
    "win_rownum",
    "win_topk_group",
    # (win_lag_lead / win_range_frame / win_ntile_pct and the r09 fill
    # were displaced by the four (b)-class ANN re-entries — (b) ranks
    # above (d) staleness in the composition rule; they lead the r15
    # rotation instead.)
    # Slot arithmetic: 2 new + 5 (b) + 13 r07 + 30 r08 = 50.
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
