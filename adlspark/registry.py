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
# The driver verifies the first ~50 keys of queries() (CORRECTNESS_r01 and
# _r02 each hold exactly 50 verdicts); keys absent from this list keep
# their existing verdicts because their code is unchanged, and rotate to
# the back of the queue.
#
# State entering this round (driver round 3; CORRECTNESS_r02 is the latest
# file on disk — the "round 3/4" windows planned by the previous session
# never received a driver verdict, so their keys are still debt):
#   - r1 ∪ r2 verdicts cover 100/182 keys; 82 keys have NO verdict.
#   - 3 keys FAILED r1 and were fixed (agg_stats, agg_collect_sorted,
#     win_rank_dense) — green in local parity only; need a green row.
#   - catalog_entries/catalog_persistent changed output schema after
#     their r1 green; join_asof's shared kernel gained a direction
#     parameter — all three need fresh verdicts.
#   - VERDICT r2's #1 instruction: verify the §2 debt (subqueries,
#     setops, sorts/limits, UDFs, streaming, window tail, ts_funnel,
#     ts_gap_fill) before anything else.
# This 50-key window = fixed trio (3) + changed-code (3) + §2 debt (25)
# + VERDICT-named extension debt (7) + the 12 highest-value unverified
# LLM-pipeline/function keys. The ~32 remaining unverified extension keys
# (ts_retention, lake_*, llm sketch family, graph, kmeans, ...) are the
# NEXT round's window; see the ROUND-4 TODO below.
#
# ROUND-4 TODO: front-load every key that still lacks a verdict after
# this round's CORRECTNESS file lands (compute with
# tools/verification_debt.py if present, else the set difference of
# registry keys vs CORRECTNESS_r0*.json unions), plus anything whose
# code changes this round.
_VERIFY_WINDOW = [
    # (a) failed r1, rewritten, locally green — need external re-verdict
    "agg_stats",
    "agg_collect_sorted",
    "win_rank_dense",
    # (b) code/schema changed after last green verdict
    "catalog_entries",
    "catalog_persistent",
    "join_asof",
    # (c) §2 keys never in any driver window: subqueries
    "subq_scalar",
    "subq_in",
    "subq_exists_corr",
    # (c) setops
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_intersect_all",
    "set_except_all",
    # (c) sorts/limits
    "sort_multi",
    "limit_topk",
    # (c) UDF surface
    "udf_python",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_grouped_map",
    "udf_map_in_pandas",
    "udtf_python",
    # (c) window tail + funnel
    "win_first_last",
    "ts_funnel",
    # (c) streaming (rows-only by contract; batch-equivalence pytested)
    "stream_tumbling_watermark",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_join",
    "stream_stateful_count",
    "stream_foreach_batch_upsert",
    # (d) extension debt named in VERDICT r2's "What's missing" #1
    "win_nth_value",
    "win_cume_pct",
    "subq_lateral",
    "subq_not_in_null",
    "ts_gap_fill",
    "stream_stream_join",
    "stream_transform_with_state",
    # (e) highest-value unverified LLM-pipeline / function keys
    "llm_dedup_canonical",
    "llm_contamination_check",
    "llm_repetition_filter",
    "llm_semantic_dedup",
    "llm_incremental_dedup",
    "llm_url_dedup",
    "llm_prefix_dedup",
    "llm_substring_dedup",
    "llm_minhash_signature",
    "llm_entropy_filter",
    "fn_struct",
    "fn_url",
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
