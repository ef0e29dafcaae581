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
# State entering driver round 8 (recomputed 2026-08-15 with
# tools/verification_debt.py — the single source of truth):
#   - 254 registry keys, 254 carry a verdict, debt = 0, ZERO failed —
#     round 7 came back fully green (50/50), so the whole window is
#     available for (b) code-changed re-entries and (d) the staleness
#     rotation the r7 verdict names as the round's top item.
# Composition: 5 re-entries + 42 r01-cohort + 3 oldest-r02 = 50. The
# remaining r02 cohort (~28 keys: llm_lang_partition_pipeline through
# ts_dedup in the staleness ranking) rotates next round; after that no
# key's latest verdict predates r03.
_VERIFY_WINDOW = [
    # (a) failed in the latest window: none (r7 fully green).
    # (b) code changed this session after a green verdict — re-enter:
    #   null-element discipline (skip-null max/exists/forall folds,
    #   null-ignoring list_contains parity, nulls-last list_sort[1]):
    "fn_higher_order",
    "fn_array",
    #   all-NULL-signature docs routed out before the quotient groupBy
    #   (they'd merge into one class and invent n_agree=8 pairs):
    "llm_minhash_estimate",
    #   identity-group quotient (the last pair-shaped kernel on a
    #   direct inverted-index join; 100x dup-density 17.5 s, was
    #   join-row-quadratic in copy multiplicity):
    "llm_contamination_check",
    #   bounded sliding RANGE frames -> difference of two unbounded-
    #   preceding prefix counts (Spark re-aggregates a sliding frame
    #   whenever the lower bound moves; 52.7 -> 6.7 s at the 50%-hot
    #   user, exact on the integer microsecond key):
    "ts_velocity_features",
    #   z-value day scale promoted to BIGINT (ANSI overflow crash once
    #   the date range exceeds ~32k days — found by the round-8
    #   extreme-date corpus; DuckDB auto-promotes the same math):
    "lake_zorder_layout",
    #   CSV fixture-writer: NULL acctbal now writes an empty field, not
    #   repr(None)='None' (which parsed as malformed and dropped the
    #   row — found by the round-8 null-dim corpus); reader now uses
    #   RFC-4180 escape='"', and names are line-atomized with the
    #   oracle mirroring (the hostile-CSV corpus finds):
    "ingest_csv_malformed",
    #   CSV roundtrip reader gains multiLine=true: the writer QUOTES
    #   embedded newlines but the default reader split such a record
    #   in two (hostile-CSV corpus find):
    "sink_csv_roundtrip",
    #   All five HASH-PASSED the sf0.01 driver sim post-change and are
    #   bit-identical on the null-free fixtures (null/dup gates pinned
    #   in tests/test_embed_robustness.py, test_dup_density.py,
    #   test_event_null_robustness.py).
    # (c) never-verified debt: none.
    # (d) staleness rotation — the full r01 cohort (last verified
    #   against testdata regenerated five driver-rounds ago), in
    #   verification_debt.py ranking order:
    "scan_all_tables_counts",
    "ingest_validate_json",
    "ingest_csv_header",
    "sink_parquet_roundtrip",
    "stream_file_source",
    "ingest_partitioned_prune",
    "ingest_idempotent",
    "project_compute",
    "filter_pred",
    "filter_null_3vl",
    "distinct_rows",
    "filter_dynamic_rule",
    "join_inner",
    "join_broadcast",
    "join_multikey",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_interval",
    "join_skew_salted",
    "agg_group_q1",
    "agg_global",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_having",
    "agg_percentile",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_conditional",
    "agg_pivot",
    "agg_unpivot",
    "win_rownum",
    "win_topk_group",
    "win_lag_lead",
    "win_running_sum",
    "win_moving_avg",
    "win_range_frame",
    "win_ntile_pct",
    # (llm_tfidf, llm_top_terms, and llm_text_stats gave their fill
    # slots to the lake_zorder_layout / ingest_csv_malformed /
    # sink_csv_roundtrip re-entries; they rejoin the r02 rotation next
    # round.)
    # Slot arithmetic: 8 re-entries (b) + 42 r01 = 50.
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
