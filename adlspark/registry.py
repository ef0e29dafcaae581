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
# State entering driver round 7 (recomputed 2026-08-14 with
# tools/verification_debt.py — the single source of truth):
#   - 254 registry keys, 254 carry a verdict (debt = 0 for the first
#     time), 253 green, ONE failed: agg_approx_percentile ERRORED in r6
#     because its output carried a raw array<double> column the driver's
#     pandas canonicalizer cannot factorize. Fixed this session (scalar
#     p50/p95/p99 via element_at, the aggs.py agg_collect_sorted
#     precedent); tests/test_output_schema.py now lints the whole
#     registry so the class cannot ship again.
# With the debt paid, the spare capacity starts the staleness rotation
# (r6 verdict item 5): the ~48 free slots carry the OLDEST verdicts —
# the full r1 cohort plus the earliest r2 keys, all verified against
# testdata the driver has regenerated five times since. Over ~5 rounds
# every verdict stays ≤5 rounds old.
_VERIFY_WINDOW = [
    # (a) failed in its latest window — re-front-load FIRST:
    "agg_approx_percentile",
    # (b) code changed this session after a green verdict — re-enter:
    #   ts_ewma — kernel hardening (non-null user_id guard in
    #     ewma_partition; np.cumsum sequential-accumulation runtime
    #     sentinel with loop fallback). Hash-parity re-proven vs DuckDB
    #     at sf0.001+sf0.01 in-session; re-entered per the invariant.
    "ts_ewma",
    #   chunked pair expansion + minhash quotienting (the 100× stress
    #   fix): outputs verified bit-identical to the old kernels at
    #   sf0.001+sf0.01 in-session; re-entered per the invariant.
    "llm_near_dup_pairs",
    "llm_ngram_jaccard",
    "llm_containment_dedup",
    "llm_dedup_minhash",
    #   identity-group quotienting of the blocked Levenshtein verify and
    #   the block-matmul threshold join (same 100× stress fix): both
    #   hash-passed the sf0.01 DuckDB oracle in-session post-change;
    #   re-entered per the invariant.
    "llm_dedup_editdist",
    "llm_sim_threshold_join",
    #   100×-stress quotienting wave 2 (probe sets / graphs that scale
    #   with the corpus): knn_label, knn_graph, minhash_estimate
    #   hash-passed the sf0.001+sf0.01 DuckDB oracle in-session
    #   post-change; ann_ivf / ann_ivf_pq outputs compared bit-equal to
    #   the unquotiented kernels at both SFs; pagerank re-passed the
    #   numpy power-iteration parity bar on the expanded graph.
    "llm_knn_label",
    "llm_knn_graph",
    "llm_minhash_estimate",
    "llm_ann_ivf",
    "llm_ann_ivf_pq",
    "llm_graph_pagerank",
    #   code-review fixes (round-7 continuation): null-keyed docs become
    #   singleton identity groups in prefix_filter_pairs (they never
    #   pair — SQL null-join semantics; previously a merged null group
    #   could emit spurious within-pairs / components), the same null
    #   guard in the editdist blocker, a NaN-norm guard in the
    #   threshold-join within path, and the ann_ivf_pq in-block keep now
    #   decides on the 6-decimal ROUNDED ADC distances the global rank
    #   uses. Fixture outputs bit-identical (null/NaN-free corpus);
    #   dup-density + oracle gates re-passed in-session. The affected
    #   keys above stay in the window; these three are prefix_filter_
    #   pairs consumers not already listed:
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    "llm_graph_triangles",
    #   second review wave: sequence(1, 0)-descending guards (a ≤7-token
    #   doc invented phantom md5('') windows in substring_dedup; an
    #   empty-text doc invented a phantom entropy-0 row in
    #   entropy_filter — both diverge from DuckDB's empty
    #   generate_series and are pinned by the new short/empty-text
    #   corpus in tests/test_null_robustness.py):
    "llm_substring_dedup",
    "llm_entropy_filter",
    #   third wave (full document-reading-key sweep over the null/edge
    #   corpora): NULL-text fingerprint NULLs both columns, NULL payload
    #   phash is NULL instead of a worker crash, and the two quality
    #   oracles coalesce DuckDB's list_sum([])=NULL to Spark's seeded 0
    #   (oracle-only edits for those two, observation-equivalent on the
    #   empty-free fixtures):
    "llm_fingerprint",
    "mm_phash_dedup",
    "llm_quality_classifier",
    "llm_gopher_rules",
    #   fourth wave (events-family null/tie sweep, 55 oracle keys ×
    #   null + tie corpora, 0 divergences ×3 runs — pinned in
    #   tests/test_event_null_robustness.py). Kernel-changed keys
    #   re-enter (ts_ewma is already above): empty-frame guard
    #   (rolling_median), try_divide for degenerate denominators
    #   (ks_test, anomaly_zscore, trend_slope), try_cast/try_element_at
    #   + map<string,string> parse (fn_json, fn_map), eqNullSafe
    #   day-grid join (win_distinct_running), NULL-type path steps
    #   (ts_event_paths). All hash-passed sf0.01 driver sim
    #   post-change.
    "ts_rolling_median",
    "agg_ks_test",
    "ts_anomaly_zscore",
    "ts_trend_slope",
    "fn_json",
    "fn_map",
    "win_distinct_running",
    "ts_event_paths",
    #   fifth wave (embeddings-family NaN/zero-norm/NULL/empty sweep,
    #   18 oracle keys, 0 divergences — pinned in
    #   tests/test_embed_robustness.py). The vector-domain loader
    #   (load_embeddings) and the try_divide cosine touch every vector
    #   kernel, so all embedding keys not already above re-enter; the
    #   knn_graph local top-k additionally masks non-finite sims, and
    #   fn_array/fn_higher_order moved to try_element_at /
    #   prepended-seed folds. All hash-passed sf0.01 driver sim
    #   post-change (rows-only keys re-passed their pytest parity
    #   bars).
    "llm_sim_topk",
    "llm_embed_centroids",
    "llm_multimodal_struct",
    "llm_embed_near_dup",
    "llm_embed_quantize",
    "llm_srp_bits",
    "llm_semantic_dedup",
    "llm_hard_negative_mine",
    "llm_kmeans",
    "llm_pca_power",
    "llm_mmr_diverse_sample",
    "fn_array",
    "fn_higher_order",
    #   sixth wave (TPC-H-table null sweep, 92 oracle keys, 0
    #   divergences ×3 — pinned in tests/test_tpch_null_robustness.py).
    #   Kernel-changed keys re-enter: try_divide for 1-row/zero-variance
    #   groups (agg_stats, agg_skew_kurt), NULL-in-NULL-out row UDF
    #   (udf_python). The win_*/lake_scd2 edits are oracle-only
    #   sentinels, observation-equivalent on the null-free fixtures.
    "agg_stats",
    "agg_skew_kurt",
    "udf_python",
    #   seventh wave (rows-only crash sweep — a worker crash is a
    #   driver ERROR verdict even without an oracle; pinned in
    #   tests/test_rows_only_crash_robustness.py): NULL payloads leave
    #   the multimodal decode domain; pca filters NaN vectors, mmr
    #   non-normalizable ones (both already re-entered above).
    "mm_binary_pipeline",
    "mm_frame_sample",
    # (c) staleness rotation: the r1-era keys
    "scan_project",
    # Slot arithmetic (the driver verifies the FIRST 50 keys): 1 failed
    # (a) + 48 code-changed re-entries (b) + 1 staleness key (c) = 50.
    # The win_* family, llm_text_stats / llm_top_terms / llm_tfidf /
    # llm_lang_partition_pipeline / llm_langid, and (this continuation)
    # agg_grouping_sets / agg_pivot / agg_unpivot / agg_rollup /
    # agg_cube / agg_count_distinct / agg_approx_distinct / agg_having /
    # agg_percentile / join_semi / join_anti / join_cross /
    # join_interval / join_skew_salted / agg_group_q1 / agg_global /
    # agg_conditional / ingest_partitioned_prune / ingest_idempotent /
    # project_compute / filter_pred / filter_null_3vl / distinct_rows /
    # filter_dynamic_rule / join_inner / join_broadcast / join_multikey
    # / join_left / join_right / join_full were rotated out to make
    # room for the (b) re-entries; they rejoin the staleness rotation
    # next round — `python tools/verification_debt.py` prints the
    # oldest-verdict ranking to fill (c) mechanically.
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
