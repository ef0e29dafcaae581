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


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every operator module exactly once so decorators run.

    Import order IS the driver's verification order: the external
    correctness harness processes the first ~50 registry keys per round, so
    keys that still lack a driver verdict register FIRST and keys that went
    green in a previous round rotate to the back of the queue.

    Round-2 rotation: round 1 verified scans/filters/joins/aggs/windows
    (the first 50); this round front-loads llm, multimodal, new catalog /
    ingest keys, functions, timeseries, subqueries, setops. Remaining tail
    (sorts, udfs, windows tail, streaming) rotates into round 3's window.

    ROUND-3 TODO: front-load the still-unverified tail — subqueries,
    setops, sorts, udfs, streaming, windows (for win_first_last /
    win_nth_value) — plus any key changed or added in round 2 whose
    CORRECTNESS_r02 verdict is missing; rotate the r2-verified llm/lake/
    functions/timeseries modules to the back.
    """
    global _LOADED
    if _LOADED:
        return
    from adlspark.llm import dedup, similarity, text, multimodal  # noqa: F401
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
