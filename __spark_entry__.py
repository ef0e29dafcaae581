"""Driver contract adapter for the adlspark engine.

- ``entry(spark)``: flagship TPC-H-Q1-shaped aggregate at sf0.001.
- ``queries()``: registry of implemented SURVEY.md §2 operators.
- ``oracle_sql()``: matching DuckDB oracle SQL (keys without an entry get
  the driver's rows-only check).

Implementation lives in the ``adlspark`` package (same directory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from adlspark import registry, session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    session.configure(spark)
    q = registry.all_queries()["agg_group_q1"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = registry.all_queries()

    def wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            session.configure(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {k: wrap(fn) for k, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
