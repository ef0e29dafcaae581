"""Local mirror of the driver's correctness gate (SURVEY.md §5.2).

Compares a Spark DataFrame result against DuckDB oracle output:
row count + column-name set + order-insensitive value comparison, with
columns sorted by name (the driver hashes in that layout).
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import numpy as np


def _norm_cell(v: Any) -> Any:
    """Type-TAGGED normalization.

    The driver's value hash is typed (Arrow layout): a DuckDB HUGEINT /
    decimal128 checksum hashes differently from Spark's int64 even when
    the values are numerically equal (the r03 ``subq_not_in_null``
    failure). Python tuple equality treats 1 == 1.0 == True, so an
    untagged mirror silently passes exactly that class of bug. Tagging
    each scalar with its kind makes the local gate at least as strict as
    the driver for int-vs-float-vs-decimal-vs-bool drift.
    """
    if v is None:
        return None
    if isinstance(v, (np.generic,)):
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:
            return ("f", 0.0)
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        # DuckDB widening (sum(BIGINT) -> HUGEINT/decimal128). Never
        # collapse to int/float: the driver hashes these differently, so
        # the oracle must CAST instead (SURVEY §5.3 rule 5).
        return ("dec", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_keyed(rows: list, cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def compare(spark_df, ddb_con, oracle: str, key: str = "?") -> None:
    """Raise AssertionError with a diff summary on mismatch."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = ddb_con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{key}] column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{key}] row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    s_norm = _rows_to_keyed(s_rows, s_cols)
    d_norm = _rows_to_keyed(d_rows, d_cols)
    if s_norm != d_norm:
        diffs = []
        for i, (a, b) in enumerate(zip(s_norm, d_norm)):
            if a != b:
                diffs.append(f"  row {i}:\n    spark : {a}\n    duckdb: {b}")
            if len(diffs) >= 5:
                break
        cols_sorted = sorted(s_cols)
        raise AssertionError(
            f"[{key}] value mismatch (cols sorted: {cols_sorted}); "
            f"first diffs:\n" + "\n".join(diffs)
        )
