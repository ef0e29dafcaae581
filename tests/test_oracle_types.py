"""Structural lint on every oracle's DuckDB RESULT TYPES (no Spark needed).

The driver's value hash is typed: when DuckDB widens an aggregate —
``sum(BIGINT)`` → HUGEINT (arriving in Arrow as decimal128) — the hash
differs from Spark's int64 even for numerically identical values. That
exact class broke ``subq_not_in_null`` in round 3 (VERDICT r3 "What's
wrong" #1) despite SURVEY §5.3 rule 5 mandating ``CAST(... AS BIGINT)``.

This test makes the rule structural: every oracle is executed in DuckDB
at the fixture SF and every result column's type must be one Spark can
actually emit over these tables. HUGEINT/DECIMAL can ONLY appear through
DuckDB widening, which always means a missing cast in the oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from adlspark import registry
from adlspark.tables import TABLES

from tests.conftest import SF_DIR

ORACLES = registry.all_oracles()

# Types DuckDB produces only by implicit widening/its own numeric tower;
# Spark never emits these from our parquet schemas, so any appearance is
# a typed-hash mismatch waiting for a driver window.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def lint_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_result_types(key, lint_con):
    rel = lint_con.sql(ORACLES[key])
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(f in str(typ).upper() for f in _FORBIDDEN)
    ]
    assert not offenders, (
        f"[{key}] oracle emits DuckDB-widened types {offenders}; wrap the "
        "expression in CAST(... AS BIGINT/DOUBLE) per SURVEY §5.3 rule 5 — "
        "the driver's typed value-hash will not match Spark otherwise"
    )


# ---------------------------------------------------------------------------
# Intermediate-CTE widening lint (round-4 verdict #5): the HUGEINT trap can
# hide in a WITH clause whose widened column is later joined or filtered on
# — the RESULT columns lint above never sees it because the final SELECT
# casts (or drops) the value. Extract every top-level CTE and type-check
# each one in isolation. DECIMAL is NOT forbidden here: the repo's
# decimal-guard rounding discipline (BASELINE.md, win_cume_pct et al.)
# deliberately routes values through explicit DECIMAL casts in
# intermediates; the implicit-widening class that actually broke parity
# (subq_not_in_null, r3) is integral sum() -> HUGEINT.
# ---------------------------------------------------------------------------

_CTE_FORBIDDEN = ("HUGEINT", "UHUGEINT")


def _split_top_level_ctes(sql: str):
    """Return (recursive, [(name, body), ...]) for a top-level WITH, else
    (False, []). Paren-balance aware and single-quote-string aware — CTE
    bodies routinely contain nested parens, lambdas (p -> ...), and string
    literals."""
    s = sql.strip()
    up = s.upper()
    if not up.startswith("WITH"):
        return False, []
    i = 4
    recursive = False
    if up[i:].lstrip().startswith("RECURSIVE"):
        recursive = True
        i = up.index("RECURSIVE", i) + len("RECURSIVE")
    ctes = []
    n = len(s)
    while True:
        # parse: name [(cols)] AS ( body )
        while i < n and s[i] in " \t\n,":
            i += 1
        start = i
        # scan to the AS ( that opens this CTE's body
        depth = 0
        in_str = False
        j = i
        while j < n:
            c = s[j]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                if depth == 0 and up[max(0, j - 4) : j].strip().endswith("AS"):
                    break
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if j >= n:
            break
        name = s[start:j].rsplit(None, 1)[0].split("(")[0].strip()
        # consume the balanced body
        depth = 1
        in_str = False
        k = j + 1
        while k < n and depth:
            c = s[k]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, s[j + 1 : k - 1]))
        i = k
        while i < n and s[i] in " \t\n":
            i += 1
        if i >= n or s[i] != ",":
            break
        i += 1
    return recursive, ctes


_WITH_ORACLES = sorted(
    k for k, sql in ORACLES.items() if sql.strip().upper().startswith("WITH")
)


@pytest.mark.parametrize("key", _WITH_ORACLES)
def test_oracle_intermediate_cte_types(key, lint_con):
    recursive, ctes = _split_top_level_ctes(ORACLES[key])
    assert ctes, f"[{key}] starts with WITH but no CTE parsed"
    kw = "WITH RECURSIVE" if recursive else "WITH"
    offenders = []
    for upto in range(len(ctes)):
        prefix = ", ".join(f"{nm} AS ({body})" for nm, body in ctes[: upto + 1])
        probe = f"{kw} {prefix} SELECT * FROM {ctes[upto][0]} LIMIT 0"
        try:
            rel = lint_con.sql(probe)
        except Exception:
            continue  # recursive members may not stand alone; result lint covers them
        offenders += [
            (ctes[upto][0], col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if any(f in str(typ).upper() for f in _CTE_FORBIDDEN)
        ]
    assert not offenders, (
        f"[{key}] intermediate CTE column(s) carry DuckDB-widened integral "
        f"types {offenders}; any later join/filter/comparison on them can "
        "diverge from Spark BIGINT semantics even when the final SELECT "
        "casts — wrap the aggregate in CAST(... AS BIGINT) inside the CTE"
    )


def test_cte_lint_catches_seeded_intermediate_widening(lint_con):
    """The lint itself must be falsifiable: a WITH clause whose sum()
    widens to HUGEINT — later cast away in the outer SELECT so the
    result-columns lint stays green — has to be flagged."""
    seeded = """
WITH t AS (SELECT o_custkey, sum(o_orderkey) AS s FROM orders GROUP BY 1)
SELECT o_custkey, CAST(s AS BIGINT) AS s FROM t
"""
    # result-columns lint (the old one) would pass:
    rel = lint_con.sql(seeded)
    assert not any("HUGEINT" in str(t).upper() for t in rel.types)
    # the CTE lint must catch it:
    recursive, ctes = _split_top_level_ctes(seeded)
    assert [n for n, _ in ctes] == ["t"]
    probe = f"WITH t AS ({ctes[0][1]}) SELECT * FROM t LIMIT 0"
    types = [str(t).upper() for t in lint_con.sql(probe).types]
    assert any("HUGEINT" in t for t in types), types
