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

import re

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


def _strip_line_comments(sql: str) -> str:
    """Remove ``--`` line comments, string-literal-aware. An apostrophe
    INSIDE a comment ("unix_timestamp's") must not toggle string state —
    leaving comments in place did exactly that and silently broke the
    paren scan for ts_trend_slope (hidden by the old blanket except)."""
    out = []
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        c = sql[i]
        if in_str:
            out.append(c)
            if c == "'":
                in_str = False
            i += 1
        elif c == "'":
            out.append(c)
            in_str = True
            i += 1
        elif c == "-" and sql[i : i + 2] == "--":
            while i < n and sql[i] != "\n":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _split_top_level_ctes(sql: str):
    """Return (recursive, [(name, header, body), ...]) for a top-level
    WITH, else (False, []). ``header`` is the full CTE head including an
    optional column-alias list ("r(user_id, rn)"), which probe
    reconstruction must preserve. Paren-balance aware and
    single-quote-string aware — CTE bodies routinely contain nested
    parens, lambdas (p -> ...), and string literals."""
    s = _strip_line_comments(sql).strip()
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
        mat = ""
        j = i
        while j < n:
            c = s[j]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                # the body opens at a depth-0 '(' preceded by the WORD
                # "AS": skip back over ALL whitespace (a fixed-width
                # lookback window misparses AS-newline-deep-indent),
                # then require the token "AS" with a non-identifier char
                # before it ("bias (x) AS (...)" must not match at
                # "bias (")
                if depth == 0:
                    t = j
                    while t > 0 and up[t - 1] in " \t\r\n":
                        t -= 1
                    # optional MATERIALIZED / NOT MATERIALIZED between
                    # AS and the body paren (the computed-oracle CTEs).
                    # PRESERVED for probe reconstruction: stripping it
                    # lets DuckDB inline a chained-CTE oracle
                    # exponentially at bind time (the pagerank r8
                    # probe exhausted the fd limit that way).
                    local_mat = ""
                    if t >= 12 and up[t - 12 : t] == "MATERIALIZED":
                        local_mat = "MATERIALIZED"
                        t -= 12
                        while t > 0 and up[t - 1] in " \t\r\n":
                            t -= 1
                        if t >= 3 and up[t - 3 : t] == "NOT":
                            local_mat = "NOT MATERIALIZED"
                            t -= 3
                            while t > 0 and up[t - 1] in " \t\r\n":
                                t -= 1
                    if (
                        t >= 2
                        and up[t - 2 : t] == "AS"
                        and (
                            t == 2
                            or not (up[t - 3].isalnum() or up[t - 3] == "_")
                        )
                    ):
                        mat = local_mat
                        break
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if j >= n:
            break
        header = re.sub(
            r"(?i)\bAS(\s+NOT\s+MATERIALIZED|\s+MATERIALIZED)?\s*\Z",
            "",
            s[start:j],
        ).strip()
        name = header.split("(")[0].strip()
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
        ctes.append((name, header, s[j + 1 : k - 1], mat))
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
    skipped = []
    for upto in range(len(ctes)):
        prefix = ", ".join(
            f"{hdr} AS {mat + ' ' if mat else ''}({body})"
            for _, hdr, body, mat in ctes[: upto + 1]
        )
        probe = f"{kw} {prefix} SELECT * FROM {ctes[upto][0]} LIMIT 0"
        try:
            rel = lint_con.sql(probe)
        except Exception as exc:
            skipped.append((ctes[upto][0], str(exc).splitlines()[0]))
            continue
        offenders += [
            (ctes[upto][0], col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if any(f in str(typ).upper() for f in _CTE_FORBIDDEN)
        ]
    # Every probe carries all preceding CTEs (and the RECURSIVE keyword
    # when present), so each one must compile standalone; a skip means
    # the lint silently lost coverage of that CTE (r5 ADVICE), not a
    # legitimate recursion artifact.
    assert not skipped, (
        f"[{key}] CTE probe(s) failed to compile, leaving them unlinted: "
        f"{skipped}"
    )
    assert not offenders, (
        f"[{key}] intermediate CTE column(s) carry DuckDB-widened integral "
        f"types {offenders}; any later join/filter/comparison on them can "
        "diverge from Spark BIGINT semantics even when the final SELECT "
        "casts — wrap the aggregate in CAST(... AS BIGINT) inside the CTE"
    )


def test_strip_line_comments_edge_cases():
    # apostrophe inside a comment must not open a string
    assert _strip_line_comments(
        "SELECT 1 -- it's a comment (unbalanced\nFROM t"
    ) == "SELECT 1 \nFROM t"
    # '--' inside a string literal must survive
    assert _strip_line_comments("SELECT 'a--b' AS s") == "SELECT 'a--b' AS s"
    # escaped quote ('') stays a string: the doubled quote closes and
    # reopens, leaving state consistent
    assert _strip_line_comments("SELECT 'it''s' -- tail\n") == "SELECT 'it''s' \n"


def test_cte_parser_identifier_ending_in_as(lint_con):
    """r5 ADVICE: a CTE named with a trailing 'as' ('bias (x) AS (...)')
    must parse at the real AS, not at the identifier's column list."""
    sql = """
WITH bias (x) AS (SELECT 1), atlas AS (SELECT x + 1 AS y FROM bias)
SELECT y FROM atlas
"""
    recursive, ctes = _split_top_level_ctes(sql)
    assert not recursive
    assert [n for n, _, _, _ in ctes] == ["bias", "atlas"]
    assert ctes[0][1] == "bias (x)"  # column list preserved in the header
    assert ctes[0][2].strip() == "SELECT 1"
    assert ctes[1][2].strip() == "SELECT x + 1 AS y FROM bias"
    # and the probe the lint builds from it compiles, x alias intact
    rel = lint_con.sql(
        f"WITH {ctes[0][1]} AS ({ctes[0][2]}) SELECT * FROM bias LIMIT 0"
    )
    assert rel.columns == ["x"]


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
    assert [n for n, _, _, _ in ctes] == ["t"]
    probe = f"WITH t AS ({ctes[0][2]}) SELECT * FROM t LIMIT 0"
    types = [str(t).upper() for t in lint_con.sql(probe).types]
    assert any("HUGEINT" in t for t in types), types
