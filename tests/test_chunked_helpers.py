"""Direct unit bars for the shared pair-expansion / banding helpers.

Every quotiented pair kernel now routes through ``chunked_self_pairs``,
``chunked_cartesian``, ``expand_member_pairs``, and (for the signature
family) ``band_bucket_pairs`` (adlspark/llm/dedup.py), so these helpers
are the single point of failure for the whole family. The kernels test
them transitively through DuckDB oracles on realistic corpora; these
tests pin the helper ALGEBRA itself against naive constructions over
randomized inputs, including the chunk-boundary cases the fixtures
never hit (chunk sizes 1/2/3 around array lengths, empty arrays,
single-element groups, bucket collisions).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from adlspark.llm.dedup import (
    band_bucket_pairs,
    chunked_cartesian,
    chunked_self_pairs,
    expand_member_pairs,
)


def _member_rows(seed, n_rows, max_len):
    """Disjoint member lists whose ids INTERLEAVE across rows — a
    consecutive-range layout would make least/greatest re-orientation
    vacuous (every cross-row pair already ordered by construction)."""
    rng = random.Random(seed)
    sizes = [rng.randint(0, max_len) for _ in range(n_rows)]
    ids = list(range(sum(sizes)))
    rng.shuffle(ids)
    rows, pos = [], 0
    for k in sizes:
        rows.append(sorted(ids[pos : pos + k]))
        pos += k
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("chunk", [1, 2, 3, 512])
def test_chunked_self_pairs_equals_naive(spark, seed, chunk):
    rows = _member_rows(seed, n_rows=6, max_len=7)
    df = spark.createDataFrame(
        [Row(tag=i, members=m) for i, m in enumerate(rows)]
    )
    got = sorted(
        map(
            tuple,
            chunked_self_pairs(
                df, "members", "a", "b", payload=("tag",), chunk=chunk
            ).collect(),
        )
    )
    want = sorted(
        (i, a, b)
        for i, m in enumerate(rows)
        for a in m
        for b in m
        if a < b
    )
    assert got == want


@pytest.mark.parametrize("chunk", [1, 2, 3, 512])
def test_chunked_self_pairs_duplicate_arrays(spark, chunk):
    """The helper is total over arrays with DUPLICATE values (round-9
    guard): a value appearing in two different chunks meets itself in
    the cross-chunk branch, where the ``_ea != _eb`` guard drops the
    (v, v) equal pair exactly like the naive a < b expansion does —
    at every chunk size, so the duplicates land same-chunk and
    cross-chunk both."""
    for members in ([5, 9, 5, 2], [7, 7], [3, 3, 3, 1, 3]):
        df = spark.createDataFrame([Row(members=members)])
        got = sorted(
            map(
                tuple,
                chunked_self_pairs(df, "members", "a", "b", chunk=chunk).collect(),
            )
        )
        naive = sorted(
            (min(a, b), max(a, b))
            for i, a in enumerate(members)
            for b in members[i + 1 :]
            if a < b or b < a
        )
        assert got == naive, (members, chunk)
    # and distinct-element arrays stay exactly naive (the usual callers)
    df2 = spark.createDataFrame([Row(members=[5, 9, 2])])
    got2 = sorted(
        map(tuple, chunked_self_pairs(df2, "members", "a", "b", chunk=chunk).collect())
    )
    assert got2 == [(2, 5), (2, 9), (5, 9)]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("chunk", [1, 2, 3, 512])
def test_chunked_cartesian_equals_naive(spark, seed, chunk):
    rng = random.Random(100 + seed)
    rows = []
    for i in range(5):
        la = [rng.randint(0, 50) for _ in range(rng.randint(0, 5))]
        lb = [rng.randint(60, 110) for _ in range(rng.randint(0, 5))]
        rows.append((i, la, lb))
    df = spark.createDataFrame(
        [Row(tag=i, ma=a, mb=b) for i, a, b in rows]
    )
    got = sorted(
        map(
            tuple,
            chunked_cartesian(
                df, "ma", "mb", "x", "y", payload=("tag",), chunk=chunk
            ).collect(),
        )
    )
    want = sorted((i, x, y) for i, a, b in rows for x in a for y in b)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_expand_member_pairs_equals_naive_double_join(spark, seed):
    groups = [m for m in _member_rows(200 + seed, n_rows=7, max_len=5) if m]
    g = spark.createDataFrame(
        [Row(gid=min(m), members=m) for m in groups]
    )
    gids = [min(m) for m in groups]
    rng = random.Random(300 + seed)
    rep_pairs_py = [
        (a, b, round(rng.random(), 3))
        for a in gids
        for b in gids
        if a < b and rng.random() < 0.5
    ]
    if not rep_pairs_py:
        rep_pairs_py = [(gids[0], gids[1], 0.5)]
    rp = spark.createDataFrame(
        [Row(id1=a, id2=b, score=s) for a, b, s in rep_pairs_py]
    )
    got = sorted(
        map(
            tuple,
            expand_member_pairs(rp, g, ("score",), "da", "db").collect(),
        )
    )
    by_gid = {min(m): m for m in groups}
    want = sorted(
        (min(x, y), max(x, y), s)
        for a, b, s in rep_pairs_py
        for x in by_gid[a]
        for y in by_gid[b]
    )
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_band_bucket_pairs_equals_naive(spark, seed):
    rng = random.Random(400 + seed)
    # tiny signature domain forces real bucket collisions; some NULL
    # signature rows must pair with nothing (equi-join semantics)
    rows = []
    for i in range(12):
        if rng.random() < 0.15:
            sigs = [None] * 8
        else:
            sigs = [rng.randint(0, 2) for _ in range(8)]
        rows.append((i, sigs))
    df = spark.createDataFrame(
        [Row(nid=i, **{f"sig{j}": s[j] for j in range(8)}) for i, s in rows]
    )
    got = sorted(
        map(
            tuple,
            band_bucket_pairs(df, "nid", payload=("sig0",)).collect(),
        )
    )
    want = set()
    for i, si in rows:
        for j, sj in rows:
            if i >= j or si[0] is None or sj[0] is None:
                continue
            for b in range(4):
                if si[2 * b] == sj[2 * b] and si[2 * b + 1] == sj[2 * b + 1]:
                    want.add((i, j, si[0], sj[0]))
                    break
    assert got == sorted(want)


def test_band_bucket_pairs_distinct_under_keyed_partitioning(spark):
    """Regression (optimization round 14): with a hash-partitioned input
    (the ``tables.spread`` shape) the old n_bands-way union melt let the
    planner satisfy the final distinct's clustering from the union's
    claimed partitioning and skip its Exchange — but a union
    CONCATENATES partitions, so a pair co-bucketed in SEVERAL bands
    (identical-signature docs co-bucket in all four) was emitted once
    per band. The melt is now a single explode, which keeps one lineage
    and makes the per-partition dedup correct under any partitioning.
    The contract is in the docstring's first word: DISTINCT pairs."""
    # 6 docs with the identical signature: every pair shares all 4 bands
    rows = [Row(nid=i, **{f"sig{j}": 7 for j in range(8)}) for i in range(6)]
    df = spark.createDataFrame(rows).repartition(8, "nid")
    got = [tuple(r) for r in band_bucket_pairs(df, "nid").collect()]
    assert sorted(got) == sorted(
        (i, j) for i in range(6) for j in range(6) if i < j
    ), "band_bucket_pairs must return each co-bucketed pair exactly once"


def test_quotient_token_sets_is_deterministic_and_sorted(spark):
    """Pin for the lazy-checkpoint precondition (optimization round 14):
    quotient_token_sets now materializes LAZILY, which is only sound if
    concurrent consumer stages racing to compute an uncached partition
    produce bit-identical rows. The two historically nondeterministic
    columns must therefore be value-pinned: ``members`` is sorted, and
    ``toks`` is the SORTED group key (the old first(toks) picked an
    arbitrary member's array order). Two groups whose members carry the
    same token SET in different orders must collapse to one row with
    identical sorted columns on every evaluation."""
    from adlspark.llm.dedup import quotient_token_sets

    rows = [
        Row(doc_id=3, lang="en", toks=["b", "a", "c"]),
        Row(doc_id=1, lang="en", toks=["c", "b", "a"]),
        Row(doc_id=2, lang="en", toks=["a", "c", "b"]),
        Row(doc_id=9, lang="de", toks=["x"]),
        Row(doc_id=4, lang=None, toks=["z", "y"]),   # NULL lang: singleton
        Row(doc_id=5, lang="en", toks=None),          # NULL toks: singleton
    ]
    # repartitioned input: group members arrive from different partitions,
    # so an order-sensitive aggregate would be partition-layout-dependent
    d = spark.createDataFrame(rows).repartition(5, "doc_id")
    got = {r["gid"]: r for r in quotient_token_sets(d).collect()}
    assert set(got) == {1, 9, 4, 5}
    assert got[1]["members"] == [1, 2, 3], "members must be sorted"
    assert got[1]["toks"] == ["a", "b", "c"], "toks must be the sorted key"
    assert got[9]["members"] == [9] and got[9]["toks"] == ["x"]
    # NULL-keyed rows stay isolated singletons with their raw toks.
    # (ADVICE r14: the old `A and B or C` form parsed as `(A and B) or C`,
    # so the members check was dead code — C was always true.)
    assert got[4]["members"] == [4]
    assert got[4]["toks"] == ["z", "y"]  # passthrough, not re-sorted
    assert got[5]["members"] == [5] and got[5]["toks"] is None
    # determinism across independent evaluations (fresh plan, same rows)
    again = {r["gid"]: r for r in quotient_token_sets(d).collect()}
    assert {k: (v["members"], v["toks"]) for k, v in got.items()} == {
        k: (v["members"], v["toks"]) for k, v in again.items()
    }
