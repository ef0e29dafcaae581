"""Loud round-start guards on fixture invariants the kernels rely on.

The driver regenerates /root/testdata between rounds (FIXTURES.md logs a
schema re-probe each round). Beyond physical schemas, some VALUE
invariants are load-bearing for cross-engine parity, and a silent change
would surface only as driver hash-fails:

- ``documents.text`` / ``documents.lang`` non-null. The pair kernels are
  null-safe by design (null-keyed docs become singleton identity groups
  in ``prefix_filter_pairs``; the editdist blocker filters null keys),
  and the shingle family agrees with DuckDB on NULL text (both engines'
  concat_ws swallows NULLs into the [''] shingle set — pinned by
  tests/test_null_robustness.py). This invariant remains the guard for
  the text keys NOT in that suite's key lists (bloom, incremental,
  cross_source, tfidf, the quality scores …): if it fires, extend the
  null-corpus key lists there before trusting the driver round.
- ``embeddings.embedding`` non-null with finite elements. The block
  kernels materialize embedding payloads as dense numpy matrices
  (``np.asarray`` over arrow lists) — a None row degrades the matrix to
  object dtype and a NaN element poisons every dot product downstream
  of it (the within-group guards handle NaN, the cross paths drop NaN
  sims numerically, but recall/centroid keys would silently shift).
- ``events.user_id`` non-null — the ts_ewma run-detection kernel
  asserts this (timeseries.py); failing here is earlier and clearer.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def test_documents_text_lang_nonnull():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text", "lang"])
    assert t.column("text").null_count == 0, (
        "documents.text grew NULLs — see module docstring for the "
        "shingle-[''] divergence this unlocks"
    )
    assert t.column("lang").null_count == 0, "documents.lang grew NULLs"


def test_embeddings_nonnull_finite():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    col = t.column("embedding")
    assert col.null_count == 0, "embeddings.embedding grew NULL rows"
    flat = col.combine_chunks().flatten()
    assert flat.null_count == 0, "embedding arrays grew NULL elements"
    vals = flat.to_numpy(zero_copy_only=False)
    bad = ~np.isfinite(vals)
    assert not bad.any(), f"non-finite embedding elements: {vals[bad][:5]}"


def test_embeddings_uniform_dimension():
    """The vector kernels' implicit input contract (vector.py): all
    non-empty embeddings share ONE dimension. A ragged pair would not
    crash but silently DIVERGE (probed round 11: Spark's
    aggregate(zip_with) NULL-poisons the dot product where DuckDB's
    list_sum skips the NULL pads and returns a truncated partial), so
    the precondition must hold at every tested SF until the round-12
    dimension guard lands in O_EMB_WHERE/load_embeddings."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        t = pq.read_table(
            f"/root/testdata/{sf}/embeddings.parquet", columns=["embedding"]
        )
        col = t.column("embedding").combine_chunks()
        offs = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        dims = set(int(d) for d in np.unique(offs) if d > 0)
        assert len(dims) <= 1, f"{sf}: mixed embedding dims {sorted(dims)}"


def test_events_user_id_nonnull():
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
    assert t.column("user_id").null_count == 0, (
        "events.user_id grew NULLs — ts_ewma's run-detection kernel "
        "requires non-null user_id (adlspark/ops/timeseries.py)"
    )


def test_oracle_sentinels_outside_fixture_domain():
    """The hostile-corpus oracle sentinels (round-7 waves 4-6) coalesce
    nullable window keys to out-of-domain values as a workaround for
    DuckDB 1.0's nondeterministic window sort over NULL keys. If a
    regenerated fixture ever CONTAINS a sentinel value, the oracle
    would silently merge the sentinel group with real rows while Spark
    keeps them apart — fail loudly here instead. Sentinels in use:
    -1 (user_id / custkey / nationkey), chr(1) (event_type /
    mktsegment / orderstatus), 1900-01-01 (ts / orderdate),
    -infinity / -1e15 (value / totalprice / acctbal)."""
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    uid = ev.column("user_id").to_numpy(zero_copy_only=False)
    assert uid.min() > -1, "events.user_id reached the -1 sentinel"
    ets = set(ev.column("event_type").to_pylist())
    assert "\x01" not in ets, "events.event_type contains chr(1)"
    ts = ev.column("ts").to_numpy(zero_copy_only=False)
    assert ts.min() > np.datetime64("1901-01-01"), (
        "events.ts reached the 1900 sentinel era"
    )

    o = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice",
                 "o_orderstatus"],
    )
    assert o.column("o_custkey").to_numpy(zero_copy_only=False).min() > -1
    assert o.column(
        "o_orderdate"
    ).to_numpy(zero_copy_only=False).min() > np.datetime64("1901-01-01")
    assert o.column(
        "o_totalprice"
    ).to_numpy(zero_copy_only=False).min() > -1e14
    assert "\x01" not in set(o.column("o_orderstatus").to_pylist())

    c = pq.read_table(
        f"{SF_DIR}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    assert c.column("c_custkey").to_numpy(zero_copy_only=False).min() > -1
    assert c.column("c_nationkey").to_numpy(zero_copy_only=False).min() > -1
    assert np.isfinite(
        c.column("c_acctbal").to_numpy(zero_copy_only=False)
    ).all(), "c_acctbal contains non-finite values (the -inf sentinel)"
    assert "\x01" not in set(c.column("c_mktsegment").to_pylist())


def test_measure_columns_nan_free():
    """Every decimal-exact oracle (o_dsum / o_davg) casts measures to
    DECIMAL(38,6), and DuckDB ERRORS casting NaN to DECIMAL while
    Spark silently yields NULL — a single NaN measure would crash
    ~100 oracles with an asymmetric failure. The fixtures have never
    shipped NaN; this fails loudly the round they do (then the fix is
    an isnan guard inside o_dsum, proven observation-equivalent)."""
    checks = [
        ("events", ["value"]),
        ("lineitem", ["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax"]),
        ("orders", ["o_totalprice"]),
        ("customer", ["c_acctbal"]),
    ]
    for table, cols in checks:
        t = pq.read_table(f"{SF_DIR}/{table}.parquet", columns=cols)
        for col in cols:
            arr = t.column(col).to_numpy(zero_copy_only=False).astype(
                "float64"
            )
            # NULLs arrive as NaN through to_numpy; distinguish via
            # arrow null_count — only TRUE NaN payloads should fail
            n_null = t.column(col).null_count
            n_bad = int((~np.isfinite(arr)).sum())
            assert n_bad == n_null, (
                f"{table}.{col} contains {n_bad - n_null} non-finite "
                "(NaN/inf) values — o_dsum oracles will crash "
                "asymmetrically"
            )


def test_compaction_invariants(spark):
    """The corpus-derivable half of lake_compact_small_files (the
    physical file/byte stats are writer-environment functions — the
    docstring's rows-only cause): compaction conserves bytes and rows,
    strictly reduces file count on the 64-way fragmented staging, and
    the output file count respects the ceil(bytes/target) sizing."""
    import math

    from adlspark.registry import all_queries

    rows = {
        r["phase"]: r
        for r in all_queries()["lake_compact_small_files"](
            spark, SF_DIR
        ).collect()
    }
    before, after = rows["before"], rows["after"]
    assert before["n_files"] == 64
    assert after["n_files"] < before["n_files"]
    assert after["n_files"] == max(
        1, math.ceil(before["total_bytes"] / (8 * 1024 * 1024))
    )
    # bytes shrink (the 64 dropped footers dominate tiny files — the
    # very pathology the key demonstrates), and ROWS are conserved
    # exactly through the rewrite
    assert after["total_bytes"] <= before["total_bytes"]
    from adlspark.io.ingest import work_dir
    import os

    base = work_dir(SF_DIR, "compaction")
    n_in = spark.read.parquet(os.path.join(base, "fragmented")).count()
    n_out = spark.read.parquet(os.path.join(base, "compacted")).count()
    assert n_in == n_out > 0


def test_vacuum_invariants(spark):
    """Corpus-derivable half of lake_vacuum_orphans: exactly one
    orphan batch (b1, the aborted ingest), coalesce(1) staging gives
    one file per batch, and reclaimable bytes are positive iff events
    rows were staged."""
    from adlspark.registry import all_queries

    rows = all_queries()["lake_vacuum_orphans"](spark, SF_DIR).collect()
    by = {(r["batch"], r["status"]): r for r in rows}
    assert set(by) == {
        ("b0", "referenced"),
        ("b1", "orphan"),
        ("b2", "referenced"),
    }
    for r in rows:
        assert r["n_files"] == 1
    assert by[("b1", "orphan")]["bytes_reclaimable"] > 0
