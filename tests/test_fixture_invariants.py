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


def test_events_user_id_nonnull():
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
    assert t.column("user_id").null_count == 0, (
        "events.user_id grew NULLs — ts_ewma's run-detection kernel "
        "requires non-null user_id (adlspark/ops/timeseries.py)"
    )
