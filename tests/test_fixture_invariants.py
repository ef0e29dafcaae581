"""Loud round-start guards on fixture invariants the kernels rely on.

The driver regenerates /root/testdata between rounds (FIXTURES.md logs a
schema re-probe each round). Beyond physical schemas, some VALUE
invariants are load-bearing for cross-engine parity, and a silent change
would surface only as driver hash-fails:

- ``documents.text`` / ``documents.lang`` non-null. The pair kernels are
  null-safe by design (null-keyed docs become singleton identity groups
  in ``prefix_filter_pairs``; the editdist blocker filters null keys),
  but the SHINGLE builders (``ngram_jaccard``, ``containment_dedup``,
  the minhash family) map NULL text to the ``['']`` shingle set on the
  Spark side while DuckDB's ``string_split(NULL)`` yields NULL rows —
  an engine divergence that only null text can reach. If this test ever
  fires, wrap those shingle expressions in
  ``F.when(text.isNull(), None)`` before re-running the oracles.
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

import math

import pyarrow.parquet as pq
import pytest

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
    for chunk in col.chunks:
        flat = chunk.flatten()
        assert flat.null_count == 0, "embedding arrays grew NULL elements"
        for v in flat.to_pylist():
            if not math.isfinite(v):
                pytest.fail(f"non-finite embedding element: {v}")


def test_events_user_id_nonnull():
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
    assert t.column("user_id").null_count == 0, (
        "events.user_id grew NULLs — ts_ewma's run-detection kernel "
        "requires non-null user_id (adlspark/ops/timeseries.py)"
    )
