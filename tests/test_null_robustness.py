"""Null/NaN-key robustness gates for the pair kernels (round-7 review).

The standard fixtures are null-free (tests/test_fixture_invariants.py
pins that), so the SQL-null semantics of the quotient kernels were
unverified: Spark ``groupBy`` treats NULL keys as EQUAL while every
equi-join — the unquotiented kernels and all the DuckDB oracles — drops
NULL-keyed rows, and Spark orders NaN ABOVE every numeric so a
``sq_norm > 0`` guard alone admits NaN embeddings. Before the fixes,
two null-text documents formed one identity group and the expansion
invented distance-0 / jaccard-1.0 / same-component answers no reference
emits; two NaN-embedding rows emitted a sim-1.0 within pair.

These tests build corpora that CONTAIN such rows and re-run the exact
driver compare (hash parity vs the DuckDB oracle), so the null paths
stay load-bearing. NULL-TEXT rows are excluded from the shingle-based
keys (ngram_jaccard / containment): their builders map NULL text to the
``['']`` shingle set on the Spark side — a known, fixture-guarded
engine divergence documented in test_fixture_invariants.py — so those
keys are gated on the null-LANG corpus only, where shingles are equal
and non-null and the lang key carries the null.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles, all_queries

SLICE = 60  # base rows kept (oracle cost control)


def _corpus(tmp_path_factory, sf_dir, name, mutate_documents=None,
            mutate_embeddings=None):
    d = tmp_path_factory.mktemp(name)
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "documents" and mutate_documents is not None:
            df = tbl.to_pandas()
            df = df[df["doc_id"] < SLICE].reset_index(drop=True)
            df = mutate_documents(df)
            tbl = pa.Table.from_pandas(
                df, schema=tbl.schema, preserve_index=False
            )
        if t == "embeddings" and mutate_embeddings is not None:
            df = tbl.to_pandas()
            df = df[df["vec_id"] < SLICE].reset_index(drop=True)
            df = mutate_embeddings(df)
            tbl = pa.Table.from_pandas(
                df, schema=tbl.schema, preserve_index=False
            )
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_text_dir(tmp_path_factory, sf_dir):
    """Three NULL-text docs sharing a lang, two sharing another: a merged
    null identity group would emit pairs / a 3-member component."""

    def mut(df):
        extra = pd.DataFrame(
            {
                "doc_id": [900001, 900002, 900003, 900011, 900012],
                "text": [None] * 5,
                "lang": ["en", "en", "en", "de", "de"],
                "source": ["nulltest"] * 5,
                "n_chars": [0] * 5,
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "nulltext", mutate_documents=mut)


@pytest.fixture(scope="module")
def null_lang_dir(tmp_path_factory, sf_dir):
    """Pairs of IDENTICAL-text docs with NULL lang: identical token/
    shingle sets, so only the NULL lang key separates them — the exact
    case where groupBy-null-equality diverges from join semantics."""

    def mut(df):
        t0 = df.loc[0, "text"]
        extra = pd.DataFrame(
            {
                "doc_id": [910001, 910002, 910003],
                "text": [t0, t0, "unique null-lang text " * 3],
                "lang": [None, None, None],
                "source": ["nulltest"] * 3,
                "n_chars": [len(t0), len(t0), 66],
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "nulllang", mutate_documents=mut)


@pytest.fixture(scope="module")
def nan_embed_dir(tmp_path_factory, sf_dir):
    """Two identical NaN-element embeddings and two identical zero-norm
    embeddings: with `NaN > 0` TRUE in Spark, an unguarded within-group
    expansion emits sim-1.0 pairs the direct computation never does."""

    def mut(df):
        dim = len(df.loc[0, "embedding"])
        nan_vec = np.zeros(dim, dtype=np.float32)
        nan_vec[0] = np.nan
        zero_vec = np.zeros(dim, dtype=np.float32)
        extra = pd.DataFrame(
            {
                "vec_id": [920001, 920002, 920011, 920012],
                "embedding": [nan_vec, nan_vec.copy(), zero_vec,
                              zero_vec.copy()],
                "label": np.int32([0, 0, 1, 1]),
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "nanembed", mutate_embeddings=mut)


def _ddb(corpus_dir):
    con = duckdb.connect()
    for t in adl_tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{corpus_dir}/{t}.parquet')"
        )
    return con


NULL_TEXT_KEYS = [
    "llm_dedup_exact",
    "llm_near_dup_pairs",
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    "llm_graph_triangles",
    "llm_dedup_editdist",
]

NULL_LANG_KEYS = [
    "llm_near_dup_pairs",
    "llm_ngram_jaccard",
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    "llm_graph_triangles",
    "llm_dedup_editdist",
]


@pytest.mark.parametrize("key", NULL_TEXT_KEYS)
def test_null_text_parity(spark, null_text_dir, key):
    from adlspark.testing import compare

    con = _ddb(null_text_dir)
    try:
        df = all_queries()[key](spark, null_text_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", NULL_LANG_KEYS)
def test_null_lang_parity(spark, null_lang_dir, key):
    from adlspark.testing import compare

    con = _ddb(null_lang_dir)
    try:
        df = all_queries()[key](spark, null_lang_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_nan_zero_norm_embedding_parity(spark, nan_embed_dir):
    from adlspark.testing import compare

    con = _ddb(nan_embed_dir)
    try:
        df = all_queries()["llm_sim_threshold_join"](spark, nan_embed_dir)
        compare(
            df, con, all_oracles()["llm_sim_threshold_join"],
            key="llm_sim_threshold_join",
        )
    finally:
        con.close()


def test_null_docs_are_singleton_components(spark, null_text_dir):
    """Direct statement of the semantic: null-text docs each form their
    own component of size 1 (no invented identity clique)."""
    rows = all_queries()["llm_dedup_cluster"](spark, null_text_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    for did in (900001, 900002, 900003, 900011, 900012):
        assert by_id[did].component == did
        assert by_id[did].component_size == 1
