"""Mixed-dimension embedding gates (round 11 — the guard for the seam
probed in adlspark/llm/vector.py's MIXED DIMENSIONS note).

A wrong-dimension vector is the model-version-mixup reality of a 100 TB
embedding lake, and before the round-11 guard it DIVERGED silently
rather than crashing: Spark's aggregate(zip_with(...)) NULL-pads the
short side of a ragged pair and acc+NULL poisons the dot product to
NULL, while DuckDB's list_sum(list_transform(list_zip(...))) skips the
NULL products and returns the truncated partial dot. The guard draws
the domain line at the table's REFERENCE DIMENSION — the dimension of
the lowest-vec_id non-empty row, deterministic on both engines — and
drops every other row, exactly like NULL/empty rows
(load_embeddings() / O_EMB_WHERE, one edit point per engine).

Corpora:
- mixed_dim_dir: ragged rows (dim-1, dim+1, 2*dim, dim 1, and an
  identical ragged PAIR that must not acquire each other as
  neighbors) appended at high vec_ids — reference dim stays the base
  dim, ragged rows drop.
- mixed_dim_min_dir: the RAGGED row holds the minimum vec_id, so the
  reference dim is the ragged dim and the entire base corpus is out
  of domain — the adversarial direction of the same rule.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles, all_queries

SLICE = 80

# The vector-kernel keys whose Spark plan flows through
# load_embeddings() and whose oracle carries O_EMB_WHERE — derived
# from the registry so a new guarded key auto-enrolls.
def _guarded_oracle_keys():
    return sorted(
        k
        for k, s in all_oracles().items()
        if "arg_min(len(embedding)" in s
    )


GUARDED_KEYS = _guarded_oracle_keys()

# Raw array-surface keys read the embedding column WITHOUT the vector
# domain (element-wise per-row ops, no cross-row zip) — they must keep
# parity on a ragged corpus too, without any guard.
RAW_ARRAY_KEYS = ["fn_array", "fn_higher_order"]


def test_guarded_surface_is_stable():
    assert len(GUARDED_KEYS) >= 11, GUARDED_KEYS


def _write_corpus(d, sf_dir, extra_rows):
    """Copy all fixture tables, appending `extra_rows` (vec_id,
    embedding, label) to embeddings."""
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "embeddings":
            import pyarrow.compute as pc

            base = tbl.filter(
                pc.less(tbl["vec_id"], SLICE)
            ).replace_schema_metadata(None)
            sch = base.schema
            extra = pa.table(
                {
                    "vec_id": pa.array(
                        [r[0] for r in extra_rows], sch.field("vec_id").type
                    ),
                    "embedding": pa.array(
                        [r[1] for r in extra_rows],
                        sch.field("embedding").type,
                    ),
                    "label": pa.array(
                        [r[2] for r in extra_rows], sch.field("label").type
                    ),
                }
            ).select(base.column_names)
            tbl = pa.concat_tables([base, extra.cast(sch)])
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def mixed_dim_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("mixeddim")
    dim = len(
        pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )["embedding"][0]
    )
    short = [0.5] * (dim - 1)
    extra = [
        (970001, short, 0),
        (970002, short, 0),  # identical ragged pair — must never match
        (970011, [0.25] * (dim + 1), 1),
        (970021, [1.0], 2),
        (970031, [-0.75] * (2 * dim), None),
        # correct dimension but NULL id: out of domain too — Spark
        # sorts NULLs FIRST where DuckDB sorts them LAST, so a NULL id
        # would silently diverge in every ranked/argmax kernel
        (None, [0.5] * dim, 3),
    ]
    return _write_corpus(d, sf_dir, extra)


@pytest.fixture(scope="module")
def mixed_dim_min_dir(tmp_path_factory, sf_dir):
    """The ragged row takes the MINIMUM vec_id: reference dim becomes 3
    and the whole base corpus drops out of the vector domain."""
    d = tmp_path_factory.mktemp("mixeddimmin")
    extra = [
        (-7, [0.5, -0.5, 0.25], 0),
        (-3, [1.0, 0.0, 0.0], 1),
    ]
    return _write_corpus(d, sf_dir, extra)


def _ddb(corpus_dir):
    con = duckdb.connect()
    for t in adl_tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{corpus_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", GUARDED_KEYS + RAW_ARRAY_KEYS)
def test_mixed_dim_parity(spark, mixed_dim_dir, key):
    from adlspark.testing import compare

    con = _ddb(mixed_dim_dir)
    try:
        df = all_queries()[key](spark, mixed_dim_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", GUARDED_KEYS)
def test_min_row_defines_dim_parity(spark, mixed_dim_min_dir, key):
    con = _ddb(mixed_dim_min_dir)
    from adlspark.testing import compare

    try:
        df = all_queries()[key](spark, mixed_dim_min_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_guard_drops_ragged_rows(spark, mixed_dim_dir):
    """Direct statement of the domain: no ragged or NULL-id vec_id
    reaches a vector kernel, and in particular the identical ragged
    PAIR never pairs with itself."""
    rows = all_queries()["llm_knn_graph"](spark, mixed_dim_dir).collect()
    ids = {r.vec_id for r in rows} | {r.neighbor_id for r in rows}
    assert ids.isdisjoint({970001, 970002, 970011, 970021, 970031}), ids
    assert None not in ids, "NULL-id vector leaked into a kernel"


def test_min_row_defines_dim_direct(spark, mixed_dim_min_dir):
    """On the adversarial corpus the ONLY in-domain vectors are the two
    dim-3 rows — the base corpus is out of domain."""
    from adlspark.llm.vector import load_embeddings

    ids = {
        r.vec_id
        for r in load_embeddings(spark, mixed_dim_min_dir)
        .select("vec_id")
        .collect()
    }
    assert ids == {-7, -3}, ids


def test_ragged_pair_divergence_is_real(spark):
    """The mutation witness: WITHOUT the guard, a ragged dot product
    diverges between the engines (Spark NULL-poisons, DuckDB computes
    the truncated partial) — the probed seam the guard closes."""
    from pyspark.sql import functions as F

    from adlspark.llm.vector import dot, o_dot

    spark_val = (
        spark.range(1)
        .select(
            dot(
                F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)),
                F.array(F.lit(1.0), F.lit(1.0)),
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    con = duckdb.connect()
    try:
        ddb_val = con.execute(
            f"SELECT {o_dot('[1.0,2.0,3.0]', '[1.0,1.0]')}"
        ).fetchone()[0]
    finally:
        con.close()
    assert spark_val is None
    assert ddb_val == 3.0
