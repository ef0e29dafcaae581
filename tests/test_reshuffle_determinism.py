"""Determinism-under-reshuffle gates for the weakest rows-only keys.

A rows-only key has no DuckDB value oracle, so the driver's check cannot
see the one failure mode an iterative/greedy kernel is most exposed to:
output that silently depends on the PHYSICAL partition layout of the
input (tie-broken argmaxes taking whichever row a scan met first,
F.first() over an unordered frame, per-partition accumulators). These
gates write the SAME logical tables under two different file layouts
(repartition(7) vs repartition(13) at write time — different scan tasks,
different row arrival order) and require bit-identical collected output.

llm_mmr_diverse_sample: greedy float-argmax chain — a dropped vec_id
tiebreak anywhere in the k rounds makes the picked set layout-dependent.
mm_frame_sample: mapInPandas over Arrow batches — any per-batch state
leaking across documents would vary with batch composition.

The harness itself is validated by a deliberately layout-sensitive probe
(distinct input file counts MUST differ between the two corpora), so a
regression that made both fixtures collapse to one layout would fail
loudly instead of testing nothing.
"""

from __future__ import annotations

import os
import shutil

import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_queries

# Keys whose determinism is STRUCTURAL (hash keys, integer counts,
# row-wise UDFs) — layout must not change a single value. Float-
# aggregating rows-only kernels (kmeans, pca, pagerank, ann_ivf) are
# deliberately absent: distributed float sums are last-bit
# order-dependent by IEEE arithmetic, so bit-identity under reshuffle
# is not their contract (their pytest parity bars allow tolerances).
KEYS = [
    "llm_mmr_diverse_sample",
    "mm_frame_sample",
    "llm_dedup_minhash",
    "mm_binary_pipeline",
    "ingest_validate_json",
    "llm_bpe_learn",
    "llm_bpe_encode",
]
LAYOUTS = (7, 13)


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory, sf_dir, spark):
    """The sf0.001 tables rewritten under two file layouts. Only the
    tables the keys under test read (documents, embeddings) are
    re-laid-out; the rest are copied so every key still loads."""
    dirs = {}
    for n in LAYOUTS:
        d = tmp_path_factory.mktemp(f"layout{n}")
        for t in adl_tables.TABLES:
            src = os.path.join(sf_dir, f"{t}.parquet")
            if t in ("documents", "embeddings"):
                (
                    spark.read.parquet(src)
                    .repartition(n)
                    .write.mode("overwrite")
                    .parquet(str(d / f"{t}.parquet"))
                )
            else:
                shutil.copyfile(src, str(d / f"{t}.parquet"))
        dirs[n] = str(d)
    return dirs


def test_layouts_actually_differ(spark, layout_dirs):
    """Sanity for the harness: the two corpora must genuinely differ in
    physical layout, or the determinism comparison is vacuous."""
    from pyspark.sql import functions as F

    counts = {
        n: (
            spark.read.parquet(os.path.join(d, "documents.parquet"))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        for n, d in layout_dirs.items()
    }
    assert counts[7] != counts[13], counts


@pytest.mark.parametrize("key", KEYS)
def test_output_invariant_under_reshuffle(spark, layout_dirs, key):
    fn = all_queries()[key]
    results = {}
    for n, d in layout_dirs.items():
        df = fn(spark, d)
        results[n] = sorted(tuple(r) for r in df.collect())
    assert results[7] == results[13], (
        f"{key} output depends on input partition layout"
    )
    assert len(results[7]) > 0, f"{key} returned no rows"
