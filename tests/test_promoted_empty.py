"""Empty-corpus ORACLE parity for the round-11 promoted keys.

Before promotion these keys' empty-partition behavior was covered by
the rows-only crash gates (test_rows_only_crash_robustness's
empty_all_dir: count >= 0). Promotion moved them out of those gates,
so the empty path gets the STRONGER check here: zero-row events /
documents / embeddings through the full kernel vs the computed oracle
— the iterative kernels must converge-or-skip on nothing (kmeans' and
PQ's empty-init guards, MMR's exhausted pool, the frame sampler's
empty frame list) and the oracles must agree on the empty result.
"""

from __future__ import annotations

import duckdb
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles, all_queries

PROMOTED = [
    "llm_kmeans",
    "llm_mmr_diverse_sample",
    "llm_ann_ivf",
    "llm_ann_ivf_pq",
    "mm_frame_sample",
    "mm_binary_pipeline",
    "llm_bpe_learn",
    "llm_bpe_encode",
    "llm_graph_pagerank",
    # round-12 stream promotions: empty events → empty sink table on
    # both sides (the availableNow batch sees zero rows; complete mode
    # emits an empty aggregate)
    "stream_tumbling_ohlc",
    "stream_sliding_watermark",
    "stream_stream_join",
    "stream_transform_with_state",
    # round-13 promotion: empty embeddings → empty spectrum on both
    # sides (kernel's head(1) guard; oracle's (SELECT n FROM nn) > 0)
    "llm_pca_power",
    # round-14: trained √N-cell IVF — empty embeddings → n_u == 0
    # early-return on the kernel side, LIMIT 0 cell table in the oracle
    "llm_ann_ivf_scaled",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("promotedempty")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        if t in ("events", "documents", "embeddings"):
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("key", PROMOTED)
def test_promoted_keys_empty_corpus_parity(spark, empty_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{empty_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, empty_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()
