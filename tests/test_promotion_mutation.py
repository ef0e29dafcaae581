"""Mutation witnesses for the round-11 computed-oracle promotions.

A computed oracle is only worth its promotion if it actually PINS the
kernel's parameters and iteration structure — a green gate that would
stay green under a wrong kernel is decoration. Each test here compares
a deliberately mutated kernel (one fewer Lloyd round, a different k)
against the SHIPPED oracle — or, where the kernel hardcodes the
parameter, the SHIPPED kernel against a mutated oracle (the MMR
precedent: same comparison, one side perturbed) — and requires the
compare to FAIL, mirroring the repo's margin-narrowing mutation checks
in test_dup_density. Round 12 adds the ANN witnesses (IVF nprobe, PQ
trainer iteration count) the r11 ADVICE flagged as missing.
"""

from __future__ import annotations

import duckdb
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles
from adlspark.testing import compare


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in adl_tables.TABLES:
        c.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield c
    c.close()


def test_kmeans_oracle_pins_iteration_count(spark, sf_dir, con):
    """One fewer Lloyd round must hash-mismatch the 5-round oracle —
    the unrolled CTE chain really encodes the iteration structure."""
    from adlspark.llm.similarity import kmeans_fit

    df, _ = kmeans_fit(spark, sf_dir, k=8, iters=4)
    with pytest.raises(AssertionError):
        compare(df, con, all_oracles()["llm_kmeans"], key="llm_kmeans~mut")


def test_kmeans_oracle_pins_k(spark, sf_dir, con):
    from adlspark.llm.similarity import kmeans_fit

    df, _ = kmeans_fit(spark, sf_dir, k=7, iters=5)
    with pytest.raises(AssertionError):
        compare(df, con, all_oracles()["llm_kmeans"], key="llm_kmeans~mutk")


def test_mmr_oracle_pins_lambda(spark, sf_dir, con):
    """The repr'd lambda literals in the oracle must reject a kernel
    running a different relevance/diversity trade-off. The mutated
    SPARK side is simulated by mutating the ORACLE instead (same
    comparison, cheaper than re-running the greedy chain): a lambda
    flip changes picked ids/scores on the standard fixture."""
    from adlspark.llm.similarity import _mmr_oracle_sql, llm_mmr_diverse_sample

    df = llm_mmr_diverse_sample(spark, sf_dir)  # shipped kernel, lam=0.7
    with pytest.raises(AssertionError):
        compare(df, con, _mmr_oracle_sql(k=8, lam=0.5), key="llm_mmr~mut")
    # and the un-mutated oracle passes on the same collected frame
    compare(df, con, all_oracles()["llm_mmr_diverse_sample"], key="llm_mmr")


def test_ann_ivf_oracle_pins_nprobe(spark, sf_dir, con):
    """The IVF oracle must encode the probe-cell budget: against an
    nprobe=2 oracle the shipped nprobe=3 kernel finds neighbors in a
    third cell the oracle never searches — compare must fail. (Kernel
    hardcodes nprobe, so the oracle side is mutated, like the MMR
    lambda test.)"""
    from adlspark.llm.similarity import _ann_ivf_oracle_sql, llm_ann_ivf

    df = llm_ann_ivf(spark, sf_dir)  # shipped kernel, nprobe=3
    with pytest.raises(AssertionError):
        compare(df, con, _ann_ivf_oracle_sql(nprobe=2), key="llm_ivf~mut")
    # and the un-mutated oracle passes on the same frame
    compare(df, con, all_oracles()["llm_ann_ivf"], key="llm_ivf")


def test_ann_ivf_pq_oracle_pins_trainer_iters(spark, sf_dir, con):
    """The PQ oracle's unrolled-CTE trainer must encode the Lloyd
    round count: a 2-round oracle yields different codebooks, hence
    different ADC distances, than the shipped 3-round kernel."""
    from adlspark.llm.similarity import _pq_oracle_sql, llm_ann_ivf_pq

    df = llm_ann_ivf_pq(spark, sf_dir)  # shipped kernel, iters=3
    with pytest.raises(AssertionError):
        compare(df, con, _pq_oracle_sql(iters=2), key="llm_pq~mut")
    compare(df, con, all_oracles()["llm_ann_ivf_pq"], key="llm_pq")


def test_frame_sample_oracle_pins_stride(spark, sf_dir, con):
    from adlspark.llm.multimodal import _frame_sample_oracle_sql, mm_frame_sample

    df = mm_frame_sample(spark, sf_dir)  # shipped kernel, stride=4
    with pytest.raises(AssertionError):
        compare(
            df, con, _frame_sample_oracle_sql(stride=2), key="mm_frame~mut"
        )


def test_stream_ohlc_oracle_pins_bar_width(spark, sf_dir, con):
    """Round-12 stream promotions: the OHLC oracle must encode the
    1-day bar — a 48-hour oracle merges adjacent days into one bar
    labeled by the bucket start. (12 hours would be a NO-OP mutation:
    the DATE cast collapses both half-day buckets back to the same
    day, so the narrower width must come from the wider side.)"""
    from adlspark.streaming.streams import (
        _stream_ohlc_oracle_sql,
        stream_tumbling_ohlc,
    )

    df = stream_tumbling_ohlc(spark, sf_dir)  # shipped kernel, 1-day bars
    with pytest.raises(AssertionError):
        compare(df, con, _stream_ohlc_oracle_sql(hours=48), key="s_ohlc~mut")
    compare(
        df, con, all_oracles()["stream_tumbling_ohlc"], key="s_ohlc"
    )


def test_stream_sliding_oracle_pins_slide(spark, sf_dir, con):
    """slide == width (3600) means one window per event instead of
    two — a different histogram on any fixture."""
    from adlspark.streaming.streams import (
        _stream_sliding_oracle_sql,
        stream_sliding_watermark,
    )

    df = stream_sliding_watermark(spark, sf_dir)  # shipped, 1h/30m
    with pytest.raises(AssertionError):
        compare(
            df, con, _stream_sliding_oracle_sql(slide=3600), key="s_slide~mut"
        )
    compare(
        df, con, all_oracles()["stream_sliding_watermark"], key="s_slide"
    )


def test_stream_stream_join_oracle_pins_window(spark, sf_dir, tmp_path):
    """A 30-minute attribution oracle admits strictly more
    view→purchase pairs than the shipped 15-minute kernel. The sf
    fixtures' view→purchase deltas happen to all fall inside 15
    minutes (probed: widening to 30 is a NO-OP there and narrowing to
    5 drops nothing at sf0.001), so the witness runs on a crafted
    corpus with purchases at +10 and +20 minutes — only the +10 one
    is attributable at 15."""
    import os
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from adlspark import tables as adl_tables
    from adlspark.streaming.streams import _ssj_oracle_sql, stream_stream_join

    d = str(tmp_path / "ssjmut")
    os.makedirs(d)
    for t in adl_tables.TABLES:
        if t == "events":
            tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
            df0 = tbl.to_pandas().iloc[:3].reset_index(drop=True)
            t0 = df0.loc[0, "ts"]
            df0["user_id"] = 7
            df0["event_type"] = ["view", "purchase", "purchase"]
            df0["ts"] = [
                t0,
                t0 + pd.Timedelta(minutes=10),
                t0 + pd.Timedelta(minutes=20),
            ]
            pq.write_table(
                pa.Table.from_pandas(
                    df0, schema=tbl.schema, preserve_index=False
                ),
                os.path.join(d, "events.parquet"),
            )
        else:
            shutil.copyfile(
                os.path.join(sf_dir, f"{t}.parquet"),
                os.path.join(d, f"{t}.parquet"),
            )
    mcon = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            mcon.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        df = stream_stream_join(spark, d)  # shipped kernel, 15 min
        with pytest.raises(AssertionError):
            compare(df, mcon, _ssj_oracle_sql(window_min=30), key="s_ssj~mut")
        compare(df, mcon, all_oracles()["stream_stream_join"], key="s_ssj")
    finally:
        mcon.close()


def test_tws_oracle_pins_row_totality(spark, sf_dir, con):
    """A kernel that lost rows between micro-batches (simulated by the
    half-corpus oracle) must hash-mismatch the per-user counts."""
    from adlspark.streaming.streams import (
        _tws_oracle_sql,
        stream_transform_with_state,
    )

    df = stream_transform_with_state(spark, sf_dir)
    with pytest.raises(AssertionError):
        compare(df, con, _tws_oracle_sql(event_id_mod=2), key="s_tws~mut")
    compare(
        df, con, all_oracles()["stream_transform_with_state"], key="s_tws"
    )


def test_pca_power_oracle_pins_iteration_count(spark, sf_dir, con):
    """Round-13 promotion: the PCA oracle's unrolled power-iteration
    chain must encode the round count — one fewer matvec round yields a
    different Rayleigh value on the fixture's near-isotropic spectrum
    (measured: component-1 eigenvalue 0.027425 vs 0.027279 at sf0.001),
    so a kernel running a different budget cannot stay green."""
    from adlspark.llm.similarity import _pca_power_oracle_sql, llm_pca_power

    df = llm_pca_power(spark, sf_dir)  # shipped kernel, 16 rounds
    with pytest.raises(AssertionError):
        compare(df, con, _pca_power_oracle_sql(iters=15), key="llm_pca~mut")
    # and the component budget: a 4-component oracle drops a row
    with pytest.raises(AssertionError):
        compare(df, con, _pca_power_oracle_sql(n_comp=4), key="llm_pca~mutk")
    compare(df, con, all_oracles()["llm_pca_power"], key="llm_pca")


def _scaled_ivf_mutant(spark, sf_dir, k_delta=0, iters=2):
    """Rebuild llm_ann_ivf_scaled's pipeline with a perturbed trainer."""
    import math

    from pyspark.sql import functions as F

    from adlspark.llm.similarity import (
        _ivf_probe_search,
        kmeans_cells,
        load_embeddings,
    )

    e = load_embeddings(spark, sf_dir).select("vec_id", "embedding")
    g = e.groupBy("embedding").agg(
        F.min("vec_id").alias("gid"),
        F.sort_array(F.collect_list("vec_id")).alias("members"),
        F.count(F.lit(1)).alias("cnt"),
    ).localCheckpoint(eager=True)
    k = int(math.ceil(math.sqrt(g.count()))) + k_delta
    return _ivf_probe_search(g, kmeans_cells(spark, g, k=k, iters=iters))


def test_ann_ivf_scaled_oracle_pins_trainer_iters(spark, sf_dir, con):
    """One fewer Lloyd round in the coarse-quantizer trainer must
    hash-mismatch the 2-round unrolled oracle."""
    df = _scaled_ivf_mutant(spark, sf_dir, iters=1)
    with pytest.raises(AssertionError):
        compare(
            df, con, all_oracles()["llm_ann_ivf_scaled"],
            key="llm_ann_ivf_scaled~mut-iters",
        )


def test_ann_ivf_scaled_oracle_pins_cell_count(spark, sf_dir, con):
    """k = ceil(sqrt(N_u)) + 1 cells must hash-mismatch the oracle's
    subquery-LIMIT cell count — the dynamic k really is pinned."""
    df = _scaled_ivf_mutant(spark, sf_dir, k_delta=1)
    with pytest.raises(AssertionError):
        compare(
            df, con, all_oracles()["llm_ann_ivf_scaled"],
            key="llm_ann_ivf_scaled~mut-k",
        )
