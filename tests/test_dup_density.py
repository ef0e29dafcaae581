"""Differential gates on a DUPLICATE-DENSE corpus.

The identity-group quotient kernels (BASELINE.md round-7 stress table;
SCALE.md "quotient everything pair-shaped") collapse identical contents
to one representative and re-expand member pairs through count-aware
margin keeps. On every standard fixture the texts and embeddings are
ALL UNIQUE (counts verified 500/500 distinct at sf0.001), so the DuckDB
oracle gates never execute the cnt>1 paths — the margin arithmetic,
sim-tie interleaving, and self-exclusion handling the quotient depends
on. These tests build the missing corpus: K=7 id-shifted copies of a
120-row slice of sf0.001, so every identity group has exactly 7 members
and every expansion path runs, then

- re-verify the HASH-ORACLE quotient keys value-exactly against DuckDB
  on that corpus (the same compare the external driver uses), and
- verify the rows-only ANN keys against inline DIRECT-FORM references
  (the pre-quotient kernels: brute probe×cell / probe×codes scans that
  share none of the quotient machinery under test), and
- check the PageRank lumping invariant (equal rank within an identity
  group) plus exact parity with a numpy power iteration on the
  EXPANDED candidate graph.

Multiplicity VARIES per row — base id with residue r (mod K) gets r+1
copies, so group sizes run 1..7 and a probe's top-k genuinely crosses
group boundaries (uniform multiplicity would let every probe fill its
top-5 from its own siblings, leaving the cross-group interleave and
margin arithmetic untested). K is odd and coprime-ish to the probe
modulus (vec_id % 100) so probe membership lands unevenly across
groups — some groups contain probes, some several, some none.
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

K_COPIES = 7
SLICE = 120  # base rows kept per duplicated table (oracle cost control)


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory, sf_dir):
    """K_COPIES id-shifted copies of a sf0.001 slice for documents and
    embeddings; every other table copied through unchanged."""
    d = tmp_path_factory.mktemp("dupcorpus")
    for t in adl_tables.TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        tbl = pq.read_table(src)
        if t in ("documents", "embeddings"):
            key = "doc_id" if t == "documents" else "vec_id"
            df = tbl.to_pandas()
            df = df[df[key] < SLICE].reset_index(drop=True)
            stride = int(df[key].max()) + 1
            parts = []
            for i in range(K_COPIES):
                # copy i keeps rows whose residue is >= i: residue-r rows
                # end up with r+1 members — group sizes 1..K_COPIES
                c = df[df[key] % K_COPIES >= i].copy()
                c[key] = c[key] + i * stride
                parts.append(c)
            out = pd.concat(parts, ignore_index=True)
            pq.write_table(
                pa.Table.from_pandas(out, schema=pa.schema(
                    [tbl.schema.field(n) for n in df.columns]
                ), preserve_index=False),
                str(d / f"{t}.parquet"),
            )
        else:
            pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dup_ddb(dup_dir):
    con = duckdb.connect()
    for t in adl_tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{dup_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# every quotiented kernel that carries a DuckDB value oracle
ORACLE_KEYS = [
    "llm_knn_label",
    "llm_knn_graph",
    "llm_minhash_estimate",
    "llm_sim_threshold_join",
    "llm_embed_near_dup",
    "llm_dedup_editdist",
    "llm_near_dup_pairs",
    "llm_ngram_jaccard",
    "llm_containment_dedup",
    "llm_dedup_exact",
    "llm_contamination_check",
    # round-11 computed-oracle promotions: the duplicate-density corpus
    # is the one standard corpus with identical embeddings (group sizes
    # 1..K), so the promoted iterative/greedy/search oracles must hold
    # here too (llm_ann_ivf additionally has the direct-form reference
    # test below)
    "llm_kmeans",
    "llm_mmr_diverse_sample",
    "llm_ann_ivf",
    "llm_ann_ivf_pq",
    "mm_frame_sample",
    "mm_binary_pipeline",
]


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_keys_on_dup_corpus(spark, dup_dir, dup_ddb, key):
    from adlspark.testing import compare

    df = all_queries()[key](spark, dup_dir)
    compare(df, dup_ddb, all_oracles()[key], key=key)
    # sanity: the corpus actually spans multiplicities 1..K_COPIES
    from pyspark.sql import functions as F

    sizes = (
        spark.read.parquet(f"{dup_dir}/embeddings.parquet")
        .groupBy("embedding")
        .count()
        .agg(F.min("count"), F.max("count"))
        .first()
    )
    assert (sizes[0], sizes[1]) == (1, K_COPIES)


def _direct_ann_ivf(spark, sf_dir):
    """Pre-quotient reference: brute probe × assigned-cell scan (shares
    no code with the quotient keep/expansion under test)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adlspark.llm.vector import cosine

    e = adl_tables.load(spark, sf_dir, "embeddings")
    expl = e.select("label", F.posexplode("embedding")).select(
        "label", "pos", F.col("col").cast("double").alias("val")
    )
    cent = (
        expl.groupBy("label", "pos")
        .agg(  # exact-decimal mean: mirrors the round-11 kernel change
            F.round(
                F.sum(F.col("val").try_cast("decimal(38,6)")).cast("double")
                / F.count(F.col("val").try_cast("decimal(38,6)")),
                9,
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pc", lambda s: s.getField("c")).alias("centroid"),
        )
    )
    assign_w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.col("cell"))
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cell",
            cosine(F.col("embedding"), F.col("centroid")).alias("csim"),
        )
        .withColumn("r", F.row_number().over(assign_w))
        .where(F.col("r") == 1)
        .drop("r", "csim")
    )
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    probe_cells = (
        probes.crossJoin(F.broadcast(cent))
        .select(
            "probe_id",
            "pe",
            "cell",
            cosine(F.col("pe"), F.col("centroid")).alias("csim"),
        )
        .withColumn("r", F.row_number().over(
            Window.partitionBy("probe_id").orderBy(F.desc("csim"), F.col("cell"))
        ))
        .where(F.col("r") <= 3)
        .select("probe_id", "pe", "cell")
    )
    cands = probe_cells.join(assigned, on="cell").where(
        F.col("vec_id") != F.col("probe_id")
    )
    sim = cosine(F.col("pe"), F.col("embedding"))
    w_nn = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        cands.select(
            "probe_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rnk", F.row_number().over(w_nn))
        .where(F.col("rnk") <= 10)
    )


def test_ann_ivf_dup_parity(spark, dup_dir):
    got = sorted(map(tuple, all_queries()["llm_ann_ivf"](spark, dup_dir).collect()))
    want = sorted(map(tuple, _direct_ann_ivf(spark, dup_dir).collect()))
    assert got == want


def test_ann_ivf_pq_dup_parity(spark, dup_dir):
    """Direct reference: exhaustive numpy ADC scan from the same trained
    codebook (pq_fit is deterministic), in the round-11 integer domain:
    exact int64 distances on the pq_quantize grid, de-scaled once for
    the reported double (no rounding discipline needed — ints are
    exact)."""
    from adlspark.llm.similarity import PQ_SCALE, pq_fit, pq_quantize

    codebook, sub = pq_fit(spark, dup_dir)
    cb = np.asarray(codebook, dtype=np.int64)
    m = cb.shape[0]
    rows = (
        adl_tables.load(spark, dup_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.asarray([r.vec_id for r in rows], dtype=np.int64)
    vecs = np.asarray([np.asarray(r.embedding, np.float64) for r in rows])
    # encode exactly like _pq_encode_udf: per subspace argmin distance
    splits = pq_quantize(vecs).reshape(len(ids), m, sub)
    codes = np.empty((len(ids), m), dtype=np.int64)
    for ms in range(m):
        d2 = ((splits[:, ms, None, :] - cb[None, ms, :, :]) ** 2).sum(axis=2)
        codes[:, ms] = d2.argmin(axis=1)
    probe_mask = ids % 100 == 0
    want = []
    for p in np.where(probe_mask)[0]:
        lut = ((splits[p][:, None, :] - cb) ** 2).sum(axis=2)  # (m, k)
        dist = np.zeros(len(ids), dtype=np.int64)
        for ms in range(m):
            dist += lut[ms, codes[:, ms]]
        dist_d = dist.astype(np.float64) / (float(PQ_SCALE) * float(PQ_SCALE))
        order = np.lexsort((ids, dist_d))[:10]
        for rnk, j in enumerate(order, start=1):
            want.append((int(ids[p]), int(ids[j]), float(dist_d[j]), rnk))
    got = sorted(
        map(tuple, all_queries()["llm_ann_ivf_pq"](spark, dup_dir).collect())
    )
    assert got == sorted(want)


def test_pagerank_lumping_on_dup_corpus(spark, dup_dir):
    """(a) identical-text docs (graph-automorphic) get EQUAL rank;
    (b) the lumped ranks match a numpy power iteration on the fully
    EXPANDED candidate graph — the same parity bar the standard-corpus
    test pins, here with 7-member orbits actually present."""
    from adlspark.llm.graph import _band_edges

    rows = all_queries()["llm_graph_pagerank"](spark, dup_dir).collect()
    got = {r.doc_id: r["rank"] for r in rows}
    n = len(got)
    docs = adl_tables.load(spark, dup_dir, "documents").select("doc_id", "text")
    for grp in (
        docs.groupBy("text").agg({"doc_id": "collect_list"}).collect()
    ):
        members = grp["collect_list(doc_id)"]
        assert len(members) == (min(members) % K_COPIES) + 1
        ranks = {got[m] for m in members}
        assert len(ranks) == 1, f"orbit rank split: {ranks}"

    ids = sorted(got)
    idx = {v: i for i, v in enumerate(ids)}
    edges = [(r.src, r.dst) for r in _band_edges(spark, dup_dir).collect()]
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        dm = r[deg == 0].sum()
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[idx[t]] += r[idx[s]] / deg[idx[s]]
        r = (1.0 - d) / n + d * (inflow + dm / n)
    spark_vec = np.array([got[v] for v in ids])
    assert np.abs(spark_vec - r).max() < 1e-9


def test_prefix_df_diagnostic_separates_the_rungs(spark, sf_dir):
    """The SCALE.md round-12 rung-selection rule as executable code:
    the fixture's 3-SHINGLE prefixes are df-sparse (the exact rung's
    domain) while UNIGRAM prefixes over the same 31-word vocabulary
    read saturated — prefix_df_median must separate the two, with the
    saturation constant between them."""
    from pyspark.sql import functions as F

    from adlspark import tables
    from adlspark.llm.dedup import PREFIX_DF_SATURATION, prefix_df_median

    docs = tables.load(spark, sf_dir, "documents")
    shingled = docs.withColumn("_toks", F.split("text", " ")).select(
        "doc_id", "lang",
        F.expr(
            "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
            " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
        ).alias("toks"),
    )
    unigram = docs.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    sparse = prefix_df_median(shingled, tau=0.30)
    saturated = prefix_df_median(unigram, tau=0.30)
    assert sparse < PREFIX_DF_SATURATION <= saturated, (sparse, saturated)
    # degenerate corpus: no rows -> 0.0, not a crash
    assert prefix_df_median(unigram.where(F.lit(False)), tau=0.30) == 0.0
    # round 13: the rule is now self-dispatching — near_dup() must route
    # the df-sparse shingle domain to the exact rung and the saturated
    # unigram domain to the LSH rung (full ladder tests in
    # tests/test_near_dup_auto.py)
    from adlspark.llm.dedup import near_dup

    info = {}
    near_dup(shingled, tau=0.30, route_info=info)
    assert info["route"] == "exact_prefix", info
    info = {}
    near_dup(unigram, tau=0.30, route_info=info)
    assert info["route"] == "minhash_lsh", info
