"""Graph operators over the document-similarity graph.

Beyond connected components (llm_dedup_cluster), corpus curation uses
centrality: within a near-duplicate cluster the highest-centrality copy
is the natural canonical pick, and graph-wide PageRank surfaces template
hubs (boilerplate that near-duplicates *many* other pages) that exact
dedup misses. Edges come from the MinHash band buckets — the linear-time
candidate generator — so the graph build never goes all-pairs.

The iteration follows the classic Spark PageRank shape: ranks and
out-degrees live in DataFrames keyed by node, each round is one join +
one aggregate, lineage is truncated with localCheckpoint (same
discipline as llm_dedup_cluster's label propagation). Rank mass is a
probability distribution (sums to 1); dangling-node mass is
redistributed uniformly each round, so conservation is testable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


def _band_edges(spark, sf_dir):
    """Undirected candidate edges: docs sharing any MinHash band bucket
    (4 bands x 2 rows over the 8 salted-md5 signatures). Linear in corpus
    size; bucket self-join only pairs docs inside a bucket."""
    from adlspark.llm.dedup import llm_minhash_signature

    sig = llm_minhash_signature(spark, sf_dir)
    bands = None
    for b in range(4):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.col(f"sig{2 * b}").alias("k1"),
            F.col(f"sig{2 * b + 1}").alias("k2"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    c = bands.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.k1") == F.col("c.k1"))
            & (F.col("a.k2") == F.col("c.k2"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("c.doc_id").alias("dst"))
        .distinct()
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


@query("llm_graph_pagerank", oracle=None)
def llm_graph_pagerank(spark, sf_dir):
    """PageRank over the near-duplicate candidate graph (rows-only: the
    damped float iteration has no closed SQL form). 8 Jacobi iterations,
    d=0.85, uniform teleport, dangling mass redistributed uniformly.

    Scale shape: per iteration one (node-keyed) join of ranks to edges
    and one dst-keyed aggregate — the same shuffle pattern as iterative
    CC; edge and rank partitioning is stable across rounds so AQE reuses
    the layout. The only driver-side values are the node count and the
    per-round dangling-mass scalar (two bounded aggregates), mirroring
    llm_dedup_cluster's convergence scalar. localCheckpoint truncates
    the 8-round lineage.
    """
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = _band_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    d = 0.85
    ranks = docs.select("doc_id", F.lit(1.0 / n).alias("rank"))
    for _ in range(8):
        with_deg = ranks.join(deg, ranks.doc_id == deg.src, "left").select(
            ranks.doc_id, "rank", "deg"
        )
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            with_deg.where(F.col("deg").isNotNull())
            .join(edges, with_deg.doc_id == edges.src)
            .select(F.col("dst").alias("doc_id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            docs.join(contribs, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("doc_id", F.round("rank", 9).alias("rank")).orderBy(
        F.col("rank").desc(), "doc_id"
    )
