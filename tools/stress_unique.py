#!/usr/bin/env python
"""Dup-FREE adversarial scale rung for the pair kernels (VERDICT r11
item 4 — the worst case the dup-dense stress studies never exercised).

Every prior 10×/100× rung repeated TEXTS, so quotienting (collapse
identical token/shingle sets) absorbed the blow-up. The adversarial
case for prefix-filter candidate volume is the opposite corpus: ALL
UNIQUE documents sharing one hot vocabulary — the quotient collapses
nothing, lang blocking gives nothing (one lang), and the prefix/banding
machinery must do all the pruning on its own.

Construction — a random multiset partition of the token stream:
take COPIES× the sf0.1 documents' global token occurrences, route every
occurrence to a synthetic doc by xxhash64(token, pos, doc_id, copy) %
n_new_docs, order tokens within a doc by the same hash. This preserves
the corpus's EXACT global token frequencies (the hot vocabulary, scaled
×COPIES) while destroying co-occurrence: docs are independent random
bags, so true near-dup pairs are ~zero, every doc is unique w.h.p., and
candidate volume measures pure filter quality. lang is constant 'en'
(blocking deliberately useless).

Usage:
    python tools/stress_unique.py build 1     # /tmp/sfuniq1  (~1× docs)
    python tools/stress_unique.py build 10    # /tmp/sfuniq10 (~10× docs)
    python tools/stress_unique.py run 1
    python tools/stress_unique.py run 10

run prints one JSON line per key: {key, sec, rows, candidates} where
candidates is the post-filter pre-verify pair count (prefix kernel via
prefix_filter_pairs(counters=...); minhash via the band-bucket pair
reconstruction below — the same C(k,2)-per-bucket volume the kernel's
bucket self-join pays). Sub-quadratic = candidates and sec grow ≪
COPIES² between the two rungs. Results are appended to SCALE.md by
hand with the measuring session's numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.1")

KEYS = ["llm_near_dup_pairs", "llm_ngram_jaccard", "llm_dedup_minhash"]


def dst(copies: int) -> str:
    return f"/tmp/sfuniq{copies}"


def build(spark, copies: int):
    from pyspark.sql import functions as F

    out = dst(copies)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ]:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n_docs = docs.count()
    n_new = n_docs * copies
    copies_df = spark.range(copies).select(F.col("id").alias("copy"))
    stream = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")))
        .crossJoin(copies_df)
        .select(
            F.xxhash64("col", "pos", "doc_id", "copy").alias("h"),
            F.pmod(F.xxhash64("copy", "doc_id", "pos", "col"), F.lit(n_new))
            .alias("new_id"),
            F.col("col").alias("tok"),
        )
    )
    new_docs = (
        stream.groupBy("new_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("h", "tok"))
                    ),
                    lambda s: s.getField("tok"),
                ),
            ).alias("text")
        )
        .select(
            F.col("new_id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.lit("synth").alias("source"),
            "text",
        )
    )
    # documents schema parity with the fixture (extra cols defaulted)
    fixture_cols = docs.columns
    for c in fixture_cols:
        if c not in new_docs.columns:
            new_docs = new_docs.withColumn(
                c, F.length("text") if c == "n_chars" else F.lit(None)
            )
    new_docs.select(*fixture_cols).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "documents.parquet"))
    print("built", out, "docs:", n_new)


def minhash_candidates(spark, sf_dir: str) -> dict:
    """Mirror llm_dedup_minhash's candidate stage (measurement
    scaffolding only — the kernel itself is unchanged): per-(band,
    bucket) group sizes k give the bucket self-join volume Σ C(k,2),
    plus the distinct candidate pair count after the OR over bands."""
    from pyspark.sql import functions as F

    from adlspark import tables

    n_hashes, bands = 16, 4
    rpb = n_hashes // bands
    d = (
        tables.load(spark, sf_dir, "documents")
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
                " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
            ).alias("shingles"),
        )
    )
    g = (
        d.groupBy(F.array_sort("shingles").alias("_skey"))
        .agg(F.min("doc_id").alias("gid"), F.first("shingles").alias("shingles"))
        .drop("_skey")
    )
    sh = g.select("gid", F.explode("shingles").alias("s"))
    sig = sh.groupBy("gid").agg(
        *[F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"mh{i}") for i in range(n_hashes)]
    )
    band_rows = sig.select(
        "gid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh{b * rpb + r}") for r in range(rpb)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("gid", "bb.band", "bb.bucket").localCheckpoint(eager=True)
    vol = (
        band_rows.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(F.sum(F.expr("k * (k - 1) / 2")).alias("v"))
        .collect()[0]["v"]
    )
    distinct_cands = (
        band_rows.alias("x")
        .join(
            band_rows.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.gid") < F.col("y.gid")),
        )
        .select("x.gid", "y.gid")
        .distinct()
        .count()
    )
    return {"bucket_pair_volume": int(vol or 0), "candidates": distinct_cands}


RESULTS = "/tmp/stress_unique_results.jsonl"


def run(spark, copies: int):
    """One timed pass per key. The prefix keys run the kernel WITH the
    candidate counter (one extra count() on the DISK_ONLY-persisted
    candidate frame — round 13; a MEMORY_AND_DISK materialization of
    the 268M-candidate set pinned protected storage and needed a 48 GB
    JVM), so candidates and wall-time come from the same execution.
    Results append to RESULTS as they land (a killed run keeps its
    finished keys)."""
    from adlspark import tables
    from adlspark.llm.dedup import prefix_filter_pairs
    from pyspark.sql import functions as F

    sf_dir = dst(copies)

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        with open(RESULTS, "a") as f:
            f.write(line + "\n")

    for key in KEYS:
        extra: dict = {}
        t0 = time.time()
        if key in ("llm_near_dup_pairs", "llm_ngram_jaccard"):
            tau = 0.95 if key == "llm_near_dup_pairs" else 0.30
            d = tables.load(spark, sf_dir, "documents")
            if key == "llm_near_dup_pairs":
                d = d.select(
                    "doc_id", "lang",
                    F.array_distinct(F.split("text", " ")).alias("toks"),
                )
            else:
                d = d.withColumn("_toks", F.split("text", " ")).select(
                    "doc_id", "lang",
                    F.expr(
                        "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
                        " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
                    ).alias("toks"),
                )
            counters: dict = {}
            n = prefix_filter_pairs(d, tau=tau, counters=counters).count()
            extra = {"candidates": counters["candidates"]}
            # release the DISK_ONLY candidate blocks now that the pairs
            # are materialized — one session loops multiple keys/copies
            # and would otherwise accumulate the sets (ADVICE r13)
            counters["unpersist"]()
        else:
            from adlspark import registry

            n = registry.all_queries()[key](spark, sf_dir).count()
            if key == "llm_dedup_minhash":
                extra = minhash_candidates(spark, sf_dir)
        sec = round(time.time() - t0, 2)
        emit({"key": key, "copies": copies, "sec": sec, "rows": n, **extra})


def main():
    from pyspark.sql import SparkSession

    from adlspark import session

    mode, copies = sys.argv[1], int(sys.argv[2])
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .appName(f"stress-unique-{mode}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    session.configure(spark)
    if mode == "build":
        build(spark, copies)
    else:
        run(spark, copies)


if __name__ == "__main__":
    main()
