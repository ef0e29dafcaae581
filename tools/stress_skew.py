#!/usr/bin/env python
"""Skew-stressed 10x scale study (BASELINE.md appendix).

Builds /tmp/sfx10skew from sf0.1 with two injected pathologies on top of
the 10x key-shifted union used by the plain stress study:

- events: ONE user (user_id=7) owns ~20% of all events — the hot-key
  shape that breaks an unsalted shuffle join or groupBy.
- documents: ONE lang ('en') holds ~90% of all docs — degenerate
  blocking for the lang-blocked pair kernels.
- embeddings: plain 10x key-shifted union (pair kernels read it).

Tables not under stress (region..lineitem) are copied 1x so every
registry key still loads. Run:

    python tools/stress_skew.py build   # write /tmp/sfx10skew
    python tools/stress_skew.py run     # time the skew-sensitive keys

Output: one JSON line per key {key, sec, rows} — paste into BASELINE.md.
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
# STRESS_PLAIN=1 skips both skew injections (plain 10x key-shifted union —
# the BASELINE.md first stress table's dataset shape)
PLAIN = os.environ.get("STRESS_PLAIN", "") == "1"
COPIES = int(os.environ.get("STRESS_COPIES", "10"))
# Hot-user intensity: every event with event_id % STRESS_HOT_MOD == 0 is
# remapped to the hot user — 5 gives the original ~20% hot user, 2 gives
# the round-8 hot-KEY ladder's 50% (half of all events in ONE window
# partition, the shape that exposes single-task stragglers in every
# PARTITION BY user_id kernel).
HOT_MOD = int(os.environ.get("STRESS_HOT_MOD", "5"))
DST = os.environ.get(
    "STRESS_DST",
    f"/tmp/sfx{COPIES}plain"
    if PLAIN
    else (f"/tmp/sfx{COPIES}skew" if HOT_MOD == 5 else f"/tmp/sfx{COPIES}hot{HOT_MOD}"),
)
HOT_USER = 7
HOT_LANG = "en"

# Skew-sensitive keys: the salted join + hot-user aggregations over
# events, and the lang-blocked pair/text kernels over documents.
# Override with STRESS_KEYS="k1,k2" for targeted studies.
KEYS = [
    "join_skew_salted",
    "ts_session",
    "ts_dedup",
    "agg_count_distinct",
    "llm_dedup_exact",
    "llm_top_terms",
    "llm_tfidf",
    "llm_lang_partition_pipeline",
    "llm_near_dup_pairs",
    "llm_ngram_jaccard",
    "llm_sim_threshold_join",
]


def build(spark):
    from pyspark.sql import functions as F

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)

    # untouched tables: 1x copy (keys outside the study still load)
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ]:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )

    def shifted_union(name, key_cols):
        base = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        n = base.count()
        parts = []
        for i in range(COPIES):
            c = base
            for k in key_cols:
                c = c.withColumn(k, (F.col(k) + F.lit(i * n)).cast("long"))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # events: 10x, then ~20% of rows remapped to the hot user
    ev = shifted_union("events", ["event_id"])
    if not PLAIN:
        ev = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % HOT_MOD == 0, F.lit(HOT_USER)).otherwise(
                F.col("user_id")
            ),
        )
    ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DST, "events.parquet")
    )

    # documents: 10x, ~90% of docs forced into one lang
    docs = shifted_union("documents", ["doc_id"])
    if not PLAIN:
        docs = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 10 != 0, F.lit(HOT_LANG)).otherwise(
                F.col("lang")
            ),
        )
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DST, "documents.parquet")
    )

    emb = shifted_union("embeddings", ["vec_id"])
    emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DST, "embeddings.parquet")
    )
    print("built", DST)


def run(spark):
    from adlspark import registry

    qs = registry.all_queries()
    keys = [
        k for k in os.environ.get("STRESS_KEYS", "").split(",") if k
    ] or KEYS
    # warm
    spark.read.parquet(os.path.join(DST, "region.parquet")).count()
    for k in keys:
        t0 = time.monotonic()
        df = qs[k](spark, DST)
        df.write.format("noop").mode("overwrite").save()
        print(
            json.dumps(
                {"key": k, "sec": round(time.monotonic() - t0, 2)}
            ),
            flush=True,
        )


def main():
    os.environ.setdefault("ADLSPARK_SHUFFLE_PARTITIONS", "32")
    from adlspark.session import build_spark

    spark = build_spark("stress-skew", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else "build+run"
    if "build" in mode:
        build(spark)
    if "run" in mode:
        run(spark)


if __name__ == "__main__":
    main()
