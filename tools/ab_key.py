#!/usr/bin/env python
"""Interleaved A/B profiler for env-toggled optimizations (round 14).

The sandbox shares a host with co-tenant bursts that inflate wall-clock
2-4x for minutes at a time, so back-to-back before/after sessions (or
even 3-rep medians inside one session) confound the toggle with the
burst. This harness alternates A (toggle off) and B (toggle on) reps
WITHIN one session — each A rep is adjacent in time to a B rep, so a
burst inflates both sides equally and the pairwise ratio stays
meaningful.

Usage: ADLSPARK_AB_VAR=ADLSPARK_SPREAD python tools/ab_key.py key1 ...
       [--reps N]   (N A/B pairs per key, default 4)

A = var=0, B = var=1 (unset semantics follow the code under test).
Prints per-key: paired medians, median pairwise ratio B/A.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
            args.remove(sys.argv[i + 1])
    var = os.environ.get("ADLSPARK_AB_VAR", "ADLSPARK_SPREAD")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("ADLSPARK_SHUFFLE_PARTITIONS", "8")

    from adlspark import registry
    from adlspark.session import build_spark

    spark = build_spark("adlspark-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.groupBy("r_name").count().collect()
    warm.mapInPandas(lambda it: it, warm.schema).count()
    # full Python-worker-pool spawn outside timing (round 14; see
    # bench.py) -- without it the first full-fan-out Python key
    # absorbs ~cores x (fork + pandas import) in its own timing
    _par = spark.sparkContext.defaultParallelism
    spark.range(0, _par, 1, _par).mapInPandas(lambda it: it, "id long").count()

    def run(key: str, setting: str) -> float:
        os.environ[var] = setting
        t0 = time.time()
        queries[key](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    for key in args:
        # one unmeasured warm rep per side (codegen/plan caches)
        run(key, "0")
        run(key, "1")
        a_times, b_times, ratios = [], [], []
        for _ in range(reps):
            a = run(key, "0")
            b = run(key, "1")
            a_times.append(a)
            b_times.append(b)
            ratios.append(b / a)
        print(
            f"{key}: A(off) med {statistics.median(a_times):.3f} "
            f"B(on) med {statistics.median(b_times):.3f} "
            f"pairwise B/A med {statistics.median(ratios):.3f} "
            f"A {sorted(round(x, 2) for x in a_times)} "
            f"B {sorted(round(x, 2) for x in b_times)}",
            flush=True,
        )
    os.environ.pop(var, None)


if __name__ == "__main__":
    main()
