#!/usr/bin/env python
"""Per-key micro-profiler for the optimization rounds: times a key's
end-to-end noop write N times (median), and can emit the formatted plan.

Usage: python tools/profile_key.py key1 key2 ... [--plan] [--reps N]
Writes plans to plans/r14/<key>_<tag>.txt when --plan is given
(tag from $PROFILE_PLAN_TAG, default 'before').

Separate from bench.py on purpose: bench.py is the driver contract and
must stay byte-stable; this is an iterate-fast tool.
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
    want_plan = "--plan" in sys.argv
    reps = 3
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
            args.remove(sys.argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("ADLSPARK_SHUFFLE_PARTITIONS", "8")
    tag = os.environ.get("PROFILE_PLAN_TAG", "before")

    from adlspark import registry
    from adlspark.session import build_spark

    spark = build_spark("adlspark-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    # same warm-up as bench.py
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.groupBy("r_name").count().collect()
    warm.mapInPandas(lambda it: it, warm.schema).count()
    # full Python-worker-pool spawn outside timing (round 14; see
    # bench.py) -- without it the first full-fan-out Python key
    # absorbs ~cores x (fork + pandas import) in its own timing
    _par = spark.sparkContext.defaultParallelism
    spark.range(0, _par, 1, _par).mapInPandas(lambda it: it, "id long").count()
    # warm the control
    queries["join_inner"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def time_once(k: str) -> float:
        t0 = time.monotonic()
        df = queries[k](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    ctrl = [time_once("join_inner") for _ in range(2)]
    print(f"control join_inner: {[round(c,3) for c in ctrl]}", flush=True)

    for k in args:
        ts = [time_once(k) for _ in range(reps)]
        print(
            f"{k}: median {statistics.median(ts):.3f}  runs "
            f"{[round(t, 3) for t in ts]}",
            flush=True,
        )
        if want_plan:
            os.makedirs(os.path.join(REPO, "plans", "r14"), exist_ok=True)
            df = queries[k](spark, sf_dir)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(REPO, "plans", "r14", f"{k}_{tag}.txt"), "w"
            ) as f:
                f.write(p)
            print(f"  plan -> plans/r14/{k}_{tag}.txt", flush=True)


if __name__ == "__main__":
    main()
