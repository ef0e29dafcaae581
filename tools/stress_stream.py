#!/usr/bin/env python
"""Hot-key ladder for the STREAMING state stores (round 9; BASELINE.md).

The batch window/timeseries families got a 50%-hot-user sweep in round 8
(it found the ts_velocity_features super-linearity); this applies the
same probe to the stateful streaming operators, recording STATE-STORE
rows/bytes per key alongside wall-clock — the quantity that decides
whether a hot key can sink a long-running stream even when per-batch
wall-clock looks fine.

Fixtures (built by tools/stress_skew.py with STRESS_HOT_MOD=2):
    /tmp/sfx10hot2   10x events (1M rows),  user 7 owns 50%
    /tmp/sfx100hot2  100x events (10M rows), user 7 owns 50%

Keys: stream_session_window, stream_stateful_count,
stream_dedup_watermark run STOCK (their memory sinks hold per-user /
per-id summaries or the deduped rows, which fit the study driver).
stream_stream_join runs stock at 10x; at 100x its OUTPUT is the
problem, not its state — the hot user's view x purchase pairs within
the 15-minute band are ~670M rows (measured via DuckDB upper bound),
which no sink should materialize in a diagnostic — so the study runs
the SAME plan (imported helpers, same banding) into a noop sink to
measure state growth without output materialization.

Run:  python tools/stress_stream.py [sfx10hot2|sfx100hot2|both]
Output: one JSON line per (key, fixture):
    {key, fixture, sec, out_rows, batches,
     state: [{operator, rows, bytes, dropped_by_watermark}, ...]}
Paste the table into BASELINE.md (the round protocol's stress record).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the dedup key's memory sink holds every distinct event row at 100x
# (10M rows); give the study JVM headroom before build_spark reads it
os.environ.setdefault("ADLSPARK_DRIVER_MEM", "24g")
os.environ.setdefault("ADLSPARK_SHUFFLE_PARTITIONS", "32")

STOCK_KEYS = [
    "stream_session_window",
    "stream_stateful_count",
    "stream_dedup_watermark",
]


def state_summary(progress: list) -> tuple[list, int]:
    """Per-operator MAX state rows/bytes across batches + batch count."""
    ops: dict[str, dict] = {}
    n_batches = 0
    for p in progress:
        n_batches += 1
        for so in p.get("stateOperators") or []:
            name = so.get("operatorName", "?")
            cur = ops.setdefault(
                name, {"operator": name, "rows": 0, "bytes": 0,
                       "dropped_by_watermark": 0}
            )
            cur["rows"] = max(cur["rows"], so.get("numRowsTotal") or 0)
            cur["bytes"] = max(cur["bytes"], so.get("memoryUsedBytes") or 0)
            cur["dropped_by_watermark"] += so.get("numRowsDroppedByWatermark") or 0
    return list(ops.values()), n_batches


def run_stock(spark, key: str, sf_dir: str) -> dict:
    from adlspark import registry
    from adlspark.streaming import streams

    qfn = registry.all_queries()[key]
    t0 = time.monotonic()
    out_rows = qfn(spark, sf_dir).count()
    sec = round(time.monotonic() - t0, 1)
    state, n_batches = state_summary(streams.LAST_QUERY_PROGRESS)
    return {"key": key, "sec": sec, "out_rows": out_rows,
            "batches": n_batches, "state": state}


def run_ss_join_noop(spark, sf_dir: str) -> dict:
    """stream_stream_join's exact plan (streams.py) into a noop sink —
    state measurement only; see module docstring for why the stock
    memory sink is not run at 100x."""
    from pyspark.sql import functions as F

    from adlspark.ops.banding import banded_assignments, time_bucket
    from adlspark.streaming.streams import events_stream

    BUCKET_US = 900 * 1000000
    ev = events_stream(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.explode(banded_assignments("ts", BUCKET_US)).alias("jb"),
        )
        .withWatermark("view_ts", "30 minutes")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            time_bucket("ts", BUCKET_US).alias("jb2"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    attributed = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("jb") == F.col("jb2"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 15 MINUTES")),
    )
    t0 = time.monotonic()
    q = (
        attributed.select("user_id", "view_ts", "purchase_ts")
        .writeStream.format("noop")
        .outputMode("append")
        .queryName("ss_join_state_study")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(900):
        q.stop()
        raise RuntimeError("ss-join state study did not finish in 900s")
    sec = round(time.monotonic() - t0, 1)
    progress = list(q.recentProgress)
    state, n_batches = state_summary(progress)
    out_rows = sum(
        (p.get("sink") or {}).get("numOutputRows") or 0 for p in progress
    )
    return {"key": "stream_stream_join[noop]", "sec": sec,
            "out_rows": out_rows, "batches": n_batches, "state": state}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    fixtures = (
        ["/tmp/sfx10hot2", "/tmp/sfx100hot2"]
        if which == "both"
        else [f"/tmp/{which}"]
    )
    from adlspark.session import build_spark

    spark = build_spark("adlspark-stream-stress")
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in fixtures:
        if not os.path.isdir(sf_dir):
            print(f"missing fixture {sf_dir} — build with "
                  f"STRESS_COPIES=N STRESS_HOT_MOD=2 tools/stress_skew.py build",
                  file=sys.stderr)
            continue
        fixture = os.path.basename(sf_dir)
        for key in STOCK_KEYS:
            rec = run_stock(spark, key, sf_dir)
            rec["fixture"] = fixture
            print(json.dumps(rec), flush=True)
        if os.environ.get("STRESS_SS_JOIN", "1") == "0":
            continue  # output-bound at 100x — see module docstring
        if fixture == "sfx10hot2":
            rec = run_stock(spark, "stream_stream_join", sf_dir)
        else:
            rec = run_ss_join_noop(spark, sf_dir)
        rec["fixture"] = fixture
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
