"""Golden-row unit tests on hand-built tiny DataFrames — semantics that
the fixture data exercises only statistically (tie-breaking, inclusivity,
tolerance, empty groups) are pinned here explicitly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from adlspark.ops.asof import asof_join
from adlspark.ops.filters import apply_rules


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_inclusive_and_unmatched(spark):
    purchases = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01 10:00:00")),  # before any signup → NULL
            (2, 100, ts("2024-01-01 12:00:00")),  # matches 11:00 signup
            (3, 100, ts("2024-01-01 13:00:00")),  # equal ts → inclusive
            (4, 200, ts("2024-01-01 09:00:00")),  # user with no signups
        ],
        "event_id long, user_id long, ts timestamp",
    )
    signups = spark.createDataFrame(
        [
            (100, ts("2024-01-01 11:00:00")),
            (100, ts("2024-01-01 13:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    out = {
        r.event_id: r.asof_ts
        for r in asof_join(
            purchases, signups, ["user_id"], "ts", "ts", []
        ).collect()
    }
    assert out[1] is None
    assert out[2] == ts("2024-01-01 11:00:00")
    assert out[3] == ts("2024-01-01 13:00:00")  # inclusive at equality
    assert out[4] is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"))], "user_id long, ts timestamp"
    )
    with_tol = asof_join(
        left, right, ["user_id"], "ts", "ts", [],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).collect()[0]
    assert with_tol.asof_ts is None  # 3h-old match nulled by 1h tolerance
    without = asof_join(left, right, ["user_id"], "ts", "ts", []).collect()[0]
    assert without.asof_ts == ts("2024-01-01 09:00:00")


def test_asof_carries_right_columns(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "campaign-A", 7.5)],
        "user_id long, ts timestamp, source string, score double",
    )
    row = asof_join(
        left, right, ["user_id"], "ts", "ts", ["source", "score"]
    ).collect()[0]
    assert row.asof_source == "campaign-A"
    assert row.asof_score == 7.5


def test_rule_compiler_all_ops(spark):
    df = spark.createDataFrame(
        [(1, "aa", 5.0), (2, "ab", 15.0), (3, "bb", 25.0), (4, "ba", 35.0)],
        "id long, s string, v double",
    )
    got = {
        r.id
        for r in apply_rules(
            df,
            [
                {"col": "v", "op": "between", "value": [10, 40]},
                {"col": "s", "op": "like", "value": "a%"},
            ],
        ).collect()
    }
    assert got == {2}
    assert apply_rules(df, []).count() == 4  # empty rules = no filter


def test_ingest_all_corrupt_and_empty(spark, tmp_path):
    """Staging pipeline edge cases: a batch of only-corrupt lines stages
    zero rows and reports FAILED; an empty file stages zero rows."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from adlspark.io.ingest import SourceConfig, ingest

    cfg = SourceConfig(
        name="edge",
        fmt="json",
        schema=StructType(
            [StructField("a", LongType()), StructField("b", StringType())]
        ),
        required=["a"],
    )
    bad = tmp_path / "bad.jsonl"
    bad.write_text("{nope\n{also bad\n")
    entry = ingest(
        spark, cfg, str(bad),
        staged_dir=str(tmp_path / "staged1"),
        quarantine_dir=str(tmp_path / "q1"),
    )
    assert entry["n_good"] == 0 and entry["n_quarantined"] == 2
    assert entry["status"] == "FAILED"

    empty = tmp_path / "empty.jsonl"
    empty.write_text("")
    entry2 = ingest(
        spark, cfg, str(empty),
        staged_dir=str(tmp_path / "staged2"),
        quarantine_dir=str(tmp_path / "q2"),
    )
    assert entry2["n_good"] == 0 and entry2["n_quarantined"] == 0


def test_ingest_idempotent_key(spark, sf_dir):
    """Second arrival of the same batch must not grow the staged table."""
    from adlspark.ops.scans import ingest_idempotent

    rows = {r.arrival: r.staged_total for r in ingest_idempotent(spark, sf_dir).collect()}
    assert rows[1] == rows[2] == 100
