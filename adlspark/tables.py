"""Fixture table loaders.

All §2 operators load inputs through these helpers so that fixture quirks
(the events nanosecond timestamp, SURVEY.md §1.3) are handled in exactly one
place. ``load`` returns the raw parquet DataFrame; ``events`` additionally
converts the ns-epoch LongType ``ts`` to a µs TimestampType column, which is
what every events query uses and what matches DuckDB's ``CAST(ts AS
TIMESTAMP)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TimestampType at µs precision (ns truncated).

    Requires ``spark.sql.legacy.parquet.nanosAsLong=true`` (session.py);
    the raw column arrives as LongType nanoseconds since epoch.

    NOTE: integer division (``ts div 1000``) is essential. SURVEY.md §1.3's
    ``(F.col("ts")/1000).cast("long")`` is a *double* division: ns epochs
    (~1.7e18) exceed double's 2^53 exact range, so it lands on the wrong µs
    for ~12% of rows (1217/10000 measured at sf0.01 vs DuckDB's
    ``CAST(ts AS TIMESTAMP)``). ``div`` stays in long arithmetic: 0/10000
    mismatches.
    """
    df = load(spark, sf_dir, "events")
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
