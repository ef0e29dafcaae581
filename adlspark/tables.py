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


# Schema memo (optimization round 14, guide §1.2 "don't compute things
# you throw away"): a bare spark.read.parquet() runs a schema-inference
# JOB per call (~280 ms measured warm at sf0.1), and the bench pays it
# hundreds of times for the same ten immutable fixture files. Supplying
# the schema skips inference (49 ms/load). This memoizes METADATA only —
# the catalog-table pattern: every action still lists and scans the
# parquet files fresh; no rows, plans, or results are cached. Staleness
# guard: the key carries the path's (mtime_ns, size) — any regeneration
# of a fixture file/dir (stress tools synthesize corpora under new or
# rewritten paths) changes the stamp — plus the session's effective
# nanosAsLong flag, which changes what type inference REPORTS for the
# legacy ns-timestamp events layout (a plain foreign session configures
# it at runtime via adlspark.session.configure; the cached schema must
# match the flag in force at read time).
_SCHEMA_MEMO: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        key = (path, st.st_mtime_ns, st.st_size, nanos)
    except OSError:
        # missing path: let the reader raise its own (clearer) error
        return spark.read.parquet(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_MEMO[key] = schema
    return spark.read.schema(schema).parquet(path)


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Fan a small single-file scan out to the session's core count
    before heavy per-row compute (optimization round 14, guide §2.5
    "input skew: one huge unsplittable file ... repartition immediately
    after the read"): a sub-split-size parquet fixture arrives as ONE
    scan task, so an expensive projection (salted-md5 shingle hashing,
    HOF shingling, Arrow kernels) pins one core while the rest idle.
    Hash-repartition on a deterministic key — retry-safe (no
    round-robin determinism sort, SPARK-23207/SPARK-38388) and
    reusable by a downstream groupBy/join on the same key (guide §2.4:
    operations keyed the same way share one exchange). Scale-adaptive,
    not a local[32] constant: the target is the session's
    defaultParallelism and the repartition is SKIPPED whenever the
    scan already carries at least that many partitions — at production
    input sizes (≥ one split per core) this is a no-op."""
    if os.environ.get("ADLSPARK_SPREAD", "1") == "0":
        # deployment knob: disable the fan-out entirely (e.g. when the
        # input layout is known-good); also the A/B seam the round-14
        # interleaved measurements flip (tools/ab_key.py)
        return df
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p, F.col(key))


def fast_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from parquet FOOTER metadata
    (optimization round 14, guide §1.2): several keys need only the
    table's size (batch bookkeeping, rate sizing, idf denominators),
    and a Spark ``count()`` job costs a full scheduler round-trip for a
    number the footers already hold — the same file-level-catalog
    argument as ``catalog.parquet_num_rows``. Falls back to a real
    ``count()`` for non-parquet layouts or unreadable footers, so the
    value is ALWAYS the exact row count."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = sorted(
                os.path.join(r, f)
                for r, _d, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        else:
            files = [path]
        return sum(pq.ParquetFile(p).metadata.num_rows for p in files)
    except Exception:
        return load(spark, sf_dir, name).count()


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as session-zone TimestampType at µs precision.

    The fixture's on-disk type has varied across driver rounds, so the
    normalization is schema-adaptive:

    - ``bigint`` — ns-epoch longs surfaced via
      ``spark.sql.legacy.parquet.nanosAsLong=true`` (session.py). Integer
      division (``ts div 1000``) is essential here: SURVEY.md §1.3's
      ``(F.col("ts")/1000).cast("long")`` is a *double* division and ns
      epochs (~1.7e18) exceed double's 2^53 exact range, landing on the
      wrong µs for ~12% of rows (1217/10000 measured at sf0.01 vs DuckDB's
      ``CAST(ts AS TIMESTAMP)``). ``div`` stays in long arithmetic: 0
      mismatches.
    - ``timestamp_ntz`` — native µs parquet timestamps (driver rounds ≥3).
      Cast to the session-zone type; with ``spark.sql.session.timeZone=UTC``
      the wall clock (and hence DuckDB's naive-timestamp view of the same
      file) is preserved exactly.
    - ``timestamp`` — already the session-zone type; pass through.
    """
    # NOT spread (round-14 interleaved A/B): fanning the events scan out
    # read 0.99-1.66× across five ts_*/agg consumers — the ts
    # normalization map side is cheap and every consumer's first real
    # operator (window/groupBy) exchanges on its own key anyway.
    df = load(spark, sf_dir, "events")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
