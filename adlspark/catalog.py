"""The data catalog as a queryable table — the engine's replacement for
the reference's DynamoDB DataCatalog + Elasticsearch search hop.

Entries are plain rows at FILE fidelity (one per table/batch with byte
size, content hash, ingest timestamp, schema signature, status) — the
facts a lake operator actually queries: "what arrived, when, how big,
is it staged or failed, did its schema change?". Search is Spark SQL
over the catalog DataFrame — a LIKE filter for point lookups and a
tokenized inverted-index search for the ES/Kibana-style entry point.
Persistence uses an append-only parquet log with last-writer-wins reads
keyed by a MONOTONIC NUMERIC sequence (ordering by the batch-id string
breaks at double digits: 'batch-10' < 'batch-9' lexicographically).
Delta/Iceberg would slot in here unchanged when jars are available.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adlspark import tables

CATALOG_SCHEMA = (
    "table_name string, path string, row_count long, n_columns int, "
    "file_size_bytes long, content_hash string, schema_sig string, "
    "ingest_batch string, seq long, ingested_at timestamp, status string"
)


def file_metadata(path: str) -> tuple[int, str]:
    """(total bytes, md5-of-content) for a data file or a directory of
    part files (hashed in sorted-path order — deterministic for a given
    staged layout; underscore/dot bookkeeping files excluded)."""
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(path)
            for f in fs
            if not f.startswith(("_", "."))
        )
    else:
        paths = [path]
    size = 0
    digest = hashlib.md5()
    for p in paths:
        size += os.path.getsize(p)
        with open(p, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                digest.update(chunk)
    return size, digest.hexdigest()


def schema_sig(df: DataFrame) -> str:
    """Compact, order-preserving schema signature ('name:type,...')."""
    return ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)


def parquet_num_rows(path: str) -> int | None:
    """Exact row count from parquet footer metadata (no Spark job — the
    footers are what a file-level catalog reads anyway). Returns None for
    non-parquet layouts; callers fall back to a count job."""
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover
        return None
    if os.path.isdir(path):
        files = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    else:
        files = [path]
    try:
        return sum(pq.ParquetFile(p).metadata.num_rows for p in files)
    except Exception:
        return None


def entry_for(
    df: DataFrame,
    table_name: str,
    path: str,
    batch_id: str,
    seq: int,
    status: str = "STAGED",
    at: datetime.datetime | None = None,
) -> tuple:
    """One catalog row for a staged file/dir, with real fs metadata."""
    size, digest = file_metadata(path)
    n_rows = parquet_num_rows(path)
    if n_rows is None:
        n_rows = df.count()
    return (
        table_name,
        path,
        n_rows,
        len(df.columns),
        size,
        digest,
        schema_sig(df),
        batch_id,
        seq,
        at or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
        status,
    )


def build_catalog(
    spark: SparkSession, sf_dir: str, batch_id: str, seq: int = 0
) -> DataFrame:
    """One catalog entry per fixture table (file-level metadata)."""
    entries = []
    for t in tables.TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        entries.append(
            entry_for(tables.load(spark, sf_dir, t), t, path, batch_id, seq)
        )
    return spark.createDataFrame(entries, CATALOG_SCHEMA)


def search(catalog: DataFrame, pattern: str) -> DataFrame:
    """Point-lookup search: LIKE over name + status."""
    return catalog.where(
        F.col("table_name").like(pattern) | F.col("status").like(pattern)
    )


def search_tokens(catalog: DataFrame, terms: list[str]) -> DataFrame:
    """Tokenized full-text search over catalog metadata — the ES analogue.

    The searchable text of an entry is its table name, file name, status
    and schema COLUMN NAMES (types stripped from schema_sig), lowercased
    and split on non-identifier characters; a broadcast term list joins
    against the exploded token index. Returns one row per matching entry
    with the hit count and the sorted matched terms. At scale the token
    explode is a narrow map over the (small) catalog and the term list is
    a broadcast — no full-text infrastructure needed.
    """
    spark = catalog.sparkSession
    text = F.lower(
        F.concat_ws(
            " ",
            F.col("table_name"),
            F.element_at(F.split(F.col("path"), "/"), -1),
            F.col("status"),
            F.regexp_replace(F.col("schema_sig"), ":[^,]*", " "),
        )
    )
    tok = catalog.select(
        "table_name",
        "ingest_batch",
        F.explode(F.array_distinct(F.split(text, "[^a-z0-9_]+"))).alias("tok"),
    ).where(F.col("tok") != "")
    terms_df = spark.createDataFrame(
        [(t.lower(),) for t in terms], "term string"
    )
    return (
        tok.join(F.broadcast(terms_df), tok.tok == terms_df.term)
        .groupBy("table_name", "ingest_batch")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias(
                "matched_terms"
            ),
        )
    )


def append_entries(catalog_df: DataFrame, catalog_dir: str) -> None:
    """Append-only catalog persistence (the DynamoDB-put analogue). A
    Delta/Iceberg table would slot in here unchanged — the interface is
    (append batch, read latest-state); plain parquet append is the
    no-extra-jars v1 per SURVEY §4."""
    catalog_df.write.mode("append").parquet(catalog_dir)


def latest_state(spark: SparkSession, catalog_dir: str) -> DataFrame:
    """Current catalog state: the newest entry per table (last-writer-wins
    upsert semantics over the append-only log — one window, no compaction
    needed until the log is large, then foreachBatch compaction applies).
    Ordered by the numeric ``seq`` (NOT the batch-id string, which
    misorders at double digits), tie-broken by ingest timestamp."""
    from pyspark.sql import Window

    log = spark.read.parquet(catalog_dir)
    w = Window.partitionBy("table_name").orderBy(
        F.col("seq").desc(), F.col("ingested_at").desc()
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
