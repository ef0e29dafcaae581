"""The data catalog as a queryable table — the engine's replacement for
the reference's DynamoDB DataCatalog + Elasticsearch search hop.

Entries are plain rows (one per table/batch); search is Spark SQL over
the catalog DataFrame — the ES infrastructure disappears because the
catalog lives where the query engine already is. Persistence uses an
append-only parquet directory (Delta/Iceberg would slot in here when
jars are available; the interface is format-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adlspark import tables

CATALOG_SCHEMA = (
    "table_name string, path string, row_count long, n_columns int, "
    "ingest_batch string, status string"
)


def build_catalog(spark: SparkSession, sf_dir: str, batch_id: str) -> DataFrame:
    """One catalog entry per fixture table (row count + schema width)."""
    entries = []
    for t in tables.TABLES:
        df = tables.load(spark, sf_dir, t)
        entries.append(
            (
                t,
                f"{sf_dir}/{t}.parquet",
                df.count(),
                len(df.columns),
                batch_id,
                "STAGED",
            )
        )
    return spark.createDataFrame(entries, CATALOG_SCHEMA)


def search(catalog: DataFrame, pattern: str) -> DataFrame:
    """Catalog search ≈ the ES/Kibana hop: LIKE over name + status."""
    return catalog.where(
        F.col("table_name").like(pattern) | F.col("status").like(pattern)
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
    needed until the log is large, then foreachBatch compaction applies)."""
    from pyspark.sql import Window

    log = spark.read.parquet(catalog_dir)
    w = Window.partitionBy("table_name").orderBy(
        F.col("ingest_batch").desc(), F.col("row_count").desc()
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
