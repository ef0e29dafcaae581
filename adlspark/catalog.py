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
